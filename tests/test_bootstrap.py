"""Snapshot bootstrap + WAL cutover: from_snapshot() pre-loads the
table at a WAL position, stream()/replay() skip the overlapped prefix
at scan level, retention gaps fail loudly, and the cutover composes
with crash/restart — final state verified against an independent
DuckDB replay of the WHOLE WAL."""

from __future__ import annotations

import glob

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from tap_github_search_spark.functions.normalize import normalized
from tap_github_search_spark.operators.dedup import final_state
from tap_github_search_spark.sources.generator import write_changelog
from tap_github_search_spark.streaming.job import (
    replay,
    stream,
    wal_min_seq,
)
from tap_github_search_spark.table.microlake import MicroLakeTable


def _snapshot_at(spark, log_dir, s):
    """Final state of the WAL prefix seq <= s — what a consistent
    snapshot taken at position s contains (text normalized, as the
    engine's merge would have written it)."""
    log = spark.read.parquet(log_dir).filter(F.col("seq") <= s)
    return final_state(log).select(
        "conv_id", "turn_idx", "role", normalized("text").alias("text"),
        "tool", "ts",
    )


def _oracle_full(log_dir):
    files = sorted(glob.glob(f"{log_dir}/*.parquet"))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con.execute(f"""
      SELECT conv_id, turn_idx, role,
             nfc_normalize(replace(text, chr(0),'')) AS text, tool, ts
      FROM (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, seq DESC) rn FROM read_parquet({files!r}))
      WHERE rn = 1 AND op <> 'D' ORDER BY conv_id, turn_idx
    """).df()


def _table_pdf(t):
    got = (
        t.snapshot_df()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx").toPandas()
    )
    got["ts"] = pd.to_datetime(got["ts"], utc=True).dt.tz_localize(None)
    return got.reset_index(drop=True)


def test_bootstrap_then_stream_equals_full_replay(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 60, n_files=6)
    lo, hi = (
        spark.read.parquet(f"{tmp_dir}/log")
        .select(F.min("seq"), F.max("seq")).first()
    )
    cut = (int(lo) + int(hi)) // 2
    t = MicroLakeTable.from_snapshot(
        spark, f"{tmp_dir}/t", _snapshot_at(spark, f"{tmp_dir}/log", cut),
        as_of_seq=cut, n_buckets=8,
    )
    assert t.last_committed_epoch == -1
    assert t.manifest["bootstrap_seq"] == cut
    # crash mid-tail, then restart from checkpoint
    try:
        stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
               f"{tmp_dir}/ckpt", fail_after_batches=1)
    except Exception:
        pass
    t = stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t", f"{tmp_dir}/ckpt")
    exp = _oracle_full(f"{tmp_dir}/log")
    exp["ts"] = pd.to_datetime(exp["ts"], utc=True).dt.tz_localize(None)
    pd.testing.assert_frame_equal(_table_pdf(t), exp, check_dtype=False)


def test_bootstrap_then_batch_replay(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 40, n_files=4)
    lo, hi = (
        spark.read.parquet(f"{tmp_dir}/log")
        .select(F.min("seq"), F.max("seq")).first()
    )
    cut = int(lo) + (int(hi) - int(lo)) // 3
    MicroLakeTable.from_snapshot(
        spark, f"{tmp_dir}/t", _snapshot_at(spark, f"{tmp_dir}/log", cut),
        as_of_seq=cut, n_buckets=8,
    )
    t, results = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                        n_epochs=3)
    # the overlapped prefix was skipped at scan level: fewer events in
    # than the WAL holds
    wal_n = spark.read.parquet(f"{tmp_dir}/log").count()
    tail_n = (
        spark.read.parquet(f"{tmp_dir}/log")
        .filter(F.col("seq") > cut).count()
    )
    assert sum(r.events_in for r in results) == tail_n < wal_n
    exp = _oracle_full(f"{tmp_dir}/log")
    exp["ts"] = pd.to_datetime(exp["ts"], utc=True).dt.tz_localize(None)
    pd.testing.assert_frame_equal(_table_pdf(t), exp, check_dtype=False)


def test_retention_gap_fails_loudly(spark, tmp_dir):
    """A WAL whose retained min seq is past the snapshot position means
    lost changes: the first post-bootstrap run must refuse."""
    write_changelog(spark, f"{tmp_dir}/log", 40, n_files=4)
    lo = int(
        spark.read.parquet(f"{tmp_dir}/log").select(F.min("seq")).first()[0]
    )
    # prune the oldest WAL chunks to fabricate expired retention
    import os
    import shutil

    kept_dir = f"{tmp_dir}/log_pruned"
    os.makedirs(kept_dir)
    for f in sorted(glob.glob(f"{tmp_dir}/log/*.parquet"))[2:]:
        shutil.copy(f, kept_dir)
    retained_min = wal_min_seq(kept_dir)
    assert retained_min > lo
    cut = retained_min - 10
    assert cut > lo
    MicroLakeTable.from_snapshot(
        spark, f"{tmp_dir}/t", _snapshot_at(spark, f"{tmp_dir}/log", cut),
        as_of_seq=cut, n_buckets=8,
    )
    import pytest

    with pytest.raises(ValueError, match="retention gap"):
        replay(spark, [kept_dir], f"{tmp_dir}/t")
    # a snapshot AT the retained boundary is fine
    shutil.rmtree(f"{tmp_dir}/t")
    MicroLakeTable.from_snapshot(
        spark, f"{tmp_dir}/t",
        _snapshot_at(spark, f"{tmp_dir}/log", retained_min - 1),
        as_of_seq=retained_min - 1, n_buckets=8,
    )
    replay(spark, [kept_dir], f"{tmp_dir}/t")


def test_from_snapshot_rejects_changelog_frames(spark, tmp_dir):
    import pytest

    write_changelog(spark, f"{tmp_dir}/log", 10, n_files=1)
    with pytest.raises(ValueError, match="FINAL-STATE"):
        MicroLakeTable.from_snapshot(
            spark, f"{tmp_dir}/t", spark.read.parquet(f"{tmp_dir}/log"),
            as_of_seq=0,
        )