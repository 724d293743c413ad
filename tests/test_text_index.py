"""Incrementally-maintained inverted text index (derived level with an
EXPLODING key_expr: one turn dirties many token keys)."""

from __future__ import annotations

import duckdb
import pandas as pd

from tap_github_search_spark.sources.generator import write_changelog
from tap_github_search_spark.streaming.derived import (
    TextIndexMaintainer,
    rebuild_text_index,
)
from tap_github_search_spark.streaming.job import replay
from tests.test_engine import _events


def _full_rebuild(table):
    """Full recompute from the FINAL main snapshot — ground truth for
    the incremental maintenance (independently cross-checked against a
    DuckDB recomputation from the raw WAL below)."""
    return rebuild_text_index(table)


def test_incremental_index_equals_full_rebuild(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 120, n_files=4, delete_pct=25)
    table, results = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                            n_buckets=8, n_epochs=4)
    maint = TextIndexMaintainer(spark, table, f"{tmp_dir}/idx", n_buckets=8)
    for r in results:
        maint.apply_epoch(r.epoch)
    # fence: replaying the last epoch is a no-op
    assert maint.apply_epoch(results[-1].epoch).skipped

    got = maint.index.snapshot_df().drop("ts").toPandas() \
        .sort_values("token").reset_index(drop=True)
    want = _full_rebuild(table).toPandas() \
        .sort_values("token").reset_index(drop=True)
    got["postings"] = got["postings"].map(list)
    want["postings"] = want["postings"].map(list)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # independent oracle: DuckDB recomputes df/postings from the WAL
    oracle = duckdb.sql(f"""
      WITH winners AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, seq DESC) rn
          FROM read_parquet('{tmp_dir}/log/*.parquet')
        ) WHERE rn = 1 AND op <> 'D'
      ),
      toks AS (
        SELECT DISTINCT conv_id, turn_idx,
               unnest(regexp_split_to_array(trim(lower(
                 nfc_normalize(replace(text, chr(0), '')))), '\\s+'))
                 AS token
        FROM winners
        WHERE trim(nfc_normalize(replace(text, chr(0), ''))) <> ''
      )
      SELECT token, count(DISTINCT conv_id) AS n_convs,
             count(*) AS n_turns
      FROM toks GROUP BY token ORDER BY token
    """).df()
    pd.testing.assert_frame_equal(
        got[["token", "n_convs", "n_turns"]], oracle, check_dtype=False
    )


def test_index_tracks_text_updates_and_deletes(spark, tmp_dir):
    e0 = _events(spark, [(1, "I", "c1", 0, 10, "alpha beta"),
                         (2, "I", "c2", 0, 11, "beta gamma")])
    e0.write.mode("overwrite").parquet(f"{tmp_dir}/log0")
    table, res = replay(spark, [f"{tmp_dir}/log0"], f"{tmp_dir}/t",
                        n_buckets=4)
    maint = TextIndexMaintainer(spark, table, f"{tmp_dir}/idx", n_buckets=4)
    maint.apply_epoch(res[0].epoch)

    row = maint.search("beta").first()
    assert row["n_convs"] == 2 and sorted(row["postings"]) == ["c1", "c2"]

    # c1's turn rewritten: alpha disappears entirely, delta appears
    r1 = table.merge(_events(spark, [(3, "U", "c1", 0, 20, "delta beta")]),
                     epoch=1)
    maint.apply_epoch(r1.epoch)
    assert maint.search("alpha").count() == 0       # D row for emptied token
    assert maint.search("delta").first()["postings"] == ["c1"]
    assert sorted(maint.search("beta").first()["postings"]) == ["c1", "c2"]

    # deleting c2 prunes it from every posting it was in
    r2 = table.merge(_events(spark, [(4, "D", "c2", 0, 30)]), epoch=2)
    maint.apply_epoch(r2.epoch)
    assert maint.search("gamma").count() == 0
    assert maint.search("beta").first()["postings"] == ["c1"]


def test_streaming_index_crash_restart(spark, tmp_dir):
    """stream(text_index_path=...) maintains the index per microbatch;
    a crash between batches replays and converges (independent fence)."""
    from tap_github_search_spark.streaming.job import stream
    from tap_github_search_spark.table.microlake import MicroLakeTable

    write_changelog(spark, f"{tmp_dir}/log", 80, n_files=4, delete_pct=20)
    try:
        stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t", f"{tmp_dir}/ckpt",
               n_buckets=4, max_files_per_trigger=1,
               text_index_path=f"{tmp_dir}/idx", fail_after_batches=2)
    except Exception:
        pass
    table = stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                   f"{tmp_dir}/ckpt", n_buckets=4,
                   text_index_path=f"{tmp_dir}/idx")

    idx = MicroLakeTable.load(spark, f"{tmp_dir}/idx")
    got = idx.snapshot_df().drop("ts").toPandas() \
        .sort_values("token").reset_index(drop=True)
    want = _full_rebuild(table).toPandas() \
        .sort_values("token").reset_index(drop=True)
    got["postings"] = got["postings"].map(list)
    want["postings"] = want["postings"].map(list)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
