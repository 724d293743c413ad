"""Stream-maintained MinHash-LSH near-dup index over the transcript
table: a 2-level derived chain (per-conv signatures → band buckets with
an EXPLODING key_expr). Incremental maintenance must equal a full
rebuild, updates must migrate band membership (old AND new bands
dirtied), and planted near-duplicates must surface as candidates via
two bucket-pruned point reads."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tap_github_search_spark.sources.generator import write_changelog
from tap_github_search_spark.streaming.derived import (
    LshIndexMaintainer,
    _conv_signature_transform,
    _lsh_band_transform,
)
from tap_github_search_spark.streaming.job import replay
from tests.test_engine import _events


def _full_rebuild_bands(table) -> pd.DataFrame:
    """The same 2-level transform over the FINAL main snapshot."""
    sig = _conv_signature_transform(table.snapshot_df())
    live = sig.withColumn("band_key", F.explode("band_keys"))
    return (
        _lsh_band_transform(live)
        .withColumn("members", F.col("members").cast("array<string>"))
        .toPandas().sort_values("band_key").reset_index(drop=True)
    )


def test_incremental_lsh_index_equals_full_rebuild(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 50, n_files=2, delete_pct=25)
    table, results = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                            n_buckets=8, n_epochs=2)
    maint = LshIndexMaintainer(spark, table, f"{tmp_dir}/lsh", n_buckets=8)
    for r in results:
        maint.apply_epoch(r.epoch)
    assert maint.apply_epoch(results[-1].epoch).skipped  # fence

    got = maint.bands.snapshot_df().drop("ts").toPandas() \
        .sort_values("band_key").reset_index(drop=True)
    got["members"] = got["members"].map(list)
    want = _full_rebuild_bands(table)
    want["members"] = want["members"].map(list)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every indexed conversation carries exactly 4 band keys
    sig = maint.signatures.snapshot_df()
    assert sig.filter(F.size("band_keys") != 4).count() == 0


def test_near_dups_found_and_membership_migrates(spark, tmp_dir):
    base = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"z{i}" for i in range(30))
    # c1 and c2 are exact near-dups; c3 is unrelated
    e0 = _events(spark, [(1, "I", "c1", 0, 10, base),
                         (2, "I", "c2", 0, 11, base),
                         (3, "I", "c3", 0, 12, other)])
    e0.write.mode("overwrite").parquet(f"{tmp_dir}/log0")
    table, res = replay(spark, [f"{tmp_dir}/log0"], f"{tmp_dir}/t",
                        n_buckets=4)
    maint = LshIndexMaintainer(spark, table, f"{tmp_dir}/lsh", n_buckets=4)
    maint.apply_epoch(res[0].epoch)

    assert maint.near_dup_candidates("c1") == ["c2"]
    assert maint.near_dup_candidates("c2") == ["c1"]
    assert maint.near_dup_candidates("c3") == []
    assert maint.near_dup_candidates("nope") == []

    # c2 rewritten to unrelated text: bands migrate — c1 loses its
    # candidate, c2 now collides with c3 instead
    r1 = table.merge(_events(spark, [(4, "U", "c2", 0, 20, other)]),
                     epoch=1)
    maint.apply_epoch(r1.epoch)
    assert maint.near_dup_candidates("c1") == []
    assert maint.near_dup_candidates("c2") == ["c3"]

    # deleting c3 prunes it from its bands
    r2 = table.merge(_events(spark, [(5, "D", "c3", 0, 30)]), epoch=2)
    maint.apply_epoch(r2.epoch)
    assert maint.near_dup_candidates("c2") == []
    assert maint.signatures.lookup("c3").count() == 0


def test_streaming_lsh_index_crash_restart(spark, tmp_dir):
    """stream(lsh_index_path=...) maintains the index per microbatch; a
    crash between batches replays and converges (independent fences)."""
    from tap_github_search_spark.streaming.job import stream
    from tap_github_search_spark.table.microlake import MicroLakeTable

    write_changelog(spark, f"{tmp_dir}/log", 40, n_files=2, delete_pct=20)
    try:
        stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t", f"{tmp_dir}/ckpt",
               n_buckets=4, max_files_per_trigger=1,
               lsh_index_path=f"{tmp_dir}/lsh", fail_after_batches=2)
    except Exception:
        pass
    table = stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                   f"{tmp_dir}/ckpt", lsh_index_path=f"{tmp_dir}/lsh")

    bands = MicroLakeTable.load(spark, f"{tmp_dir}/lsh/bands")
    got = bands.snapshot_df().drop("ts").toPandas() \
        .sort_values("band_key").reset_index(drop=True)
    got["members"] = got["members"].map(list)
    want = _full_rebuild_bands(table)
    want["members"] = want["members"].map(list)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
