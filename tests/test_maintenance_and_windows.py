"""Compaction + streaming windowed-metrics tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from tap_github_search_spark.sources.generator import write_changelog
from tap_github_search_spark.streaming.job import replay
from tap_github_search_spark.streaming.windows import (
    batch_window_counts,
    stream_window_counts,
)
from tap_github_search_spark.table.microlake import MicroLakeTable


def _sorted_rows(df):
    return [tuple(r) for r in df.collect()]


def test_cow_keeps_buckets_single_generation(spark, tmp_dir):
    """The copy-on-write rewrite fully replaces a bucket's files each
    time it's touched, so plain compaction has nothing to do — the
    invariant that keeps read amplification at one file per bucket."""
    write_changelog(spark, f"{tmp_dir}/log", 120, n_files=4)
    table, _ = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                      n_buckets=8, n_epochs=3)
    per_bucket = {}
    for f in table.manifest["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert per_bucket and all(v == 1 for v in per_bucket.values())
    assert table.compact() == 0


def test_compaction_tombstone_gc_preserves_snapshot_and_time_travel(
    spark, tmp_dir
):
    write_changelog(spark, f"{tmp_dir}/log", 120, n_files=4, delete_pct=40)
    table, _ = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                      n_buckets=8, n_epochs=3)
    before = table.snapshot_df().orderBy("conv_id", "turn_idx").collect()
    before_files = len(table.manifest["files"])
    old_version = table.manifest["version"]

    n = table.compact(drop_tombstones=True)
    assert n > 0
    after = table.snapshot_df().orderBy("conv_id", "turn_idx").collect()
    assert before == after
    # time travel: the pre-compaction snapshot is still readable
    old = MicroLakeTable.load(spark, f"{tmp_dir}/t", version=old_version)
    assert len(old.manifest["files"]) == before_files
    assert old.snapshot_df().count() == len(after)


def test_compaction_drop_tombstones(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 120, n_files=4, delete_pct=40)
    table, _ = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                      n_buckets=8, n_epochs=2)
    raw_before = table.raw_df().count()
    live = table.snapshot_df().count()
    assert raw_before > live  # tombstones exist
    table.compact(drop_tombstones=True)
    assert table.raw_df().count() == live
    assert table.snapshot_df().count() == live


def test_vacuum_removes_orphans_keeps_snapshot(spark, tmp_dir):
    import os

    write_changelog(spark, f"{tmp_dir}/log", 120, n_files=4, delete_pct=30)
    table, _ = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                      n_buckets=8, n_epochs=3)
    table.compact(drop_tombstones=True)  # creates orphaned generations
    before = table.snapshot_df().orderBy("conv_id", "turn_idx").collect()

    def count_parquet(root):
        return sum(
            fn.endswith(".parquet")
            for _, _, files in os.walk(os.path.join(root, "data"))
            for fn in files
        )

    on_disk = count_parquet(f"{tmp_dir}/t")
    referenced = len(table.manifest["files"])
    assert on_disk > referenced  # orphans exist pre-vacuum

    # grace window: freshly-written orphans survive a guarded vacuum
    # (protects the staged files of an in-flight concurrent merge)
    assert table.vacuum(keep_versions=1) == 0
    assert count_parquet(f"{tmp_dir}/t") == on_disk

    deleted = table.vacuum(keep_versions=1, grace_seconds=0)
    assert deleted == on_disk - referenced
    assert count_parquet(f"{tmp_dir}/t") == referenced
    after = table.snapshot_df().orderBy("conv_id", "turn_idx").collect()
    assert before == after
    # older manifests expired; current still loads
    reloaded = MicroLakeTable.load(spark, f"{tmp_dir}/t")
    assert reloaded.manifest["version"] == table.manifest["version"]


def test_streaming_window_counts_match_batch(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 150, n_files=4)
    streamed = stream_window_counts(
        spark, [f"{tmp_dir}/log"], f"{tmp_dir}/ckpt",
        width="1 hour", watermark="2 hours",
    )
    batch = batch_window_counts(spark, [f"{tmp_dir}/log"], width="1 hour")
    # append mode emits only windows closed by the final watermark
    max_ts = spark.read.parquet(f"{tmp_dir}/log").agg(F.max("ts")).first()[0]
    closed = batch.filter(
        F.col("window_end") < F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    )
    got = sorted(_sorted_rows(streamed))
    expect_closed = sorted(_sorted_rows(closed))
    # every closed window must be present with exact counts, and nothing
    # beyond the full batch result may appear
    all_batch = set(_sorted_rows(batch))
    assert set(got) <= all_batch
    assert set(expect_closed) <= set(got)
    assert len(got) > 0
