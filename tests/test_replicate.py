"""Change-feed-as-a-source tests: a replica table maintained ONLY from
``change_feed`` diffs (the Singer RECORD re-emission loop) must converge
to the source's live state after any sequence of syncs, including the
delete→reinsert-with-older-ts generation change and a crash between the
replica commit and the bookmark write."""

from __future__ import annotations

import pandas as pd

from tap_github_search_spark.sources.generator import write_changelog
from tap_github_search_spark.streaming.job import replay
from tap_github_search_spark.streaming.replicate import ChangeFeedReplicator
from tap_github_search_spark.table.microlake import MicroLakeTable
from tests.test_engine import _events


def _src_canon(df) -> pd.DataFrame:
    pdf = df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(
        drop=True
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True)
    return pdf[sorted(pdf.columns)]


def _replica_canon(df) -> pd.DataFrame:
    """Replica payload: src_ts carries the source's data ts; the WAL ts
    (sync version time) is implementation detail and dropped."""
    pdf = df.drop("ts").toPandas().rename(columns={"src_ts": "ts"})
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True)
    return pdf[sorted(pdf.columns)]


def test_replica_converges_over_multiple_syncs(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 200, n_files=2, delete_pct=25)
    table, _ = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/src",
                      n_buckets=8, n_epochs=2)
    rep = ChangeFeedReplicator(spark, f"{tmp_dir}/src", f"{tmp_dir}/replica")

    # first sync = full load (bookmark starts at version 0)
    s1 = rep.sync()
    assert not s1["skipped"] and s1["rows"] > 0
    pd.testing.assert_frame_equal(
        _replica_canon(rep.replica.snapshot_df()),
        _src_canon(table.snapshot_df()),
        check_dtype=False,
    )

    # two more source commits, ONE sync spanning both (interval batching)
    e1 = _events(spark, [(9_000_000, "U", "conv_00000001", 0, 2 * 10**9, "u"),
                         (9_000_001, "I", "conv_new", 0, 2 * 10**9, "n")])
    table.merge(e1, epoch=table.last_committed_epoch + 1)
    e2 = _events(spark, [(9_000_002, "D", "conv_00000001", 0, 2 * 10**9 + 1)])
    table.merge(e2, epoch=table.last_committed_epoch + 1)
    s2 = rep.sync()
    assert not s2["skipped"] and s2["from"] == s1["to"]
    pd.testing.assert_frame_equal(
        _replica_canon(rep.replica.snapshot_df()),
        _src_canon(table.snapshot_df()),
        check_dtype=False,
    )

    # nothing new → bookmark makes the sync a no-op
    assert rep.sync()["skipped"]


def test_replica_mirrors_delete_reinsert_generations(spark, tmp_dir):
    """Delete → re-insert key generations. The source's LWW spans
    generations (a reinsert with ts older than the tombstone loses;
    with newer ts it wins) — the replica must mirror BOTH outcomes.
    The replica can only do so because diffs apply in sync order
    (version-derived WAL ts): replaying the source's raw data
    timestamps would re-litigate LWW against the replica's own
    tombstone instead of trusting the source's verdict."""
    e0 = _events(spark, [(1, "I", "c1", 0, 1000, "gen1")])
    e0.write.mode("overwrite").parquet(f"{tmp_dir}/log0")
    table, _ = replay(spark, [f"{tmp_dir}/log0"], f"{tmp_dir}/src",
                      n_buckets=4)
    rep = ChangeFeedReplicator(spark, f"{tmp_dir}/src", f"{tmp_dir}/replica")
    rep.sync()

    table.merge(_events(spark, [(2, "D", "c1", 0, 2000)]), epoch=1)
    rep.sync()
    assert rep.replica.snapshot_df().count() == 0

    # reinsert with ts=500 < the tombstone's 2000: the SOURCE rejects it
    # (LWW), so the feed is empty and the replica stays empty too
    table.merge(_events(spark, [(3, "I", "c1", 0, 500, "old-gen")]), epoch=2)
    assert table.snapshot_df().count() == 0
    assert rep.sync()["rows"] == 0
    assert rep.replica.snapshot_df().count() == 0

    # reinsert with ts=3000 > the tombstone: accepted by both
    table.merge(_events(spark, [(4, "I", "c1", 0, 3000, "gen2")]), epoch=3)
    rep.sync()
    got = rep.replica.snapshot_df().collect()
    assert len(got) == 1 and got[0]["text"] == "gen2"
    pd.testing.assert_frame_equal(
        _replica_canon(rep.replica.snapshot_df()),
        _src_canon(table.snapshot_df()),
        check_dtype=False,
    )


def test_replica_crash_between_commit_and_bookmark(spark, tmp_dir,
                                                   monkeypatch):
    """At-least-once delivery: die after the replica MERGE but before
    the bookmark write; the retried sync re-applies the same diff and
    the replica still equals the source (idempotent apply)."""
    import pytest

    write_changelog(spark, f"{tmp_dir}/log", 100, n_files=2, delete_pct=20)
    table, _ = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/src",
                      n_buckets=8)
    rep = ChangeFeedReplicator(spark, f"{tmp_dir}/src", f"{tmp_dir}/replica")
    rep.sync()

    table.merge(
        _events(spark, [(9_000_000, "U", "conv_00000002", 0, 2 * 10**9, "x"),
                        (9_000_001, "D", "conv_00000003", 0, 2 * 10**9)]),
        epoch=table.last_committed_epoch + 1,
    )

    def boom(version):
        raise RuntimeError("injected crash before bookmark")

    monkeypatch.setattr(rep, "_write_state", boom)
    with pytest.raises(RuntimeError, match="before bookmark"):
        rep.sync()
    monkeypatch.undo()

    # fresh replicator (simulates process restart): bookmark unchanged,
    # the diff re-applies idempotently
    rep2 = ChangeFeedReplicator(spark, f"{tmp_dir}/src", f"{tmp_dir}/replica")
    assert rep2.last_synced_version == rep.last_synced_version
    rep2.sync()
    pd.testing.assert_frame_equal(
        _replica_canon(rep2.replica.snapshot_df()),
        _src_canon(table.snapshot_df()),
        check_dtype=False,
    )
    assert rep2.sync()["skipped"]
