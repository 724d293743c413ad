"""Cross-table consistent cuts: a TopologySnapshot at epoch E must
show EVERY table's state as of exactly the epochs ≤ E — the rollup in
the cut equals a recompute from the fact table in the same cut (no
read skew), older cuts stay immutable while writers advance, and cuts
whose versions were vacuumed fail loudly.

Lockstep note: DerivedChain recomputes affected keys from the parent's
HEAD, so maintainers must be applied per epoch before the next parent
epoch commits (exactly what streaming/job.py does) — these tests
interleave merges and applies accordingly."""

from __future__ import annotations

import pandas as pd
import pytest

from tap_github_search_spark.sources.generator import write_changelog
from tap_github_search_spark.streaming.derived import (
    RollupMaintainer,
    conv_rollup,
)
from tap_github_search_spark.streaming.job import replay
from tap_github_search_spark.streaming.topology import (
    SnapshotExpiredError,
    TopologySnapshot,
)
from tests.test_engine import _events


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("conv_id").reset_index(drop=True)
    for c in ("first_ts", "last_ts"):
        pdf[c] = pd.to_datetime(pdf[c], utc=True).astype(
            "datetime64[us, UTC]")
    return pdf


def _rollup_pdf(df) -> pd.DataFrame:
    return _canon(df.drop("ts").toPandas())


def test_cut_is_skew_free_and_immutable(spark, tmp_dir):
    # epoch 0 via replay (creates the table), maintained in lockstep
    e0 = _events(spark, [(1, "I", "c1", 0, 10), (2, "I", "c1", 1, 11),
                         (3, "I", "c2", 0, 12), (4, "I", "c3", 0, 13)])
    e0.write.mode("overwrite").parquet(f"{tmp_dir}/log0")
    table, results = replay(spark, [f"{tmp_dir}/log0"], f"{tmp_dir}/t",
                            n_buckets=4)
    maint = RollupMaintainer(spark, table, f"{tmp_dir}/roll")
    maint.apply_epoch(results[0].epoch)
    # epoch 1: update c1, new conversation c5
    table.merge(_events(spark, [(5, "U", "c1", 0, 20, "v2"),
                                (6, "I", "c5", 0, 21)]), epoch=1)
    maint.apply_epoch(1)
    # epoch 2: c2 fully deleted, c3 grows a turn  ← the cut epoch
    table.merge(_events(spark, [(7, "D", "c2", 0, 30),
                                (8, "I", "c3", 1, 31)]), epoch=2)
    maint.apply_epoch(2)
    # epoch 3: fact ONLY — rollup now lags one epoch behind
    table.merge(_events(spark, [(9, "D", "c5", 0, 40),
                                (10, "I", "c6", 0, 41)]), epoch=3)

    topo = TopologySnapshot(spark, {"fact": table,
                                    "rollup": maint.child})
    assert topo.fences() == {"fact": 3, "rollup": 2}
    assert topo.consistent_epoch() == 2

    snaps = topo.at_epoch()  # default: the common fence (epoch 2)
    # skew-free: the rollup IN THE CUT equals a recompute from the
    # fact table IN THE CUT (not from the fact head, which is newer)
    got = _rollup_pdf(snaps["rollup"])
    expect = _canon(conv_rollup(snaps["fact"]).toPandas())
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    cut_convs = set(got["conv_id"])
    head_convs = {
        r["conv_id"]
        for r in table.snapshot_df().select("conv_id").distinct()
        .collect()
    }
    # the cut pre-dates epoch 3: c5 still alive, c6 not yet born
    assert "c5" in cut_convs and "c6" not in cut_convs
    assert "c5" not in head_convs and "c6" in head_convs

    # a cut ahead of a lagging table refuses with the laggard named
    with pytest.raises(ValueError, match="rollup@2"):
        topo.at_epoch(3)

    # catch the rollup up: the newer cut becomes readable AND the old
    # cut still reads identically (immutable MVCC versions)
    maint.apply_epoch(3)
    snaps_new = topo.at_epoch(3)
    pd.testing.assert_frame_equal(
        _rollup_pdf(snaps_new["rollup"]),
        _canon(conv_rollup(snaps_new["fact"]).toPandas()),
        check_dtype=False)
    pd.testing.assert_frame_equal(
        _rollup_pdf(topo.at_epoch(2)["rollup"]), got, check_dtype=False)


def test_expired_cut_raises(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 60, n_files=3)
    table, results = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                            n_buckets=4, n_epochs=3)
    first = results[0].epoch
    # expiring history keeps only the head manifest readable
    table.vacuum(keep_versions=1, grace_seconds=0)
    topo = TopologySnapshot(spark, {"fact": table})
    # the head cut still resolves
    assert topo.at_epoch()["fact"].count() > 0
    with pytest.raises(SnapshotExpiredError, match="keep_versions"):
        topo.at_epoch(first)


def test_tagged_cut_survives_vacuum(spark, tmp_dir):
    """A cut pinned with tag() is a vacuum GC root on EVERY member:
    after history expiry the pinned multi-table snapshot still reads
    skew-free (and equals its recompute), while the same untagged
    epoch is gone; drop_tag releases it back to vacuum."""
    e0 = _events(spark, [(1, "I", "c1", 0, 10), (2, "I", "c2", 0, 11)])
    e0.write.mode("overwrite").parquet(f"{tmp_dir}/log0")
    table, results = replay(spark, [f"{tmp_dir}/log0"], f"{tmp_dir}/t",
                            n_buckets=4)
    maint = RollupMaintainer(spark, table, f"{tmp_dir}/roll")
    maint.apply_epoch(results[0].epoch)
    topo = TopologySnapshot(spark, {"fact": table,
                                    "rollup": maint.child})
    pinned = topo.tag("corpus-v1")
    assert set(pinned) == {"fact", "rollup"}

    # duplicate pin refuses (the tag is immutable)
    from tap_github_search_spark.table.microlake import (
        ConcurrentCommitError,
    )
    with pytest.raises(ConcurrentCommitError):
        topo.tag("corpus-v1")

    # the topology moves on and history is expired everywhere
    for e in (1, 2):
        table.merge(_events(spark, [(10 * e, "U", "c1", 0, 20 + e,
                                     f"v{e}")]), epoch=e)
        maint.apply_epoch(e)
    table.merge(_events(spark, [(99, "D", "c2", 0, 50)]), epoch=3)
    maint.apply_epoch(3)
    table.vacuum(keep_versions=1, grace_seconds=0)
    maint.child.vacuum(keep_versions=1, grace_seconds=0)

    # the untagged epoch-0 cut is unreadable…
    with pytest.raises(SnapshotExpiredError):
        topo.at_epoch(0)
    # …but the pinned cut still reads, skew-free, pre-churn state
    snaps = topo.at_tag("corpus-v1")
    got = _rollup_pdf(snaps["rollup"])
    pd.testing.assert_frame_equal(
        got, _canon(conv_rollup(snaps["fact"]).toPandas()),
        check_dtype=False)
    assert set(got["conv_id"]) == {"c1", "c2"}  # c2 not yet deleted

    topo.drop_tag("corpus-v1")
    with pytest.raises(KeyError, match="corpus-v1"):
        topo.tables_at_tag("corpus-v1")
    # versions released: the next vacuum may expire them
    table.vacuum(keep_versions=1, grace_seconds=0)
    with pytest.raises(SnapshotExpiredError):
        topo.at_epoch(0)


def test_tag_is_all_or_nothing(spark, tmp_dir):
    """If any member already carries the ref name, tag() rolls back the
    tags it created — a half-pinned topology never exists."""
    e0 = _events(spark, [(1, "I", "c1", 0, 10)])
    e0.write.mode("overwrite").parquet(f"{tmp_dir}/log0")
    table, results = replay(spark, [f"{tmp_dir}/log0"], f"{tmp_dir}/t",
                            n_buckets=4)
    maint = RollupMaintainer(spark, table, f"{tmp_dir}/roll")
    maint.apply_epoch(results[0].epoch)
    # collide on the SECOND member (dict order: fact first)
    maint.child.create_tag("pin")
    topo = TopologySnapshot(spark, {"fact": table,
                                    "rollup": maint.child})
    from tap_github_search_spark.table.microlake import (
        ConcurrentCommitError,
    )
    with pytest.raises(ConcurrentCommitError):
        topo.tag("pin")
    assert "pin" not in table.list_refs()          # rolled back
    assert "pin" in maint.child.list_refs()        # pre-existing kept
    # a partial pin never reads as a cut
    with pytest.raises(KeyError, match="fact"):
        topo.tables_at_tag("pin")


def test_maintenance_commits_resolve_to_compacted_state(spark, tmp_dir):
    """Between two epochs a compact() rewrites files without advancing
    the fence — the cut at that epoch must resolve to the newest
    (compacted) version, same logical rows."""
    write_changelog(spark, f"{tmp_dir}/log", 80, n_files=2,
                    mutations_per_conv=6.0)
    table, results = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                            n_buckets=4, n_epochs=2, merge_mode="mor")
    before = TopologySnapshot(spark, {"fact": table}).tables_at()
    rows_before = before["fact"].snapshot_df().count()
    v_before = before["fact"].manifest["version"]
    table.compact()
    after = TopologySnapshot(spark, {"fact": table}).tables_at()
    # same fence, newer (compacted) version, identical live rows
    assert after["fact"].last_committed_epoch == \
        before["fact"].last_committed_epoch
    assert after["fact"].manifest["version"] > v_before
    assert after["fact"].snapshot_df().count() == rows_before
