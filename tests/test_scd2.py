"""Scd2Maintainer: change_feed-driven type-2 dimension history vs the
snapshot-diff ground-truth twin, as-of reconstruction, delete/reinsert
interval handling, crash/restart idempotence, and streamed wiring."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tap_github_search_spark.sources.generator import (
    dim_changelog_df,
    write_changelog,
)
from tap_github_search_spark.streaming.job import stream
from tap_github_search_spark.streaming.scd2 import (
    Scd2Maintainer,
    scd2_expected,
)
from tap_github_search_spark.table.microlake import MicroLakeTable
from tests.test_join_view import _dim_table


def _hist_pdf(df):
    cols = ["tool", "category", "cost_tier", "effective_from",
            "effective_to", "is_current"]
    return (
        df.select(*cols).toPandas()
        .sort_values(["tool", "effective_from"]).reset_index(drop=True)
    )


def _extra(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, tool string, category string, "
        "cost_tier int",
    ).withColumn("ts", F.timestamp_seconds(F.col("seq") * 60))


def test_incremental_equals_snapshot_diff_twin(spark, tmp_dir):
    """Dim churn over several epochs (inserts, updates, a delete, a
    re-insert): after every consumed epoch the history equals the twin
    rebuilt by diffing the time-traveled snapshots at exactly the
    consumed versions."""
    dim = _dim_table(spark, f"{tmp_dir}/dim", upto_seq=4, epoch=0)
    maint = Scd2Maintainer(spark, dim, f"{tmp_dir}/hist")
    consumed = []

    def step(epoch):
        maint.apply_epoch(epoch)
        v = int(maint.hist.manifest["dim_version_seen"])
        if not consumed or consumed[-1] != v:
            consumed.append(v)
        exp = scd2_expected(spark, f"{tmp_dir}/dim", consumed, ("tool",))
        pd.testing.assert_frame_equal(
            _hist_pdf(maint.hist.snapshot_df()), _hist_pdf(exp),
            check_dtype=False,
        )

    step(0)
    # full fixture: python tier bump (U), shell insert+delete collapse
    _dim_table(spark, f"{tmp_dir}/dim", epoch=1)
    step(1)
    # delete browser, re-insert it with new payload two epochs later
    d = MicroLakeTable.load(spark, f"{tmp_dir}/dim")
    d.merge(dim_changelog_df(spark).unionByName(
        _extra(spark, [(20, "D", "browser", None, None)])), epoch=2)
    step(2)
    d.merge(dim_changelog_df(spark).unionByName(
        _extra(spark, [(21, "I", "browser", "web", 9)])), epoch=3)
    step(3)
    hist = maint.hist.snapshot_df()
    browser = _hist_pdf(hist[hist.tool == "browser"])
    # two intervals: the original (closed at the delete) + the re-insert
    assert len(browser) == 2
    assert browser.iloc[0]["effective_to"] <= \
        browser.iloc[1]["effective_from"]
    assert list(browser["is_current"]) == [0, 1]
    assert browser.iloc[1]["cost_tier"] == 9


def test_as_of_reconstruction_and_quiet_epochs(spark, tmp_dir):
    """as_of(v) rebuilt from the history equals the time-traveled dim
    snapshot at every consumed version; quiet epochs advance the fence
    without touching the history."""
    dim = _dim_table(spark, f"{tmp_dir}/dim", upto_seq=4, epoch=0)
    maint = Scd2Maintainer(spark, dim, f"{tmp_dir}/hist")
    maint.apply_epoch(0)
    v0 = int(maint.hist.manifest["dim_version_seen"])
    _dim_table(spark, f"{tmp_dir}/dim", epoch=1)
    maint.apply_epoch(1)
    v1 = int(maint.hist.manifest["dim_version_seen"])
    assert v1 > v0
    n_rows = maint.hist.snapshot_df().count()
    # quiet epoch: fence advances, history unchanged
    maint.apply_epoch(2)
    assert maint.hist.last_committed_epoch == 2
    assert int(maint.hist.manifest["dim_version_seen"]) == v1
    assert maint.hist.snapshot_df().count() == n_rows
    for v in (v0, v1):
        got = (
            maint.as_of(v).toPandas()
            .sort_values("tool").reset_index(drop=True)
        )
        exp = (
            MicroLakeTable.load(spark, f"{tmp_dir}/dim", v)
            .snapshot_df().select("tool", "category", "cost_tier")
            .toPandas().sort_values("tool").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_crash_replay_is_idempotent(spark, tmp_dir):
    """A fresh maintainer replaying a committed epoch no-ops; replaying
    an UNcommitted epoch after a crash recomputes identical rows."""
    dim = _dim_table(spark, f"{tmp_dir}/dim", upto_seq=4, epoch=0)
    maint = Scd2Maintainer(spark, dim, f"{tmp_dir}/hist")
    maint.apply_epoch(0)
    _dim_table(spark, f"{tmp_dir}/dim", epoch=1)
    # crash before the view epoch ran; restart with a fresh maintainer
    dim2 = MicroLakeTable.load(spark, f"{tmp_dir}/dim")
    maint2 = Scd2Maintainer(spark, dim2, f"{tmp_dir}/hist")
    assert maint2.apply_epoch(0).skipped
    res = maint2.apply_epoch(1)
    assert not res.skipped
    before = _hist_pdf(maint2.hist.snapshot_df())
    # replay of the now-committed epoch is a no-op
    assert maint2.apply_epoch(1).skipped
    pd.testing.assert_frame_equal(
        _hist_pdf(maint2.hist.snapshot_df()), before, check_dtype=False,
    )


def test_streamed_wiring_with_crash_restart(spark, tmp_dir):
    """stream(scd2_path=..., dim_path=...) composes the history
    maintainer with the stream under crash injection; the final history
    current slice equals the dim's final state."""
    write_changelog(spark, f"{tmp_dir}/log", 30, n_files=3)
    _dim_table(spark, f"{tmp_dir}/dim", epoch=0)
    kw = dict(scd2_path=f"{tmp_dir}/hist", dim_path=f"{tmp_dir}/dim",
              n_buckets=8)
    try:
        stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
               f"{tmp_dir}/ckpt", fail_after_batches=1, **kw)
    except Exception:
        pass
    stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t", f"{tmp_dir}/ckpt",
           **kw)
    hist = MicroLakeTable.load(spark, f"{tmp_dir}/hist")
    cur = (
        hist.snapshot_df().filter(F.col("is_current") == 1)
        .select("tool", "category", "cost_tier")
    )
    dim_now = (
        MicroLakeTable.load(spark, f"{tmp_dir}/dim").snapshot_df()
        .select("tool", "category", "cost_tier")
    )
    assert cur.exceptAll(dim_now).count() == 0
    assert dim_now.exceptAll(cur).count() == 0
