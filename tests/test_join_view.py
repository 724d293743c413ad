"""JoinViewMaintainer: incremental fact⋈dim view vs full recompute,
dim-driven re-enrichment, crash/restart idempotence, and the streamed
wiring — each against the batch ground-truth twin (and the final state
against an independent DuckDB recomputation from the raw WALs)."""

from __future__ import annotations

import duckdb
import glob

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_github_search_spark.sources.generator import (
    dim_changelog_df,
    write_changelog,
    write_dim_changelog,
)
from tap_github_search_spark.streaming.job import replay, stream
from tap_github_search_spark.streaming.joinview import (
    JoinViewMaintainer,
    join_view_state,
)
from tap_github_search_spark.table.microlake import MicroLakeTable

DIM_SCHEMA = T.StructType(
    [
        T.StructField("tool", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("cost_tier", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _dim_table(spark, path, upto_seq=None, epoch=0):
    """Create/advance a dim table from the fixed dim changelog, applying
    rows with seq <= upto_seq as one merge epoch."""
    dim = MicroLakeTable.create_or_load(
        spark, path, DIM_SCHEMA, n_buckets=4, keys=("tool",)
    )
    log = dim_changelog_df(spark)
    if upto_seq is not None:
        log = log.filter(F.col("seq") <= upto_seq)
    dim.merge(log, epoch=epoch)
    return dim


def _assert_view_equals_truth(maint, fact, dim):
    got = (
        maint.view.snapshot_df().drop("ts")
        .orderBy("conv_id", "turn_idx").toPandas()
    )
    exp = (
        join_view_state(fact, dim)
        .select(*got.columns)
        .orderBy("conv_id", "turn_idx").toPandas()
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False,
    )
    return got


def test_incremental_equals_full_recompute_with_dim_churn(spark, tmp_dir):
    """Fact epochs interleaved with dim updates: after each fact epoch
    the view must equal the batch twin computed from the two current
    snapshots; the final state is independently cross-checked in
    DuckDB from the raw WALs."""
    write_changelog(spark, f"{tmp_dir}/log", 60, n_files=4)
    # dim starts with only the first 4 inserts
    dim = _dim_table(spark, f"{tmp_dir}/dim", upto_seq=4, epoch=0)
    fact = MicroLakeTable.create_or_load(
        spark, f"{tmp_dir}/fact",
        spark.read.parquet(f"{tmp_dir}/log").drop("seq", "op").schema,
    )
    maint = JoinViewMaintainer(spark, fact, dim, f"{tmp_dir}/view")

    log = spark.read.parquet(f"{tmp_dir}/log")
    lo, hi = log.select(F.min("seq"), F.max("seq")).first()
    step = (hi - lo + 1) // 3 + 1
    for i in range(3):
        part = log.filter(
            (F.col("seq") >= lo + i * step)
            & (F.col("seq") < lo + (i + 1) * step)
        )
        fact.merge(part, epoch=i)
        if i == 1:
            # dim churn between fact epochs: tier bump + category move
            # + the shell insert/delete (seq 5-8)
            _dim_table(spark, f"{tmp_dir}/dim", epoch=1)
        maint.apply_epoch(i)
        cur_dim = MicroLakeTable.load(spark, f"{tmp_dir}/dim")
        _assert_view_equals_truth(maint, fact, cur_dim)

    got = maint.view.snapshot_df().drop("ts").toPandas()
    files = sorted(glob.glob(f"{tmp_dir}/log/*.parquet"))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    dim_pdf = dim_changelog_df(spark).toPandas()
    con.register("dim_log", dim_pdf)
    exp = con.execute(f"""
      WITH fw AS (
        SELECT * FROM (SELECT *, row_number() OVER (
          PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) rn
          FROM read_parquet({files!r})) WHERE rn = 1 AND op <> 'D'),
      dw AS (
        SELECT * FROM (SELECT *, row_number() OVER (
          PARTITION BY tool ORDER BY ts DESC, seq DESC) rn
          FROM dim_log) WHERE rn = 1 AND op <> 'D')
      SELECT fw.conv_id, fw.turn_idx, fw.role, fw.tool,
             fw.ts AS turn_ts, dw.category, dw.cost_tier
      FROM fw LEFT JOIN dw USING (tool)
      ORDER BY conv_id, turn_idx
    """).df()
    # text excluded: these merges skip the normalizer (covered by the
    # batch-twin assert above); the cross-check targets the JOIN
    got = got[exp.columns].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got["turn_ts"] = pd.to_datetime(got["turn_ts"], utc=True).dt.tz_localize(None)
    exp["turn_ts"] = pd.to_datetime(exp["turn_ts"], utc=True).dt.tz_localize(None)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dim_only_change_reenriches_without_fact_traffic(spark, tmp_dir):
    """A dim commit with NO fact rows in the epoch still re-enriches
    exactly the fact rows of the changed dim keys (delta-join dim
    side), including nulling out rows whose dim key was deleted."""
    write_changelog(spark, f"{tmp_dir}/log", 40, n_files=2)
    dim = _dim_table(spark, f"{tmp_dir}/dim", upto_seq=5, epoch=0)
    fact, _ = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/fact")
    maint = JoinViewMaintainer(spark, fact, dim, f"{tmp_dir}/view")
    ep = fact.last_committed_epoch
    maint.apply_epoch(ep)
    before = maint.view.snapshot_df()
    n_editor = before.filter(F.col("tool") == "editor").count()
    assert n_editor > 0
    assert before.filter(
        (F.col("tool") == "editor") & F.col("category").isNull()
    ).count() == 0

    # dim-only epoch: python tier bump (U), search category move (U),
    # editor DELETED (extra row beyond the fixture) — no fact traffic
    extra = spark.createDataFrame(
        [(9, "U", "python", "compute", 9),
         (10, "D", "editor", None, None)],
        "seq long, op string, tool string, category string, cost_tier int",
    ).withColumn("ts", F.timestamp_seconds(F.col("seq") * 60))
    dim.merge(dim_changelog_df(spark).unionByName(extra), epoch=1)

    fact.merge(
        spark.createDataFrame([], spark.read.parquet(f"{tmp_dir}/log").schema),
        epoch=ep + 1,
    )
    maint.apply_epoch(ep + 1)
    after = maint.view.snapshot_df()
    # editor rows survive (left join) but lost their enrichment
    assert after.filter(F.col("tool") == "editor").count() == n_editor
    assert after.filter(
        (F.col("tool") == "editor") & F.col("category").isNotNull()
    ).count() == 0
    # python rows got the new tier
    assert after.filter(
        (F.col("tool") == "python") & (F.col("cost_tier") != 9)
    ).count() == 0
    cur_dim = MicroLakeTable.load(spark, f"{tmp_dir}/dim")
    _assert_view_equals_truth(maint, fact, cur_dim)


def test_crash_between_fact_and_view_commit_replays_clean(spark, tmp_dir):
    """Crash landing after the fact commit but before the view commit:
    the redelivered epoch no-ops the fact fence and the view catches up
    using the dim version fenced in its OWN manifest."""
    write_changelog(spark, f"{tmp_dir}/log", 40, n_files=2)
    dim = _dim_table(spark, f"{tmp_dir}/dim", epoch=0)
    fact, _ = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/fact",
                     n_epochs=2)
    maint = JoinViewMaintainer(spark, fact, dim, f"{tmp_dir}/view")
    maint.apply_epoch(0)
    # epoch 1 committed on the fact, "crash" before the view ran;
    # a dim change lands while we are down
    extra = spark.createDataFrame(
        [(9, "U", "browser", "web", 7)],
        "seq long, op string, tool string, category string, cost_tier int",
    ).withColumn("ts", F.timestamp_seconds(F.col("seq") * 60))
    dim.merge(dim_changelog_df(spark).unionByName(extra), epoch=1)
    # restart: fresh maintainer (manifests re-read), fact merge no-ops,
    # view catches up epoch 1 and sees the new dim
    dim2 = MicroLakeTable.load(spark, f"{tmp_dir}/dim")
    maint2 = JoinViewMaintainer(spark, fact, dim2, f"{tmp_dir}/view")
    res = maint2.apply_epoch(1)
    assert not res.skipped
    _assert_view_equals_truth(maint2, fact, dim2)
    assert int(maint2.view.manifest["dim_version_seen"]) == \
        int(dim2.manifest["version"])
    # replaying the committed epoch is a no-op
    assert maint2.apply_epoch(1).skipped


def test_streamed_wiring_with_crash_restart(spark, tmp_dir):
    """stream(join_view_path=..., dim_path=...) composes the view with
    the other maintainers under crash injection."""
    write_changelog(spark, f"{tmp_dir}/log", 40, n_files=4)
    dim = _dim_table(spark, f"{tmp_dir}/dim", epoch=0)
    kw = dict(join_view_path=f"{tmp_dir}/view", dim_path=f"{tmp_dir}/dim",
              n_buckets=8)
    try:
        stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
               f"{tmp_dir}/ckpt", fail_after_batches=1, **kw)
    except Exception:
        pass
    fact = stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                  f"{tmp_dir}/ckpt", **kw)
    view = MicroLakeTable.load(spark, f"{tmp_dir}/view")
    got = view.snapshot_df().drop("ts")
    exp = join_view_state(fact, dim).select(*got.columns)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    assert got.count() == fact.snapshot_df().count()
