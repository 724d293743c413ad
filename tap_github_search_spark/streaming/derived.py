"""Incrementally-maintained derived (child + grandchild) tables.

Reference analog: parent→child stream fan-out — every parent record
triggers child-stream extraction stamped with the parent key
(/root/reference/tap_github/repository_streams.py:195-209, SDK
`_sync_children`); reference chains go 3-4 deep (repositories →
pull_requests → pull_request_commits → diffs,
repository_streams.py:1412-1427). In the CDC engine the same capability
is an **incrementally-maintained materialized view chain**:

  transcripts ──(affected conv_ids)──▶ conv rollup
              ──(affected days)──────▶ daily activity rollup

After each MERGE epoch only the conversations the batch touched are
recomputed into the child, and only the days those conversations span
(before OR after the change — the old day set comes from the child's
previous snapshot version, i.e. time travel) are recomputed into the
grandchild. Work per epoch is O(affected keys), not O(table), at every
level.

Each level is itself a MicroLakeTable (same manifest/fence machinery);
synthetic WAL columns are derived: ``seq`` = commit epoch (monotone),
``op`` = 'D' when the key lost all live members. Each level's epoch
fence is independent, so a crash landing between the level-1 and
level-2 commits replays the batch, no-ops the committed levels, and
catches up the rest (crash-tested in tests/test_derived.py).

Constraint: the grandchild's old-day lookup loads the child's previous
snapshot version, so ``vacuum(keep_versions=1)`` on the child must not
run between a child commit and its grandchild catch-up.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table.microlake import MergeResult, MicroLakeTable

ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_tool_turns", T.LongType()),
        T.StructField("n_roles", T.LongType()),
        T.StructField("total_chars", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        # WAL-order column: derived from the commit epoch, NOT from data
        # timestamps — max(ts) can DECREASE when the newest turn is
        # deleted, which would make a newer rollup lose LWW to an older
        # one. Epoch time is monotone by construction.
        T.StructField("ts", T.TimestampType()),
    ]
)


DAILY_SCHEMA = T.StructType(
    [
        T.StructField("day", T.StringType()),       # yyyy-MM-dd of first_ts
        T.StructField("n_convs", T.LongType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("total_chars", T.LongType()),
        T.StructField("ts", T.TimestampType()),     # epoch time (monotone)
    ]
)

def _day_col():
    """yyyy-MM-dd of first_ts (built lazily: module imports before any
    SparkSession exists)."""
    return F.date_format("first_ts", "yyyy-MM-dd")


def daily_rollup(child_live: DataFrame) -> DataFrame:
    """The grandchild transform: per-day activity over conv rollups."""
    return child_live.groupBy(_day_col().alias("day")).agg(
        F.count("*").alias("n_convs"),
        F.sum("n_turns").alias("n_turns"),
        F.sum("total_chars").alias("total_chars"),
    )


def conv_rollup(live_turns: DataFrame) -> DataFrame:
    """The child-table transform: per-conversation rollup of live turns."""
    return live_turns.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count(F.when(F.col("role") == "tool", 1)).alias("n_tool_turns"),
        F.countDistinct("role").alias("n_roles"),
        F.sum(F.length("text")).alias("total_chars"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


class RollupMaintainer:
    """Keeps a per-conversation rollup table in lockstep with the main
    transcript table, one epoch at a time."""

    def __init__(self, spark: SparkSession, main: MicroLakeTable,
                 path: str, n_buckets: int | None = None,
                 daily_path: str | None = None):
        self.spark = spark
        self.main = main
        self.child = MicroLakeTable.create_or_load(
            spark, path, ROLLUP_SCHEMA,
            n_buckets=n_buckets or main.n_buckets, keys=("conv_id",),
        )
        self.grandchild = None
        if daily_path is not None:
            # day-keyed level 2: few distinct keys → few buckets
            self.grandchild = MicroLakeTable.create_or_load(
                spark, daily_path, DAILY_SCHEMA, n_buckets=8, keys=("day",),
            )

    def affected_conv_ids(self, epoch: int) -> DataFrame:
        """Distinct conv_ids staged in the given epoch — a skinny scan
        of that epoch's staged winner files only (stage dirs carry a
        writer-unique tag: ``epoch=N-<tag>``; rewrite/compact dirs have
        further suffixes and are excluded)."""
        data = os.path.join(self.main.path, "data")
        prefix = f"epoch={epoch}-"
        dirs = [
            os.path.join(data, d)
            for d in os.listdir(data)
            if d.startswith(prefix) and "." not in d[len(prefix):]
        ]
        return (
            self.spark.read.parquet(*dirs)
            .select("conv_id").distinct()
        )

    def apply_epoch(self, epoch: int) -> MergeResult:
        """Recompute rollups for the epoch's affected conversations and
        MERGE them into the child table (child epoch == parent epoch,
        same fence semantics), then cascade to the grandchild. Each
        level is fenced independently: on replay after a crash, levels
        already at ``epoch`` no-op and the rest catch up."""
        affected = self.affected_conv_ids(epoch)
        res = self._apply_child(epoch, affected)
        if self.grandchild is not None:
            self._apply_daily(epoch, affected)
        return res

    def _apply_child(self, epoch: int, affected: DataFrame) -> MergeResult:
        # Only affected conversations are read back from the main table;
        # the broadcast keeps the probe local (affected set ≪ table).
        live = self.main.snapshot_df().join(
            F.broadcast(affected), "conv_id", "inner"
        )
        rollups = conv_rollup(live)
        # conversations that lost every live turn → delete child row
        gone = affected.join(rollups.select("conv_id"), "conv_id",
                             "left_anti")
        epoch_ts = F.timestamp_seconds(F.lit(epoch))
        payload = [f.name for f in ROLLUP_SCHEMA.fields]
        events = rollups.withColumn("ts", epoch_ts).select(
            F.lit("U").alias("op"),
            F.lit(epoch).cast("long").alias("seq"),
            *payload,
        ).unionByName(
            gone.select(
                F.lit("D").alias("op"),
                F.lit(epoch).cast("long").alias("seq"),
                "conv_id",
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in ROLLUP_SCHEMA.fields
                    if f.name not in ("conv_id", "ts")
                ],
                epoch_ts.alias("ts"),
            ),
        )
        return self.child.merge(events, epoch=epoch)

    def _affected_days(self, epoch: int, affected: DataFrame) -> DataFrame:
        """Days whose aggregates the epoch may change: the affected
        conversations' days in the CURRENT child snapshot plus their
        days in the last child version committed BEFORE this epoch
        (time travel) — a conversation whose first_ts moved contributes
        both its old and new day."""
        cur = (
            self.child.snapshot_df()
            .join(F.broadcast(affected), "conv_id")
            .select(_day_col().alias("day"))
        )
        # newest child version committed before this epoch: walk versions
        # downward from the current manifest (1-2 loads in steady state)
        # instead of history(), which parses EVERY manifest ever written
        # — O(versions) driver work per epoch that compounds to
        # O(epochs²) over a long stream.
        prev = None
        v = self.child.manifest["version"]
        while v >= 0:
            try:
                cand = MicroLakeTable.load(self.spark, self.child.path, v)
            except FileNotFoundError:
                break  # expired by vacuum → no pre-epoch days available
            if cand.last_committed_epoch < epoch:
                prev = cand
                break
            v -= 1
        if prev is not None:
            old = (
                prev.snapshot_df()
                .join(F.broadcast(affected), "conv_id")
                .select(_day_col().alias("day"))
            )
            cur = cur.unionByName(old)
        return cur.distinct()

    def _apply_daily(self, epoch: int, affected: DataFrame) -> MergeResult:
        """Level-2 maintenance: recompute the affected days from the
        current child state and MERGE into the day-keyed grandchild
        (own fence, same epoch)."""
        if epoch <= self.grandchild.last_committed_epoch:
            return MergeResult(epoch=epoch, skipped=True)
        days = self._affected_days(epoch, affected)
        live = (
            self.child.snapshot_df()
            .withColumn("day", _day_col())
            .join(F.broadcast(days), "day")
        )
        rollups = live.groupBy("day").agg(
            F.count("*").alias("n_convs"),
            F.sum("n_turns").alias("n_turns"),
            F.sum("total_chars").alias("total_chars"),
        )
        gone = days.join(rollups.select("day"), "day", "left_anti")
        epoch_ts = F.timestamp_seconds(F.lit(epoch))
        payload = [f.name for f in DAILY_SCHEMA.fields]
        events = rollups.withColumn("ts", epoch_ts).select(
            F.lit("U").alias("op"),
            F.lit(epoch).cast("long").alias("seq"),
            *payload,
        ).unionByName(
            gone.select(
                F.lit("D").alias("op"),
                F.lit(epoch).cast("long").alias("seq"),
                "day",
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in DAILY_SCHEMA.fields
                    if f.name not in ("day", "ts")
                ],
                epoch_ts.alias("ts"),
            ),
        )
        return self.grandchild.merge(events, epoch=epoch)
