"""Incrementally-maintained derived (child) tables.

Reference analog: parent→child stream fan-out — every parent record
triggers child-stream extraction stamped with the parent key
(/root/reference/tap_github/repository_streams.py:195-209, SDK
`_sync_children`). In the CDC engine the same capability is a
**incrementally-maintained materialized view**: after each MERGE epoch,
only the conversations the batch touched are recomputed from the main
table and upserted into the child table. Work per epoch is
O(affected keys), not O(table).

The child table is itself a MicroLakeTable (same manifest/fence
machinery), keyed by ``conv_id``; synthetic WAL columns are derived:
``seq`` = commit epoch (monotone), ``op`` = 'D' when the conversation
lost all live turns, else 'U'. The epoch fence therefore protects the
child exactly like the parent.
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
                 path: str, n_buckets: int | None = None):
        self.spark = spark
        self.main = main
        self.child = MicroLakeTable.create_or_load(
            spark, path, ROLLUP_SCHEMA,
            n_buckets=n_buckets or main.n_buckets, keys=("conv_id",),
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
        same fence semantics)."""
        affected = self.affected_conv_ids(epoch)
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
