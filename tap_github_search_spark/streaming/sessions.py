"""Custom stateful streaming operator: gap-based conversation
sessionization via ``applyInPandasWithState`` (task brief: "custom
stateful operators"; SURVEY.md §2.11).

Semantics: within each ``conv_id``, events more than ``gap`` seconds
apart start a new session. The streaming form keeps per-conversation
state (last event time, session start, counters) across microbatches
and emits a session row when the watermark passes its close; the batch
twin computes identical sessions with a window lag/cumsum — used as the
test oracle.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "conv_id string, session_id int, session_start timestamp, "
    "session_end timestamp, n_events long"
)
STATE_SCHEMA = (
    "session_id int, session_start long, session_end long, n_events long"
)


def batch_sessions(df: DataFrame, gap_s: int = 3600) -> DataFrame:
    """Batch oracle: lag + cumulative sum of gap-breaks per conv_id."""
    w = Window.partitionBy("conv_id").orderBy("ts")
    brk = (
        F.when(
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long")).over(w) > gap_s,
            1,
        )
        .otherwise(0)
    )
    return (
        df.withColumn("_brk", brk)
        .withColumn("session_id", F.sum("_brk").over(w).cast("int"))
        .groupBy("conv_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


def stream_sessions(
    spark: SparkSession,
    log_dirs: list[str],
    checkpoint_dir: str,
    gap_s: int = 3600,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = 4,
) -> DataFrame:
    """Streaming sessionization with explicit keyed state. Sessions are
    emitted when closed — either by a later event past the gap, or by
    state timeout once the watermark passes. ``availableNow`` over a
    finite log closes everything except each conversation's last open
    session inside the watermark horizon."""
    schema_src = spark.read.option("mergeSchema", "true").parquet(*log_dirs)
    reader = spark.readStream.schema(schema_src.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = None
    for d in log_dirs:
        part = reader.parquet(d).select("conv_id", "ts")
        src = part if src is None else src.unionByName(part)

    def update(
        key: Any,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                sid, s0, s1, n = state.get
                closed.append((conv_id, sid, s0, s1, n))
                state.remove()
        else:
            ts_all = pd.concat([p["ts"] for p in pdfs]).sort_values()
            sid, s0, s1, n = (
                state.get if state.exists else (0, None, None, 0)
            )
            for t in ts_all:
                t_us = int(t.value // 1000)  # pandas ns → µs epoch
                if s0 is None:
                    s0 = s1 = t_us
                    n = 1
                elif (t_us - s1) > gap_s * 1_000_000:
                    closed.append((conv_id, sid, s0, s1, n))
                    sid, s0, s1, n = sid + 1, t_us, t_us, 1
                else:
                    s1 = t_us
                    n += 1
            state.update((sid, s0, s1, n))
            state.setTimeoutTimestamp(
                s1 // 1000 + gap_s * 1000
            )  # close after gap of silence (event-time ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "conv_id", "session_id", "session_start",
                    "session_end", "n_events",
                ],
            ).astype({"session_start": "datetime64[us]",
                      "session_end": "datetime64[us]"})

    out = (
        src.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("sessions_out")
