"""Canonical schemas for the CDC engine.

The change-event core is fixed by the task's ``input_hint``
(BASELINE.json:15): ``(conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp)``, extended with the WAL
ordering columns ``op``/``seq`` that carry the "ordered
insert/update/delete events" semantics of the north_rule.

Reference analogs (read-only at /root/reference):
 - primary keys: ``tap_github_search/search_count_streams.py:42``
 - replication key (cursor): ``tap_github/repository_streams.py:38``
 - bookmark state shape: ``tap_github_search/search_count_streams.py:147-152``
"""

from __future__ import annotations

from pyspark.sql import types as T

# MERGE key, per input_hint.
MERGE_KEYS = ("conv_id", "turn_idx")

# LWW ordering: event-time first, log sequence as total-order tiebreaker.
# Reference analog: bookmark advances to max(replication_key)
# (tap_github/tests/test_tap.py:150-161).
LWW_ORDER = ("ts", "seq")

#: The WAL / binlog event. ``op`` in {'I','U','D'}.
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), nullable=False),
        T.StructField("op", T.StringType(), nullable=False),
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("role", T.StringType(), nullable=True),
        T.StructField("text", T.StringType(), nullable=True),
        T.StructField("tool", T.StringType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=False),
    ]
)

#: Evolved event: late-appearing nullable columns (FIXTURES.md §3).
EVOLVED_EXTRA_FIELDS = [
    T.StructField("tool_version", T.StringType(), nullable=True),
    T.StructField("lang", T.StringType(), nullable=True),
]

#: Final materialized transcript row (table payload, no engine metadata).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("role", T.StringType(), nullable=True),
        T.StructField("text", T.StringType(), nullable=True),
        T.StructField("tool", T.StringType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=False),
    ]
)

#: Per-partition lineage emitted every commit epoch (FIXTURES.md §5).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("commit_epoch", T.LongType(), nullable=False),
        T.StructField("partition_id", T.IntegerType(), nullable=False),
        T.StructField("seq_min", T.LongType(), nullable=False),
        T.StructField("seq_max", T.LongType(), nullable=False),
        T.StructField("rows_applied", T.LongType(), nullable=False),
        T.StructField("rows_deleted", T.LongType(), nullable=False),
        T.StructField("committed_at", T.TimestampType(), nullable=False),
    ]
)

#: Per-epoch metrics (FIXTURES.md §5).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("commit_epoch", T.LongType(), nullable=False),
        T.StructField("events_in", T.LongType(), nullable=False),
        T.StructField("events_rejected", T.LongType(), nullable=False),
        T.StructField("events_deduped", T.LongType(), nullable=False),
        T.StructField("merge_ms", T.LongType(), nullable=False),
        T.StructField("throughput_eps", T.DoubleType(), nullable=False),
    ]
)


def payload_fields(schema: T.StructType) -> list[str]:
    """Columns that belong to the upserted row (everything but op/seq)."""
    return [f.name for f in schema.fields if f.name not in ("op", "seq")]
