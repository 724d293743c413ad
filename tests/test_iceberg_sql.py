"""SQL-text tests for the Iceberg adapter (the jar is unavailable in
this sandbox, so the generated DDL/DML is pinned instead; the MERGE
semantics themselves are covered by MicroLake's oracle tests, which
implement the same contract)."""

from __future__ import annotations

from pyspark.sql import types as T

from tap_github_search_spark.table.iceberg import (
    add_columns_sql,
    create_table_sql,
    merge_sql,
    set_epoch_sql,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def test_create_table_sql_bucketed_v2():
    sql = create_table_sql("lake.transcripts", SCHEMA, n_buckets=512)
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (bucket(512, conv_id))" in sql
    assert "'format-version'='2'" in sql
    assert "engine.last_committed_epoch" in sql
    assert "conv_id string" in sql and "turn_idx int" in sql


def test_add_columns_sql():
    stmts = add_columns_sql(
        "lake.t", [T.StructField("tool_version", T.StringType())]
    )
    assert stmts == ["ALTER TABLE lake.t ADD COLUMN tool_version string"]


def test_merge_sql_lww_guards():
    sql = merge_sql(
        "lake.t", "batch_v",
        payload_cols=["conv_id", "turn_idx", "text", "ts"],
    )
    # within-batch LWW dedup
    assert "PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC" in sql
    assert "WHERE _rn = 1" in sql
    # delete ranked with updates, both guarded by (ts, seq)
    assert "WHEN MATCHED AND s.op = 'D'" in sql
    assert "s.ts = t.ts AND s.seq > t._seq" in sql
    assert "THEN DELETE" in sql
    # stale rows never overwrite newer ones
    assert "WHEN MATCHED AND s.op <> 'D'" in sql
    # delete events for absent keys are dropped
    assert "WHEN NOT MATCHED AND s.op <> 'D'" in sql
    assert "t._seq = s.seq" in sql


def test_epoch_fence_sql():
    sql = set_epoch_sql("lake.t", 7)
    assert "SET TBLPROPERTIES" in sql
    assert "'engine.last_committed_epoch'='7'" in sql
