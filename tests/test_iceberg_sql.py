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


def test_rebucket_sql_spec_evolution():
    from tap_github_search_spark.table.iceberg import rebucket_sql

    stmts = rebucket_sql("lake.db.t", 64, 4096)
    assert stmts[0] == (
        "ALTER TABLE lake.db.t REPLACE PARTITION FIELD "
        "bucket(64, conv_id) WITH bucket(4096, conv_id)"
    )
    assert "rewrite_data_files" in stmts[1]
    assert "'rewrite-all', 'true'" in stmts[1]


def test_maintenance_sql_vacuum_grace_and_changelog():
    from tap_github_search_spark.table.iceberg import (
        changelog_sql,
        compact_sql,
        vacuum_sql,
    )

    assert compact_sql("lake.db.t") == (
        "CALL lake.system.rewrite_data_files(table => 'lake.db.t')"
    )
    v = vacuum_sql("lake.db.t", keep_versions=3, grace_hours=2)
    assert "retain_last => 3" in v[0]
    # the in-flight-writer grace window MicroLake's grace_seconds models
    assert "older_than => current_timestamp() - INTERVAL 2 HOURS" in v[1]
    c = changelog_sql("lake.db.t", 11, 42)
    assert "'start-snapshot-id', '11'" in c
    assert "'end-snapshot-id', '42'" in c


def test_rename_drop_maintain_sql_twins():
    from tap_github_search_spark.table.iceberg import (
        drop_column_sql,
        maintain_sql,
        rename_column_sql,
    )

    assert rename_column_sql("lake.db.t", "text", "body") == \
        "ALTER TABLE lake.db.t RENAME COLUMN text TO body"
    assert drop_column_sql("lake.db.t", "tool") == \
        "ALTER TABLE lake.db.t DROP COLUMN tool"
    stmts = maintain_sql("lake.db.t", keep_versions=4, grace_hours=2)
    assert len(stmts) == 3
    assert "rewrite_data_files" in stmts[0]
    assert "retain_last => 4" in stmts[1]
    assert "INTERVAL 2 HOURS" in stmts[2]
