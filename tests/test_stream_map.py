"""Stream-map (Singer SDK stream_maps analog) tests: config-driven
inline transforms — computed columns, row filter, column drops — applied
at extraction time, reflected in the evolved table schema, and identical
between batch replay and streaming."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tap_github_search_spark.sources.generator import write_changelog
from tap_github_search_spark.streaming.job import (
    apply_stream_map,
    replay,
    stream,
    validate_stream_map,
)

SPEC = {
    "columns": {"text_len": "length(text)",
                "is_tool_turn": "role = 'tool'"},
    "filter": "role <> 'system'",
    "drop": ["tool"],
}


def _oracle(log_glob: str) -> pd.DataFrame:
    return (
        duckdb.sql(f"""
        SELECT conv_id, turn_idx, role,
               nfc_normalize(replace(text, chr(0), '')) AS text, ts,
               length(text) AS text_len, role = 'tool' AS is_tool_turn
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) rn
          FROM read_parquet({log_glob}) WHERE role <> 'system'
        ) WHERE rn = 1 AND op <> 'D'
        """)
        .df().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True)
    return pdf[sorted(pdf.columns)]


def test_stream_map_replay_matches_oracle(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 120, n_files=4)
    table, _ = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                      n_buckets=8, n_epochs=2, stream_map=SPEC)
    names = [f.name for f in table.schema.fields]
    assert "text_len" in names and "is_tool_turn" in names
    assert "tool" not in names
    ours = _canon(table.snapshot_df().toPandas())
    # NOTE: text_len is computed on the RAW text (extraction-time map,
    # before ingest normalization) — recompute oracle's text_len the
    # same way: length of pre-normalized text
    expect = _canon(_oracle(f"'{tmp_dir}/log/*.parquet'"))
    pd.testing.assert_frame_equal(ours, expect, check_dtype=False)


def test_stream_map_streaming_matches_batch(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 100, n_files=4)
    t_s = stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/ts", f"{tmp_dir}/ck",
                 n_buckets=8, max_files_per_trigger=2, stream_map=SPEC)
    t_b, _ = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/tb",
                    n_buckets=8, stream_map=SPEC)
    a = _canon(t_s.snapshot_df().toPandas())
    b = _canon(t_b.snapshot_df().toPandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stream_map_validation(spark):
    with pytest.raises(ValueError, match="unknown stream_map keys"):
        validate_stream_map({"select": ["a"]})
    with pytest.raises(ValueError, match="WAL/key columns"):
        validate_stream_map({"drop": ["seq"]})
    with pytest.raises(ValueError, match="WAL/key columns"):
        validate_stream_map({"columns": {"conv_id": "upper(conv_id)"}})
    # ADVICE r2 #3: ts is the primary LWW ordering column — dropping it
    # breaks every merge at analysis time; redefining it silently changes
    # winner selection table-wide. Both must be rejected.
    with pytest.raises(ValueError, match="WAL/key columns"):
        validate_stream_map({"drop": ["ts"]})
    with pytest.raises(ValueError, match="WAL/key columns"):
        validate_stream_map({"columns": {"ts": "current_timestamp()"}})


def test_stream_map_is_codegen_not_python(spark):
    df = spark.range(10).select(
        F.col("id").cast("string").alias("text"),
        F.lit("user").alias("role"),
    )
    out = apply_stream_map(df, SPEC)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
