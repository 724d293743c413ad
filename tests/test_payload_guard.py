"""S7 large-blob guard tests (reference: tap_github/client.py:324-370 —
40 MiB cap, tolerated errors become typed {success, error_message} rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tap_github_search_spark.operators.payload_guard import (
    DEFAULT_MAX_BYTES,
    guard_payload,
)


def test_guard_payload_typed_error_rows(spark):
    df = spark.createDataFrame(
        [
            ("d1", "ok body"),
            ("d2", "y" * 50),          # oversize
            ("d3", None),              # null payload: success, empty content
            (None, "orphan"),          # missing required field
        ],
        "doc_id string, body string",
    )
    out = {
        r["doc_id"]: r
        for r in guard_payload(
            df, "body", max_bytes=20, required=("doc_id",)
        ).collect()
    }
    assert out["d1"]["success"] and out["d1"]["body"] == "ok body"
    assert out["d1"]["error_message"] is None
    assert not out["d2"]["success"] and out["d2"]["body"] is None
    assert out["d2"]["error_message"] == "payload too large: 50 > 20 bytes"
    assert out["d3"]["success"] and out["d3"]["body"] is None
    bad = out[None]
    assert not bad["success"]
    assert bad["error_message"] == "missing field: doc_id"


def test_guard_payload_counts_utf8_bytes_not_chars(spark):
    # octet_length: "é" is 2 UTF-8 bytes — a 6-char string of them is 12B
    df = spark.createDataFrame([("d1", "é" * 6)], "doc_id string, body string")
    ok = guard_payload(df, "body", max_bytes=12).first()
    assert ok["success"]
    bad = guard_payload(df, "body", max_bytes=11).first()
    assert not bad["success"] and "12 > 11" in bad["error_message"]


def test_guard_payload_default_cap_matches_reference(spark):
    assert DEFAULT_MAX_BYTES == 41943040  # client.py:334 MAX_BYTES


def test_guard_is_pure_expressions_no_shuffle(spark):
    """The guard must add no Exchange and no Python UDF — it has to run
    inline in the ingest scan at 100 TB."""
    df = spark.range(100).select(
        F.col("id").cast("string").alias("doc_id"),
        F.repeat(F.lit("x"), (F.col("id") * 7 % 40).cast("int")).alias("body"),
    )
    plan = guard_payload(df, "body", max_bytes=20)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
