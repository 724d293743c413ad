"""Stateful streaming sessionization vs its batch twin."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tap_github_search_spark.sources.generator import write_changelog
from tap_github_search_spark.streaming.sessions import (
    batch_sessions,
    stream_sessions,
)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["conv_id", "session_id"]).reset_index(drop=True)
    for c in ("session_start", "session_end"):
        pdf[c] = pd.to_datetime(pdf[c], utc=True).astype("datetime64[us, UTC]")
    return pdf


def test_batch_sessions_gap_semantics(spark):
    from tests.test_engine import _events

    # gaps: 0-10-20 (one session), 5000 later (new), 9000 later (new)
    df = _events(spark, [(1, "I", "c1", 0, 0), (2, "I", "c1", 1, 10),
                         (3, "I", "c1", 2, 20), (4, "I", "c1", 3, 5020),
                         (5, "I", "c1", 4, 14500)])
    got = {
        r["session_id"]: r["n_events"]
        for r in batch_sessions(df, gap_s=3600).collect()
    }
    assert got == {0: 3, 1: 1, 2: 1}


def test_stream_sessions_match_batch_closed_set(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 80, n_files=4)
    streamed = _canon(
        stream_sessions(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/ckpt",
                        gap_s=3600, watermark="2 hours").toPandas()
    )
    batch = _canon(
        batch_sessions(
            spark.read.parquet(f"{tmp_dir}/log").select("conv_id", "ts"),
            gap_s=3600,
        ).toPandas()
    )
    # every streamed (closed) session must match the batch result exactly
    assert len(streamed) > 0
    merged = streamed.merge(
        batch, on=["conv_id", "session_id"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(streamed)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["session_start_s"] == merged["session_start_b"]).all()
    assert (merged["session_end_s"] == merged["session_end_b"]).all()
    # only sessions still open at the watermark horizon may be missing
    open_ok = batch.merge(
        streamed[["conv_id", "session_id"]],
        on=["conv_id", "session_id"],
        how="left",
        indicator=True,
    )
    missing = open_ok[open_ok["_merge"] == "left_only"]
    if len(missing):
        # a missing session must be its conversation's LAST session
        last = batch.groupby("conv_id")["session_id"].max().rename("max_sid")
        chk = missing.join(last, on="conv_id")
        assert (chk["session_id"] == chk["max_sid"]).all()
