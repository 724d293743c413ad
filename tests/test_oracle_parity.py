"""Driver-shaped correctness gate: every catalog query at sf0.01 must
match its DuckDB oracle on row count, column names, and values
(order-insensitive) — the same comparison CORRECTNESS_r{N}.json records.

Mirrors the reference's final-state assertion
(/root/reference/tap_github/tests/test_tap.py:130-161): an independent
implementation of the same semantics must agree exactly.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from tap_github_search_spark.plans.queries import REGISTRY
from tap_github_search_spark.sources.generator import ensure_changelog

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values — order-insensitive
    canonical form, with timestamps coerced to UTC and floats rounded
    to hash-stable precision."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c], utc=True)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def render(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-shaped rendering: every cell stringified AS ITS DTYPE
    RENDERS, so an int column and a float column holding the same
    values (DuckDB HUGEINT→float64 vs Spark bigint) DIVERGE — the
    exact comparison the round driver hashes. Must run on the canon()
    output (floats already rounded)."""

    def cell(v):
        if v is None or v is pd.NA or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, float) or type(v).__name__ in ("float32", "float64"):
            return repr(float(v))  # 404.0 stays "404.0" — int/float divergence visible
        return str(v)

    return df.apply(lambda col: col.map(cell))


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle(spark, ddb, name):
    fn, sql = REGISTRY[name]
    ensure_changelog(spark, 0.01)
    ours = canon(fn(spark, SF_DIR).toPandas())
    if sql is None:
        assert len(ours) > 0
        return
    oracle = canon(ddb.sql(sql).df())
    assert list(ours.columns) == list(oracle.columns), (
        f"{name}: column mismatch {list(ours.columns)} vs {list(oracle.columns)}"
    )
    assert len(ours) == len(oracle), (
        f"{name}: row count {len(ours)} vs oracle {len(oracle)}"
    )
    pd.testing.assert_frame_equal(ours, oracle, check_dtype=False,
                                  check_exact=False, rtol=1e-6, atol=1e-9)
    # Driver-identical rendered compare: catches dtype-rendering
    # divergences (e.g. DuckDB HUGEINT→404.0 vs Spark bigint→404) that
    # the tolerance compare above waves through but the round driver's
    # value-hash rejects.
    r_ours, r_oracle = render(ours), render(oracle)
    if not r_ours.equals(r_oracle):
        diff = [
            (c, a, b)
            for c in r_ours.columns
            for a, b in zip(r_ours[c], r_oracle[c])
            if a != b
        ][:5]
        raise AssertionError(f"{name}: rendered-value divergence {diff}")


def test_registry_nonempty():
    assert len(REGISTRY) >= 10
    assert not any(
        fn is None or (sql is not None and not sql.strip())
        for fn, sql in REGISTRY.values()
    )


def test_driver_prefix_samples_priority_ops():
    """The round driver checks the first 50 registry entries (stable
    insertion-order prefix, observed r1-r5). Guard the r6 rotation
    (VERDICT r5 'Next round' #7): the prefix carries the CDC headline
    path, the 31 entries whose last driver row was r4 (rotated back in
    per the planned alternation), and the entries whose implementation
    changed in the r6 optimization round."""
    from tap_github_search_spark.plans.queries import _DRIVER_PRIORITY

    names = list(REGISTRY)
    assert names[:len(_DRIVER_PRIORITY)] == _DRIVER_PRIORITY
    assert len(_DRIVER_PRIORITY) == 50
    must_sample = {
        # CDC headline
        "cdc_replay_transcripts", "cdc_change_feed",
        "cdc_replica_roundtrip", "cdc_conv_rollup",
        "cdc_bookmark_antijoin",
        # r4-last rotation block (sample)
        "agg_monthly_counts", "join_enrich_orders", "docs_fingerprint",
        "docs_exact_dedup", "search_counts", "events_asof_join",
        "emb_lsh_ann", "mm_thumbnails", "rename_reserved",
        # modified in the r6 optimization round
        "emb_cosine_topk", "cdc_join_view", "conv_turn_gaps",
        "conv_transcript_pandas", "cdc_replay_salted", "cdc_replay_ord",
    }
    assert must_sample <= set(names[:50])


def test_no_registry_entry_strands_two_rounds():
    """VERDICT r5 'Next round' #7: the driver samples the first-50
    prefix each round, so every registry entry must have a driver row
    within the last two rounds — i.e. current prefix ∪ the previous
    round's CORRECTNESS keys must cover the registry. Red if a future
    reorder strands an entry beyond one round."""
    import json

    from tap_github_search_spark.plans.queries import _DRIVER_PRIORITY

    with open("/root/repo/CORRECTNESS_r05.json") as f:
        prev_green = {
            k for k, v in json.load(f).items()
            if v.get("rows_match") and v.get("hash_match")
        }
    covered = set(_DRIVER_PRIORITY) | prev_green
    stranded = set(REGISTRY) - covered
    assert not stranded, (
        f"registry entries with no driver row in 2 rounds: "
        f"{sorted(stranded)}"
    )
