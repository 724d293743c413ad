"""Physical-plan quality gates (the 100 TB checklist, task brief):

 - small dimension sides are broadcast (no shuffled sort-merge joins
   where a broadcast fits),
 - incremental-resume predicates and column pruning reach the parquet
   scan (PushedFilters / ReadSchema),
 - LWW dedup is a partial-combinable hash aggregate, not a window sort,
 - no row-at-a-time Python (`BatchEvalPython`) anywhere in the catalog —
   only Arrow-vectorized exchanges (ArrowEvalPython / MapInPandas).

These assert on `.explain` output, so a regression that silently
de-optimizes a plan (e.g. a lost broadcast hint or a filter that stops
pushing down) fails CI even though results stay correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tap_github_search_spark.operators.dedup import lww_winners, lww_winners_ord
from tap_github_search_spark.plans.queries import REGISTRY, _log
from tap_github_search_spark.sources.generator import ensure_changelog

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_bookmark_join_is_scale_safe(spark):
    """r06: the bookmark frame is one row per CONVERSATION, so it must
    not carry a forced broadcast hint (at 10^8+ keys the hint OOMs the
    driver; at sf1.0 the collect+rebroadcast already cost 2x a
    co-partitioned shuffle join). AQE may still choose a broadcast
    join at runtime from actual sizes - that is the size-aware
    decision the plan defers to."""
    ensure_changelog(spark, 0.01)
    fn, _ = REGISTRY["cdc_bookmark_antijoin"]
    df = fn(spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed


def test_dim_joins_are_broadcast(spark):
    fn, _ = REGISTRY["join_enrich_orders"]
    plan = plan_of(fn(spark, SF_DIR), "simple")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_incremental_resume_filter_pushes_down(spark):
    """Batch-replay resume (`ts > bookmark`, SURVEY.md §2.2 I1) must
    reach the parquet scan so Catalyst can prune row groups by stats."""
    ensure_changelog(spark, 0.01)
    df = _log(spark, SF_DIR).filter(F.col("ts") > "2025-06-01")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(ts), GreaterThan(ts" in plan


def test_shipdate_filter_pushes_down_and_prunes_columns(spark):
    fn, _ = REGISTRY["tpch_pricing"]
    plan = plan_of(fn(spark, SF_DIR))
    assert "LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 2-column group-by scan must not read l_comment
    # or other unused columns (ReadSchema lists only what's needed)
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" not in read and "l_suppkey" not in read


def test_lww_dedup_has_map_side_combine_no_window(spark):
    """The default LWW plan must partial-combine before its single
    shuffle (a hot conv_id collapses map-side); a window plan would ship
    every duplicate of a hot key into one task."""
    ensure_changelog(spark, 0.01)
    plan = plan_of(lww_winners(_log(spark, SF_DIR)), "simple")
    assert "partial_max" in plan  # map-side combine before the shuffle
    assert "Window" not in plan
    assert plan.count("Exchange") == 1  # exactly one shuffle


def test_lww_ord_variant_is_strict_hash_aggregate(spark):
    """The decimal-packed variant must reduce with HashAggregate (no
    sort anywhere before the shuffle) — the update-heavy skew path."""
    ensure_changelog(spark, 0.01)
    plan = plan_of(lww_winners_ord(_log(spark, SF_DIR)), "simple")
    assert "HashAggregate" in plan
    assert "partial_max(_ord" in plan


def test_whole_stage_codegen_covers_scan_agg(spark):
    fn, _ = REGISTRY["agg_monthly_counts"]
    # AQE wraps the plan and reports codegen subtrees only after
    # execution; toggle it off to inspect the compiled spans directly.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(fn(spark, SF_DIR), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # the scan→project→partial-agg span must be one compiled stage
    assert "Found 0 WholeStageCodegen" not in plan
    assert "WholeStageCodegen" in plan and "HashAggregate" in plan


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_row_at_a_time_python(spark, name):
    """input_hint mandate: vectorized pandas/Arrow UDFs only. A plain
    @udf would surface as BatchEvalPython; Arrow paths surface as
    ArrowEvalPython / MapInPandas and are allowed."""
    ensure_changelog(spark, 0.01)
    fn, _ = REGISTRY[name]
    assert "BatchEvalPython" not in plan_of(fn(spark, SF_DIR))


def test_search_counts_single_scan(spark):
    """K configured search templates must cost ONE scan of the fact
    table (conditional aggregation), not K filtered scans unioned
    (VERDICT r1 #4: linear-in-templates scan cost at 100 TB)."""
    fn, _ = REGISTRY["search_counts"]
    plan = plan_of(fn(spark, SF_DIR), "simple")
    assert plan.count("FileScan parquet") == 1
    assert "Union" not in plan
