"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``tap_github_search_spark`` (see SURVEY.md §7);
the query catalog with oracle SQL is
``tap_github_search_spark/plans/queries.py``.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tap_github_search_spark.plans.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the deterministic sf0.001 transcript changelog
    through the real engine (normalize → LWW dedup → bucketed CoW MERGE
    into a MicroLake table) and return the final transcript table."""
    from tap_github_search_spark.sources.generator import (
        changelog_dir,
        ensure_changelog,
        evolved_dir,
    )
    from tap_github_search_spark.streaming.job import replay

    ensure_changelog(spark, 0.001)
    table_path = "/root/repo/data/tmp/entry_table"
    shutil.rmtree(table_path, ignore_errors=True)
    table, _ = replay(
        spark,
        [changelog_dir(0.001), evolved_dir(0.001)],
        table_path,
        n_buckets=16,
        n_epochs=2,
    )
    return table.snapshot_df()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted ⇒ rows-only check)."""
    return {
        name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None
    }
