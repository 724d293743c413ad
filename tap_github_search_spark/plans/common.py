"""Shared oracle plumbing for the query catalog modules.

Lives in its own module so ``queries`` and ``queries_traindata`` can
both import it without a circular dependency (queries imports
queries_traindata to assemble the REGISTRY; anything traindata needs
from the main module belongs here instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.generator import changelog_dir, ensure_changelog, sf_from_dir

#: oracle-side path of the committed correctness-scale changelog
_ORACLE_LOG = "/root/repo/data/cdc/sf0.01/changelog/*.parquet"

#: DuckDB equivalent of functions.normalize.normalize_text
_NORM = "nfc_normalize(replace(text, chr(0), ''))"

#: DuckDB CTE: LWW winners over the changelog (deletes still present)
_WINNERS_CTE = f"""
WITH winners AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
    FROM read_parquet('{_ORACLE_LOG}')
  ) WHERE rn = 1
)
"""


def _log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's changelog at the scale matching the driver's sf_dir
    (generated once, deterministically, if absent)."""
    sf = sf_from_dir(sf_dir)
    ensure_changelog(spark, sf)
    return spark.read.parquet(changelog_dir(sf))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
