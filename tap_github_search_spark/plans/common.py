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


def stage_for_reuse(df: DataFrame) -> DataFrame:
    """Truncate lineage on a frame that multiple self-join branches will
    re-read, so the upstream computation (shingling, bucket assignment)
    runs ONCE instead of once per branch.

    Mode is deploy-selectable via ``SPARK_GRAFT_STAGE_MODE``:

    - ``local`` (default here): ``localCheckpoint(eager=False)`` —
      zero-copy, but blocks live on executor local storage and DIE WITH
      THE EXECUTOR; single-JVM local mode can't lose one, a real cluster
      can. Not for production fault domains.
    - ``persist``: ``persist(DISK_ONLY)`` — recomputable on executor
      loss (lineage retained), still node-local storage.
    - ``reliable``: ``checkpoint(eager=False)`` — writes to the
      fault-tolerant ``sparkContext.setCheckpointDir`` location (HDFS/
      object store); survives executor loss. The 100 TB cluster choice.
    """
    import os

    mode = os.environ.get("SPARK_GRAFT_STAGE_MODE", "local")
    if mode == "persist":
        from pyspark.storagelevel import StorageLevel

        return df.persist(StorageLevel.DISK_ONLY)
    if mode == "reliable":
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)


def half_up(col, k: int):
    """Engine-identical half-up rounding to k decimal places:
    ``floor(x * 10^k + 0.5) / 10^k``. Spark's ``round()`` is HALF_UP on
    the decimal rendering, DuckDB's is round-half-even on the binary
    double — they diverge exactly at the .5*10^-k boundaries, which a
    ratio or moving average hits routinely. Both engines compute the
    SAME IEEE floor of the same double (negative inputs included), so
    this form hash-compares clean; pair it with
    ``floor(x * 10^k + 0.5) / 10^k`` in the oracle SQL."""
    from pyspark.sql import functions as F

    p = 10 ** k
    return F.floor(col * p + F.lit(0.5)) / p
