"""Large-blob ingest guard (SURVEY.md §2 S7).

The reference's diff-fetch streams cap payloads at 40 MiB and convert
tolerated fetch failures (404/406/422/502, oversize) into typed rows
``{success: false, error_message: ...}`` instead of failing the sync
(/root/reference/tap_github/client.py:324-370). The Spark-first analog
is a pure-expression column guard: every row keeps flowing, oversize or
malformed payloads are nulled out and annotated — so a 100 TB ingest
never dies on one 4 GB attachment, and the error rows stay queryable
(route them to an error sink or let ``MicroLakeTable.merge``'s
``max_payload_bytes`` reject them with a metrics count).

All codegen'd built-ins (octet_length / when / otherwise) — no UDF, no
extra scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The reference's cap: 40 MiB (client.py:334 ``MAX_BYTES = 41943040``).
DEFAULT_MAX_BYTES = 40 * 1024 * 1024


def guard_payload(
    df: DataFrame,
    col: str,
    max_bytes: int = DEFAULT_MAX_BYTES,
    required: tuple[str, ...] = (),
) -> DataFrame:
    """Annotate ``df`` with ``success`` / ``error_message`` and null out
    the payload of failing rows.

    Failure modes (checked in order, mirroring the reference's
    tolerated-error taxonomy):
      - a ``required`` column is NULL → ``missing field: <name>``
      - payload byte length (octet_length: UTF-8 bytes for strings,
        raw length for binary) exceeds ``max_bytes`` → ``payload too
        large: <n> > <cap> bytes``

    A NULL payload with all required fields present is a *success* with
    empty content — the reference emits 404-diff rows the same way.
    """
    err: Column = F.lit(None).cast("string")
    # reverse order: earlier checks win via when() precedence
    size = F.coalesce(F.octet_length(F.col(col)), F.lit(0))
    err = F.when(
        size > F.lit(int(max_bytes)),
        F.concat(
            F.lit("payload too large: "), size.cast("string"),
            F.lit(f" > {int(max_bytes)} bytes"),
        ),
    ).otherwise(err)
    for name in reversed(required):
        err = F.when(
            F.col(name).isNull(), F.lit(f"missing field: {name}")
        ).otherwise(err)
    return (
        df.withColumn("error_message", err)
        .withColumn("success", F.col("error_message").isNull())
        .withColumn(
            col, F.when(F.col("success"), F.col(col))  # null failed payloads
        )
    )
