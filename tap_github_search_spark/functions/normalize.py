"""Vectorized text normalization (Arrow/pandas UDF — no per-row Python).

The per-row invariant "per-turn text equality" (BASELINE.json input_hint)
is *defined* through this function:

    normalize(text) = NFC( text with NUL bytes removed )

Reference analog: control-char sanitization in ``post_process``
(/root/reference/tap_github/repository_streams.py:884-900, 978-987,
1281-1296 — strips ``\\x00`` from title/body for Postgres safety).

DuckDB-oracle equivalent (used by __spark_entry__.oracle_sql):
    nfc_normalize(replace(text, chr(0), ''))

Kept intentionally minimal so the oracle can express it exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# Type object (not DDL string) so decoration works before any session exists.
@pandas_udf(T.StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """NUL-strip + Unicode NFC, vectorized over Arrow batches.

    ``Series.str`` ops run in C over the whole batch; this is the
    mandated vectorized path (SURVEY.md §2.12), ~10-100× faster than a
    row-at-a-time Python UDF.
    """
    return s.str.replace("\x00", "", regex=False).str.normalize("NFC")


def normalized(col: str | Column = "text") -> Column:
    """Column expression form, for use inside select/withColumn."""
    c = F.col(col) if isinstance(col, str) else col
    return normalize_text(c)
