"""Similarity search over embedding columns (array<float>).

Two paths, per the task brief:
 - brute-force cosine top-k (exact baseline) — the query side is small
   and broadcast; the corpus side streams. Dot products are
   ``zip_with``/``aggregate`` lambda expressions (JVM-side, no UDF).
 - bit-sampling LSH buckets (scale path): bucket key = sign pattern of
   the first ``n_bits`` dimensions. Self-joins and k-NN probes shuffle
   on the bucket key only, turning the O(N²) pair space into
   O(sum of bucket² ) — the standard ANN blocking trade
   (recall < 1, cost « brute force). Deterministic, so the DuckDB
   oracle reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def sign_bucket(emb: Column, n_bits: int = 8) -> Column:
    """Bit-sampling LSH bucket id: bit i set iff embedding[i] >= 0.
    2^n_bits buckets; nearby vectors (cosine-close) agree on most signs
    and land in the same bucket with high probability."""
    acc = F.lit(0)
    for i in range(n_bits):
        acc = acc + F.when(
            F.element_at(emb, i + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return acc.cast("int")
