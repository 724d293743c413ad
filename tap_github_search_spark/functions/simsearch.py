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


#: target members per sign bucket when scaling bits with corpus size
ANN_TARGET_PER_BUCKET = 4
ANN_MIN_BITS, ANN_MAX_BITS = 4, 24


def ann_bits(count: Column) -> Column:
    """Bucket-bit count scaled to corpus size: ceil(log2(N / target)),
    clamped to [4, 24]. A FIXED n_bits is the O(N²/2^bits) scale bug —
    at 10^9 vectors 8 bits means ~4M vectors per bucket and quadratic
    within-bucket probing; scaling bits keeps expected bucket size at
    ``ANN_TARGET_PER_BUCKET`` regardless of N (VERDICT r1 #3b).
    Mirrored 1:1 by the oracle SQL (LEAST/GREATEST/ceil/log2)."""
    return F.least(
        F.lit(ANN_MAX_BITS),
        F.greatest(
            F.lit(ANN_MIN_BITS),
            F.ceil(F.log2(count.cast("double") / ANN_TARGET_PER_BUCKET)),
        ),
    ).cast("int")


def sign_bucket_dynamic(emb: Column, bits: Column,
                        max_bits: int = ANN_MAX_BITS) -> Column:
    """``sign_bucket`` whose width is a runtime Column (from
    ``ann_bits`` over the corpus count) — bits beyond ``bits`` are
    masked off, so the bucket expression stays a static codegen'd sum."""
    acc = F.lit(0)
    for i in range(max_bits):
        acc = acc + F.when(
            (F.lit(i) < bits) & (F.element_at(emb, i + 1) >= 0),
            F.lit(1 << i),
        ).otherwise(F.lit(0))
    return acc.cast("int")
