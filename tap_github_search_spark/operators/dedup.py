"""Last-writer-wins dedup over the change stream.

Semantics (FIXTURES.md §2, north_star): for each ``(conv_id, turn_idx)``
key the winning event is the one with max ``(ts, seq)``; a winning
``op='D'`` means the key is absent from the final table. Deletes are
ranked *together* with inserts/updates — a delete is an event, not an
absorbing state (SURVEY.md §7.4: getting this wrong silently resurrects
rows).

Reference analog: bookmark advances to max(replication_key) over emitted
records (/root/reference/tap_github/tests/test_tap.py:150-161); newest
row wins on replay because the Singer target upserts by primary key.

Implementation notes (scale):
 - The default path is ``max(struct(ts, seq, payload...))`` — an
   aggregate, not a window. Because the struct buffer contains variable-
   length fields it compiles to **SortAggregate**, but crucially still
   with a **partial_max map-side combine** (visible in `.explain`):
   a conv_id with 10^6 duplicate events collapses to ~one row per
   upstream partition before the shuffle, unlike a window, which ships
   every event of a hot key into one task. Measured at 9M events the
   sort-vs-hash difference is noise; the combine is what matters.
 - ``lww_winners_ord`` is the strict-HashAggregate variant for
   update-heavy skew: it packs ``(ts, seq)`` into one decimal(38,0)
   order key (decimal buffers are hash-aggregable), reduces with a
   skinny hash aggregate whose shuffle carries keys+16 bytes (no text
   payload), then re-joins winners to fetch payload.
 - ``lww_winners_salted`` demonstrates the explicit two-stage
   salted variant the north_rule asks for; with partial aggregation the
   unsalted plans are already equivalent, so salting is exposed for the
   window-based path and for demonstration/verification.
 - struct comparison is lexicographic, and ``seq`` is unique per event,
   so the winner is deterministic; exact duplicate deliveries (same seq)
   are byte-identical and collapse harmlessly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import LWW_ORDER, MERGE_KEYS


def lww_winners(
    df: DataFrame,
    keys: tuple[str, ...] = MERGE_KEYS,
    order: tuple[str, ...] = LWW_ORDER,
) -> DataFrame:
    """One row per key: the max-(ts,seq) event, all columns preserved.

    Agg-based (partial-combine-friendly); output column order matches
    the input.
    """
    payload = [c for c in df.columns if c not in keys and c not in order]
    packed = F.max(F.struct(*[F.col(c) for c in order],
                            *[F.col(c) for c in payload])).alias("_w")
    out = df.groupBy(*keys).agg(packed)
    return out.select(
        *[F.col(f"_w.{c}").alias(c) if c not in keys else F.col(c)
          for c in df.columns]
    )


def lww_winners_window(
    df: DataFrame,
    keys: tuple[str, ...] = MERGE_KEYS,
    order: tuple[str, ...] = LWW_ORDER,
) -> DataFrame:
    """row_number()-based variant (the classic MERGE-dedup form; same
    result, used to cross-check the agg path in tests)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


#: 10^19 > any seq; shifts ts-micros left of seq inside one decimal(38,0)
_ORD_SCALE = "CAST('10000000000000000000' AS DECIMAL(38,0))"


def lww_ord(order: tuple[str, ...] = LWW_ORDER):
    """(ts, seq) packed into one hash-aggregable decimal(38,0):
    unix_micros(ts)·10^19 + seq. Order-preserving while seq < 10^19 and
    ts ≥ epoch (both guaranteed by the WAL contract)."""
    ts, seq = order
    return (
        F.unix_micros(F.col(ts)).cast("decimal(38,0)") * F.expr(_ORD_SCALE)
        + F.col(seq).cast("decimal(38,0)")
    )


def lww_winners_ord(
    df: DataFrame,
    keys: tuple[str, ...] = MERGE_KEYS,
    order: tuple[str, ...] = LWW_ORDER,
) -> DataFrame:
    """Strict-HashAggregate LWW for update-heavy skew: the reduce
    shuffle carries only (keys, decimal) — no payload — then winners
    re-join the input to fetch payload columns. Exact duplicate
    deliveries of the winning event survive the join as byte-identical
    rows and are collapsed by a final (tiny) dedup over winners only."""
    withord = df.withColumn("_ord", lww_ord(order))
    mx = withord.groupBy(*keys).agg(F.max("_ord").alias("_ord"))
    joined = withord.join(mx, [*keys, "_ord"]).select(*df.columns)
    return lww_winners(joined, keys=keys, order=order)


def lww_winners_salted(
    df: DataFrame,
    keys: tuple[str, ...] = MERGE_KEYS,
    order: tuple[str, ...] = LWW_ORDER,
    n_salts: int = 16,
) -> DataFrame:
    """Explicit two-stage salted reduction for hot keys (north_rule's
    'conv_id salting handles hot-conversation skew').

    Stage 1 reduces each (key, salt) shard independently — a hot
    conversation's events spread over ``n_salts`` tasks — stage 2 merges
    the ≤n_salts shard winners per key. Salt is derived from ``seq`` so
    it is deterministic and uniform.
    """
    payload = [c for c in df.columns if c not in keys and c not in order]
    packed = F.max(F.struct(*[F.col(c) for c in order],
                            *[F.col(c) for c in payload])).alias("_w")
    stage1 = (
        df.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order]),
                                      F.lit(n_salts)))
        .groupBy(*keys, "_salt")
        .agg(packed)
    )
    stage2 = stage1.groupBy(*keys).agg(F.max("_w").alias("_w"))
    return stage2.select(
        *[F.col(f"_w.{c}").alias(c) if c not in keys else F.col(c)
          for c in df.columns]
    )


def final_state(
    df: DataFrame,
    keys: tuple[str, ...] = MERGE_KEYS,
    order: tuple[str, ...] = LWW_ORDER,
) -> DataFrame:
    """Replay semantics in one shot: winners minus keys whose winner is a
    delete. This is the batch-replay oracle shape (no table involved)."""
    return lww_winners(df, keys, order).filter(F.col("op") != "D")


def final_state_cols(
    df: DataFrame,
    cols: tuple[str, ...],
    keys: tuple[str, ...] = MERGE_KEYS,
    order: tuple[str, ...] = LWW_ORDER,
) -> DataFrame:
    """``final_state`` with the aggregate's payload pruned to ``cols``
    (r06, guide §2.3 "project before the exchange"): Catalyst cannot
    push a downstream projection INSIDE ``max(struct(...))``, so a
    caller that selects a few columns after ``final_state`` still pays
    for shuffling and max-comparing every payload column (``text`` is
    by far the widest). The winner per key is decided by ``(order)``
    alone, so pruning the payload BEFORE the aggregate yields
    bit-identical winners — just with fewer columns in the buffer.
    Equivalent to ``final_state(df).select(keys + order + op + cols)``.
    """
    need = [*keys, *order, "op"]
    need += [c for c in cols if c not in need]
    return final_state(df.select(*need), keys, order)
