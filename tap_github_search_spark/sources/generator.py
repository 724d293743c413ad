"""Deterministic synthetic CDC changelog generator.

Produces the WAL of transcript change events described in FIXTURES.md §1:
ordered I/U/D events over ``(conv_id, turn_idx)`` keys with

 - zipf-skewed mutation targets (hot conversations → exercises salting),
 - out-of-order event time for a known fraction (``ts`` decoupled from ``seq``),
 - exact duplicate deliveries at a known rate (at-least-once),
 - NUL bytes and mixed NFC/NFD Unicode in a known fraction of ``text``
   (reference analog: NUL-strip post-processing,
   /root/reference/tap_github/repository_streams.py:884-900),
 - optional late-appearing columns (``tool_version``, ``lang``) for the
   schema-evolution fixture (FIXTURES.md §3).

Everything is a pure function of ``seed`` built from Spark column
expressions (``xxhash64`` keyed derivation) — no wall clock, no driver
loops, no Python UDFs — so generation itself distributes across
executors and scales linearly with cores. ``seq`` is unique and defines
the log's total order; inserts occupy ``[0, n_convs*TURN_SPAN)`` and
mutations follow, so replaying in seq order is causally sane while
``ts`` carries the disorder.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
TURN_SPAN = 512  # must exceed max turns per conversation (bounded at 266)
BASE_EPOCH = 1735689600  # 2025-01-01T00:00:00Z

_WORDS = [
    "the", "model", "agent", "tool", "call", "search", "result", "用户",
    "query", "spark", "merge", "turn", "context", "answer", "code",
    "naïve", "data", "plan", "token", "stream", "épée", "check",
    "state", "reply",
]


def _h(name: str, *cols, seed: int = SEED):
    """Keyed 64-bit hash column; distinct ``name`` decorrelates uses."""
    return F.xxhash64(F.lit(seed), F.lit(name), *cols)


def _pm(name: str, mod: int, *cols, seed: int = SEED):
    return F.pmod(_h(name, *cols, seed=seed), F.lit(mod))


def _n_turns_expr(conv_num, n_convs: int, seed: int):
    """Turns per conversation: short head, geometric-ish tail, plus a
    0.1% hot-conversation band with ~200 extra turns (zipf skew)."""
    base = F.lit(2) + _pm("nt1", 6, conv_num, seed=seed)
    long_tail = F.when(
        _pm("nt2", 100, conv_num, seed=seed) < 8,
        _pm("nt3", 60, conv_num, seed=seed),
    ).otherwise(F.lit(0))
    hot = F.when(
        conv_num < F.lit(max(1, n_convs // 1000)), F.lit(200)
    ).otherwise(F.lit(0))
    return (base + long_tail + hot).cast("int")


def _payload_cols(df: DataFrame, seed: int, evolved: bool) -> DataFrame:
    """role/text/tool (+ evolved extras) as deterministic functions of
    (conv_num, turn_idx, seq). Updates (new seq) therefore change text."""
    c, t, s = F.col("conv_num"), F.col("turn_idx"), F.col("seq")
    role = F.elt(
        _pm("role", 10, c, t, seed=seed) + 1,
        F.lit("user"), F.lit("assistant"), F.lit("user"), F.lit("assistant"),
        F.lit("user"), F.lit("assistant"), F.lit("tool"), F.lit("assistant"),
        F.lit("system"), F.lit("user"),
    )
    words = [F.lit(w) for w in _WORDS]
    n_words = F.lit(5) + _pm("len", 20, c, t, s, seed=seed)
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), n_words),
            lambda w: F.elt(
                F.pmod(F.xxhash64(F.lit(seed), F.lit("w"), c, t, s, w),
                       F.lit(len(_WORDS))) + 1,
                *words,
            ),
        ),
    )
    # Dirty-text injections: NUL mid-string; NFD vs NFC 'café'.
    text = F.when(
        _pm("nul", 100, s, seed=seed) < 4, F.concat(text, F.lit("\x00tail"))
    ).otherwise(text)
    text = F.when(
        # NFD (e+combining acute) vs NFC below; normalize() equates them.
        _pm("nfd", 100, s, seed=seed) < 4, F.concat(text, F.lit(" cafe\u0301"))
    ).when(
        _pm("nfd", 100, s, seed=seed) < 8, F.concat(text, F.lit(" caf\u00e9"))
    ).otherwise(text)

    df = df.withColumn("role", role).withColumn("text", text)
    df = df.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.elt(_pm("tool", 4, c, t, seed=seed) + 1,
                  F.lit("search"), F.lit("python"),
                  F.lit("browser"), F.lit("editor")),
        ).otherwise(F.lit(None).cast("string")),
    )
    if evolved:
        df = df.withColumn(
            "tool_version",
            F.when(
                F.col("tool").isNotNull(),
                F.concat(F.lit("1."), _pm("tv", 9, s, seed=seed).cast("string")),
            ).otherwise(F.lit(None).cast("string")),
        ).withColumn(
            "lang",
            F.elt(_pm("lang", 4, c, seed=seed) + 1,
                  F.lit("en"), F.lit("en"), F.lit("fr"), F.lit("zh")),
        )
    return df


def changelog_df(
    spark: SparkSession,
    n_convs: int,
    seed: int = SEED,
    mutations_per_conv: float = 4.0,
    delete_pct: int = 15,      # % of mutations that are deletes
    out_of_order_pct: int = 20,  # % of mutations with ts pulled earlier
    duplicate_pct: int = 3,    # % of events delivered twice
    evolved: bool = False,
    seq_offset: int = 0,
) -> DataFrame:
    """Build the changelog as a DataFrame (not yet written)."""
    ins_span = n_convs * TURN_SPAN

    convs = spark.range(n_convs).select(F.col("id").alias("conv_num"))
    convs = convs.withColumn("n_turns", _n_turns_expr(F.col("conv_num"), n_convs, seed))

    inserts = (
        convs.select(
            "conv_num",
            F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
        )
        .withColumn("seq", (F.col("conv_num") * TURN_SPAN + F.col("turn_idx")
                            + F.lit(seq_offset)).cast("long"))
        .withColumn("op", F.lit("I"))
    )

    n_mut = int(n_convs * mutations_per_conv)
    mut = spark.range(n_mut).select(F.col("id").alias("mid"))
    # zipf-ish target pick: u^2.5 concentrates mutations on low conv ids.
    u = _pm("mc", 1_000_000, F.col("mid"), seed=seed) / F.lit(1_000_000.0)
    conv_num = F.least(
        F.floor(F.lit(float(n_convs)) * F.pow(u, F.lit(2.5))).cast("long"),
        F.lit(n_convs - 1),
    )
    mut = mut.withColumn("conv_num", conv_num)
    mut = mut.withColumn("n_turns", _n_turns_expr(F.col("conv_num"), n_convs, seed))
    mut = (
        mut.withColumn(
            "turn_idx",
            F.pmod(_h("mt", F.col("mid"), seed=seed), F.col("n_turns")).cast("int"),
        )
        .withColumn("seq", (F.lit(ins_span + seq_offset) + F.col("mid")).cast("long"))
        .withColumn(
            "op",
            F.when(_pm("mo", 100, F.col("mid"), seed=seed) < delete_pct,
                   F.lit("D")).otherwise(F.lit("U")),
        )
        .drop("mid", "n_turns")
    )

    events = inserts.select("conv_num", "turn_idx", "seq", "op").unionByName(
        mut.select("conv_num", "turn_idx", "seq", "op")
    )
    events = events.withColumn("turn_idx", F.col("turn_idx").cast("int"))

    # Event time: seq-aligned seconds from BASE_EPOCH, with a fraction of
    # mutations pulled up to ~5.8 days earlier (out-of-order delivery).
    ts_sec = F.lit(BASE_EPOCH) + F.col("seq") - F.lit(seq_offset)
    ts_sec = F.when(
        (F.col("op") != "I") & (_pm("ooo", 100, F.col("seq"), seed=seed)
                                < out_of_order_pct),
        ts_sec - _pm("oooamt", 500_000, F.col("seq"), seed=seed),
    ).otherwise(ts_sec)
    events = events.withColumn("ts", F.timestamp_seconds(ts_sec))

    events = _payload_cols(events, seed, evolved)
    events = events.withColumn(
        "conv_id", F.format_string("conv_%08d", F.col("conv_num"))
    ).drop("conv_num")

    # At-least-once: exact duplicate deliveries (same seq, same payload).
    dups = events.filter(_pm("dup", 100, F.col("seq"), seed=seed) < duplicate_pct)
    events = events.unionByName(dups)

    cols = ["seq", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    if evolved:
        cols += ["tool_version", "lang"]
    return events.select(*cols)


def write_changelog(
    spark: SparkSession,
    out_dir: str,
    n_convs: int,
    n_files: int = 8,
    seed: int = SEED,
    evolved: bool = False,
    seq_offset: int = 0,
    **kwargs,
) -> str:
    """Write the changelog as ``n_files`` seq-ranged parquet chunks so a
    streaming file source consumes them as ordered microbatches
    (FIXTURES.md §1 'seq-ranged chunks')."""
    df = changelog_df(
        spark, n_convs, seed=seed, evolved=evolved, seq_offset=seq_offset, **kwargs
    )
    (
        df.repartitionByRange(n_files, "seq")
        .sortWithinPartitions("seq")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def nested_items_df(spark: SparkSession, n_items: int,
                    seed: int = SEED) -> DataFrame:
    """Deterministic nested fixture: project items with a dynamic
    alias→value array (``field_values``), a two-level nested
    ``reviews[].comments[]`` column, and a reserved-character ``+1``
    reaction count.

    Reference analogs: ProjectItemsStream's dynamic field-value pivot
    (/root/reference/tap_github/organization_streams.py:825-910),
    2-level nested unnest (repository_streams.py:2615-2627), and the
    ``+1``/``-1`` reaction-column renames the SDK must sanitize. Pure
    column expressions of ``seed`` — no driver loops."""
    df = spark.range(n_items).select(F.col("id").alias("item_id"))
    i = F.col("item_id")

    title = F.struct(
        F.lit("title").alias("field"),
        F.concat(F.lit("Item "), i.cast("string")).alias("value"),
    )
    status = F.struct(
        F.lit("status").alias("field"),
        F.elt(_pm("st", 3, i, seed=seed) + 1,
              F.lit("todo"), F.lit("doing"), F.lit("done")).alias("value"),
    )
    prio = F.struct(
        F.lit("priority").alias("field"),
        _pm("pr", 5, i, seed=seed).cast("string").alias("value"),
    )
    fv = F.array(title)
    fv = F.when(_pm("hasst", 10, i, seed=seed) < 7,
                F.array_append(fv, status)).otherwise(fv)
    fv = F.when(_pm("haspr", 10, i, seed=seed) < 4,
                F.array_append(fv, prio)).otherwise(fv)

    # reviews: 0-3 reviewers, each with 1-4 comments. Spark's sequence()
    # DESCENDS when start > stop, so empty cases are explicit branches.
    def _comments(r):
        n_c = F.pmod(F.xxhash64(F.lit(seed), F.lit("nc"), i, r), F.lit(4)) + 1
        return F.transform(
            F.sequence(F.lit(1), n_c),
            lambda c: F.format_string(
                "comment %d-%d", r.cast("int"), c.cast("int")
            ),
        )

    n_rev = _pm("nr", 4, i, seed=seed)
    reviews = F.when(
        n_rev == 0,
        F.array().cast(
            "array<struct<reviewer:string,comments:array<string>>>"
        ),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_rev),
            lambda r: F.struct(
                F.format_string(
                    "user_%02d",
                    F.pmod(F.xxhash64(F.lit(seed), F.lit("rv"), i, r),
                           F.lit(40)).cast("int"),
                ).alias("reviewer"),
                _comments(r).alias("comments"),
            ),
        )
    )

    # semi-structured scraped-page text (S8/S9 analog): labeled counters
    # with thousands separators and '+'-approximations, some sections
    # randomly absent — the exact shapes scrape_metrics/parse_counter
    # handle (/root/reference/tap_github/scraping.py:98-171)
    issues = _pm("iss", 5000, i, seed=seed)
    prs = _pm("prs", 400, i, seed=seed)
    deps = _pm("deps", 90000, i, seed=seed)
    contrib = _pm("ctr", 800, i, seed=seed)
    approx = F.when(_pm("apx", 5, i, seed=seed) == 0, F.lit("+")).otherwise(
        F.lit("")
    )
    page = F.concat(
        F.format_string("Repo item %d\nIssues %,d\nPull requests %,d\n",
                        i.cast("int"), issues.cast("int"), prs.cast("int")),
        # dependents section present ~70% of the time
        F.when(
            _pm("hasdep", 10, i, seed=seed) < 7,
            F.concat(F.format_string("   Used by %,d", deps.cast("int")),
                     approx, F.lit("\n")),
        ).otherwise(F.lit("")),
        # contributors section present ~80% of the time
        F.when(
            _pm("hasctr", 10, i, seed=seed) < 8,
            F.format_string("   Contributors %,d\n", contrib.cast("int")),
        ).otherwise(F.lit("")),
    )

    return df.select(
        "item_id",
        F.format_string("proj_%03d", _pm("proj", 20, i, seed=seed).cast("int")
                        ).alias("project"),
        fv.alias("field_values"),
        reviews.alias("reviews"),
        _pm("plus1", 50, i, seed=seed).cast("int").alias("+1"),
        page.alias("page_text"),
    )


def projects_dir(sf: float) -> str:
    return os.path.join(DATA_ROOT, f"sf{sf:g}", "projects")


def ensure_projects(spark: SparkSession, sf: float) -> str:
    """Generate (once) the nested projects fixture for a scale factor."""
    out = projects_dir(sf)
    if not (os.path.isdir(out)
            and any(f.endswith(".parquet") for f in os.listdir(out))):
        n_items = max(200, int(sf * 20_000))
        nested_items_df(spark, n_items).repartition(2).write.mode(
            "overwrite").parquet(out)
    return out


# --- scale-factor convention -------------------------------------------------
# sf → n_convs so that event counts track FIXTURES.md §7:
#   sf0.001 ≈ 1.2e4 (smoke) · sf0.01 ≈ 1.2e5 (oracle) · sf0.1 ≈ 1.2e6 (bench)
CONVS_PER_SF = 800_000

DATA_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "data", "cdc")


def sf_from_dir(sf_dir: str) -> float:
    """Parse 0.01 from '/root/testdata/sf0.01'."""
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base.removeprefix("sf"))


def changelog_dir(sf: float) -> str:
    return os.path.join(DATA_ROOT, f"sf{sf:g}", "changelog")


def evolved_dir(sf: float) -> str:
    return os.path.join(DATA_ROOT, f"sf{sf:g}", "changelog_evolved")


def dim_dir(sf: float) -> str:
    return os.path.join(DATA_ROOT, f"sf{sf:g}", "dim_tools")


#: the tools dimension changelog: a slowly-changing dimension CDC log
#: keyed by ``tool`` (joins the transcript WAL's ``tool`` column).
#: Fixed literal rows — the dim is deliberately tiny (broadcast-side)
#: and exercises insert, update (category + tier churn) and delete
#: (``shell`` never appears in the fact WAL and is dropped again).
_DIM_TOOL_ROWS = [
    (1, "I", "search", "retrieval", 1),
    (2, "I", "python", "compute", 2),
    (3, "I", "browser", "retrieval", 3),
    (4, "I", "editor", "mutation", 2),
    (5, "I", "shell", "compute", 4),
    (6, "U", "python", "compute", 3),
    (7, "U", "search", "web", 1),
    (8, "D", "shell", None, None),
]


def dim_changelog_df(spark: SparkSession) -> DataFrame:
    """The tools-dimension changelog as a DataFrame: (seq, op, tool,
    category, cost_tier, ts), ts = epoch + seq minutes (monotone)."""
    schema = ("seq long, op string, tool string, category string, "
              "cost_tier int")
    return (
        spark.createDataFrame(_DIM_TOOL_ROWS, schema)
        .withColumn("ts", F.timestamp_seconds(F.col("seq") * 60))
    )


def write_dim_changelog(spark: SparkSession, out_dir: str,
                        n_files: int = 2) -> str:
    """Write the tools-dimension changelog as seq-ranged chunks (same
    microbatch convention as the fact WAL)."""
    (
        dim_changelog_df(spark)
        .repartitionByRange(n_files, "seq")
        .sortWithinPartitions("seq")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def ensure_dim_changelog(spark: SparkSession, sf: float) -> str:
    """Generate (once) and return the tools-dimension changelog dir for
    a scale factor. Content is scale-independent (a dimension stays
    small while the fact grows — that is the point of the join view)."""
    out = dim_dir(sf)
    if not (os.path.isdir(out)
            and any(f.endswith(".parquet") for f in os.listdir(out))):
        write_dim_changelog(spark, out)
    return out


def ensure_changelog(spark: SparkSession, sf: float) -> str:
    """Generate (once) and return the changelog dir for a scale factor.

    The evolved segment continues the main log's seq space, so the two
    directories together form one consistent WAL.
    """
    def _has_parquet(d: str) -> bool:
        return os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))

    n_convs = max(64, int(sf * CONVS_PER_SF))
    out = changelog_dir(sf)
    if not _has_parquet(out):
        write_changelog(spark, out, n_convs)
    out2 = evolved_dir(sf)
    if not _has_parquet(out2):
        write_changelog(
            spark, out2, max(16, n_convs // 8), n_files=2, evolved=True,
            seq_offset=n_convs * TURN_SPAN * 2,
        )
    return out
