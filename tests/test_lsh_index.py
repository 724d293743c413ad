"""Stream-maintained MinHash-LSH near-dup index over the transcript
table: a 2-level derived chain (per-conv signatures → band buckets with
an EXPLODING key_expr). Incremental maintenance must equal a full
rebuild, updates must migrate band membership (old AND new bands
dirtied), and planted near-duplicates must surface as candidates via
two bucket-pruned point reads."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tap_github_search_spark.sources.generator import write_changelog
from tap_github_search_spark.streaming.derived import (
    LshIndexMaintainer,
    _conv_signature_transform,
    _lsh_band_transform,
)
from tap_github_search_spark.streaming.job import replay
from tests.test_engine import _events


def _full_rebuild_bands(table) -> pd.DataFrame:
    """The same 2-level transform over the FINAL main snapshot."""
    sig = _conv_signature_transform(table.snapshot_df())
    live = sig.withColumn("band_key", F.explode("band_keys"))
    return (
        _lsh_band_transform(live)
        .withColumn("members", F.col("members").cast("array<string>"))
        .toPandas().sort_values("band_key").reset_index(drop=True)
    )


def test_incremental_lsh_index_equals_full_rebuild(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 50, n_files=2, delete_pct=25)
    table, results = replay(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                            n_buckets=8, n_epochs=2)
    maint = LshIndexMaintainer(spark, table, f"{tmp_dir}/lsh", n_buckets=8)
    for r in results:
        maint.apply_epoch(r.epoch)
    assert maint.apply_epoch(results[-1].epoch).skipped  # fence

    got = maint.bands.snapshot_df().drop("ts").toPandas() \
        .sort_values("band_key").reset_index(drop=True)
    got["members"] = got["members"].map(list)
    want = _full_rebuild_bands(table)
    want["members"] = want["members"].map(list)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every indexed conversation carries exactly 4 band keys
    sig = maint.signatures.snapshot_df()
    assert sig.filter(F.size("band_keys") != 4).count() == 0


def test_near_dups_found_and_membership_migrates(spark, tmp_dir):
    base = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"z{i}" for i in range(30))
    # c1 and c2 are exact near-dups; c3 is unrelated
    e0 = _events(spark, [(1, "I", "c1", 0, 10, base),
                         (2, "I", "c2", 0, 11, base),
                         (3, "I", "c3", 0, 12, other)])
    e0.write.mode("overwrite").parquet(f"{tmp_dir}/log0")
    table, res = replay(spark, [f"{tmp_dir}/log0"], f"{tmp_dir}/t",
                        n_buckets=4)
    maint = LshIndexMaintainer(spark, table, f"{tmp_dir}/lsh", n_buckets=4)
    maint.apply_epoch(res[0].epoch)

    # verified results carry (conv_id, est_jaccard); exact dups agree
    # on every MinHash position → est 1.0
    assert maint.near_dup_candidates("c1") == [("c2", 1.0)]
    assert maint.near_dup_candidates("c2") == [("c1", 1.0)]
    assert maint.near_dup_candidates("c3") == []
    assert maint.near_dup_candidates("nope") == []
    # raw blocking set (unverified) still available
    assert maint.near_dup_candidates("c1", min_jaccard=None) == ["c2"]

    # c2 rewritten to unrelated text: bands migrate — c1 loses its
    # candidate, c2 now collides with c3 instead
    r1 = table.merge(_events(spark, [(4, "U", "c2", 0, 20, other)]),
                     epoch=1)
    maint.apply_epoch(r1.epoch)
    assert maint.near_dup_candidates("c1") == []
    assert maint.near_dup_candidates("c2") == [("c3", 1.0)]

    # deleting c3 prunes it from its bands
    r2 = table.merge(_events(spark, [(5, "D", "c3", 0, 30)]), epoch=2)
    maint.apply_epoch(r2.epoch)
    assert maint.near_dup_candidates("c2") == []
    assert maint.signatures.lookup("c3").count() == 0


def test_band_collision_false_positive_is_filtered(spark, tmp_dir):
    """A pair colliding in SOME band but with low overall signature
    agreement is a candidate, not a near-dup: verification must drop
    it while keeping a genuinely similar pair. The fixture searches
    deterministic text pairs for a planted single-band collision with
    low total MinHash agreement (band size 2 of 8 hashes ⇒ collisions
    with only 2/8 positions agreeing exist in quantity)."""
    from tap_github_search_spark.functions.textops import (
        lsh_bands,
        minhash_signature,
        tokens,
        word_shingles,
    )

    # find a false-positive pair among small deterministic corpora:
    # texts sharing a MINORITY of tokens that still collide in a band.
    # The offline signature search MUST mirror the index's input
    # rendering — the assembled transcript line "role: text" — or the
    # planted collision lands in a different signature space.
    texts = {}
    base_words = [f"w{i}" for i in range(12)]
    for v in range(40):
        words = list(base_words[:4]) + [f"v{v}_{j}" for j in range(8)]
        texts[f"t{v}"] = " ".join(words)
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], ["conv_id", "text"]
    )
    rendered = F.concat(F.lit("user: "), F.col("text"))
    sig = df.select(
        "conv_id",
        *minhash_signature(
            F.array_distinct(word_shingles(tokens(F.lower(rendered)))),
            8,
        ),
    ).select(
        "conv_id",
        F.array(*[F.concat(F.lit(f"{b}:"), c)
                  for b, c in enumerate(lsh_bands(8, 2))]).alias("bands"),
        F.array(*[F.col(f"mh{i}") for i in range(8)]).alias("mh"),
    ).collect()
    fp = None
    for i, a in enumerate(sig):
        for b in sig[i + 1:]:
            shared_bands = set(a["bands"]) & set(b["bands"])
            agree = sum(x == y for x, y in zip(a["mh"], b["mh"]))
            if shared_bands and agree / 8 < 0.3:
                fp = (a["conv_id"], b["conv_id"])
                break
        if fp:
            break
    assert fp is not None, "fixture failed to plant a band collision"

    rows = [(i + 1, "I", cid, 0, 10 + i, texts[cid])
            for i, cid in enumerate(texts)]
    _events(spark, rows).write.mode("overwrite").parquet(f"{tmp_dir}/log0")
    table, res = replay(spark, [f"{tmp_dir}/log0"], f"{tmp_dir}/t",
                        n_buckets=4)
    maint = LshIndexMaintainer(spark, table, f"{tmp_dir}/lsh", n_buckets=4)
    maint.apply_epoch(res[0].epoch)

    a, b = fp
    # unverified: the collision IS in the blocking set
    assert b in maint.near_dup_candidates(a, min_jaccard=None)
    # verified: the false positive is filtered out
    assert b not in [c for c, _ in maint.near_dup_candidates(a)]


def test_streaming_lsh_index_crash_restart(spark, tmp_dir):
    """stream(lsh_index_path=...) maintains the index per microbatch; a
    crash between batches replays and converges (independent fences)."""
    from tap_github_search_spark.streaming.job import stream
    from tap_github_search_spark.table.microlake import MicroLakeTable

    write_changelog(spark, f"{tmp_dir}/log", 40, n_files=2, delete_pct=20)
    try:
        stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t", f"{tmp_dir}/ckpt",
               n_buckets=4, max_files_per_trigger=1,
               lsh_index_path=f"{tmp_dir}/lsh", fail_after_batches=2)
    except Exception:
        pass
    table = stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
                   f"{tmp_dir}/ckpt", lsh_index_path=f"{tmp_dir}/lsh")

    bands = MicroLakeTable.load(spark, f"{tmp_dir}/lsh/bands")
    got = bands.snapshot_df().drop("ts").toPandas() \
        .sort_values("band_key").reset_index(drop=True)
    got["members"] = got["members"].map(list)
    want = _full_rebuild_bands(table)
    want["members"] = want["members"].map(list)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
