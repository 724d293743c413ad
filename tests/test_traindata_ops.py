"""Unit tests for the training-data ops: multimodal plumbing, MinHash
recall vs exact Jaccard, SimHash locality, and text-analysis edge cases.
(Oracle parity for all of these is covered in test_oracle_parity.py;
these tests pin the semantics the oracles can't see.)"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tap_github_search_spark.functions import multimodal as mm
from tap_github_search_spark.functions.textops import (
    rolling_hash,
    simhash16,
    tokens,
    word_shingles,
)


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8", "jpeg")
    with pytest.raises(NotImplementedError):
        mm.sample_frames(b"", 10)


def test_byte_features_roundtrip(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="héllo"), Row(doc_id=2, text="")]
    )
    out = {
        r["doc_id"]: r
        for r in mm.byte_features(mm.to_media_table(docs)).collect()
    }
    raw = "héllo".encode()
    assert out[1]["n_bytes"] == len(raw)
    assert out[1]["sha"] == hashlib.sha256(raw).hexdigest()
    assert out[2]["n_bytes"] == 0


def test_media_meta_matches_payload(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="abc 用户")])
    row = mm.to_media_table(docs).first()
    assert row["meta"]["n_bytes"] == len("abc 用户".encode())
    assert row["meta"]["kind"] == "text"
    assert bytes(row["payload"]) == "abc 用户".encode()


def test_word_shingles_short_text_empty(spark):
    df = spark.createDataFrame([Row(t="one two"), Row(t="a b c d")])
    out = df.select(F.size(word_shingles(tokens("t"))).alias("n")).collect()
    assert sorted(r["n"] for r in out) == [0, 2]


def test_minhash_lsh_finds_exact_dups_and_respects_jaccard(spark):
    # two identical docs, one unrelated: LSH must pair the identical two
    from tap_github_search_spark.plans.queries_traindata import (
        q_docs_minhash_lsh,
    )
    import os

    base = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"z{i}" for i in range(30))
    d = "/root/repo/data/tmp/minhash_unit"
    spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text=base),
         Row(doc_id=3, text=other)]
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    pairs = q_docs_minhash_lsh(spark, d).collect()
    assert [(r["doc_a"], r["doc_b"], r["jac"]) for r in pairs] == [(1, 2, 1.0)]


def test_simhash_locality(spark):
    # one-word change flips few bits; disjoint text flips many
    base = " ".join(f"tok{i}" for i in range(40))
    near = base.replace("tok7", "tok999")
    far = " ".join(f"other{i}" for i in range(40))
    df = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text=near),
         Row(doc_id=3, text=far)]
    )
    h = {r["doc_id"]: r["simhash"] for r in simhash16(df, "doc_id", "text").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[1], h[2]) < ham(h[1], h[3])
    assert ham(h[1], h[2]) <= 4


def test_rolling_hash_is_order_sensitive(spark):
    df = spark.createDataFrame([Row(t="a b c"), Row(t="c b a")])
    fps = [r["fp"] for r in df.select(rolling_hash(tokens("t")).alias("fp")).collect()]
    assert fps[0] != fps[1]
    # and deterministic across invocations
    again = [r["fp"] for r in df.select(rolling_hash(tokens("t")).alias("fp")).collect()]
    assert fps == again
