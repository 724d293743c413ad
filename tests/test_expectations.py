"""merge(expectations=, quarantine_dir=): violating events are dropped
from the table, counted per rule on the single-scan Observation,
dead-lettered with their failed-rule names, and the whole path is
crash-replay idempotent and streamable."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tap_github_search_spark.sources.generator import write_changelog
from tap_github_search_spark.streaming.job import replay, stream
from tap_github_search_spark.table.microlake import MicroLakeTable

RULES = {
    "text_nonempty": "length(text) > 0",
    "turn_idx_nonneg": "turn_idx >= 0",
}


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string",
    ).withColumn("ts", F.timestamp_seconds(F.col("seq") * 60))


def _table(spark, path):
    return MicroLakeTable.create_or_load(
        spark, path,
        _events(spark, []).drop("seq", "op").schema, n_buckets=4,
    )


def test_violations_dropped_counted_and_dead_lettered(spark, tmp_dir):
    t = _table(spark, f"{tmp_dir}/t")
    batch = _events(spark, [
        (1, "I", "c1", 0, "user", "hello", None),
        (2, "I", "c1", 1, "assistant", "", None),        # empty text
        (3, "I", "c2", -1, "user", "negative turn", None),  # bad idx
        (4, "I", "c2", 0, "user", None, None),           # NULL pred → fail
        (5, "I", "c3", -2, "user", "", None),            # fails BOTH
    ])
    res = t.merge(batch, epoch=0, expectations=RULES,
                  quarantine_dir=f"{tmp_dir}/q")
    assert res.events_in == 5 and res.events_quarantined == 4
    m = t.manifest["metrics"][-1]
    assert m["events_quarantined"] == 4
    assert m["quarantine_rules"] == {
        "text_nonempty": 3, "turn_idx_nonneg": 2,
    }
    got = t.snapshot_df().select("conv_id", "turn_idx").collect()
    assert {(r.conv_id, r.turn_idx) for r in got} == {("c1", 0)}
    q = spark.read.parquet(f"{tmp_dir}/q/epoch=0")
    rows = {r["seq"]: sorted(r["_failed"]) for r in q.collect()}
    assert rows == {
        2: ["text_nonempty"], 3: ["turn_idx_nonneg"],
        4: ["text_nonempty"], 5: ["text_nonempty", "turn_idx_nonneg"],
    }
    assert q.select("_commit_epoch").distinct().collect()[0][0] == 0


def test_deletes_pass_and_null_keys_stay_rejected(spark, tmp_dir):
    """Delete events carry no payload and must pass every expectation;
    the base null-key guard still counts as rejected, not quarantined."""
    t = _table(spark, f"{tmp_dir}/t")
    t.merge(_events(spark, [(1, "I", "c1", 0, "user", "hi", None)]),
            epoch=0)
    batch = _events(spark, [
        (2, "D", "c1", 0, None, None, None),            # delete: passes
        (3, "I", None, 0, "user", "null key", None),    # base reject
    ])
    res = t.merge(batch, epoch=1, expectations=RULES,
                  quarantine_dir=f"{tmp_dir}/q")
    assert res.events_quarantined == 0
    m = t.manifest["metrics"][-1]
    assert m["events_rejected"] == 1 and m["events_quarantined"] == 0
    assert t.snapshot_df().count() == 0  # the delete applied
    # no violations → no quarantine write at all
    assert not glob.glob(f"{tmp_dir}/q/epoch=1/*.parquet")


def test_replay_overwrite_is_idempotent(spark, tmp_dir):
    """The committed epoch is a fence no-op that leaves the DLQ intact
    (a pre-commit crash replay is idempotent by construction — the
    write is mode=overwrite into the epoch-named dir)."""
    t = _table(spark, f"{tmp_dir}/t")
    batch = _events(spark, [
        (1, "I", "c1", 0, "user", "ok", None),
        (2, "I", "c1", 1, "user", "", None),
    ])
    kw = dict(expectations=RULES, quarantine_dir=f"{tmp_dir}/q")
    t.merge(batch, epoch=0, **kw)
    q1 = spark.read.parquet(f"{tmp_dir}/q/epoch=0").count()
    t2 = MicroLakeTable.load(spark, f"{tmp_dir}/t")
    assert t2.merge(batch, epoch=0, **kw).skipped  # fence no-op
    assert spark.read.parquet(f"{tmp_dir}/q/epoch=0").count() == q1 == 1


def test_streamed_expectations_with_crash_restart(spark, tmp_dir):
    """stream(expectations=...) applies the contract per microbatch
    under crash injection; quarantined totals across epochs equal the
    WAL's violating rows and the table holds none of them."""
    write_changelog(spark, f"{tmp_dir}/log", 30, n_files=3)
    rules = {"text_short": "length(text) <= 100"}
    kw = dict(expectations=rules, quarantine_dir=f"{tmp_dir}/q",
              n_buckets=8)
    try:
        stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
               f"{tmp_dir}/ckpt", fail_after_batches=1, **kw)
    except Exception:
        pass
    t = stream(spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
               f"{tmp_dir}/ckpt", **kw)
    wal = spark.read.parquet(f"{tmp_dir}/log")
    n_viol = wal.filter(
        (F.col("op") != "D")
        & ~F.coalesce(F.length("text") <= 100, F.lit(False))
    ).count()
    assert n_viol > 0  # the fixture exercises the rule
    quarantined = sum(
        m.get("events_quarantined", 0) for m in t.manifest["metrics"]
    )
    assert quarantined == n_viol
    assert t.snapshot_df().filter(F.length("text") > 100).count() == 0
    q = spark.read.parquet(f"{tmp_dir}/q")
    assert q.count() == n_viol


def test_batch_replay_passes_expectations_through(spark, tmp_dir):
    write_changelog(spark, f"{tmp_dir}/log", 20, n_files=2)
    t, results = replay(
        spark, [f"{tmp_dir}/log"], f"{tmp_dir}/t",
        expectations={"text_short": "length(text) <= 100"},
        quarantine_dir=f"{tmp_dir}/q",
    )
    assert sum(r.events_quarantined for r in results) == \
        spark.read.parquet(f"{tmp_dir}/q").count() > 0