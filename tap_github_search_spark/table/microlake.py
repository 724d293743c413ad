"""MicroLake — a from-scratch Iceberg-semantics lake table over Parquet.

The sandbox has no network, so the real ``iceberg-spark-runtime`` jar
cannot be fetched (SURVEY.md §7.0); MicroLake supplies the same
transactional contract behind an interface an Iceberg adapter can
implement 1:1 on a real cluster (SURVEY.md §7.2 step 3):

 - **Snapshot isolation**: every commit writes an immutable manifest
   (JSON list of data files + schema + epoch) and atomically swaps the
   ``_current`` pointer via ``os.replace``. Readers resolve the pointer
   once; concurrent commits never corrupt a snapshot. Time travel =
   reading an older manifest.
 - **Bucketed copy-on-write MERGE**: data files are hash-bucketed by
   ``conv_id`` (Iceberg's ``bucket(N, conv_id)`` partition spec). A merge
   rewrites only the buckets the incoming batch touches, so per-batch
   cost is proportional to touched data, not table size — the property
   that keeps 10^10-event replay feasible. Bucketing conv_id also makes
   the MERGE shuffle storage-aligned (SPJ-shaped, SURVEY.md §7.4).
 - **Exactly-once**: ``last_committed_epoch`` lives inside the manifest;
   ``merge(batch, epoch)`` is a no-op when ``epoch`` was already
   committed. Lineage and metrics for the epoch are recorded in the same
   manifest, so data+lineage commit atomically (SURVEY.md §7.4).
 - **Schema evolution**: the manifest schema is authoritative; new
   nullable batch columns trigger an implicit ADD COLUMN. Old files are
   read with the evolved schema and missing columns surface as NULL
   (Iceberg's read-time projection semantics).
 - **Deletes as tombstones**: a winning ``op='D'`` keeps a tombstone row
   (``_deleted=true``) so late events older than the delete cannot
   resurrect the key; readers filter tombstones. (Equivalent to Iceberg
   equality deletes + eventual compaction.)

Reference analogs: Singer's at-least-once + PK-idempotent target
(/root/reference/tap_github_search/search_count_streams.py:42) becomes
the epoch fence; the bookmark dict
(search_count_streams.py:147-152) becomes the manifest epoch + lineage.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import lww_winners_salted, lww_winners_window
from ..schema import LWW_ORDER, MERGE_KEYS

META_COLS = ("_seq", "_deleted", "_bucket", "_del1")


class ConcurrentCommitError(RuntimeError):
    """Another writer published this snapshot version first (optimistic
    concurrency conflict). Recovery: reload the table, then retry the
    merge with a NEW epoch derived from the reloaded state
    (``last_committed_epoch + 1``). Retrying with the *same* epoch is
    only correct for duplicate deliveries of the same batch — the epoch
    fence turns it into a no-op, so a losing writer carrying a
    *different* batch would silently drop its data."""


class AuditFailedError(RuntimeError):
    """A write-audit-publish audit rejected the staged branch: main's
    published state was NOT advanced; the branch is left in place for
    inspection (``load_ref``) and can be dropped or re-audited."""


@dataclass
class MergeResult:
    epoch: int
    skipped: bool = False
    events_in: int = 0
    rows_applied: int = 0
    rows_deleted: int = 0
    buckets_touched: int = 0
    merge_ms: int = 0
    lineage: list[dict] = field(default_factory=list)
    events_quarantined: int = 0


class MicroLakeTable:
    """One keyed upsert table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str, manifest: dict):
        self.spark = spark
        self.path = path
        self.manifest = manifest
        #: when set, commits publish to ``_refs/<name>`` instead of
        #: ``_current`` — the write-audit-publish staging branch
        #: (Iceberg branch ref / spark.wap.branch analog)
        self._ref: str | None = None

    # ---------------- lifecycle ----------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        n_buckets: int = 64,
        keys: tuple[str, ...] = MERGE_KEYS,
    ) -> "MicroLakeTable":
        os.makedirs(os.path.join(path, "_manifests"), exist_ok=True)
        manifest = {
            "version": 0,
            "last_committed_epoch": -1,
            "n_buckets": n_buckets,
            "keys": list(keys),
            "schema": schema.jsonValue(),
            "files": [],
            "lineage": [],
            "metrics": [],
        }
        table = cls(spark, path, manifest)
        try:
            table._commit_manifest(manifest)
        except ConcurrentCommitError:
            # manifest-00000000.json already exists: either a racing
            # creator won (identical deterministic content for a given
            # schema) or a prior create() crashed between the manifest
            # write and the _current pointer swap. Self-heal: repair the
            # pointer only if it's missing (never roll back a table that
            # has advanced past v0), then serve the published manifest.
            cur = os.path.join(path, "_current")
            if not os.path.exists(cur):
                ptr_tmp = os.path.join(path, "._current.tmp")
                with open(ptr_tmp, "w") as f:
                    f.write("manifest-00000000.json")
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(ptr_tmp, cur)
            return cls.load(spark, path)
        return table

    @classmethod
    def load(cls, spark: SparkSession, path: str, version: int | None = None
             ) -> "MicroLakeTable":
        if version is None:
            with open(os.path.join(path, "_current")) as f:
                name = f.read().strip()
        else:
            name = f"manifest-{version:08d}.json"
        with open(os.path.join(path, "_manifests", name)) as f:
            return cls(spark, path, json.load(f))

    @classmethod
    def create_or_load(cls, spark, path, schema, **kw) -> "MicroLakeTable":
        if os.path.exists(os.path.join(path, "_current")):
            return cls.load(spark, path)
        return cls.create(spark, path, schema, **kw)

    @classmethod
    def from_snapshot(
        cls,
        spark: SparkSession,
        path: str,
        snapshot_df: DataFrame,
        as_of_seq: int,
        n_buckets: int = 64,
        keys: tuple[str, ...] = MERGE_KEYS,
    ) -> "MicroLakeTable":
        """Initial-snapshot bootstrap (Debezium snapshot-then-stream /
        DMS full-load+CDC analog; the reference's FULL_TABLE first sync
        before INCREMENTAL, /root/reference/tap_github/client.py:83-101):
        create the table PRE-LOADED with a consistent final-state
        snapshot taken at WAL position ``as_of_seq``, leaving the epoch
        fence virgin (``last_committed_epoch = -1``) so a subsequent
        ``stream()``/``replay()`` applies every WAL batch from the
        checkpoint's start. Those paths read ``bootstrap_seq`` from the
        manifest and push ``seq > bootstrap_seq`` into the WAL scan —
        the overlap window the snapshot already reflects is skipped at
        parquet row-group level, and WAL retention is verified to reach
        the cutover point (no silent gap).

        ``snapshot_df`` is FINAL STATE (one live row per key, no
        op/seq). Rows are stamped ``_seq = as_of_seq``, so any
        replayed overlap event would lose/win LWW on the data ``ts``
        exactly as if applied before the snapshot was taken. One
        cluster shuffle + key-sorted bucket write — same physical
        layout as a merge epoch."""
        if "op" in snapshot_df.columns or "seq" in snapshot_df.columns:
            raise ValueError(
                "from_snapshot takes FINAL-STATE rows (no op/seq "
                "changelog columns); replay the WAL instead"
            )
        schema = T.StructType(list(snapshot_df.schema.fields))
        table = cls.create(spark, path, schema, n_buckets=n_buckets,
                           keys=keys)
        store = snapshot_df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name)
              for f in schema.fields],
            F.lit(int(as_of_seq)).cast("long").alias("_seq"),
            F.lit(False).alias("_deleted"),
        ).withColumn("_bucket", table._bucket_expr(keys[0]))
        store = table._cluster(store)  # one writer task per bucket
        dirname = f"bootstrap-{uuid.uuid4().hex[:8]}"
        table._write(store).parquet(os.path.join(path, "data", dirname))
        files = table._list_epoch_files(dirname)
        table._commit(-1, files, [], None,
                      extra={"bootstrap_seq": int(as_of_seq)})
        return table

    # ---------------- properties ----------------

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.manifest["schema"])

    @property
    def keys(self) -> tuple[str, ...]:
        return tuple(self.manifest["keys"])

    @property
    def n_buckets(self) -> int:
        return self.manifest["n_buckets"]

    @property
    def last_committed_epoch(self) -> int:
        return self.manifest["last_committed_epoch"]

    # ---------------- read paths ----------------

    def _bucket_expr(self, col: str):
        """bucket(N, conv_id) — deliberately Murmur3 (`F.hash`), the same
        function `repartition(N, col)` uses, so one repartition both
        clusters keys for dedup AND aligns rows to their bucket: every
        task writes exactly one bucket directory, no second shuffle."""
        return F.pmod(F.hash(F.col(col)), F.lit(self.n_buckets)).cast("int")

    def _cluster(self, df: DataFrame) -> DataFrame:
        """One shuffle that serves the whole merge: hash-cluster on the
        first key into n_buckets partitions (partition id == bucket id)."""
        return df.repartition(self.n_buckets, self.keys[0])

    def _cluster_sorted(self, df: DataFrame) -> DataFrame:
        """Key-clustered file layout as an explicit WRITE INVARIANT:
        sort each task partition by (_bucket, *keys) before a
        ``partitionBy("_bucket")`` write. Two effects, both free:

        - FileFormatWriter requires dynamic-partition output sorted by
          the partition columns and would otherwise INJECT its own sort
          by ``_bucket`` alone — an unstable sort that scrambles any
          upstream key order. Prefixing ``_bucket`` here satisfies that
          requirement, so no second sort is planned; widening the sort
          key to ``(conv_id, turn_idx)`` costs only the comparator.
        - Every data file comes out sorted by the merge keys, so parquet
          row-group min/max stats are tight: ``lookup``'s pushed key
          predicate skips row groups inside a file, the manifest zone
          maps (``_key_zone``) shrink to real intervals, and sorted keys
          compress better. Iceberg's write.sort-order, same rationale.
        """
        return df.sortWithinPartitions("_bucket", *self.keys)

    def _write(self, df: DataFrame):
        """The single data-file writer: key-sorted layout
        (``_cluster_sorted``) + a parquet-NATIVE bloom filter on the
        primary key. Zone maps (footer min/max) prune well when key
        populations are range-separated (e.g. MOR generations touching
        different key cohorts) but degrade to no-ops for uuid-like keys
        whose per-file range spans the whole key space; the bloom
        answers the point-membership question those keys need, is
        checked by the parquet reader itself during row-group filtering
        (no engine code on the read path), and costs ~1.2 bytes/key in
        the file. ``SPARK_GRAFT_BLOOM_NDV`` sizes it per file (0
        disables; default 100k ≈ the per-bucket key count at the target
        bucket size). Iceberg exposes the identical knob as
        write.parquet.bloom-filter-enabled.column.*."""
        out = self._cluster_sorted(df)
        renames = {
            l: p for l, p in self._mapping().items()
            if l in out.columns and l != p
        }
        if renames:  # files always carry PHYSICAL names (see _mapping)
            out = out.withColumnsRenamed(renames)
        w = out.write.mode("overwrite")
        ndv = int(os.environ.get("SPARK_GRAFT_BLOOM_NDV", "100000"))
        if ndv > 0:
            k = self._physical(self.keys[0])
            w = (
                w.option(f"parquet.bloom.filter.enabled#{k}", "true")
                .option(f"parquet.bloom.filter.expected.ndv#{k}", str(ndv))
            )
        return w.partitionBy("_bucket")

    def _read_files(
        self, files: list[dict], schema: T.StructType | None = None
    ) -> DataFrame:
        """Read data files under ``schema`` (default: current table
        schema); columns added after a file was written surface as NULL
        (schema-evolution read).

        The schema is passed to the reader EXPLICITLY — the manifest is
        authoritative, evolution is add-nullable-column-only, and the
        parquet reader null-fills columns missing from a file. A
        ``mergeSchema`` read would instead launch a footer-merging job
        over every file at plan time: O(files) driver work per query,
        a real tax at 10^5 files."""
        meta_schema = T.StructType(
            list((schema or self.schema).fields)
            + [T.StructField("_seq", T.LongType()),
               T.StructField("_deleted", T.BooleanType())]
        )
        if not files:
            return self.spark.createDataFrame([], meta_schema)
        # files carry PHYSICAL column names; read physically, project
        # back to logical (the column-mapping read path — rename is
        # metadata-only, so this alias is the entire cost)
        mapping = self._mapping()
        phys_schema = T.StructType([
            T.StructField(mapping.get(f.name, f.name), f.dataType, f.nullable)
            for f in meta_schema.fields
        ])
        paths = [os.path.join(self.path, f["path"]) for f in files]
        return self.spark.read.schema(phys_schema).parquet(*paths).select(
            *[
                F.col(mapping.get(f.name, f.name)).alias(f.name)
                for f in meta_schema.fields
            ]
        )

    def raw_df(self) -> DataFrame:
        """All live + tombstone rows with engine metadata (every file
        generation under MOR — duplicates per key possible)."""
        return self._read_files(self.manifest["files"])

    def _read_lww(self, df: DataFrame) -> DataFrame:
        """Read-side LWW across MOR file generations: newest (ts, _seq)
        row per key wins (tombstones participate, then readers filter)."""
        order = [c for c in LWW_ORDER[:-1] if c in df.columns] + ["_seq"]
        w = Window.partitionBy(*self.keys).orderBy(
            *[F.col(c).desc() for c in order]
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def snapshot_df(self, buckets: list[int] | set[int] | None = None
                    ) -> DataFrame:
        """User-facing table state: live rows, payload columns only.
        Under MOR (``read_dedup`` set by a generation-appending commit)
        the per-key winner is resolved here; CoW tables read plain.

        ``buckets``: restrict the read to these bucket ids' files
        (``_snapshot_buckets`` — the change_feed pruning path, exposed
        for the derived maintainers in r06: a probe that joins on the
        table's own merge key only needs the affected keys' buckets,
        so the files read are O(epoch), not O(table)). Old-spec files
        of a pending migration are always included (they can hold any
        current-spec bucket's keys). A bucket restriction is only
        sound for consumers that subsequently filter/join on the
        bucketing key — it is NOT a general row filter."""
        if buckets is not None:
            return self._snapshot_buckets(set(buckets))
        df = self.raw_df()
        if self.manifest.get("read_dedup"):
            df = self._read_lww(df)
        return (
            df.filter(~F.col("_deleted"))
            .select(*[f.name for f in self.schema.fields])
        )

    # ---------------- schema evolution ----------------

    #: Iceberg's safe type promotions (ALTER COLUMN TYPE without data
    #: rewrite): the parquet reader promotes narrow values at scan time
    #: (int32 files read as long, float as double — verified on Spark 4)
    _WIDENINGS = {("integer", "long"), ("float", "double")}

    def _evolve_schema(self, batch_schema: T.StructType) -> list[T.StructField]:
        """Diff incoming payload columns against the table schema; returns
        the ADD COLUMN / widen-type plan (applied at commit). Reference
        analog: discovered dynamic schema → catalog
        (/root/reference/tap_github/organization_streams.py:912-1058).

        Type evolution follows Iceberg's safe-promotion rules: a batch
        column arriving WIDER than the table's (int→long, float→double)
        widens the table schema metadata-only — old files keep their
        narrow physical type and the parquet reader promotes at scan.
        A batch column NARROWER than the table's is simply cast up by
        the caller. Key / WAL-order columns never widen: ``turn_idx``'s
        width participates in nothing here, but a key's hash bytes
        would differ between int and long (``F.hash``), silently
        remapping every bucket — refuse instead.

        With name-based column mapping (``rename_column`` /
        ``drop_column``) a batch column whose name is a PHYSICAL name
        still present in old data files must be rejected, not added:
        auto-adding it would resurrect the old files' bytes under the
        new logical column (renamed-away data reappearing, or a dropped
        column coming back). Iceberg avoids this with field ids; a
        name-mapped table has to refuse the collision and ask the
        producer to pick a fresh name (stream_map rename upstream)."""
        existing = {f.name: f for f in self.schema.fields}
        skip = set(("op",) + LWW_ORDER) | set(META_COLS)
        protected = set(self.keys) | skip
        mapping = self.manifest.get("renames", {})
        shadowed = set(mapping.values()) | set(
            self.manifest.get("dropped_physical", [])
        )
        added = []
        for f in batch_schema.fields:
            if f.name in skip:
                continue
            if f.name in existing:
                cur = existing[f.name].dataType
                pair = (cur.typeName(), f.dataType.typeName())
                if pair in self._WIDENINGS:
                    if f.name in protected:
                        raise ValueError(
                            f"cannot widen key/ordering column "
                            f"'{f.name}' ({pair[0]} -> {pair[1]}): key "
                            "hash bytes would change and remap buckets"
                        )
                    added.append(("widen", T.StructField(
                        f.name, f.dataType, nullable=True)))
                elif pair[0] != pair[1] and pair[::-1] not in self._WIDENINGS:
                    # ADVICE r4: anything that is not equal, a safe
                    # widening, or the narrow side of one (which merge
                    # upcasts losslessly) means a broken producer — a
                    # string where the table has int, a double where it
                    # has long. Silently casting would null or mangle
                    # values depending on ANSI mode; refuse loudly, the
                    # same contract as the shadowed-physical refusal.
                    raise ValueError(
                        f"incompatible type for column '{f.name}': "
                        f"table has {pair[0]}, batch sends {pair[1]} "
                        "(not a safe promotion — fix the producer or "
                        "cast explicitly upstream)"
                    )
                continue
            if f.name in shadowed:
                raise ValueError(
                    f"batch column '{f.name}' collides with a physical "
                    "column name still present in old data files "
                    "(renamed or dropped); re-adding it would resurrect "
                    "old data — rename it upstream"
                )
            added.append(("add", T.StructField(f.name, f.dataType,
                                               nullable=True)))
        return added

    # -------------- column mapping (rename / drop, no rewrite) --------

    def _mapping(self) -> dict:
        """logical → physical column-name map (identity when absent).
        Physical = the name a column's bytes carry inside data files;
        it never changes after first write, so rename/drop are
        metadata-only commits — no data rewrite (Iceberg's schema
        evolution contract, minus field-ids: name collisions with
        shadowed physicals are refused instead, see _evolve_schema)."""
        return self.manifest.get("renames", {})

    def _physical(self, logical: str) -> str:
        return self._mapping().get(logical, logical)

    def rename_column(self, old: str, new: str) -> None:
        """ALTER TABLE RENAME COLUMN as a metadata-only commit: the
        logical schema changes, the physical name in every existing
        (and future) data file stays, reads alias physical→logical."""
        protected = set(self.keys) | set(("op",) + LWW_ORDER) | set(META_COLS)
        names = [f.name for f in self.schema.fields]
        if old not in names:
            raise ValueError(f"no such column: {old}")
        if old in protected:
            raise ValueError(f"cannot rename key/ordering column: {old}")
        # exclude old's OWN physical name from the collision set: a→b→a
        # rename-back lands on its own physical slot, a safe identity
        # mapping (Iceberg allows the same; ADVICE r3)
        used_physical = {
            self._physical(n) for n in names if n != old
        } | set(self.manifest.get("dropped_physical", []))
        if new in names or new in used_physical:
            raise ValueError(f"column name in use (logical or physical): {new}")
        mapping = dict(self._mapping())
        phys = mapping.pop(old, old)
        if phys != new:
            mapping[new] = phys
        fields = [
            T.StructField(new, f.dataType, f.nullable) if f.name == old else f
            for f in self.schema.fields
        ]
        self._commit(
            self.last_committed_epoch, self.manifest["files"], [],
            metrics=None, evolved_schema=T.StructType(fields),
            extra={"renames": mapping}, op=("rename", old, new),
        )

    def drop_column(self, name: str) -> None:
        """ALTER TABLE DROP COLUMN, metadata-only: the column leaves
        the logical schema; its physical bytes stay in old files and
        are never projected again. The physical name is tombstoned so
        a later ADD COLUMN cannot resurrect the stale bytes."""
        protected = set(self.keys) | set(("op",) + LWW_ORDER) | set(META_COLS)
        names = [f.name for f in self.schema.fields]
        if name not in names:
            raise ValueError(f"no such column: {name}")
        if name in protected:
            raise ValueError(f"cannot drop key/ordering column: {name}")
        mapping = dict(self._mapping())
        phys = mapping.pop(name, name)
        dropped = list(self.manifest.get("dropped_physical", []))
        if phys not in dropped:
            dropped.append(phys)
        fields = [f for f in self.schema.fields if f.name != name]
        self._commit(
            self.last_committed_epoch, self.manifest["files"], [],
            metrics=None, evolved_schema=T.StructType(fields),
            extra={"renames": mapping, "dropped_physical": dropped},
            op=("drop-column", name),
        )

    # ---------------- MERGE ----------------

    def merge(
        self,
        batch_df: DataFrame,
        epoch: int,
        winner_transform=None,
        merge_mode: str = "cow",
        dedup: str = "window",
        max_payload_bytes: int | None = None,
        expectations: dict[str, str] | None = None,
        quarantine_dir: str | None = None,
        extra_manifest: dict | None = None,
    ) -> MergeResult:
        """Apply one changelog batch with MERGE semantics, exactly once.

        ``merge_mode``:
          - ``"cow"`` (copy-on-write, default): buckets overlapping
            existing data are rewritten each epoch — reads stay one file
            per bucket, writes pay the rewrite.
          - ``"mor"`` (merge-on-read): staged winner files are appended
            as a new generation and ``snapshot_df`` resolves LWW at read
            time — update-heavy streaming sustains much higher apply
            rates; ``compact()`` folds generations back to one file.

        ``dedup``:
          - ``"window"`` (default): single-shuffle window + Spark's
            WindowGroupLimit rank-limit pushdown.
          - ``"salted"``: explicit two-stage salted reduction first
            (north_rule hot-conversation skew handling) — a conversation
            with millions of duplicate events within one batch is
            pre-reduced across 16 salt shards before the bucket shuffle.

        ``max_payload_bytes``: optional S7-style large-blob guard — events
        whose ``text`` payload exceeds the cap are rejected (counted in
        ``events_rejected``) instead of poisoning the table. Reference
        analog: the 40 MiB diff-fetch cap with tolerated error rows
        (/root/reference/tap_github/client.py:324-370). Use
        ``operators.payload_guard`` upstream to *retain* typed
        ``{success, error_message}`` rows for the rejects.

        ``expectations``: named SQL predicates (Delta Live Tables
        expectations / Delta CHECK-constraint analog) that every
        insert/update event must satisfy; delete events pass (they
        carry no payload). Violating rows are dropped from the merge
        and counted per rule in the epoch metrics
        (``events_quarantined`` + ``quarantine_rules``); a predicate
        evaluating to NULL counts as failed. With ``quarantine_dir``
        the violating rows are also retained at
        ``{quarantine_dir}/epoch=N`` with a ``_failed`` rule-name array
        — a dead-letter queue the producer can replay after fixing.
        The quarantine write is a second scan of the WAL batch, paid
        ONLY in epochs that actually have violations (the decision
        rides the same single-scan Observation as the other guards);
        the write is mode=overwrite into the epoch dir, so a crash
        replay is idempotent, same contract as the staged merge.

        ``extra_manifest``: extra key/values folded into the manifest in
        the SAME atomic swap as the epoch fence — how a maintainer
        records external watermarks (e.g. the join view's
        ``dim_version_seen``) exactly-once with its own commit.

        ``winner_transform`` (e.g. the vectorized text normalizer) runs
        AFTER within-batch LWW dedup, so the Python/Arrow exchange sees
        only winner rows, not every superseded update — at update-heavy
        CDC ratios this is the difference between normalizing 10^10 and
        ~10^9 rows. LWW picks by (ts, seq) only, so transform order
        cannot change which row wins.

        Equivalent Iceberg SQL (SURVEY.md §2.7 J5)::

            MERGE INTO t USING (LWW-deduped batch) s
              ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
              WHEN MATCHED AND s.op = 'D' THEN DELETE
              WHEN MATCHED AND (s.ts, s.seq) > (t.ts, t._seq) THEN UPDATE SET *
              WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *

        plus tombstone retention for the DELETE branch.

        Physical strategy (stage-then-rewrite, chosen after profiling —
        a cache-winners-then-union plan serializes on the columnar
        cache and rewrites every batch bucket):

        1. **Stage**: dedup + transform the batch winners and write them
           straight to ``data/epoch=N`` bucket-partitioned — one full
           pass, no ``persist``.
        2. **Lineage**: aggregate per-bucket stats from a column-pruned
           scan of the *staged* files (reads 3 skinny columns).
        3. **Rewrite**: only buckets that BOTH received batch rows AND
           already hold table data are merged (staged ∪ old → LWW) into
           ``data/epoch=N.rw``; staged files of non-overlapping buckets
           are referenced as-is. An insert-only epoch rewrites nothing.
        """
        t0 = time.monotonic()
        if epoch <= self.last_committed_epoch:
            return MergeResult(epoch=epoch, skipped=True)

        plan = self._evolve_schema(batch_df.schema)
        widen = {f.name: f for kind, f in plan if kind == "widen"}
        evolved = T.StructType(
            [widen.get(f.name, f) for f in self.schema.fields]
            + [f for kind, f in plan if kind == "add"]
        )
        payload_names = [f.name for f in evolved.fields]

        # 1. Within-batch LWW dedup + winner-only transform (vectorized
        #    normalize), staged directly to parquet. The `_cluster`
        #    repartition is the ONLY shuffle in the whole stage path:
        #    the window dedup reuses its clustering (Catalyst elides the
        #    Exchange and pushes a WindowGroupLimit rank-limit into the
        #    sort), and because bucket == partition id, `partitionBy`
        #    writes exactly one bucket directory per task.
        # Reject malformed events (null merge keys; oversize payloads
        # when capped) instead of poisoning the bucket layout. BOTH the
        # input count and the valid count ride one Observation on the
        # staged write — the WAL batch is scanned exactly once (a
        # separate `batch_df.count()` would double read amplification
        # on the hottest path in the engine). Reference analog:
        # tolerated error responses
        # (/root/reference/tap_github/client.py:324-370).
        from pyspark.sql import Observation

        accept = F.lit(True)
        for k in self.keys:
            accept = accept & F.col(k).isNotNull()
        if max_payload_bytes is not None and "text" in batch_df.columns:
            accept = accept & (
                F.coalesce(F.octet_length("text"), F.lit(0))
                <= F.lit(int(max_payload_bytes))
            )
        base_accept = accept
        rule_fail: dict[str, F.Column] = {}
        if expectations:
            is_delete = F.coalesce(F.col("op") == "D", F.lit(False))
            for name, pred in expectations.items():
                rule_fail[name] = ~is_delete & ~F.coalesce(
                    F.expr(pred), F.lit(False)
                )
                accept = accept & ~rule_fail[name]
        obs = Observation(f"merge_obs_{epoch}_{uuid.uuid4().hex[:6]}")
        valid = batch_df.observe(
            obs,
            F.count(F.lit(1)).alias("n_in"),
            F.count(F.when(base_accept, 1)).alias("n_base"),
            F.count(F.when(accept, 1)).alias("n_valid"),
            *[
                F.count(F.when(base_accept & fail, 1)).alias(f"q_{i}")
                for i, fail in enumerate(rule_fail.values())
            ],
        ).filter(accept)

        if dedup == "salted":
            pre = lww_winners_salted(valid, keys=self.keys, order=LWW_ORDER)
            winners = self._cluster(pre)
        else:
            winners = lww_winners_window(
                self._cluster(valid), keys=self.keys, order=LWW_ORDER
            )
        if winner_transform is not None:
            winners = winner_transform(winners)
        for fld in evolved.fields:  # align batch to evolved schema
            if fld.name not in winners.columns:
                winners = winners.withColumn(fld.name,
                                             F.lit(None).cast(fld.dataType))
        store = winners.select(
            # cast aligns batch column types to the evolved schema (a
            # narrower producer casts UP; identity casts are elided by
            # Catalyst, so matched types cost nothing)
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in evolved.fields
            ],
            F.col("seq").alias("_seq"),
            (F.col("op") == "D").alias("_deleted"),
            # r06: NULL-unless-deleted marker — the parquet footer's
            # null_count then equals the file's LIVE row count, which
            # (with the _seq zone) lets commit derive the per-bucket
            # lineage from the footer stats it already reads, instead
            # of a second Spark scan of the staged files (one job per
            # merge — the dominant fixed cost of small derived-level
            # epochs). Never part of the logical schema (META_COLS).
            F.when(F.col("op") == "D", F.lit(1)).alias("_del1"),
        ).withColumn("_bucket", self._bucket_expr(self.keys[0]))

        # writer-unique dirname: a losing concurrent writer must never
        # overwrite data files the winner's manifest already references
        # (the manifest CAS alone fires too late to protect files)
        commit_tag = uuid.uuid4().hex[:8]
        stage_name = f"epoch={epoch}-{commit_tag}"
        stage_dir = os.path.join(self.path, "data", stage_name)
        self._write(store).parquet(stage_dir)
        staged_files = self._list_epoch_files(stage_name)
        events_in = int(obs.get["n_in"])
        events_rejected = events_in - int(obs.get["n_base"])
        events_quarantined = int(obs.get["n_base"]) - int(obs.get["n_valid"])
        quarantine_rules = {
            name: int(obs.get[f"q_{i}"])
            for i, name in enumerate(rule_fail)
        }
        if quarantine_dir and events_quarantined:
            # dead-letter retention: second WAL scan, only on epochs
            # with violations; overwrite-into-epoch-dir is replay-safe
            any_fail = F.lit(False)
            for fail in rule_fail.values():
                any_fail = any_fail | fail
            failed_arr = F.array_compact(F.array(*[
                F.when(fail, F.lit(name))
                for name, fail in rule_fail.items()
            ]))
            (
                batch_df.filter(base_accept & any_fail)
                .withColumn("_failed", failed_arr)
                .withColumn("_commit_epoch", F.lit(epoch).cast("long"))
                .write.mode("overwrite")
                .parquet(os.path.join(quarantine_dir, f"epoch={epoch}"))
            )

        # 2. Per-bucket lineage. Fast path (r06): every staged file's
        #    footer already yields rows, a _seq zone and (via the
        #    _del1 null-count trick) its live-row count — so the
        #    per-bucket aggregate is driver arithmetic over the stats
        #    _list_epoch_files collected, no second Spark scan. Files
        #    missing any stat (stats disabled, exotic writer) fall
        #    back to the original column-pruned scan.
        lin_rows: list[dict] = []
        if staged_files and all(
            "seq_min" in f and "live_rows" in f and "rows" in f
            for f in staged_files
        ):
            per_bucket: dict[int, dict] = {}
            for f in staged_files:
                b = per_bucket.setdefault(f["bucket"], {
                    "_bucket": f["bucket"],
                    "seq_min": f["seq_min"], "seq_max": f["seq_max"],
                    "rows_applied": 0, "rows_deleted": 0,
                })
                b["seq_min"] = min(b["seq_min"], f["seq_min"])
                b["seq_max"] = max(b["seq_max"], f["seq_max"])
                b["rows_applied"] += int(f["live_rows"])
                b["rows_deleted"] += int(f["rows"]) - int(f["live_rows"])
            lin_rows = [per_bucket[b] for b in sorted(per_bucket)]
        elif staged_files:
            lin_rows = [
                r.asDict()
                for r in self.spark.read.parquet(stage_dir)
                .groupBy("_bucket")
                .agg(
                    F.min("_seq").alias("seq_min"),
                    F.max("_seq").alias("seq_max"),
                    F.count(F.when(~F.col("_deleted"), 1))
                    .alias("rows_applied"),
                    F.count(F.when(F.col("_deleted"), 1))
                    .alias("rows_deleted"),
                )
                .collect()
            ]
        affected = sorted(int(r["_bucket"]) for r in lin_rows)

        # 3. Rewrite only buckets overlapping existing data (CoW), or
        #    append the staged generation and defer to read-time (MOR).
        old_by_bucket: dict[int, list[dict]] = {}
        for f in self.manifest["files"]:
            old_by_bucket.setdefault(f["bucket"], []).append(f)
        overlap = {b for b in affected if b in old_by_bucket}

        read_dedup = bool(self.manifest.get("read_dedup"))
        if self.manifest.get("migration_pending"):
            # during progressive spec migration the table is effective
            # MOR: a CoW bucket rewrite keyed by bucket id would mix
            # specs (an old-spec file's keys scatter across many
            # current-spec buckets), so merges append generations and
            # readers keep resolving LWW until migrate_step finishes
            merge_mode = "mor"
            read_dedup = True
        if merge_mode == "mor":
            keep = list(self.manifest["files"])
            new_files = list(staged_files)
            read_dedup = read_dedup or bool(overlap)
            overlap = set()

        else:
            keep = [f for f in self.manifest["files"]
                    if f["bucket"] not in overlap]
            new_files = [f for f in staged_files if f["bucket"] not in overlap]

        if overlap:
            old_files = [f for b in overlap for f in old_by_bucket[b]]
            staged_overlap = [f for f in staged_files if f["bucket"] in overlap]

            def as_events(df: DataFrame) -> DataFrame:
                return df.select(
                    F.when(F.col("_deleted"), F.lit("D"))
                    .otherwise(F.lit("U")).alias("op"),
                    F.col("_seq").alias("seq"),
                    *payload_names,
                )

            merged = lww_winners_window(
                self._cluster(
                    as_events(self._read_files(staged_overlap, schema=evolved))
                    .unionByName(
                        as_events(self._read_files(old_files, schema=evolved))
                    )
                ),
                keys=self.keys,
                order=LWW_ORDER,
            )
            rewrite = merged.select(
                *payload_names,
                F.col("seq").alias("_seq"),
                (F.col("op") == "D").alias("_deleted"),
            ).withColumn("_bucket", self._bucket_expr(self.keys[0]))
            rw_name = f"epoch={epoch}-{commit_tag}.rw"
            rw_dir = os.path.join(self.path, "data", rw_name)
            self._write(rewrite).parquet(rw_dir)
            new_files += self._list_epoch_files(rw_name)

        rows_applied = sum(r["rows_applied"] for r in lin_rows)
        rows_deleted = sum(r["rows_deleted"] for r in lin_rows)
        merge_ms = int((time.monotonic() - t0) * 1000)
        lineage = [
            {
                "commit_epoch": epoch,
                "partition_id": int(r["_bucket"]),
                "seq_min": int(r["seq_min"]),
                "seq_max": int(r["seq_max"]),
                "rows_applied": int(r["rows_applied"]),
                "rows_deleted": int(r["rows_deleted"]),
                "committed_at": _utcnow_iso(),
            }
            for r in lin_rows
        ]
        metrics = {
            "commit_epoch": epoch,
            "events_in": int(events_in),
            "events_rejected": events_rejected,
            "events_deduped": int(rows_applied + rows_deleted),
            "merge_ms": merge_ms,
            "throughput_eps": (events_in * 1000.0 / merge_ms) if merge_ms else 0.0,
        }
        if expectations:
            metrics["events_quarantined"] = events_quarantined
            metrics["quarantine_rules"] = quarantine_rules
        self._commit(epoch, keep + new_files, lineage, metrics, evolved,
                     read_dedup=read_dedup, extra=extra_manifest,
                     op=("merge",))
        return MergeResult(
            epoch=epoch,
            events_in=events_in,
            rows_applied=rows_applied,
            rows_deleted=rows_deleted,
            buckets_touched=len(affected),
            merge_ms=merge_ms,
            lineage=lineage,
            events_quarantined=events_quarantined,
        )

    # ---------------- maintenance ----------------

    def compact(self, drop_tombstones: bool = False,
                max_buckets: int | None = None) -> int:
        """Rewrite every multi-file bucket into a single file (Iceberg's
        rewrite_data_files action), resolving MOR generations with LWW
        along the way — afterwards the table reads plain again
        (``read_dedup`` cleared). Snapshot-isolated like any commit:
        readers of the old manifest keep their file list. With
        ``drop_tombstones`` the delete markers are garbage-collected —
        only safe once no replayable WAL segment predates them.

        ``max_buckets`` bounds one compaction commit (the worst buckets
        — most file generations — first): at 10^10 rows a full-table
        compaction in a single job is neither necessary nor wise; run
        incremental rounds instead (Iceberg's rewrite job groups).
        Note: ``read_dedup`` stays set until NO multi-generation bucket
        remains. Returns the number of buckets rewritten."""
        by_bucket: dict[int, list[dict]] = {}
        for f in self.manifest["files"]:
            by_bucket.setdefault(f["bucket"], []).append(f)
        multi = {b: fs for b, fs in by_bucket.items()
                 if len(fs) > 1 or drop_tombstones}
        remaining_multi = 0
        if max_buckets is not None and len(multi) > max_buckets:
            worst = sorted(multi, key=lambda b: -len(multi[b]))[:max_buckets]
            remaining_multi = sum(
                1 for b, fs in multi.items()
                if b not in worst and len(fs) > 1
            )
            multi = {b: multi[b] for b in worst}
        if not multi:
            if self.manifest.get("read_dedup") and not \
                    self.manifest.get("migration_pending"):
                # single-generation everywhere → safe to clear the flag
                # (NOT during a spec migration: an old-spec file and a
                # current-spec file with different bucket ids can hold
                # the same key — bucket-id grouping can't see it)
                self._commit(self.last_committed_epoch,
                             self.manifest["files"], [], metrics=None,
                             read_dedup=False, op=("compact-clear",))
            return 0
        files = [f for fs in multi.values() for f in fs]
        df = self._read_files(files)
        if self.manifest.get("read_dedup"):
            df = self._read_lww(self._cluster(df))
        if drop_tombstones:
            df = df.filter(~F.col("_deleted"))
        out = df.withColumn("_bucket", self._bucket_expr(self.keys[0]))
        epoch = self.last_committed_epoch
        dirname = f"epoch={epoch}.compact-{uuid.uuid4().hex[:8]}"
        self._write(out.repartition(max(1, len(multi)), "_bucket")).parquet(
            os.path.join(self.path, "data", dirname)
        )
        keep = [f for f in self.manifest["files"] if f["bucket"] not in multi]
        new_files = self._list_epoch_files(dirname)
        # a bounded (max_buckets) round may leave multi-generation
        # buckets behind — readers must keep resolving LWW until none
        # remain
        still_dedup = bool(self.manifest.get("read_dedup")) and (
            remaining_multi > 0
            or bool(self.manifest.get("migration_pending"))
        )
        self._commit(epoch, keep + new_files, [], metrics=None,
                     read_dedup=still_dedup, op=("compact",))
        return len(multi)

    # ------------- progressive partition-spec migration --------------

    def _file_spec(self, f: dict) -> int:
        """The bucket count a data file was written under. Files carry
        ``spec_n`` only while a migration is pending (stamped by
        ``rebucket_start``); absent means the current spec."""
        return int(f.get("spec_n", self.n_buckets))

    def rebucket_start(self, new_n_buckets: int) -> None:
        """Begin PROGRESSIVE partition-spec evolution (VERDICT r3
        missing #3 — the Iceberg way: new data lands under the new
        spec immediately, old files are migrated in bounded rounds by
        ``migrate_step`` instead of one multi-hour full-table rewrite).

        This commit is METADATA-ONLY: every existing file entry is
        stamped with its spec (``spec_n``), the manifest flips to the
        new bucket count, and ``migration_pending`` turns the table
        into effective merge-on-read — post-switch merges append
        generations (never rewrite across specs) and readers resolve
        LWW, so correctness never depends on migration progress.
        Point reads stay correct throughout because ``lookup`` /
        ``scan_keys`` hash each key under EVERY file's own spec.
        ``change_feed`` intervals crossing the switch fall back to the
        full-snapshot diff via the ``last_rebucket_version`` fence,
        exactly as for the all-at-once ``rebucket``."""
        if self.manifest.get("migration_pending"):
            raise ValueError("a spec migration is already pending")
        new_n = int(new_n_buckets)
        if new_n == self.n_buckets:
            return
        files = [
            {**f, "spec_n": self._file_spec(f)}
            for f in self.manifest["files"]
        ]
        self._commit(
            self.last_committed_epoch, files, [], metrics=None,
            read_dedup=True,
            extra={
                "n_buckets": new_n,
                "migration_pending": True,
                "last_rebucket_version": self.manifest["version"] + 1,
            },
            op=("rebucket-start", new_n),
        )

    def migrate_step(self, max_buckets: int = 64) -> int:
        """One bounded migration round: rewrite up to ``max_buckets``
        old-spec bucket groups under the current spec (pure
        repartition — rows keep their ``_seq``/``_deleted``, so no
        cross-file LWW read is needed; ``read_dedup`` keeps resolving
        winners across the resulting generations). Returns the number
        of old-spec groups left AFTER this round; 0 clears
        ``migration_pending``. Each round's cost is proportional to
        the groups it rewrites — safe inside a streaming maintenance
        window, unlike the full-table ``rebucket``. A later
        ``compact()`` folds the migration generations back to one
        file per bucket and clears ``read_dedup``."""
        cur = self.n_buckets
        old: dict[tuple[int, int], list[dict]] = {}
        for f in self.manifest["files"]:
            if self._file_spec(f) != cur:
                old.setdefault((self._file_spec(f), f["bucket"]), []
                               ).append(f)
        if not old:
            if self.manifest.get("migration_pending"):
                self._commit(self.last_committed_epoch,
                             self.manifest["files"], [], metrics=None,
                             extra={"migration_pending": False},
                             op=("migrate-complete",))
            return 0
        groups = sorted(old)[:max_buckets]
        picked = [f for g in groups for f in old[g]]
        picked_paths = {f["path"] for f in picked}
        out = self._read_files(picked).select(
            *[f.name for f in self.schema.fields], "_seq", "_deleted"
        ).withColumn("_bucket", self._bucket_expr(self.keys[0]))
        epoch = self.last_committed_epoch
        dirname = f"epoch={epoch}.migrate-{uuid.uuid4().hex[:8]}"
        self._write(out.repartition(min(cur, max(1, len(groups))),
                                    self.keys[0])).parquet(
            os.path.join(self.path, "data", dirname)
        )
        keep = [f for f in self.manifest["files"]
                if f["path"] not in picked_paths]
        remaining = len(old) - len(groups)
        self._commit(
            epoch, keep + self._list_epoch_files(dirname), [],
            metrics=None,
            extra={"migration_pending": remaining > 0},
            op=("migrate",),
        )
        return remaining

    def rebucket(self, new_n_buckets: int) -> int:
        """Partition-spec evolution: rewrite the table under a new
        bucket count (Iceberg's REPLACE PARTITION FIELD +
        rewrite_data_files). This is the 100 TB growth path — bucket
        count must scale with table size so per-bucket rewrite cost and
        per-task winner state stay bounded; a table created at
        n_buckets=64 eventually needs 4096. One full rewrite,
        snapshot-isolated like any commit (readers of older manifests
        keep the old spec); MOR generations are LWW-resolved on the way
        through, so the result reads plain. Returns the number of data
        files written."""
        df = self.raw_df()
        if self.manifest.get("read_dedup"):
            df = self._read_lww(self._cluster(df))
        # compute the new-spec bucket from a LOCAL count — self.manifest
        # only swaps to the new spec after the CAS commit succeeds, so a
        # losing racer keeps a handle consistent with the published spec
        new_n = int(new_n_buckets)
        new_bucket = F.pmod(F.hash(F.col(self.keys[0])), F.lit(new_n)).cast("int")
        out = df.withColumn("_bucket", new_bucket)
        epoch = self.last_committed_epoch
        dirname = f"epoch={epoch}.rebucket-{uuid.uuid4().hex[:8]}"
        self._write(out.repartition(new_n, self.keys[0])).parquet(
            os.path.join(self.path, "data", dirname)
        )
        new_files = self._list_epoch_files(dirname)
        self._commit(
            epoch, new_files, [], metrics=None, read_dedup=False,
            op=("rebucket", new_n),
            extra={
                "n_buckets": new_n,
                # spec-evolution fence: change_feed intervals crossing
                # this version must not trust pre-rebucket bucket ids
                "last_rebucket_version": self.manifest["version"] + 1,
            },
        )
        return len(new_files)

    def vacuum(self, keep_versions: int = 1,
               grace_seconds: float = 3600.0) -> int:
        """Delete data files referenced by NO retained manifest version
        (orphans from losing concurrent writers, compaction, rewrites).
        ``keep_versions`` newest manifests stay time-travelable; older
        manifests are dropped so their exclusive files become orphans.
        Returns the number of files deleted. (Iceberg's
        expire_snapshots + remove_orphan_files.)

        ``grace_seconds``: files younger than this are never deleted,
        even when unreferenced — a concurrent in-flight merge stages its
        data files BEFORE its manifest commit, so without the age cutoff
        vacuum would delete the stage of a merge about to win (Iceberg's
        remove_orphan_files ``older_than`` guard). Pass 0 only when the
        caller holds exclusive access to the table."""
        mdir = os.path.join(self.path, "_manifests")
        names = sorted(
            n for n in os.listdir(mdir) if n.startswith("manifest-")
        )
        keep_versions = max(1, keep_versions)
        # named refs are GC roots: a tagged version stays
        # time-travelable and a live branch head keeps its (not yet
        # published) files, regardless of keep_versions. Intermediate
        # branch versions get no such protection — only the head is
        # reachable through the ref.
        # _current is a root too: with a live branch the NEWEST
        # manifests can be branch commits, so names[-keep_versions:]
        # alone could drop the very manifest main serves.
        ref_roots = {r["manifest"] for r in self.list_refs().values()}
        try:
            with open(os.path.join(self.path, "_current")) as f:
                ref_roots.add(f.read().strip())
        except FileNotFoundError:
            pass
        retained = [
            n for n in names
            if n in ref_roots or n in names[-keep_versions:]
        ]
        dropped = [n for n in names if n not in set(retained)]
        referenced: set[str] = set()
        for n in retained:
            with open(os.path.join(mdir, n)) as f:
                referenced |= {x["path"] for x in json.load(f)["files"]}
        deleted = 0
        cutoff = time.time() - grace_seconds
        data_root = os.path.join(self.path, "data")
        for dirpath, _dirs, files in os.walk(data_root):
            for fn in files:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.path)
                if (fn.endswith(".parquet") and rel not in referenced
                        and os.path.getmtime(full) <= cutoff):
                    os.remove(full)
                    deleted += 1
        for dirpath, dirs, files in os.walk(data_root, topdown=False):
            if not dirs and not files and dirpath != data_root:
                os.rmdir(dirpath)
        for n in dropped:
            os.remove(os.path.join(mdir, n))
        return deleted

    def optimize(
        self,
        *,
        target_bucket_bytes: int = 256 << 20,
        max_generations: int = 4,
        compact_batch: int = 64,
        keep_versions: int = 8,
        grace_seconds: float = 3600.0,
        metadata_keep_epochs: int | None = None,
        dry_run: bool = False,
        allow_rebucket: bool = True,
        progressive_rebucket: bool = False,
    ) -> dict:
        """Auto-maintenance policy: inspect manifest/layout stats and
        run the cheapest action that restores the table's layout
        invariants (the operational loop a 10^10-row table needs on a
        schedule — Iceberg/Delta ship the same as OPTIMIZE +
        expire_snapshots; the reference has no table to maintain, its
        state is one bookmark blob per stream,
        /root/reference/tap_github/client.py:83-101).

        Decision inputs are O(files) driver-side stats (manifest rows +
        ``os.stat`` sizes) — NO data scan and NO Spark job unless an
        action actually fires:

        1. **MOR generation pileup** — any bucket holding more than
           ``max_generations`` file generations pays a per-read LWW
           resolve; run a bounded ``compact`` (worst buckets first,
           ``compact_batch`` per round so one maintenance window never
           rewrites the whole table).
        2. **Bucket growth** — average bucket size above
           ``target_bucket_bytes`` means per-bucket rewrite cost and
           per-task state are drifting up; ``rebucket`` to the next
           power of two that restores the target. Rebucket subsumes
           compaction (it LWW-resolves generations on the way through),
           so when both trigger only rebucket runs.
        3. **Manifest history growth** — more than ``keep_versions``
           retained snapshots: ``vacuum`` expires old manifests and
           deletes orphaned data files (age-gated by
           ``grace_seconds``).

        ``dry_run`` reports the decisions without acting. Returns the
        action report; calling again immediately is a no-op (policy is
        idempotent at a fixed point).
        """
        report: dict = {
            "actions": [],
            "compacted_buckets": 0,
            "rebucketed_to": None,
            "vacuumed_files": 0,
            "dry_run": dry_run,
        }
        files = self.manifest["files"]
        by_bucket: dict[int, int] = {}
        for f in files:
            by_bucket[f["bucket"]] = by_bucket.get(f["bucket"], 0) + 1
        pileup = sorted(
            (b for b, n in by_bucket.items() if n > max_generations),
        )
        total_bytes = 0
        for f in files:
            if "bytes" in f:  # recorded at commit from the footer read
                total_bytes += f["bytes"]
                continue
            try:  # pre-stats manifests: stat on demand
                total_bytes += os.path.getsize(
                    os.path.join(self.path, f["path"])
                )
            except OSError:
                pass
        report["total_bytes"] = total_bytes
        per_bucket = total_bytes / max(1, self.n_buckets)

        # Maintenance runs concurrently with ingest in production; every
        # action commits via the manifest CAS, so a racing merge can win
        # the version. Losing a race is NOT an error for a policy loop —
        # record it and let the next scheduled run retry against the
        # fresher snapshot (Iceberg's maintenance procedures behave the
        # same way: commit conflict → retry later).
        # ``allow_rebucket=False`` is the IN-STREAM policy contract
        # (VERDICT r3 #3): compact/vacuum are bounded actions safe
        # inside a foreachBatch window, but rebucket is a FULL-TABLE
        # rewrite — at 10^10 rows it would stall ingest for hours and
        # hold the trigger. The streaming loop therefore only REPORTS
        # the rebucket decision (dry-run style); execution belongs to
        # the out-of-band ``maintain`` CLI, which runs with
        # allow_rebucket=True on its own schedule. When a rebucket is
        # wanted but deferred, compaction still runs so MOR pileup
        # stays bounded in the meantime.
        # ``progressive_rebucket=True`` makes the growth trigger START
        # an Iceberg-style progressive migration instead of deferring:
        # ``rebucket_start`` is metadata-only (bounded, stream-safe)
        # and subsequent policy runs execute ``migrate_step`` rounds
        # of at most ``compact_batch`` bucket groups each — the
        # bounded-cost alternative to the out-of-band full rewrite.
        pending = bool(self.manifest.get("migration_pending"))
        want_rebucket = (not pending) and per_bucket > target_bucket_bytes
        if pending:
            report["actions"].append(
                f"migrate_step (progressive spec migration, "
                f"{compact_batch} bucket groups/round)"
            )
            if not dry_run:
                try:
                    report["migration_remaining"] = self.migrate_step(
                        max_buckets=compact_batch
                    )
                except ConcurrentCommitError:
                    report["actions"].append("migrate_step lost commit race")
            # ADVICE r4: a long migration forces MOR on every epoch's
            # merge, so generation pileup grows for its whole duration
            # if the policy loop only migrates. Run the same bounded
            # compact here — safe mid-migration because compact keeps
            # read_dedup set while migration_pending (the flag-clear is
            # guarded), so read amplification stays bounded for streams
            # driven by optimize_every alone.
            if pileup:
                n = min(len(pileup), compact_batch)
                report["actions"].append(
                    f"compact {n}/{len(pileup)} buckets "
                    f"(>{max_generations} generations, mid-migration)"
                )
                if not dry_run:
                    try:
                        report["compacted_buckets"] = self.compact(
                            max_buckets=compact_batch
                        )
                    except ConcurrentCommitError:
                        report["actions"].append("compact lost commit race")
        elif want_rebucket and allow_rebucket:
            new_n = self.n_buckets
            while total_bytes / new_n > target_bucket_bytes:
                new_n *= 2
            report["actions"].append(
                f"rebucket {self.n_buckets}->{new_n} "
                f"(avg bucket {int(per_bucket)} B > {target_bucket_bytes} B)"
            )
            if not dry_run:
                try:
                    self.rebucket(new_n)
                    report["rebucketed_to"] = new_n
                except ConcurrentCommitError:
                    report["actions"].append("rebucket lost commit race")
        else:
            if want_rebucket:
                new_n = self.n_buckets
                while total_bytes / new_n > target_bucket_bytes:
                    new_n *= 2
                report["rebucket_wanted"] = new_n
                if progressive_rebucket:
                    report["actions"].append(
                        f"rebucket_start {self.n_buckets}->{new_n} "
                        "(progressive: metadata-only switch, bounded "
                        "migrate_step rounds follow)"
                    )
                    if not dry_run:
                        try:
                            self.rebucket_start(new_n)
                        except ConcurrentCommitError:
                            report["actions"].append(
                                "rebucket_start lost commit race"
                            )
                else:
                    report["actions"].append(
                        f"rebucket {self.n_buckets}->{new_n} deferred to "
                        "out-of-band maintain (full-table rewrite not "
                        "allowed in-stream)"
                    )
            if pileup:
                n = min(len(pileup), compact_batch)
                report["actions"].append(
                    f"compact {n}/{len(pileup)} buckets "
                    f"(>{max_generations} generations)"
                )
                if not dry_run:
                    try:
                        report["compacted_buckets"] = self.compact(
                            max_buckets=compact_batch
                        )
                    except ConcurrentCommitError:
                        report["actions"].append("compact lost commit race")

        mdir = os.path.join(self.path, "_manifests")
        n_manifests = sum(
            1 for x in os.listdir(mdir) if x.startswith("manifest-")
        )
        if n_manifests > keep_versions:
            report["actions"].append(
                f"vacuum ({n_manifests} snapshots > keep {keep_versions})"
            )
            if not dry_run:
                report["vacuumed_files"] = self.vacuum(
                    keep_versions=keep_versions,
                    grace_seconds=grace_seconds,
                )
        if metadata_keep_epochs is not None:
            n_segs = len(self.manifest.get("lineage_segments", [])) + len(
                self.manifest.get("metrics_segments", [])
            )
            if n_segs:
                report["actions"].append(
                    f"expire_metadata (keep {metadata_keep_epochs} epochs "
                    f"over {n_segs} segments)"
                )
                if not dry_run:
                    report["expired_segments"] = self.expire_metadata(
                        metadata_keep_epochs
                    )
        return report

    def expire_metadata(self, keep_epochs: int) -> int:
        """Metadata retention — the segment-file counterpart of
        ``vacuum``: unreference and delete lineage/metrics SEGMENTS
        whose every row is older than ``last_committed_epoch -
        keep_epochs``. Without it the spill mechanism that keeps
        commits O(buckets) grows the segment directory forever (tiny
        files, but 10^5 epochs = thousands of them). Segments are
        immutable and epoch-aligned, so expiry reads each candidate's
        max epoch once, commits the shortened reference lists, then
        deletes the files (commit-before-delete: a crash leaves orphan
        segments, never dangling references). Retained OLD manifest
        versions may still cite expired segments — time-traveled
        ``lineage_df`` reads lose history beyond the retention window,
        the same contract as Iceberg's metadata delete-after-commit.
        Returns the number of segment files removed."""
        cutoff = self.last_committed_epoch - keep_epochs
        removed: list[str] = []
        kept_refs: dict[str, list[str]] = {}
        # lineage-expiry fence (ADVICE r3): change_feed's incremental
        # path derives touched buckets from _lineage_entries(after=lo);
        # once a lineage segment is deleted, intervals starting at or
        # before its max epoch can no longer enumerate their buckets
        # and MUST fall back to the full-snapshot diff or they silently
        # drop changes (a replicator with an old bookmark would lose
        # rows). The fence records the newest expired lineage epoch;
        # change_feed forces full_scan below it (same mechanism as
        # last_rebucket_version for spec evolution).
        fence = int(self.manifest.get("lineage_complete_after_epoch", -1))
        for kind in ("lineage", "metrics"):
            kept = []
            for rel in self.manifest.get(f"{kind}_segments", []):
                try:
                    with open(os.path.join(self.path, rel)) as f:
                        rows = json.load(f)
                    mx = max(
                        (r["commit_epoch"] for r in rows), default=None
                    )
                except OSError:
                    continue  # already gone: drop the reference too
                if mx is not None and mx <= cutoff:
                    removed.append(rel)
                    if kind == "lineage":
                        fence = max(fence, int(mx))
                else:
                    kept.append(rel)
            kept_refs[kind] = kept
        if not removed and all(
            kept_refs[k] == self.manifest.get(f"{k}_segments", [])
            for k in kept_refs
        ):
            return 0
        self._commit(
            self.last_committed_epoch, self.manifest["files"], [],
            metrics=None,
            extra={
                "lineage_segments": kept_refs["lineage"],
                "metrics_segments": kept_refs["metrics"],
                "lineage_complete_after_epoch": fence,
            },
            op=("expire-metadata", keep_epochs),
        )
        for rel in removed:
            try:
                os.remove(os.path.join(self.path, rel))
            except OSError:
                pass
        return len(removed)

    def stats(self) -> dict:
        """Table-level statistics from the manifest's per-file entries
        alone — zero data scan, zero Spark jobs (Iceberg's snapshot
        summary). ``total_rows`` counts physical rows incl. tombstones
        and unresolved MOR generations; it is the scan-cost input for a
        cost-based planner, not the live-row count (that requires the
        LWW resolve ``snapshot_df().count()`` performs)."""
        files = self.manifest["files"]
        per_bucket: dict[int, int] = {}
        for f in files:
            per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
        return {
            "version": self.manifest["version"],
            "last_committed_epoch": self.last_committed_epoch,
            "n_buckets": self.n_buckets,
            "n_files": len(files),
            "buckets_with_data": len(per_bucket),
            "max_generations": max(per_bucket.values(), default=0),
            "total_rows": sum(f.get("rows", 0) for f in files),
            "total_bytes": sum(f.get("bytes", 0) for f in files),
            "read_dedup": bool(self.manifest.get("read_dedup")),
            "migration_pending": bool(
                self.manifest.get("migration_pending")
            ),
            "old_spec_files": sum(
                1 for f in files if self._file_spec(f) != self.n_buckets
            ),
        }

    def read_between(self, ts_min, ts_max) -> DataFrame:
        """Time-ranged snapshot read with file-level ``ts`` zone-map
        pruning: live rows whose ``ts`` falls in [ts_min, ts_max].

        On a fully-resolved table (no pending MOR generations) every
        key has exactly one physical row, so a file whose footer
        [ts_min, ts_max] interval misses the window provably holds no
        qualifying rows and is skipped before the scan — the
        replication-window read pattern ("what changed this hour") at
        file cost proportional to the window, not the table. When
        ``read_dedup`` is set, a key's WINNING row may live in a file
        the window would prune while a losing (older) row is inside it
        — pruning first would resurrect losers, so the LWW resolve runs
        over all generations and only the row filter applies.
        """
        from datetime import datetime, timezone

        def _norm(x) -> datetime:
            # naive UTC everywhere: zone strings may carry +00:00 (the
            # parquet isAdjustedToUTC instant), callers may pass naive
            if isinstance(x, str):
                x = datetime.fromisoformat(x)
            if x.tzinfo is not None:
                x = x.astimezone(timezone.utc).replace(tzinfo=None)
            return x

        lo, hi = _norm(ts_min), _norm(ts_max)
        files = self.manifest["files"]
        if not self.manifest.get("read_dedup"):
            files = [
                f for f in files
                if "ts_min" not in f
                or not (_norm(f["ts_max"]) < lo or _norm(f["ts_min"]) > hi)
            ]
        df = self._read_files(files)
        if self.manifest.get("read_dedup"):
            df = self._read_lww(df)
        return (
            df.filter(~F.col("_deleted"))
            .filter(F.col("ts").between(F.lit(lo), F.lit(hi)))
            .select(*[f.name for f in self.schema.fields])
        )

    # ---------------- commit machinery ----------------

    def _file_stats(self, abspath: str) -> dict:
        """Per-file stats from the parquet FOOTER — a KB-sized read per
        new file at commit time, O(epoch files) on the driver (Iceberg's
        add_files collects the same stats into its manifests): row
        count, byte size, and (min, max) zones for the primary key and
        the ``ts`` ordering column. Zone keys are omitted when stats
        are absent; pruning then degrades gracefully to bucket-only.
        parquet-mr truncates long string stats with a proper
        upper-bound increment, so the interval stays a valid cover."""
        out: dict = {}
        try:
            out["bytes"] = os.path.getsize(abspath)
        except OSError:
            pass

        def _zone(md, col: str) -> tuple | None:
            idx = next(
                (i for i in range(md.num_columns)
                 if md.schema.column(i).name == col), None
            )
            if idx is None:
                return None
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    mn = mn.decode("utf-8", "replace")
                if isinstance(mx, bytes):
                    mx = mx.decode("utf-8", "replace")
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
            return None if lo is None else (lo, hi)

        try:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(abspath).metadata
            out["rows"] = md.num_rows
            kz = _zone(md, self._physical(self.keys[0]))
            if kz is not None:
                out["key_min"], out["key_max"] = str(kz[0]), str(kz[1])
            tz = _zone(md, self._physical("ts"))
            if tz is not None:
                # datetime → ISO strings, JSON-stable and ordered
                out["ts_min"] = tz[0].isoformat()
                out["ts_max"] = tz[1].isoformat()
            sz = _zone(md, "_seq")
            if sz is not None:
                out["seq_min"], out["seq_max"] = int(sz[0]), int(sz[1])
            # live rows via the _del1 null-count trick (see merge):
            # _del1 is NULL exactly on live rows, so summing the
            # column's null_count over row groups counts them — which
            # turns commit-time lineage into pure footer arithmetic
            didx = next(
                (i for i in range(md.num_columns)
                 if md.schema.column(i).name == "_del1"), None
            )
            if didx is not None:
                live = 0
                ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(didx).statistics
                    if st is None or st.null_count is None:
                        ok = False
                        break
                    live += int(st.null_count)
                if ok:
                    out["live_rows"] = live
        except (OSError, ImportError, AttributeError):
            pass
        return out

    def _list_epoch_files(self, dirname: str) -> list[dict]:
        """Enumerate one epoch directory's data files and collect their
        footer stats. The footer reads are KB-sized but O(epoch files)
        on the driver — at 4096 buckets/epoch a sequential loop is
        seconds of per-commit latency, so they run on a small thread
        pool (I/O-bound, GIL released inside pyarrow). At larger file
        counts Iceberg moves this into the executors (stats collected
        by the writing task); ``SPARK_GRAFT_FILE_STATS=0`` drops the
        collection entirely (pruning degrades to bucket-only)."""
        epoch_dir = os.path.join(self.path, "data", dirname)
        out: list[dict] = []
        if not os.path.isdir(epoch_dir):
            return out
        for bdir in sorted(os.listdir(epoch_dir)):
            if not bdir.startswith("_bucket="):
                continue
            bucket = int(bdir.split("=")[1])
            for fn in sorted(os.listdir(os.path.join(epoch_dir, bdir))):
                if fn.endswith(".parquet"):
                    out.append({
                        "path": os.path.join("data", dirname, bdir, fn),
                        "bucket": bucket,
                    })
        if os.environ.get("SPARK_GRAFT_FILE_STATS", "1") != "0" and out:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(16, len(out))) as pool:
                stats = list(pool.map(
                    lambda e: self._file_stats(
                        os.path.join(self.path, e["path"])
                    ),
                    out,
                ))
            for entry, st in zip(out, stats):
                entry.update(st)
        return out

    @staticmethod
    def _zone_covers(entry: dict, key_value: str) -> bool:
        """File-level zone-map check: False only when the footer stats
        PROVE the key is absent. Entries without stats always match."""
        if "key_min" not in entry:
            return True
        return entry["key_min"] <= key_value <= entry["key_max"]

    #: manifest keeps this many most-recent lineage entries inline;
    #: older entries spill to immutable segment files. Without the
    #: spill every commit rewrites O(epochs × buckets) JSON — at 10^5
    #: epochs × 4096 buckets that is a multi-GB manifest write per
    #: microbatch. With it, commit cost stays O(buckets).
    LINEAGE_INLINE_MAX = 4096
    #: same mechanism for per-epoch metrics (1 row/epoch, O(epochs))
    METRICS_INLINE_MAX = 4096

    def _spill_rows(self, rows: list[dict], kind: str, keep: int,
                    version: int) -> tuple[list[dict], list[str]]:
        """Move the older slice of ``rows`` into an immutable segment
        file under ``_{kind}/`` (epoch-aligned cut), returning the
        retained inline rows + the new segment's relative path list.
        Written BEFORE the manifest swap: a crash leaves an orphan
        segment, never a dangling reference."""
        cut_epoch = rows[-keep]["commit_epoch"]
        idx = next(
            i for i, r in enumerate(rows)
            if r["commit_epoch"] >= cut_epoch
        )
        spill, inline = rows[:idx], rows[idx:]
        if not spill:
            return inline, []
        seg_dir = os.path.join(self.path, f"_{kind}")
        os.makedirs(seg_dir, exist_ok=True)
        seg_name = f"segment-{version:08d}-{uuid.uuid4().hex[:8]}.json"
        seg_tmp = os.path.join(seg_dir, f".tmp-{seg_name}")
        with open(seg_tmp, "w") as f:
            json.dump(spill, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(seg_tmp, os.path.join(seg_dir, seg_name))
        return inline, [os.path.join(f"_{kind}", seg_name)]

    def _commit(
        self,
        epoch: int,
        files: list[dict],
        lineage: list[dict],
        metrics: dict | None,
        evolved_schema: T.StructType | None = None,
        read_dedup: bool | None = None,
        extra: dict | None = None,
        op: tuple | None = None,
    ) -> None:
        m = dict(self.manifest)
        if op is not None:
            m["commit_op"] = list(op)
        # provenance stamp for version-collision triage: manifests
        # committed through a branch handle carry the branch name (and
        # a main commit must NOT inherit the stamp from a published
        # branch manifest it builds on)
        if self._ref is not None:
            m["commit_ref"] = self._ref
        else:
            m.pop("commit_ref", None)
        if extra:
            m.update(extra)
        m["version"] = self.manifest["version"] + 1
        m["last_committed_epoch"] = epoch
        m["files"] = files
        if read_dedup is not None:
            m["read_dedup"] = read_dedup
        if evolved_schema is not None:
            m["schema"] = evolved_schema.jsonValue()
        m["lineage"] = self.manifest["lineage"] + lineage
        m["metrics"] = self.manifest["metrics"] + (
            [metrics] if metrics is not None else []
        )
        if len(m["lineage"]) > self.LINEAGE_INLINE_MAX:
            # spill the older half to an immutable segment file BEFORE
            # the manifest swap: a crash in between leaves an orphan
            # segment (harmless); the manifest only references the
            # segment once the swap succeeds. The cut is epoch-aligned
            # so one epoch's bucket rows never straddle the boundary
            # (readers can then skip segments whenever the requested
            # interval is covered by the inline window).
            m["lineage"], new_segs = self._spill_rows(
                m["lineage"], "lineage", self.LINEAGE_INLINE_MAX // 2,
                m["version"],
            )
            m["lineage_segments"] = self.manifest.get(
                "lineage_segments", []
            ) + new_segs
        if len(m["metrics"]) > self.METRICS_INLINE_MAX:
            m["metrics"], new_segs = self._spill_rows(
                m["metrics"], "metrics", self.METRICS_INLINE_MAX // 2,
                m["version"],
            )
            m["metrics_segments"] = self.manifest.get(
                "metrics_segments", []
            ) + new_segs
        while True:
            try:
                self._commit_manifest(m)
                break
            except ConcurrentCommitError:
                if op is not None and self._adopt_crashed_commit(m):
                    return
                if self._stale_version_occupant(m["version"]):
                    # an abandoned (dropped or reset) branch left an
                    # orphan manifest at this version — version numbers
                    # are never reused, so step over it. Without this,
                    # one dropped branch would block main's CAS forever
                    # (the orphans sort NEWEST, so vacuum keeps them).
                    m["version"] += 1
                    continue
                raise
        self.manifest = m

    def _stale_version_occupant(self, version: int) -> bool:
        """Is manifest-``version`` residue of an ABANDONED branch (safe
        to skip past), as opposed to a live writer's commit (raise)?
        Residue iff it is stamped with a branch name whose ref is gone,
        is no longer a branch, or — a reset branch reusing the name —
        whose live head is still BELOW this version."""
        name = f"manifest-{version:08d}.json"
        try:
            with open(os.path.join(self.path, "_manifests", name)) as f:
                existing = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        ref_name = existing.get("commit_ref")
        if not ref_name:
            return False  # a main-line commit: genuine concurrent writer
        # ADVICE r5 (high): a manifest REACHABLE FROM MAIN is never
        # residue. publish_branch removes the branch ref but the
        # published manifest still carries commit_ref, so the
        # ref-is-gone test alone would let a stale-handled writer step
        # over a just-published epoch and swing _current past it —
        # silent data loss where the contract promises a loud
        # ConcurrentCommitError. Only residue strictly ABOVE main's
        # published version is safe to skip.
        try:
            with open(os.path.join(self.path, "_current")) as f:
                cur = f.read().strip()
            cur_v = int(cur[len("manifest-"):-len(".json")])
        except (OSError, ValueError):
            cur_v = -1
        if version <= cur_v:
            return False
        ref = self.list_refs().get(ref_name)
        if ref is None or ref.get("kind") != "branch":
            return True
        head_v = int(ref["manifest"][len("manifest-"):-len(".json")])
        return head_v < version

    def _adopt_crashed_commit(self, m: dict) -> bool:
        """Roll-forward for a crash BETWEEN the manifest CAS-link and
        the pointer swap. On restart the epoch fence re-delivers the
        same logical commit with the same version number; the CAS then
        hits the crashed attempt's already-linked manifest and, without
        this, the table is bricked behind ``ConcurrentCommitError``
        forever. If the linked manifest records the SAME logical commit
        — identical ``commit_op`` identity and epoch fence — the prior
        attempt is complete except for the pointer: its data files were
        staged before the link (and the vacuum grace window protects
        them), so publishing the pointer finishes the commit (Iceberg's
        commit-state-unknown reconciliation). Any mismatch means a
        genuinely different writer owns the version — the caller's
        ConcurrentCommitError stands. This attempt's own staged files
        become orphans; vacuum removes them."""
        name = f"manifest-{m['version']:08d}.json"
        try:
            with open(os.path.join(self.path, "_manifests", name)) as f:
                existing = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        if (existing.get("commit_op") != m.get("commit_op")
                or existing.get("commit_ref") != m.get("commit_ref")
                or existing.get("last_committed_epoch")
                != m["last_committed_epoch"]):
            return False
        # content fence: same epoch is NOT enough — a live concurrent
        # writer can race a DIFFERENT batch under the same epoch number
        # and adoption would silently drop its data. The epoch's
        # per-bucket lineage (seq ranges + row counts) is deterministic
        # for a redelivered batch and differs for a different one.
        # (Maintenance ops carry no lineage — both sides empty — and
        # are deterministic functions of the same base snapshot.)
        def _sig(man: dict) -> list[tuple]:
            return sorted(
                (r["partition_id"], r["seq_min"], r["seq_max"],
                 r["rows_applied"], r["rows_deleted"])
                for r in man.get("lineage", [])
                if r["commit_epoch"] == man.get("last_committed_epoch")
            )

        if _sig(existing) != _sig(m):
            return False
        self._publish_pointer(name)
        self.manifest = existing
        return True

    def _commit_manifest(self, manifest: dict) -> None:
        """Write manifest-{v}.json then atomically swap the pointer.
        A crash between the two leaves an orphan manifest — harmless.

        Optimistic concurrency: publishing is an atomic create-if-absent
        (``os.link`` of a writer-unique temp onto the version-named
        manifest — link(2) fails with EEXIST if the name is taken, the
        filesystem CAS). Two racing writers can never both succeed; the
        loser raises ``ConcurrentCommitError`` instead of silently
        clobbering the winner's snapshot (Iceberg's CAS-on-metadata
        semantics). A check-then-act ``exists()`` test would race."""
        mdir = os.path.join(self.path, "_manifests")
        os.makedirs(mdir, exist_ok=True)
        name = f"manifest-{manifest['version']:08d}.json"
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex[:8]}-{name}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        final = os.path.join(mdir, name)
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"snapshot version {manifest['version']} already committed "
                f"by another writer (table {self.path}); reload and retry "
                f"with epoch = last_committed_epoch + 1"
            ) from None
        finally:
            os.remove(tmp)
        self._publish_pointer(name)

    def _publish_pointer(self, name: str) -> None:
        """Atomically point this handle's publish target at manifest
        ``name``: ``_current`` for the main table, the branch ref file
        for a WAP staging branch (main readers never see branch
        commits until ``publish_branch`` fast-forwards)."""
        if self._ref is not None:
            ref = self._read_ref(self._ref)
            ref["manifest"] = name
            self._write_ref(self._ref, ref, overwrite=True)
            return
        ptr_tmp = os.path.join(self.path, "._current.tmp")
        with open(ptr_tmp, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(ptr_tmp, os.path.join(self.path, "_current"))

    # ---------------- point lookup ----------------

    def lookup(self, key_value: str, turn_idx: int | None = None) -> DataFrame:
        """O(1-bucket) point lookup: hash the key to its bucket, read
        only that bucket's files, and let the (conv_id, turn_idx)
        predicate push into the parquet scan — the staged sort order
        (clustered by key) keeps row-group stats tight. The per-key
        read cost is table_size / n_buckets regardless of table size.
        The bucket hash is computed driver-side in pure Python (parity
        with ``F.hash`` is test-enforced) — a point lookup must not
        cost a Spark job just to hash one key."""
        h = murmur3_x86_32(key_value.encode("utf-8"))
        # bucket pruning first, then file-level zone maps: a bucket can
        # hold many generations of files; footer min/max skips the ones
        # that provably don't contain the key. During a progressive
        # spec migration each file is addressed under ITS OWN spec
        # (old-spec files keep answering point reads correctly).
        files = [
            f for f in self.manifest["files"]
            if f["bucket"] == h % self._file_spec(f)
            and self._zone_covers(f, key_value)
        ]
        df = self._read_files(files)
        if self.manifest.get("read_dedup"):
            df = self._read_lww(df)
        df = df.filter(~F.col("_deleted")).filter(
            F.col(self.keys[0]) == key_value
        )
        if turn_idx is not None and len(self.keys) > 1:
            df = df.filter(F.col(self.keys[1]) == turn_idx)
        return df.select(*[f.name for f in self.schema.fields])

    def scan_keys(self, key_values: list[str]) -> DataFrame:
        """Bucket-pruned multi-key read: hash every key driver-side,
        read only the union of their buckets' files, then filter — the
        batch generalization of ``lookup``. For K keys over B buckets
        the read cost is ≤ min(K, B)/B of the table, independent of
        table size."""
        hashes = {k: murmur3_x86_32(k.encode("utf-8")) for k in key_values}
        files = [
            f for f in self.manifest["files"]
            if any(
                f["bucket"] == h % self._file_spec(f)
                and self._zone_covers(f, k)
                for k, h in hashes.items()
            )
        ]
        df = self._read_files(files)
        if self.manifest.get("read_dedup"):
            df = self._read_lww(df)
        return (
            df.filter(~F.col("_deleted"))
            .filter(F.col(self.keys[0]).isin(list(key_values)))
            .select(*[f.name for f in self.schema.fields])
        )

    # ---------------- time travel / change feed ----------------

    def history(self) -> list[dict]:
        """All committed snapshot versions (manifest catalog): version,
        epoch, file count — Iceberg's snapshots metadata table."""
        mdir = os.path.join(self.path, "_manifests")
        out = []
        for name in sorted(os.listdir(mdir)):
            if not name.startswith("manifest-"):
                continue
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            out.append(
                {
                    "version": m["version"],
                    "last_committed_epoch": m["last_committed_epoch"],
                    "n_files": len(m["files"]),
                    "read_dedup": bool(m.get("read_dedup")),
                }
            )
        return out

    def snapshot_at(self, version: int) -> DataFrame:
        """Time travel: the user-facing state as of an older version."""
        return MicroLakeTable.load(self.spark, self.path, version).snapshot_df()

    # ------- named refs: tags, branches, write-audit-publish ---------
    #
    # Iceberg refs analog. A TAG is an immutable named pointer at a
    # snapshot version — a reproducibility anchor ("the corpus the
    # 2026-08 model trained on") that vacuum treats as a GC root. A
    # BRANCH is a writable pointer: a handle returned by
    # ``branch_begin`` commits ordinary manifests (same global CAS —
    # version numbers stay unique table-wide) but publishes them to
    # ``_refs/<name>`` instead of ``_current``, so main readers never
    # observe staged epochs. ``publish_branch`` is the
    # write-AUDIT-publish gate (Iceberg's spark.wap.branch +
    # fast_forward): it verifies main has not advanced past the branch
    # base, runs table-level audit rules over the BRANCH snapshot, and
    # atomically fast-forwards ``_current`` to the branch head — or
    # raises and leaves main untouched. Single-writer-per-branch, same
    # contract as the rest of the engine (the manifest CAS turns any
    # true race into a loud ConcurrentCommitError, never a clobber).

    _REF_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")

    def _ref_file(self, name: str) -> str:
        if not self._REF_NAME_RE.match(name):
            raise ValueError(f"invalid ref name: {name!r}")
        return os.path.join(self.path, "_refs", f"{name}.json")

    def _read_ref(self, name: str) -> dict:
        try:
            with open(self._ref_file(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise KeyError(f"no such ref: {name}") from None

    def _write_ref(self, name: str, payload: dict,
                   overwrite: bool = False) -> None:
        d = os.path.join(self.path, "_refs")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        final = self._ref_file(name)
        if overwrite:
            os.replace(tmp, final)
            return
        try:
            os.link(tmp, final)  # create-if-absent CAS, as for manifests
        except FileExistsError:
            raise ConcurrentCommitError(
                f"ref already exists: {name}"
            ) from None
        finally:
            os.remove(tmp)

    def list_refs(self) -> dict[str, dict]:
        """All named refs: ``{name: {kind, manifest[, base]}}``."""
        d = os.path.join(self.path, "_refs")
        out: dict[str, dict] = {}
        if not os.path.isdir(d):
            return out
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json") and not fn.startswith("."):
                try:
                    with open(os.path.join(d, fn)) as f:
                        out[fn[:-5]] = json.load(f)
                except FileNotFoundError:
                    # ADVICE r5 (low): a concurrent publish/drop can
                    # remove a ref between listdir and open — a
                    # vanished ref is simply not listed, instead of
                    # aborting an unrelated commit/vacuum
                    continue
        return out

    def create_tag(self, name: str, version: int | None = None) -> None:
        """Immutable named snapshot pointer. Defaults to this handle's
        version. Tagged versions survive ``vacuum`` regardless of
        ``keep_versions`` (GC root) — time travel to a tag never
        breaks until ``drop_ref``."""
        v = self.manifest["version"] if version is None else int(version)
        mname = f"manifest-{v:08d}.json"
        if not os.path.exists(os.path.join(self.path, "_manifests", mname)):
            raise ValueError(f"no such version: {v}")
        self._write_ref(name, {"kind": "tag", "manifest": mname})

    def branch_begin(self, name: str, reset: bool = False
                     ) -> "MicroLakeTable":
        """Open a WAP staging branch at this handle's version and
        return a table handle whose commits publish to the branch ref.
        ``reset=True`` re-points an existing branch here and discards
        its unpublished commits — the idempotent-redelivery path (a
        stream that crashed between branch commit and publish re-opens
        the same branch name for the re-delivered epoch; the abandoned
        attempt's manifests/files become vacuum-able orphans)."""
        head = f"manifest-{self.manifest['version']:08d}.json"
        payload = {"kind": "branch", "manifest": head, "base": head}
        existing = None
        try:
            existing = self._read_ref(name)
        except KeyError:
            pass
        if existing is not None and existing.get("kind") == "branch":
            # ADVICE r5 (medium): reconcile a crash between
            # publish_branch's pointer swap and its ref removal — the
            # branch head already IS what _current serves, so the
            # publish completed; the leftover ref must not occupy the
            # name forever (nor pin history as a GC root). Delete it
            # and fall through to a fresh branch.
            try:
                with open(os.path.join(self.path, "_current")) as f:
                    cur = f.read().strip()
            except OSError:
                cur = None
            if existing.get("manifest") == cur:
                try:
                    os.remove(self._ref_file(name))
                except FileNotFoundError:
                    pass
                existing = None
        if existing is not None:
            if existing.get("kind") != "branch" or not reset:
                raise ConcurrentCommitError(f"ref already exists: {name}")
            self._write_ref(name, payload, overwrite=True)
        else:
            self._write_ref(name, payload)
        bt = MicroLakeTable(self.spark, self.path, dict(self.manifest))
        bt._ref = name
        return bt

    def load_ref(self, name: str) -> "MicroLakeTable":
        """Open a table handle at a ref. A tag handle reads that
        version (writes through it would raise on the version CAS); a
        branch handle continues committing to the branch."""
        ref = self._read_ref(name)
        version = int(ref["manifest"][len("manifest-"):-len(".json")])
        t = MicroLakeTable.load(self.spark, self.path, version)
        if ref.get("kind") == "branch":
            t._ref = name
        return t

    def publish_branch(self, name: str,
                       audit: dict[str, str] | None = None,
                       audit_fn=None) -> int:
        """Fast-forward ``_current`` to the branch head — the PUBLISH
        step of write-audit-publish. Refuses (ConcurrentCommitError) if
        main advanced past the branch base: the branch must be rebuilt
        on the new head (with linear CAS'd versions main can only have
        moved if the branch never committed, so no branch work is ever
        silently lost). ``audit``: named SQL predicates every row of
        the BRANCH snapshot must satisfy — checked in ONE aggregate
        pass; any violation raises AuditFailedError with per-rule
        counts and leaves main untouched (row-level ``expectations`` on
        merge quarantine bad rows; this is the table-level gate for
        invariants only visible post-merge). ``audit_fn``: optional
        ``fn(branch_table, main_table)`` for cross-snapshot checks
        (e.g. row-count shrink guards); raise to veto. Returns the
        published version. The branch ref is removed on success."""
        ref = self._read_ref(name)
        if ref.get("kind") != "branch":
            raise ValueError(f"not a branch: {name}")
        if self._ref is not None:
            raise ValueError("publish_branch must run on a main handle")
        with open(os.path.join(self.path, "_current")) as f:
            cur = f.read().strip()
        if ref["manifest"] == cur:
            # ADVICE r5 (medium): a prior publish crashed after the
            # pointer swap, before the ref removal — the branch head is
            # already published (audited then). Finish the cleanup and
            # report the published version.
            head_v = int(ref["manifest"][len("manifest-"):-len(".json")])
            try:
                os.remove(self._ref_file(name))
            except FileNotFoundError:
                pass
            self.manifest = MicroLakeTable.load(
                self.spark, self.path, head_v
            ).manifest
            return head_v
        if ref["base"] != cur:
            raise ConcurrentCommitError(
                f"branch {name} based on {ref['base']} but main is at "
                f"{cur}; rebuild the branch from the current head"
            )
        head_v = int(ref["manifest"][len("manifest-"):-len(".json")])
        bt = MicroLakeTable.load(self.spark, self.path, head_v)
        if audit:
            checks = [
                F.sum(
                    F.when(
                        F.expr(pred).isNull() | ~F.expr(pred), F.lit(1)
                    ).otherwise(F.lit(0))
                ).alias(rule)
                for rule, pred in audit.items()
            ]
            row = bt.snapshot_df().agg(*checks).collect()[0]
            violations = {
                rule: int(row[rule]) for rule in audit
                if row[rule] is not None and int(row[rule]) > 0
            }
            if violations:
                raise AuditFailedError(
                    f"audit rejected branch {name}: {violations}"
                )
        if audit_fn is not None:
            audit_fn(bt, self)
        self._publish_pointer(ref["manifest"])
        os.remove(self._ref_file(name))
        self.manifest = bt.manifest
        return head_v

    def drop_ref(self, name: str) -> None:
        """Delete a tag or abandon a branch (unpublished manifests and
        data files become orphans; ``vacuum`` reclaims them)."""
        try:
            os.remove(self._ref_file(name))
        except FileNotFoundError:
            raise KeyError(f"no such ref: {name}") from None

    def _snapshot_buckets(self, buckets: set[int]) -> DataFrame:
        """This version's user-facing state restricted to a bucket
        subset — reads only those buckets' files. Old-spec files (a
        pending progressive migration) can hold keys of ANY
        current-spec bucket, so they are always included — excluding
        one would silently drop keys from the subset."""
        files = [
            f for f in self.manifest["files"]
            if f["bucket"] in buckets or self._file_spec(f) != self.n_buckets
        ]
        df = self._read_files(files)
        if self.manifest.get("read_dedup"):
            df = self._read_lww(df)
        return (
            df.filter(~F.col("_deleted"))
            .select(*[f.name for f in self.schema.fields])
        )

    def change_feed(self, from_version: int, to_version: int | None = None,
                    full_scan: bool = False) -> DataFrame:
        """CDC *out*: the net row-level changes between two snapshot
        versions (Delta CDF / Iceberg changelog-scan analog). Emits
        `_change_type` ∈ insert | update | delete. Net-effect semantics:
        intermediate rewrites within the interval are collapsed.

        Incremental by default: the manifest lineage records exactly
        which buckets each epoch in the interval touched, and a key's
        bucket never changes, so only those buckets' files (old + new
        side) are read and diffed — cost proportional to data touched in
        the interval, not table size (Iceberg's changelog scan reads
        only the snapshots' added files the same way). ``full_scan=True``
        diffs the two whole snapshots instead — the independent oracle
        the incremental path is tested against."""
        old = MicroLakeTable.load(self.spark, self.path, from_version)
        new = (
            self
            if to_version is None
            else MicroLakeTable.load(self.spark, self.path, to_version)
        )
        payload = [f.name for f in new.schema.fields]
        non_key = [c for c in payload if c not in self.keys]
        keys = list(self.keys)

        # Partition-spec evolution fence: lineage bucket ids are only
        # addressable within ONE bucket spec. If a rebucket() lies inside
        # the interval, ids recorded under the new spec don't select the
        # same key population in the old snapshot (keys relocate), so the
        # incremental path would emit phantom inserts/deletes — fall back
        # to the full-snapshot diff, which is spec-independent.
        if not full_scan:
            rebucket_v = int(new.manifest.get("last_rebucket_version", -1))
            if old.n_buckets != new.n_buckets or rebucket_v > from_version:
                full_scan = True
            elif old.manifest.get("migration_pending"):
                # Progressive-migration fence: migrate_step (and compact
                # while a migration is pending) relocates old-spec rows
                # into current-spec bucket files WITHOUT lineage rows and
                # without bumping last_rebucket_version. If the interval
                # starts while the migration is in flight, keys moved
                # later in the interval sit in old-spec files on the old
                # side (always included by _snapshot_buckets) but in
                # unselected new-spec buckets on the new side — phantom
                # deletes. migration_pending at from_version is implied
                # by ANY cross-spec movement inside the interval
                # (rebucket_start inside it is already fenced above), so
                # forcing the spec-independent full diff here is
                # sufficient as well as necessary-only-when-pending.
                full_scan = True

        # Metadata-expiry fence: lineage rows at or below this epoch
        # were deleted by expire_metadata, so an interval starting
        # there cannot enumerate its touched buckets — the incremental
        # diff would silently MISS changes. Fall back to the
        # full-snapshot diff (correct at any retention state).
        if not full_scan:
            lineage_fence = int(
                new.manifest.get("lineage_complete_after_epoch", -1)
            )
            if old.last_committed_epoch < lineage_fence:
                full_scan = True

        if not full_scan:
            lo = old.last_committed_epoch
            hi = new.last_committed_epoch
            touched = {
                int(ln["partition_id"])
                for ln in new._lineage_entries(after_epoch=lo)
                if ln["commit_epoch"] <= hi
            }
            o = old._snapshot_buckets(touched)
            n_df = new._snapshot_buckets(touched)
        else:
            o = old.snapshot_df()
            n_df = new.snapshot_df()
        for f in new.schema.fields:  # older version may predate columns
            if f.name not in o.columns:
                o = o.withColumn(f.name, F.lit(None).cast(f.dataType))
        o = o.select(
            *keys, *[F.col(c).alias(f"_o_{c}") for c in non_key]
        ).withColumn("_o", F.lit(True))
        n = n_df.select(
            *keys, *[F.col(c).alias(f"_n_{c}") for c in non_key]
        ).withColumn("_n", F.lit(True))

        j = o.join(n, keys, "full_outer")
        any_changed = F.lit(False)
        for c in non_key:
            any_changed = any_changed | ~F.col(f"_o_{c}").eqNullSafe(
                F.col(f"_n_{c}")
            )
        change = (
            F.when(F.col("_o").isNull(), F.lit("insert"))
            .when(F.col("_n").isNull(), F.lit("delete"))
            .when(any_changed, F.lit("update"))
        )
        out_cols = [F.col(k) for k in keys] + [
            F.coalesce(F.col(f"_n_{c}"), F.col(f"_o_{c}")).alias(c)
            for c in non_key
        ]
        return (
            j.withColumn("_change_type", change)
            .filter(F.col("_change_type").isNotNull())
            .select(*out_cols, "_change_type")
        )

    # ---------------- lineage / metrics views ----------------

    def _lineage_entries(self, after_epoch: int | None = None) -> list[dict]:
        """Lineage rows (spilled segments + the manifest's inline
        window), optionally only those with ``commit_epoch >
        after_epoch``. Segment files are skipped whenever the inline
        window already covers the requested range — the common case for
        incremental ``change_feed`` intervals, which keeps the read
        O(recent), not O(history)."""
        inline = self.manifest["lineage"]
        need_segments = bool(self.manifest.get("lineage_segments"))
        if need_segments and after_epoch is not None and inline:
            # spill cuts are epoch-aligned, so if the oldest inline epoch
            # is within the interval start, the inline window is complete
            need_segments = inline[0]["commit_epoch"] > after_epoch + 1
        out: list[dict] = []
        if need_segments:
            for rel in self.manifest.get("lineage_segments", []):
                with open(os.path.join(self.path, rel)) as f:
                    out.extend(json.load(f))
        out.extend(inline)
        if after_epoch is not None:
            out = [ln for ln in out if ln["commit_epoch"] > after_epoch]
        return out

    def lineage_df(self) -> DataFrame:
        from datetime import datetime, timezone

        from ..schema import LINEAGE_SCHEMA

        rows = [
            {
                **r,
                "committed_at": datetime.strptime(
                    r["committed_at"], "%Y-%m-%dT%H:%M:%SZ"
                ).replace(tzinfo=timezone.utc),
            }
            for r in self._lineage_entries()
        ]
        return (
            self.spark.createDataFrame(rows, LINEAGE_SCHEMA)
            if rows
            else self.spark.createDataFrame([], LINEAGE_SCHEMA)
        )

    def metrics_df(self) -> DataFrame:
        from ..schema import METRICS_SCHEMA

        # Backfill fields added to METRICS_SCHEMA after a manifest was
        # committed (e.g. events_rejected) so pre-existing tables stay
        # readable — the manifest, like an Iceberg snapshot, is immutable.
        defaults = {"events_rejected": 0}
        raw: list[dict] = []
        for rel in self.manifest.get("metrics_segments", []):
            with open(os.path.join(self.path, rel)) as f:
                raw.extend(json.load(f))
        raw.extend(self.manifest["metrics"])
        rows = [{**defaults, **r} for r in raw]
        return self.spark.createDataFrame(rows, METRICS_SCHEMA) if rows else \
            self.spark.createDataFrame([], METRICS_SCHEMA)


def shrink_guard(min_ratio: float = 0.9):
    """``audit_fn`` factory for ``publish_branch``: veto a publish whose
    live row count fell below ``min_ratio`` × main's current count — the
    classic WAP regression gate against a broken upstream mass-deleting
    (or an empty reload overwriting) a corpus. Cross-snapshot by nature,
    so it cannot be a row predicate; cost is one ``count()`` per side
    (footer-metadata-only on compacted CoW state; one dedup pass over
    only the MOR generations otherwise). Compose freely::

        table.publish_branch("wap", audit={...},
                             audit_fn=shrink_guard(0.99))
    """
    if not 0.0 <= min_ratio:
        raise ValueError(f"min_ratio must be >= 0: {min_ratio}")

    def _audit(branch_t: MicroLakeTable, main_t: MicroLakeTable) -> None:
        b = branch_t.snapshot_df().count()
        m = main_t.snapshot_df().count()
        if b < min_ratio * m:
            raise AuditFailedError(
                f"shrink guard: branch has {b} live rows vs main's {m} "
                f"(< {min_ratio:g}× — a publish may not shrink the "
                f"table below the guard ratio)"
            )

    return _audit


def _utcnow_iso() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def murmur3_x86_32(data: bytes, seed: int = 42) -> int:
    """Pure-Python twin of Spark's ``F.hash`` for one string/binary column
    (Catalyst ``Murmur3Hash``, seed 42) — returns the signed int32 Spark
    produces, so ``murmur3_x86_32(k) % n == pmod(hash(col), n)``.

    Deliberately matches Spark's ``hashUnsafeBytes``, which deviates from
    canonical MurmurHash3: each tail byte (len % 4) is sign-extended and
    mixed as a FULL block (mixK1 + mixH1), not accumulated into one final
    k1. Cross-checked against ``F.hash`` on random keys in
    tests/test_change_feed.py."""
    h1 = seed & 0xFFFFFFFF
    n_aligned = len(data) - len(data) % 4

    def _mix(h1: int, k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
        k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
        k1 = (k1 * 0x1B873593) & 0xFFFFFFFF
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
        return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF

    for i in range(0, n_aligned, 4):
        h1 = _mix(h1, int.from_bytes(data[i:i + 4], "little"))
    for i in range(n_aligned, len(data)):
        b = data[i] - 256 if data[i] >= 128 else data[i]  # signed byte
        h1 = _mix(h1, b & 0xFFFFFFFF)  # sign-extend to uint32 bit pattern
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - 2**32 if h1 >= 2**31 else h1
