"""Iceberg adapter: the cluster-path twin of MicroLakeTable.

The sandbox has no network, so ``iceberg-spark-runtime`` cannot be
fetched here (SURVEY.md §7.0) — this module is therefore exercised by
SQL-text unit tests only; on a real cluster it is activated with::

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=s3://bucket/warehouse \
      ...

It implements the same contract as MicroLakeTable (create/merge/
snapshot/evolve/epoch-fence) on real Iceberg:

 - bucketed layout   → ``PARTITIONED BY (bucket(N, conv_id))``
 - LWW MERGE         → windowed dedup subquery + ``MERGE INTO`` with
                       ts/seq guards (SURVEY.md §2.7 J5)
 - tombstones        → ``WHEN MATCHED AND s.op='D' THEN DELETE`` —
                       Iceberg v2 positional/equality deletes replace
                       MicroLake's explicit ``_deleted`` rows
 - epoch fence       → table property ``engine.last_committed_epoch``
                       checked before, set inside, the same transaction
 - schema evolution  → ``ALTER TABLE ... ADD COLUMN`` per batch diff

Known semantic difference vs MicroLake: Iceberg DELETE removes the row
outright, so an *older-ts* update arriving in a *later* epoch would
re-insert a deleted key (MicroLake's tombstones block this). Under the
WAL contract (seq-ordered segments, epoch fence) that event ordering
cannot occur; deployments that relax the contract should add a
deleted-keys side table, which is exactly what MicroLake models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schema import LWW_ORDER, MERGE_KEYS

EPOCH_PROP = "engine.last_committed_epoch"


def _sql_type(dt: T.DataType) -> str:
    return dt.simpleString()


def create_table_sql(
    table: str,
    schema: T.StructType,
    n_buckets: int = 512,
    keys: tuple[str, ...] = MERGE_KEYS,
) -> str:
    cols = ",\n  ".join(f"{f.name} {_sql_type(f.dataType)}" for f in schema.fields)
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols},\n"
        f"  _seq bigint\n)\n"
        f"USING iceberg\n"
        f"PARTITIONED BY (bucket({n_buckets}, {keys[0]}))\n"
        f"TBLPROPERTIES ('format-version'='2', "
        f"'write.merge.mode'='merge-on-read', '{EPOCH_PROP}'='-1')"
    )


def add_columns_sql(table: str, added: list[T.StructField]) -> list[str]:
    return [
        f"ALTER TABLE {table} ADD COLUMN {f.name} {_sql_type(f.dataType)}"
        for f in added
    ]


def merge_sql(
    table: str,
    source_view: str,
    payload_cols: list[str],
    keys: tuple[str, ...] = MERGE_KEYS,
    order: tuple[str, ...] = LWW_ORDER,
) -> str:
    """MERGE INTO with within-batch LWW dedup and (ts, seq) guards.

    The guard on WHEN MATCHED UPDATE makes replays and out-of-order
    batches idempotent at row level (a stale row never overwrites a
    newer one), complementing the epoch fence.
    """
    ts, seq = order
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(
        f"t.{c} = s.{c}" for c in payload_cols if c not in keys
    )
    ins_cols = ", ".join([*payload_cols, "_seq"])
    ins_vals = ", ".join([f"s.{c}" for c in payload_cols] + [f"s.{seq}"])
    keys_csv = ", ".join(keys)
    order_desc = ", ".join(f"{c} DESC" for c in order)
    return f"""
MERGE INTO {table} t
USING (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY {keys_csv} ORDER BY {order_desc}) AS _rn
    FROM {source_view}
  ) WHERE _rn = 1
) s
ON {on}
WHEN MATCHED AND s.op = 'D'
     AND (s.{ts} > t.{ts} OR (s.{ts} = t.{ts} AND s.{seq} > t._seq))
  THEN DELETE
WHEN MATCHED AND s.op <> 'D'
     AND (s.{ts} > t.{ts} OR (s.{ts} = t.{ts} AND s.{seq} > t._seq))
  THEN UPDATE SET {sets}, t._seq = s.{seq}
WHEN NOT MATCHED AND s.op <> 'D'
  THEN INSERT ({ins_cols}) VALUES ({ins_vals})
""".strip()


def rebucket_sql(table: str, old_n: int, new_n: int,
                 keys: tuple[str, ...] = MERGE_KEYS,
                 catalog: str = "lake") -> list[str]:
    """Partition-spec evolution + full rewrite — the Iceberg twin of
    ``MicroLakeTable.rebucket`` (bucket count grows with table size so
    per-bucket rewrite cost stays bounded at 10^10 rows). Iceberg's
    spec evolution only applies to NEW data, so the rewrite_data_files
    call migrates existing files onto the new spec."""
    return [
        f"ALTER TABLE {table} REPLACE PARTITION FIELD "
        f"bucket({old_n}, {keys[0]}) WITH bucket({new_n}, {keys[0]})",
        f"CALL {catalog}.system.rewrite_data_files(table => '{table}', "
        f"options => map('rewrite-all', 'true'))",
    ]


def compact_sql(table: str, catalog: str = "lake") -> str:
    """Fold MOR delete files / small files — MicroLake ``compact()``."""
    return f"CALL {catalog}.system.rewrite_data_files(table => '{table}')"


def vacuum_sql(table: str, keep_versions: int = 1,
               grace_hours: int = 1, catalog: str = "lake") -> list[str]:
    """Snapshot expiry + orphan removal — MicroLake ``vacuum``. The
    ``older_than`` cutoff is the same in-flight-writer grace window as
    MicroLake's ``grace_seconds``: files staged by a concurrent commit
    that has not yet published its snapshot must survive."""
    return [
        f"CALL {catalog}.system.expire_snapshots(table => '{table}', "
        f"retain_last => {keep_versions})",
        f"CALL {catalog}.system.remove_orphan_files(table => '{table}', "
        f"older_than => current_timestamp() - INTERVAL {grace_hours} HOURS)",
    ]


def changelog_sql(table: str, start_snapshot: int, end_snapshot: int,
                  view: str = "tbl_changes", catalog: str = "lake") -> str:
    """Interval CDC-out — the Iceberg changelog scan MicroLake's
    incremental ``change_feed`` mirrors (reads only the interval's
    added files, emits _change_type rows)."""
    return (
        f"CALL {catalog}.system.create_changelog_view("
        f"table => '{table}', changelog_view => '{view}', "
        f"options => map('start-snapshot-id', '{start_snapshot}', "
        f"'end-snapshot-id', '{end_snapshot}'))"
    )


def rename_column_sql(table: str, old: str, new: str) -> str:
    """Metadata-only rename — the Iceberg twin of
    ``MicroLakeTable.rename_column``. Iceberg resolves it via field
    ids, so no resurrection guard is needed on the cluster path; the
    name-mapped MicroLake enforces one instead (`_evolve_schema`)."""
    return f"ALTER TABLE {table} RENAME COLUMN {old} TO {new}"


def drop_column_sql(table: str, name: str) -> str:
    """Metadata-only drop — ``MicroLakeTable.drop_column`` twin."""
    return f"ALTER TABLE {table} DROP COLUMN {name}"


def maintain_sql(table: str, keep_versions: int = 8,
                 grace_hours: int = 1, catalog: str = "lake") -> list[str]:
    """The scheduled maintenance batch ``optimize()`` models: rewrite
    small/multi-generation files, then expire + deorphan."""
    return [compact_sql(table, catalog)] + vacuum_sql(
        table, keep_versions, grace_hours, catalog
    )


def set_epoch_sql(table: str, epoch: int) -> str:
    return (
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        f"('{EPOCH_PROP}'='{epoch}')"
    )


class IcebergTable:
    """Same surface as MicroLakeTable, over a real Iceberg catalog.

    Untestable in this sandbox (no Iceberg jar); every statement it
    issues is generated by the pure functions above, which ARE tested.
    """

    def __init__(self, spark: SparkSession, table: str,
                 keys: tuple[str, ...] = MERGE_KEYS):
        self.spark = spark
        self.table = table
        self.keys = keys

    @classmethod
    def create_or_load(cls, spark, table, schema, n_buckets=512,
                       keys=MERGE_KEYS):
        spark.sql(create_table_sql(table, schema, n_buckets, keys))
        return cls(spark, table, keys)

    @property
    def last_committed_epoch(self) -> int:
        row = self.spark.sql(
            f"SELECT value FROM {self.table}.properties "
            f"WHERE key = '{EPOCH_PROP}'"
        ).first()
        return int(row["value"]) if row else -1

    def merge(self, batch_df: DataFrame, epoch: int,
              winner_transform=None) -> bool:
        if epoch <= self.last_committed_epoch:
            return False  # fenced replay → no-op
        schema = self.spark.table(self.table).schema
        existing = {f.name for f in schema.fields}
        added = [
            T.StructField(f.name, f.dataType, True)
            for f in batch_df.schema.fields
            if f.name not in existing and f.name not in ("op", *LWW_ORDER)
        ]
        for stmt in add_columns_sql(self.table, added):
            self.spark.sql(stmt)
        if winner_transform is not None:
            batch_df = winner_transform(batch_df)
        view = f"_batch_epoch_{epoch}"
        batch_df.createOrReplaceTempView(view)
        payload = [
            f.name for f in self.spark.table(self.table).schema.fields
            if f.name != "_seq"
        ]
        self.spark.sql(merge_sql(self.table, view, payload, self.keys))
        self.spark.sql(set_epoch_sql(self.table, epoch))
        return True

    def snapshot_df(self) -> DataFrame:
        return self.spark.table(self.table).drop("_seq")
