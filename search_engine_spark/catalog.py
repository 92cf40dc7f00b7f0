"""Storage catalog seam (SURVEY.md §7): every index table read/write
goes through a TableStore, so swapping the Parquet-path backend for an
Iceberg catalog is a config change, not a code change.

- ``ParquetStore`` (default): plain path-based parquet under a root
  directory — what the sandbox runs (no Iceberg runtime jar baked in).
- ``IcebergStore``: the same operations expressed against the public
  DataFrameWriterV2 / catalog-table API (``df.writeTo(ident)`` with
  ``createOrReplace`` / ``append`` / ``overwritePartitions``,
  ``spark.table(ident)`` reads).  With
  ``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``
  configured and the runtime jar on the classpath, an index_dir of
  ``iceberg://<catalog>.<namespace>.<prefix>`` routes everything
  through Iceberg — snapshot isolation then supersedes the _SUCCESS
  marker convention, and the dynamic-overwrite segment writes map to
  ``overwritePartitions()``.

``store_for(index_dir)`` picks the backend from the index_dir string.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

# Modes shared by both stores:
#   overwrite          - replace the whole table
#   append             - add rows
#   dynamic_overwrite  - replace only the partitions present in df
_MODES = ("overwrite", "append", "dynamic_overwrite")


class ParquetStore:
    """Path-based parquet backend (default)."""

    kind = "parquet"

    def __init__(self, root: str):
        self.root = root

    def path(self, table: str) -> str:
        return f"{self.root}/{table}"

    def exists(self, table: str, spark: SparkSession | None = None) -> bool:
        return os.path.exists(os.path.join(self.path(table), "_SUCCESS"))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: str | None = None,
        coalesce: int | None = None,
    ) -> None:
        assert mode in _MODES, mode
        if coalesce:
            df = df.coalesce(coalesce)
        # dynamic_overwrite relies on
        # spark.sql.sources.partitionOverwriteMode=dynamic (set by the
        # builder) + mode("overwrite")
        w = df.write.mode("overwrite" if mode == "dynamic_overwrite" else mode)
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(self.path(table))

    def refresh(self, spark: SparkSession, table: str) -> None:
        spark.catalog.refreshByPath(self.path(table))

    def drop(self, table: str, spark: SparkSession | None = None) -> None:
        import shutil

        p = self.path(table)
        if os.path.exists(p):
            shutil.rmtree(p)

    def get_meta(self, spark: SparkSession) -> dict | None:
        p = os.path.join(self.root, "meta.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def put_meta(self, spark: SparkSession, meta: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        with open(os.path.join(self.root, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)


class IcebergStore:
    """Catalog-table backend over the public DataFrameWriterV2 API.

    ``prefix`` is a fully-qualified table-name prefix, e.g.
    ``local.search.idx1`` -> tables ``local.search.idx1_segments``...
    Requires an Iceberg (or other V2) catalog configured on the
    session; exercised in tests only up to plan construction because
    the sandbox image carries no Iceberg runtime jar.
    """

    kind = "iceberg"

    def __init__(self, prefix: str):
        self.prefix = prefix

    def ident(self, table: str) -> str:
        return f"{self.prefix}_{table}"

    def exists(self, table: str, spark: SparkSession | None = None) -> bool:
        """Real catalog lookup (spark.catalog.tableExists) — so
        ``build_index(resume=True)`` on a catalog index whose tables
        are absent falls back to a fresh build, same as the parquet
        backend's _SUCCESS probe."""
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "IcebergStore.exists() needs a SparkSession (pass one "
                "or call with an active session)"
            )
        try:
            return spark.catalog.tableExists(self.ident(table))
        except Exception:
            return False

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.table(self.ident(table))

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: str | None = None,
        coalesce: int | None = None,
    ) -> None:
        assert mode in _MODES, mode
        from pyspark.sql import functions as F

        if coalesce:
            df = df.coalesce(coalesce)
        w = df.writeTo(self.ident(table))
        if partition_by:
            w = w.partitionedBy(F.col(partition_by))
        if mode == "overwrite":
            w.createOrReplace()
        elif mode == "append":
            w.append()
        else:  # dynamic_overwrite: replace only touched partitions
            w.overwritePartitions()

    def refresh(self, spark: SparkSession, table: str) -> None:
        spark.catalog.refreshTable(self.ident(table))

    def drop(self, table: str, spark: SparkSession | None = None) -> None:
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "IcebergStore.drop() needs a SparkSession (pass one "
                "or call with an active session)"
            )
        spark.sql(f"DROP TABLE IF EXISTS {self.ident(table)}")

    def get_meta(self, spark: SparkSession) -> dict | None:
        try:
            rows = spark.table(self.ident("meta")).collect()
        except Exception:
            return None
        return json.loads(rows[0]["meta_json"]) if rows else None

    def put_meta(self, spark: SparkSession, meta: dict) -> None:
        df = spark.createDataFrame(
            [(json.dumps(meta),)], "meta_json string"
        )
        df.writeTo(self.ident("meta")).createOrReplace()


ICEBERG_SCHEME = "iceberg://"


def store_for(index_dir: str):
    """Backend selection by index_dir: ``iceberg://cat.ns.prefix``
    routes through the catalog API; anything else is a parquet root
    path."""
    if index_dir.startswith(ICEBERG_SCHEME):
        return IcebergStore(index_dir[len(ICEBERG_SCHEME):])
    return ParquetStore(index_dir)
