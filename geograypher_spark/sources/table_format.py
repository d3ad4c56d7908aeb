"""Table-format abstraction: Parquet directories vs Iceberg catalog tables.

BASELINE.json mandates Iceberg tables as the canonical storage for the
interleaved-document corpus and the checkpoint stages. This container has
NO Iceberg runtime (no ``iceberg-spark-runtime`` jar under pyspark/jars,
no ivy cache, no network to fetch one), so the engine ships the swap as an
actual seam instead of a comment:

- ``ParquetFormat`` — path-addressed Parquet directories (what every test
  and bench run uses here).
- ``IcebergFormat`` — catalog-addressed ``cat.db.table`` reads/writes via
  the Iceberg DataSourceV2 (``df.writeTo(...).createOrReplace()``), plus
  snapshot time-travel. Activating it requires launching Spark with the
  standard Iceberg conf, e.g.::

      spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \\
        --conf spark.sql.catalog.cat=org.apache.iceberg.spark.SparkCatalog \\
        --conf spark.sql.catalog.cat.type=hadoop \\
        --conf spark.sql.catalog.cat.warehouse=s3://bucket/warehouse

  ``IcebergFormat.available(spark)`` probes for the catalog plugin and the
  runtime class; constructing readers against a session without them
  raises immediately with that explanation rather than failing mid-plan.

Everything downstream (checkpoint stages, the docs source, sinks) takes a
``TableFormat`` and never spells out ``.parquet`` itself, so a cluster
with the jar flips one constructor argument.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class TableFormat:
    """Read/write named tables. Names are format-addressed: a directory
    path for Parquet, a ``catalog.db.table`` identifier for Iceberg."""

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        raise NotImplementedError

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        raise NotImplementedError

    def exists(self, spark: SparkSession, name: str) -> bool:
        raise NotImplementedError


@dataclass(frozen=True)
class ParquetFormat(TableFormat):
    """Directory-of-parquet-files tables (the sandbox default)."""

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(name)

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(name)

    def exists(self, spark: SparkSession, name: str) -> bool:
        import os

        return os.path.exists(os.path.join(name, "_SUCCESS"))


@dataclass(frozen=True)
class IcebergFormat(TableFormat):
    """Iceberg catalog tables (``catalog.db.table``). Requires the
    iceberg-spark-runtime jar + catalog conf on the session (see module
    docstring); raises a clear error when absent."""

    catalog: str = "cat"

    @staticmethod
    def available(spark: SparkSession, catalog: str = "cat") -> bool:
        if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
            return False
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog")
            return True
        except Exception:
            return False

    def _check(self, spark: SparkSession) -> None:
        if not self.available(spark, self.catalog):
            raise RuntimeError(
                f"Iceberg catalog '{self.catalog}' is not configured on this "
                "session (iceberg-spark-runtime jar missing or "
                f"spark.sql.catalog.{self.catalog} unset). This sandbox has "
                "no Iceberg runtime and no network to fetch one; run with "
                "--packages org.apache.iceberg:iceberg-spark-runtime... and "
                "the catalog conf, or use ParquetFormat.")

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        self._check(spark)
        return spark.read.table(f"{self.catalog}.{name}")

    def read_snapshot(self, spark: SparkSession, name: str,
                      snapshot_id: int) -> DataFrame:
        """Time-travel read — Iceberg's snapshot isolation is what makes
        checkpoint resume exactly-once on a real cluster."""
        self._check(spark)
        return (spark.read.option("snapshot-id", snapshot_id)
                .table(f"{self.catalog}.{name}"))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        self._check(df.sparkSession)
        writer = df.writeTo(f"{self.catalog}.{name}")
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "append":
            writer.append()
        else:
            raise ValueError(f"unsupported mode {mode!r}")

    def exists(self, spark: SparkSession, name: str) -> bool:
        self._check(spark)
        return spark.catalog.tableExists(f"{self.catalog}.{name}")
