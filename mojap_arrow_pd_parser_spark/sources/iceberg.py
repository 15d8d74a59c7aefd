"""Iceberg catalog integration (gated: jars not present in this image).

The engine's chunk layout (atomic data files + manifest sidecars +
consolidated manifest, file-then-metadata commit ordering) is already
Iceberg-shaped; when the runtime has `iceberg-spark-runtime` on the
classpath these helpers read/write true Iceberg tables instead of the
parquet-dir layout. Public API only (`spark.table`, `DataFrame.writeTo`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True if an Iceberg SQL extension/catalog is on the classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """Read an Iceberg table (``catalog.db.table``) or raise with guidance."""
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime jars are not on the classpath in this "
            "environment; pass a parquet path instead, or launch with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12"
        )
    return spark.table(identifier)


def write_table(df: DataFrame, identifier: str, mode: str = "append") -> None:
    if not iceberg_available(df.sparkSession):
        raise NotImplementedError(
            "Iceberg runtime jars are not on the classpath; the engine's "
            "parquet chunk+manifest layout (operators/encode.py) preserves "
            "the same commit semantics without the catalog"
        )
    writer = df.writeTo(identifier)
    if mode == "overwrite":
        writer.createOrReplace()
    else:
        writer.append()
