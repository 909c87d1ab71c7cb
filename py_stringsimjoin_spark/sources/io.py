"""Sources & sinks.

Reference surface: CSV (plain + gzip) in, CSV out for the disk join
(SURVEY.md §2.5). Spark surface adds parquet (the driver contract's table
format) and partitioned writes. Everything is the built-in DataFrameReader/
Writer so predicate pushdown / column pruning / partition pruning stay free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(spark: SparkSession, path: str, header: bool = True, schema=None) -> DataFrame:
    """CSV/gzip-CSV reader (reference: pd.read_csv at datasets/base.py:13-17).
    Spark decompresses .gz transparently."""
    reader = spark.read.option("header", str(header).lower()).option("multiLine", "true").option("escape", '"')
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver-generated testdata tables."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
