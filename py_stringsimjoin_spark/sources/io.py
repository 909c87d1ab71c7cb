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


def _is_catalog_name(source: str) -> bool:
    """Catalog table (`catalog.db.pages`) vs filesystem path.

    A slash always means a path. A dotted slash-less name is a catalog table
    UNLESS it exists on the local filesystem (e.g. a relative
    ``pages.parquet``) — the existence probe disambiguates the ambiguous
    case instead of routing a relative parquet path into ``spark.table``."""
    import os

    if "/" in source or "." not in source:
        return False
    return not os.path.exists(source)


def read_pages_table(spark: SparkSession, source: str) -> DataFrame:
    """Read the Common-Crawl-style pages table (url, warc_ts, html, text,
    lang) from an Iceberg catalog table or a parquet path.

    Production shape is an Iceberg table (`catalog.db.pages`) — time travel,
    hidden partitioning on bucket(url, N) + days(warc_ts), and snapshot
    isolation for the resumable pipeline stages. The Iceberg runtime jar is
    not bundled in this sandbox, so a dotted name is resolved via
    ``spark.table`` (works against any configured catalog: Iceberg, Delta,
    Hive) and a path falls back to parquet — plans downstream are identical
    either way (both are V2 scans with pushdown + pruning).
    """
    if _is_catalog_name(source):
        return spark.table(source)
    return spark.read.parquet(source)


def write_pages_table(df: DataFrame, target: str, mode: str = "overwrite",
                      bucket_cols: list[str] | None = None,
                      n_buckets: int = 0) -> None:
    """Write a pages-shaped table to an Iceberg/catalog table (dotted name)
    or a parquet path. ``bucket_cols``/``n_buckets`` request bucketed layout
    so downstream url-keyed joins reuse the partitioning without a shuffle
    (Iceberg: `bucket(n, col)` hidden partition; parquet path: an explicit
    ``_bucket = pmod(xxhash64(col), n)`` directory partition — the closest
    filesystem equivalent, written when asked so bucket-pruned reads work)."""
    if _is_catalog_name(target):
        w = df.writeTo(target)
        if bucket_cols and n_buckets:
            from pyspark.sql import functions as F

            w = w.partitionedBy(F.bucket(n_buckets, bucket_cols[0]))
        (w.createOrReplace() if mode == "overwrite" else w.append())
        return
    if bucket_cols and n_buckets:
        from pyspark.sql import functions as F

        (
            df.withColumn(
                "_bucket", F.pmod(F.xxhash64(*bucket_cols), F.lit(n_buckets))
            )
            .write.mode(mode)
            .option("maxRecordsPerFile", 5_000_000)
            .partitionBy("_bucket")
            .parquet(target)
        )
        return
    df.write.mode(mode).parquet(target)
