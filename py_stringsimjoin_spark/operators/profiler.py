"""profile_table_for_join — per-attribute join-readiness profile.

Parity: /root/reference/py_stringsimjoin/profiler/profiler.py:9-82 (unique
count, missing count, and the same advisory comments). One distributed agg
job computes all attributes at once (single pass over the table) rather than
a per-column loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table_for_join(table: DataFrame, profile_attrs: list[str] | None = None) -> DataFrame:
    attrs = profile_attrs or table.columns
    for a in attrs:
        if a not in table.columns:
            raise AssertionError(f"{a!r} is not an attribute of the table")
    aggs = [F.count("*").alias("__n")]
    for i, a in enumerate(attrs):
        aggs.append(F.countDistinct(F.col(a)).alias(f"__u{i}"))
        aggs.append(F.sum(F.col(a).isNull().cast("long")).alias(f"__m{i}"))
    row = table.agg(*aggs).first()
    n = row["__n"]
    recs = []
    for i, a in enumerate(attrs):
        uniq, miss = row[f"__u{i}"], row[f"__m{i}"]
        if uniq == n and miss == 0:
            comment = "This attribute can be used as a key attribute."
        elif miss > 0:
            comment = (
                f"Joining on this attribute will ignore {miss} rows "
                f"({round(miss * 100.0 / n, 2)}%) that have missing value in it."
            )
        else:
            comment = ""
        recs.append((a, int(uniq), int(miss), int(n), comment))
    # pandas → Arrow → JVM LocalTableScan: a plain list createDataFrame
    # becomes a pickled Python RDD in spark.default.parallelism slices and
    # every scan of the profile pays a Python-worker wave (same fix as
    # operators/token_ordering.py)
    import pandas as pd

    spark = table.sparkSession
    pdf = pd.DataFrame(
        recs,
        columns=[
            "attribute", "unique_values", "missing_values", "total_rows", "comments"
        ],
    )
    return spark.createDataFrame(
        pdf,
        schema="attribute string, unique_values long, missing_values long, "
        "total_rows long, comments string",
    )
