"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the same sf dir; compare row
counts, schemas (loosely), and values (sorted columns+rows, exact)."""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from py_stringsimjoin_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if len(sdf) != len(odf):
        errs.append(f"row count {len(sdf)} vs {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        return errs
    if errs:
        return errs
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            exact = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not exact.all():
                i = int(np.flatnonzero(~exact)[0])
                errs.append(f"col {c}: first diff at row {i}: {av[i]!r} vs {bv[i]!r}")
        else:
            if not (av == bv).all():
                i = int(np.flatnonzero(av != bv)[0])
                errs.append(f"col {c}: first diff at row {i}: {av[i]!r} vs {bv[i]!r}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = {}
    for name, q in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q(spark, sf_dir).toPandas()
        except Exception as ex:
            failures[name] = [f"SPARK ERROR {ex}"]
            print(f"FAIL {name}: spark error {str(ex)[:200]}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows  spark={t1 - t0:.1f}s")
            continue
        odf = con.execute(oracles[name]).df()
        errs = compare(name, sdf, odf)
        status = "OK  " if not errs else "FAIL"
        print(f"{status} {name}: spark {len(sdf)} oracle {len(odf)} rows  spark={t1 - t0:.1f}s")
        if errs:
            failures[name] = errs
            for e in errs[:3]:
                print(f"      {e}")
    print(f"\n{len(failures)} failing queries" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
