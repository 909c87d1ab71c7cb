"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() are
consistent, and a fast subset matches its DuckDB oracle at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

FAST_ORACLE_QUERIES = [
    "fingerprint_docs",
    "langid_docs",
    "tokenstats_docs",
    "quality_docs",
    "profile_part",
    "ann_topk_embeddings",
    "exact_dups_docs",
    "pii_docs",
    "split_docs",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def test_entry_runs(spark):
    df = entry.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"l_p_partkey", "r_p_partkey", "sim"}


def test_registry_consistency():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20


@pytest.mark.parametrize("name", FAST_ORACLE_QUERIES)
def test_fast_queries_match_oracle(spark, duck, name):
    sdf = entry.queries()[name](spark, SF).toPandas()
    odf = duck.execute(entry.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    a, b = _canon(sdf), _canon(odf)
    assert sorted(a.columns) == sorted(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating):
            assert np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True), c
        else:
            assert (av == bv).all(), c
