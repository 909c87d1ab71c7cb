"""Medium-size end-to-end: books dataset fuzzy join + cluster + dedup —
the reference's demo workload shape (datasets/base.py) at 1k×1k."""

from pyspark.sql import functions as F

from py_stringsimjoin_spark import (
    WhitespaceTokenizer,
    connected_components,
    jaccard_join,
    load_books_dataset,
)


def test_books_fuzzy_join_and_cluster(spark):
    A, B = load_books_dataset(spark, n_a=1000, n_b=1000)
    out = jaccard_join(
        A, B, "ID", "ID", "Title", "Title", WhitespaceTokenizer(), 0.99,
        l_out_attrs=["Title"], r_out_attrs=["Title"],
    )
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        lt = set(r["l_Title"].split())
        rt = set(r["r_Title"].split())
        assert lt == rt  # jaccard >= 0.99 on sets means equality here
    edges = out.select(
        F.col("l_ID").alias("src"), F.col("r_ID").alias("dst")
    )
    comp = connected_components(edges)
    n_nodes = comp.count()
    n_comps = comp.select("component").distinct().count()
    assert 0 < n_comps <= n_nodes
