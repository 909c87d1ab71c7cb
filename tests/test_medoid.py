"""cluster_medoid vs a direct python mirror."""

import pytest

from py_stringsimjoin_spark.operators.medoid import cluster_medoid

RECORDS = [
    (1, "red widget deluxe"),
    (2, "red widget"),
    (3, "widget red deluxe extra"),
    (4, "blue gadget"),
    (5, "blue gadget mini"),
    (6, "lonely item"),
    (7, None),
    (8, ""),
]
CLUSTERS = [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200), (7, 300), (8, 300)]
# 6 has no cluster row -> singleton cluster 6


def _jac(a, b):
    sa, sb = set(a.split()) if a else set(), set(b.split()) if b else set()
    d = len(sa | sb)
    return len(sa & sb) / float(d) if d else 0.0


def _mirror():
    recs = dict(RECORDS)
    cl = dict(CLUSTERS)
    groups = {}
    for i in recs:
        groups.setdefault(cl.get(i, i), []).append(i)
    out = {}
    for c, ids in groups.items():
        best = None
        for i in sorted(ids):
            if len(ids) == 1:
                score = None
            else:
                vals = sorted(_jac(recs[i], recs[j]) for j in ids if j != i)
                score = 0.0
                for v in vals:
                    score += v
            key = (-(score if score is not None else float("-inf")), i)
            if best is None or key < best[0]:
                best = (key, i, score)
        _, mid, score = best
        n = len(ids) - 1
        out[c] = (
            mid,
            len(ids),
            score,
            (score / n if score is not None and n else None),
        )
    return out


def test_matches_mirror(spark):
    recs = spark.createDataFrame(RECORDS, ["rid", "name"])
    cls = spark.createDataFrame(CLUSTERS, ["rid", "component"])
    got = {
        r["component"]: (
            r["medoid_id"],
            r["cluster_size"],
            r["total_sim"],
            r["mean_sim"],
        )
        for r in cluster_medoid(recs, cls, "rid", "name").collect()
    }
    assert got == _mirror()


def test_medoid_beats_outlier(spark):
    """The central member wins over a verbose outlier (vs 'longest')."""
    recs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha beta gamma"),
            (3, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        ["rid", "name"],
    )
    cls = spark.createDataFrame([(1, 9), (2, 9), (3, 9)], ["rid", "component"])
    got = cluster_medoid(recs, cls, "rid", "name").first()
    assert got["medoid_id"] == 2  # central, not the longest (3)


def test_max_cluster_size_skips_and_flags(spark):
    """Over-cap clusters are flagged with NULL medoid, not computed;
    under-cap clusters match the uncapped output exactly."""
    recs = spark.createDataFrame(RECORDS, ["rid", "name"])
    cls = spark.createDataFrame(CLUSTERS, ["rid", "component"])
    capped = {
        r["component"]: r
        for r in cluster_medoid(
            recs, cls, "rid", "name", max_cluster_size=2
        ).collect()
    }
    # cluster 100 has 3 members -> skipped
    big = capped[100]
    assert big["skipped"] is True
    assert big["medoid_id"] is None
    assert big["total_sim"] is None and big["mean_sim"] is None
    assert big["cluster_size"] == 3
    # every under-cap cluster identical to the uncapped run
    base = {
        r["component"]: r
        for r in cluster_medoid(recs, cls, "rid", "name").collect()
    }
    assert set(capped) == set(base)
    for c, r in capped.items():
        if c == 100:
            continue
        assert r["skipped"] is False
        for f in ("medoid_id", "cluster_size", "total_sim", "mean_sim"):
            assert r[f] == base[c][f], (c, f)


def test_no_cap_keeps_schema(spark):
    recs = spark.createDataFrame(RECORDS, ["rid", "name"])
    cls = spark.createDataFrame(CLUSTERS, ["rid", "component"])
    cols = cluster_medoid(recs, cls, "rid", "name").columns
    assert "skipped" not in cols
