"""Meta-blocking: brute-force mirror, purging/pruning semantics, plan shape."""

import itertools

import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer
from py_stringsimjoin_spark.operators.metablocking import (
    metablock_pairs,
    token_blocks,
)

ROWS = [
    (1, "alpha beta gamma"),
    (2, "alpha beta delta"),
    (3, "alpha epsilon"),
    (4, "beta gamma"),
    (5, "zeta"),          # singleton-block only -> never pairs
    (6, "zeta"),          # ... with 6 it's a 2-block
    (7, None),            # NULL never blocks
    (8, "theta theta"),   # duplicate token counts once (array_distinct)
]
TOK = WhitespaceTokenizer(return_set=True)


def _brute(max_block_size=None):
    """Python mirror: block map -> purge -> cbs/js edges."""
    blocks = {}
    for rid, text in ROWS:
        if text is None:
            continue
        for t in set(text.split()):
            blocks.setdefault(t, set()).add(rid)
    purged = {
        b: m
        for b, m in blocks.items()
        if len(m) >= 2 and (max_block_size is None or len(m) <= max_block_size)
    }
    deg = {}
    for m in purged.values():
        for rid in m:
            deg[rid] = deg.get(rid, 0) + 1
    cbs = {}
    for m in purged.values():
        for a, b in itertools.combinations(sorted(m), 2):
            cbs[(a, b)] = cbs.get((a, b), 0) + 1
    js = {p: c / (deg[p[0]] + deg[p[1]] - c) for p, c in cbs.items()}
    return purged, deg, cbs, js


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "id int, name string")


def test_token_blocks_purging(df):
    purged, _, _, _ = _brute(max_block_size=3)
    got = {
        (r._block, r.id)
        for r in token_blocks(df, "id", "name", TOK, max_block_size=3).collect()
    }
    want = {(b, rid) for b, m in purged.items() for rid in m}
    assert got == want
    # 'alpha' has 3 members; cap at 2 purges it
    got2 = {r._block for r in token_blocks(df, "id", "name", TOK, max_block_size=2).collect()}
    assert "alpha" not in got2 and "zeta" in got2


@pytest.mark.parametrize("weight", ["cbs", "js"])
def test_edges_match_brute_force(df, weight):
    _, _, cbs, js = _brute()
    out = metablock_pairs(df, "id", "name", TOK, weight=weight, prune="none")
    got = {(r.l_id, r.r_id): (r.common_blocks, r.weight) for r in out.collect()}
    want = {p: (c, float(c) if weight == "cbs" else js[p]) for p, c in cbs.items()}
    assert got == want


def test_wep_explicit_and_mean_threshold(df):
    _, _, _, js = _brute()
    out = metablock_pairs(df, "id", "name", TOK, weight="js", prune="wep", threshold=0.5)
    got = {(r.l_id, r.r_id) for r in out.collect()}
    assert got == {p for p, w in js.items() if w >= 0.5}

    mean = sum(js.values()) / len(js)
    out2 = metablock_pairs(df, "id", "name", TOK, weight="js", prune="wep")
    got2 = {(r.l_id, r.r_id) for r in out2.collect()}
    assert got2 == {p for p, w in js.items() if w >= mean}


def test_cnp_top_k(df):
    _, _, _, js = _brute()
    k = 1
    keep = set()
    nodes = {n for p in js for n in p}
    for n in nodes:
        inc = sorted(
            ((p, w) for p, w in js.items() if n in p),
            key=lambda pw: (-pw[1], pw[0][0] if pw[0][1] == n else pw[0][1]),
        )
        keep.update(p for p, _ in inc[:k])
    out = metablock_pairs(df, "id", "name", TOK, weight="js", prune="cnp", k=k)
    got = {(r.l_id, r.r_id) for r in out.collect()}
    assert got == keep


def test_validation_errors(df):
    with pytest.raises(AssertionError):
        metablock_pairs(df, "id", "name", TOK, weight="bad")
    with pytest.raises(AssertionError):
        metablock_pairs(df, "id", "name", TOK, prune="cnp")  # k missing
    with pytest.raises(AssertionError):
        token_blocks(df, "id", "name", TOK, max_block_size=1)


def test_plan_is_python_free(df):
    out = metablock_pairs(df, "id", "name", TOK, weight="js", prune="cnp", k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestCleanClean:
    L = [(1, "alpha beta"), (2, "alpha gamma"), (3, "zeta"), (4, None)]
    R = [(10, "alpha beta"), (11, "gamma delta"), (12, "eta")]

    def _brute(self, weight="js", max_block_size=None):
        lb, rb = {}, {}
        for rid, txt in self.L:
            if txt is None: continue
            for t in set(txt.split()):
                lb.setdefault(t, set()).add(rid)
        for rid, txt in self.R:
            if txt is None: continue
            for t in set(txt.split()):
                rb.setdefault(t, set()).add(rid)
        good = {
            b for b in set(lb) & set(rb)
            if max_block_size is None or len(lb[b]) + len(rb[b]) <= max_block_size
        }
        ldeg, rdeg, cbs = {}, {}, {}
        for b in good:
            for u in lb[b]: ldeg[u] = ldeg.get(u, 0) + 1
            for v in rb[b]: rdeg[v] = rdeg.get(v, 0) + 1
            for u in lb[b]:
                for v in rb[b]:
                    cbs[(u, v)] = cbs.get((u, v), 0) + 1
        if weight == "cbs":
            return {p: (c, float(c)) for p, c in cbs.items()}
        return {p: (c, c / (ldeg[p[0]] + rdeg[p[1]] - c)) for p, c in cbs.items()}

    def _run(self, spark, **kw):
        from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer
        from py_stringsimjoin_spark.operators.metablocking import (
            metablock_pairs_two_tables,
        )

        l = spark.createDataFrame(self.L, "id int, name string")
        r = spark.createDataFrame(self.R, "id int, name string")
        out = metablock_pairs_two_tables(
            l, r, "id", "id", "name", "name",
            WhitespaceTokenizer(return_set=True), **kw,
        )
        return {(x.l_id, x.r_id): (x.common_blocks, x.weight) for x in out.collect()}

    def test_edges_match_brute(self, spark):
        for w in ("cbs", "js"):
            assert self._run(spark, weight=w, prune="none") == self._brute(w)

    def test_wep_and_cnp(self, spark):
        js = self._brute("js")
        got = self._run(spark, weight="js", prune="wep", threshold=0.5)
        assert set(got) == {p for p, (_, w) in js.items() if w >= 0.5}
        # CNP k=1: edge kept if top-1 of either endpoint
        keep = set()
        for n in {p[0] for p in js}:
            inc = sorted(((p, w) for p, (_, w) in js.items() if p[0] == n),
                         key=lambda pw: (-pw[1], pw[0][1]))
            keep.update(p for p, _ in inc[:1])
        for n in {p[1] for p in js}:
            inc = sorted(((p, w) for p, (_, w) in js.items() if p[1] == n),
                         key=lambda pw: (-pw[1], pw[0][0]))
            keep.update(p for p, _ in inc[:1])
        got = self._run(spark, weight="js", prune="cnp", k=1)
        assert set(got) == keep

    def test_one_sided_blocks_yield_nothing(self, spark):
        # 'zeta'/'eta' exist on one side only; NULL rows never block
        got = self._run(spark, prune="none")
        assert all(l != 3 for l, _ in got) and all(r != 12 for _, r in got)
