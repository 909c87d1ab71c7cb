"""Synchronous label propagation (LPA) — community-style ER clustering.

Raghavan, Albert & Kumara, "Near linear time algorithm to detect community
structures in large-scale networks" (Phys. Rev. E 2007), in the
deterministic synchronous variant: every node starts labeled with its own
id; each round, every node simultaneously adopts the most frequent label
among its NEIGHBORS (ties → smallest label). After ``num_iters`` rounds
the label sets are the communities. Between the one-pass star clustering
(operators/star_clustering.py) and full transitive CC
(operators/connected_components.py), LPA is the density-sensitive middle
ground for match graphs: long weak chains do NOT collapse (labels only
travel one hop per round), while dense cores converge in 2-3 rounds — the
standard over-merge diagnostic for entity resolution at web scale.

Determinism: the classic algorithm breaks ties randomly and updates
asynchronously in shuffled order — both unusable for a reproducible
distributed engine. Here updates are synchronous (a pure function of the
previous round — embarrassingly parallel) and ties break on the smallest
label; the fixed ``num_iters`` bounds oscillation (the known price of
synchronous LPA on bipartite-ish subgraphs; diagnostics compare rounds k
and k−1 if convergence detection is needed).

Scale shape (100 TB test): per round, ONE hash join (edge dst → labels) +
two partial-aggregated hash aggregations (per-(node,label) counts, then
the per-node argmax via max-count + min-label — no window, no sort); the
label table re-persists each round so lineage stays O(1) (the BPE-loop
rule). Rounds are the knob, independent of graph size; nothing collects
to the driver. Integer counts + id comparisons only — no floats anywhere,
so ``lpa_oracle_stages`` replays the WHOLE loop as generated SQL CTE
stages and the driver oracle hash-matches every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.cache import persist_tracked


def label_propagation(
    pairs: DataFrame,
    l_col: str,
    r_col: str,
    num_iters: int = 5,
    checkpoint_interval: int = 8,
) -> DataFrame:
    """(node, label) — the community assignment after ``num_iters``
    synchronous rounds over the symmetrized, deduplicated edge set.
    Self-loops are dropped; isolated nodes never appear (pairs input).

    Unlike the BPE loop there is NO per-round driver decision, so the
    whole loop is ONE lazy chained plan (a single action executes every
    round back to back — no per-round job-scheduling overhead); the edge
    set is persisted once and reused by every round's join, and the label
    table is localCheckpoint-truncated every ``checkpoint_interval``
    rounds so Catalyst analysis stays linear for deep runs."""
    if not (num_iters >= 1):
        raise AssertionError("num_iters must be >= 1")
    if not (checkpoint_interval >= 1):
        raise AssertionError("checkpoint_interval must be >= 1")
    e = pairs.select(F.col(l_col).alias("src"), F.col(r_col).alias("dst")).where(
        F.col(l_col) != F.col(r_col)
    )
    sym = persist_tracked(
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    )
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for i in range(num_iters):
        nbl = sym.join(
            labels.select(F.col("node").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("node"), "label")
        cnt = nbl.groupBy("node", "label").agg(F.count(F.lit(1)).alias("_c"))
        mx = cnt.groupBy("node").agg(F.max("_c").alias("_mc"))
        labels = (
            cnt.join(mx, "node")
            .where(F.col("_c") == F.col("_mc"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if (i + 1) % checkpoint_interval == 0 and (i + 1) < num_iters:
            labels = labels.localCheckpoint(eager=False)
    return labels


def lpa_oracle_stages(edges_cte: str, num_iters: int = 5) -> str:
    """Generated SQL replaying the synchronous loop: ``edges_cte`` must be
    the NAME of a CTE providing symmetrized (src, dst) edges; returns the
    CTE chain text (l0..l{num_iters}) + the final SELECT. Integer counts
    and min/max only — hash-exact cross-engine."""
    parts = [
        f"""l0 AS MATERIALIZED (
  SELECT src AS node, src AS label FROM (SELECT DISTINCT src FROM {edges_cte})
)"""
    ]
    for i in range(num_iters):
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT e.src AS node, l.label, count(*) AS c
  FROM {edges_cte} e JOIN l{i} l ON l.node = e.dst
  GROUP BY 1, 2
), l{i + 1} AS MATERIALIZED (
  SELECT c.node, min(c.label) AS label
  FROM c{i} c
  JOIN (SELECT node, max(c) AS mc FROM c{i} GROUP BY 1) m
    ON m.node = c.node AND c.c = m.mc
  GROUP BY 1
)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, label FROM l{num_iters}"
    )
