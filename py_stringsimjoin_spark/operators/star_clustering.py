"""Star clustering: a single-pass, non-transitive alternative to CC.

Transitive clustering (operators/connected_components.py) collapses every
similarity chain: A~B~C~D becomes one entity even when A and D share
nothing. Star clustering (Aslam, Pelekhov & Rus, "The star clustering
algorithm for static and dynamic information organization", JGAA 2004;
evaluated for dedup alongside CC by Hassanzadeh et al., VLDB 2009) instead
picks locally-dominant hub records as cluster CENTERS and attaches each
record to one adjacent center, so chains break at low-degree links. The
reference stops at pair output (py_stringsimjoin has no clustering); this
extends the record-linkage pipeline's clustering stage with the standard
over-merge-resistant variant.

Deterministic one-pass parallel formulation (the classic algorithm is a
sequential greedy scan; this variant replaces scan order with a total
order so the result is reproducible and shuffle-parallel):

* ``degree(v)`` over the symmetrized, deduplicated edge set;
* ``v`` is a **center** iff no neighbor ``u`` dominates it, where ``u``
  dominates ``v`` iff ``(deg(u), u) > (deg(v), v)`` under (degree DESC,
  id ASC) — a total order, so ties are stable and data-derived;
* a non-center attaches to its dominant adjacent center under the same
  order; a non-center with no adjacent center stays a singleton (the
  greedy scan cannot orphan a node, the one-pass variant can — singleton
  fallback keeps the output a partition of the input nodes).

Scale shape (100 TB test): one bounded DAG — edge distinct, degree
aggregation, two hash joins with one aggregation each — zero iteration,
zero driver-side state, vs CC's O(log² n) checkpointed rounds. The
symmetrized edge set and its degree table feed two consumers each; AQE
exchange reuse materializes each shared shuffle ONCE at runtime
(verified: 6 ReusedExchange nodes in the executed plan), so the
upstream match-pair join is never recomputed. Hot hubs (Zipf token
blocks upstream) are ordinary groupBy skew, absorbed by AQE; ids are
only compared, never negated, so any orderable key type works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .connected_components import connected_components


def star_clustering(pairs: DataFrame, l_col: str, r_col: str) -> DataFrame:
    """(node, cluster) — one row per node appearing in ``pairs``; cluster
    ids are center node ids (every center clusters to itself)."""
    e = pairs.select(F.col(l_col).alias("src"), F.col(r_col).alias("dst")).where(
        F.col(l_col) != F.col(r_col)
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    # each edge annotated with the neighbor's degree (one hash join on dst)
    nb = sym.join(
        deg.select(F.col("src").alias("dst"), F.col("deg").alias("ddeg")), "dst"
    )
    # dominant neighbor per node: min of (-deg, id) == (degree DESC, id ASC)
    best = nb.groupBy("src").agg(
        F.min(
            F.struct((-F.col("ddeg")).alias("nd"), F.col("dst").alias("nid"))
        ).alias("best")
    )
    flagged = best.join(deg, "src").select(
        "src",
        (
            (F.col("best.nd") > -F.col("deg"))
            | ((F.col("best.nd") == -F.col("deg")) & (F.col("best.nid") > F.col("src")))
        ).alias("is_center"),
    )

    # dominant ADJACENT CENTER per node (second hash join, same dst key)
    chosen = (
        nb.join(
            flagged.select(
                F.col("src").alias("dst"), F.col("is_center").alias("c_center")
            ),
            "dst",
        )
        .where(F.col("c_center"))
        .groupBy("src")
        .agg(
            F.min(
                F.struct((-F.col("ddeg")).alias("nd"), F.col("dst").alias("nid"))
            ).alias("ctr")
        )
    )
    return flagged.join(chosen, "src", "left").select(
        F.col("src").alias("node"),
        F.when(F.col("is_center"), F.col("src"))
        .otherwise(F.coalesce(F.col("ctr.nid"), F.col("src")))
        .alias("cluster"),
    )


def merge_center_clustering(
    pairs: DataFrame, l_col: str, r_col: str
) -> DataFrame:
    """MERGE-CENTER clustering (Hassanzadeh & Miller, "Creating
    probabilistic databases from duplicated data", VLDB J 2009): star
    clusters, then clusters whose centers are BRIDGED merge — the middle
    ground between star (never merges, can over-split a dumbbell entity)
    and transitive CC (merges every chain).

    The classic algorithm is a sequential greedy scan (merge when a node
    adjacent to an existing center is reached from another center); this
    deterministic parallel variant replaces scan order with a declarative
    bridge relation: centers c1, c2 merge iff some node u satisfies
    (u = c1 or u ~ c1) AND (u = c2 or u ~ c2) — i.e. the centers are
    adjacent, or share any common neighbor. Merged clusters take the
    minimum member-center id (the CC convention), so output is
    reproducible and engine-independent.

    Scale shape: star's bounded DAG + one (node → adjacent-center)
    semi-join, one self-join on the bridging node (fan-out bounded by a
    node's ADJACENT-CENTER count, far below its degree), then CC over the
    center graph only — orders of magnitude smaller than the input graph,
    so the iterative stage runs on the contracted problem (same trick as
    update_components' contracted-graph CC).
    """
    e = pairs.select(F.col(l_col).alias("src"), F.col(r_col).alias("dst")).where(
        F.col(l_col) != F.col(r_col)
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    star = star_clustering(pairs, l_col, r_col)
    centers = star.select(F.col("cluster").alias("_c")).distinct()
    # adjacent-or-equal: (u, center) for u ~ center, plus (center, center)
    adjeq = sym.join(
        centers, sym["dst"] == centers["_c"]
    ).select(F.col("src").alias("_u"), "_c").unionByName(
        centers.select(F.col("_c").alias("_u"), "_c")
    )
    bridges = (
        adjeq.alias("a")
        .join(adjeq.alias("b"), F.col("a._u") == F.col("b._u"))
        .where(F.col("a._c") < F.col("b._c"))
        .select(F.col("a._c").alias("_c1"), F.col("b._c").alias("_c2"))
        .distinct()
    )
    comp = connected_components(bridges, "_c1", "_c2")
    return star.join(
        comp.select(F.col("node").alias("cluster"), "component"),
        "cluster",
        "left",
    ).select(
        "node",
        F.coalesce(F.col("component"), F.col("cluster")).alias("cluster"),
    )
