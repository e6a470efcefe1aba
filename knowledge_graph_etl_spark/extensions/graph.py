"""Iterative graph algorithms over edge DataFrames.

:func:`pagerank` — fixed-iteration PageRank in integer micro-units.
Floating-point PageRank is NOT reproducible across engines (neighbor sums
are order-dependent), so ranks are bigint micro-units (1.0 → 1_000_000)
and every step is integer arithmetic (``div``): bit-identical on any
engine, which lets the whole iteration be verified against an unrolled
SQL oracle — same verification standard as the rest of the repo, rare for
an iterative algorithm.

Same execution shape as :func:`..dedup.resolve_clusters`: static edge
list checkpointed once, per-round lazy localCheckpoint (plan severed
immediately, materialized by that round's single action), bounded
shuffles on uniform node keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000  # fixed-point scale: rank 1.0 == 1_000_000 micro-units


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list, returning
    ``(node, rank_micro)`` for every node appearing as source or target.

    Fixed-point update (all integer ops, exactly reproducible):

        contrib(v)   = Σ_{u→v} rank(u) div out_deg(u)
        rank_new(v)  = (1-d)·MICRO + (d·MICRO · contrib(v)) div MICRO

    Simplified variant: dangling-node mass is dropped, not redistributed
    (the redistribution term needs a global sum per round; documented
    tradeoff — ranks are relative scores for downstream filtering, not
    probabilities). ``iters`` is fixed rather than convergence-tested:
    the oracle unrolls the same count.

    Scale shape: out-degrees and the edge list are computed once and
    checkpointed (edges re-partitioned by src carry (src, dst, deg) — 24
    bytes/edge); each round is one equi-join edges⋈ranks on src, one
    sum-aggregate on dst (map-side combinable), one left join back to the
    node spine — all shuffles on uniform node keys, one Spark job per
    round via the lazy-checkpoint-plus-action pattern."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    d_micro = int(round(damping * MICRO))
    base = MICRO - d_micro
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    edeg = e.join(deg, "src").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank_micro", F.lit(MICRO).cast("bigint"))
    for _ in range(iters):
        contrib = (
            edeg.join(ranks, edeg["src"] == ranks["node"])
            .select("dst", F.expr("rank_micro div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # (d·c) div M computed as d·(c div M) + (d·(c mod M)) div M — the
        # algebraically identical split form (c = qM + r ⇒ floor(dc/M) =
        # dq + floor(dr/M)) that cannot overflow: a direct d·c product
        # wraps bigint once a hub's contrib passes ~1.08e10 micro-units
        # (~10^7 in-neighbors), silently going negative with ANSI mode
        # off. Here d·r < 10^12 and d·q < d·(total mass/M) = d·N.
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                nodes["node"],
                (
                    F.lit(base)
                    + F.expr(
                        f"CAST({d_micro} AS BIGINT) * (coalesce(contrib, 0) div {MICRO}) "
                        f"+ (CAST({d_micro} AS BIGINT) * (coalesce(contrib, 0) % {MICRO})) div {MICRO}"
                    )
                ).cast("bigint").alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
