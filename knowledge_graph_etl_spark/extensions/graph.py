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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ckpt import CheckpointTracker

MICRO = 1_000_000  # fixed-point scale: rank 1.0 == 1_000_000 micro-units


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    restart: DataFrame | None = None,
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

    ``restart`` (personalized PageRank): a one-column ``node`` DataFrame
    of seed vertices — the (1-d) restart mass lands ONLY on seeds
    (``base_v = (1-d)·MICRO·[v∈S]``) and the iteration starts from the
    seed indicator (``r0 = MICRO·[v∈S]``), so ranks measure proximity to
    the seed set instead of global centrality. ``None`` = uniform
    (classic PageRank). Same integer update either way.

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
    tracker = CheckpointTracker()
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    tracker.add(nodes)
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    edeg = e.join(deg, "src").localCheckpoint(eager=True)
    tracker.add(edeg)
    if restart is not None:
        seeds = restart.select(F.col("node")).distinct().withColumn(
            "__seed", F.lit(1)
        )
        nodes = nodes.join(seeds, "node", "left").localCheckpoint(eager=False)
        tracker.add(nodes)
        seed_flag = F.col("__seed").isNotNull()
        base_col = F.when(seed_flag, F.lit(base)).otherwise(F.lit(0))
        ranks = nodes.select(
            "node",
            F.when(seed_flag, F.lit(MICRO))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("rank_micro"),
        )
    else:
        base_col = F.lit(base)
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
                    base_col
                    + F.expr(
                        f"CAST({d_micro} AS BIGINT) * (coalesce(contrib, 0) div {MICRO}) "
                        f"+ (CAST({d_micro} AS BIGINT) * (coalesce(contrib, 0) % {MICRO})) div {MICRO}"
                    )
                ).cast("bigint").alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )
        tracker.add(ranks)
    # One action materializes the whole lazy-checkpoint cascade (the same
    # single job the caller's first action would have run); afterwards
    # every superseded round table + the degree-annotated edge list is
    # released — only the final ranks stay pinned.
    ranks.count()
    tracker.release_all(keep=ranks)
    return ranks


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact triangle counting over an undirected edge list (self-loops
    and duplicate/reversed edges tolerated), returning per-vertex triangle
    counts ``(node, n_triangles)`` for every vertex of the cleaned graph.

    The degree-ordering (compact-forward) formulation: orient every edge
    from the endpoint that is smaller in the total order (degree, id) to
    the larger; a triangle {a,b,c} then exists as EXACTLY one oriented
    path a→b→c closed by a→c, so

        triangles = (e1 ⋈ e2 on e1.dst = e2.src) ⋈ e3 on (e1.src, e2.dst)

    counts each triangle once. Degree ordering is the standard output
    bound: the path join fans out only on each vertex's HIGHER-ordered
    neighbors, making join work O(m^{3/2}) on any graph (vs O(Σ deg²)
    for an arbitrary orientation — the difference between feasible and
    not on power-law graphs, where hub vertices would otherwise emit
    deg² wedges). All stages are hash equi-joins/aggs on vertex keys;
    deterministic, so exactly oracle-able.

    The cleaned edge list and the oriented edge list are each
    localCheckpoint-materialized ONCE (r13): both have multiple
    consumers (canon feeds the degree aggregate twice plus the
    orientation join; oriented feeds the three path/closure joins), so
    the un-severed plan re-executed the upstream edge-building subtree —
    for the bench's co-supply graph, the lineitem self-join — at every
    leaf (measured: 68 parquet scans / 172 Exchanges in the plan; 2
    scans after). deg stays lazy — its three consumers are cheap
    aggregates over the canon checkpoint, and a third eager checkpoint
    measured as pure job-sequencing overhead at bench scale. The
    returned plan references both checkpoints; the caller releases them
    after consuming the result (the ckpt-module pinned-RDD budget —
    bench.py and check_oracle.py both do)."""
    raw = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    canon = (
        raw.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        canon.select(F.col("a").alias("v"))
        .unionByName(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = (
        canon.join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint(eager=True)
    e1 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    e2 = oriented.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    e3 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    per_vertex = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    spine = deg.select(F.col("v").alias("node"))
    return spine.join(per_vertex, "node", "left").select(
        "node",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by DETERMINISTIC synchronous label propagation
    over an undirected edge list: every node starts labeled with itself;
    each round it adopts the most frequent label among its neighbors,
    ties broken by minimum label — the tie-break plus synchronous rounds
    makes the classic (notoriously run-to-run unstable) LPA exactly
    reproducible, and therefore SQL-oracle-able like :func:`pagerank`
    (the oracle unrolls the same rounds; asynchronous/randomized LPA
    could never be cross-engine verified). Isolated vertices (including
    self-loop-only ones) keep their own label. Fixed ``iters``; returns
    ``(node, community)``.

    Scale shape: per round one edges⋈labels equi-join, one (node, label)
    count aggregate (map-side combinable), one per-node top-1 — computed
    as ``min(struct(-count, label))``, a HASH aggregate (struct
    comparison is lexicographic, so the min is exactly "count desc, label
    asc"), not a sort-based window: map-side combinable and no per-node
    sort, which matters when a hub node collects millions of votes — then
    one left join back to the node spine. All shuffles on uniform node
    keys, plans severed per round by lazy localCheckpoint."""
    raw = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    tracker = CheckpointTracker()
    e = (
        raw.where(F.col("a") != F.col("b"))
        .select("a", "b")
        .unionByName(
            raw.where(F.col("a") != F.col("b")).select(
                F.col("b").alias("a"), F.col("a").alias("b")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        raw.select(F.col("a").alias("node"))
        .unionByName(raw.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    tracker.add(e, nodes)
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iters):
        votes = (
            e.join(labels.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # top-1 by (c desc, label asc) as min(struct(-c, label)) — same
        # total order, hash aggregate instead of a sort window
        best = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("label"))
                ).alias("top")
            )
            .select("node", F.col("top.label").alias("new_label"))
        )
        labels = (
            nodes.join(best, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", F.col("node")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        tracker.add(labels)
    # materialize the cascade once, then release every superseded round
    # table and the edge/node checkpoints — only final labels stay pinned
    labels.count()
    tracker.release_all(keep=labels)
    return labels.select("node", F.col("label").alias("community"))


def kcore(
    edges: DataFrame,
    k: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """k-core decomposition membership: iteratively peel every vertex of
    (undirected, cleaned) degree < ``k`` until none remains, returning
    ``(node, core_degree)`` for the vertices of the k-core — the maximal
    subgraph where every vertex keeps ≥ k neighbors INSIDE the subgraph
    (Seidman 1983; the standard "dense part of the graph" filter a
    training-data pipeline runs before community/centrality passes).

    Execution shape: the symmetrized edge list is checkpointed once; each
    peeling round is one degree aggregate (map-side combinable) + two
    semi-joins of the edge list against the surviving-vertex set — all
    shuffles on uniform vertex keys, one Spark job per round (the round's
    edge count doubles as the convergence test: |E| is monotonically
    non-increasing and strictly decreases iff any vertex was peeled).
    Rounds are O(peeling depth), in practice ≤ a dozen even on power-law
    graphs; superseded per-round edge checkpoints are released with the
    2-round-lag tracker. Deterministic (no tie-breaks — peeling is
    order-independent), hence exactly SQL-oracle-able by unrolling."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    raw = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    tracker = CheckpointTracker()
    cur = (
        raw.where(F.col("u") != F.col("v"))
        .unionByName(
            raw.where(F.col("u") != F.col("v")).select(
                F.col("v").alias("u"), F.col("u").alias("v")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    tracker.add(cur)
    tracker.round_done()
    prev_n = cur.count()
    if prev_n == 0:
        return cur.select(
            F.col("u").alias("node"), F.lit(0).cast("bigint").alias("core_degree")
        )
    converged = False
    for _ in range(max_iter):
        deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.where(F.col("d") >= k).select("u")
        nxt = (
            cur.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        tracker.add(nxt)
        n = nxt.count()  # one job: materializes the round AND tests it
        tracker.round_done()
        cur = nxt
        if n == prev_n:
            converged = True
            break
        prev_n = n
        if n == 0:
            converged = True
            break
    if not converged:
        tracker.release_all(keep=cur)
        raise RuntimeError(f"kcore did not converge within max_iter={max_iter}")
    out = cur.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )
    # the result aggregates over the final checkpoint — keep exactly it
    tracker.release_all(keep=cur)
    return out


def betweenness(
    edges: DataFrame,
    max_depth: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    sources: DataFrame | None = None,
) -> DataFrame:
    """Bounded-depth Brandes betweenness centrality over an undirected
    edge list, returning ``(node, bet_micro)`` for EVERY vertex: the sum
    over source/target pairs within ``max_depth`` hops of the fraction of
    shortest paths through the vertex, in integer micro-units.

    Exactly the Brandes (2001) two-phase structure, level-synchronous:

    * **forward**: per level d, frontier(s, v, σ) joins the edge list,
      sums path counts σ by (source, vertex), anti-joins the visited set
      (shortest-path DAG only) — one join + one map-side-combinable agg +
      one anti-join per level, all on uniform (s, v) keys;
    * **backward**: per level from the deepest in, dependency
      δ_micro(s,v) = Σ_{w ∈ succ(v)} (σ_v · (MICRO + δ_micro(s,w)))
      div σ_w — the Brandes accumulation in INTEGER micro-units, making
      the whole computation bit-reproducible and therefore exactly
      SQL-oracle-able (floating δ sums are order-dependent; quantization
      error is ≤ #paths·1e-6, far below ranking resolution). Halved at
      the end (each unordered pair is walked from both endpoints).

    ``max_depth`` bounds state to O(sources × d-hop-ball) — the standard
    ego/bounded betweenness variant (Everett & Borgatti); ``sources``
    (one-column ``node`` DataFrame) restricts to sampled sources — the
    Brandes–Pich estimator, the 100 TB path where all-sources × all-nodes
    state is infeasible. Both knobs compose; defaults (all sources) are
    exact bounded betweenness."""
    if max_depth < 2:
        raise ValueError(f"max_depth must be >= 2, got {max_depth}")
    raw = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    tracker = CheckpointTracker()
    e = (
        raw.where(F.col("u") != F.col("v"))
        .unionByName(
            raw.where(F.col("u") != F.col("v")).select(
                F.col("v").alias("u"), F.col("u").alias("v")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node")).distinct().localCheckpoint(eager=True)
    )
    tracker.add(e, nodes)
    srcs = (
        sources.select("node").distinct() if sources is not None else nodes
    )
    f0 = srcs.select(
        F.col("node").alias("s"),
        F.col("node"),
        F.lit(1).cast("bigint").alias("sigma"),
    )
    frontiers = [f0]
    visited = f0.select("s", "node")
    for d in range(1, max_depth + 1):
        cand = (
            frontiers[-1]
            .join(e, frontiers[-1]["node"] == e["u"])
            .select("s", F.col("v").alias("node"), "sigma")
        )
        newf = (
            cand.groupBy("s", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["s", "node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        tracker.add(newf)
        frontiers.append(newf)
        visited = (
            visited.unionByName(newf.select("s", "node"))
            .localCheckpoint(eager=False)
        )
        tracker.add(visited)
    # backward accumulation: δ at the deepest level is 0 (no successors)
    delta = None  # (s, node, delta_micro) for the level BELOW the current one
    contribs = []
    for d in range(max_depth - 1, 0, -1):
        succ = (
            frontiers[d]
            .join(e, frontiers[d]["node"] == e["u"])
            .select("s", "node", "sigma", F.col("v").alias("w"))
        )
        down = frontiers[d + 1].select(
            "s", F.col("node").alias("w"), F.col("sigma").alias("sigma_w")
        )
        joined = succ.join(down, ["s", "w"])
        if delta is not None:
            dw = delta.select(
                "s", F.col("node").alias("w"), F.col("delta_micro").alias("dw")
            )
            joined = joined.join(dw, ["s", "w"], "left").withColumn(
                "dw", F.coalesce("dw", F.lit(0))
            )
        else:
            joined = joined.withColumn("dw", F.lit(0))
        delta = (
            joined.select(
                "s",
                "node",
                F.expr(f"(sigma * ({MICRO} + dw)) div sigma_w").alias("c"),
            )
            .groupBy("s", "node")
            .agg(F.sum("c").alias("delta_micro"))
            .localCheckpoint(eager=False)
        )
        tracker.add(delta)
        contribs.append(delta)
    total = contribs[0]
    for extra in contribs[1:]:
        total = total.unionByName(extra)
    bet = total.groupBy("node").agg(
        F.expr("sum(delta_micro) div 2").alias("bet_micro")
    )
    out = (
        nodes.join(bet, "node", "left")
        .select(
            "node",
            F.coalesce("bet_micro", F.lit(0)).cast("bigint").alias("bet_micro"),
        )
        .localCheckpoint(eager=False)
    )
    out.count()  # materialize the full cascade once
    tracker.release_all(keep=out)
    return out


def closeness(
    edges: DataFrame,
    max_depth: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    sources: DataFrame | None = None,
) -> DataFrame:
    """Bounded-depth closeness centrality over an undirected edge list:
    for every vertex, how many vertices it reaches within ``max_depth``
    hops and how close they are —

        closeness_micro(v) = (n_reached(v) · MICRO) div dist_sum(v)

    (harmonic-free bounded variant; integer micro-units, exactly
    SQL-oracle-able — a float 1/Σd would not be). Returns ``(node,
    n_reached, dist_sum, closeness_micro)`` for every vertex of the
    cleaned graph; isolated-in-ball vertices report zeros.

    Same level-synchronous machinery as :func:`betweenness`' forward
    phase (per level: frontier⋈edges join, σ-free count, anti-join
    visited), with the same two scale knobs: ``max_depth`` bounds the
    per-source ball, ``sources`` (one-column ``node`` DataFrame)
    restricts to a sampled subset — the standard estimator when
    all-pairs distance state is infeasible. All shuffles on uniform
    (source, vertex) keys."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    raw = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    tracker = CheckpointTracker()
    e = (
        raw.where(F.col("u") != F.col("v"))
        .unionByName(
            raw.where(F.col("u") != F.col("v")).select(
                F.col("v").alias("u"), F.col("u").alias("v")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node")).distinct().localCheckpoint(eager=True)
    )
    tracker.add(e, nodes)
    srcs = sources.select("node").distinct() if sources is not None else nodes
    frontier = srcs.select(F.col("node").alias("s"), F.col("node"))
    visited = frontier
    reached = []  # (s, node, dist) per level
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select("s", F.col("v").alias("node"))
            .distinct()
            .join(visited, ["s", "node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        tracker.add(nxt)
        reached.append(nxt.withColumn("dist", F.lit(d)))
        frontier = nxt
        visited = (
            visited.unionByName(nxt).localCheckpoint(eager=False)
        )
        tracker.add(visited)
    allr = reached[0]
    for extra in reached[1:]:
        allr = allr.unionByName(extra)
    per_src = allr.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reached"),
        F.sum("dist").cast("bigint").alias("dist_sum"),
    )
    out = (
        nodes.join(per_src, "node", "left")
        .select(
            "node",
            F.coalesce("n_reached", F.lit(0)).cast("bigint").alias("n_reached"),
            F.coalesce("dist_sum", F.lit(0)).cast("bigint").alias("dist_sum"),
            F.when(
                F.coalesce("dist_sum", F.lit(0)) > 0,
                F.expr("(n_reached * 1000000) div dist_sum"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("closeness_micro"),
        )
        .localCheckpoint(eager=False)
    )
    out.count()
    tracker.release_all(keep=out)
    return out


def linkpred_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hub_degree: int = 1000,
    min_common: int = 2,
    materialize: bool = False,
) -> DataFrame:
    """Neighbor-overlap link prediction for SRC-node pairs of a bipartite
    (or directed) edge list: two src nodes sharing many dst neighbors are
    likely-linked. Scores both classic indices in integer units:

    - ``jaccard_ppm`` = |N(a)∩N(b)|·1e6 div |N(a)∪N(b)|
    - ``ra_ppm``      = Σ_{d∈N(a)∩N(b)} 1e6 div deg(d) — the
      resource-allocation index (Zhou, Lü, Zhang 2009), the
      integer-friendly sibling of Adamic-Adar (1/deg instead of
      1/log deg; same ranking behavior on power-law graphs, exact in
      cross-engine integer arithmetic).

    Scale shape — the inverted-index pattern shared with
    ``dedup.ngram_jaccard_pairs``: pair generation goes through a
    self-join keyed on dst, so a HUB dst with degree h contributes
    h·(h−1)/2 pairs; ``max_hub_degree`` caps that quadratic term by
    dropping hubs first (a dst shared by thousands of srcs carries ~no
    link-prediction signal — standard practice, and the cap is applied
    BEFORE every degree count so all three statistics are consistent on
    the capped graph). ``min_common`` prunes the pair tail early, inside
    the first aggregation. Degree tables are node-count-sized — small
    enough for AQE to broadcast at bench scale, but NOT force-broadcast
    here: at 100 TB a per-dst degree table is itself large, and its
    joins are plain equi-joins on the very keys the edge stream is
    already partitioned by. The only large shuffles are the dst-keyed
    self-join and the (a,b) pair aggregation — both on uniform keys
    after the cap.

    ``materialize=True`` localCheckpoints the capped edge list once:
    three consumers read it (src degrees, both self-join sides), so the
    lazy form re-executes the distinct+cap subtree three times — r11
    solo series on the bench entry: lazy [11.2, 6.4, 6.0, 3.8, 3.4]
    seconds vs materialized [4.6, 3.4, 2.9, 3.0, 2.9] — both 2× faster
    at the median and far less variant (the re-executed subtree's
    variance compounds). Same tradeoff knob as ks_2sample/psi_report;
    identical results either way.

    Returns ``(src_a, src_b, common, jaccard_ppm, ra_ppm)`` with
    ``src_a < src_b``.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    dst_deg = e.groupBy("d").agg(F.count("*").alias("deg_d"))
    keep = dst_deg.where(F.col("deg_d") <= int(max_hub_degree))
    e_capped = e.join(keep, "d")
    if materialize:
        e_capped = e_capped.localCheckpoint(eager=True)
    src_deg = e_capped.groupBy("s").agg(F.count("*").alias("deg_s"))

    a = e_capped.select(F.col("d"), F.col("s").alias("src_a"), "deg_d")
    b = e_capped.select(F.col("d"), F.col("s").alias("src_b"))
    pairs = (
        a.join(b, "d")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.count("*").alias("common"),
            F.sum(F.expr("1000000 div deg_d")).alias("ra_ppm"),
        )
        .where(F.col("common") >= int(min_common))
    )
    da = src_deg.select(F.col("s").alias("src_a"), F.col("deg_s").alias("deg_a"))
    db = src_deg.select(F.col("s").alias("src_b"), F.col("deg_s").alias("deg_b"))
    return (
        pairs.join(da, "src_a")
        .join(db, "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("common").cast("bigint").alias("common"),
            F.expr(
                "CAST(common * 1000000 div (deg_a + deg_b - common) AS BIGINT)"
            ).alias("jaccard_ppm"),
            F.col("ra_ppm").cast("bigint").alias("ra_ppm"),
        )
    )


def ktruss(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """k-truss decomposition membership: iteratively remove every edge
    that sits in fewer than ``k-2`` triangles of the SURVIVING subgraph,
    until none does (Cohen 2008). The truss is the edge-level analog of
    the k-core — the standard "cohesive community backbone" extractor —
    and strictly stronger: every edge of the k-truss joins two vertices
    of the (k-1)-core.

    Execution shape (per round, ONE Spark job): triangle support comes
    from the wedge join — the symmetrized neighbor list joined to the
    canonical (u<v) edge list on BOTH endpoints (common neighbor w of u
    and v closes edge (u,w) and (v,w)) — then a support aggregate and a
    filter; the survivor edge list is lazily checkpointed and its count
    doubles as the convergence test (|E| monotone non-increasing).
    Shuffles key on vertices/edge pairs — uniform after any hub capping
    the caller applies upstream (compose with
    :func:`linkpred_scores`-style degree caps for power-law inputs: a
    hub of degree h contributes h² wedge rows). Deterministic — edge
    removal is order-independent within a round — hence exactly
    SQL-oracle-able by unrolling rounds into MATERIALIZED CTEs.

    Returns the surviving canonical edge list ``(src, dst, support)``
    with ``src < dst`` and ``support`` counted in the final subgraph."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    need = k - 2
    raw = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    canon = (
        raw.where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    tracker = CheckpointTracker()
    cur = canon.localCheckpoint(eager=True)
    tracker.add(cur)
    tracker.round_done()
    prev_n = cur.count()
    empty = cur.select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        F.lit(0).cast("bigint").alias("support"),
    ).limit(0)
    if prev_n == 0:
        return empty

    def support_of(e: DataFrame) -> DataFrame:
        nb = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        x = nb.select(F.col("u").alias("eu"), F.col("v").alias("w"))
        y = nb.select(F.col("u").alias("ev"), F.col("v").alias("w"))
        return (
            e.join(x, F.col("u") == F.col("eu"))
            .join(y, (F.col("v") == F.col("ev")) & (x["w"] == y["w"]))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("support"))
        )

    if need == 0:
        # 2-truss: every edge survives trivially (support >= 0); report
        # support without peeling
        out = (
            cur.join(support_of(cur), ["u", "v"], "left")
            .select(
                F.col("u").alias("src"),
                F.col("v").alias("dst"),
                F.coalesce("support", F.lit(0)).cast("bigint").alias("support"),
            )
            .localCheckpoint(eager=True)
        )
        tracker.release_all(keep=out)
        return out
    converged = False
    for _ in range(max_iter):
        sup = support_of(cur)
        # edges in zero triangles are absent from sup and correctly
        # drop out here (0 < need)
        nxt = (
            sup.where(F.col("support") >= need)
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        tracker.add(nxt)
        n = nxt.count()  # one job: materializes the round AND tests it
        tracker.round_done()
        cur = nxt
        if n == prev_n or n == 0:
            converged = True  # fixed point, or nothing left to peel
            prev_n = n
            break
        prev_n = n
    if not converged:
        tracker.release_all(keep=cur)
        raise RuntimeError(f"ktruss did not converge within max_iter={max_iter}")
    if prev_n == 0:
        tracker.release_all()
        return empty
    out = support_of(cur).select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        F.col("support").cast("bigint").alias("support"),
    )
    out = out.localCheckpoint(eager=True)
    tracker.release_all(keep=out)
    return out


def negative_edge_samples(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    m: int = 3,
) -> DataFrame:
    """Deterministic negative-edge sampling — the training-data operator
    behind every KG-embedding / link-prediction objective (TransE-style
    corruption): for each positive edge, ``m`` hash-picked corrupted
    tails, with candidates that happen to be REAL edges removed by an
    anti-join (false negatives poison the loss). Fixed md5 choice makes
    the sample reproducible run-to-run and SQL-oracle-able — a resampled
    epoch is a parameter change (`j` offset), not an RNG state.

    Mechanics: the distinct tail set gets a dense index (row_number over
    the tail order — at production scale this index is a precomputed
    artifact like a vocab table, built once per corpus version, not per
    epoch); candidate ``j`` for an edge is the tail whose index is
    ``md5(src:dst:j) mod N``. After the anti-join an edge keeps ≤ m
    negatives (documented filtered semantics — dense graphs lose more;
    raise ``m`` to compensate).

    Scale shape: distinct + index once; the candidate join is on the
    uniform hash-index key; the false-negative filter is one LEFT ANTI
    join on (src, neg). Everything else is a bounded ×m explode of the
    EDGE list. Returns ``(src, pos_dst, j, neg_dst)``."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    from .hashing import md5_u60

    pos = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    dsts = pos.select("dst").distinct()
    n = dsts.count()
    idx = dsts.withColumn(
        "nid", F.row_number().over(Window.orderBy("dst")) - 1
    )
    cand = pos.select(
        "src",
        F.col("dst").alias("pos_dst"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j"),
    ).withColumn(
        "nid",
        md5_u60(
            F.concat_ws(
                ":",
                F.col("src").cast("string"),
                F.col("pos_dst").cast("string"),
                F.col("j").cast("string"),
            )
        )
        % n,
    )
    withneg = cand.join(idx, "nid").select(
        "src", "pos_dst", "j", F.col("dst").alias("neg_dst")
    )
    return withneg.join(
        pos.select("src", F.col("dst").alias("neg_dst")),
        ["src", "neg_dst"],
        "left_anti",
    ).select("src", "pos_dst", "j", "neg_dst")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    pairs_canonical: bool = False,
) -> DataFrame:
    """Weakly-connected components of an undirected edge list: one row
    per node with its ``component`` (the minimum node id reachable — a
    canonical, order-free component label) and the component size. The
    graph-module front door for the hash-min label-propagation +
    pointer-jumping machinery :func:`~.dedup.resolve_clusters` runs for
    near-dup cluster resolution — ONE implementation, two surfaces, so
    the convergence discipline (per-round checkpoint tracking, sum-
    fixpoint detection, bounded rounds) is tested once.

    Scale shape: per round one edges⋈labels equi-join + min-aggregate
    (map-side combinable) and a pointer-jump self-join; rounds ≈
    O(log(diameter)) with jumping. Isolated nodes never appear (an edge
    list has no isolated nodes); pass a node spine through
    ``resolve_clusters(docs=...)`` when singletons matter.

    Returns ``(node, component, component_size)``.
    """
    from .dedup import resolve_clusters

    out = resolve_clusters(
        edges,
        pair_cols=(src, dst),
        id_col="node",
        max_iter=max_iter,
        # pass-through: an already-distinct edge list with a strict
        # src < dst order skips the symmetrized-edge dedup shuffle
        pairs_canonical=pairs_canonical,
    )
    return out.select(
        "node",
        F.col("cluster_rep").alias("component"),
        F.col("cluster_size").cast("bigint").alias("component_size"),
    )


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree assortativity of a (bipartite or directed) edge list: the
    Pearson correlation between source-degree and destination-degree
    across edges. Positive = hubs link to hubs (assortative mixing),
    negative = hubs link to leaves — the one-number topology check run
    before trusting sampled-subgraph statistics, since sampling biases
    invert under disassortative mixing.

    Exactness: degrees are exact bigint counts over the DISTINCT edge
    set; the five correlation sums accumulate in decimal(38,0) (an edge
    list of a billion rows with million-degree hubs squares past int64);
    r evaluates in double from those exact sums (identical IEEE
    expression both engines), rounded to 1e-6.

    Scale shape: two map-combinable degree aggregates + two 1:N joins
    of edges to degrees (hub keys are 1:N, no fan-out, AQE-handled) +
    one scalar aggregate. No windows, no collects. Returns one row:
    ``(n_edges, r)``."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    ds = e.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("deg_s"))
    dd = e.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("deg_d"))
    pairs = e.join(ds, "s").join(dd, "d").select("deg_s", "deg_d")

    def dec(c: str) -> F.Column:
        return F.col(c).cast("decimal(38,0)")

    sums = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum(dec("deg_s")).cast("decimal(38,0)").alias("sx"),
        F.sum(dec("deg_d")).cast("decimal(38,0)").alias("sy"),
        F.sum(dec("deg_s") * dec("deg_d")).cast("decimal(38,0)").alias("sxy"),
        F.sum(dec("deg_s") * dec("deg_s")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dec("deg_d") * dec("deg_d")).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n_edges").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.sqrt(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return sums.select(
        "n_edges",
        F.round(
            F.when(den > F.lit(0.0), num / den).otherwise(F.lit(0.0)), 6
        ).alias("r"),
    )
