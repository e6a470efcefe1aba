"""Property-based tests for the graph operators: random small edge lists
checked against pure-python references and structural invariants (the
SQL oracles verify one fixed graph; these verify the CLASS).

Invariants:
  * kcore — every surviving vertex has >= k neighbors INSIDE the core;
    python peeling produces the identical core (maximality); the
    (k+1)-core is a subgraph of the k-core;
  * betweenness (max_depth=2) — equals a python bounded Brandes with the
    same integer quantization;
  * closeness (max_depth=2) — (n_reached, dist_sum) equal python BFS.
"""

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

_NODES = list("abcdefg")
_edges = st.lists(
    st.tuples(st.sampled_from(_NODES), st.sampled_from(_NODES)),
    min_size=1,
    max_size=14,
)


def _adj(edges):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    return adj


def _py_kcore(edges, k):
    adj = _adj(edges)
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for v in list(alive):
            deg = len(adj[v] & alive)
            if deg < k:
                alive.discard(v)
                changed = True
    return {v: len(adj[v] & alive) for v in alive}


def _df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


@settings(max_examples=10, deadline=None)
@given(edges=_edges, k=st.integers(min_value=1, max_value=3))
def test_kcore_matches_python_peeling(spark, edges, k):
    from knowledge_graph_etl_spark.extensions.graph import kcore

    got = {
        r["node"]: r["core_degree"] for r in kcore(_df(spark, edges), k=k).collect()
    }
    assert got == _py_kcore(edges, k)
    # every in-core vertex keeps >= k in-core neighbors
    assert all(d >= k for d in got.values())
    # nesting: the (k+1)-core lives inside the k-core
    higher = set(_py_kcore(edges, k + 1))
    assert higher <= set(got)


def _py_bfs(adj, s, max_depth):
    """-> {node: (dist, sigma)} for nodes within max_depth of s (excl s)."""
    dist = {s: 0}
    sigma = {s: 1}
    frontier = [s]
    for d in range(1, max_depth + 1):
        nxt = defaultdict(int)
        for v in frontier:
            for w in adj[v]:
                if w not in dist or dist.get(w) == d:
                    nxt[w] += sigma[v]
        frontier = []
        for w, sg in nxt.items():
            if w not in dist:
                dist[w] = d
                sigma[w] = sg
                frontier.append(w)
    return dist, sigma


@settings(max_examples=10, deadline=None)
@given(edges=_edges)
def test_betweenness_depth2_matches_python(spark, edges):
    from knowledge_graph_etl_spark.extensions.graph import betweenness

    adj = _adj(edges)
    bet = defaultdict(int)
    for s in adj:
        dist, sigma = _py_bfs(adj, s, 2)
        for v in adj:
            if dist.get(v) != 1:
                continue
            for w in adj[v]:
                if dist.get(w) == 2:
                    bet[v] += (sigma[v] * 1_000_000) // sigma[w]
    expect = {v: bet.get(v, 0) // 2 for v in adj}
    got = {
        r["node"]: r["bet_micro"]
        for r in betweenness(_df(spark, edges)).collect()
    }
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(edges=_edges)
def test_closeness_depth2_matches_python(spark, edges):
    from knowledge_graph_etl_spark.extensions.graph import closeness

    adj = _adj(edges)
    expect = {}
    for s in adj:
        dist, _ = _py_bfs(adj, s, 2)
        reach = [d for v, d in dist.items() if v != s]
        n, ds = len(reach), sum(reach)
        expect[s] = (n, ds, (n * 1_000_000) // ds if ds else 0)
    got = {
        r["node"]: (r["n_reached"], r["dist_sum"], r["closeness_micro"])
        for r in closeness(_df(spark, edges)).collect()
    }
    assert got == expect
