"""operators/graph.py — the shared deep-iteration checkpoint mechanism
(round-8 verdict nit: LPA must carry the same lineage guidance as its
PageRank twin) and the exact-integer recurrences it runs.

The load-bearing claim: ``iterate_with_checkpoint`` changes ONLY
physical lineage — a checkpointed deep run is bit-identical to the
unchaptered run AND to a pure-Python unrolled reference of the same
recurrence."""

from __future__ import annotations

from collections import Counter

from rds_pgbadger_etl_spark.operators import graph as G

# A fixed directed graph with outdegrees in {1,2,3}, hub structure, a
# dangling node (4 has no out-edges... give everyone <=3) and an
# isolated node (99) that LPA must leave on its own label.
_EDGES = [
    (0, 1), (0, 2), (0, 3),
    (1, 0), (1, 2),
    (2, 0),
    (3, 4), (3, 5),
    (4, 5),
    (5, 3),
    (6, 7), (7, 8), (8, 6),
    (9, 0),
    (10, 11), (11, 10),
]
_NODES = sorted({v for e in _EDGES for v in e} | {99})


def _dfs(spark):
    nodes = spark.createDataFrame([(v,) for v in _NODES], "vec_id long")
    edges = spark.createDataFrame(_EDGES, "src long, dst long")
    sym = spark.createDataFrame(
        sorted({(a, b) for a, b in _EDGES} | {(b, a) for a, b in _EDGES}),
        "src long, dst long",
    )
    return nodes, edges, sym


def _py_pagerank(n_iters: int) -> dict[int, float]:
    outdeg = Counter(s for s, _ in _EDGES)
    w = {v: 102 // outdeg[v] for v in outdeg}
    s = {v: 1 for v in _NODES}
    for t in range(1, n_iters + 1):
        base = 18 * G.PR_SCALE ** (t - 1)
        nxt = {v: base for v in _NODES}
        for a, b in _EDGES:
            nxt[b] += w[a] * s[a]
        s = nxt
    denom = float(len(_NODES)) * float(G.PR_SCALE**n_iters)
    return {v: s[v] / denom for v in _NODES}


def _py_lpa(n_iters: int) -> dict[int, int]:
    sym = {(a, b) for a, b in _EDGES} | {(b, a) for a, b in _EDGES}
    labels = {v: v for v in _NODES}
    for _ in range(n_iters):
        votes: dict[int, Counter] = {}
        for a, b in sym:
            votes.setdefault(b, Counter())[labels[a]] += 1
        labels = {
            v: (
                min(c for c in votes[v] if votes[v][c] == max(votes[v].values()))
                if v in votes
                else labels[v]
            )
            for v in _NODES
        }
    return labels


def test_pagerank_deep_checkpoint_bit_identical(spark):
    """8 iterations (int64-exact at this scale: S_t < N*120^8 ~ 6e17)
    with checkpoints every 3 rounds == the unchaptered run == the
    pure-Python unrolled recurrence, bit for bit."""
    nodes, edges, _ = _dfs(spark)
    ck = {
        r.vec_id: r.pagerank
        for r in G.pagerank_exact(nodes, edges, 8, checkpoint_every=3).collect()
    }
    plain = {
        r.vec_id: r.pagerank
        for r in G.pagerank_exact(nodes, edges, 8, checkpoint_every=0).collect()
    }
    assert ck == plain == _py_pagerank(8)  # FLOAT equality — exact ints
    # rank mass: dangling/isolated nodes leak mass, so sum <= 1
    assert 0 < sum(ck.values()) <= 1.0 + 1e-12


def test_lpa_deep_checkpoint_bit_identical(spark):
    """10 LPA iterations with checkpoints every 3 rounds == the
    unchaptered run == the Python unrolled recurrence; the isolated
    node keeps its own label."""
    nodes, _, sym = _dfs(spark)
    ck = {
        r.vec_id: r.label
        for r in G.lpa_labels(nodes, sym, 10, checkpoint_every=3).collect()
    }
    plain = {
        r.vec_id: r.label
        for r in G.lpa_labels(nodes, sym, 10, checkpoint_every=0).collect()
    }
    assert ck == plain == _py_lpa(10)
    assert ck[99] == 99  # isolated node never moves
    # the 6-7-8 triangle converges onto its smallest member
    assert ck[6] == ck[7] == ck[8] == 6

def test_pagerank_rejects_outdegree_above_3(spark):
    """pagerank_exact promises exact integer arithmetic, which holds
    only when 102/outdeg divides evenly (outdeg in {1,2,3}); a node
    with outdeg 4 must raise, not silently truncate 102/4 -> 25."""
    import pytest

    nodes = spark.createDataFrame([(i,) for i in range(5)], "vec_id long")
    edges = spark.createDataFrame(
        [(0, d) for d in (1, 2, 3, 4)] + [(1, 0)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="outdeg"):
        G.pagerank_exact(nodes, edges, 2)
