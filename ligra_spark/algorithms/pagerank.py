"""PageRank — power iteration with Ligra-faithful semantics.

Reference: apps/PageRank.C — damping 0.85, init 1/n, per round
``p_next[d] += p_curr[s]/outdeg(s)`` over all edges (writeAdd,
PageRank.C:33-41) then ``p_next = 0.85*p_next + 0.15/n``
(PageRank.C:44-56); converges when the **L1 norm of the rank delta**
drops below 1e-7, max 100 iterations (PageRank.C:73, 90-98).

Two deliberate semantic reproductions for 1e-6 parity:

- **No dangling redistribution**: vertices with out-degree 0 leak their
  rank mass — PageRank.C:33-40 never redistributes sink mass, so total
  rank sum decays below 1. We match that exactly.
- **All-vertices frontier every round** (PageRank.C:80-87): the
  iteration is always dense, so every round is the co-partitioned
  SpMV plan — state(id) ⋈ edges_by_src exchange-free, one shuffle of
  partially-aggregated contributions into groupBy(dst).

``pagerank_delta`` is the frontier-sparsifying variant
(apps/PageRankDelta.C): only vertices whose rank moved by more than
``eps2 = 0.01 ×`` their rank stay in the frontier, exercising the
direction-switching scheduler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ligra_spark.algorithms._iter import (
    IterMetrics,
    Timer,
    materialize,
    unpersist,
)
from ligra_spark.graph import Graph
from ligra_spark.operators.vertex_ops import vertex_map


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    tol: float = 1e-7,
    max_iters: int = 100,
    metrics: IterMetrics | None = None,
    checkpointer=None,
    block: int = 1,
) -> DataFrame:
    """Returns ``(id LONG, rank DOUBLE)`` at convergence.

    Graphs with a declared closure key (``Graph(closure_key=...)``,
    e.g. the transcript link graph where no edge crosses a
    conversation) dispatch to the fused partition-local kernel
    (closed.py): zero per-iteration shuffle, identical output at rtol
    1e-12 / same round count (pytest-pinned). Checkpointed runs stay
    on the generic path (per-iteration checkpoint cadence contract).

    ``block`` chains that many power iterations into ONE driver job /
    checkpoint (superstep blocking): per-round L1 norms still ride the
    job as per-iteration ``Observation``s, but plan analysis, task
    launch and lineage truncation are paid once per block instead of
    once per round. Output is EXACT for any ``block``: the rank update
    is not idempotent, so if the L1 tolerance is crossed mid-block the
    whole block is discarded and replayed from the block-start
    checkpoint with exactly the converged number of rounds — the same
    rounds as ``block=1``, ranks equal up to float-summation order
    (pytest-pinned at rtol 1e-12).
    Checkpointed runs force ``block=1`` (checkpoint cadence and resume
    alignment are per-iteration by contract).

    Default is 1 — MEASURED, not assumed: at sf0.1/local[32] (486k
    edges, the regime where per-round fixed cost is the largest share
    of wall) block=4 ran 27.8s vs 16-19s at block=1, and an idealized
    single-state-reference variant with no per-round metrics showed no
    gain at any block size either (19.6/80.0/18.6/21.2s for blocks
    1/4/10/20) — on one box the round cost is the message shuffle and
    state materialization, which blocking cannot remove, not the
    driver barrier. The knob exists for multi-executor clusters, where
    the per-round barrier is a driver round-trip times a 1000-executor
    task launch — a latency floor the reference's shared-memory rounds
    never pay (ligra.h:469-497) and that blocking divides by
    ``block``; it cannot be evidenced in local mode (no per-job
    scheduler RPC fan-out), so the default stays at the measured
    optimum for the harness this repo can run."""
    if getattr(graph, "closed_edges", None) is not None and checkpointer is None:
        from ligra_spark.algorithms.closed import pagerank_closed

        return pagerank_closed(
            graph, damping=damping, tol=tol, max_iters=max_iters, metrics=metrics
        )
    if checkpointer is None and graph.fits_local_kernel():
        # Whole-graph local dispatch (graph.py:_LocalClosedView): the
        # edge set fits one partition, so the closed PageRank kernel
        # computes the exact global answer in ONE Arrow pass — all
        # power iterations fused, no per-round driver jobs (the
        # distributed loop measured >97% driver orchestration at this
        # scale). Same rounds, same L1 stop, ranks equal up to float
        # summation order (parity pytest-pinned for the closed path).
        from ligra_spark.algorithms.closed import pagerank_closed

        return pagerank_closed(
            graph.local_view(),
            damping=damping,
            tol=tol,
            max_iters=max_iters,
            metrics=metrics,
        )
    n = graph.n
    if n == 0:
        return graph.spark.createDataFrame([], "id long, rank double")
    base = (1.0 - damping) / n

    # state: (id, out_deg, rank) — hash-partitioned on id.
    state = graph.degrees.select(
        "id", "out_deg", F.lit(1.0 / n).alias("rank")
    )
    start_iter = 0
    if checkpointer is not None:
        resumed = checkpointer.resume()
        if resumed is not None:
            start_iter, st = resumed
            state = graph.degrees.select("id", "out_deg").join(st, "id")
        block = 1
    block = max(1, int(block))
    state = materialize(state)

    def step(cur: DataFrame, tag: str) -> tuple[DataFrame, Observation]:
        contribs = (
            cur.where(F.col("out_deg") > 0)
            .select("id", (F.col("rank") / F.col("out_deg")).alias("share"))
            .withColumnRenamed("id", "src")
            .join(graph.edges_by_src, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("share").alias("contrib"))
        )
        # PR_Vertex_F (PageRank.C:44-56) as a vertex_map: the damped
        # rank update is a pure columnar expression over gathered state
        nxt = vertex_map(
            cur.join(contribs, "id", "left"),
            {
                "rank_next": F.lit(base)
                + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
            },
        ).select("id", "out_deg", "rank", "rank_next")
        # Fold the L1 convergence norm into the SAME action that
        # materializes the block (Observation metrics are collected
        # as a side effect of the checkpoint job) — no extra driver
        # job per round. At bench scale the extra job was ~30% of the
        # per-iteration fixed cost; on a cluster it's a full scan of
        # the state table saved per round.
        obs = Observation(tag)
        nxt = nxt.observe(
            obs, F.sum(F.abs(F.col("rank_next") - F.col("rank"))).alias("l1")
        )
        return (
            nxt.select("id", "out_deg", F.col("rank_next").alias("rank")),
            obs,
        )

    def run_block(start: DataFrame, blk: int, it0: int, gen: int):
        """Chain ``blk`` iterations from ``start``; one materialization.

        Each round's state feeds the next round TWICE (the contribs
        scan and the rank-update join). Within a block the intermediate
        rounds are plan-cached (lazy ``persist``) so both references
        share one computation — measured: without it, exchange reuse
        only partially dedups the doubled subtree and a 4-block runs
        ~2x slower than 4 single rounds. The intermediates are released
        only AFTER the block's end state is RDD-checkpointed, so the
        round-1 unpersist-cascade pitfall (cascading drop of a *plan*-
        cached dependent, see materialize()) cannot bite: nothing live
        references the intermediates once the block end is RDD-backed.
        """
        cur, obses, cached = start, [], []
        for j in range(blk):
            cur, obs = step(cur, f"pr_l1_{it0 + j}_g{gen}")
            obses.append(obs)
            if j < blk - 1:
                cur = cur.persist()
                cached.append(cur)
        cur = materialize(cur)  # block start stays persisted (replay)
        for c in cached:
            c.unpersist()
        return cur, [float(o.get["l1"] or 0.0) for o in obses]

    timer = Timer()
    it, gen = start_iter, 0
    while it < max_iters:
        blk = min(block, max_iters - it)
        nxt, l1s = run_block(state, blk, it, gen)
        hit = next((j for j, v in enumerate(l1s) if v < tol), None)
        if hit is not None and hit < blk - 1:
            # tolerance crossed mid-block: the block-end state has
            # extra iterations applied — discard and replay exactly
            # ``hit + 1`` rounds so the result matches block=1 rounds.
            unpersist(nxt)
            gen += 1
            blk = hit + 1
            nxt, l1s = run_block(state, blk, it, gen)
            hit = blk - 1
        unpersist(state)
        state = nxt
        if metrics is not None:
            wall = timer.lap()
            for j in range(blk):
                # wall is measured per BLOCK (one job); amortized
                # evenly across its rounds for the per-iteration log
                metrics.record(
                    it + j, l1=l1s[j], wall_s=wall / blk, edges=graph.m
                )
        if checkpointer is not None:  # blk == 1 by construction
            checkpointer.save(
                it, state.select("id", "rank"), {"l1": l1s[-1]}
            )
        it += blk
        if hit is not None:
            break
    return state.select("id", "rank")


def pagerank_delta(
    graph: Graph,
    damping: float = 0.85,
    eps: float = 1e-7,
    eps2: float = 0.01,
    max_iters: int = 100,
    metrics: IterMetrics | None = None,
) -> DataFrame:
    """Delta-filtered PageRank (apps/PageRankDelta.C:27-127): after the
    first round only vertices with ``|Δ| > eps2 · p`` remain in the
    frontier, so late rounds push from a sparse frontier (broadcast
    zero-shuffle plan) instead of rescanning dense state."""
    # Derivation: with the power iteration p_{t+1} = base + d·A·p_t and
    # p_0 = 1/n, the deltas δ_t = p_t − p_{t-1} satisfy
    #   δ_1 = d·A·δ_0 + (base − 1/n)   with δ_0 = 1/n,
    #   δ_{t+1} = d·A·δ_t              for t ≥ 1,
    # so converged p equals plain PageRank exactly — matching the
    # first-round special case in PageRankDelta.C:47-85.
    n = graph.n
    if n == 0:
        return graph.spark.createDataFrame([], "id long, rank double")
    base = (1.0 - damping) / n
    state = materialize(
        graph.degrees.select(
            "id",
            "out_deg",
            F.lit(1.0 / n).alias("p"),
            F.lit(1.0 / n).alias("delta"),
        )
    )
    frontier = state.select("id", "out_deg", "delta")
    frontier_n = n
    timer = Timer()
    for it in range(max_iters):
        use_broadcast = frontier_n * 20 < n  # m/20-style heuristic on rows
        fr = frontier.where(F.col("out_deg") > 0).select(
            F.col("id").alias("src"),
            (F.col("delta") / F.col("out_deg")).alias("share"),
        )
        if use_broadcast:
            live = graph.edges_by_dst.join(F.broadcast(fr), "src")
        else:
            live = graph.edges_by_src.join(fr, "src")
        contribs = live.groupBy(F.col("dst").alias("id")).agg(
            F.sum("share").alias("contrib")
        )
        kick = (base - 1.0 / n) if it == 0 else 0.0
        nxt = state.join(contribs, "id", "left").select(
            "id",
            "out_deg",
            (
                F.col("p")
                + F.coalesce(F.lit(damping) * F.col("contrib"), F.lit(0.0))
                + F.lit(kick)
            ).alias("p_new"),
            "p",
        )
        nxt = nxt.select(
            "id",
            "out_deg",
            F.col("p_new").alias("p"),
            (F.col("p_new") - F.col("p")).alias("delta"),
        )
        # L1 norm AND frontier size ride the materialization action
        # (one driver job per round instead of three)
        obs = Observation(f"prd_{it}")
        nxt = nxt.observe(
            obs,
            F.sum(F.abs("delta")).alias("l1"),
            F.sum(
                (F.abs(F.col("delta")) > F.col("p") * eps2).cast("long")
            ).alias("frontier_n"),
        )
        nxt = materialize(nxt, state)
        state = nxt
        got = obs.get
        l1 = got["l1"] or 0.0
        # (frontier below shares nxt's checkpoint blocks)
        frontier = nxt.where(F.abs(F.col("delta")) > F.col("p") * eps2).select(
            "id", "out_deg", "delta"
        )
        frontier_n = int(got["frontier_n"] or 0)
        if metrics is not None:
            metrics.record(
                it, l1=float(l1), frontier=frontier_n, wall_s=timer.lap()
            )
        if l1 < eps or frontier_n == 0:
            break
    return state.select("id", F.col("p").alias("rank"))
