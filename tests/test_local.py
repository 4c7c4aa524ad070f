"""Local clustering (ACL PPR push, Nibble) vs Python oracles."""

from __future__ import annotations

import collections

import numpy as np

from ligra_spark.algorithms import nibble, ppr_acl
from ligra_spark.graph import Graph
from ligra_spark.sources.rmat import rmat_graph_df


def _sym(edges):
    out = collections.defaultdict(set)
    for s, d in edges:
        out[s].add(d)
        out[d].add(s)
    return {v: sorted(ns) for v, ns in out.items()}


def _acl_oracle(adj, source, alpha, eps, max_iters=10000):
    p = collections.defaultdict(float)
    r = collections.defaultdict(float)
    r[source] = 1.0
    for _ in range(max_iters):
        fr = [v for v in list(r) if r[v] > len(adj.get(v, ())) * eps and adj.get(v)]
        if not fr:
            break
        newr = dict(r)
        for v in fr:
            p[v] += 2 * alpha / (1 + alpha) * r[v]
            newr[v] -= r[v]
        for v in fr:
            share = (1 - alpha) / (1 + alpha) * r[v] / len(adj[v])
            for u in adj[v]:
                newr[u] = newr.get(u, 0.0) + share
        r = collections.defaultdict(float, newr)
    return {v: x for v, x in p.items() if x > 0}


def _nibble_oracle(adj, source, eps, max_iters):
    p = {source: 1.0}
    for _ in range(max_iters):
        fr = [v for v in p if p[v] >= len(adj.get(v, ())) * eps and adj.get(v)]
        if not fr:
            break
        newp = collections.defaultdict(float)
        for v in fr:
            newp[v] += p[v] / 2
            share = p[v] / (2 * len(adj[v]))
            for u in adj[v]:
                newp[u] += share
        p = dict(newp)
    return p


def test_ppr_acl_matches_oracle(spark):
    g = Graph(rmat_graph_df(spark, 6, 200), dedupe=True, num_partitions=4)
    sg = g.symmetrized()
    edges = [(r["src"], r["dst"]) for r in g.edges_by_src.collect()]
    adj = _sym(edges)
    src = min(adj)
    got = {r["id"]: r["p"] for r in ppr_acl(sg, src, alpha=0.15, eps=1e-4).collect()}
    want = _acl_oracle(adj, src, 0.15, 1e-4)
    assert set(got) == set(want)
    for v in want:
        np.testing.assert_allclose(got[v], want[v], rtol=1e-9)
    # locality: the sparse state never touched the whole graph
    assert len(got) <= len(adj)
    g.unpersist()
    sg.unpersist()


def test_nibble_matches_oracle(spark):
    g = Graph(rmat_graph_df(spark, 6, 200), dedupe=True, num_partitions=4)
    sg = g.symmetrized()
    edges = [(r["src"], r["dst"]) for r in g.edges_by_src.collect()]
    adj = _sym(edges)
    src = min(adj)
    got = {r["id"]: r["p"] for r in nibble(sg, src, eps=1e-3, max_iters=8).collect()}
    want = _nibble_oracle(adj, src, 1e-3, 8)
    assert set(got) == set(want)
    for v in want:
        np.testing.assert_allclose(got[v], want[v], rtol=1e-9)
    g.unpersist()
    sg.unpersist()


def _hk_oracle(adj, src, t=3.0, eps=1e-9, N=4):
    import math

    deg = {v: len(ns) for v, ns in adj.items()}
    fact = [1.0] * N
    for k in range(1, N):
        fact[k] = k * fact[k - 1]
    psis = [
        sum(fact[k] * t ** m / fact[m + k] for m in range(N - k))
        for k in range(N)
    ]
    const = math.exp(t) * eps / (2.0 * N)
    x = collections.defaultdict(float)
    x[src] = 0.0
    r = {src: 1.0}
    frontier = [v for v in r if deg.get(v, 0) > 0]
    for j in range(N):
        if not frontier:
            break
        for v in frontier:
            x[v] += r[v]
        last = j + 1 == N
        factor = 1.0 if last else t / (j + 1)
        new_r = collections.defaultdict(float)
        for v in frontier:
            sh = factor * r[v] / deg[v]
            for u in adj[v]:
                new_r[u] += sh
        if last:
            for u, m in new_r.items():
                x[u] += m
            break
        r = dict(new_r)
        frontier = [
            v for v in r
            if deg.get(v, 0) > 0 and r[v] >= deg[v] * (const / psis[j + 1])
        ]
    return dict(x)


def test_heat_kernel_matches_oracle(spark):
    from ligra_spark.algorithms import heat_kernel
    from ligra_spark.sources.rmat import rmat_graph_df

    df = rmat_graph_df(spark, 6, 300, seed=7)
    # Graph.symmetrized() dedupes and drops self-loops; mirror that
    edges = [(r.src, r.dst) for r in df.collect() if r.src != r.dst]
    adj = _sym(edges)
    g = Graph(df, num_partitions=4).symmetrized()
    src = min(adj)
    want = _hk_oracle(adj, src)
    got = {r["id"]: r["x"] for r in heat_kernel(g, src).collect()}
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


def _hk_rand_oracle(adj, source, walkers):
    """Pure-Python replay of the pinned rand-HK-PR walks: walker
    (i, h, L) takes L steps, each to sorted-neighbor index h % deg,
    staying put at a sink (see heat_kernel_rand's docstring)."""
    counts = collections.Counter()
    for _, h, steps in walkers:
        x = source
        for _ in range(steps):
            ns = adj.get(x)
            if ns:
                x = ns[h % len(ns)]
        counts[x] += 1
    n = len(walkers)
    return {v: c / n for v, c in counts.items()}


def test_heat_kernel_rand_matches_oracle(spark):
    from ligra_spark.algorithms import heat_kernel_rand
    from ligra_spark.algorithms.local import heat_kernel_rand_walk_params

    df = rmat_graph_df(spark, 6, 300, seed=7)
    edges = [(r.src, r.dst) for r in df.collect() if r.src != r.dst]
    adj = _sym(edges)
    g = Graph(df, num_partitions=4).symmetrized()
    src = min(adj)
    walkers = heat_kernel_rand_walk_params(t=3.0, K=10, n_walks=128, seed=5)
    # the pinned stream must produce a nontrivial length spread
    lens = {s for _, _, s in walkers}
    assert len(lens) > 3 and max(lens) <= 10
    want = _hk_rand_oracle(adj, src, walkers)
    got = {
        r["id"]: r["est"]
        for r in heat_kernel_rand(g, src, n_walks=128, seed=5).collect()
    }
    # n_walks = 2^7 → estimates are exact binary fractions: equality
    assert got == want


def test_heat_kernel_rand_degree0_source(spark):
    from ligra_spark.algorithms import heat_kernel_rand
    import pytest

    g = Graph(
        spark.createDataFrame([(1, 2)], "src long, dst long"),
        num_partitions=2,
    )
    with pytest.raises(ValueError):
        heat_kernel_rand(g, 99)
