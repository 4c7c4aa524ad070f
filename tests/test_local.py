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
