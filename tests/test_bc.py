"""Betweenness (Brandes single-source dependencies) parity vs a pure-
Python Brandes oracle."""

from __future__ import annotations

from collections import defaultdict, deque

from conftest import CHAIN_64, TWO_COMPONENTS
from ligra_spark.algorithms.bc import betweenness_from_source


def brandes_oracle(edges, source):
    """σ and δ for a single source over the directed graph (Brandes
    2001), the math BC.C implements."""
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    sigma = defaultdict(float)
    sigma[source] = 1.0
    dist = {source: 0}
    order = [source]
    q = deque([source])
    while q:
        v = q.popleft()
        for w in adj[v]:
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
                order.append(w)
            if dist[w] == dist[v] + 1:
                sigma[w] += sigma[v]
    delta = defaultdict(float)
    for w in reversed(order):
        for x in adj[w]:
            if dist.get(x) == dist[w] + 1:
                delta[w] += sigma[w] / sigma[x] * (1.0 + delta[x])
    return {v: (sigma[v], delta[v]) for v in dist}


def _check(mk_graph, edges, source):
    g = mk_graph(edges)
    got = {
        r["id"]: (r["paths"], r["dep"])
        for r in betweenness_from_source(g, source).collect()
    }
    want = brandes_oracle(edges, source)
    assert set(got) == set(want)
    for v, (sg, dl) in want.items():
        assert abs(got[v][0] - sg) < 1e-9, f"sigma {v}"
        assert abs(got[v][1] - dl) < 1e-9, f"delta {v}"
    g.unpersist()


def test_bc_chain(mk_graph):
    _check(mk_graph, [(i, i + 1) for i in range(12)], 0)


def test_bc_diamond(mk_graph):
    # two shortest paths 0→3: σ[3]=2; middle vertices split dependency
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    _check(mk_graph, edges, 0)


def test_bc_clique_bridge(mk_graph):
    _check(mk_graph, TWO_COMPONENTS + [(0, 10)], 1)
