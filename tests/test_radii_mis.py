"""Radii (k-BFS bitmask OR-propagation) and MIS parity tests."""

from __future__ import annotations

from collections import deque

from conftest import CHAIN_64, TWO_COMPONENTS
from ligra_spark.algorithms.mis import maximal_independent_set
from ligra_spark.algorithms.radii import radii


def _ecc_oracle(edges, vertices):
    """True eccentricity per vertex (undirected), via BFS from every
    vertex — what Radii converges to when every vertex is sampled."""
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    ecc = {}
    for v in vertices:
        dist = {v: 0}
        q = deque([v])
        while q:
            x = q.popleft()
            for y in adj.get(x, ()):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for u, d in dist.items():
            ecc[u] = max(ecc.get(u, 0), d)
    return ecc


def test_radii_full_sample_equals_eccentricity(mk_graph):
    edges = [(i, i + 1) for i in range(10)]  # path of 11 vertices
    g = mk_graph(edges)
    got = {r["id"]: r["radius"] for r in radii(g, k=64).collect()}
    want = _ecc_oracle(edges, range(11))
    assert got == want
    g.unpersist()


def test_radii_two_cliques(mk_graph):
    g = mk_graph(TWO_COMPONENTS)
    got = {r["id"]: r["radius"] for r in radii(g, k=64).collect()}
    want = _ecc_oracle(TWO_COMPONENTS, set(v for e in TWO_COMPONENTS for v in e))
    assert got == want  # all 1 within each clique
    g.unpersist()


def _check_mis(edges, rows):
    in_set = {r["id"] for r in rows if r["in_set"]}
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    # independence (checkMis, MIS.C:38-70)
    for v in in_set:
        assert not (adj.get(v, set()) & in_set), f"{v} has in-set neighbor"
    # maximality: every non-member has an in-set neighbor
    for r in rows:
        if not r["in_set"]:
            assert adj.get(r["id"], set()) & in_set, f"{r['id']} addable"


def test_mis_chain(mk_graph):
    g = mk_graph(CHAIN_64)
    rows = maximal_independent_set(g).collect()
    _check_mis(CHAIN_64, rows)
    # id-priority determinism: vertex 0 always wins
    assert {r["id"]: r["in_set"] for r in rows}[0] is True
    g.unpersist()


def test_mis_cliques(mk_graph):
    edges = TWO_COMPONENTS + [(0, 10)]
    g = mk_graph(edges)
    rows = maximal_independent_set(g).collect()
    _check_mis(edges, rows)
    # one vertex per clique: exactly 2 members
    assert sum(r["in_set"] for r in rows) == 2
    g.unpersist()
