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


def _sampled_ecc_oracle(edges, vertices, k, rank):
    """Replay of kBFS-Ecc's sampled eccentricity: per component, take
    the k lowest-(rank, id) vertices as sources; ecc[v] = max dist to a
    source in v's component (kBFS-1Phase-Ecc.C:53-84)."""
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    # components
    comp = {}
    for v in vertices:
        if v in comp:
            continue
        comp[v] = v
        q = deque([v])
        while q:
            x = q.popleft()
            for y in adj.get(x, ()):
                if y not in comp:
                    comp[y] = v
                    q.append(y)
    by_comp = {}
    for v, c in comp.items():
        by_comp.setdefault(c, []).append(v)
    ecc = {v: 0 for v in vertices}
    for members in by_comp.values():
        srcs = sorted(members, key=lambda v: (rank(v), v))[:k]
        for s in srcs:
            dist = {s: 0}
            q = deque([s])
            while q:
                x = q.popleft()
                for y in adj.get(x, ()):
                    if y not in dist:
                        dist[y] = dist[x] + 1
                        q.append(y)
            for u, d in dist.items():
                ecc[u] = max(ecc[u], d)
    return ecc


def test_kbfs_sampled_1phase_matches_replay(mk_graph):
    from pyspark.sql import functions as F

    from ligra_spark.algorithms.radii import kbfs_sampled_ecc

    edges = CHAIN_64 + [(s + 100, d + 100) for s, d in TWO_COMPONENTS]
    g = mk_graph(edges)
    rank = lambda v: (v * 31 + 7) % 101  # noqa: E731
    got = {
        r["id"]: r["ecc"]
        for r in kbfs_sampled_ecc(
            g, k=4, phases=1,
            sample_rank=(F.col("id") * 31 + 7) % 101,
        ).collect()
    }
    verts = set(v for e in edges for v in e)
    want = _sampled_ecc_oracle(edges, verts, 4, rank)
    assert got == want
    g.unpersist()


def test_kbfs_sampled_2phase_dominates_phase1_and_bounds_true_ecc(mk_graph):
    from pyspark.sql import functions as F

    from ligra_spark.algorithms.radii import kbfs_sampled_ecc

    edges = CHAIN_64
    g = mk_graph(edges)
    kw = dict(k=4, fringe_min_size=0, sample_rank=(F.col("id") * 31 + 7) % 101)
    e1 = {r["id"]: r["ecc"] for r in kbfs_sampled_ecc(g, phases=1, **kw).collect()}
    e2 = {r["id"]: r["ecc"] for r in kbfs_sampled_ecc(g, phases=2, **kw).collect()}
    true_ecc = _ecc_oracle(edges, range(64))
    for v in e1:
        assert e1[v] <= e2[v] <= true_ecc[v]
    # phase 2 reseeds from the fringe: the chain's far endpoints become
    # sources, so every vertex reaches its exact eccentricity
    assert e2 == true_ecc
    g.unpersist()
