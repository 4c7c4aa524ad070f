"""Bucketed set cover vs an exact Python replay of the same rounds."""

from __future__ import annotations

import math

import numpy as np

from ligra_spark.algorithms import set_cover
from ligra_spark.graph import Graph


def _oracle(edges, epsilon=0.01):
    """Sequential replay of SetCover.C's bucketed rounds (decreasing
    log-degree buckets, min-id claims, (1+eps)^(cur-1) win threshold)."""
    x = 1.0 / math.log(1.0 + epsilon)
    nbrs = {}
    for s, e in edges:
        nbrs.setdefault(s, set()).add(e)
    bucket = {s: math.floor(x * math.log(len(es))) for s, es in nbrs.items()}
    covered, cover = set(), set()
    while bucket:
        cur = max(bucket.values())
        active = sorted(s for s, b in bucket.items() if b == cur)
        deg = {s: len(nbrs[s] - covered) for s in active}
        threshold = math.ceil((1.0 + epsilon) ** cur)
        still = [s for s in active if deg[s] >= threshold]
        claims = {}
        for s in still:
            for e in nbrs[s] - covered:
                claims[e] = min(claims.get(e, s), s)
        low = max(math.ceil((1.0 + epsilon) ** (cur - 1)), 1)
        wins = {}
        for e, s in claims.items():
            wins.setdefault(s, set()).add(e)
        for s, es in wins.items():
            if len(es) >= low:
                cover.add(s)
                covered |= es
        for s in active:
            if s in cover:
                del bucket[s]
            else:
                # the reference rebuckets by the PRE-claim packed degree
                # (D[v] from step 1, SetCover.C:80-89) — elements covered
                # by this round's winners are only noticed when the set
                # is next processed
                d = deg[s]
                if d > 0:
                    bucket[s] = math.floor(x * math.log(d))
                else:
                    del bucket[s]
    return cover, covered


def _edges(rng, n_sets=12, n_elms=40):
    edges = set()
    for s in range(n_sets):
        size = int(rng.integers(1, 9))
        for e in rng.choice(n_elms, size=size, replace=False):
            edges.add((s, 100 + int(e)))
    return sorted(edges)


def test_set_cover_matches_python_replay(spark):
    rng = np.random.default_rng(11)
    edges = _edges(rng)
    g = Graph(spark.createDataFrame(edges, "src long, dst long"), num_partitions=4)
    got = {r["set_id"] for r in set_cover(g).collect()}
    want, covered = _oracle(edges)
    assert got == want
    # validity: the chosen sets cover every coverable element
    covered_by_got = {e for s, e in edges if s in got}
    assert covered_by_got == {e for _, e in edges}
    g.unpersist()


def test_set_cover_star(spark):
    # one big set covers everything; singles should lose
    edges = [(0, 100 + i) for i in range(8)] + [(i, 100 + i - 1) for i in range(1, 9)]
    g = Graph(spark.createDataFrame(edges, "src long, dst long"), num_partitions=2)
    got = {r["set_id"] for r in set_cover(g).collect()}
    want, _ = _oracle(edges)
    assert got == want
    assert 0 in got
    g.unpersist()
