"""Collaborative filtering vs a numpy batch-GD oracle (CF.C semantics)."""

from __future__ import annotations

import numpy as np

from ligra_spark.algorithms import cf
from ligra_spark.graph import Graph

# small bipartite ratings graph: users 0-3, items 10-14
RATINGS = [
    (0, 10, 4.0), (0, 11, 2.0), (1, 10, 5.0), (1, 12, 3.0),
    (2, 11, 1.0), (2, 13, 4.0), (3, 12, 2.0), (3, 14, 5.0), (0, 14, 3.0),
]


def _oracle(edges, k, iters, step, lam, ids):
    idx = {v: i for i, v in enumerate(ids)}
    lat = np.full((len(ids), k), 0.5)
    sym = edges + [(d, s, w) for s, d, w in edges]
    for _ in range(iters):
        err = np.zeros_like(lat)
        for s, d, w in sym:
            e = w - lat[idx[d]] @ lat[idx[s]]
            err[idx[d]] += lat[idx[s]] * e
        lat = lat + step * (-lam * lat + err)
    return {v: lat[idx[v]] for v in ids}


def test_cf_matches_numpy_oracle(spark):
    g = Graph(
        spark.createDataFrame(RATINGS, "src long, dst long, w double"),
        num_partitions=4,
    )
    ids = sorted({x for s, d, _ in RATINGS for x in (s, d)})
    k, iters, step, lam = 8, 5, 0.01, 0.001
    want = _oracle(RATINGS, k, iters, step, lam, ids)
    got = {
        r["id"]: np.array(r["latent"])
        for r in cf(g, k=k, num_iters=iters, step=step, lam=lam).collect()
    }
    assert set(got) == set(want)
    for v in want:
        np.testing.assert_allclose(got[v], want[v], rtol=1e-9, atol=1e-12)
    g.unpersist()


def test_cf_rand_init_deterministic(spark):
    g = Graph(
        spark.createDataFrame(RATINGS, "src long, dst long, w double"),
        num_partitions=4,
    )
    a = {r["id"]: tuple(r["latent"]) for r in cf(g, k=4, num_iters=2, rand_init=True).collect()}
    b = {r["id"]: tuple(r["latent"]) for r in cf(g, k=4, num_iters=2, rand_init=True).collect()}
    assert a == b
    # distinct vertices get distinct init vectors
    assert len(set(a.values())) == len(a)
    g.unpersist()
