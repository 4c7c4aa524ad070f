"""Format converters / generators (utils/ tool family) tests."""

from __future__ import annotations

import numpy as np
import pytest

from ligra_spark.sources.adjacency import parse_adjacency_file, parse_binary_graph
from ligra_spark.sources.converters import (
    adj_add_weights,
    adj_to_binary,
    grid_graph,
    hash_int32,
    hash_int64,
    rand_hypergraph_incidence,
    rand_local_graph,
    read_community_hyperedges,
    read_konect_incidence,
    write_adjacency_graph,
)


def _ref_hash32(a: int) -> int:
    """Literal transcription of utils.h:366-374 in Python ints."""
    M = 0xFFFFFFFF
    a = ((a + 0x7ED55D16) + (a << 12)) & M
    a = ((a ^ 0xC761C23C) ^ (a >> 19)) & M
    a = ((a + 0x165667B1) + (a << 5)) & M
    a = ((a + 0xD3A2646C) ^ (a << 9)) & M
    a = ((a + 0xFD7046C5) + (a << 3)) & M
    a = ((a ^ 0xB55A4F09) ^ (a >> 16)) & M
    return a


def _ref_hash64(a: int) -> int:
    M = 0xFFFFFFFFFFFFFFFF
    a = ((a + 0x7ED55D166BEF7A1D) + (a << 12)) & M
    a = ((a ^ 0xC761C23C510FA2DD) ^ (a >> 9)) & M
    a = ((a + 0x165667B183A9C0E1) + (a << 59)) & M
    a = ((a + 0xD3A2646CAB3487E3) ^ (a << 49)) & M
    a = ((a + 0xFD7046C5EF9AB54C) + (a << 3)) & M
    a = ((a ^ 0xB55A4F090DD4A67B) ^ (a >> 32)) & M
    return a


def test_hash_int_parity_with_reference_spec():
    xs = np.array([0, 1, 2, 7, 1000003, 2**31 - 1], dtype=np.uint64)
    assert [int(v) for v in hash_int32(xs.astype(np.uint32))] == [
        _ref_hash32(int(x) & 0xFFFFFFFF) for x in xs
    ]
    assert [int(v) for v in hash_int64(xs)] == [_ref_hash64(int(x)) for x in xs]


EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 1)]


def test_adjacency_text_roundtrip(tmp_path):
    src = np.array([e[0] for e in EDGES])
    dst = np.array([e[1] for e in EDGES])
    p = tmp_path / "g.adj"
    write_adjacency_graph(str(p), src, dst)
    s2, d2, w2 = parse_adjacency_file(str(p))
    assert sorted(zip(s2, d2)) == sorted(EDGES)
    assert w2 is None


def test_adj_add_weights_matches_hash_formula(tmp_path):
    src = np.array([e[0] for e in EDGES])
    dst = np.array([e[1] for e in EDGES])
    p, pw = tmp_path / "g.adj", tmp_path / "g.wadj"
    write_adjacency_graph(str(p), src, dst)
    adj_add_weights(str(p), str(pw))
    s2, d2, w2 = parse_adjacency_file(str(pw))
    n = 4
    L = max(1, int(np.log2(n)))  # = 2 -> weights in [1, 2]
    want = [(_ref_hash32(i) % (2 * L)) // 2 + 1 for i in range(len(EDGES))]
    assert list(w2.astype(int)) == want
    assert set(w2.astype(int)) <= set(range(1, L + 1))


def test_adj_to_binary_roundtrip(tmp_path):
    src = np.array([e[0] for e in EDGES])
    dst = np.array([e[1] for e in EDGES])
    p = tmp_path / "g.adj"
    write_adjacency_graph(str(p), src, dst)
    adj_to_binary(str(p), str(tmp_path / "bin"))
    s2, d2, w2 = parse_binary_graph(str(tmp_path / "bin"))
    assert sorted(zip(s2, d2)) == sorted(EDGES)


def test_read_konect_incidence(spark, tmp_path):
    p = tmp_path / "k.tsv"
    p.write_text("% bip\n% meta\n10 100\n20 100\n10 200\n30 300\n")
    inc = read_konect_incidence(spark, str(p))
    rows = {(r["v"], r["h"]) for r in inc.collect()}
    # ids compressed dense ascending: 10,20,30 -> 0,1,2 ; 100,200,300 -> 0,1,2
    assert rows == {(0, 0), (1, 0), (0, 1), (2, 2)}


def test_read_community_hyperedges(spark, tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("# communities\n5 7 9\n7 11\n9\n")
    inc = read_community_hyperedges(spark, str(p))
    rows = {(r["v"], r["h"]) for r in inc.collect()}
    # members 5,7,9,11 -> 0,1,2,3 ; lines -> h 0,1,2
    assert rows == {(0, 0), (1, 0), (2, 0), (1, 1), (3, 1), (2, 2)}


def test_grid_graph_2d_torus(spark):
    e = grid_graph(spark, 16, dims=2)
    rows = [(r["src"], r["dst"]) for r in e.collect()]
    assert len(rows) == 2 * 16  # 2 edges per cell on a 4x4 torus
    # torus: every vertex has out-degree 2 and in-degree 2
    from collections import Counter

    outs = Counter(s for s, _ in rows)
    ins = Counter(d for _, d in rows)
    assert set(outs.values()) == {2} and set(ins.values()) == {2}
    # wraparound: cell 3 (row 0, col 3) links to col 0 -> (3, 0)
    assert (3, 0) in rows and (12, 0) in rows


def test_rand_hypergraph_matches_hash_stream(spark):
    nv, nh, card = 50, 8, 6
    inc = rand_hypergraph_incidence(spark, nv, nh, card)
    rows = {(r["v"], r["h"]) for r in inc.collect()}
    want = set()
    for i in range(nh):
        for j in range(card):
            off = i * card + j
            want.add((_ref_hash32(off) % nv, i))
    assert rows == want


@pytest.mark.parametrize("dim", [0, 2])
def test_rand_local_graph_stream_parity(spark, dim):
    n, m = 40, 120
    e = rand_local_graph(spark, n, m, dim=dim)
    rows = sorted((r["src"], r["dst"]) for r in e.collect())

    def ref_edge(k):
        degree = m / n
        i = int(k / degree)
        h = k & 0xFFFFFFFF
        if dim == 0:
            while True:
                h = _ref_hash32(h)
                j = h % n
                if j != i:
                    return i, j
        pw = dim + 2
        while True:
            while True:
                h = _ref_hash32(h)
                if h % 1000003 >= 500001:
                    break
                pw += dim
            h = _ref_hash32(h)
            j = (i + h % (1 << min(pw, 62))) % n
            if j != i:
                return i, j

    want = sorted(ref_edge(k) for k in range(m))
    assert rows == want
    assert all(s != d for s, d in rows)
