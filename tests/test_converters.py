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


# ---- clique / MESH / weighted-hypergraph shims (utils/, r04) --------------

KONECT_TXT = "% bip\n% comment\n10 100\n20 100\n30 100\n10 200\n20 200\n"
# compressed: v {10,20,30}->{0,1,2}, h {100,200}->{0,1}
# h0 = {0,1,2}, h1 = {0,1}


def _clique_multiset(path):
    src, dst, w = parse_adjacency_file(path)
    if w is None:
        return sorted(zip(src.tolist(), dst.tolist()))
    return sorted(zip(src.tolist(), dst.tolist(), w.tolist()))


def test_konect_to_clique_unweighted(tmp_path):
    from ligra_spark.sources.converters import konect_to_clique

    p = tmp_path / "g.konect"
    p.write_text(KONECT_TXT)
    out = tmp_path / "g.adj"
    konect_to_clique(str(p), str(out))
    # h0 clique: 3 pairs both ways = 6; h1: 1 pair both ways = 2 (the
    # (0,1)/(1,0) edges appear TWICE — multi-edges kept, Triangle.C:30-79)
    want = sorted(
        [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1), (0, 1), (1, 0)]
    )
    assert _clique_multiset(str(out)) == want


def test_konect_to_clique_weighted_hashint_stream(tmp_path):
    from ligra_spark.sources.converters import konect_to_clique

    p = tmp_path / "g.konect"
    p.write_text(KONECT_TXT)
    out = tmp_path / "g.wadj"
    konect_to_clique(str(p), str(out), weighted=True)
    # maxEdgeLen = floor(log2(max(nv=3, nh=2))) = 1 -> every weight is
    # hashInt32(h) % 1 + 1 = 1 (KONECTtoClique.C:100-122 spec)
    rows = _clique_multiset(str(out))
    assert all(r[2] == 1 for r in rows) and len(rows) == 8


def test_community_to_clique(tmp_path):
    from ligra_spark.sources.converters import community_to_clique

    p = tmp_path / "g.cmty"
    p.write_text("# comment\n5 7 9\n5 7\n")
    out = tmp_path / "g.adj"
    community_to_clique(str(p), str(out))
    # v {5,7,9}->{0,1,2}; line0 = {0,1,2}, line1 = {0,1}
    want = sorted(
        [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1), (0, 1), (1, 0)]
    )
    assert _clique_multiset(str(out)) == want


def test_mesh_writers_file_order(tmp_path):
    from ligra_spark.sources.converters import community_to_mesh, konect_to_mesh

    p = tmp_path / "g.konect"
    p.write_text(KONECT_TXT)
    out = tmp_path / "g.mesh"
    konect_to_mesh(str(p), str(out))
    # HE = (h, v) pairs in file order, compressed ids (KONECTtoMESH.C)
    assert out.read_text() == "0,0\n0,1\n0,2\n1,0\n1,1\n"
    p2 = tmp_path / "g.cmty"
    p2.write_text("5 7 9\n5 7\n")
    out2 = tmp_path / "g2.mesh"
    community_to_mesh(str(p2), str(out2))
    assert out2.read_text() == "0,0\n0,1\n0,2\n1,0\n1,1\n"


def test_wgh_snap_to_adj(tmp_path):
    from ligra_spark.sources.converters import wgh_snap_to_adj

    p = tmp_path / "g.snap"
    p.write_text("# u v w\n0 1 5\n1 2 7\n2 2 9\n")
    out = tmp_path / "g.wadj"
    wgh_snap_to_adj(str(p), str(out))
    # ids NOT compressed (readWghSNAP), self-loop kept when not sym
    assert _clique_multiset(str(out)) == [(0, 1, 5), (1, 2, 7), (2, 2, 9)]
    out2 = tmp_path / "g2.wadj"
    wgh_snap_to_adj(str(p), str(out2), symmetrize=True)
    # self-loop dropped, reversed added (makeSymmetric)
    assert _clique_multiset(str(out2)) == [
        (0, 1, 5), (1, 0, 5), (1, 2, 7), (2, 1, 7)
    ]


def test_adjacency_hypergraph_roundtrip_and_weights(tmp_path):
    from ligra_spark.sources.converters import (
        adj_hypergraph_add_weights,
        parse_adjacency_hypergraph,
        write_adjacency_hypergraph,
    )

    # v0 in {h0,h1}, v1 in {h0}, v2 in {h1}; duals mirror
    srcv = np.array([0, 0, 1, 2]); dstv = np.array([0, 1, 0, 1])
    srch = np.array([0, 0, 1, 1]); dsth = np.array([0, 1, 0, 2])
    p = tmp_path / "g.hadj"
    write_adjacency_hypergraph(str(p), (srcv, dstv), (srch, dsth), 3, 2)
    g = parse_adjacency_hypergraph(str(p))
    assert g["nv"] == 3 and g["nh"] == 2 and g["wv"] is None
    assert sorted(zip(g["srcv"].tolist(), g["dstv"].tolist())) == sorted(
        zip(srcv.tolist(), dstv.tolist())
    )
    assert sorted(zip(g["srch"].tolist(), g["dsth"].tolist())) == sorted(
        zip(srch.tolist(), dsth.tolist())
    )
    out = tmp_path / "g.whadj"
    adj_hypergraph_add_weights(str(p), str(out))
    w = parse_adjacency_hypergraph(str(out))
    # L = floor(log2(max(3,2))) = 1 -> all weights 1, layout preserved
    assert w["wv"].tolist() == [1, 1, 1, 1]
    assert w["wh"].tolist() == [1, 1, 1, 1]
    assert out.read_text().startswith("WeightedAdjacencyHypergraph\n")


def test_adj_hypergraph_weight_stream_matches_spec(tmp_path):
    from ligra_spark.sources.converters import (
        adj_hypergraph_add_weights,
        parse_adjacency_hypergraph,
        write_adjacency_hypergraph,
    )

    # 5 hyperedges over 40 vertices so L = floor(log2(40)) = 5 and the
    # hashInt32 stream actually varies
    nh, nv = 5, 40
    srcv = np.arange(nv) % nv
    dstv = np.arange(nv) % nh
    srch = dstv.copy()
    dsth = srcv.copy()
    p = tmp_path / "b.hadj"
    write_adjacency_hypergraph(str(p), (srcv, dstv), (srch, dsth), nv, nh)
    out = tmp_path / "b.whadj"
    adj_hypergraph_add_weights(str(p), str(out))
    g = parse_adjacency_hypergraph(str(out))
    L = 5
    in_w = [(_ref_hash32(h) % L) + 1 for h in range(nh)]
    out_w = [(_ref_hash32(h + nh) % L) + 1 for h in range(nh)]
    # v->h incidences carry the target hyperedge's IN-weight, h->v the
    # source hyperedge's OUT-weight (adjHypergraphAddWeights.C:52-80)
    assert g["wv"].tolist() == [in_w[h] for h in g["dstv"].tolist()]
    assert g["wh"].tolist() == [out_w[h] for h in g["srch"].tolist()]


def test_hyper_adj_to_binary(tmp_path):
    from ligra_spark.sources.converters import (
        hyper_adj_to_binary,
        write_adjacency_hypergraph,
    )

    srcv = np.array([0, 0, 1, 2]); dstv = np.array([0, 1, 0, 1])
    srch = np.array([0, 0, 1, 1]); dsth = np.array([0, 1, 0, 2])
    p = tmp_path / "g.hadj"
    write_adjacency_hypergraph(str(p), (srcv, dstv), (srch, dsth), 3, 2)
    pre = str(tmp_path / "g")
    hyper_adj_to_binary(str(p), pre)
    assert (tmp_path / "g.config").read_text() == "3 4 2 4"
    assert np.fromfile(pre + ".vidx", dtype="<i8").tolist() == [0, 2, 3]
    assert np.fromfile(pre + ".vadj", dtype="<i8").tolist() == [0, 1, 0, 1]
    assert np.fromfile(pre + ".hidx", dtype="<i8").tolist() == [0, 2]
    assert np.fromfile(pre + ".hadj", dtype="<i8").tolist() == [0, 1, 0, 2]


def test_clique_expand_dataframe_matches_numpy(spark, tmp_path):
    from ligra_spark.sources.converters import clique_expand

    inc = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (0, 1), (1, 1)], "v long, h long"
    )
    got = sorted(
        (r.src, r.dst) for r in clique_expand(inc).collect()
    )
    want = sorted(
        [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1), (0, 1), (1, 0)]
    )
    assert got == want
    # weighted: L = floor(log2(max(3,2))) = 1 -> all weights 1
    gotw = sorted(
        (r.src, r.dst, r.w) for r in clique_expand(inc, weighted=True).collect()
    )
    assert [g[2] for g in gotw] == [1] * 8
