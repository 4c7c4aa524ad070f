"""Graph format converters and generators — the ``utils/`` tool family.

The reference ships a set of small format-conversion and synthetic-graph
binaries (utils/Makefile): adjGraphAddWeights.C, adjToBinary.C,
SNAPtoAdj.C, KONECTtoHyperAdj.C, communityToHyperAdj.C, gridGraph.C,
randHypergraph.C, randLocalGraph.C. Re-expressed here Spark-first:

- file-to-file converters over the small text formats stay numpy-side
  (they exist to load golden fixtures; production IO is parquet), and
- generators and large-input readers are DataFrame-native so they run
  distributed at any scale (line-parallel text scan / ``mapInPandas``
  over ranges — no driver materialization, no per-row Python).

Determinism matches the reference where it is deterministic: weights
and random choices come from Ligra's ``hashInt`` (utils.h:366-384),
replicated bit-exactly in ``hash_int32`` / ``hash_int64``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ligra_spark.sources.adjacency import (
    parse_adjacency_file,
    write_binary_graph,
)

__all__ = [
    "hash_int32",
    "hash_int64",
    "write_adjacency_graph",
    "adj_add_weights",
    "adj_to_binary",
    "read_konect_incidence",
    "read_community_hyperedges",
    "grid_graph",
    "rand_hypergraph_incidence",
    "rand_local_graph",
    "clique_expand",
    "konect_to_clique",
    "community_to_clique",
    "konect_to_mesh",
    "community_to_mesh",
    "wgh_snap_to_adj",
    "write_adjacency_hypergraph",
    "parse_adjacency_hypergraph",
    "adj_hypergraph_add_weights",
    "hyper_adj_to_binary",
]


def hash_int32(a: np.ndarray) -> np.ndarray:
    """Ligra's 32-bit ``hashInt`` (utils.h:366-374), vectorized with
    uint32 wraparound — the deterministic stream behind the reference's
    generators and weight assignment."""
    a = np.asarray(a, dtype=np.uint32)
    with np.errstate(over="ignore"):
        a = (a + np.uint32(0x7ED55D16)) + (a << np.uint32(12))
        a = (a ^ np.uint32(0xC761C23C)) ^ (a >> np.uint32(19))
        a = (a + np.uint32(0x165667B1)) + (a << np.uint32(5))
        a = (a + np.uint32(0xD3A2646C)) ^ (a << np.uint32(9))
        a = (a + np.uint32(0xFD7046C5)) + (a << np.uint32(3))
        a = (a ^ np.uint32(0xB55A4F09)) ^ (a >> np.uint32(16))
    return a


def hash_int64(a: np.ndarray) -> np.ndarray:
    """Ligra's 64-bit ``hashInt`` (utils.h:376-384), uint64 wraparound."""
    a = np.asarray(a, dtype=np.uint64)
    with np.errstate(over="ignore"):
        a = (a + np.uint64(0x7ED55D166BEF7A1D)) + (a << np.uint64(12))
        a = (a ^ np.uint64(0xC761C23C510FA2DD)) ^ (a >> np.uint64(9))
        a = (a + np.uint64(0x165667B183A9C0E1)) + (a << np.uint64(59))
        a = (a + np.uint64(0xD3A2646CAB3487E3)) ^ (a << np.uint64(49))
        a = (a + np.uint64(0xFD7046C5EF9AB54C)) + (a << np.uint64(3))
        a = (a ^ np.uint64(0xB55A4F090DD4A67B)) ^ (a >> np.uint64(32))
    return a


def write_adjacency_graph(path: str, src, dst, w=None, n: int | None = None) -> None:
    """Write the PBBS AdjacencyGraph text format (graphIO.h
    ``writeGraphToFile``: magic, n, m, n CSR offsets, m targets
    [, m weights]) — the output side of SNAPtoAdj / KONECTto* /
    communityTo*. Edges are CSR-ified by (src, dst) sort."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    if w is not None:
        w = np.asarray(w)[order]
    if n is None:
        n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1) if len(src) else 0
    m = len(src)
    counts = np.bincount(src, minlength=n)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    with open(path, "w") as f:
        f.write("WeightedAdjacencyGraph\n" if w is not None else "AdjacencyGraph\n")
        f.write(f"{n}\n{m}\n")
        np.savetxt(f, offsets, fmt="%d")
        np.savetxt(f, dst, fmt="%d")
        if w is not None:
            fmt = "%d" if np.issubdtype(w.dtype, np.integer) else "%g"
            np.savetxt(f, w, fmt=fmt)


def adj_add_weights(in_path: str, out_path: str) -> None:
    """adjGraphAddWeights.C: add a deterministic integer weight in
    ``[1, log2(n)]`` to each edge — ``Choices[hashInt(i) % (2*L)]``
    with ``Choices[2k] = Choices[2k+1] = k+1`` (adjGraphAddWeights.C:
    44-56), i.e. weight = hashInt32(edge index) % (2*L) // 2 + 1."""
    src, dst, _ = parse_adjacency_file(in_path)
    n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1) if len(src) else 1
    max_len = max(1, int(np.log2(n)))
    idx = hash_int32(np.arange(len(src), dtype=np.uint32)) % np.uint32(2 * max_len)
    w = (idx // np.uint32(2) + np.uint32(1)).astype(np.int64)
    write_adjacency_graph(out_path, src, dst, w, n=n)


def adj_to_binary(in_path: str, out_prefix: str) -> None:
    """adjToBinary.C: AdjacencyGraph text → ``.config/.idx/.adj``
    binary (IO.h:318-467 reads the result)."""
    src, dst, w = parse_adjacency_file(in_path)
    n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1) if len(src) else 0
    write_binary_graph(out_prefix, src, dst, w, n=n)


def _dense_rank(df: DataFrame, col: str, out: str) -> DataFrame:
    """(col, out) mapping: distinct values of ``col`` → dense ids
    0..k-1 in ascending value order — the reference's ID compression
    (graphIO.h:1031-1043, a plusScan over the presence bitmap, which
    assigns ranks in ascending id order). Implemented as range-sort +
    ``zipWithIndex`` (per-partition offsets from one count pass — the
    distributed plusScan), NOT a global window, which would serialize
    the rank assignment into a single task at scale."""
    spark = df.sparkSession
    vals = df.select(col).distinct().orderBy(col)
    rdd = vals.rdd.map(lambda r: r[0]).zipWithIndex()
    return spark.createDataFrame(rdd, f"{col} long, {out} long")


def read_konect_incidence(
    spark: SparkSession, path: str, weighted: bool = False
) -> DataFrame:
    """KONECT bipartite file → hypergraph incidence ``(v, h [, w])``
    with both sides ID-compressed to dense ranges, as
    KONECTtoHyperAdj.C / graphIO.h:998-1060 (readKONECT) does.

    Format: ``%``-comment header lines, then ``v h [w]`` per line.
    Line-parallel distributed scan; the only shuffles are the two
    dictionary-encodes of the distinct id sets."""
    lines = spark.read.text(path).where(
        ~F.col("value").startswith("%") & (F.trim("value") != "")
    )
    toks = F.split(F.trim(F.regexp_replace("value", r"\s+", " ")), " ")
    cols = [
        toks.getItem(0).cast("long").alias("rv"),
        toks.getItem(1).cast("long").alias("rh"),
    ]
    if weighted:
        cols.append(toks.getItem(2).cast("double").alias("w"))
    raw = lines.select(*cols)
    vmap = _dense_rank(raw, "rv", "v")
    hmap = _dense_rank(raw, "rh", "h")
    out = raw.join(vmap, "rv").join(hmap, "rh")
    keep = ["v", "h"] + (["w"] if weighted else [])
    return out.select(*keep)


def read_community_hyperedges(spark: SparkSession, path: str) -> DataFrame:
    """SNAP community file → incidence ``(v, h)``: one community
    (hyperedge) per line, members whitespace-separated, ``#`` comment
    header (communityToHyperAdj.C / graphIO.h:892-942 readHyperedges —
    hyperedge id = line number, member ids compressed dense).

    Line numbering uses ``zipWithIndex`` — one extra pass to count
    per-partition lines, then pure local index arithmetic."""
    rdd = (
        spark.read.text(path)
        .rdd.map(lambda r: r.value)
        .zipWithIndex()
    )
    lines = spark.createDataFrame(rdd, "value string, line long").where(
        ~F.col("value").startswith("#") & (F.trim("value") != "")
    )
    # hyperedge ids: dense over non-comment lines, in file order
    hmap = _dense_rank(lines, "line", "h")
    members = (
        lines.join(hmap, "line")
        .select(
            "h",
            F.explode(
                F.split(F.trim(F.regexp_replace("value", r"\s+", " ")), " ")
            ).alias("tok"),
        )
        .select("h", F.col("tok").cast("long").alias("rv"))
    )
    vmap = _dense_rank(members, "rv", "v")
    return members.join(vmap, "rv").select("v", "h")


# --------------------------------------------------------------------------
# clique / MESH / weighted-hypergraph converter shims (utils/, r04)
# --------------------------------------------------------------------------


def _parse_konect_file(path: str) -> tuple[np.ndarray, np.ndarray, int, int]:
    """KONECT bipartite text → ``(v, h, nv, nh)`` incidence arrays in
    FILE ORDER, both sides ID-compressed to dense ascending-id ranks —
    graphIO.h:998-1060 readKONECT's presence-bitmap plusScan."""
    rv, rh = [], []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            parts = line.split()
            rv.append(int(parts[0]))
            rh.append(int(parts[1]))
    rv = np.asarray(rv, dtype=np.int64)
    rh = np.asarray(rh, dtype=np.int64)
    uv, v = np.unique(rv, return_inverse=True)
    uh, h = np.unique(rh, return_inverse=True)
    return v.astype(np.int64), h.astype(np.int64), len(uv), len(uh)


def _parse_community_file(path: str) -> tuple[np.ndarray, np.ndarray, int, int]:
    """SNAP community text → ``(v, h, nv, nh)``: hyperedge id = data
    line index, members ID-compressed dense (graphIO.h:892-942
    readHyperedges)."""
    vs, hs = [], []
    h = 0
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            for tok in line.split():
                vs.append(int(tok))
                hs.append(h)
            h += 1
    rv = np.asarray(vs, dtype=np.int64)
    uv, v = np.unique(rv, return_inverse=True)
    return v.astype(np.int64), np.asarray(hs, dtype=np.int64), len(uv), h


def _clique_edges_np(
    v: np.ndarray, h: np.ndarray, nv: int, nh: int, weighted: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Expand each hyperedge into a directed clique over its members —
    BOTH directions per unordered pair, multi-edges across hyperedges
    kept (KONECTtoClique.C cliquesFromHyperedges:30-79 emits (j,k) and
    (k,j) per pair and never dedupes). Weighted form stamps every edge
    of hyperedge i with ``(hashInt32(i) % floor(log2(max(nv,nh)))) + 1``
    (wghCliquesFromHyperedges:100-122, Choices[k]=k+1)."""
    order = np.argsort(h, kind="stable")
    v, h = v[order], h[order]
    srcs, dsts, ws = [], [], []
    if weighted:
        max_len = max(1, int(np.log2(max(nv, nh))))
        out_w = (
            hash_int32(np.arange(nh, dtype=np.uint32)) % np.uint32(max_len)
            + np.uint32(1)
        ).astype(np.int64)
    bounds = np.searchsorted(h, np.arange(nh + 1))
    for i in range(nh):
        mem = v[bounds[i] : bounds[i + 1]]
        ln = len(mem)
        if ln < 2:
            continue
        a, b = np.triu_indices(ln, k=1)
        srcs.append(np.concatenate([mem[a], mem[b]]))
        dsts.append(np.concatenate([mem[b], mem[a]]))
        if weighted:
            ws.append(np.full(2 * len(a), out_w[i], dtype=np.int64))
    src = np.concatenate(srcs) if srcs else np.empty(0, dtype=np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, dtype=np.int64)
    w = (
        (np.concatenate(ws) if ws else np.empty(0, dtype=np.int64))
        if weighted
        else None
    )
    return src, dst, w


def clique_expand(inc: DataFrame, weighted: bool = False) -> DataFrame:
    """DataFrame-native clique expansion of an incidence ``(v, h)`` —
    the scale path of KONECTtoClique/communityToClique: a self-join on
    the hyperedge id emits every ordered member pair (both directions),
    one shuffle keyed by ``h``. ``weighted`` stamps the reference's
    per-hyperedge hashInt32 weight (computed by an Arrow kernel over
    the distinct hyperedge ids — never per-row Python)."""
    a = inc.select(F.col("h"), F.col("v").alias("src"))
    b = inc.select(F.col("h"), F.col("v").alias("dst"))
    pairs = a.join(b, "h").where(F.col("src") != F.col("dst"))
    if not weighted:
        return pairs.select("src", "dst")
    stats = inc.agg(
        (F.max("v") + 1).alias("nv"), (F.max("h") + 1).alias("nh")
    ).first()
    max_len = max(1, int(np.log2(max(int(stats["nv"]), int(stats["nh"])))))

    def wgh(batches):
        for pdf in batches:
            hh = pdf["h"].to_numpy(np.int64)
            w = (
                hash_int32(hh.astype(np.uint32)) % np.uint32(max_len)
                + np.uint32(1)
            ).astype(np.int64)
            yield pd.DataFrame({"h": hh, "w": w})

    hw = inc.select("h").distinct().mapInPandas(wgh, "h long, w long")
    return pairs.join(hw, "h").select("src", "dst", "w")


def konect_to_clique(in_path: str, out_path: str, weighted: bool = False) -> None:
    """KONECTtoClique.C: KONECT bipartite file → AdjacencyGraph of the
    clique expansion (``-w`` → WeightedAdjacencyGraph with the
    per-hyperedge hashInt32 weight stream). Neighbor lists are written
    dst-sorted (canonical CSR; the reference preserves generation
    order — same edge multiset)."""
    v, h, nv, nh = _parse_konect_file(in_path)
    src, dst, w = _clique_edges_np(v, h, nv, nh, weighted)
    write_adjacency_graph(out_path, src, dst, w, n=nv)


def community_to_clique(in_path: str, out_path: str, weighted: bool = False) -> None:
    """communityToClique.C: SNAP community file → AdjacencyGraph of the
    clique expansion (see :func:`konect_to_clique`)."""
    v, h, nv, nh = _parse_community_file(in_path)
    src, dst, w = _clique_edges_np(v, h, nv, nh, weighted)
    write_adjacency_graph(out_path, src, dst, w, n=nv)


def konect_to_mesh(in_path: str, out_path: str) -> None:
    """KONECTtoMESH.C: KONECT bipartite file → MESH CSV — one
    ``h,v`` line per incidence in file order, ids compressed
    (the reference writes the HE = (hyperedge, vertex) pair array,
    KONECTtoMESH.C:110-128)."""
    v, h, _, _ = _parse_konect_file(in_path)
    with open(out_path, "w") as f:
        for hi, vi in zip(h, v):
            f.write(f"{hi},{vi}\n")


def community_to_mesh(in_path: str, out_path: str) -> None:
    """communityToMESH.C: SNAP community file → MESH CSV (one ``h,v``
    incidence line per member, file order)."""
    v, h, _, _ = _parse_community_file(in_path)
    with open(out_path, "w") as f:
        for hi, vi in zip(h, v):
            f.write(f"{hi},{vi}\n")


def wgh_snap_to_adj(in_path: str, out_path: str, symmetrize: bool = False) -> None:
    """wghSNAPtoAdj.C: 3-column SNAP edge list (``u v w``, ``#``
    comments) → WeightedAdjacencyGraph. Ids are NOT compressed
    (n = max id + 1, readWghSNAP graphIO.h:859-890); ``symmetrize``
    drops self-loops, adds reversed edges, and dedupes full (u,v,w)
    rows (makeSymmetric graphIO.h:318-334)."""
    us, vs, ws = [], [], []
    with open(in_path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            us.append(int(parts[0]))
            vs.append(int(parts[1]))
            ws.append(int(parts[2]))
    u = np.asarray(us, dtype=np.int64)
    v = np.asarray(vs, dtype=np.int64)
    w = np.asarray(ws, dtype=np.int64)
    n = int(max(u.max(initial=-1), v.max(initial=-1)) + 1) if len(u) else 0
    if symmetrize:
        keep = u != v
        u, v, w = u[keep], v[keep], w[keep]
        u2 = np.concatenate([u, v])
        v2 = np.concatenate([v, u])
        w2 = np.concatenate([w, w])
        trip = np.unique(np.stack([u2, v2, w2], axis=1), axis=0)
        u, v, w = trip[:, 0], trip[:, 1], trip[:, 2]
    write_adjacency_graph(out_path, u, v, w, n=n)


def write_adjacency_hypergraph(
    path: str,
    v_inc: tuple[np.ndarray, np.ndarray],
    h_inc: tuple[np.ndarray, np.ndarray],
    nv: int,
    nh: int,
    wv: np.ndarray | None = None,
    wh: np.ndarray | None = None,
) -> None:
    """Write the AdjacencyHypergraph text format (graphIO.h
    writeHypergraphToFile:745-767 / writeWghHypergraphToFile:795-823):
    magic, nv, mv, nh, mh, nv vertex CSR offsets, mv hyperedge targets
    [, mv weights], nh hyperedge CSR offsets, mh vertex targets
    [, mh weights]. ``v_inc`` = (src_vertex, dst_hyperedge) pairs,
    ``h_inc`` = (src_hyperedge, dst_vertex) pairs; each side is
    CSR-ified by stable source sort (preserving the caller's
    within-source order, like the reference's stable radix sort)."""
    weighted = wv is not None

    def csr(src, dst, w, n):
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        w = np.asarray(w, dtype=np.int64)[order] if w is not None else None
        counts = np.bincount(src, minlength=n)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        return offsets, dst, w

    off_v, tgt_v, w_v = csr(v_inc[0], v_inc[1], wv, nv)
    off_h, tgt_h, w_h = csr(h_inc[0], h_inc[1], wh, nh)
    with open(path, "w") as f:
        f.write(
            "WeightedAdjacencyHypergraph\n" if weighted else "AdjacencyHypergraph\n"
        )
        f.write(f"{nv}\n{len(tgt_v)}\n{nh}\n{len(tgt_h)}\n")
        for arr in (
            (off_v, tgt_v, w_v, off_h, tgt_h, w_h)
            if weighted
            else (off_v, tgt_v, off_h, tgt_h)
        ):
            np.savetxt(f, arr, fmt="%d")


def parse_adjacency_hypergraph(
    path: str,
) -> dict:
    """Parse AdjacencyHypergraph / WeightedAdjacencyHypergraph text →
    dict with ``nv nh srcv dstv srch dsth [wv wh]`` arrays
    (hypergraphIO.h:40-120 readHypergraphFromFile layout)."""
    with open(path) as f:
        magic = f.readline().strip()
        weighted = magic == "WeightedAdjacencyHypergraph"
        if not weighted and magic != "AdjacencyHypergraph":
            raise ValueError(f"bad hypergraph magic: {magic}")
        nums = np.loadtxt(f, dtype=np.int64, ndmin=1)
    nv, mv, nh, mh = (int(x) for x in nums[:4])
    pos = 4
    off_v = nums[pos : pos + nv]; pos += nv
    tgt_v = nums[pos : pos + mv]; pos += mv
    wv = None
    if weighted:
        wv = nums[pos : pos + mv]; pos += mv
    off_h = nums[pos : pos + nh]; pos += nh
    tgt_h = nums[pos : pos + mh]; pos += mh
    wh = nums[pos : pos + mh] if weighted else None

    def expand(off, m, n):
        deg = np.diff(np.concatenate([off, [m]]))
        return np.repeat(np.arange(n, dtype=np.int64), deg)

    return dict(
        nv=nv, nh=nh,
        srcv=expand(off_v, mv, nv), dstv=tgt_v,
        srch=expand(off_h, mh, nh), dsth=tgt_h,
        wv=wv, wh=wh,
    )


def adj_hypergraph_add_weights(in_path: str, out_path: str) -> None:
    """adjHypergraphAddWeights.C: stamp deterministic weights onto an
    AdjacencyHypergraph — every vertex→h incidence gets the
    hyperedge's IN-weight ``(hashInt32(h) % L) + 1`` and every
    h→vertex incidence the hyperedge's OUT-weight
    ``(hashInt32(h + nh) % L) + 1``, L = floor(log2(max(nv, nh)))
    (adjHypergraphAddWeights.C:40-80, Choices[k]=k+1)."""
    g = parse_adjacency_hypergraph(in_path)
    nv, nh = g["nv"], g["nh"]
    max_len = max(1, int(np.log2(max(nv, nh))))
    in_w = (
        hash_int32(np.arange(nh, dtype=np.uint32)) % np.uint32(max_len)
        + np.uint32(1)
    ).astype(np.int64)
    out_w = (
        hash_int32((np.arange(nh) + nh).astype(np.uint32)) % np.uint32(max_len)
        + np.uint32(1)
    ).astype(np.int64)
    wv = in_w[g["dstv"]]          # v->h incidences weighted by target h
    wh = out_w[g["srch"]]         # h->v incidences weighted by source h
    write_adjacency_hypergraph(
        out_path,
        (g["srcv"], g["dstv"]),
        (g["srch"], g["dsth"]),
        nv,
        nh,
        wv=wv,
        wh=wh,
    )


def hyper_adj_to_binary(in_path: str, out_prefix: str) -> None:
    """hyperAdjToBinary.C: AdjacencyHypergraph text →
    ``.config`` (``nv mv nh mh``) + ``.vidx/.vadj/.hidx/.hadj``
    little-endian int64 binaries (the unweighted path of
    hyperAdjToBinary.C:26-100; uintT/uintE both map to int64 here,
    matching the engine's binary graph reader convention)."""
    g = parse_adjacency_hypergraph(in_path)
    nv, nh = g["nv"], g["nh"]
    mv, mh = len(g["dstv"]), len(g["dsth"])

    def offs(src, n):
        counts = np.bincount(src, minlength=n)
        return np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    with open(out_prefix + ".config", "w") as f:
        f.write(f"{nv} {mv} {nh} {mh}")
    offs(g["srcv"], nv).astype("<i8").tofile(out_prefix + ".vidx")
    np.asarray(g["dstv"], dtype="<i8").tofile(out_prefix + ".vadj")
    offs(g["srch"], nh).astype("<i8").tofile(out_prefix + ".hidx")
    np.asarray(g["dsth"], dtype="<i8").tofile(out_prefix + ".hadj")


def grid_graph(spark: SparkSession, n: int, dims: int = 2) -> DataFrame:
    """gridGraph.C: ``dims``-dimensional toroidal mesh with ~n vertices
    (side = round(n^(1/dims)); each cell links to its +1 neighbor per
    dimension, wrapping). Pure ``spark.range`` + column arithmetic —
    no data movement at all until the caller shuffles."""
    if dims not in (2, 3):
        raise ValueError("gridGraph supports dims in (2, 3)")
    dn = int(round(n ** (1.0 / dims)))
    nn = dn**dims
    cells = spark.range(0, nn, 1).select(F.col("id").alias("l"))
    edges = []
    for axis in range(dims):
        stride = dn ** (dims - 1 - axis)
        # index along this axis, neighbor with wraparound
        axis_idx = (F.col("l") % (stride * dn)) / stride
        wrapped = F.col("l") + F.when(
            F.floor(axis_idx) == dn - 1, F.lit(stride * (1 - dn))
        ).otherwise(F.lit(stride))
        edges.append(cells.select(F.col("l").alias("src"), wrapped.cast("long").alias("dst")))
    out = edges[0]
    for e in edges[1:]:
        out = out.unionAll(e)
    return out


def rand_hypergraph_incidence(
    spark: SparkSession, nv: int, nh: int, cardinality: int
) -> DataFrame:
    """randHypergraph.C: ``nh`` hyperedges, each sampling
    ``cardinality`` member vertices as ``hashInt32(i*cardinality + j)
    % nv`` with in-hyperedge duplicates removed
    (randHypergraph.C:44-60). Distributed over the incidence range."""
    parts = max(8, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))

    def gen(batches):
        for pdf in batches:
            off = pdf["id"].to_numpy(np.int64)
            h = off // cardinality
            v = (hash_int32(off.astype(np.uint32)) % np.uint32(nv)).astype(np.int64)
            yield pd.DataFrame({"v": v, "h": h}).drop_duplicates()

    return spark.range(0, nh * cardinality, 1, parts).mapInPandas(
        gen, "v long, h long"
    )


def rand_local_graph(
    spark: SparkSession, n: int, m: int, dim: int = 0
) -> DataFrame:
    """randLocalGraph.C ``edgeRandomWithDimension`` (lines 36-59):
    ``m`` edges over ``n`` vertices; ``dim=0`` draws uniform endpoints
    from the per-edge hashInt32 chain (rejecting self-loops), ``dim>0``
    draws locality-biased offsets (the chain escalates the offset range
    by ``dim`` bits with probability ~1/2 per step). The per-edge
    rejection chains are replayed with vectorized masked iteration —
    identical streams, no per-row Python."""
    parts = max(8, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))

    def gen(batches):
        for pdf in batches:
            k = pdf["id"].to_numpy(np.int64)
            degree = m / n
            i = (k / degree).astype(np.int64)
            h = k.astype(np.uint32)
            j = np.empty(len(k), dtype=np.int64)
            if dim == 0:
                todo = np.ones(len(k), dtype=bool)
                while todo.any():
                    h[todo] = hash_int32(h[todo])
                    j[todo] = (h[todo] % np.uint32(n)).astype(np.int64)
                    todo &= j == i
            else:
                pow_ = np.full(len(k), dim + 2, dtype=np.int64)
                todo = np.ones(len(k), dtype=bool)
                while todo.any():
                    # escalate offset range: while hash chain lands in
                    # the low half of [0, 1000003), widen by dim bits
                    esc = todo.copy()
                    while esc.any():
                        h[esc] = hash_int32(h[esc])
                        hit = esc.copy()
                        hit[esc] = (h[esc] % np.uint32(1000003)) < np.uint32(500001)
                        pow_[hit] += dim
                        esc = hit
                    h[todo] = hash_int32(h[todo])
                    off = h[todo].astype(np.int64) % (
                        np.int64(1) << np.minimum(pow_[todo], 62)
                    )
                    j[todo] = (i[todo] + off) % n
                    todo &= j == i
            yield pd.DataFrame({"src": i, "dst": j})

    return spark.range(0, m, 1, parts).mapInPandas(gen, "src long, dst long")
