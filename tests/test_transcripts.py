"""Transcript source pipeline: deterministic generation, edge
derivation, the per-turn text-equality invariant (input_hint), and
end-to-end graph algorithms over the derived edges."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ligra_spark.algorithms import connected_components, pagerank
from ligra_spark.graph import Graph
from ligra_spark.sources import derive_edges, generate_transcripts, vertex_ids
from ligra_spark.sources.transcripts import text_roundtrip
from oracles import components_oracle, pagerank_oracle


def test_generator_deterministic_and_well_formed(spark):
    t1 = generate_transcripts(spark, 50).collect()
    t2 = generate_transcripts(spark, 50).collect()
    assert sorted(map(tuple, t1)) == sorted(map(tuple, t2))
    rows = sorted(t1, key=lambda r: (r["conv_id"], r["turn_idx"]))
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    assert len(by_conv) == 50
    for conv, turns in by_conv.items():
        assert [t["turn_idx"] for t in turns] == list(range(len(turns)))
        assert 2 <= len(turns) <= 40
        for t in turns:
            assert t["role"] in ("user", "assistant", "tool")
            if t["role"] == "tool":
                assert t["tool"] is not None
        # ts strictly increasing within conversation
        tss = [t["ts"] for t in turns]
        assert all(a < b for a, b in zip(tss, tss[1:]))
    # some tool turns exist at this size
    assert any(r["role"] == "tool" for r in rows)


def test_tool_reply_follows_invocation(spark):
    rows = generate_transcripts(spark, 100).collect()
    by_conv = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        by_conv.setdefault(r["conv_id"], []).append(r)
    for turns in by_conv.values():
        for i, t in enumerate(turns):
            if t["role"] == "assistant" and t["tool"] is not None:
                nxt = turns[i + 1]
                assert nxt["role"] == "tool" and nxt["tool"] == t["tool"]


def test_vertex_ids_unique_both_modes(spark):
    t = generate_transcripts(spark, 100)
    n = t.count()
    for mode in ("hash", "dense"):
        ids = vertex_ids(t, mode)
        assert ids.select("id").distinct().count() == n


def test_text_equality_invariant(spark):
    """input_hint invariant: per-turn text equality under stable turn
    ordering after round-tripping through the vertex-id mapping."""
    t = generate_transcripts(spark, 80)
    rt = text_roundtrip(t, "hash")
    mismatch = (
        t.join(rt, ["conv_id", "turn_idx"], "full")
        .where(
            F.col("text").isNull()
            | F.col("text_roundtrip").isNull()
            | (F.col("text") != F.col("text_roundtrip"))
        )
        .count()
    )
    assert mismatch == 0


def _edges_oracle(rows):
    """Python re-derivation of reply+tool edges from raw transcript rows
    (ids = (conv, turn) tuples)."""
    by_conv = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        by_conv.setdefault(r["conv_id"], []).append(r)
    edges = []
    for conv, turns in by_conv.items():
        for i in range(1, len(turns)):
            edges.append(((conv, turns[i]["turn_idx"]), (conv, turns[i - 1]["turn_idx"])))
        for i, t in enumerate(turns):
            if t["role"] == "assistant" and t["tool"] is not None:
                reply = next(
                    (
                        u
                        for u in turns[i + 1 :]
                        if u["role"] == "tool" and u["tool"] == t["tool"]
                    ),
                    None,
                )
                if reply is not None:
                    a = (conv, t["turn_idx"])
                    b = (conv, reply["turn_idx"])
                    edges.append((a, b))
                    edges.append((b, a))
    return edges


def test_edge_derivation_matches_python_oracle(spark):
    t = generate_transcripts(spark, 60)
    rows = t.collect()
    ids = {
        (r["conv_id"], r["turn_idx"]): r["id"]
        for r in vertex_ids(t, "dense").collect()
    }
    want = sorted((ids[a], ids[b]) for a, b in _edges_oracle(rows))
    got = sorted(
        (r["src"], r["dst"]) for r in derive_edges(t, id_mode="dense").collect()
    )
    assert got == want


def test_graph_algorithms_on_transcript_edges(spark):
    """End-to-end: transcripts → edges → PageRank + CC vs oracles."""
    t = generate_transcripts(spark, 40)
    edges_df = derive_edges(t, id_mode="dense")
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    g = Graph(edges_df, num_partitions=8)

    want_cc = components_oracle(edges)
    got_cc = {r["id"]: r["comp"] for r in connected_components(g).collect()}
    assert got_cc == want_cc
    # each conversation is one component rooted at its turn 0
    n_conv = t.select("conv_id").distinct().count()
    assert len(set(got_cc.values())) == n_conv

    want_pr = pagerank_oracle(edges)
    got_pr = {r["id"]: r["rank"] for r in pagerank(g).collect()}
    keys = sorted(want_pr)
    assert np.allclose(
        np.array([got_pr[k] for k in keys]),
        np.array([want_pr[k] for k in keys]),
        atol=1e-6,
    )
    g.unpersist()
