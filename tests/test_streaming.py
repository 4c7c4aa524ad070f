"""Streaming ingestion: incremental degree maintenance equals the batch
degree computation over the same edges."""

from __future__ import annotations

from ligra_spark.graph import Graph
from ligra_spark.streaming import incremental_degrees, stream_edges


def test_incremental_degrees_match_batch(spark, tmp_path):
    edges_dir = tmp_path / "edges_in"
    edges_dir.mkdir()
    batch1 = [(i, i + 1) for i in range(50)]
    batch2 = [(i + 1, i) for i in range(30)] + [(0, 25)]

    df1 = spark.createDataFrame(batch1, "src long, dst long")
    df1.write.parquet(str(edges_dir / "b1"))
    df2 = spark.createDataFrame(batch2, "src long, dst long")
    df2.write.parquet(str(edges_dir / "b2"))

    stream = stream_edges(spark, str(edges_dir) + "/*")
    incremental_degrees(
        spark,
        stream,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    got = {
        r["id"]: (r["out_deg"], r["in_deg"])
        for r in spark.read.parquet(str(tmp_path / "state" / "degrees")).collect()
    }
    g = Graph(df1.unionAll(df2), num_partitions=4)
    want = {
        r["id"]: (r["out_deg"], r["in_deg"]) for r in g.degrees.collect()
    }
    assert got == want
    g.unpersist()


def test_merge_replay_is_idempotent(spark, tmp_path):
    """foreachBatch delivers at-least-once: replaying an epoch must not
    double-count its degree deltas."""
    from ligra_spark.streaming import make_degree_merger

    merge = make_degree_merger(str(tmp_path / "state"), num_buckets=8)
    batch = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    merge(batch, 0)
    merge(batch, 0)  # replay of the same epoch — skipped
    got = {
        r["id"]: (r["out_deg"], r["in_deg"])
        for r in spark.read.parquet(str(tmp_path / "state" / "degrees")).collect()
    }
    assert got == {0: (1, 0), 1: (1, 1), 2: (0, 1)}


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """A micro-batch touching a few vertices must not rewrite untouched
    bucket partitions (O(delta), not O(total))."""
    import os

    from pyspark.sql import functions as F
    from ligra_spark.streaming import make_degree_merger

    state = tmp_path / "state"
    merge = make_degree_merger(str(state), num_buckets=8)
    big = spark.range(0, 400).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    merge(big, 0)
    deg_dir = state / "degrees"
    before = {
        str(p): os.path.getmtime(p)
        for p in deg_dir.rglob("*.parquet")
    }
    assert len(list(deg_dir.glob("bucket=*"))) == 8  # all buckets populated
    # second batch touches exactly two vertices
    merge(spark.createDataFrame([(0, 1)], "src long, dst long"), 1)
    after = {str(p): os.path.getmtime(p) for p in deg_dir.rglob("*.parquet")}
    untouched = [p for p in before if p in after and before[p] == after[p]]
    rewritten_or_gone = set(before) - set(untouched)
    # at most 2 of 8 buckets (those holding vertices 0 and 1) changed
    changed_buckets = {p.split("bucket=")[1].split("/")[0] for p in rewritten_or_gone}
    assert len(changed_buckets) <= 2, changed_buckets
    assert len(untouched) >= 6
    # and the merge result is correct
    got = {
        r["id"]: (r["out_deg"], r["in_deg"])
        for r in spark.read.parquet(str(deg_dir)).where("id in (0, 1, 2)").collect()
    }
    assert got[0] == (2, 0) and got[1] == (1, 2)


def test_windowed_edge_rates_stream_matches_batch(spark, tmp_path):
    """Drive windowed_edge_rates through a real file-source stream
    (two micro-batch files, one late event) and assert the drained
    result equals the batch computation over the full input."""
    import datetime as dt

    from pyspark.sql import functions as F
    from ligra_spark.streaming.ingest import windowed_edge_rates

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        # (src, dst, minutes-offset); window=10m tumbling
        (0, 1, 1), (0, 2, 3), (1, 2, 4),      # window [0,10)
        (0, 3, 12), (2, 3, 14),               # window [10,20)
        (1, 4, 2),                            # LATE event for [0,10)
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    schema = "src long, dst long, ts timestamp"

    def write_batch(name, batch):
        spark.createDataFrame(
            [(s, d, t0 + dt.timedelta(minutes=m)) for s, d, m in batch], schema
        ).coalesce(1).write.mode("overwrite").parquet(str(in_dir / name))

    write_batch("b0", rows[:3])
    write_batch("b1", rows[3:])
    src_df = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(in_dir) + "/*")
    out = windowed_edge_rates(src_df, window="10 minutes", watermark="30 minutes")
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rates")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["window"]["start"].minute, r["src"]): (r["n_edges"], r["n_dst"])
        for r in spark.sql("SELECT * FROM rates").collect()
    }
    batch_df = spark.createDataFrame(
        [(s, d, t0 + dt.timedelta(minutes=m)) for s, d, m in rows], schema
    )
    want = {
        (r["window"]["start"].minute, r["src"]): (r["n_edges"], r["n_dst"])
        for r in windowed_edge_rates(batch_df).collect()
    }
    assert got == want
    assert got[(0, 0)] == (2, 2) and got[(10, 0)] == (1, 1)


def test_merge_guard_rejects_foreign_checkpoint(spark, tmp_path):
    """epoch_ids are checkpoint-scoped: a fresh stream (new token)
    reusing an existing state_dir must raise — its epoch 0 is a NEW
    batch, and silently skipping it up to the old committed epoch
    would corrupt the degree state."""
    import pytest

    from ligra_spark.streaming import make_degree_merger

    state = str(tmp_path / "state")
    batch = spark.createDataFrame([(0, 1)], "src long, dst long")
    make_degree_merger(state, num_buckets=4, run_token="ckpt-A")(batch, 5)
    # same token: replay of epoch <= 5 skipped, epoch 6 merges
    merge_a = make_degree_merger(state, num_buckets=4, run_token="ckpt-A")
    merge_a(batch, 5)
    merge_a(batch, 6)
    got = {
        r["id"]: (r["out_deg"], r["in_deg"])
        for r in spark.read.parquet(state + "/degrees").collect()
    }
    assert got == {0: (2, 0), 1: (0, 2)}
    # different token: stale manifest -> explicit error, state untouched
    with pytest.raises(RuntimeError, match="checkpoint"):
        make_degree_merger(state, num_buckets=4, run_token="ckpt-B")(batch, 0)


def test_streaming_components_incremental(spark, tmp_path):
    """Streaming CC over a closure-keyed edge stream: after each
    micro-batch the accumulated mapping equals batch CC over all edges
    seen; untouched conversations emit nothing (update mode)."""
    from pyspark.sql import functions as F

    from ligra_spark.streaming import streaming_components

    edges_dir = tmp_path / "edges_in"
    edges_dir.mkdir()
    ckpt = str(tmp_path / "cc_ckpt")
    # conv 1: two separate chains in batch 1, joined by batch 2
    # conv 2: batch 1 only (must NOT re-emit in batch 2)
    # conv 3: appears only in batch 2
    b1 = [(1, 2, 1), (3, 4, 1), (10, 11, 2), (11, 12, 2)]
    b2 = [(2, 3, 1), (20, 21, 3)]
    schema = "src long, dst long, ckey long"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(edges_dir / "b1")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(edges_dir) + "/*")
    )
    got: list[tuple[int, list]] = []
    q = (
        streaming_components(stream)
        .writeStream.foreachBatch(
            lambda df, eid: got.append((eid, df.collect()))
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        n_after_b1 = len(got)
        spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
            str(edges_dir / "b2")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows1 = [r for _, batch in got[:n_after_b1] for r in batch]
    rows2 = [r for _, batch in got[n_after_b1:] for r in batch]
    # batch 1 emits every vertex (all new)
    assert {(r.id, r.comp) for r in rows1} == {
        (1, 1), (2, 1), (3, 3), (4, 3), (10, 10), (11, 10), (12, 10)
    }
    # batch 2: conv 1's merge re-labels the 3-4 chain (1 and 2 keep
    # comp 1 — unchanged, not re-emitted), conv 3 is new, conv 2 silent
    assert {(r.id, r.comp) for r in rows2} == {
        (3, 1), (4, 1), (20, 20), (21, 20)
    }
    assert all(r.ckey != 2 for r in rows2)
    # accumulated mapping == batch CC over the union of all edges
    from ligra_spark.algorithms.components import cc_contract_local
    from ligra_spark.graph import Graph

    final = {}
    for _, batch in got:
        for r in batch:
            final[r.id] = r.comp
    g = Graph(
        spark.createDataFrame(b1 + b2, schema),
        closure_key="ckey",
        validated_closure=True,
        num_partitions=4,
    )
    want = {r.id: r.comp for r in cc_contract_local(g).collect()}
    assert final == want
    g.unpersist()
