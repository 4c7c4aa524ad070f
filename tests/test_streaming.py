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
