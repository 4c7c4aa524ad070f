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
