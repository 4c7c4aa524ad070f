"""Structured-Streaming ingestion for a growing transcript/edge table.

The reference is strictly batch (no streaming exists in Ligra; its
driver loop re-runs over a static CSR). At 10^12-turn scale, though,
transcripts *arrive continuously*, so the engine provides the
incremental front half: stream new edge rows in, maintain the degree
table incrementally, and checkpoint — the iterative algorithms then run
batch jobs over the maintained state (per SURVEY.md §2.5: iterative
batch, not streaming fixpoints).

``incremental_degrees`` uses ``foreachBatch`` merge (idempotent per
epoch via the streaming checkpoint) — each micro-batch computes its own
degree partials with the same partial+final aggregation as the batch
path and merges them into the running parquet state.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long"


def stream_edges(spark: SparkSession, path: str) -> DataFrame:
    """Streaming source of edge rows from a directory of parquet files
    (Iceberg/Kafka sources swap in with one line on a cluster)."""
    return spark.readStream.schema(EDGE_SCHEMA).parquet(path)


def incremental_degrees(
    spark: SparkSession,
    edges_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Maintain ``(id, out_deg, in_deg)`` incrementally under arriving
    edges. Returns the finished StreamingQuery (availableNow mode drains
    what exists and stops — the test/backfill mode; pass False for a
    continuous run)."""
    state_path = str(Path(state_dir) / "degrees")

    def merge(batch: DataFrame, epoch_id: int) -> None:
        out_d = batch.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("o")
        )
        in_d = batch.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("i")
        )
        delta = out_d.join(in_d, "id", "full_outer").select(
            "id",
            F.coalesce("o", F.lit(0)).alias("out_deg"),
            F.coalesce("i", F.lit(0)).alias("in_deg"),
        )
        s = batch.sparkSession
        try:
            current = s.read.parquet(state_path)
        except Exception:
            current = None
        if current is not None:
            merged = (
                current.unionByName(delta)
                .groupBy("id")
                .agg(
                    F.sum("out_deg").alias("out_deg"),
                    F.sum("in_deg").alias("in_deg"),
                )
            )
        else:
            merged = delta
        # write-then-swap so a crash mid-write never corrupts state
        tmp = state_path + f"_epoch{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        s.read.parquet(tmp).write.mode("overwrite").parquet(state_path)

    writer = (
        edges_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()
