"""Structured-Streaming ingestion for a growing transcript/edge table.

The reference is strictly batch (no streaming exists in Ligra; its
driver loop re-runs over a static CSR). At 10^12-turn scale, though,
transcripts *arrive continuously*, so the engine provides the
incremental front half: stream new edge rows in, maintain the degree
table incrementally, and checkpoint — the iterative algorithms then run
batch jobs over the maintained state (per SURVEY.md §2.5: iterative
batch, not streaming fixpoints).

``incremental_degrees`` merge contract (foreachBatch is at-least-once):

- **Idempotent replay**: the last committed ``epoch_id`` is recorded in
  a manifest after each successful merge; a replayed micro-batch with
  ``epoch_id <= committed`` is skipped, so crash-restart never
  double-counts a batch.
- **O(delta) per batch**: state is hash-bucketed on ``id`` into
  ``num_buckets`` partition directories; each merge reads and rewrites
  ONLY the buckets its delta touches (dynamic partition overwrite).
  Untouched buckets' files are never rewritten — at a 10^9-vertex
  degree table a micro-batch touching 1% of buckets costs 1% of a full
  rewrite, not O(total).
- Exposure: a crash between the partition-overwrite commit and the
  manifest write replays one epoch into already-merged buckets. Closing
  that window needs a transactional table format — on a real cluster
  this merge is one Iceberg ``MERGE INTO`` with the same bucket layout;
  the parquet implementation here keeps the identical dataflow.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long"


def stream_edges(spark: SparkSession, path: str) -> DataFrame:
    """Streaming source of edge rows from a directory of parquet files
    (Iceberg/Kafka sources swap in with one line on a cluster)."""
    return spark.readStream.schema(EDGE_SCHEMA).parquet(path)


def make_degree_merger(
    state_dir: str, num_buckets: int = 32, run_token: str | None = None
):
    """The foreachBatch merge function (exposed for direct testing of
    replay idempotency and partition-pruned rewrites).

    ``run_token`` scopes the replay guard: epoch_ids are only
    meaningful RELATIVE to one checkpoint location (a stream restarted
    with a fresh checkpoint_dir against the same state_dir starts over
    at epoch 0 — those are NEW batches, not replays, and skipping them
    up to the old committed epoch would silently corrupt the degree
    state). ``incremental_degrees`` passes the checkpoint path as the
    token; the manifest records (token, epoch) and a batch is skipped
    only when BOTH match. A token mismatch raises instead of guessing:
    the caller must either reuse the original checkpoint_dir (resume)
    or start a fresh state_dir (reset)."""
    state_path = str(Path(state_dir) / "degrees")
    manifest = Path(state_dir) / "_committed_epoch"

    def merge(batch: DataFrame, epoch_id: int) -> None:
        s = batch.sparkSession
        committed = -1
        if manifest.exists():
            raw = manifest.read_text()
            try:
                rec = json.loads(raw)
                rec_token, committed = rec.get("token"), int(rec["epoch"])
            except (ValueError, KeyError, TypeError):
                # legacy plain-int manifest: no token recorded
                rec_token, committed = None, int(raw)
            if rec_token != run_token:
                raise RuntimeError(
                    f"degree state at {state_dir} was committed by a "
                    f"different stream (token {rec_token!r}, now "
                    f"{run_token!r}): epoch_ids are checkpoint-scoped, so "
                    "the replay guard cannot tell replays from new "
                    "batches. Resume with the ORIGINAL checkpoint_dir, "
                    "or point the stream at a fresh state_dir."
                )
        if epoch_id <= committed:
            return  # at-least-once replay of an already-merged batch
        out_d = batch.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("o")
        )
        in_d = batch.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("i")
        )
        delta = (
            out_d.join(in_d, "id", "full_outer")
            .select(
                "id",
                F.coalesce("o", F.lit(0)).alias("out_deg"),
                F.coalesce("i", F.lit(0)).alias("i_deg"),
            )
            .withColumnRenamed("i_deg", "in_deg")
            .withColumn("bucket", F.pmod(F.hash("id"), F.lit(num_buckets)))
        )
        delta = delta.persist()
        touched = [int(r["bucket"]) for r in delta.select("bucket").distinct().collect()]
        try:
            current = s.read.parquet(state_path).where(F.col("bucket").isin(touched))
        except Exception:
            current = None
        if current is not None:
            merged = (
                current.unionByName(delta)
                .groupBy("id", "bucket")
                .agg(
                    F.sum("out_deg").alias("out_deg"),
                    F.sum("in_deg").alias("in_deg"),
                )
                .select("id", "out_deg", "in_deg", "bucket")
            )
        else:
            merged = delta.select("id", "out_deg", "in_deg", "bucket")
        prev_mode = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # dynamic mode replaces only the bucket=... directories the
            # merged frame contains — exactly the touched buckets
            merged.write.mode("overwrite").partitionBy("bucket").parquet(state_path)
        finally:
            s.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
            delta.unpersist()
        manifest.write_text(
            json.dumps({"token": run_token, "epoch": epoch_id})
        )

    return merge


def incremental_degrees(
    spark: SparkSession,
    edges_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    num_buckets: int = 32,
):
    """Maintain ``(id, out_deg, in_deg)`` incrementally under arriving
    edges — idempotent, bucket-partitioned merges (see module
    docstring). Returns the finished StreamingQuery (availableNow mode
    drains what exists and stops — the test/backfill mode; pass False
    for a continuous run)."""
    # the checkpoint path IS the epoch-id scope — recording it in the
    # manifest lets the replay guard distinguish a genuine replay (same
    # checkpoint) from a fresh stream reusing the state_dir
    merge = make_degree_merger(
        state_dir, num_buckets, run_token=str(checkpoint_dir)
    )
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


def windowed_edge_rates(
    edges_stream: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "20 minutes",
) -> DataFrame:
    """Watermarked sliding-window edge-arrival rates per source vertex —
    the canonical Structured Streaming aggregation shape for the graph
    feed: ``withWatermark`` bounds state for late events, the window
    aggregate is partial-aggregated map-side like any groupBy, and the
    result streams to any sink in append mode once windows close.

    Input must carry an event-time ``ts TIMESTAMP`` column alongside
    ``src``/``dst``. Returns ``(window, src, n_edges, n_dst)`` —
    running on a bounded batch DataFrame yields the same result as the
    stream having fully drained, which is what the test asserts.
    """
    from pyspark.sql import functions as F

    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        edges_stream.withWatermark("ts", watermark)
        .groupBy(w.alias("window"), "src")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.approx_count_distinct("dst").alias("n_dst"),
        )
    )
