from ligra_spark.streaming.ingest import incremental_degrees, stream_edges

__all__ = ["incremental_degrees", "stream_edges"]
