"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: PageRank over the event-chain link graph
at sf0.001. ``queries()``/``oracle_sql()`` — one entry per implemented
operator (see ligra_spark/queries.py for the registry and the
cross-engine determinism rules).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ligra_spark.algorithms import pagerank  # noqa: E402
from ligra_spark.graph import Graph  # noqa: E402
from ligra_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402
from ligra_spark.sources.events import edges_from_events  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive the event-chain link graph from
    /root/testdata/sf0.001 and run PageRank; returns (id, rank,
    out_deg, in_deg) for the top-ranked vertices."""
    from pyspark.sql import functions as F

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    g = Graph(edges_from_events(events), num_partitions=8)
    pr = pagerank(g, max_iters=20)
    return (
        pr.join(g.degrees, "id")
        .orderBy(F.col("rank").desc(), F.col("id"))
        .limit(100)
        .select("id", "rank", "out_deg", "in_deg")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
