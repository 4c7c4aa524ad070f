"""Edge derivations over the driver testdata ``events`` table.

These exist so the SQL-expressible slice of the engine gets DuckDB
oracle coverage (__spark_entry__ contract): the same derivations are
written as ANSI SQL in ``oracle_sql()``.

- ``edges_from_events``: per-user event chains — each event links to the
  user's previous event (ordered by ts, event_id). A union of disjoint
  paths: connected components of this graph are exactly
  ``min(event_id) per user``, giving a **closed-form SQL oracle for a
  fixpoint algorithm**.
- ``event_type_graph``: co-occurrence graph over event *types* (two
  types linked iff some user emitted both). Small and dense → has
  triangles; the type vertex id is ``min(event_id)`` of that type so
  Spark and DuckDB agree without relying on engine-specific hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def edges_from_events(events: DataFrame, closure_key: bool = False) -> DataFrame:
    """``(src, dst)``: event → user's previous event.

    ``closure_key=True`` adds ``ckey = user_id``: every chain edge links
    two events of one user, so ``ckey`` is a valid partition-closure key
    for ``Graph(closure_key="ckey")`` (algorithms/closed.py)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sel = [
        F.col("event_id").alias("src"),
        F.lag("event_id").over(w).alias("dst"),
    ]
    if closure_key:
        sel.append(F.col("user_id").alias("ckey"))
    return events.select(*sel).where(F.col("dst").isNotNull())


EDGES_FROM_EVENTS_SQL = """
SELECT src, dst FROM (
  SELECT event_id AS src,
         lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
) WHERE dst IS NOT NULL
"""


def user_clique_edges(
    events: DataFrame, k: int = 6, closure_key: bool = False
) -> DataFrame:
    """``(src, dst)``: a clique over each user's first ``k`` events
    (ranked by ts, event_id), one direction per pair (lower rank →
    higher). Closed by ``user_id`` and triangle-RICH — the fixture for
    the closed triangle kernel's driver oracle, whose count has the
    closed form ``Σ_users C(min(cnt,k), 3)``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = events.select(
        "user_id", "event_id", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= k)
    a, b = t.alias("a"), t.alias("b")
    sel = [
        F.col("a.event_id").alias("src"),
        F.col("b.event_id").alias("dst"),
    ]
    if closure_key:
        sel.append(F.col("a.user_id").alias("ckey"))
    return (
        a.join(b, "user_id")
        .where(F.col("a.rn") < F.col("b.rn"))
        .select(*sel)
    )


def mod_graph_edges(events: DataFrame, m: int = 64, keep: int = 5) -> DataFrame:
    """``(src, dst)``: event-chain links folded onto ``m`` residue-class
    vertices, deterministically thinned to ~``keep/101`` of the possible
    pairs. Produces a small sparse digraph with nontrivial distance /
    path / triangle structure (unlike the per-user chains, which are
    paths, or the type graph, which is a clique) — the fixture graph for
    the BC / Bellman-Ford / Radii / MIS driver oracles. Every expression
    is engine-portable integer arithmetic, so DuckDB derives the
    identical graph."""
    links = edges_from_events(events).select(
        (F.col("src") % m).alias("src"), (F.col("dst") % m).alias("dst")
    )
    return (
        links.where(
            (F.col("src") != F.col("dst"))
            & ((F.col("src") * 31 + F.col("dst")) % 101 < keep)
        )
        .distinct()
    )


def mod_graph_sql(m: int = 64, keep: int = 5) -> str:
    """DuckDB SQL producing the identical graph to ``mod_graph_edges``
    for the given fold/thin parameters (pure integer arithmetic, so the
    engines agree bit-for-bit)."""
    return f"""
  SELECT DISTINCT a % {m} AS src, b % {m} AS dst
  FROM (SELECT event_id AS a,
               lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
        FROM events) l
  WHERE b IS NOT NULL AND a % {m} <> b % {m}
    AND ((a % {m}) * 31 + (b % {m})) % 101 < {keep}
"""


MOD_GRAPH_SQL = mod_graph_sql(64, 5)

# mid-size oracle fixture (VERDICT r02 item 6): the 64-vertex mod graph
# can't catch size-dependent bugs; folding onto 4096 residues with a
# looser thin gives ~3k vertices / ~2.5k edges at sf0.01 with a giant
# component of ~800 and root eccentricity ~36 — big enough for distance
# / component structure to stress multi-round convergence, small enough
# for recursive-CTE DuckDB oracles.
MID_M, MID_KEEP = 4096, 25
MID_GRAPH_SQL = mod_graph_sql(MID_M, MID_KEEP)


def event_type_graph(events: DataFrame) -> DataFrame:
    """``(src, dst)`` with src < dst: distinct event-type pairs
    co-occurring for at least one user; type id = min(event_id) of the
    type."""
    type_ids = events.groupBy("event_type").agg(
        F.min("event_id").alias("type_id")
    )
    ue = (
        events.join(type_ids, "event_type")
        .select("user_id", "type_id")
        .distinct()
    )
    a, b = ue.alias("a"), ue.alias("b")
    return (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .where(F.col("a.type_id") < F.col("b.type_id"))
        .select(F.col("a.type_id").alias("src"), F.col("b.type_id").alias("dst"))
        .distinct()
    )


EVENT_TYPE_GRAPH_SQL = """
WITH type_ids AS (
  SELECT event_type, MIN(event_id) AS type_id FROM events GROUP BY event_type
), ue AS (
  SELECT DISTINCT e.user_id, t.type_id
  FROM events e JOIN type_ids t ON e.event_type = t.event_type
)
SELECT DISTINCT a.type_id AS src, b.type_id AS dst
FROM ue a JOIN ue b ON a.user_id = b.user_id AND a.type_id < b.type_id
"""


def hyper_incidence(
    events: DataFrame, m: int = 64, groups: int = 256, keep: int = 12
) -> DataFrame:
    """``(v, h)``: hypergraph incidence for the hygra apps — hyperedge
    ``h`` = a user cohort (``user_id % groups``, offset past the vertex
    id space), members = the cohort's event residues mod ``m``,
    deterministically thinned to ~``keep/101`` of the memberships. At
    the test scales this yields hyperedges of ~5 members over 64
    vertices with nontrivial connectivity/core structure. Pure integer
    arithmetic, so DuckDB derives the identical incidence."""
    return (
        events.select(
            (F.col("event_id") % m).alias("v"),
            (F.lit(m) + F.col("user_id") % groups).alias("h"),
        )
        .where(
            (F.col("v") * 31 + F.col("h") - m) % 101 < keep
        )
        .distinct()
    )


HYPER_INCIDENCE_SQL = """
  SELECT DISTINCT event_id % 64 AS v, 64 + user_id % 256 AS h
  FROM events
  WHERE ((event_id % 64) * 31 + user_id % 256) % 101 < 12
"""


def hyper_incidence_directed(
    events: DataFrame, m: int = 64, groups: int = 256, keep: int = 12
) -> DataFrame:
    """``(v, h, d)``: directed-hypergraph variant of
    :func:`hyper_incidence` — each membership becomes a tail arc
    (``d = 0``, v→h) or head arc (``d = 1``, h→v) by parity of
    ``v + h``, giving every hyperedge distinct in/out vertex sets (the
    shape HyperBPath.C's all-tails-visited firing rule requires)."""
    return hyper_incidence(events, m, groups, keep).withColumn(
        "d", ((F.col("v") + F.col("h")) % 2).cast("int")
    )


HYPER_INCIDENCE_DIRECTED_SQL = """
  SELECT v, h, CAST((v + h) % 2 AS INT) AS d
  FROM (SELECT DISTINCT event_id % 64 AS v, 64 + user_id % 256 AS h
        FROM events
        WHERE ((event_id % 64) * 31 + user_id % 256) % 101 < 12)
"""
