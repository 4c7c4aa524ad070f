"""vertexMap / vertexFilter — columnar per-vertex operators.

Reference: ``vertexMap(VS, F)`` applies a void functor to every frontier
member (ligra.h:374-406); ``vertexFilter(VS, F)`` keeps members passing
a boolean functor (ligra.h:410-459). Both are embarrassingly parallel
over flat arrays; in Spark they are pure columnar ``select``/``filter``
expressions — no shuffle, fully inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame


def vertex_map(frontier: DataFrame, updates: Mapping[str, Column]) -> DataFrame:
    """Apply columnar updates to per-vertex state: the PR_Vertex_F /
    CC_Vertex_F analog (PageRank.C:44-56, Components.C:44-50)."""
    return frontier.withColumns(dict(updates))


def vertex_filter(frontier: DataFrame, predicate: Column) -> DataFrame:
    """Keep frontier members satisfying ``predicate`` (ligra.h:410-419).
    Sparse/dense representation conversion is moot: Catalyst's filter is
    the compaction."""
    return frontier.where(predicate)
