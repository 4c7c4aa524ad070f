"""Query registry backing ``__spark_entry__.py``.

Every implemented operator exposes a ``(spark, sf_dir) -> DataFrame``
callable here, and — when ANSI-SQL-expressible — a DuckDB oracle SQL
twin producing identical column names, schema, and values.

Cross-engine determinism rules used throughout (so the driver's
order-insensitive value-hash matches):

- integer outputs wherever possible (ids, counts, ranks cast to long);
- float outputs are either bitwise-deterministic (single IEEE division
  of identical operands, e.g. jaccard/ratios) or rounded (pagerank);
- hashing in shared logic uses md5 (identical in Spark and DuckDB),
  never engine-private hash functions;
- ties broken by id, never by engine iteration order.

Fixpoint algorithms (CC, LP, k-core, full PageRank) are not expressible
in one ANSI query; where the *input graph shape* makes the fixpoint
closed-form (per-user event chains ⇒ component = min event id of the
user), the oracle exploits that — a real convergence check of the
iterative engine, not a one-step approximation. The rest are
registered without oracle SQL → driver records rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ligra_spark.algorithms import (
    bfs,
    connected_components,
    kcore,
    label_propagation,
    pagerank,
    triangle_count,
)
from ligra_spark.functions.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from ligra_spark.functions.similarity import (
    cosine_topk,
    cosine_topk_kernel,
    embedding_dup_pairs,
    lsh_bucket_topk,
)
from ligra_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    text_quality,
    token_count,
)
from ligra_spark.graph import Graph
from ligra_spark.sources.events import (
    EDGES_FROM_EVENTS_SQL,
    EVENT_TYPE_GRAPH_SQL,
    edges_from_events,
    event_type_graph,
)

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events_graph(spark: SparkSession, sf_dir: str, partitions: int = 16) -> Graph:
    return Graph(edges_from_events(_events(spark, sf_dir)), num_partitions=partitions)


def _types_graph(spark: SparkSession, sf_dir: str) -> Graph:
    return Graph(event_type_graph(_events(spark, sf_dir)), num_partitions=4)


# --------------------------------------------------------------------------
# graph queries (events-derived)
# --------------------------------------------------------------------------

def q_edges_events(spark, sf_dir):
    return edges_from_events(_events(spark, sf_dir))


def q_degrees_events(spark, sf_dir):
    return _events_graph(spark, sf_dir).degrees


DEGREES_SQL = f"""
WITH edges AS ({EDGES_FROM_EVENTS_SQL}),
v AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
o AS (SELECT src AS id, COUNT(*) AS c FROM edges GROUP BY 1),
i AS (SELECT dst AS id, COUNT(*) AS c FROM edges GROUP BY 1)
SELECT v.id, COALESCE(o.c, 0) AS out_deg, COALESCE(i.c, 0) AS in_deg
FROM v LEFT JOIN o ON v.id = o.id LEFT JOIN i ON v.id = i.id
"""


def q_cc_events(spark, sf_dir):
    """Full iterative hash-min CC (with pointer-jump shortcutting) on
    the event-chain graph; the oracle's closed form holds because each
    user's events form one path component."""
    return connected_components(_events_graph(spark, sf_dir), shortcut=True)


CC_EVENTS_SQL = """
SELECT event_id AS id, MIN(event_id) OVER (PARTITION BY user_id) AS comp
FROM events
WHERE user_id IN (SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) >= 2)
"""


def q_pagerank_iter1_events(spark, sf_dir):
    g = _events_graph(spark, sf_dir)
    return pagerank(g, max_iters=1).select("id", F.round("rank", 9).alias("rank"))


PAGERANK_ITER1_SQL = f"""
WITH edges AS ({EDGES_FROM_EVENTS_SQL}),
v AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
n AS (SELECT COUNT(*) AS c FROM v),
outd AS (SELECT src AS id, COUNT(*) AS od FROM edges GROUP BY 1),
contrib AS (
  SELECT e.dst AS id, SUM((1.0 / n.c) / o.od) AS s
  FROM edges e JOIN outd o ON e.src = o.id CROSS JOIN n
  GROUP BY e.dst
)
SELECT v.id,
       ROUND(0.15 / n.c + 0.85 * COALESCE(contrib.s, 0), 9) AS rank
FROM v CROSS JOIN n LEFT JOIN contrib ON v.id = contrib.id
"""


def q_triangles_types(spark, sf_dir):
    cnt = triangle_count(_types_graph(spark, sf_dir))
    return spark.createDataFrame([(cnt,)], "triangles long")


TRIANGLES_TYPES_SQL = f"""
WITH e AS ({EVENT_TYPE_GRAPH_SQL})
SELECT COUNT(*) AS triangles
FROM e ab JOIN e bc ON ab.dst = bc.src
JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
"""


def q_bfs_types(spark, sf_dir):
    g = _types_graph(spark, sf_dir).symmetrized()
    root = g.vertices.agg(F.min("id")).first()[0]
    return bfs(g, root).select("id", F.col("dist").cast("long").alias("dist"))


BFS_TYPES_SQL = f"""
WITH RECURSIVE base AS ({EVENT_TYPE_GRAPH_SQL}),
e AS (SELECT src, dst FROM base UNION SELECT dst, src FROM base),
root AS (SELECT MIN(src) AS id FROM e),
r(id, dist) AS (
  SELECT id, 0 FROM root
  UNION
  SELECT e.dst, r.dist + 1 FROM r JOIN e ON e.src = r.id WHERE r.dist < 32
)
SELECT id, MIN(dist) AS dist FROM r GROUP BY id
"""


def q_lp_events(spark, sf_dir):
    return label_propagation(_events_graph(spark, sf_dir), max_iters=5)


def q_kcore_types(spark, sf_dir):
    return kcore(_types_graph(spark, sf_dir))


def q_pagerank_events(spark, sf_dir):
    g = _events_graph(spark, sf_dir)
    return pagerank(g, max_iters=15).select(
        "id", F.round("rank", 9).alias("rank")
    )


# --------------------------------------------------------------------------
# documents: text analysis + dedup
# --------------------------------------------------------------------------

def q_dedup_exact_docs(spark, sf_dir):
    return dedup_exact(_docs(spark, sf_dir))


DEDUP_EXACT_SQL = f"""
SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_dups
FROM documents GROUP BY {_NORM}
"""


def q_fingerprint_docs(spark, sf_dir):
    return doc_fingerprint(_docs(spark, sf_dir)).select("doc_id", "fingerprint")


FINGERPRINT_SQL = f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents"


def q_token_count_docs(spark, sf_dir):
    return token_count(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_tokens_bpe"
    )


TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe
FROM documents
"""

_STOPWORDS_SQL = "('the','and','of','to','is','in','that','with','a','an','for','on','it')"

def q_text_quality_docs(spark, sf_dir):
    return text_quality(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "mean_word_len", "stopword_ratio"
    )


TEXT_QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       ROUND((length(text) - (len(toks) - 1)) / CAST(len(toks) AS DOUBLE), 6)
         AS mean_word_len,
       ROUND(len(list_filter(toks, x -> x IN {_STOPWORDS_SQL}))
             / CAST(len(toks) AS DOUBLE), 6) AS stopword_ratio
FROM t
"""


def q_lang_id_docs(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_guess")


_MARKER_SQL = {
    "de": "('der','die','das','und','ist','ein','nicht','mit')",
    "en": "('the','and','of','to','is','in','that','with')",
    "es": "('el','la','de','que','y','los','las','una')",
    "fr": "('le','la','les','des','et','est','une','que')",
}
LANG_ID_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
  len(list_filter(toks, x -> x IN {_MARKER_SQL['de']})) AS s_de,
  len(list_filter(toks, x -> x IN {_MARKER_SQL['en']})) AS s_en,
  len(list_filter(toks, x -> x IN {_MARKER_SQL['es']})) AS s_es,
  len(list_filter(toks, x -> x IN {_MARKER_SQL['fr']})) AS s_fr
  FROM t)
SELECT doc_id,
  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
       WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
       ELSE 'fr' END AS lang_guess
FROM s
"""

_SHINGLES_SQL = f"""
toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id AS id, shingle FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(t) >= 3
                  THEN list_transform(generate_series(1, len(t) - 2),
                                      i -> array_to_string(t[i:i+2], ' '))
                  ELSE [] END) AS shingle
    FROM toks))
"""


def q_jaccard_pairs_docs(spark, sf_dir):
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.2)


JACCARD_PAIRS_SQL = f"""
WITH {_SHINGLES_SQL},
sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(c / CAST(sa.sz + sb.sz - c AS DOUBLE), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE c / CAST(sa.sz + sb.sz - c AS DOUBLE) >= 0.2
"""


def q_minhash_sig_docs(spark, sf_dir):
    return minhash_signatures(_docs(spark, sf_dir), k=16).select(
        "id", F.col("slot").cast("long").alias("slot"), "mh"
    )


MINHASH_SIG_SQL = f"""
WITH {_SHINGLES_SQL},
hashes AS (
  SELECT sh.id, s.slot, md5(CAST(s.slot AS VARCHAR) || ':' || sh.shingle) AS h
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS slot) s)
SELECT id, CAST(slot AS BIGINT) AS slot, MIN(h) AS mh
FROM hashes GROUP BY 1, 2
"""


def q_minhash_lsh_docs(spark, sf_dir):
    return minhash_lsh_pairs(_docs(spark, sf_dir), k=16, bands=4)


MINHASH_LSH_SQL = f"""
WITH {_SHINGLES_SQL},
hashes AS (
  SELECT sh.id, s.slot, md5(CAST(s.slot AS VARCHAR) || ':' || sh.shingle) AS h
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS slot) s),
sig AS (SELECT id, slot, MIN(h) AS mh FROM hashes GROUP BY 1, 2),
bsig AS (
  SELECT id, CAST(slot // 4 AS INT) AS band,
         string_agg(mh, '|' ORDER BY mh) AS bs
  FROM sig GROUP BY 1, 2)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM bsig a JOIN bsig b ON a.band = b.band AND a.bs = b.bs AND a.id < b.id
"""


def q_simhash_docs(spark, sf_dir):
    return simhash(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# embeddings: similarity search
# --------------------------------------------------------------------------

def q_ann_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.orderBy("vec_id").limit(20)
    res = cosine_topk(emb, queries, k=5)
    return res.select(
        "query_id", F.col("rank").cast("long").alias("rnk"), "neighbor_id"
    )


ANN_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings ORDER BY vec_id LIMIT 20),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, c.embedding) AS sim
  FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.query_id),
r AS (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rnk
      FROM scored)
SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id
FROM r WHERE rnk <= 5
"""


def q_ann_topk_kernel(spark, sf_dir):
    """Same exact semantics as ann_topk, computed by the Arrow/numpy
    matmul kernel — shares ann_topk's oracle, so the driver verifies the
    kernel against DuckDB value-for-value."""
    emb = _emb(spark, sf_dir)
    queries = emb.orderBy("vec_id").limit(20)
    res = cosine_topk_kernel(emb, queries, k=5)
    return res.select(
        "query_id", F.col("rank").cast("long").alias("rnk"), "neighbor_id"
    )


def q_embedding_dups(spark, sf_dir):
    return embedding_dup_pairs(_emb(spark, sf_dir), threshold=0.9)


EMBEDDING_DUPS_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
"""


def q_lsh_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.orderBy("vec_id").limit(20)
    res = lsh_bucket_topk(emb, queries, k=5, planes=6, dim=64)
    return res.select(
        "query_id", F.col("rank").cast("long").alias("rnk"), "neighbor_id"
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # graph engine over events-derived edge table
    "edges_events": q_edges_events,
    "degrees_events": q_degrees_events,
    "cc_events": q_cc_events,
    "pagerank_iter1_events": q_pagerank_iter1_events,
    "pagerank_events": q_pagerank_events,
    "triangles_types": q_triangles_types,
    "bfs_types": q_bfs_types,
    "lp_events": q_lp_events,
    "kcore_types": q_kcore_types,
    # documents: text analysis + dedup
    "dedup_exact_docs": q_dedup_exact_docs,
    "fingerprint_docs": q_fingerprint_docs,
    "token_count_docs": q_token_count_docs,
    "text_quality_docs": q_text_quality_docs,
    "lang_id_docs": q_lang_id_docs,
    "jaccard_pairs_docs": q_jaccard_pairs_docs,
    "minhash_sig_docs": q_minhash_sig_docs,
    "minhash_lsh_docs": q_minhash_lsh_docs,
    "simhash_docs": q_simhash_docs,
    # embeddings: similarity search
    "ann_topk": q_ann_topk,
    "ann_topk_kernel": q_ann_topk_kernel,
    "embedding_dups": q_embedding_dups,
    "lsh_topk": q_lsh_topk,
}

ORACLE_SQL: dict[str, str] = {
    "edges_events": EDGES_FROM_EVENTS_SQL,
    "degrees_events": DEGREES_SQL,
    "cc_events": CC_EVENTS_SQL,
    "pagerank_iter1_events": PAGERANK_ITER1_SQL,
    "triangles_types": TRIANGLES_TYPES_SQL,
    "bfs_types": BFS_TYPES_SQL,
    "dedup_exact_docs": DEDUP_EXACT_SQL,
    "fingerprint_docs": FINGERPRINT_SQL,
    "token_count_docs": TOKEN_COUNT_SQL,
    "text_quality_docs": TEXT_QUALITY_SQL,
    "lang_id_docs": LANG_ID_SQL,
    "jaccard_pairs_docs": JACCARD_PAIRS_SQL,
    "minhash_sig_docs": MINHASH_SIG_SQL,
    "minhash_lsh_docs": MINHASH_LSH_SQL,
    "ann_topk": ANN_TOPK_SQL,
    "ann_topk_kernel": ANN_TOPK_SQL,
    "embedding_dups": EMBEDDING_DUPS_SQL,
    # pagerank_events, lp_events, kcore_types, simhash_docs, lsh_topk:
    # fixpoint / engine-hash-dependent / approximate → rows-only checks.
}
