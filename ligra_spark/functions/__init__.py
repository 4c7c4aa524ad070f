from ligra_spark.functions.dedup import (
    dedup_clusters,
    dedup_exact,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from ligra_spark.functions.similarity import (
    cosine_topk,
    embedding_dup_pairs,
    lsh_bucket_topk,
)
from ligra_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    text_quality,
    token_count,
)

__all__ = [
    "cosine_topk",
    "dedup_clusters",
    "dedup_exact",
    "doc_fingerprint",
    "embedding_dup_pairs",
    "lang_id",
    "lsh_bucket_topk",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "text_quality",
    "token_count",
]
