

def test_ivf_topk_recall_vs_exact(spark):
    """IVF recall@5 vs exact cosine top-5 on the sf0.001 embeddings —
    the approximate path must actually find most true neighbors
    (deterministic data + deterministic quantizer => stable recall)."""
    from ligra_spark.functions.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall@5 = {recall}"
