"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — checked against plain-Python oracles."""

from __future__ import annotations

import numpy as np
import pytest

from ligra_spark.functions.dedup import (
    dedup_clusters,
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from ligra_spark.functions.similarity import (
    cosine_topk,
    embedding_dup_pairs,
    lsh_bucket_topk,
)
from ligra_spark.functions.text import lang_id, text_quality, token_count
from ligra_spark.functions.multimodal import (
    extract_features,
    fake_decode,
    real_decode_unavailable,
    sample_frames,
    synthetic_media,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "THE QUICK  brown fox jumps over the lazy dog"),  # dup of 1 after norm
    (4, "completely different text about spark engines and shuffles"),
    (5, "el gato y el perro en la casa de la abuela"),
    (6, "short"),
]


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(text, n=3):
    toks = " ".join(text.lower().split()).split(" ")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_dedup_exact_normalizes(docs_df):
    rows = {r["keeper_id"]: r["n_dups"] for r in dedup_exact(docs_df).collect()}
    assert rows[1] == 2          # docs 1 and 3 collapse
    assert 3 not in rows
    assert rows[2] == 1


def test_dedup_clusters_transitive_and_canonical(docs_df):
    out = {
        r["doc_id"]: (r["cluster"], r["keep"])
        for r in dedup_clusters(docs_df).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # 1 and 3 are identical after normalization → same cluster, min-id keeper
    assert out[1] == (1, True)
    assert out[3] == (1, False)
    # unrelated / too-short docs stay singleton clusters of themselves
    for d in (4, 5, 6):
        assert out[d] == (d, True)
    # invariants: cluster label = min member id, exactly one keeper each
    clusters: dict[int, list[int]] = {}
    for d, (c, _) in out.items():
        clusters.setdefault(c, []).append(d)
    for c, members in clusters.items():
        assert c == min(members)
        assert sum(out[m][1] for m in members) == 1


def test_word_shingles_match_python(docs_df):
    got = {}
    for r in word_shingles(docs_df).collect():
        got.setdefault(r["id"], set()).add(r["shingle"])
    for doc_id, text in DOCS:
        want = _py_shingles(text)
        assert got.get(doc_id, set()) == want, doc_id


def test_jaccard_pairs_exact(docs_df):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, threshold=0.1).collect()
    }
    s1, s2 = _py_shingles(DOCS[0][1]), _py_shingles(DOCS[1][1])
    want_12 = len(s1 & s2) / len(s1 | s2)
    assert abs(got[(1, 2)] - want_12) < 1e-9
    assert got[(1, 3)] == 1.0    # exact dup after normalization


def test_minhash_lsh_finds_near_dups(docs_df):
    pairs = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs_df).collect()
    }
    assert (1, 3) in pairs       # identical docs always collide
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_simhash_similar_docs_close(docs_df):
    h = {r["id"]: r["simhash"] for r in simhash(docs_df).collect()}
    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(h[1], h[3]) == 0          # identical after normalization
    assert ham(h[1], h[2]) < ham(h[1], h[4])


def test_token_count_and_quality(docs_df):
    tc = {r["doc_id"]: r for r in token_count(docs_df).collect()}
    assert tc[6]["n_tokens"] == 1
    assert tc[1]["n_tokens"] == 9
    q = {r["doc_id"]: r for r in text_quality(docs_df).collect()}
    assert q[1]["stopword_ratio"] == round(2 / 9, 6)  # two 'the'


def test_lang_id(docs_df):
    lg = {r["doc_id"]: r["lang_guess"] for r in lang_id(docs_df).collect()}
    assert lg[1] == "en"
    assert lg[5] == "es"
    assert lg[6] == "und"


# ---- similarity ------------------------------------------------------------

def _vec_df(spark, n=30, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def _py_topk(vecs, qid, k):
    v = vecs.astype(np.float64)
    q = v[qid]
    sims = (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    order = sorted(
        (i for i in range(len(v)) if i != qid),
        key=lambda i: (-sims[i], i),
    )
    return order[:k]


def test_cosine_topk_exact(spark):
    df, vecs = _vec_df(spark)
    queries = df.where("vec_id < 3")
    got = {}
    for r in cosine_topk(df, queries, k=4).collect():
        got.setdefault(r["query_id"], {})[r["rank"]] = r["neighbor_id"]
    for qid in range(3):
        want = _py_topk(vecs, qid, 4)
        assert [got[qid][rk] for rk in sorted(got[qid])] == want


def test_lsh_bucket_topk_schema_and_subset(spark):
    df, vecs = _vec_df(spark)
    res = lsh_bucket_topk(df, df.where("vec_id < 5"), k=3, planes=4, dim=8)
    rows = res.collect()
    assert res.columns == ["query_id", "rank", "neighbor_id"]
    # LSH returns a (possibly partial) subset of true neighbors: every
    # returned neighbor must at least share the query's bucket — weak
    # check: no self-pairs, ranks contiguous from 1
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert 1 <= r["rank"] <= 3


def test_embedding_dup_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_dup_pairs(df, 0.95).collect()}
    assert pairs == {(1, 2)}


# ---- multimodal plumbing ----------------------------------------------------

def test_multimodal_feature_extraction(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r for r in feats}
    assert all(len(r["feature"]) == 8 for r in feats)
    assert by_id[0]["n_bytes"] == 96
    # deterministic: same payload → same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert again[5] == by_id[5]["feature"]


def test_multimodal_frame_sampling(spark):
    media = synthetic_media(spark, n=12)
    frames = sample_frames(media, every_ms=1000).collect()
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in frames)
    vids = media.where("kind = 'video'").collect()
    per_vid = {v["media_id"]: (v["duration_ms"] + 999) // 1000 for v in vids}
    got = {}
    for r in frames:
        got[r["media_id"]] = got.get(r["media_id"], 0) + 1
    assert got == per_vid


def test_real_decoder_is_honestly_stubbed(spark):
    with pytest.raises(NotImplementedError):
        real_decode_unavailable(b"bytes")
    assert fake_decode(None).tolist() == [0.0] * 8


# ---------------------------------------------------------------------------
# round-2 scale-path fixes
# ---------------------------------------------------------------------------

def test_jaccard_df_cap_drops_hot_shingle(spark):
    """A boilerplate shingle shared by every doc (the O(df^2)
    posting-list blowup) is excluded from the capped index; pairs that
    were only connected through it disappear, genuinely-similar pairs
    survive."""
    boiler = "copyright footer text"
    docs = [
        (i, f"unique words number {i} alpha beta gamma " + boiler)
        for i in range(1, 9)
    ]
    docs.append((100, "the quick brown fox jumps over the lazy dog"))
    docs.append((101, "the quick brown fox jumps over the lazy cat"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, threshold=0.05)
    capped = ngram_jaccard_pairs(df, threshold=0.05, df_cap=4)
    unc = {(r.id_a, r.id_b) for r in uncapped.collect()}
    cap = {(r.id_a, r.id_b) for r in capped.collect()}
    # the boilerplate-only pairs exist uncapped, vanish capped
    assert (1, 2) in unc and (1, 2) not in cap
    # the real near-dup pair survives both
    assert (100, 101) in unc and (100, 101) in cap


def test_lsh_band_signature_is_slot_ordered(spark):
    """Two docs whose band minhashes are permutations of each other
    (same values, different slots) must NOT collide — regression test
    for the array_sort(collect_list(mh)) bug."""
    from pyspark.sql import functions as F
    from ligra_spark.functions import dedup as dd

    sig = spark.createDataFrame(
        [(1, 0, "aa"), (1, 1, "bb"), (2, 0, "bb"), (2, 1, "aa")],
        "id long, slot int, mh string",
    )
    band_sig = (
        sig.withColumn("band", F.lit(0))
        .groupBy("id", "band")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("slot", "mh"))),
                    lambda s: s.mh,
                ),
            ).alias("bsig")
        )
    )
    rows = {r["id"]: r["bsig"] for r in band_sig.collect()}
    assert rows[1] == "aa|bb" and rows[2] == "bb|aa"


def test_simhash_pairs_banded_equals_bruteforce(docs_df):
    """The banded Hamming join is complete for d < bands: its output
    equals brute-force bit_count over all pairs."""
    from ligra_spark.functions.dedup import simhash_dup_pairs

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_dup_pairs(docs_df, max_hamming=20, bands=21).collect()
    }
    sh = {r["id"]: r["simhash"] for r in simhash(docs_df).collect()}
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sh[a] ^ sh[b]).count("1")
            if h <= 20:
                want[(a, b)] = h
    assert got == want
    assert len(want) > 0  # non-vacuous: docs 1/2/3 are near-dups


def test_embedding_dup_pairs_lsh_subset_of_exact(spark):
    """LSH-bucketed near-dup pairs are a subset of the exact pairs, and
    planted duplicates (cosine ~1) are always found (they share every
    bucket)."""
    rng = np.random.default_rng(7)
    vecs = [(i, rng.normal(size=16).astype(float).tolist()) for i in range(40)]
    # plant a near-exact duplicate of vector 0
    dup = [v + rng.normal(scale=1e-3) for v in vecs[0][1]]
    vecs.append((99, dup))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(df, threshold=0.8, method="exact").collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(
            df, threshold=0.8, planes=4, tables=4, method="lsh"
        ).collect()
    }
    assert lsh <= exact
    assert (0, 99) in lsh


def test_lsh_bucket_pairgen_equals_selfjoin(spark):
    """The r06 groupBy + in-group pair generation must emit exactly the
    pairs the band-bucket self-join produced, on a corpus with real
    near-dup clusters (bucket sizes > 2 exercise the nested
    transform)."""
    from pyspark.sql import functions as F

    from ligra_spark.functions.dedup import _minhash_wide, simhash_dup_pairs

    rows = []
    for i in range(40):
        base = "alpha beta gamma delta epsilon zeta eta theta"
        variant = base if i % 4 else base + f" extra{i % 8}"
        rows.append((i, f"{variant} tail{i % 5}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, k=16, bands=4).collect()
    }
    # reference: the pre-r06 band self-join formulation
    wide = _minhash_wide(docs, 16, 3, "doc_id", "text")
    bsigs = F.array(
        *[
            F.concat_ws("|", *[F.col(f"mh{b * 4 + r}") for r in range(4)])
            for b in range(4)
        ]
    )
    band_sig = wide.select("id", F.posexplode(bsigs).alias("band", "bsig"))
    a, b = band_sig.alias("a"), band_sig.alias("b")
    want = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, ["band", "bsig"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 10

    # simhash: banded groupBy pair-gen vs brute-force Hamming verify
    h = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    want_sh = {
        (i, j, bin(h[i] ^ h[j]).count("1"))
        for i in h
        for j in h
        if i < j and bin(h[i] ^ h[j]).count("1") <= 6
    }
    got_sh = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_dup_pairs(docs, max_hamming=6, bands=10).collect()
    }
    assert got_sh == want_sh and len(got_sh) > 0
