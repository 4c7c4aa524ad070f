"""Deduplication operators for training-data pipelines.

Scale notes (100 TB / 10^9+ docs):

- ``dedup_exact``: one hash-aggregate on the normalized text key —
  Spark's partial+final agg handles it; no driver-side state.
- ``ngram_jaccard_pairs``: exact pairwise Jaccard via the inverted
  shingle index (explode → self-join on shingle → count). Quadratic in
  the worst case — gate it behind the MinHash-LSH candidate filter at
  scale; exact mode exists for oracle checks and small corpora.
- ``minhash_*``: MinHash signatures computed **relationally**: shingle
  → k independent hash slots → ``groupBy(doc).min per slot``. Hashes
  are ``md5(slot || shingle)`` hex strings (lexicographic min), chosen
  over xxhash so the DuckDB oracle reproduces the identical signature.
  LSH bands then bucket-join docs sharing any band — the classic
  shingle→minhash→band→bucket-join pipeline, all shuffle-bounded
  DataFrame ops, no Python in the loop.
- ``simhash``: 64-bit fingerprint from per-token xxhash64 bit votes;
  near-dups = fingerprints within Hamming distance d (joined on
  rotated bands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_text(text_col: str):
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on normalized text: one row per distinct text with
    the minimum id as the keeper and the duplicate count."""
    return (
        df.select(F.col(id_col), _norm_text(text_col).alias("_k"))
        .groupBy("_k")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("keeper_id", "n_dups")
    )


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per doc: ``(id, shingle)``."""
    toks = F.split(_norm_text(text_col), " ")
    k = F.size(toks) - (n - 1)  # number of n-gram start positions
    # guard: Spark's sequence(0, negative) counts *down*, so short texts
    # must produce an empty array explicitly
    shingles = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs ``(id_a, id_b, jaccard)``
    with id_a < id_b and J ≥ threshold, via the inverted shingle
    index."""
    sh = word_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sa"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sb"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("c") / (F.col("sa") + F.col("sb") - F.col("c")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    k: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, slot, mh)``: k-slot MinHash signature per doc, where
    ``mh = min(md5(slot || ':' || shingle))`` — portable across engines."""
    sh = word_shingles(df, id_col, text_col, n)
    slots = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot")
    return (
        sh.select("id", "shingle", slots)
        .select(
            "id",
            "slot",
            F.md5(F.concat_ws(":", F.col("slot"), F.col("shingle"))).alias("h"),
        )
        .groupBy("id", "slot")
        .agg(F.min("h").alias("mh"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH candidate pairs ``(id_a, id_b)``: docs sharing at
    least one of ``bands`` band-signatures (k/bands rows per band).
    The downstream exact-Jaccard verify is ``ngram_jaccard_pairs`` on
    the candidates."""
    rows_per_band = k // bands
    sig = minhash_signatures(df, k, n, id_col, text_col)
    band_sig = (
        sig.withColumn("band", F.floor(F.col("slot") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(F.concat_ws("|", F.array_sort(F.collect_list("mh"))).alias("bsig"))
    )
    a, b = band_sig.alias("a"), band_sig.alias("b")
    return (
        a.join(b, ["band", "bsig"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """``(id, simhash LONG)`` — per-token 64-bit hash bit votes.

    Pure DataFrame: explode tokens, hash with xxhash64, per-bit majority
    vote via sum of ±1, reassemble the fingerprint with bit ops.
    """
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(F.split(_norm_text(text_col), " ")).alias("tok"))
        .withColumn("h", F.xxhash64("tok"))
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    votes = (
        toks.select("id", "h", bit)
        .select(
            "id",
            "bit",
            F.when(F.expr("shiftright(h, bit) & 1") == 1, 1)
            .otherwise(-1)
            .alias("v"),
        )
        .groupBy("id", "bit")
        .agg(F.sum("v").alias("vote"))
    )
    return votes.groupBy("id").agg(
        F.sum(
            F.when(
                F.col("vote") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
