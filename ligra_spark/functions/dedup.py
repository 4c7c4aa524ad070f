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


def _spread_small_input(df: DataFrame, id_col: str) -> DataFrame:
    """Hash-repartition ``df`` by ``id_col`` to the session's default
    parallelism IFF its scan has fewer partitions than that.

    The doc-pipeline operators below are compute-dense per row (shingle
    explode + k md5s per shingle); a corpus that arrives as one or two
    parquet files funnels ALL of that into as many tasks (measured,
    sf0.1 bench: the 5000-doc single-file corpus ran the entire
    shingle→16×md5 pipeline in ONE task — 3.4s of a 5.4s query on a
    31-core-idle box). One tiny exchange of the raw (id, text) rows
    buys full-core scaling. At 100 TB the corpus has thousands of
    input splits, so the guard is false and NO extra shuffle is paid
    — this only ever widens under-split small inputs (guide §2.5
    "input skew": repartition immediately after the read)."""
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target, id_col)
    except Exception:  # pragma: no cover — planning-only guard
        pass
    return df


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
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    dedupe: bool = True,
) -> DataFrame:
    """Word n-gram shingles per doc: ``(id, shingle)``, distinct unless
    ``dedupe=False`` (consumers whose aggregate is duplicate-insensitive
    — MinHash's per-slot ``min`` — skip the distinct's full shuffle)."""
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
    out = _spread_small_input(df, id_col).select(
        F.col(id_col).alias("id"), F.explode(shingles).alias("shingle")
    )
    return out.distinct() if dedupe else out


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs ``(id_a, id_b, jaccard)``
    with id_a < id_b and J ≥ threshold, via the inverted shingle
    index.

    ``df_cap`` is the scale guard: shingles occurring in more than
    ``df_cap`` documents are dropped from the index *and* from the
    per-doc sizes (so the Jaccard stays consistent over the reduced
    shingle space). Without it, one boilerplate shingle shared by 10^6
    docs creates 10^12 join rows — the posting-list blowup. At 100 TB
    run with a cap (or on MinHash-LSH candidates only, see
    ``minhash_lsh_jaccard``); cap-free mode exists for oracle checks
    and small corpora."""
    sh = word_shingles(df, id_col, text_col, n)
    if df_cap is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > df_cap)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c") / (F.col("sa") + F.col("sb") - F.col("c"))
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sa"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sb"), "id_b")
        # filter on the UNROUNDED ratio (the rounded value is output
        # only), matching the SQL oracle's semantics exactly
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def _minhash_wide(
    df: DataFrame,
    k: int,
    n: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """``(id, mh0..mh{k-1})``: the k-slot MinHash signature as ONE wide
    aggregation — each shingle row projects all k ``md5(slot:shingle)``
    values and a single ``groupBy(id)`` takes k ``min``s.

    Vs the relational shape (explode k slot rows per shingle →
    ``groupBy(id, slot)`` → ``groupBy(id, band)`` with a sorted
    collect_list): identical md5 work, but the k× row explosion never
    exists, the shingle ``distinct`` is skipped (``min`` over duplicate
    shingles equals ``min`` over distinct ones), and two stacked
    aggregation shuffles (one an ObjectHashAggregate building per-group
    arrays) collapse into one hash aggregate with map-side partial
    combine — measured 3 shuffles fewer on the sf0.1 bench plan."""
    sh = word_shingles(df, id_col, text_col, n, dedupe=False)
    return sh.groupBy("id").agg(
        *[
            F.min(
                F.md5(F.concat_ws(":", F.lit(str(s)), F.col("shingle")))
            ).alias(f"mh{s}")
            for s in range(k)
        ]
    )


def minhash_signatures(
    df: DataFrame,
    k: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, slot, mh)``: k-slot MinHash signature per doc, where
    ``mh = min(md5(slot || ':' || shingle))`` — portable across engines.
    Computed as one wide aggregation (see ``_minhash_wide``); the
    (id, slot, mh) row shape is a zero-shuffle posexplode of it."""
    wide = _minhash_wide(df, k, n, id_col, text_col)
    return wide.select(
        "id",
        F.posexplode(F.array(*[F.col(f"mh{s}") for s in range(k)])).alias(
            "slot", "mh"
        ),
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
    the candidates.

    Band signatures come straight off the wide signature row (slot
    order is column order — no sorted collect_list). Docs sharing a
    band are found by ONE ``groupBy(band, bsig)`` + in-group pair
    generation (array higher-order functions), not a self-join: the
    self-join's build side recomputed the whole shingle→k×md5→agg
    subtree a second time (no exchange reuse across the broadcast
    boundary — plan-verified), i.e. 2× the signature work at any
    scale, for the same bucket semantics. Bucket sizes are bounded by
    the band collision rate (hot buckets only arise from true
    near-dup clusters), so the per-group pair arrays stay small; the
    whole candidate generator is now: one aggregation shuffle, a
    posexplode, one bucket groupBy, and a distinct."""
    rows_per_band = k // bands
    wide = _minhash_wide(df, k, n, id_col, text_col)
    bsigs = F.array(
        *[
            F.concat_ws(
                "|",
                *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )
    band_sig = wide.select(
        "id", F.posexplode(bsigs).alias("band", "bsig")
    )
    buckets = (
        band_sig.groupBy("band", "bsig")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    # all ordered pairs within a bucket: ids is sorted ascending and
    # per-bucket-distinct (each doc emits each band once), so nested
    # transform over (element, later elements) yields exactly the
    # id_a < id_b pairs the self-join produced
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), "
                "y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def minhash_lsh_jaccard(
    df: DataFrame,
    threshold: float = 0.2,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int | None = None,
) -> DataFrame:
    """The composed scale-path dedup: MinHash-LSH candidate pairs →
    exact Jaccard verify ≥ threshold. The expensive shingle self-join
    runs only on LSH candidates (semi-joined both ways), so the cost is
    O(candidates), never O(df²) per hot shingle."""
    cand = minhash_lsh_pairs(df, k, bands, n, id_col, text_col)
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .unionAll(cand.select(F.col("id_b").alias("id")))
        .distinct()
        .withColumnRenamed("id", id_col)
    )
    scores = ngram_jaccard_pairs(
        df.join(cand_ids, id_col, "left_semi"),
        threshold=threshold,
        n=n,
        id_col=id_col,
        text_col=text_col,
        df_cap=df_cap,
    )
    return cand.join(scores, ["id_a", "id_b"])


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
) -> DataFrame:
    """``(id, simhash LONG)`` — per-token hash bit votes (60-bit
    fingerprint by default).

    Pure DataFrame: explode tokens, hash via the first 15 hex chars of
    md5 (engine-portable — DuckDB derives the identical fingerprint, so
    the driver value-hash check covers this; 15 hex = 60 bits keeps the
    value inside a signed int64), per-bit majority vote via sum of ±1,
    reassemble the fingerprint with bit ops.
    """
    toks = (
        _spread_small_input(df, id_col)
        .select(F.col(id_col).alias("id"), F.explode(F.split(_norm_text(text_col), " ")).alias("tok"))
        .withColumn(
            "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
        )
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


def simhash_dup_pairs(
    df: DataFrame,
    max_hamming: int = 5,
    bands: int = 6,
    bits: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs ``(id_a, id_b, hamming)`` with
    ``hamming(simhash_a, simhash_b) <= max_hamming``, id_a < id_b.

    Banded Hamming join: split the fingerprint into ``bands`` equal bit
    ranges; two fingerprints within Hamming distance d share at least
    one band verbatim whenever ``bands > d`` (pigeonhole), so the
    band-bucket equi-join is a COMPLETE candidate generator — exact
    results, never all-pairs. Candidates are then verified with
    ``bit_count(xor)``. At 10^9 docs each band key is ~bits/bands
    random bits; hot buckets only arise from true duplicate clusters,
    which the verify step bounds."""
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} must exceed max_hamming={max_hamming} for a "
            "complete banded Hamming join"
        )
    width = bits // bands
    sh = simhash(df, id_col, text_col, bits).select("id", "simhash")
    band = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    keys = sh.select("id", "simhash", band).select(
        "id",
        "simhash",
        "band",
        F.expr(
            f"shiftright(simhash, band * {width}) & "
            f"{(1 << width) - 1}"
        ).alias("bkey"),
    )
    # one groupBy(band, bkey) + in-group pair generation instead of a
    # band-bucket self-join: the join's build side recomputed the whole
    # token→simhash pipeline a second time (same fix as
    # minhash_lsh_pairs; bucket members are (id, simhash) structs so
    # the Hamming verify runs on the generated pairs directly)
    buckets = (
        keys.groupBy("band", "bkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("id", "simhash"))
            ).alias("ms")
        )
        .where(F.size("ms") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ms, (x, i) -> "
                "transform(slice(ms, i + 2, size(ms)), "
                "y -> struct(x.id AS id_a, y.id AS id_b, "
                "x.simhash AS sh_a, y.simhash AS sh_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.bit_count(
                F.col("p.sh_a").bitwiseXOR(F.col("p.sh_b"))
            ).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_clusters(
    df: DataFrame,
    threshold: float = 0.2,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end near-dup clustering — what a training-data pipeline
    actually runs: LSH candidates → exact-Jaccard verify
    (``minhash_lsh_jaccard``) → connected components over the verified
    pair graph (transitive closure of near-duplication) → one canonical
    representative per cluster.

    Returns ``(id_col, cluster, keep)``: ``cluster`` is the min doc id
    of the near-dup component (docs with no near-dup cluster to
    themselves), ``keep`` marks the canonical representative. Filtering
    ``keep`` yields the deduplicated corpus.

    Scale shape: every stage is bucketed or O(pairs) — the LSH band
    join never goes all-pairs, and the component fixpoint runs on the
    pair graph only (near-dup graphs are tiny relative to the corpus),
    then joins back to the full corpus once."""
    from ligra_spark.algorithms.components import connected_components
    from ligra_spark.graph import Graph

    pairs = minhash_lsh_jaccard(df, threshold, k, bands, n, id_col, text_col)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(Graph(edges)).withColumnRenamed("id", id_col)
    return (
        df.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("cluster"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster"))
    )
