"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs. Every function here has an exact
ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so the DuckDB oracle can
verify it value-for-value; that constrains the vocabulary to portable
primitives (split + lambda filters, length arithmetic, md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deliberately small and fixed: the point is a
# deterministic, cheap, SQL-portable scorer, not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
    "es": ("el", "la", "de", "que", "y", "los", "las", "una"),
    "fr": ("le", "la", "les", "des", "et", "est", "une", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
}

EN_STOPWORDS = LANG_MARKERS["en"] + ("a", "an", "for", "on", "it")


def _tokens(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish proxy (4 chars ≈ 1 token,
    ceil) — the two standard budget estimators."""
    return df.withColumns(
        {
            "n_tokens": F.size(_tokens(text_col)).cast("long"),
            "n_tokens_bpe": F.ceil(F.length(text_col) / 4.0).cast("long"),
        }
    )


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / mean-word-length / stopword-ratio quality signals,
    rounded to 6 decimals for cross-engine comparability."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    return df.withColumns(
        {
            "n_tokens": n_tok.cast("long"),
            "mean_word_len": F.round(
                (F.length(text_col) - (n_tok - 1)) / n_tok.cast("double"), 6
            ),
            "stopword_ratio": F.round(n_stop / n_tok.cast("double"), 6),
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: score = marker hits per language,
    argmax with deterministic tie-break by language code; 'und' when no
    marker hits at all."""
    toks = _tokens(text_col)

    def contains(markers):
        # single-arg lambda factory: a 2-arg Python lambda would be
        # interpreted by PySpark as an (element, index) lambda
        return lambda x: F.array_contains(markers, x)

    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        score = F.size(F.filter(toks, contains(markers)))
        scores.append(F.struct(score.alias("s"), F.lit(lang).alias("neg")))
    # argmax by (score, then lexicographically-first language):
    # max(struct(score, lang)) breaks ties toward the *larger* lang
    # string, so invert via picking max score first then min lang.
    best = F.greatest(*scores)  # (max score, max lang at that score)
    # recompute deterministic min-lang among max-score languages
    arr = F.array(*scores)
    maxs = best["s"]
    winners = F.filter(arr, lambda st: st["s"] == maxs)
    first = F.array_min(F.transform(winners, lambda st: st["neg"]))
    return df.withColumn(
        "lang_guess", F.when(maxs > 0, first).otherwise(F.lit("und"))
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the lower-cased,
    whitespace-normalized text. (md5 rather than xxhash so the DuckDB
    oracle computes the identical value.)"""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(F.trim(norm)))
