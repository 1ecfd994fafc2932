"""Text-analysis operators over the ``documents`` table.

All JVM-side column expressions (split / filter / aggregate /
regexp_count) — the per-document work stays inside whole-stage codegen
and scales linearly with corpus size; nothing here shuffles except the
final presentation sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..catalog import table
from ..queries import register

# Tiny per-language stopword profiles for the rule-based language-ID
# heuristic. The testdata corpus is synthetic English-ish text, so 'en'
# dominates — the operator's value is its deterministic, oracle-checkable
# scoring shape, which swaps cleanly for real profiles.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "un"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("的", "是", "了", "在", "我"),
}

_STOPWORDS = ("the", "a", "of", "and", "is")

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the classic GPT-2-style pre-split shape, identical semantics
# in Java regex (Spark) and RE2 (DuckDB).
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _score(lang: str) -> Column:
    words = ", ".join(f"'{w}'" for w in _LANG_PROFILES[lang])
    return F.expr(
        f"size(filter(split(text, ' '), t -> t IN ({words})))"
    ).alias(f"score_{lang}")


def lang_id_col() -> Column:
    """argmax over language profile scores; ties resolve in the fixed
    profile order; all-zero scores → 'und'."""
    scores = {lang: _score(lang) for lang in _LANG_PROFILES}
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in _LANG_PROFILES:  # fixed dict order = deterministic ties
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


@register(
    "text_lang_id",
    oracle="""
        WITH s AS (
            SELECT doc_id, lang,
                len(list_filter(string_split(text, ' '),
                    t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS score_en,
                len(list_filter(string_split(text, ' '),
                    t -> t IN ('el', 'la', 'de', 'que', 'y'))) AS score_es,
                len(list_filter(string_split(text, ' '),
                    t -> t IN ('le', 'la', 'de', 'et', 'un'))) AS score_fr,
                len(list_filter(string_split(text, ' '),
                    t -> t IN ('der', 'die', 'das', 'und', 'ist'))) AS score_de,
                len(list_filter(string_split(text, ' '),
                    t -> t IN ('的', '是', '了', '在', '我'))) AS score_zh
            FROM documents
        )
        SELECT doc_id, lang AS labeled_lang,
               CASE
                   WHEN greatest(score_en, score_es, score_fr, score_de,
                                 score_zh) = 0 THEN 'und'
                   WHEN score_en = greatest(score_en, score_es, score_fr,
                                            score_de, score_zh) THEN 'en'
                   WHEN score_es = greatest(score_en, score_es, score_fr,
                                            score_de, score_zh) THEN 'es'
                   WHEN score_fr = greatest(score_en, score_es, score_fr,
                                            score_de, score_zh) THEN 'fr'
                   WHEN score_de = greatest(score_en, score_es, score_fr,
                                            score_de, score_zh) THEN 'de'
                   ELSE 'zh'
               END AS pred_lang
        FROM s
        ORDER BY doc_id
    """,
    doc="Rule-based language ID: stopword-profile argmax per document.",
    tags=("text",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            lang_id_col().alias("pred_lang"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_quality",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   string_split(text, ' ') AS toks,
                   length(text) AS n_chars_actual
            FROM documents
        ), m AS (
            SELECT doc_id, n_chars_actual,
                   len(toks) AS n_tokens,
                   round(len(list_filter(toks,
                       t -> t IN ('the', 'a', 'of', 'and', 'is')))
                       * 1.0 / len(toks), 4) AS stopword_ratio,
                   round(list_sum(list_transform(toks, t -> length(t)))
                       * 1.0 / len(toks), 4) AS avg_token_len
            FROM t
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_chars_actual AS BIGINT) AS n_chars_actual,
               stopword_ratio, avg_token_len,
               CASE WHEN n_tokens >= 40 AND stopword_ratio <= 0.25 THEN 'good'
                    WHEN n_tokens >= 15 THEN 'fair'
                    ELSE 'poor' END AS quality
        FROM m
        ORDER BY doc_id
    """,
    doc="Quality scoring: length / stopword-ratio / token-shape heuristics.",
    tags=("text",),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    stops = ", ".join(f"'{w}'" for w in _STOPWORDS)
    toks = "split(text, ' ')"
    n_tokens = F.expr(f"size({toks})")
    stop_ratio = F.round(
        F.expr(f"size(filter({toks}, t -> t IN ({stops})))") / n_tokens, 4
    )
    avg_len = F.round(
        F.expr(f"aggregate({toks}, 0, (acc, t) -> acc + length(t))") / n_tokens,
        4,
    )
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            n_tokens.cast("long").alias("n_tokens"),
            F.length("text").cast("long").alias("n_chars_actual"),
            stop_ratio.alias("stopword_ratio"),
            avg_len.alias("avg_token_len"),
        )
        .withColumn(
            "quality",
            F.when(
                (F.col("n_tokens") >= 40) & (F.col("stopword_ratio") <= 0.25),
                "good",
            )
            .when(F.col("n_tokens") >= 15, "fair")
            .otherwise("poor"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_token_counts",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}'))
                    AS BIGINT) AS bpe_tokens
        FROM documents
        ORDER BY doc_id
    """,
    doc="Token counting: whitespace tokens + BPE-style pre-tokenizer count.",
    tags=("text",),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
            F.regexp_count(F.col("text"), F.lit(_BPE_PATTERN))
            .cast("long")
            .alias("bpe_tokens"),
        )
        .orderBy("doc_id")
    )


WINNOW_K = 8  # char k-gram length
WINNOW_W = 4  # winnowing window (mins selected per window)


def winnow_fingerprints_col(text_col: str = "text") -> Column:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken's MOSS
    algorithm): hash every char k-gram, slide a w-window over the hash
    sequence, keep each window's minimum; the distinct minima are the
    document's fingerprints. Guarantees any match of length ≥ k+w-1
    shares a fingerprint — the locality property plain min-hashing
    lacks. All expression-level: k-gram hashing via substring+xxhash64
    bound once through a lambda, window minima via array_min(slice)."""
    t = text_col
    hashes = (
        f"transform(sequence(1, greatest(length({t}) - {WINNOW_K - 1}, 1)), "
        f"i -> xxhash64(substring({t}, i, {WINNOW_K})))"
    )
    return F.expr(
        f"array_distinct(transform(array({hashes}), hs -> "
        f"CASE WHEN size(hs) >= {WINNOW_W} THEN "
        f"transform(sequence(0, size(hs) - {WINNOW_W}), "
        f"j -> array_min(slice(hs, j + 1, {WINNOW_W}))) "
        f"ELSE array(array_min(hs)) END)[0])"
    )


@register(
    "text_winnow_fingerprints",
    oracle=None,  # xxhash64-derived: no DuckDB twin; tests run a
    # pure-Python winnowing oracle over the same k-grams.
    doc="Winnowing (MOSS) rolling-hash fingerprints: guarantees shared "
    "fingerprints for any common substring ≥ k+w-1 chars.",
    tags=("text", "fingerprint"),
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    par = spark.sparkContext.defaultParallelism
    return (
        table(spark, sf_dir, "documents")
        .repartition(par, "doc_id")
        .select(
            "doc_id",
            F.explode(winnow_fingerprints_col()).alias("fp"),
        )
        .orderBy("doc_id", "fp")
    )


@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(lower(text)) AS fp,
               substr(md5(lower(text)), 1, 4) AS shard
        FROM documents
        ORDER BY doc_id
    """,
    doc="Document fingerprinting: normalized content hash + shard prefix "
    "(the partition key a 100 TB dedup store would bucket by).",
    tags=("text",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = F.md5(F.lower(F.col("text")).cast("binary"))
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            fp.alias("fp"),
            F.substring(fp, 1, 4).alias("shard"),
        )
        .orderBy("doc_id")
    )
