"""Deduplication operators over the ``documents`` table.

Four tiers, from exact to sketch-based — the standard LLM-corpus dedup
ladder:

1. exact            md5-keyed group (cheapest; catches byte-identical)
2. jaccard (exact)  3-gram shingle self-join — the *oracle-checkable
                    baseline*; O(sum of postings²) so it is the small-
                    corpus / verification path
3. MinHash + LSH    the 100 TB path: 64-perm signatures, 16 bands × 4
                    rows; candidate pairs only where a band collides,
                    then exact-Jaccard verification of candidates
4. SimHash          64-bit fingerprints, hamming≤3 via 4×16-bit
                    pigeonhole banding

All pure DataFrame/column expressions (no Python UDFs): shingling,
hashing, signatures, and banding run inside whole-stage codegen.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..catalog import table
from ..queries import register

# Mersenne prime 2^31-1: (a*h + b) stays < 2^62 — no int64 overflow
# under ANSI mode.
_MERSENNE = 2_147_483_647
_NUM_HASHES = 64
_BANDS = 16
_ROWS_PER_BAND = _NUM_HASHES // _BANDS

JACCARD_THRESHOLD = 0.8


def shingle_col(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of a whitespace-tokenized text column.

    Guarded for short texts: sequence(0, negative) would count *down* in
    Spark, so texts with < n tokens map to an empty shingle set.
    """
    toks = f"split({text_col}, ' ')"
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({toks}) - {n}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {n})))) "
        f"ELSE array() END"
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", shingle_col("text").alias("shingles")
    )


def exact_jaccard_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """Exact n-gram Jaccard over (doc_id, shingles) via shingle self-join.

    Shuffle is keyed on the shingle; a hot shingle fans out
    quadratically — which is exactly why minhash_lsh_pairs below is the
    scale path and this is the verification/oracle path.
    """
    ex = sh.select("doc_id", F.explode("shingles").alias("sh"))
    sz = sh.select("doc_id", F.size("shingles").alias("n"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def _minhash_params(num_hashes: int, seed: int = 42) -> str:
    """Deterministic (a, b) universal-hash parameters as a SQL array literal."""
    rng = random.Random(seed)
    pairs = [
        f"array({rng.randrange(1, _MERSENNE)}L, {rng.randrange(0, _MERSENNE)}L)"
        for _ in range(num_hashes)
    ]
    return f"array({', '.join(pairs)})"


def minhash_signatures(
    sh: DataFrame, num_hashes: int = _NUM_HASHES, seed: int = 42
) -> DataFrame:
    """64-permutation MinHash signature per doc, entirely in expressions.

    xxhash64 maps each shingle to an int64; each permutation is a
    universal hash (a*h + b) mod p over the *non-negative residue* of
    that value. Cost per doc is O(shingles × perms) of JVM arithmetic —
    no shuffle at all in this stage.
    """
    params = _minhash_params(num_hashes, seed)
    return sh.filter(F.size("shingles") > 0).select(
        "doc_id",
        "shingles",
        F.expr(
            f"transform({params}, p -> "
            f"array_min(transform(shingles, s -> "
            f"(p[0] * pmod(xxhash64(s), {_MERSENNE}) + p[1]) % {_MERSENNE})))"
        ).alias("sig"),
    )


def minhash_lsh_pairs(
    sh: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    bands: int = _BANDS,
    rows_per_band: int = _ROWS_PER_BAND,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, verified with exact Jaccard.

    Pipeline: signature → band keys → explode(bands) → bucket self-join
    (shuffle keyed on band hash, so only colliding docs ever meet) →
    distinct candidates → exact-Jaccard verification on candidates only.

    At 16 bands × 4 rows the S-curve crosses ~0.77, so Jaccard ≥ 0.8
    pairs are found with P ≈ 1 - (1 - 0.8⁴)¹⁶ ≈ 0.9989; output is a
    (whp equal) subset of exact_jaccard_pairs — why this entry is a
    rows-only check for the driver and is subset-asserted in tests.
    """
    sig = minhash_signatures(sh, bands * rows_per_band)
    banded = sig.select(
        "doc_id",
        "shingles",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"struct(b AS band, "
                f"xxhash64(concat_ws(',', slice(sig, b * {rows_per_band} + 1, "
                f"{rows_per_band}))) AS bkey))"
            )
        ).alias("bb"),
    ).select("doc_id", "shingles", "bb.band", "bb.bkey")

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return (
        cand.filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def simhash_col(text_col: str = "text", bits: int = 63) -> Column:
    """SimHash fingerprint (bits 0..62 — bit 63 would overflow int64
    under ANSI) from whitespace tokens: per-bit majority vote over
    xxhash64 token hashes."""
    toks = f"split({text_col}, ' ')"
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc + "
        f"CASE WHEN aggregate(transform({toks}, t -> xxhash64(t)), 0L, "
        f"(v, h) -> v + CASE WHEN shiftright(h, i) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN shiftleft(1L, i) ELSE 0L END)"
    )


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the 64-bit space into 4 × 16-bit chunks;
    hamming ≤ 3 ⇒ at least one chunk matches exactly, so candidates
    come from 4 equi-joins (each a plain shuffle-hash join on a 16-bit
    key) instead of an O(n²) cross join.
    """
    fp = docs.select("doc_id", simhash_col(text_col).alias("sh"))
    chunks = fp.select(
        "doc_id",
        "sh",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c -> "
                "struct(c AS chunk, shiftright(sh, c * 16) & 65535 AS ckey))"
            )
        ).alias("cc"),
    ).select("doc_id", "sh", "cc.chunk", "cc.ckey")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.filter(ham <= max_hamming)
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------ registry ------------------------------


@register(
    "dedup_exact",
    oracle="""
        SELECT md5(text) AS text_hash,
               CAST(COUNT(*) AS BIGINT) AS copies,
               MIN(doc_id) AS keeper_doc_id
        FROM documents
        GROUP BY 1
        ORDER BY 1
    """,
    doc="Exact dedup: hash-keyed group; keeper = min doc_id per text.",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(
            F.count("*").alias("copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .orderBy("text_hash")
    )


@register(
    "dedup_jaccard_pairs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), s AS (
            SELECT doc_id,
                   CASE WHEN len(toks) >= 3 THEN list_distinct(
                       list_transform(generate_series(1, len(toks) - 2),
                                      i -> array_to_string(toks[i:i+2], ' ')))
                   ELSE [] END AS shingles
            FROM t
        ), ex AS (
            SELECT doc_id, unnest(shingles) AS sh FROM s
        ), sz AS (
            SELECT doc_id, len(shingles) AS n FROM s
        ), pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
        FROM pairs
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= {JACCARD_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
    doc="Exact 3-gram-shingle Jaccard near-dup pairs (oracle baseline).",
    tags=("dedup",),
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_jaccard_pairs(_doc_shingles(spark, sf_dir), JACCARD_THRESHOLD)


@register(
    "dedup_minhash_lsh",
    oracle=None,  # probabilistic candidate generation: rows-only check;
    # tests assert (subset of exact) + (finds all planted dups).
    doc="MinHash(64)+LSH(16×4) near-dup pairs, exact-verified candidates.",
    tags=("dedup", "approx"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(_doc_shingles(spark, sf_dir))


@register(
    "dedup_simhash",
    oracle=None,  # xxhash64-derived fingerprints are not reproducible in
    # DuckDB SQL; tests diff against a pure-Python SimHash oracle.
    doc="SimHash-63 fingerprint pairs at hamming ≤ 3 via 16-bit banding.",
    tags=("dedup", "approx"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(table(spark, sf_dir, "documents"))
