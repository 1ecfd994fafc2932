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
4. SimHash          126-bit (2×63) fingerprints, hamming≤3 via 4
                    ~32-bit pigeonhole chunks

Both sketch tiers compose exact dedup FIRST: texts collapse to one
representative per distinct text (md5 group, min doc_id keeper), the
sketch runs over representatives only, and member pairs are expanded
back by joins. That bounds sketch buckets — a degenerate corpus of a
million byte-identical docs contributes ONE representative instead of
a million colliding rows in a single band bucket — and makes the
(inherently quadratic) identical-text pair output a distributed join,
never a single-task ``collect_list`` expansion.

All pure DataFrame/column expressions (no Python UDFs): shingling,
hashing, signatures, and banding run inside whole-stage codegen.
"""

from __future__ import annotations

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
    # Spread docs across all cores *before* the shingle/signature
    # compute: a handful of parquet files would otherwise serialize the
    # CPU-heavy per-row work onto as many tasks as there are input
    # splits. At 100 TB the scan naturally has thousands of splits and
    # this repartition collapses into AQE noise; on small inputs it is
    # the difference between 1 core and all of them.
    par = spark.sparkContext.defaultParallelism
    return (
        table(spark, sf_dir, "documents")
        .repartition(par, "doc_id")
        .select("doc_id", shingle_col("text").alias("shingles"))
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


def _rep_groups(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Exact-dedup pre-pass shared by the sketch tiers.

    Returns ``(reps, members)``: ``reps`` holds one representative row
    (min doc_id, the text) per distinct text keyed by ``grp =
    md5(text)``; ``members`` maps every doc_id to its grp. The
    groupBy shuffles each distinct text once — the same work as
    ``dedup_exact`` — and everything downstream (signatures, banding,
    candidate joins) sees at most one row per distinct text.
    """
    grp = F.md5(F.col(text_col).cast("binary"))
    members = docs.select("doc_id", grp.alias("grp"))
    # reps feeds many DAG branches (signatures, both verification text
    # joins, group expansion); persist() marks it for materialize-once
    # instead of re-running the corpus scan + md5 shuffle per branch.
    # Lazy — no I/O until an action — and the ContextCleaner drops the
    # entry when the DataFrame is garbage collected.
    reps = (
        docs.select("doc_id", grp.alias("grp"), text_col)
        .groupBy("grp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.first(text_col).alias(text_col),
        )
        .persist()
    )
    return reps, members


def _expand_rep_pairs(
    rep_pairs: DataFrame,
    reps: DataFrame,
    members: DataFrame,
    value_col: str,
    within_value: Column,
    rep_within_filter: Column | None = None,
) -> DataFrame:
    """Expand representative-level pairs to all member pairs.

    Cross-group: each rep pair (value carried through — identical
    texts have identical sketch distances) fans out to the cartesian
    product of its two member groups via two grp-keyed joins —
    distributed work, and AQE's skew-join splitting handles a huge
    group. Within-group: a grp self-join emits every identical-text
    pair at ``within_value`` (jaccard 1.0 / hamming 0);
    ``rep_within_filter`` excludes groups where the metric is
    undefined (e.g. texts too short to shingle).
    """
    ga = reps.select(F.col("doc_id").alias("doc_a"), F.col("grp").alias("ga"))
    gb = reps.select(F.col("doc_id").alias("doc_b"), F.col("grp").alias("gb"))
    ma = members.select(F.col("doc_id").alias("ma"), F.col("grp").alias("ga"))
    mb = members.select(F.col("doc_id").alias("mb"), F.col("grp").alias("gb"))
    cross = (
        rep_pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .drop("doc_a", "doc_b")
        .join(ma, "ga")
        .join(mb, "gb")
        .select(
            F.least("ma", "mb").alias("doc_a"),
            F.greatest("ma", "mb").alias("doc_b"),
            value_col,
        )
    )
    w = members
    if rep_within_filter is not None:
        w = members.join(
            reps.filter(rep_within_filter).select("grp"), "grp"
        )
    wa = w.select("grp", F.col("doc_id").alias("doc_a"))
    wb = w.select("grp", F.col("doc_id").alias("doc_b"))
    within = (
        wa.join(wb, "grp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", within_value.alias(value_col))
    )
    return cross.unionByName(within).orderBy("doc_a", "doc_b")


def _perm_params(i: int) -> tuple[int, int]:
    """Deterministic universal-hash parameters for permutation i (LCG)."""
    a = (1103515245 * i + 12345) % (_MERSENNE - 1) + 1  # in [1, p-1]
    b = (214013 * i + 2531011) % _MERSENNE
    return a, b


def shingle_hashes_col(text_col: str = "text", n: int = 3) -> Column:
    """n-gram shingle *hashes* without materializing shingle strings.

    Hash each token once (xxhash64 → 30-bit residue), then combine
    consecutive token hashes with a rolling polynomial mod p. Profiling
    showed the string-shingle path (concat_ws of slices +
    array_distinct) dominated MinHash end-to-end — interpreted string
    ops per shingle; this is pure integer arithmetic. Duplicates are
    kept: min() over duplicate hash values is identical to min() over
    the distinct set, so MinHash needs no dedup here.
    """
    th = f"transform(split({text_col}, ' '), t -> pmod(xxhash64(t), 1073741789))"
    # Bind the token-hash array to a lambda variable so it is evaluated
    # once per row — naming it via a column would let CollapseProject
    # inline (= recompute) it per element access.
    return F.expr(
        f"flatten(transform(array({th}), th -> "
        f"CASE WHEN size(th) >= {n} THEN "
        f"transform(sequence(0, size(th) - {n}), i -> "
        f"(pmod(th[i] * 8191 + th[i + 1], {_MERSENNE}) * 8191 "
        f"+ th[i + 2]) % {_MERSENNE}) "
        f"ELSE array() END))"
    )


def minhash_signatures(
    docs: DataFrame, num_hashes: int = _NUM_HASHES, text_col: str = "text"
) -> DataFrame:
    """64-permutation MinHash signature per doc.

    Shape chosen for codegen, not elegance: explode the shingle-hash
    array to (doc_id, h) rows — each token hashed exactly once — then
    compute all 64 permutations as independent ``min((a_i·h + b_i) mod
    p)`` aggregates in one hash aggregate. Every operator here is
    whole-stage-codegen'd JVM arithmetic; the earlier nested
    higher-order-function formulation ran interpreted per lambda call
    (~10× slower) and a 64-entry literal parameter table blew up
    Catalyst optimization time, so the parameters are per-aggregate
    literals instead. The shuffle carries only partial-aggregated
    (doc × 64) rows — shingles collapse map-side because docs are
    already co-partitioned by doc_id.
    """
    hashed = docs.select(
        "doc_id", F.explode(shingle_hashes_col(text_col)).alias("h")
    )
    mins = []
    for i in range(1, num_hashes + 1):
        a, b = _perm_params(i)
        mins.append(
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % _MERSENNE).alias(f"m{i}")
        )
    sig_cols = [F.col(f"m{i}") for i in range(1, num_hashes + 1)]
    return (
        hashed.groupBy("doc_id")
        .agg(*mins)
        .select("doc_id", F.array(*sig_cols).alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    bands: int = _BANDS,
    rows_per_band: int = _ROWS_PER_BAND,
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, verified with exact Jaccard.

    Pipeline: exact-dedup to representatives → signature → band keys →
    explode(bands) → bucket groupBy (shuffle keyed on band hash, so
    only colliding reps ever meet) → distinct candidates → exact
    string-shingle Jaccard on candidates only (shingle strings are
    built for the few candidate rows, never the corpus — the
    corpus-wide path is hash-only) → member-pair expansion by join.

    The representative pre-pass is the bucket bound: a bucket is a
    4-row signature collision among *distinct* texts, so mass exact
    duplication (the degenerate corpus that used to pile n docs into
    one bucket's ``collect_list``) collapses to one row before banding
    and re-expands afterwards through distributed joins.

    At 16 bands × 4 rows the S-curve crosses ~0.77, so Jaccard ≥ 0.8
    pairs are found with P ≈ 1 - (1 - 0.8⁴)¹⁶ ≈ 0.9989; output is a
    (whp equal) subset of exact_jaccard_pairs — why this entry is a
    rows-only check for the driver and is subset-asserted in tests.
    """
    reps, members = _rep_groups(docs, text_col)
    par = docs.sparkSession.sparkContext.defaultParallelism
    reps = reps.repartition(par, "doc_id")
    # Signatures are consumed by both self-join branches; persist so the
    # 64-aggregate pipeline runs once (the broadcast-side branch cannot
    # share a shuffle with the streamed side via ReusedExchange).
    sig = minhash_signatures(reps, bands * rows_per_band, text_col).persist()
    banded = sig.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"struct(b AS band, "
                f"xxhash64(concat_ws(',', slice(sig, b * {rows_per_band} + 1, "
                f"{rows_per_band}))) AS bkey))"
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bkey")

    # Candidates from band-key collisions via self-join: no per-bucket
    # collect_list, so no bucket ever has to fit one task's memory.
    # Both join branches are the same subplan, so the banding shuffle
    # is written once and read twice (ReusedExchange).
    bl = banded.alias("bl")
    br = banded.alias("br")
    cand = (
        bl.join(
            br,
            (F.col("bl.band") == F.col("br.band"))
            & (F.col("bl.bkey") == F.col("br.bkey"))
            & (F.col("bl.doc_id") < F.col("br.doc_id")),
        )
        .select(
            F.col("bl.doc_id").alias("doc_a"),
            F.col("br.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Exact-Jaccard verification of candidates only: join the raw text
    # for the two sides (cheap — candidates are rare), THEN shingle.
    # Shingling after the join keeps the expensive string work
    # proportional to candidates, not corpus size.
    ta = reps.select(
        F.col("doc_id").alias("doc_a"), F.col(text_col).alias("_text_a")
    )
    tb = reps.select(
        F.col("doc_id").alias("doc_b"), F.col(text_col).alias("_text_b")
    )
    verified = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("sh_a", shingle_col("_text_a"))
        .withColumn("sh_b", shingle_col("_text_b"))
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    rep_pairs = verified.filter(jac >= threshold).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )
    return _expand_rep_pairs(
        rep_pairs,
        reps,
        members,
        "jaccard",
        within_value=F.lit(1.0),
        # Jaccard is undefined (0/0) for texts with < 3 tokens; such
        # docs never shingle, so identical-short-text pairs stay out —
        # matching exact_jaccard_pairs.
        rep_within_filter=F.size(F.split(F.col(text_col), " ")) >= 3,
    )


def simhash_fingerprints(
    docs: DataFrame, bits: int = 63, text_col: str = "text"
) -> DataFrame:
    """Two-word SimHash fingerprint (2 × bits 0..62 — bit 63 would
    overflow int64 under ANSI; 126 bits total) per doc: per-bit
    majority vote over two independent xxhash64 token hashes
    (``xxhash64(t)`` and ``xxhash64(t, 1)``). Same codegen-first shape
    as MinHash: explode tokens, one hash aggregate with 126 vote-sum
    columns (all whole-stage-codegen'd; the per-row nested-lambda
    formulation ran interpreted and was the operator's bottleneck),
    then rebuild both words from the vote signs in a flat arithmetic
    projection.

    Why two words: banding needs 4 exact-match chunks for the
    hamming≤3 pigeonhole, and a 63-bit fingerprint only gives 16-bit
    chunk keys — a key space of 4×65,536 buckets whose membership
    grows linearly with corpus size. Two words give ~32-bit chunk
    keys (2³¹⁺ buckets per chunk), keeping random chunk collisions —
    and therefore candidate-join fan-out — flat at billions of docs.
    """
    hashed = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(split({text_col}, ' '), "
                f"t -> struct(xxhash64(t) AS h0, xxhash64(t, 1) AS h1))"
            )
        ).alias("hh"),
    ).select("doc_id", "hh.h0", "hh.h1")
    votes = [
        F.sum(
            F.when(
                F.shiftright(w, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"{w}_{i}")
        for w in ("h0", "h1")
        for i in range(bits)
    ]
    words = []
    for w in ("h0", "h1"):
        fp_expr = None
        for i in range(bits):
            term = F.when(
                F.col(f"{w}_{i}") > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            fp_expr = term if fp_expr is None else fp_expr + term
        words.append(fp_expr)
    return (
        hashed.groupBy("doc_id")
        .agg(*votes)
        .select("doc_id", words[0].alias("sh0"), words[1].alias("sh1"))
    )


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with hamming(simhash128) ≤ max_hamming.

    Exact-dedup first (identical texts share a fingerprint — they
    re-expand as hamming-0 pairs by join), then pigeonhole banding:
    the 126-bit fingerprint splits into 4 ~32-bit chunks; hamming ≤ 3
    ⇒ at least one chunk matches exactly, so candidates come from a
    (chunk, ckey) self-join — no per-bucket collect_list, no bucket
    bounded by one task's memory, and the banding shuffle is written
    once (both join branches share the subplan via ReusedExchange).
    """
    reps, members = _rep_groups(docs, text_col)
    par = docs.sparkSession.sparkContext.defaultParallelism
    # Persist: both chunk self-join branches consume the fingerprints;
    # without it the 126-aggregate vote pipeline runs once per branch.
    fp = simhash_fingerprints(
        reps.repartition(par, "doc_id"), text_col=text_col
    ).persist()
    chunks = fp.select(
        "doc_id",
        "sh0",
        "sh1",
        F.explode(
            F.expr(
                "array(struct(0 AS chunk, sh0 & 4294967295 AS ckey), "
                "struct(1 AS chunk, shiftright(sh0, 32) AS ckey), "
                "struct(2 AS chunk, sh1 & 4294967295 AS ckey), "
                "struct(3 AS chunk, shiftright(sh1, 32) AS ckey))"
            )
        ).alias("cc"),
    ).select("doc_id", "sh0", "sh1", "cc.chunk", "cc.ckey")
    cl = chunks.alias("cl")
    cr = chunks.alias("cr")
    ham = F.bit_count(
        F.col("cl.sh0").bitwiseXOR(F.col("cr.sh0"))
    ) + F.bit_count(F.col("cl.sh1").bitwiseXOR(F.col("cr.sh1")))
    rep_pairs = (
        cl.join(
            cr,
            (F.col("cl.chunk") == F.col("cr.chunk"))
            & (F.col("cl.ckey") == F.col("cr.ckey"))
            & (F.col("cl.doc_id") < F.col("cr.doc_id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("cl.doc_id").alias("doc_a"),
            F.col("cr.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return _expand_rep_pairs(
        rep_pairs,
        reps,
        members,
        "hamming",
        within_value=F.lit(0).cast("int"),
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
    par = spark.sparkContext.defaultParallelism
    docs = table(spark, sf_dir, "documents").repartition(par, "doc_id")
    return minhash_lsh_pairs(docs)


@register(
    "dedup_simhash",
    oracle=None,  # xxhash64-derived fingerprints are not reproducible in
    # DuckDB SQL; tests diff against a pure-Python SimHash oracle.
    doc="SimHash-126 (2×63-bit) fingerprint pairs at hamming ≤ 3 via "
    "4×~32-bit chunk self-join banding.",
    tags=("dedup", "approx"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    par = spark.sparkContext.defaultParallelism
    docs = table(spark, sf_dir, "documents").repartition(par, "doc_id")
    return simhash_pairs(docs)
