"""Query registry — the declared inventory (SURVEY.md §2.3 + extensions).

Every entry couples a Spark DataFrame builder with (where expressible)
the ANSI-SQL oracle string that DuckDB runs over the same parquet
tables. The driver hash-compares both at sf0.01; ``tests/`` runs the
same differential check locally.

Column-name contract: every computed/aggregate column is aliased
identically in the Spark plan and the oracle SQL (the driver sorts
columns by name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False

#: Deliberate CORRECTNESS-window rotation (round-2 verdict order #2).
#: The driver's gate checks the FIRST 50 registered entries each round;
#: after all modules self-register, REGISTRY is reordered so these
#: names come first (everything else keeps import order at the tail).
#:
#: Round-9 budget (per the round-8 verdict, item #1). 50 slots:
#:   - the 2 round-8 rows-only->oracle BPE promotions FIRST
#:     (bpe_train_merges / text_bpe_encode): their verification
#:     class changed (new unrolled-CTE oracles), so their rows-only
#:     r5/r4 driver rows must upgrade to hash rows. Both PASS the
#:     local driver-faithful gate (round-8 verdict + builder runs).
#:   - the 4 round-3-deferred entries (q27/q28/q29 scalar-function
#:     family + q22_intersect), shape-unchanged, locally green.
#:   - then strict least-recently-checked order: the 26 remaining
#:     round-4-cohort entries, then 18 of the round-5 cohort.
#:     The two permanently rows-only entries
#:     (corpus_dsir_weights_fast, unigram_lm_train) are skipped in
#:     the round-5 fill: a window slot buys them no hash check, and
#:     their differential verification lives in tests
#:     (test_xxhash_minhash_corpus_recall; the exact-rational Python
#:     differential). Remaining round-5 entries rotate in round 10.
_WINDOW_FIRST: tuple[str, ...] = (
    # -- the 2 BPE oracle promotions (round-8 verdict #1) --
    "bpe_train_merges",
    "text_bpe_encode",
    # -- the 4 round-3-deferred entries --
    "q27_string_funcs",
    "q28_date_funcs",
    "q29_array_funcs",
    "q22_intersect",
    # -- the round-4 cohort remainder, least-recently-checked --
    "asof_forward_click_purchase",
    "dedup_clusters",
    "sem_dedup",
    "corpus_line_dedup",
    "text_dup_spans",
    "corpus_stratified_sample",
    "corpus_quantile_filter",
    "text_heavy_hitters",
    "text_cdc_chunks",
    "corpus_quality_classifier",
    "corpus_dsir_weights",
    "dedup_exact_normalized",
    "text_novelty_score",
    "text_tfidf_terms",
    "corpus_shuffle_shard",
    "text_unicode_clean",
    "q51_exists_subquery",
    "q53_windowed_count_distinct",
    "q58_customer_distribution",
    "q60_waiting_suppliers",
    "q66_priority_by_returnflag",
    "q67_cheapest_supplier",
    "q69_priority_lag",
    "q70_forecast_revenue",
    "q71_returned_items",
    "q73_supplier_relationship",
    # -- the round-5 cohort head (oracle-backed entries only) --
    "asof_purchase_click",
    "asof_nearest_view_purchase",
    "asof_tolerance_purchase_click",
    "interval_join_binned",
    "asof_conversion_lag",
    "dedup_fuzzy_names",
    "text_blocklist_filter",
    "dedup_keep_best",
    "graph_pagerank",
    "graph_triangles",
    "graph_hits_parts",
    "graph_kcore_parts",
    "graph_link_scores",
    "dedup_clusters_incremental",
    "corpus_hash_sample_k",
    "text_heavy_hitters_incremental",
    "corpus_train_val_split",
    "table_profile_orders",
)


def _ensure_loaded() -> None:
    """Import every query module exactly once (they self-register),
    then apply the deliberate window ordering above."""
    global _LOADED
    if _LOADED:
        return
    from ..operators import (  # noqa: F401
        asof,
        corpus,
        dedup,
        embeddings,
        graph,
        incremental,
        lines,
        matview,
        mixture,
        multimodal,
        profile,
        profiling,
        scd,
        similarity,
        sketches,
        skew,
        text,
    )
    from . import (  # noqa: F401
        dataflow,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        aggregates,
    )

    ordered = {name: REGISTRY[name] for name in _WINDOW_FIRST}
    ordered.update(
        (name, q) for name, q in REGISTRY.items() if name not in ordered
    )
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True
