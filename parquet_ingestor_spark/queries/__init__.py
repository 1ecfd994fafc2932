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
#: Budget for round 4 (recomputed mid-round after this round's own
#: additions grew the registry to 144): the window maximizes coverage
#: of the 54 entries that have never had a driver row. 50 slots =
#:   - the 9 the round-3 verdict names first (sem_dedup,
#:     text_dup_spans, text_lm_perplexity, corpus_shuffle_shard,
#:     sim_ivfpq_topk, q51-q53, asof_forward_click_purchase)
#:   - the 9 early-round-4 operators (mixture/sampling/heavy-hitters/
#:     BPE-encode/CDC-chunking/quality-classifier/ppl-buckets)
#:   - 2 r3-checked entries whose code was restructured this round
#:     (corpus_line_dedup de-skew, dedup_clusters probe rewrite)
#:   - the other 30 never-checked oracle-backed entries in
#:     registration order (q55-q73 decision-support shapes, the
#:     profiling/curation cohort, emb_dim_stats/emb_whiten,
#:     corpus_dsir_weights)
#: ROUND-5 BUDGET NOTE — rotate in first next round, then resume
#: least-recently-checked order:
#: (a) the entries still without any driver row after this round:
#:     asof_nearest_view_purchase, sim_recall_eval (rows-only by
#:     design), text_heavy_hitters_incremental, corpus_train_val_split,
#:     text_unigram_entropy, q54_event_funnel, and the late-round
#:     additions emb_cov_matrix, q74_cohort_retention, q75_resample_ffill,
#:     q76_anomalous_hours, dedup_fuzzy_names,
#:     corpus_dsir_weights_fast (rows-only by design),
#:     text_length_gini, q77_copurchase_pairs,
#:     asof_tolerance_purchase_click, q78_shipping_lag_stats,
#:     q79_interevent_gaps, corpus_js_divergence,
#:     q80_event_transitions, q81_rfm_segments,
#:     q82_weekday_hour_heatmap, corpus_dup_rate_by_source,
#:     q83_nation_trade_balance, q84_monthly_revenue_growth,
#:     q85_revenue_hhi_by_nation, and the
#:     rows-only-by-design emb_pca_project, events_hll_users,
#:     events_kll_value_quantiles, and the late-round-4 additions
#:     graph_pagerank, graph_triangles, interval_join_binned,
#:     q86_association_rules, q87_pareto_revenue,
#:     table_profile_orders, scd2_customer_segments,
#:     snapshot_diff_orders, events_sessionize,
#:     skew_report_event_types, q88_moving_average,
#:     text_blocklist_filter, q89_shipping_lag_mad,
#:     scd2_point_in_time_orders, corpus_neyman_allocation,
#:     graph_hits_parts, asof_conversion_lag,
#:     q90_nation_revenue_trend, q91_resample_interpolate,
#:     dq_orders_constraints, q92_share_of_parent,
#:     q93_abc_classification, q94_contingency_chi2, q95_touch_attribution,
#:     corpus_hash_sample_k, dedup_keep_best, q96_top_event_paths,
#:     events_cm_counts, pricing_summary_incremental, graph_kcore_parts,
#:     orders_merge_apply, graph_link_scores,
#:     dedup_ppjoin_pairs (oracle-backed;
#:     ppjoin reuses the baseline's oracle, hash-proving the
#:     prefix-filter rewrite output-identical) and
#:     unigram_lm_train, dedup_recall_eval, events_user_overlap_sketch,
#:     corpus_bloom_seen, media_phash_neardup (rows-only by design:
#:     iterative EM with bit-exact Python differential / probabilistic
#:     audit with pinned precision-recall guarantees)
#:     — every one is locally oracle-green
#:     (or invariant-tested) at sf0.001 and sf0.01 and covered by
#:     tools/stability_sweep.py;
#: (b) the 3 entries with r3 rows whose code changed in round 4 but
#:     were displaced by never-checked entries: asof_purchase_click,
#:     dedup_clusters_incremental, bpe_train_merges (all sweep-green);
#: (c) the 40 entries whose last driver row is round 2 (q01-q14, the
#:     round-2 operator cohort) — oldest rows first.
_WINDOW_FIRST: tuple[str, ...] = (
    # — the round-3 verdict's named nine —
    "sem_dedup",
    "text_dup_spans",
    "text_lm_perplexity",
    "corpus_shuffle_shard",
    "sim_ivfpq_topk",
    "q51_exists_subquery",
    "q52_range_frame",
    "q53_windowed_count_distinct",
    "asof_forward_click_purchase",
    # — early-round-4 operators (never driver-checked) —
    "corpus_mixture_weights",
    "corpus_stratified_sample",
    "corpus_length_histogram",
    "corpus_quantile_filter",
    "text_heavy_hitters",
    "text_bpe_encode",
    "text_cdc_chunks",
    "corpus_quality_classifier",
    "text_ppl_buckets",
    # — restructured this round (r3 rows exist; re-check) —
    "corpus_line_dedup",
    "dedup_clusters",
    # — remaining never-checked oracle-backed entries —
    "emb_dim_stats",
    "emb_whiten",
    "corpus_temperature_weights",
    "corpus_dsir_weights",
    "text_zipf_fit",
    "dedup_exact_normalized",
    "corpus_source_overlap",
    "text_novelty_score",
    "text_tfidf_terms",
    "text_gopher_rules",
    "text_unicode_clean",
    "q55_volume_shipping",
    "q56_market_share",
    "q57_profit_by_nation_year",
    "q58_customer_distribution",
    "q59_disjunctive_bands",
    "q60_waiting_suppliers",
    "q61_large_volume_customers",
    "q62_dormant_high_balance",
    "q63_small_qty_revenue",
    "q64_top_supplier",
    "q65_important_parts",
    "q66_priority_by_returnflag",
    "q67_cheapest_supplier",
    "q68_bulk_part_suppliers",
    "q69_priority_lag",
    "q70_forecast_revenue",
    "q71_returned_items",
    "q72_promo_revenue",
    "q73_supplier_relationship",
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
