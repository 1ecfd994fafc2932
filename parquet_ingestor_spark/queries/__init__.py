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
#: Round-6 budget (per the round-5 verdict). 50 slots:
#:   - the 22 never-driver-checked entries (verdict #2: clearing this
#:     backlog gives 100% of the registry a driver row) — several of
#:     them (q76/q78/q79/q80/q84/q85/q89/q94) were ALSO re-registered
#:     this round with integer-quantized outputs, so their first
#:     driver row lands on the hardened form;
#:   - corpus_neyman_allocation: round 5's one red row, re-registered
#:     with exact-integer outputs (sd_milli/share_ppm — verdict #1);
#:   - 27 re-checks for entries whose OUTPUTS changed in the round-6
#:     round()-of-double purge (every rounded-double column became a
#:     CAST(round(x·10^d) AS BIGINT) `_e{d}` integer): the r5
#:     greens the purge invalidated (emb_whiten,
#:     sim_bruteforce_topk_vectorized, dedup_ppjoin_pairs,
#:     events_hll_users, events_user_overlap_sketch,
#:     pricing_summary_incremental), the three flagships, and the
#:     r2-cohort relational/aggregate/embedding entries (oldest rows).
#: ROUND-7 BUDGET NOTE — the round-6 purge re-registered more entries
#: than one 50-slot window can re-check. These converted entries are
#: locally oracle-green (tools/stability_sweep.py) but their latest
#: driver row predates the conversion; rotate them in next round:
#: q19_running_sum, q20_lag_delta, q23_scalar_funcs, q30_json_funcs, q33_cube,
#: q32_shipping_priority, q35_stats_aggs, q36_percentiles,
#: q38_grouping_sets,
#: q41_scalar_subquery, q45_unpivot,
#: q55_volume_shipping, q56_market_share,
#: q57_profit_by_nation_year, q59_disjunctive_bands,
#: q61_large_volume_customers, q62_dormant_high_balance,
#: q63_small_qty_revenue, q64_top_supplier, q65_important_parts,
#: q72_promo_revenue, text_quality, text_lm_perplexity,
#: text_ppl_buckets, text_gopher_rules, text_repetition,
#: text_unigram_entropy, text_length_gini, text_zipf_fit,
#: corpus_js_divergence, corpus_dup_rate_by_source,
#: corpus_source_overlap, corpus_filter_pipeline, text_bm25_topk,
#: corpus_mixture_weights, corpus_temperature_weights,
#: corpus_length_histogram, dedup_jaccard_pairs, sim_bruteforce_topk,
#: sim_neardup_pairs, range_join_bands, skew_salted_agg,
#: emb_kmeans_step, and the five late-round-6 rows-only→oracle
#: promotions: q34_approx_distinct (deterministic md5-register HLL on
#: orders/o_custkey), q37_approx_percentiles and
#: events_kll_value_quantiles (deterministic fixed-width histogram
#: quantiles — integer-exact outputs; KLL stays the invariant-tested
#: library surface), and sim_recall_eval / dedup_recall_eval (audit
#: oracles COMPOSED from the already-verified twin oracles, counts
#: and e4 ratios all exact integers). All five old driver rows were
#: COUNT-only and predate the promotion.
#: (emb_kmeans_fit / emb_pca_project
#: also renamed their rows-only output columns to integer _e{d}
#: forms this round; their driver rows are COUNT-only and the row
#: counts are unchanged, so no staleness — listed here so nothing
#: reads as silently forgotten. dedup_minhash_lsh, dedup_simhash,
#: sim_srp_lsh_neardup, pq_adc_topk, sim_ivfpq_topk and sim_ivf_topk
#: were instead PROMOTED to fully hash-checked oracles and hold
#: round-6 window slots.) Then resume least-recently-checked order.
_WINDOW_FIRST: tuple[str, ...] = (
    # — the 22 never-driver-checked entries (round-5 verdict #2) —
    "q76_anomalous_hours",
    "q77_copurchase_pairs",
    "q78_shipping_lag_stats",
    "q79_interevent_gaps",
    "q80_event_transitions",
    "q81_rfm_segments",
    "q82_weekday_hour_heatmap",
    "q83_nation_trade_balance",
    "q84_monthly_revenue_growth",
    "q85_revenue_hhi_by_nation",
    "q86_association_rules",
    "q87_pareto_revenue",
    "events_sessionize",
    "q88_moving_average",
    "q89_shipping_lag_mad",
    "q90_nation_revenue_trend",
    "q91_resample_interpolate",
    "q92_share_of_parent",
    "q93_abc_classification",
    "q94_contingency_chi2",
    "q95_touch_attribution",
    "q96_top_event_paths",
    # — round 5's red row, re-registered exact-integer (verdict #1) —
    "corpus_neyman_allocation",
    # — r5 greens invalidated by the round-6 integer purge (and the
    # bloom hasher swap: corpus_bloom_seen's r5 row predates both its
    # md5 bit positions and its promotion to a full SQL oracle) —
    "corpus_bloom_seen",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "emb_whiten",
    "sim_bruteforce_topk_vectorized",
    "dedup_ppjoin_pairs",
    "events_hll_users",
    "events_user_overlap_sketch",
    "pricing_summary_incremental",
    # — flagships (r2 rows; outputs integer-quantized this round) —
    "q15_pricing_summary",
    "q10_revenue_per_nation",
    "q14_broadcast_join",
    # — r2-cohort conversions, least-recently-checked first —
    "q40_window_breadth",
    "q47_null_semantics",
    "q48_conditional_aggs",
    "q52_range_frame",
    # — embedding-family conversions (r2/r3 rows) + the round-6
    # promotion (new entry, never checked — must take a slot)
    "emb_pca1_power",
    "emb_label_pca1",
    "emb_pq_encode",
    # — round-6 promotions: md5-Rademacher SRP twin and the ADC
    # expression twin (rows-only → full oracle; their old driver rows
    # are stale COUNTs of the numpy-path forms)
    "sim_srp_lsh_neardup",
    "pq_adc_topk",
    "sim_ivfpq_topk",
    "sim_ivf_topk",
    "emb_normalize",
    "emb_quantize",
    "emb_dim_stats",
    "emb_cov_matrix",
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
