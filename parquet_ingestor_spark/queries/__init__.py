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
#: Round-5 budget (registry growth FROZEN this round per the round-4
#: verdict — verification, not breadth, is the bottleneck). 50 slots:
#:   - emb_whiten: round 4's one red driver row (array-typed output
#:     crashed the gate's pandas canonicalizer) — re-registered in
#:     long scalar form, must get its green row;
#:   - sim_bruteforce_topk_vectorized, text_winnow_fingerprints:
#:     promoted rows-only → oracle-backed this round (result-set
#:     oracle / md5-48 winnowing oracle) — need hash rows;
#:   - asof_purchase_click, dedup_clusters_incremental,
#:     bpe_train_merges: r3 rows exist but their code was restructured
#:     in round 4 (round-4 verdict item b);
#:   - 44 never-driver-checked entries, oldest-registration-first
#:     (includes events_hll_users, promoted to a deterministic
#:     md5-register HLL with a full SQL oracle this round).
#: ROUND-6 BUDGET NOTE — after this round 22 entries remain without
#: any driver row (all locally oracle-green at sf0.001/sf0.01 and in
#: tools/stability_sweep.py): q76_anomalous_hours, q77_copurchase_pairs,
#: q78_shipping_lag_stats, q79_interevent_gaps, q80_event_transitions,
#: q81_rfm_segments, q82_weekday_hour_heatmap, q83_nation_trade_balance,
#: q84_monthly_revenue_growth, q85_revenue_hhi_by_nation,
#: q86_association_rules, q87_pareto_revenue, events_sessionize,
#: q88_moving_average, q89_shipping_lag_mad, q90_nation_revenue_trend,
#: q91_resample_interpolate, q92_share_of_parent, q93_abc_classification,
#: q94_contingency_chi2, q95_touch_attribution, q96_top_event_paths.
#: Rotate those 22 in first (one round clears the backlog), then
#: resume least-recently-checked order with the 28 remaining slots
#: (q01-q14 and the round-2 cohort have the oldest rows).
_WINDOW_FIRST: tuple[str, ...] = (
    # — round-4 verdict items #1/#5: the red-row fix + promotions —
    "emb_whiten",
    "sim_bruteforce_topk_vectorized",
    "text_winnow_fingerprints",
    # — restructured in round 4 (r3 rows exist; re-check) —
    "asof_purchase_click",
    "dedup_clusters_incremental",
    "bpe_train_merges",
    # — never driver-checked, oldest-registration-first —
    "asof_nearest_view_purchase",
    "asof_tolerance_purchase_click",
    "interval_join_binned",
    "asof_conversion_lag",
    "dedup_fuzzy_names",
    "dedup_recall_eval",
    "dedup_ppjoin_pairs",
    "text_blocklist_filter",
    "dedup_keep_best",
    "sim_recall_eval",
    "emb_cov_matrix",
    "emb_pca_project",
    "graph_pagerank",
    "graph_triangles",
    "graph_hits_parts",
    "graph_kcore_parts",
    "graph_link_scores",
    "pricing_summary_incremental",
    "corpus_hash_sample_k",
    "text_heavy_hitters_incremental",
    "corpus_train_val_split",
    "corpus_dsir_weights_fast",
    "corpus_neyman_allocation",
    "media_phash_neardup",
    "table_profile_orders",
    "dq_orders_constraints",
    "text_unigram_entropy",
    "text_length_gini",
    "corpus_js_divergence",
    "corpus_dup_rate_by_source",
    "scd2_customer_segments",
    "snapshot_diff_orders",
    "scd2_point_in_time_orders",
    "orders_merge_apply",
    "events_hll_users",
    "events_kll_value_quantiles",
    "events_user_overlap_sketch",
    "corpus_bloom_seen",
    "events_cm_counts",
    "skew_report_event_types",
    "unigram_lm_train",
    "q54_event_funnel",
    "q74_cohort_retention",
    "q75_resample_ffill",
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
