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
#: Budget for round 4 — 50 named = the full window:
#:   - 9 never driver-checked: the 8 late-r3 registrations
#:     (sem_dedup, text_dup_spans, text_lm_perplexity,
#:     corpus_shuffle_shard, sim_ivfpq_topk, q51–q53) plus the new
#:     asof_forward_click_purchase
#:   - 9 operators new in round 4 (mixture/sampling/heavy-hitters/
#:     BPE-encode/CDC-chunking/quality-classifier/ppl-buckets cohort)
#:   - 5 r3-checked entries whose code changed this round
#:     (corpus_line_dedup de-skew, asof_join rewrite, the
#:     truncate_lineage/incremental guards behind the cluster ops,
#:     bpe's lineage truncation)
#:   - 27 entries whose last driver row is round 2 (q04–q14 and the
#:     round-2 operator cohort)
#: ROUND-5 BUDGET NOTE: deferred to fit the 50 —
#: (a) four rows-only r2-checked entries
#: (sim_bruteforce_topk_vectorized, emb_label_pca1, emb_kmeans_fit,
#: text_winnow_fingerprints — each carries local
#: invariant/differential tests, so the driver's rows-only probe adds
#: the least signal there); (b) nine double-green (r1+r2),
#: expression-only entries displaced by the round-4 additions
#: (q01_project_events, q02_filter_drop, q03_dedup_users,
#: q05_time_partition_counts, q08_attr_extract, text_fingerprint,
#: text_lang_id, emb_normalize, emb_quantize — no corpus-scale join
#: or shuffle risk in any of them, so the regression risk the driver
#: would re-probe is lowest); (c) the two smallest round-4 additions
#: (q54_event_funnel, corpus_train_val_split — both locally
#: oracle-green at sf0.001 and sf0.01, registered at the tail after
#: the window was full); and (d) the thirteen late-round-4
#: additions: the eight TPC-H-shaped join/subquery entries (q55–q62
#: in relational4.py — locally oracle-green, plan-tested),
#: text_gopher_rules and text_unicode_clean (oracles + planted
#: tests), asof_nearest_view_purchase (all-pairs rank oracle),
#: corpus_temperature_weights (oracle + α identities), and
#: text_heavy_hitters_incremental (exact oracle + mergeability
#: bounds); plus (e) the ten end-of-round-4 additions, all
#: locally oracle-green at sf0.001/sf0.01 and plan-tested: the six
#: remaining decision-support shapes (q63–q68 in relational5.py —
#: TPC-H Q17/Q15/Q11/Q12/Q2/Q20) and the four profiling operators
#: (text_zipf_fit, text_unigram_entropy, dedup_exact_normalized,
#: corpus_source_overlap in operators/profiling.py); and (f) the
#: five TPC-H-completion shapes (q69–q73 in relational6.py — Q4/Q6/
#: Q10/Q14/Q16 adapted, locally oracle-green at sf0.001 and sf0.01,
#: plan-tested); and (g) corpus_dsir_weights (oracle-green at both
#: SFs, reuse-plan-pinned), sim_recall_eval (rows-only by design,
#: invariant-tested), and emb_whiten (oracle-green at both SFs; its
#: decimal-sum moments also harden emb_dim_stats against the
#: run-to-run rounding-boundary flakiness observed at sf0.01).
#: Rotate all of these in first next round along with anything that
#: changes, (c)/(d)/(e)/(f)/(g) before (a)/(b).
_WINDOW_FIRST: tuple[str, ...] = (
    # — never driver-checked —
    "sem_dedup",
    "text_dup_spans",
    "text_lm_perplexity",
    "corpus_shuffle_shard",
    "sim_ivfpq_topk",
    "q51_exists_subquery",
    "q52_range_frame",
    "q53_windowed_count_distinct",
    "asof_forward_click_purchase",
    # — new in round 4 (never driver-checked) —
    "corpus_mixture_weights",
    "corpus_stratified_sample",
    "corpus_length_histogram",
    "corpus_quantile_filter",
    "text_heavy_hitters",
    "text_bpe_encode",
    "text_cdc_chunks",
    "corpus_quality_classifier",
    "text_ppl_buckets",
    # — changed in round 4 —
    "corpus_line_dedup",
    "asof_purchase_click",
    "dedup_clusters_incremental",
    "dedup_clusters",
    "bpe_train_merges",
    # — last driver row: round 2 —
    "q04_flatmap_tokens",
    "q06_conservation",
    "q07_roundtrip_conservation",
    "q09_join_groupcount",
    "q10_revenue_per_nation",
    "q11_left_join_counts",
    "q12_semi_join",
    "q13_anti_join",
    "q14_broadcast_join",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "sim_bruteforce_topk",
    "sim_ivf_topk",
    "sim_neardup_pairs",
    "emb_kmeans_step",
    "multimodal_meta",
    "multimodal_frame_sample",
    "skew_salted_agg",
    "text_quality",
    "text_token_counts",
    "text_repetition",
    "text_pii_scrub",
    "text_topk_ngrams",
    "text_bm25_topk",
    "corpus_filter_pipeline",
    "corpus_weighted_sample",
    "text_pack_bins",
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
        incremental,
        lines,
        mixture,
        multimodal,
        profiling,
        similarity,
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
