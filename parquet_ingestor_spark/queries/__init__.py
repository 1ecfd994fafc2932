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
#: Budget for round 3 — 48 named + 2 tail spillover = the 50 window:
#:   - 2 never driver-checked: q49, q50 (registered at the tail in r2)
#:   - 3 new this round: pq_adc_topk, corpus_line_dedup,
#:     dedup_clusters_incremental
#:   - 8 whose code changed this round (probe routing, broadcast-hint
#:     removal, checkpointing, PQ encode split, SRP params)
#:   - 35 q-entries (q15–q48) whose last driver row is round 1
#: Unchanged r2-green operator entries rotate out; after r3 every
#: entry has a driver row within the last two rounds.
#: ROUND-4 BUDGET NOTE: sem_dedup, text_lm_perplexity,
#: corpus_shuffle_shard, q51_exists_subquery, q52_range_frame, and
#: sim_ivfpq_topk, text_dup_spans, and q53_windowed_count_distinct were
#: added late in r3 at the tail (no r3 driver row — local oracle
#: only); rotate them into the window first next round, along with
#: anything that changes, letting r3-proven q-entries rotate out.
_WINDOW_FIRST: tuple[str, ...] = (
    "q49_map_funcs",
    "q50_setops_all",
    "pq_adc_topk",
    "corpus_line_dedup",
    "dedup_clusters_incremental",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "benchmark_contamination",
    "text_inverted_postings",
    "sim_srp_lsh_neardup",
    "emb_pq_encode",
    "bpe_train_merges",
    "q15_pricing_summary",
    "q16_distinct_agg",
    "q17_rollup",
    "q18_topk_per_group",
    "q19_running_sum",
    "q20_lag_delta",
    "q21_global_topk",
    "q22_intersect",
    "q22_except",
    "q23_scalar_funcs",
    "q24_tumbling_window",
    "q25_session_window",
    "q26_sliding_window",
    "q27_string_funcs",
    "q28_date_funcs",
    "q29_array_funcs",
    "q30_json_funcs",
    "q31_full_outer",
    "q32_shipping_priority",
    "q33_cube",
    "q34_approx_distinct",
    "q35_stats_aggs",
    "q36_percentiles",
    "q37_approx_percentiles",
    "q38_grouping_sets",
    "q39_pivot",
    "q40_window_breadth",
    "q41_scalar_subquery",
    "q42_in_subquery",
    "q43_correlated_subquery",
    "q44_string_agg",
    "q45_unpivot",
    "q46_regex_breadth",
    "q47_null_semantics",
    "q48_conditional_aggs",
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
        multimodal,
        similarity,
        skew,
        text,
    )
    from . import (  # noqa: F401
        dataflow,
        relational,
        relational2,
        relational3,
        aggregates,
    )

    ordered = {name: REGISTRY[name] for name in _WINDOW_FIRST}
    ordered.update(
        (name, q) for name, q in REGISTRY.items() if name not in ordered
    )
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True
