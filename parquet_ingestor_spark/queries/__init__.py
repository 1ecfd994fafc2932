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
#: Round-8 budget (per the round-7 verdict, item #1). 50 slots:
#:   - the 7 deferred entries FIRST — the only ones whose latest
#:     driver row predates their current output shape: the q61..q65
#:     purge-converted relational cohort (deferred one round from the
#:     round-7 window; their int_e conversion pattern came back green
#:     by proxy via q55/q56/q57/q59 in CORRECTNESS_r07, and q61 also
#:     carries its DATE→string fix) plus the two round-7 rows-only→
#:     oracle promotions media_phash_neardup (md5-seeded bilinear
#:     rasters + integer-DCT pHash) and emb_pca_project (deflated
#:     fixed-iteration power method). All locally oracle-green.
#:   - then strict least-recently-checked order: the full round-2
#:     cohort (23 entries — includes emb_kmeans_fit, which ALSO
#:     changed shape this round with its fixed-2-round integer-twin
#:     oracle promotion, r7 verdict #5) and 20 of the 22 round-3
#:     entries.
#: LATE ROUND-8 SWAP — a vacuous-green audit found four entries whose
#: gate rows were hash-green on EMPTY results (q22_except structurally
#: empty, q57/q68's part-name digit patterns matching nothing,
#: benchmark_contamination's 8-gram window colliding nowhere in the
#: synthetic corpus). All four were fixed to be non-vacuous at every
#: SF — an output-shape change, so all four need round-8 slots.
#: benchmark_contamination already held one; q22_except /
#: q57_profit_by_nation_year / q68_bulk_part_suppliers take the slots
#: of q27_string_funcs / q28_date_funcs / q29_array_funcs (deferred —
#: lowest-risk homogeneous scalar-function family, shape-unchanged
#: since round 3, driver-validated by proxy via q23_scalar_funcs and
#: q30_json_funcs, both round-7 green).
#: ROUND-9 BUDGET NOTE — rotate first: the four deferred round-3
#: entries (q27_string_funcs, q28_date_funcs, q29_array_funcs,
#: q22_intersect — all locally green, shape-unchanged) plus the two
#: round-8 rows-only→oracle BPE promotions bpe_train_merges /
#: text_bpe_encode (verification class changed, not output values:
#: the pure-Python token-level differential pins them, and
#: text_bpe_encode deliberately kept its INT schema) so their
#: rows-only driver rows upgrade to hash rows. Then resume
#: least-recently-checked order (the round-4 cohort).
_WINDOW_FIRST: tuple[str, ...] = (
    # — the 7 shape-stale entries (round-7 verdict #1) —
    "q61_large_volume_customers",
    "q62_dormant_high_balance",
    "q63_small_qty_revenue",
    "q64_top_supplier",
    "q65_important_parts",
    "media_phash_neardup",
    "emb_pca_project",
    # — the round-2 cohort, least-recently-checked —
    "corpus_weighted_sample",
    "dedup_exact",
    "emb_kmeans_fit",
    "multimodal_frame_sample",
    "multimodal_meta",
    "q01_project_events",
    "q02_filter_drop",
    "q03_dedup_users",
    "q04_flatmap_tokens",
    "q05_time_partition_counts",
    "q06_conservation",
    "q07_roundtrip_conservation",
    "q08_attr_extract",
    "q09_join_groupcount",
    "q11_left_join_counts",
    "q12_semi_join",
    "q13_anti_join",
    "text_fingerprint",
    "text_lang_id",
    "text_pack_bins",
    "text_pii_scrub",
    "text_token_counts",
    "text_topk_ngrams",
    # — the round-3 cohort (minus deferred, see the budget note) —
    "benchmark_contamination",
    "q16_distinct_agg",
    "q17_rollup",
    "q18_topk_per_group",
    "q21_global_topk",
    "q24_tumbling_window",
    "q25_session_window",
    "q26_sliding_window",
    "q31_full_outer",
    "q39_pivot",
    "q42_in_subquery",
    "q43_correlated_subquery",
    "q44_string_agg",
    "q46_regex_breadth",
    "q49_map_funcs",
    "q50_setops_all",
    "text_inverted_postings",
    # — the round-8 vacuous-green fixes (shape changed this round, so
    #   they MUST hold slots): see each entry's doc for the audit —
    "q22_except",
    "q57_profit_by_nation_year",
    "q68_bulk_part_suppliers",
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
