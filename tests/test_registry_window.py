"""Pin the CORRECTNESS-window ordering: the driver checks the first 50
registered entries, so registration order is a product contract, not an
import accident."""

from __future__ import annotations

from parquet_ingestor_spark.queries import (
    REGISTRY,
    _WINDOW_FIRST,
    _ensure_loaded,
)

_ensure_loaded()


def test_window_first_names_all_exist():
    missing = [n for n in _WINDOW_FIRST if n not in REGISTRY]
    assert not missing, missing


def test_registry_leads_with_window_order():
    names = list(REGISTRY)
    assert tuple(names[: len(_WINDOW_FIRST)]) == _WINDOW_FIRST


def test_round4_priorities_inside_the_50_window():
    window = set(list(REGISTRY)[:50])
    # the round-3 verdict's top gap: every entry that had never had a
    # driver row, checked first this round
    assert {
        "sem_dedup",
        "text_dup_spans",
        "text_lm_perplexity",
        "corpus_shuffle_shard",
        "sim_ivfpq_topk",
        "q51_exists_subquery",
        "q52_range_frame",
        "q53_windowed_count_distinct",
        "asof_forward_click_purchase",
    } <= window
    # operators added in round 4 — never driver-checked
    assert {
        "corpus_mixture_weights",
        "corpus_stratified_sample",
        "corpus_length_histogram",
        "corpus_quantile_filter",
        "text_heavy_hitters",
        "text_bpe_encode",
        "text_cdc_chunks",
        "corpus_quality_classifier",
        "text_ppl_buckets",
    } <= window
    # restructured-in-round-4 entries with existing r3 rows
    assert {"corpus_line_dedup", "dedup_clusters"} <= window
    # the TPC-H completion and profiling cohorts added this round
    assert {
        "q69_priority_lag",
        "q70_forecast_revenue",
        "q71_returned_items",
        "q72_promo_revenue",
        "q73_supplier_relationship",
        "corpus_dsir_weights",
        "emb_whiten",
        "emb_dim_stats",
    } <= window


def test_window_maximizes_never_checked_coverage():
    """The round-4 policy: every window slot not spent on the verdict's
    named nine or a restructured entry goes to an entry that has never
    had a driver CORRECTNESS row (computed from CORRECTNESS_r0{1,2,3});
    a bounded number of never-checked entries may remain outside the
    window (the six deferred by the budget note plus every late-round
    addition — PCA, cohort, HLL, graph, Count-Min, incremental-view;
    all queued first in the ROUND-5 budget note)."""
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    checked: set[str] = set()
    for r in (1, 2, 3):
        f = repo / f"CORRECTNESS_r0{r}.json"
        if f.exists():
            checked |= set(json.loads(f.read_text()))
    names = list(REGISTRY)
    never = [n for n in names if n not in checked]
    outside = [n for n in never if n not in set(names[:50])]
    # every deferred never-checked entry must be queued by name in the
    # ROUND-5 budget note (no silently forgotten entries)
    note = (
        repo / "parquet_ingestor_spark" / "queries" / "__init__.py"
    ).read_text()
    unqueued = [n for n in outside if n not in note]
    assert not unqueued, unqueued
    # the window is exactly the driver's budget — no padding slack
    assert len(_WINDOW_FIRST) == 50


def test_every_entry_has_fn_and_consistent_oracle_contract():
    for name, q in REGISTRY.items():
        assert callable(q.fn), name
        if q.oracle is not None:
            assert "SELECT" in q.oracle.upper(), name
