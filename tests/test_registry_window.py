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
    # r3-checked entries whose code changed in round 4
    assert {
        "corpus_line_dedup",
        "asof_purchase_click",
        "dedup_clusters_incremental",
        "dedup_clusters",
        "bpe_train_merges",
    } <= window
    # the window is exactly the driver's budget — no padding slack
    assert len(_WINDOW_FIRST) == 50


def test_every_entry_has_fn_and_consistent_oracle_contract():
    for name, q in REGISTRY.items():
        assert callable(q.fn), name
        if q.oracle is not None:
            assert "SELECT" in q.oracle.upper(), name
