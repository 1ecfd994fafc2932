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


def test_round3_priorities_inside_the_50_window():
    window = set(list(REGISTRY)[:50])
    # never driver-checked before round 3
    assert {"q49_map_funcs", "q50_setops_all"} <= window
    # new this round
    assert {
        "pq_adc_topk",
        "corpus_line_dedup",
        "dedup_clusters_incremental",
    } <= window
    # changed this round
    assert {
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_clusters",
        "benchmark_contamination",
        "text_inverted_postings",
        "sim_srp_lsh_neardup",
        "emb_pq_encode",
        "bpe_train_merges",
    } <= window


def test_every_entry_has_fn_and_consistent_oracle_contract():
    for name, q in REGISTRY.items():
        assert callable(q.fn), name
        if q.oracle is not None:
            assert "SELECT" in q.oracle.upper(), name
