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


def test_round5_priorities_inside_the_50_window():
    window = set(list(REGISTRY)[:50])
    # round-4 verdict #1: the one red driver row, fixed this round
    assert "emb_whiten" in window
    # round-4 verdict #5: the rows-only → oracle-backed promotions
    assert {
        "sim_bruteforce_topk_vectorized",
        "text_winnow_fingerprints",
        "events_hll_users",
    } <= window
    # round-4 verdict item (b): r3 rows exist but round 4 restructured
    # their code
    assert {
        "asof_purchase_click",
        "dedup_clusters_incremental",
        "bpe_train_merges",
    } <= window
    # the oldest never-checked cohorts (asof/dedup/graph/scd/sketch)
    assert {
        "asof_nearest_view_purchase",
        "dedup_ppjoin_pairs",
        "graph_pagerank",
        "graph_kcore_parts",
        "scd2_customer_segments",
        "events_cm_counts",
        "q54_event_funnel",
    } <= window


def test_window_maximizes_never_checked_coverage():
    """The round-5 policy: every window slot not spent on the red-row
    fix, a promotion, or a restructured entry goes to an entry that has
    never had a driver CORRECTNESS row (computed from
    CORRECTNESS_r0{1..4}); the bounded remainder (22 at rotation time)
    must each be queued by name in the ROUND-6 budget note (no silently
    forgotten entries)."""
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    checked: set[str] = set()
    for r in (1, 2, 3, 4):
        f = repo / f"CORRECTNESS_r0{r}.json"
        if f.exists():
            checked |= set(json.loads(f.read_text()))
    names = list(REGISTRY)
    never = [n for n in names if n not in checked]
    outside = [n for n in never if n not in set(names[:50])]
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
