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


def test_round6_priorities_inside_the_50_window():
    window = set(list(REGISTRY)[:50])
    # round-5 verdict #1: the red row, re-registered exact-integer
    assert "corpus_neyman_allocation" in window
    # round-5 verdict #2: the whole never-checked backlog
    assert {
        "q76_anomalous_hours",
        "q81_rfm_segments",
        "q86_association_rules",
        "events_sessionize",
        "q91_resample_interpolate",
        "q96_top_event_paths",
    } <= window
    # r5 greens whose outputs the round-6 integer purge changed
    assert {
        "emb_whiten",
        "sim_bruteforce_topk_vectorized",
        "dedup_ppjoin_pairs",
        "events_hll_users",
        "events_user_overlap_sketch",
        "pricing_summary_incremental",
    } <= window
    # flagships, re-registered with _e2/_e4 integer outputs
    assert {
        "q15_pricing_summary",
        "q10_revenue_per_nation",
        "q14_broadcast_join",
    } <= window


def test_window_clears_the_never_checked_backlog():
    """The round-6 policy: every entry that has never had a driver
    CORRECTNESS row (computed from CORRECTNESS_r0{1..5}) must sit
    inside the 50-entry window — this round zeroes the backlog.
    Entries whose outputs changed this round but did not fit get a
    named ROUND-7 queue (no silently forgotten entries)."""
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    checked: set[str] = set()
    for r in (1, 2, 3, 4, 5):
        f = repo / f"CORRECTNESS_r0{r}.json"
        if f.exists():
            checked |= set(json.loads(f.read_text()))
    names = list(REGISTRY)
    never = [n for n in names if n not in checked]
    outside = [n for n in never if n not in set(names[:50])]
    assert not outside, outside
    # the window is exactly the driver's budget — no padding slack
    assert len(_WINDOW_FIRST) == 50


def test_every_entry_has_fn_and_consistent_oracle_contract():
    for name, q in REGISTRY.items():
        assert callable(q.fn), name
        if q.oracle is not None:
            assert "SELECT" in q.oracle.upper(), name


def _uncast_round_sites(sql: str) -> list[str]:
    """Every ``round(`` occurrence in *sql* that is NOT immediately
    wrapped in an integer CAST (``CAST(round(...) AS BIGINT/INT)``)."""
    import re

    out = []
    for m in re.finditer(r"round\s*\(", sql, re.IGNORECASE):
        start = m.start()
        back = (
            sql[max(0, start - 60) : start]
            .upper()
            .replace(" ", "")
            .replace("\n", "")
        )
        depth, i = 0, m.end() - 1
        while i < len(sql):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        follow = (
            sql[i : i + 100].upper().replace(" ", "").replace("\n", "")
        )
        if back.endswith("CAST(") and (
            follow.startswith(")ASBIGINT") or follow.startswith(")ASINT")
        ):
            continue
        out.append(sql[max(0, start - 25) : i + 1].replace("\n", " ")[-70:])
    return out


def test_no_oracle_emits_round_of_double():
    """The round-5 incident rule, class-wide: no oracle-backed entry
    may carry a ``round()`` that stays a double — every round() in an
    oracle must be an integer quantization (``CAST(round(x * 10^d) AS
    BIGINT)``). A rounded double's canonicalization is environment-
    sensitive (engine round(x, d) picks an implementation-defined
    nearest double; driver-side float formatting has its own version
    skew) — corpus_neyman_allocation shipped the r5 red row exactly
    this way while being bit-identical under the local gate. Integer
    outputs cannot canonicalize differently. Spark-side twin: use
    functions.int_e, never a bare F.round(x, d) output column."""
    bad = {
        name: _uncast_round_sites(q.oracle)
        for name, q in REGISTRY.items()
        if q.oracle is not None and _uncast_round_sites(q.oracle)
    }
    assert not bad, bad
