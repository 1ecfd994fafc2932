"""Smoke-run the examples in-process: they are the composition story
(README points users at them), so they must keep working as operators
evolve."""

from __future__ import annotations

import sys
from pathlib import Path

EXAMPLES_DIR = str(Path(__file__).resolve().parents[1] / "examples")


def test_corpus_curation_example_runs(spark, sf_dir, tmp_path, capsys):
    sys.path.insert(0, EXAMPLES_DIR)
    import corpus_curation

    argv = sys.argv
    sys.argv = ["corpus_curation.py", sf_dir, str(tmp_path / "out")]
    try:
        corpus_curation.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "curated docs:" in out
    assert "training packs:" in out
    assert "mean doc NLL:" in out
    assert "shard sizes:" in out


def test_run_query_cli_list(capsys):
    """The CLI's --list path prints the full registered inventory
    (no Spark session needed) — README points users at it."""
    tools_dir = str(Path(__file__).resolve().parents[1] / "tools")
    sys.path.insert(0, tools_dir)
    import run_query

    argv = sys.argv
    sys.argv = ["run_query.py", "--list", ""]
    try:
        run_query.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "q10_revenue_per_nation" in out
    assert "text_gopher_rules" in out
    assert "[oracle]" in out and "[rows-only]" in out
    assert len(out.strip().splitlines()) >= 120


def test_ann_serving_example_runs(spark, sf_dir, capsys):
    sys.path.insert(0, EXAMPLES_DIR)
    import ann_serving

    argv = sys.argv
    sys.argv = ["ann_serving.py", sf_dir]
    try:
        ann_serving.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "recall@5 audit" in out
    assert "ivf_cosine" in out


def test_queries_demo_example_runs(spark, sf_dir, capsys):
    sys.path.insert(0, EXAMPLES_DIR)
    import queries_demo

    argv = sys.argv
    sys.argv = ["queries_demo.py", sf_dir]
    try:
        queries_demo.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    for name in queries_demo.SHOWCASE:
        assert name in out


def test_warehouse_maintenance_example_runs(spark, sf_dir, capsys):
    sys.path.insert(0, EXAMPLES_DIR)
    import warehouse_maintenance

    argv = sys.argv
    sys.argv = ["warehouse_maintenance.py", sf_dir]
    try:
        warehouse_maintenance.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    for marker in ("profile", "diff", "scd2", "compact", "z-order"):
        assert marker in out
