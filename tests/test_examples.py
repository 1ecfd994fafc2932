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
