"""The local twin of the driver's correctness gate: every registered
query with an oracle must match DuckDB on the smoke-SF testdata."""

from __future__ import annotations

import pytest

from parquet_ingestor_spark.queries import REGISTRY, _ensure_loaded
from parquet_ingestor_spark.testing import (
    diff_summary,
    duck_canon,
    duck_connect,
    spark_canon,
)

_ensure_loaded()
_WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle)
_ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    got = spark_canon(q.fn(spark, sf_dir))
    want = duck_canon(duck, q.oracle)
    assert got == want, f"{name} mismatch:\n{diff_summary(got, want)}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0  # runs, stable schema
    assert df.columns
