"""The driver's correctness gate canonicalizes results with pandas
(sort columns by name → sort_values over all columns → value-hash);
pandas factorizes object columns to sort them, and factorize hashes
every cell — so a list/dict/array cell crashes the gate with
``TypeError: unhashable type``. That failure class shipped emb_whiten
red in round 4 while the repo's string-based canon accepted it.

:func:`parquet_ingestor_spark.testing.driver_canon_probe` reproduces
the driver's mechanics locally; these tests pin both directions.
"""

from __future__ import annotations

import pytest

from parquet_ingestor_spark.testing import driver_canon_probe


def test_probe_accepts_scalar_rows():
    driver_canon_probe(
        ["a", "b", "c"],
        [(1, 2.5, "x"), (2, None, "y"), (3, float("nan"), None)],
    )


def test_probe_rejects_list_cells_multi_column():
    # the exact r04 emb_whiten shape: (vec_id, array<double>)
    with pytest.raises(TypeError, match="unhashable"):
        driver_canon_probe(
            ["vec_id", "whitened"],
            [(1, [0.1, 0.2]), (2, [0.3, 0.4])],
        )


def test_probe_rejects_list_cells_single_column():
    # pandas' single-column sort path compares instead of factorizing;
    # the probe factorizes object columns explicitly so this is still
    # caught
    with pytest.raises(TypeError, match="unhashable"):
        driver_canon_probe(["v"], [([1, 2],), ([3],)])


def test_probe_accepts_empty_result():
    driver_canon_probe(["a"], [])


def test_rounding_battery_engines_agree(spark):
    """The r5 incident detector (round-5 verdict #6): both engines must
    produce the same integer for CAST(round(x * 10^d) AS BIGINT) on
    every rounding-edge double — exact halves, ±1 ulp around halves,
    negative ties, magnitudes where ulp > 10^-d. If this ever fails,
    the failing edges (not the operators) are the bug."""
    import duckdb

    from parquet_ingestor_spark.testing import rounding_battery

    assert rounding_battery(spark, duckdb.connect()) == []


def test_env_fingerprint_shape():
    from parquet_ingestor_spark.testing import env_fingerprint

    fp = env_fingerprint()
    assert set(fp) == {
        "python", "pyspark", "duckdb", "pandas", "pyarrow", "numpy"
    }
    assert all(isinstance(v, str) and v for v in fp.values())
