"""Z-order layout: Morton-key correctness against a Python reference
and the property that justifies the operator — parquet footer min/max
boxes tight in EVERY clustered dimension, verified with pyarrow."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from parquet_ingestor_spark.layout import (
    ZORDER_BITS,
    morton_interleave,
    write_zordered,
    zorder_key,
)


def _py_morton(vals: list[int], bits: int) -> int:
    z = 0
    k = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * k + j)
    return z


def test_morton_matches_python_reference(spark):
    rows = [(a, b) for a in range(0, 256, 17) for b in range(0, 256, 23)]
    df = spark.createDataFrame(rows, ["a", "b"]).withColumn(
        "z", morton_interleave([F.col("a"), F.col("b")])
    )
    for r in df.collect():
        assert r.z == _py_morton([r.a, r.b], ZORDER_BITS), r


def test_morton_three_way_and_bounds(spark):
    rows = [(255, 255, 255), (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1)]
    df = spark.createDataFrame(rows, ["a", "b", "c"]).withColumn(
        "z", morton_interleave([F.col("a"), F.col("b"), F.col("c")])
    )
    got = {tuple(r[:3]): r.z for r in df.collect()}
    assert got[(255, 255, 255)] == (1 << 24) - 1
    assert got[(0, 0, 0)] == 0
    # column j owns bit positions i*k + j
    assert got[(1, 0, 0)] == 1 and got[(0, 1, 0)] == 2 and got[(0, 0, 1)] == 4


def test_zorder_key_rank_buckets_handle_skew(spark):
    """Rank bucketing (quantile edges) spreads even a heavily skewed
    column across the bucket space — uniform min/max quantization
    would collapse the Zipf head into one bucket."""
    rows = [(i, 1.0 if i < 900 else float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "v"])
    keyed = zorder_key(df, ["v"])
    n_distinct = keyed.select("_z").distinct().count()
    assert n_distinct >= 2  # head and tail separate
    # keys are within the 8-bit bucket range for k=1
    mx = keyed.agg(F.max("_z")).first()[0]
    assert 0 <= mx <= 255


@pytest.fixture(scope="module")
def grid_layouts(spark, tmp_path_factory):
    """A uniform 2-D grid written two ways: Z-ordered on (x, y) vs
    range-sorted on x alone, 16 files each."""
    base = tmp_path_factory.mktemp("layouts")
    df = (
        spark.range(40_000)
        .select(
            (F.hash("id", F.lit(1)).cast("double") / (1 << 31) / 2 + 0.5).alias("x"),
            (F.hash("id", F.lit(2)).cast("double") / (1 << 31) / 2 + 0.5).alias("y"),
            F.col("id"),
        )
    )
    z_path = str(base / "zorder")
    x_path = str(base / "xsort")
    write_zordered(df, z_path, ["x", "y"], n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(x_path)
    )
    return z_path, x_path


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = float("inf"), float("-inf")
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo, hi = min(lo, st.min), max(hi, st.max)
        out.append((lo, hi))
    return out


def test_zorder_bounds_every_dimension(grid_layouts):
    """The data-skipping property, read straight from parquet footers:
    Z-ordered files have per-file extent ≲ 1/3 of the domain in BOTH
    x and y (16 files ≈ 4×4 quadrants of the Z-curve), while the
    x-sorted layout leaves y unclustered (extent ≈ 1)."""
    z_path, x_path = grid_layouts
    # repartitionByRange samples its boundaries, so per-file extents
    # wobble run to run (observed means 0.30-0.42 over repeated
    # builds); the bound leaves margin while still excluding the
    # unclustered value (≈1.0) by a wide gap
    for col in ("x", "y"):
        spans = [hi - lo for lo, hi in _file_ranges(z_path, col)]
        assert sum(spans) / len(spans) < 0.6, (col, spans)
    y_spans = [hi - lo for lo, hi in _file_ranges(x_path, "y")]
    assert sum(y_spans) / len(y_spans) > 0.9  # one-column sort: y unbounded


def test_zorder_prunes_band_predicates_on_both_columns(grid_layouts):
    """A selective band on EITHER column intersects only a minority of
    Z-ordered files' footer ranges — the reader-visible win. The
    x-sorted layout prunes x-bands equally well but reads EVERY file
    for a y-band."""
    z_path, x_path = grid_layouts

    def files_hit(path: str, col: str, lo: float, hi: float) -> float:
        rngs = _file_ranges(path, col)
        return sum(1 for flo, fhi in rngs if fhi >= lo and flo <= hi) / len(rngs)

    # sampling-dependent boundaries: observed 0.25-0.44 over repeated
    # builds; 0.7 keeps headroom while preserving the qualitative gap
    # to the x-sorted layout's 1.0
    assert files_hit(z_path, "x", 0.4, 0.45) <= 0.7
    assert files_hit(z_path, "y", 0.4, 0.45) <= 0.7
    assert files_hit(x_path, "y", 0.4, 0.45) == 1.0


def test_zorder_preserves_rows(spark, grid_layouts):
    z_path, _ = grid_layouts
    assert spark.read.parquet(z_path).count() == 40_000


def test_zorder_rejects_too_many_columns(spark):
    df = spark.range(10).selectExpr("id a", "id b", "id c", "id d", "id e")
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b", "c", "d", "e"])
