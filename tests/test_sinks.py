"""Codec round-trip parity — the reference's encoder test matrix
(encode → decode → exact row equality, all four codecs) re-expressed
against Spark's parquet writer."""

from __future__ import annotations

import os

import pytest

from parquet_ingestor_spark.sinks import CODECS, SinkConfig, resolve_path, write_parquet


@pytest.mark.parametrize("codec", CODECS)
def test_codec_roundtrip_exact(spark, tmp_path, codec):
    df = spark.range(1000).selectExpr(
        "id", "concat('item-', id) AS name", "id * 1.337 AS value"
    )
    out = str(tmp_path / codec)
    write_parquet(df, out, SinkConfig(codec=codec, mode="overwrite"))
    back = spark.read.parquet(out)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # parquet magic bytes, like the reference's PAR1 assertion
    part = next(
        f for f in os.listdir(out) if f.endswith(".parquet")
    )
    with open(os.path.join(out, part), "rb") as fh:
        assert fh.read(4) == b"PAR1"


def test_codec_actually_applied(spark, tmp_path):
    df = spark.range(50000).selectExpr("id", "repeat('x', 100) AS pad")
    sizes = {}
    for codec in ("none", "zstd"):
        out = str(tmp_path / f"c_{codec}")
        write_parquet(df, out, SinkConfig(codec=codec, mode="overwrite"))
        sizes[codec] = sum(
            os.path.getsize(os.path.join(out, f))
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
    assert sizes["zstd"] < sizes["none"] * 0.5  # compression really on


def test_invalid_codec_rejected():
    with pytest.raises(ValueError, match="unsupported codec"):
        SinkConfig(codec="lz77")


def test_max_records_per_file_bounds_output(spark, tmp_path):
    """The Spark-native analog of the reference's byte/count flush
    thresholds bounding object size."""
    df = spark.range(10_000).coalesce(1)
    out = str(tmp_path / "bounded")
    write_parquet(
        df, out, SinkConfig(max_records_per_file=2500, mode="overwrite")
    )
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(parts) == 4  # 10k rows / 2.5k cap


def test_resolve_path():
    assert (
        resolve_path("s3a://bucket/prefix/", "/2024/01/file.parquet")
        == "s3a://bucket/prefix/2024/01/file.parquet"
    )


def test_compact_parquet_conserves_rows_and_reduces_files(spark, tmp_path):
    """Compaction changes layout only: same rows/values, fewer files,
    old dir gone, staging cleaned up."""
    import os

    from parquet_ingestor_spark.sinks import compact_parquet

    path = str(tmp_path / "many")
    spark.range(0, 10_000).selectExpr(
        "id", "id * 2 AS v"
    ).repartition(64).write.parquet(path)
    before_files = sum(
        f.endswith(".parquet") for f in os.listdir(path)
    )
    assert before_files >= 32
    before = spark.read.parquet(path).selectExpr(
        "count(*) AS n", "sum(v) AS s"
    ).first()

    n_files = compact_parquet(spark, path, target_mb=512)
    assert n_files == 1

    after_files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(after_files) == 1
    after = spark.read.parquet(path).selectExpr(
        "count(*) AS n", "sum(v) AS s"
    ).first()
    assert (before.n, before.s) == (after.n, after.s)
    assert not os.path.exists(path + "._compact_tmp")
    assert not os.path.exists(path + "._compact_old")


def test_compact_parquet_rejects_object_store_paths(spark):
    import pytest

    from parquet_ingestor_spark.sinks import compact_parquet

    with pytest.raises(ValueError, match="local-filesystem only"):
        compact_parquet(spark, "s3a://bucket/prefix/data")


def test_compact_parquet_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between the two swap renames strands the dataset at
    ._compact_old; the next run must restore and converge. Leftover
    staging/old dirs from a crash-before-cleanup must also clear."""
    import os
    import shutil

    from parquet_ingestor_spark.sinks import compact_parquet

    path = str(tmp_path / "ds")
    spark.range(0, 1000).selectExpr("id", "id * 3 AS v").repartition(
        8
    ).write.parquet(path)
    want = spark.read.parquet(path).selectExpr(
        "count(*) AS n", "sum(v) AS s"
    ).first()

    # crash between rename(path, old) and rename(staging, path):
    # dataset absent from `path`, stranded at old; staging half-done
    os.rename(path, path + "._compact_old")
    os.makedirs(path + "._compact_tmp")
    open(path + "._compact_tmp/part-junk.parquet", "w").write("junk")

    n_files = compact_parquet(spark, path, target_mb=512)
    assert n_files == 1
    got = spark.read.parquet(path).selectExpr(
        "count(*) AS n", "sum(v) AS s"
    ).first()
    assert (want.n, want.s) == (got.n, got.s)
    assert not os.path.exists(path + "._compact_old")
    assert not os.path.exists(path + "._compact_tmp")

    # crash after both renames but before rmtree(old): old lingers
    shutil.copytree(path, path + "._compact_old")
    n_files = compact_parquet(spark, path, target_mb=512)
    assert n_files == 1
    assert not os.path.exists(path + "._compact_old")
    got = spark.read.parquet(path).selectExpr(
        "count(*) AS n", "sum(v) AS s"
    ).first()
    assert (want.n, want.s) == (got.n, got.s)


def test_bloom_filter_cols_written_and_readable(spark, tmp_path):
    """SinkConfig.bloom_filter_cols plumbs the parquet bloom options:
    the file carries the extra filter bytes (the observable footprint —
    pyarrow's metadata API doesn't expose the offsets), and an
    equality lookup over the written data stays correct."""
    import glob
    import os

    from parquet_ingestor_spark.sinks import SinkConfig, write_parquet

    df = spark.range(100_000).selectExpr(
        "id", "md5(cast(id as string)) AS h"
    ).coalesce(1)
    plain_dir, bloom_dir = str(tmp_path / "plain"), str(tmp_path / "bloom")
    write_parquet(df, plain_dir, SinkConfig(mode="overwrite"))
    write_parquet(
        df,
        bloom_dir,
        SinkConfig(
            mode="overwrite",
            bloom_filter_cols=("h",),
            bloom_filter_ndv=100_000,
        ),
    )
    size = lambda d: sum(
        os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet")
    )
    # ~100k-ndv filter ≈ 100+ KB: detectably larger, not accidentally huge
    delta = size(bloom_dir) - size(plain_dir)
    assert 50_000 < delta < 1_000_000, delta
    needle = spark.read.parquet(bloom_dir).where(
        "h = md5(cast(77 as string))"
    )
    assert [r.id for r in needle.collect()] == [77]


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_format_breadth_roundtrip_exact(spark, tmp_path, fmt):
    """Beyond parquet, the Spark-native sink/source pair must
    round-trip ORC, JSON-lines and CSV byte-losslessly for the
    envelope column shapes the pipeline writes (ints, strings,
    doubles carried as strings to dodge text-format float repr)."""
    from parquet_ingestor_spark.catalog import table

    src = (
        table(spark, "/root/testdata/sf0.001", "orders")
        .selectExpr(
            "o_orderkey",
            "o_orderstatus",
            "cast(round(o_totalprice * 100, 0) as bigint) AS price_cents",
        )
        .orderBy("o_orderkey")
    )
    path = str(tmp_path / f"rt.{fmt}")
    w = src.write.format(fmt).mode("overwrite")
    if fmt == "csv":
        w = w.option("header", True)
    w.save(path)
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", True).option("inferSchema", True)
    if fmt in ("json",):
        back = r.schema(src.schema).load(path)
    else:
        back = r.load(path)
    a = sorted(tuple(x) for x in src.collect())
    b = sorted(tuple(x) for x in back.collect())
    assert a == b, fmt
