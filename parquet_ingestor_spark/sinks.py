"""Sink layer — the reference's encoder/sink plane (O10-O14) on
Spark's native writers.

The reference encodes batches to Parquet with codec ∈ {none, snappy,
gzip, zstd} (reference: encoder/encoder_parquet.go:19-26) and writes
to S3 buffered or streaming-multipart (reference: sink/sink_s3.go).
Spark's ParquetFileFormat + committer subsumes both write modes; what
remains worth owning is the codec surface, output sizing, and the
path contract.

S3 note: the same writer targets ``s3a://bucket/prefix`` unchanged —
S3A's block-upload is the reference's streaming-multipart path
(fs.s3a.fast.upload), and the magic committer replaces its
write-then-ack choreography.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

#: Exact codec parity with the reference's enum
#: (encoder/encoder_parquet.go:19-26; "none" is parquet UNCOMPRESSED).
CODECS: tuple[str, ...] = ("none", "snappy", "gzip", "zstd")


@dataclass(frozen=True)
class SinkConfig:
    codec: str = "snappy"  # the reference's default in every example
    max_records_per_file: int = 5_000_000
    partition_cols: tuple[str, ...] = ()
    mode: str = "append"
    #: Columns to write parquet bloom filters for: point-lookup data
    #: skipping (`WHERE key = x` prunes row groups whose filter says
    #: "definitely absent") — the equality complement to min/max stats
    #: (range predicates) and Z-order (multi-dim ranges). Costs ~1 bit
    #: ×ndv per column per row group; spend it on high-cardinality
    #: lookup keys (ids, hashes), never low-cardinality dimensions
    #: where min/max already prunes.
    bloom_filter_cols: tuple[str, ...] = ()
    #: Expected distinct values per row group for sizing the filters.
    bloom_filter_ndv: int = 1_000_000

    def __post_init__(self) -> None:
        if self.codec not in CODECS:
            raise ValueError(
                f"unsupported codec {self.codec!r}; supported: {CODECS}"
            )


def write_parquet(df: DataFrame, path: str, cfg: SinkConfig | None = None) -> None:
    """The buffered/streaming sink write (O10-O13) — one call; Spark
    picks streaming encode + multipart upload on s3a automatically."""
    cfg = cfg or SinkConfig()
    writer = (
        df.write.mode(cfg.mode)
        .option("compression", cfg.codec if cfg.codec != "none" else "uncompressed")
        .option("maxRecordsPerFile", cfg.max_records_per_file)
    )
    for col in cfg.bloom_filter_cols:
        writer = writer.option(
            f"parquet.bloom.filter.enabled#{col}", "true"
        ).option(
            f"parquet.bloom.filter.expected.ndv#{col}",
            str(cfg.bloom_filter_ndv),
        )
    if cfg.partition_cols:
        writer = writer.partitionBy(*cfg.partition_cols)
    writer.parquet(path)


def resolve_path(base: str, key: str) -> str:
    """O14 sink path resolution (reference: sink/sink_s3.go:151-168):
    key → full object path under the sink prefix."""
    return f"{base.rstrip('/')}/{key.lstrip('/')}"


def compact_parquet(
    spark,
    path: str,
    target_mb: int = 512,
    codec: str = "zstd",
) -> int:
    """Small-file compaction — the sink-maintenance pass a streaming
    ingest needs at scale.

    Micro-batch sinks (reference flush loop; our foreachBatch writer)
    produce files sized by *time*, not by optimal scan granularity; at
    100 TB a reader's task count explodes and the namenode/listing
    cost dominates. This rewrites a parquet directory into
    ceil(total_bytes / target_mb) files: read → repartition to the
    byte-derived file count → write to a staging sibling → atomic
    directory swap (write-then-rename, the same durable-write-
    before-visibility discipline as the reference's ack path —
    ingestor commit ordering). On an object store, swap the prefix a
    reader resolves (or run under a table format's commit protocol)
    instead of rename.

    The two-rename swap is not atomic as a pair: a crash between them
    leaves the dataset stranded at ``._compact_old``. Entry therefore
    starts with crash recovery — restore a stranded ``old``, clear
    leftover ``old``/staging dirs — so a re-run always converges.
    Readers racing the swap on a shared local FS can still glimpse a
    missing path for the rename window; that (plus rename-less object
    stores) is what the table-format commit protocol is for.

    Returns the resulting file count. Row conservation is the test's
    contract: compaction must never change the data, only the layout.
    """
    import math
    import os
    import shutil

    # local-filesystem only: os.walk on an object-store URI yields
    # nothing (total=0 → n_files=1) and os.rename fails AFTER the
    # expensive rewrite — fail fast instead; object stores go through
    # a table format's commit protocol or prefix swap (docstring).
    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"compact_parquet is local-filesystem only, got {path!r}; "
            "on object stores use a table-format commit or prefix swap"
        )
    path = path.removeprefix("file://")

    staging = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    # recover from a prior crashed compaction before doing anything:
    # the two-rename swap can strand the dataset at `old`
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)  # crashed between the two renames
    if os.path.exists(old):
        shutil.rmtree(old)  # crashed before cleanup
    if os.path.exists(staging):
        shutil.rmtree(staging)  # incomplete prior staging write

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("compression", codec)
        .parquet(staging)
    )
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return n_files
