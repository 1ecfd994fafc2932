"""SparkSession factory.

Design notes (100 TB target, tested on local[32]):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace most hand-tuning at scale.
- ``spark.sql.shuffle.partitions`` is a *starting* value; AQE coalesces
  down on small inputs and a real cluster raises it (rule of thumb:
  2-3× total cores, or target ~128-256 MB per shuffle partition).
- Session timezone pinned to UTC: the reference engine computes its
  time-partitioned sink keys in UTC (reference: ingestor/ingestor.go:789),
  and all testdata timestamps are naive-UTC.
- Parquet codec snappy: the reference's default in every example
  (reference: examples/basic/main.go:79, encoder/encoder_parquet.go:74).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Knobs that matter at 100 TB, with the local-test value and the
# rationale for what changes on a real cluster.
_BASE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.compression.codec": "snappy",
    # AQE: coalesce small shuffles, split skewed partitions, convert
    # sort-merge joins to broadcast when runtime stats allow.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/supplier at any SF; doc/embedding
    # centroid tables) should broadcast. 64 MB is safe with >=8 GB
    # executors; the explicit broadcast() hints in queries/ do not
    # depend on this threshold.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for every pandas_udf / mapInPandas / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MB input splits: the parquet-scan parallelism driver.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Bound output file size at the sink (reference batches by
    # bytes/count before each flush — O7; this is the Spark-native
    # equivalent of bounding the encoded object size).
    "spark.sql.files.maxRecordsPerFile": "5000000",
    # The wide-aggregate operators (MinHash 64-min, SimHash 63-vote)
    # produce large codegen units; the default 100-entry generated-
    # class cache evicts them across a mixed workload, forcing repeated
    # multi-second janino recompiles.
    "spark.sql.codegen.cache.maxEntries": "2000",
    "spark.ui.enabled": "false",
    # The events table stores TIMESTAMP(NANOS), which Spark's vectorized
    # reader rejects; read the raw int64 and rebuild the timestamp in
    # catalog.table() (µs truncation — outputs never expose raw ns).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
}


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        return max(1, int(cpus))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "parquet-ingestor-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    on a cluster, pass None and submit with your cluster master — every
    other knob here is cluster-appropriate as-is.
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_BASE_CONF)
    # Start shuffle width at core count; AQE coalesces below it when the
    # data is small and a cluster deployment overrides it upward.
    conf.setdefault("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    conf["spark.default.parallelism"] = str(cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
