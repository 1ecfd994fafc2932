#!/usr/bin/env python
"""Warehouse-maintenance tour: the operators that keep a landed
dataset healthy, chained on the smallest testdata SF —

    profile  → accept the drop (nulls / cardinalities / ranges)
    diff     → what changed vs the previous snapshot
    scd2     → fold the changes into the versioned dimension
    compact  → rewrite the small-file sink output
    z-order  → recluster for multi-dimension data skipping

Run: python examples/warehouse_maintenance.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from parquet_ingestor_spark.catalog import table
from parquet_ingestor_spark.layout import write_zordered
from parquet_ingestor_spark.operators.profile import profile_table
from parquet_ingestor_spark.operators.scd import scd2_apply, table_diff
from parquet_ingestor_spark.session import get_spark
from parquet_ingestor_spark.sinks import compact_parquet


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-maintenance", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    print("\n=== 1. profile: accept the new drop")
    orders = table(spark, sf_dir, "orders")
    profile_table(orders).show(truncate=40)

    print("=== 2. diff: orders vs a perturbed next snapshot")
    newv = orders.where(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.col("o_totalprice")
        + F.when(F.col("o_orderkey") % 89 == 0, 1.0).otherwise(0.0),
    )
    diff = table_diff(orders, newv, ["o_orderkey"])
    diff.groupBy("change_type").count().show()

    print("=== 3. scd2: fold segment changes into the dimension")
    cur = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.lit("1995-01-01").cast("timestamp").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    upd = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.concat(F.lit("SEG-"), F.max("o_orderpriority")).alias("seg"),
        F.max("o_orderdate").alias("ts"),
    )
    dim = scd2_apply(cur, upd)
    dim.groupBy("is_current").count().show()

    print("=== 4. merge: apply a CDC feed (updates + deletes + upserts)")
    from parquet_ingestor_spark.operators.scd import merge_apply

    base = orders.where(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    feed = orders.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, "D").otherwise("U").alias("op"),
        F.lit("P").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    merged = merge_apply(base, feed, key="o_orderkey")
    print(f"base rows: {base.count()}  after merge: {merged.count()}")

    print("=== 5. incremental view: fold 3 lineitem batches, equal to batch")
    from parquet_ingestor_spark.operators.matview import (
        finalize_pricing,
        fold_partials,
        pricing_partials,
    )

    li = table(spark, sf_dir, "lineitem")
    state = None
    for i in range(3):
        state = fold_partials(
            state, pricing_partials(li.where(F.col("l_orderkey") % 3 == i))
        )
    finalize_pricing(state).show()

    with tempfile.TemporaryDirectory() as tmp:
        print("=== 6. compact: rewrite a fragmented sink directory")
        frag = os.path.join(tmp, "frag")
        orders.repartition(24).write.parquet(frag)
        n_before = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
        n_after = compact_parquet(spark, frag, target_mb=64)
        print(f"files: {n_before} -> {n_after}")

        print("=== 7. z-order: recluster for 2-dim data skipping")
        zdir = os.path.join(tmp, "zorders")
        write_zordered(
            table(spark, sf_dir, "lineitem"),
            zdir,
            ["l_partkey", "l_suppkey"],
            n_files=8,
        )
        n_z = len([f for f in os.listdir(zdir) if f.endswith(".parquet")])
        print(f"z-ordered files: {n_z}")

    return spark


if __name__ == "__main__":
    main().stop()
