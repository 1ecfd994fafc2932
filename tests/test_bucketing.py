"""Bucketed co-located joins — the pre-shuffle technique for repeated
large-×-large joins (SURVEY §2.2 / engine scale story): both tables
bucketed by the join key at write time join with ZERO exchange at read
time; at 100 TB this converts every recurring orders⋈lineitem join
from a full shuffle into a local zip of bucket files."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    # saveAsTable needs a warehouse; bucket both fact tables by the key.
    # Disable auto-broadcast: at test SF everything broadcasts, which
    # masks the bucketed sort-merge path this suite asserts (at 100 TB
    # neither side broadcasts — that is the point of bucketing).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # keep the bucketed scan even where the planner deems it unhelpful
    # (point-lookup pruning test needs it)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")


def test_bucketed_join_has_no_exchange(spark, sf_dir, warehouse):
    li, od = spark.table("b_lineitem"), spark.table("b_orders")
    joined = li.join(od, li.l_orderkey == od.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: sort-merge join directly over bucket files
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"

    # and it computes the same thing as the plain join
    pl, po = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
    )
    assert joined.count() == pl.join(po, pl.l_orderkey == po.o_orderkey).count()


def test_bucket_pruning_on_key_filter(spark, warehouse):
    df = spark.table("b_orders").filter("o_orderkey = 42")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # bucket pruning: only 1 of 8 buckets scanned for a point lookup
    assert "SelectedBucketsCount: 1 out of 8" in plan
