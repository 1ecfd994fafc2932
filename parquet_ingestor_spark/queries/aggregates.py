"""Q35+ — statistical aggregates, percentiles, grouping sets, pivot.

All two-phase hash aggregates (partial map-side, merge reduce-side);
percentile is the exception — exact percentile needs the group's full
value set, so it is the one aggregate whose shuffle is O(rows). The
approx_percentile variant (sketch-mergeable, O(1) memory) is the
100 TB path; both ship, mirroring the exact/approx pairing used for
dedup and similarity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..functions import round2
from . import register


@register(
    "q35_stats_aggs",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_extendedprice), 2) AS price_stddev,
               round(var_samp(l_discount), 6) AS disc_var,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
               round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
               round(MIN(l_extendedprice), 2) AS min_price,
               round(MAX(l_extendedprice), 2) AS max_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Statistical aggregates: stddev/variance/covariance/correlation.",
    tags=("relational", "aggregate", "stats"),
)
def q35_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            round2(F.stddev_samp("l_extendedprice")).alias("price_stddev"),
            F.round(F.var_samp("l_discount"), 6).alias("disc_var"),
            round2(F.covar_samp("l_quantity", "l_extendedprice")).alias(
                "qty_price_covar"
            ),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_corr"
            ),
            round2(F.min("l_extendedprice")).alias("min_price"),
            round2(F.max("l_extendedprice")).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q36_percentiles",
    oracle="""
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 2) AS p99
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="Exact continuous percentiles (Spark percentile ≡ DuckDB "
    "quantile_cont). Exact needs the full group in memory — see "
    "q37_approx_percentiles for the sketch-based scale path.",
    tags=("relational", "aggregate", "stats"),
)
def q36_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            round2(F.percentile("o_totalprice", 0.5)).alias("p50"),
            round2(F.percentile("o_totalprice", 0.9)).alias("p90"),
            round2(F.percentile("o_totalprice", 0.99)).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q37_approx_percentiles",
    oracle=None,  # sketch-based (KLL/GK) results are engine-specific;
    # the test bounds error against the exact percentiles.
    doc="approx_percentile — mergeable-sketch percentiles, the O(1)-"
    "memory variant that replaces exact percentile at 100 TB.",
    tags=("relational", "aggregate", "stats", "approx"),
)
def q37_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            round2(
                F.approx_percentile("o_totalprice", 0.5, 10000)
            ).alias("p50"),
            round2(
                F.approx_percentile("o_totalprice", 0.9, 10000)
            ).alias("p90"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q48_conditional_aggs",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) FILTER (WHERE value > 250) AS BIGINT) AS hi_cnt,
               bool_or(value > 480) AS has_extreme,
               bool_and(value > 0) AS all_positive,
               round(SUM(CASE WHEN user_id % 2 = 0 THEN value ELSE 0 END), 2)
                   AS even_user_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Conditional/boolean aggregates: count_if, bool_or/bool_and, "
    "CASE-gated sums — all map-side-combinable.",
    tags=("relational", "aggregate"),
)
def q48_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 250).alias("hi_cnt"),
            F.bool_or(F.col("value") > 480).alias("has_extreme"),
            F.bool_and(F.col("value") > 0).alias("all_positive"),
            round2(
                F.sum(
                    F.when(F.col("user_id") % 2 == 0, F.col("value")).otherwise(
                        0.0
                    )
                )
            ).alias("even_user_value"),
        )
        .orderBy("event_type")
    )


@register(
    "q38_grouping_sets",
    oracle="""
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               round(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    doc="Explicit GROUPING SETS: per-priority, per-status, grand total "
    "in one pass over the fact table.",
    tags=("relational", "aggregate"),
)
def q38_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS cnt,
               round(SUM(o_totalprice), 2) AS total
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
        """
    )


@register(
    "q39_pivot",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_f,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_o,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="Pivot (long→wide): Spark pivot ≡ FILTERed aggregates. Pivot "
    "values are declared, not discovered — at scale an undeclared "
    "pivot triggers an extra distinct scan.",
    tags=("relational", "aggregate", "pivot"),
)
def q39_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("status_f"),
        F.coalesce("O", F.lit(0)).alias("status_o"),
        F.coalesce("P", F.lit(0)).alias("status_p"),
    ).orderBy("o_orderpriority")
