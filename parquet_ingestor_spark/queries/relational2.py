"""Q27+ — breadth of the scalar/advanced relational surface: string /
date / array / JSON function coverage, full outer joins, cube, TPC-H
Q3-shaped combo, approximate distinct. All built-in functions —
whole-stage codegen end to end."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..functions import int_e, ts_lit
from . import register


@register(
    "q27_string_funcs",
    oracle="""
        SELECT n_nationkey,
               concat_ws('/', n_name, CAST(n_regionkey AS VARCHAR)) AS tagged,
               lpad(n_name, 12, '.') AS padded,
               replace(n_name, 'NATION', 'N') AS replaced,
               translate(n_name, 'AEIOU', 'aeiou') AS translated,
               regexp_replace(n_name, '[0-9]+', '#') AS masked,
               split_part(n_name, '_', 2) AS num_part,
               reverse(n_name) AS rev,
               CAST(length(n_name) AS INTEGER) AS name_len
        FROM nation
        ORDER BY n_nationkey
    """,
    doc="String function breadth over nation.",
    tags=("relational", "scalar"),
)
def q27_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "nation")
        .select(
            "n_nationkey",
            F.concat_ws("/", "n_name", F.col("n_regionkey").cast("string")).alias(
                "tagged"
            ),
            F.lpad("n_name", 12, ".").alias("padded"),
            F.replace(F.col("n_name"), F.lit("NATION"), F.lit("N")).alias(
                "replaced"
            ),
            F.translate("n_name", "AEIOU", "aeiou").alias("translated"),
            F.regexp_replace("n_name", "[0-9]+", "#").alias("masked"),
            F.split_part(F.col("n_name"), F.lit("_"), F.lit(2)).alias("num_part"),
            F.reverse("n_name").alias("rev"),
            F.length("n_name").alias("name_len"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "q28_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(quarter(o_orderdate) AS INTEGER) AS q,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
               CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')
                    AS INTEGER) AS days_to_y2k
        FROM orders
        ORDER BY o_orderkey
    """,
    doc="Date/time function breadth over orders (dow normalized: Spark "
    "is 1=Sunday, DuckDB 0=Sunday).",
    tags=("relational", "scalar"),
)
def q28_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.datediff(
            ts_lit(orders, "o_orderdate", "2000-01-01"), F.col("o_orderdate")
        ).alias("days_to_y2k"),
    ).orderBy("o_orderkey")


@register(
    "q29_array_funcs",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_toks,
               CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
               list_contains(toks, 'spark') AS has_spark,
               array_to_string(list_sort(list_distinct(toks))[1:3], ',')
                   AS first3_sorted
        FROM t
        ORDER BY doc_id
    """,
    doc="Array function breadth over tokenized documents.",
    tags=("relational", "scalar", "array"),
)
def q29_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(toks).alias("n_toks"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            F.array_contains(toks, "spark").alias("has_spark"),
            F.concat_ws(
                ",", F.slice(F.sort_array(F.array_distinct(toks)), 1, 3)
            ).alias("first3_sorted"),
        )
        .orderBy("doc_id")
    )


@register(
    "q30_json_funcs",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(round(AVG(value) * 100) AS BIGINT) AS avg_value_e2
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    doc="JSON extraction (get_json_object ≡ json_extract_string).",
    tags=("relational", "scalar", "json"),
)
def q30_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .select(
            F.get_json_object("props", "$.k").try_cast("int").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("cnt"),
            int_e(F.avg("value"), 2).alias("avg_value_e2"),
        )
        .orderBy("k")
    )


@register(
    "q31_full_outer",
    oracle="""
        WITH c AS (
            SELECT c_nationkey AS nationkey,
                   CAST(COUNT(*) AS BIGINT) AS customers
            FROM customer GROUP BY 1
        ), s AS (
            SELECT s_nationkey AS nationkey,
                   CAST(COUNT(*) AS BIGINT) AS suppliers
            FROM supplier GROUP BY 1
        )
        SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
               coalesce(c.customers, 0) AS customers,
               coalesce(s.suppliers, 0) AS suppliers
        FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        ORDER BY nationkey
    """,
    doc="Full outer join: nations with customers and/or suppliers.",
    tags=("relational", "join"),
)
def q31_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("suppliers"))
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("customers", F.lit(0)).alias("customers"),
            F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
        )
        .orderBy("nationkey")
    )


@register(
    "q32_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               CAST(round(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100)
                    AS BIGINT) AS revenue_e2,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue_e2 DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective join + aggregate + global top-k.",
    tags=("relational", "join", "flagship"),
)
def q32_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders")
    orders = orders.filter(
        F.col("o_orderdate") < ts_lit(orders, "o_orderdate", "1998-01-01")
    )
    lineitem = table(spark, sf_dir, "lineitem")
    lineitem = lineitem.filter(
        F.col("l_shipdate") > ts_lit(lineitem, "l_shipdate", "1998-01-01")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            int_e(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue_e2")
        )
        .select(
            "l_orderkey",
            "revenue_e2",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue_e2"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q33_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(round(SUM(l_quantity) * 100) AS BIGINT) AS sum_qty_e2
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE: all 2^2 grouping combinations in one pass.",
    tags=("relational", "aggregate"),
)
def q33_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            int_e(F.sum("l_quantity"), 2).alias("sum_qty_e2"),
        )
        .orderBy(
            F.asc_nulls_first("l_returnflag"),
            F.asc_nulls_first("l_linestatus"),
        )
    )


def _q34_oracle() -> str:
    from ..operators.sketches import _hll_det_est_sql, hll_det_regs_sql

    return f"""
        WITH {hll_det_regs_sql("orders", "o_orderpriority", "o_custkey")},
        est AS (
            SELECT o_orderpriority,
                   CAST(round(({_hll_det_est_sql()}) * 10000) AS BIGINT)
                       AS approx_custs_e4
            FROM r GROUP BY o_orderpriority
        ),
        e AS (
            SELECT o_orderpriority,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
            GROUP BY o_orderpriority
        )
        SELECT est.o_orderpriority, est.approx_custs_e4, e.exact_custs
        FROM est JOIN e USING (o_orderpriority)
        ORDER BY est.o_orderpriority
    """


@register(
    "q34_approx_distinct",
    oracle=_q34_oracle(),
    doc="Approximate distinct customers per order priority via the "
    "DETERMINISTIC md5-register HLL (4096 registers) — the O(1)-memory "
    "distinct that replaces exact COUNT(DISTINCT) shuffles at 100 TB, "
    "made hash-verifiable end to end (r5 verdict #3: the "
    "events_hll_users playbook applied to the relational inventory). "
    "Spark's native HyperLogLog++ approx_count_distinct remains the "
    "production library surface, pinned by the <5%-error invariant "
    "test (test_operators_quality).",
    tags=("relational", "aggregate", "approx", "sketch"),
)
def q34_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keyed register aggregate (≤ priorities × 4096 tiny rows)
    plus the toy-SF exact column for error auditing; at 100 TB only
    the register aggregate survives — mergeable, shuffle state
    independent of row count."""
    from ..operators.sketches import hll_det_estimate, hll_det_registers

    ords = (
        table(spark, sf_dir, "orders")
        .where(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderpriority").isNotNull()
        )
        .select("o_orderpriority", "o_custkey")
    )
    est = hll_det_estimate(
        hll_det_registers(ords, "o_orderpriority", "o_custkey"),
        "o_orderpriority",
    ).select(
        "o_orderpriority", F.col("est_e4").alias("approx_custs_e4")
    )
    exact = ords.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_custs")
    )
    return est.join(exact, "o_orderpriority").orderBy("o_orderpriority")
