"""Table profiling: per-column data-quality statistics in one pass —
the DESCRIBE/deequ-style audit a pipeline runs on every new drop
before trusting it (null rates, cardinalities, value ranges).

Reference parity: the reference engine validates per-record envelope
shape at ingest (/root/reference/ingestor/ingestor.go error routing);
column-level profiling extends that to dataset-level acceptance checks
(SURVEY.md §2 extensions).

Scale notes: everything except distinct counts folds into ONE
map-side-combinable aggregate over a single scan (count/nulls/min/max
are associative). Exact per-column distinct counts make Spark plan an
Expand (input × #profiled-columns before partial aggregation) — the
honest exact shape, kept here because the oracle hash-checks it; at
100 TB swap ``exact_distinct=False`` to fold HLL sketches
(``approx_count_distinct``) into the same single pass with no Expand,
the trade the q34/events_hll_users entries already demonstrate.
Output is #columns rows either way.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..catalog import table
from ..queries import register


def _fmt(col, dtype: T.DataType):
    """Type-aware string rendering that both engines produce
    bit-identically: integers/strings cast directly, doubles go
    through DECIMAL(18,2) (shortest-double repr differs per engine),
    timestamps through the repo's ns/µs-proof date_format rule.
    Applied AFTER the min/max aggregate, so ordering is the column's
    native order (a lexicographic min over formatted numerics would
    rank "9.00" above "100.00")."""
    if isinstance(dtype, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return col.cast("decimal(18,2)").cast("string")
    return col.cast("string")


def profile_table(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """One-pass column profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value), one row per profiled column."""
    cols = cols or df.columns
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        nd = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
            nd.alias(f"{c}__nd"),
            _fmt(F.min(F.col(c)), dtypes[c]).alias(f"{c}__mn"),
            _fmt(F.max(F.col(c)), dtypes[c]).alias(f"{c}__mx"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nn`, `{c}__nd`, `{c}__mn`, `{c}__mx`" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    ).orderBy("column")


_ORDERS_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS "column",
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {fmt.format(agg=f"MIN({c})")} AS min_value,
           {fmt.format(agg=f"MAX({c})")} AS max_value
    FROM orders"""
    for c, fmt in (
        ("o_orderkey", "CAST({agg} AS VARCHAR)"),
        ("o_custkey", "CAST({agg} AS VARCHAR)"),
        ("o_orderstatus", "{agg}"),
        ("o_totalprice", "CAST(CAST({agg} AS DECIMAL(18,2)) AS VARCHAR)"),
        ("o_orderdate", "strftime({agg}, '%Y-%m-%d %H:%M:%S')"),
        ("o_orderpriority", "{agg}"),
    )
) + ' ORDER BY "column"'


@register(
    "table_profile_orders",
    oracle=_ORDERS_PROFILE_ORACLE,
    doc="One-pass per-column profile of the orders table: null count, "
    "exact distinct count, type-aware min/max — the dataset acceptance "
    "audit (deequ/DESCRIBE shape).",
    tags=("profiling", "aggregate"),
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(table(spark, sf_dir, "orders"))
