"""Small column-expression helpers shared by queries and operators.

Everything here composes built-in ``pyspark.sql.functions`` — JVM-side,
codegen-friendly. No Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def ts_lit(df: DataFrame, col: str, value: str) -> Column:
    """A timestamp literal cast to ``col``'s exact timestamp flavor.

    The driver testdata carries naive timestamps, which Spark reads as
    TIMESTAMP_NTZ when inference is on and TIMESTAMP otherwise; casting
    the literal to the column's own dtype keeps the comparison
    pushdown-eligible (a raw range predicate reaches the parquet scan's
    row-group stats; wrapping the *column* in a function would not).
    """
    dtype = dict(df.dtypes)[col]
    return F.lit(value).cast(dtype)


def round2(col: str | Column) -> Column:
    """Round a double aggregate to 2 decimals.

    Float sums are order-sensitive; both engines (Spark, the DuckDB
    oracle) compute the same mathematical value but may differ in the
    last ulps. Rounding well above the noise floor makes the
    differential hash stable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 2)
