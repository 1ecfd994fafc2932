"""Differential-oracle harness: Spark result vs DuckDB SQL result.

Mirrors the driver's correctness gate: run the Spark DataFrame and the
oracle SQL over the same parquet tables, canonicalize every value
(floats → 4 decimals, timestamps → ISO-8601, NULL → 'NULL'), sort
columns by name and rows lexicographically (order-insensitive), then
compare.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
from pyspark.sql import DataFrame

from .catalog import TABLES


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canon_value(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 4):.4f}"
    if isinstance(v, Decimal):
        return f"{round(float(v), 4):.4f}"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), canon_value(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        "|".join(canon_value(row[i]) for i in order) for row in rows
    )


def spark_canon(df: DataFrame) -> list[str]:
    cols = df.columns
    return canon_rows(cols, [tuple(r) for r in df.collect()])


def driver_canon_probe(columns: list[str], rows: list[tuple]) -> None:
    """Reproduce the DRIVER's canonicalization mechanics on a result
    slice so driver-only failure classes surface locally.

    The driver's correctness gate canonicalizes with pandas: sort
    columns by name, then ``sort_values`` over ALL columns before
    value-hashing. pandas factorizes object columns to sort them, and
    factorize hashes every cell — an unhashable cell (list / dict /
    ndarray, e.g. an ``array<double>`` output column) raises
    ``TypeError: unhashable type``. That is exactly how ``emb_whiten``
    shipped a red driver row in round 4 while this repo's string-based
    :func:`canon_rows` accepted it. This probe runs the same pandas
    operations (plus an explicit per-column factorize, so even a
    single-column list output is caught) and lets the TypeError
    propagate; value comparison stays with :func:`canon_rows`.
    """
    import pandas as pd

    pdf = pd.DataFrame.from_records(list(rows)[:256], columns=columns)
    cols = sorted(pdf.columns)
    if len(pdf) == 0:
        return
    for c in cols:
        if pdf[c].dtype == object:
            pd.factorize(pdf[c])  # raises on unhashable cells
    pdf[cols].sort_values(by=cols)


def duck_canon(con: "duckdb.DuckDBPyConnection", sql: str) -> list[str]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return canon_rows(cols, cur.fetchall())


def diff_summary(a: list[str], b: list[str], limit: int = 5) -> str:
    sa, sb = set(a), set(b)
    only_a = sorted(sa - sb)[:limit]
    only_b = sorted(sb - sa)[:limit]
    return (
        f"spark_rows={len(a)} oracle_rows={len(b)}\n"
        f"only_spark={only_a}\nonly_oracle={only_b}"
    )
