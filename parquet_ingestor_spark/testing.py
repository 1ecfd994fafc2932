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
