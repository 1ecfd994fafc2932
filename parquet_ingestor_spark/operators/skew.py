"""Skew-mitigation primitives: salted aggregation and salted join.

AQE's skew-join split handles most skew automatically; salting is the
explicit technique for the cases AQE can't fix — skewed *aggregation*
keys (one reducer owns the hot group) and skewed broadcast-ineligible
joins. Two-phase salted aggregation: shard the hot key across S
sub-keys, partially aggregate per shard, then merge shards — the hot
group's work spreads over S reducers at the cost of an extra (tiny)
final aggregation over S×groups rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..queries import register

DEFAULT_SALTS = 8


def salted_count_sum(
    df: DataFrame,
    key: str,
    value: str,
    salts: int = DEFAULT_SALTS,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """groupBy(key).agg(count, sum) with two-phase salting.

    Phase 1 shuffles on (key, salt) — the hot key spreads across
    ``salts`` reducers; phase 2 shuffles S×|groups| tiny partials.

    The salt is a content hash of the full row (``salt_cols`` narrows
    it), NOT monotonically_increasing_id: mid-based salts depend on
    partition layout and row order, so a partially recomputed map
    stage after a fetch failure could re-salt rows into different
    (key, salt) shards and double-count or drop them. A content hash
    re-derives the same shard on every recomputation.
    """
    salt_src = [F.col(c) for c in (salt_cols or df.columns)]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_src), F.lit(salts)).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_cnt"), F.sum(value).alias("_sum")
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("cnt"), F.sum("_sum").alias("total")
    )


def salted_join_counts(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salts: int = DEFAULT_SALTS,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skewed equi-join: salt the fact side, explode the (small) dim
    side S× so every (key, salt) shard finds its dim row. Use when the
    dim is too big to broadcast and the fact key is skewed. The salt
    is a content hash (see salted_count_sum) so task re-execution
    re-derives identical shards."""
    salt_src = [F.col(c) for c in (salt_cols or facts.columns)]
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_src), F.lit(salts)).cast("int")
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted_facts.join(
        exploded_dim,
        (F.col(fact_key) == F.col(dim_key)) & (salted_facts._salt == exploded_dim._salt),
    ).drop("_salt")


@register(
    "skew_salted_agg",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               round(SUM(value), 2) AS total
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Two-phase salted aggregation over a low-cardinality (≡ skewed "
    "at scale) key — must produce exactly the plain groupBy result.",
    tags=("skew", "aggregate"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = salted_count_sum(
        table(spark, sf_dir, "events"), "event_type", "value"
    )
    return out.select(
        "event_type", "cnt", F.round("total", 2).alias("total")
    ).orderBy("event_type")
