"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's built-in ``hll_sketch_agg`` family).

``q34_approx_distinct`` already covers one-shot approximate distinct
(HyperLogLog++). What THIS module adds is the property that matters
operationally at 100 TB: HLL sketches are a commutative monoid, so
per-shard / per-micro-batch partial sketches union losslessly into
the same estimate as sketching the whole stream at once. That is the
state shape an incremental pipeline stores (one small binary per key
per batch) instead of re-scanning history — the same
fold-and-merge discipline as ``text_heavy_hitters_incremental``'s
Misra-Gries summaries, applied to cardinality.

Everything is built-in JVM aggregates (no UDF anywhere); the sketch
binaries are a few KB per key, so the merge layer's shuffle is
keys × shards rows regardless of corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..queries import register

#: log2 of the HLL register count (DataSketches lgConfigK). 12 → 4096
#: registers ≈ 1.6% relative standard error, a few KB per sketch.
HLL_LGK = 12


def hll_distinct_by(
    df: DataFrame, key: str, val: str, lgk: int = HLL_LGK
) -> DataFrame:
    """One-shot per-key distinct estimate: (key, est)."""
    return df.groupBy(key).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col(val), F.lit(lgk)))
        .alias("est")
    )


def hll_distinct_sharded(
    df: DataFrame,
    key: str,
    val: str,
    shard: "F.Column",
    lgk: int = HLL_LGK,
) -> DataFrame:
    """The mergeable path: sketch each (key, shard) partition
    independently, then union the partial sketches per key — the
    incremental/streaming state shape. Returns (key, est) identical
    (same sketch algebra) to the one-shot path."""
    partials = (
        df.withColumn("_shard", shard)
        .groupBy(key, "_shard")
        .agg(F.hll_sketch_agg(F.col(val), F.lit(lgk)).alias("sk"))
    )
    return partials.groupBy(key).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("est")
    )


@register(
    "events_hll_users",
    oracle=None,  # the estimate is DataSketches-specific (DuckDB's
    # approx_count_distinct is a different sketch); invariant tests pin
    # merged ≡ one-shot (monoid law) and <5% error vs exact.
    doc="Per-event-type distinct users via mergeable HLL sketches: "
    "one-shot estimate, 8-shard merged estimate (must agree — sketch "
    "union is lossless), and the exact count for error auditing.",
    tags=("events", "sketch", "approx"),
)
def events_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three aggregates over one narrow (event_type, user_id) scan:
    the one-shot sketch, the sharded-then-unioned sketch (shard =
    user_id mod 8 — any partitioning works, that is the point), and
    the exact distinct. At scale only the sketch paths survive; the
    exact column exists so the driver-visible output carries its own
    error audit."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    oneshot = hll_distinct_by(ev, "event_type", "user_id").select(
        "event_type", F.col("est").alias("est_users")
    )
    merged = hll_distinct_sharded(
        ev, "event_type", "user_id", F.col("user_id") % 8
    ).select("event_type", F.col("est").alias("est_merged"))
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        oneshot.join(merged, "event_type")
        .join(exact, "event_type")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketches (DataSketches KLL)


def kll_quantiles_by(
    df: DataFrame, key: str, val: str, probs: tuple[float, ...] = (0.5, 0.95)
) -> DataFrame:
    """One-shot per-key KLL quantiles: (key, p<prob>…)."""
    sk = F.expr(f"kll_sketch_agg_double(CAST({val} AS DOUBLE))")
    out = df.groupBy(key).agg(sk.alias("sk"))
    cols = [
        F.expr(f"kll_sketch_get_quantile_double(sk, {p})").alias(_pname(p))
        for p in probs
    ]
    return out.select(key, *cols)


def _pname(p: float) -> str:
    return "p" + str(p).replace("0.", "").ljust(2, "0")


def kll_quantiles_sharded(
    df: DataFrame,
    key: str,
    val: str,
    shard: "F.Column",
    probs: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """The mergeable path: one KLL sketch per (key, shard), folded per
    key with the binary ``kll_sketch_merge_double``. The fold runs over
    a collect_list that is BOUNDED by the shard count (a handful of
    few-KB binaries per key — shard partials, never rows), so the
    usual no-collect_list rule doesn't apply: this is exactly the
    small-state merge an incremental pipeline performs per batch."""
    partials = (
        df.withColumn("_shard", shard)
        .groupBy(key, "_shard")
        .agg(
            F.expr(f"kll_sketch_agg_double(CAST({val} AS DOUBLE))").alias("sk")
        )
    )
    # ONE collect_list, folded in a separate projection: referencing
    # collect_list three times inside a single fold expression would
    # only be correct because Catalyst deduplicates identical
    # aggregates into one buffer — with independent buffers their
    # nondeterministic orders could disagree and the fold would drop
    # one sketch and double-merge another (KLL merge is NOT
    # idempotent). The bounded list is shard partials, never rows.
    merged = (
        partials.groupBy(key)
        .agg(F.collect_list("sk").alias("sks"))
        .select(
            key,
            F.expr(
                "aggregate(slice(sks, 2, size(sks)), sks[0],"
                " (acc, x) -> kll_sketch_merge_double(acc, x))"
            ).alias("sk"),
        )
    )
    cols = [
        F.expr(f"kll_sketch_get_quantile_double(sk, {p})").alias(_pname(p))
        for p in probs
    ]
    return merged.select(key, *cols)


@register(
    "events_kll_value_quantiles",
    oracle=None,  # KLL is a randomized sketch (DataSketches seed fixed
    # but compaction order differs between one-shot and merged paths);
    # invariant tests pin both paths within the published rank-error
    # bound of the exact percentiles.
    doc="Per-event-type p50/p95 of value via mergeable KLL sketches: "
    "one-shot and shard-merged paths plus exact percentiles for "
    "error auditing.",
    tags=("events", "sketch", "approx"),
)
def events_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile twin of ``events_hll_users``: sketches fold across
    shards (the incremental state shape) and the output carries the
    exact percentile so the error is self-auditing. At 100 TB only the
    sketch paths survive — ``percentile`` here exists for the audit
    columns, computed on the same narrow scan."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    one = kll_quantiles_by(ev, "event_type", "value").select(
        "event_type",
        F.col("p50").alias("p50_sketch"),
        F.col("p95").alias("p95_sketch"),
    )
    mrg = kll_quantiles_sharded(
        ev, "event_type", "value", F.crc32(F.col("value").cast("string")) % 8
    ).select(
        "event_type",
        F.col("p50").alias("p50_merged"),
        F.col("p95").alias("p95_merged"),
    )
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.expr("percentile(value, 0.95)").alias("p95_exact"),
    )
    return (
        one.join(mrg, "event_type").join(exact, "event_type").orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Streaming maintenance: fold per-batch HLL sketches into parquet state


def hll_fold_batch(
    state: DataFrame | None,
    batch: DataFrame,
    key: str,
    val: str,
    lgk: int = HLL_LGK,
) -> DataFrame:
    """Union a micro-batch's per-key sketches into prior sketch state:
    (key, sk). Pure sketch algebra — commutative and idempotent-on-
    replay when the caller keys state by epoch."""
    fresh = batch.groupBy(key).agg(
        F.hll_sketch_agg(F.col(val), F.lit(lgk)).alias("sk")
    )
    if state is None:
        return fresh
    return (
        state.select(key, "sk")
        .unionByName(fresh)
        .groupBy(key)
        .agg(F.hll_union_agg(F.col("sk")).alias("sk"))
    )


def stream_hll_users(
    stream_events: DataFrame,
    state_dir: str,
    key: str = "event_type",
    val: str = "user_id",
    lgk: int = HLL_LGK,
    query_name: str = "hll_users_maintenance",
):
    """Structured-Streaming wrapper: maintain per-key distinct-count
    sketches from a streaming source via ``foreachBatch`` — the same
    epoch discipline as ``stream_heavy_hitters`` (state parquet keyed
    by streaming batch_id; a batch reads the largest epoch STRICTLY
    below its own id, so a crash-replay re-reads the same pre-state
    and overwrites the same epoch instead of double-inserting —
    though for HLL even a true double-insert is absorbed, since
    sketch insertion is idempotent per value: the epoch discipline
    here guards the state files, not the math).

    ``sketch/<latest>`` holds (key, sk); estimate on read with
    ``hll_sketch_estimate``. State is keys × few-KB forever,
    regardless of stream length.

    Returns the StreamingQuery; callers own awaitTermination/stop.
    """
    import os

    def _epoch_below(bound: int) -> int:
        p = os.path.join(state_dir, "sketch")
        if not os.path.isdir(p):
            return -1
        vs = [
            int(d.split("=")[1])
            for d in os.listdir(p)
            if "=" in d and int(d.split("=")[1]) < bound
        ]
        return max(vs, default=-1)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        e = _epoch_below(int(batch_id))
        state = (
            spark.read.parquet(os.path.join(state_dir, "sketch", f"epoch={e}"))
            if e >= 0
            else None
        )
        folded = hll_fold_batch(state, batch_df, key, val, lgk)
        folded.write.mode("overwrite").parquet(
            os.path.join(state_dir, "sketch", f"epoch={int(batch_id)}")
        )

    return (
        stream_events.writeStream.foreachBatch(_process)
        .queryName(query_name)
        .option(
            "checkpointLocation", os.path.join(state_dir, "_checkpoint")
        )
        .trigger(availableNow=True)
        .start()
    )


def hll_pairwise_overlap(
    df: DataFrame, key: str, val: str, lgk: int = HLL_LGK
) -> DataFrame:
    """Pairwise distinct-value overlap between key groups via HLL
    inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), with the
    union estimated by the lossless sketch merge (``hll_union``) —
    sketch set algebra, no re-scan per pair.

    Scale shape: ONE corpus pass builds the per-key sketches (few KB
    each); the pair join and every estimate run over |keys|² sketch
    rows. Inclusion-exclusion can go slightly negative at small
    overlaps (two ±ε estimates minus one) — clamped at 0, and the
    relative error on the intersection is ε·|A∪B|/|A∩B|, so tiny
    overlaps are the least reliable (the standard caveat; exact
    distinct-pair counting is the audit twin).
    """
    sk = df.groupBy(F.col(key).alias("k")).agg(
        F.hll_sketch_agg(F.col(val), F.lit(lgk)).alias("sk")
    )
    a = sk.select(
        F.col("k").alias("key_a"), F.col("sk").alias("sk_a")
    )
    b = sk.select(
        F.col("k").alias("key_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    est_a = F.hll_sketch_estimate(F.col("sk_a"))
    est_b = F.hll_sketch_estimate(F.col("sk_b"))
    est_u = F.hll_sketch_estimate(
        F.hll_union(F.col("sk_a"), F.col("sk_b"))
    )
    return pairs.select(
        "key_a",
        "key_b",
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        F.greatest(
            est_a + est_b - est_u, F.lit(0).cast("bigint")
        ).alias("est_intersection"),
    ).orderBy("key_a", "key_b")


@register(
    "events_user_overlap_sketch",
    oracle=None,  # sketch estimates; the invariant test audits every
    # pair against exact distinct-user intersections.
    doc="Pairwise user-audience overlap between event types via HLL "
    "inclusion-exclusion (est A + est B − est A∪B) — sketch set "
    "algebra over one corpus pass; |types|² sketch-row pair join.",
    tags=("sketch", "approx", "events"),
)
def events_user_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_pairwise_overlap(
        table(spark, sf_dir, "events"), "event_type", "user_id"
    )
