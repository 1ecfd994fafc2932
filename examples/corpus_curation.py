#!/usr/bin/env python
"""End-to-end corpus curation: the full training-data pass built from
the registered operators — quality-filter, PII-scrub, near-dup
cluster, decontaminate, then pack the survivors into token-budget
training packs and write a curated parquet corpus.

Run: python examples/corpus_curation.py [sf_dir] [out_dir]

This is the composition story: every stage is an independently
oracle-checked operator; chaining them is plain DataFrame algebra, so
Catalyst sees one plan per materialization and the whole pass scales
the way the per-stage plans do (see PLANS.md).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from parquet_ingestor_spark.catalog import table
from parquet_ingestor_spark.operators.corpus import (
    contamination_overlap,
    corpus_filter_pipeline,
    dedup_clusters,
    scrub_pii,
)
from parquet_ingestor_spark.operators.dedup import shingle_col
from parquet_ingestor_spark.operators.lines import line_dedup
from parquet_ingestor_spark.operators.mixture import (
    dsir_logweights,
    heavy_hitters,
    mixture_weights,
    temperature_weights,
)
from parquet_ingestor_spark.operators.sketches import bloom_build, bloom_probe
from parquet_ingestor_spark.operators.text import (
    corpus_shuffle_shard,
    gopher_rules,
    text_lm_perplexity,
    text_pack_bins,
    text_ppl_buckets,
    unicode_clean,
)
from parquet_ingestor_spark.queries import _ensure_loaded
from parquet_ingestor_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="curated_corpus_")
    )
    _ensure_loaded()
    spark = get_spark(app_name="corpus-curation", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 0. Unicode canonicalization — dedup keys hash the canonical
    #    bytes, not whatever codepoint variant the crawler emitted
    canon = (
        unicode_clean(docs.select("doc_id", "text"))
        .select("doc_id", F.col("text_clean").alias("text"))
        .join(docs.drop("text"), "doc_id")
    )

    # 1. quality filter (C4/Gopher heuristics) — keep==1 survivors,
    #    intersected with the Gopher rule metrics. The operator emits
    #    per-axis metrics exactly so a pipeline can re-threshold
    #    without re-scanning: this synthetic vocabulary carries only
    #    one of Gopher's eight function words, so the published
    #    stop_hits>=2 bound is relaxed to >=1 here; the other axes
    #    keep their published thresholds.
    kept = corpus_filter_pipeline(spark, sf_dir).filter("keep = 1")
    gopher_ok = (
        gopher_rules(canon)
        .filter(
            "n_words BETWEEN 50 AND 100000"
            " AND mean_word_len_e4 BETWEEN 30000 AND 100000"
            " AND symbol_word_ratio_e4 < 1000"
            " AND alpha_word_ratio_e4 >= 8000"
            " AND stop_hits >= 1"
        )
        .select("doc_id")
    )

    # 2. near-dup clusters — keep one doc (the min-id keeper) per cluster
    keepers = dedup_clusters(spark, sf_dir).filter(
        F.col("doc_id") == F.col("cluster_id")
    )

    # 3. benchmark decontamination — drop docs sharing 8-grams with
    #    the (stand-in) benchmark set. The LIBRARY default n=8 is the
    #    published-practice window (PaLM 8-gram); the registered gate
    #    entry pins n=4 as a synthetic-testdata artifact — real
    #    pipelines (like this example) must not inherit that.
    contaminated = contamination_overlap(
        table(spark, sf_dir, "documents")
    ).select("doc_id")

    survivors = (
        canon.join(kept.select("doc_id"), "doc_id")
        .join(gopher_ok, "doc_id")
        .join(keepers.select("doc_id"), "doc_id")
        .join(contaminated, "doc_id", "left_anti")
    )

    # 4. PII scrub the survivors' text
    clean = scrub_pii(survivors).select(
        "doc_id",
        F.col("scrubbed").alias("text"),
        "lang",
        "source",
        "n_chars",
    )

    # 4b. line-level boilerplate dedup (C4 keep-first rule): replace
    #     each doc's text with its deduped reassembly
    deduped_lines = line_dedup(clean).select(
        "doc_id", F.col("cleaned_text").alias("text")
    )
    clean = (
        clean.drop("text")
        .join(deduped_lines, "doc_id")
        .select("doc_id", "text", "lang", "source", "n_chars")
    )

    # 5. write the curated corpus + its pack manifest
    clean.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    n1 = spark.read.parquet(f"{out_dir}/documents.parquet").count()
    packs = text_pack_bins(spark, out_dir)
    n_packs = packs.count()

    # 5b. composition report over the curated corpus: per-source
    #     mixture weights (what to resample to reach uniform) and the
    #     corpus-wide frequent tokens (boilerplate candidates)
    curated = spark.read.parquet(f"{out_dir}/documents.parquet")
    mix = mixture_weights(curated).orderBy("source").collect()
    temp = temperature_weights(curated, alpha=0.3).orderBy("source").collect()
    hot = heavy_hitters(curated, support=50).limit(5).collect()

    # 5c. DSIR target-likeness: per-source mean importance log-weight
    #     against the English target model — which sources to upweight
    #     when resampling toward the target domain
    dsir = (
        dsir_logweights(curated)
        .join(curated.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.round(F.avg("dsir_logweight"), 2).alias("mean_lw"))
        .orderBy(F.desc("mean_lw"))
        .collect()
    )

    # 6. fluency scores + CCNet head/middle/tail split + deterministic
    #    training order (all read the written parquet, not the input)
    lm = text_lm_perplexity(spark, out_dir)
    mean_nll = lm.agg(
        F.round(F.avg(F.col("avg_nll_e4") / 10000.0), 3)
    ).first()[0]
    buckets = (
        text_ppl_buckets(spark, out_dir)
        .groupBy("bucket")
        .count()
        .orderBy("bucket")
        .collect()
    )
    shard_counts = (
        corpus_shuffle_shard(spark, out_dir)
        .groupBy("shard")
        .count()
        .orderBy("shard")
        .collect()
    )

    # 7. ingest gate for the NEXT crawl batch: a Bloom bitmap of the
    #    curated corpus's shingles screens incoming docs without ever
    #    re-joining the corpus (a shingle miss is a PROOF of novelty).
    #    The dropped docs stand in for the next batch here.
    m, k = 1 << 20, 5
    bitmap = bloom_build(
        curated.select(F.explode(shingle_col("text")).alias("sh")),
        F.col("sh"),
        m,
        k,
    )
    incoming = canon.join(clean.select("doc_id"), "doc_id", "left_anti")
    inc_sh = incoming.select(
        "doc_id", F.explode(shingle_col("text")).alias("sh")
    )
    novelty = (
        bloom_probe(bitmap, inc_sh, F.col("sh"), m, k)
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("maybe_seen").cast("int")) / F.count("*")
            ).alias("seen_frac")
        )
    )
    n_incoming = incoming.count()
    n_mostly_novel = novelty.filter("seen_frac < 0.5").count()

    print(f"input docs:     {n0}")
    print(f"curated docs:   {n1}")
    print(f"training packs: {n_packs}")
    print(f"mean doc NLL:   {mean_nll}")
    print(
        "ppl buckets:    "
        + ", ".join(f"{r['bucket']}={r['count']}" for r in buckets)
    )
    print(
        "mixture:        "
        + ", ".join(
            f"{r['source']}×{r['mix_weight_e6'] / 1e6}" for r in mix
        )
    )
    print(
        "temp (a=0.3):   "
        + ", ".join(
            f"{r['source']}×{r['temp_weight_e6'] / 1e6}" for r in temp[:5]
        )
        + ", …"
    )
    print(
        "hot tokens:     "
        + ", ".join(f"{r['token']}({r['n']})" for r in hot)
    )
    print(
        "dsir by source: "
        + ", ".join(f"{r['source']}={r['mean_lw']}" for r in dsir[:5])
        + ", …"
    )
    print("shard sizes:    " + ", ".join(str(r["count"]) for r in shard_counts))
    print(
        f"ingest gate:    {n_mostly_novel}/{n_incoming} stand-in batch "
        "docs mostly novel vs curated-corpus bloom"
    )
    packs.show(10, truncate=False)
    print(f"curated corpus at {out_dir}")


if __name__ == "__main__":
    main()
