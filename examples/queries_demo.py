#!/usr/bin/env python
"""Query-layer tour: run a few flagship queries from the registered
inventory against the smallest testdata SF and print results.

Run: python examples/queries_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_ingestor_spark.queries import REGISTRY, _ensure_loaded
from parquet_ingestor_spark.session import get_spark

SHOWCASE = (
    "q10_revenue_per_nation",  # 6-way broadcast-dim multi-join
    "q15_pricing_summary",  # TPC-H Q1-shaped hash aggregate
    "q18_topk_per_group",  # ranking window
    "dedup_minhash_lsh",  # MinHash-LSH near-dup pairs
    "sim_bruteforce_topk",  # cosine top-k similarity
    "text_quality",  # document quality scoring
    "q71_returned_items",  # TPC-H Q10 shape: agg-before-joinback top-20
    "corpus_dsir_weights",  # DSIR target-likeness importance weights
    "q75_resample_ffill",  # gap-filled hourly series with forward-fill
    "dedup_fuzzy_names",  # SymSpell fuzzy entity resolution
    "graph_pagerank",  # integer token-passing PageRank, co-purchase graph
    "graph_triangles",  # degree-oriented triangle census
    "unigram_lm_train",  # SentencePiece-style unigram tokenizer training
    "dedup_recall_eval",  # sketch-dedup precision/recall audit
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    _ensure_loaded()
    spark = get_spark(app_name="example-queries", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    for name in SHOWCASE:
        q = REGISTRY[name]
        print(f"\n=== {name} — {q.doc}")
        q.fn(spark, sf_dir).show(5, truncate=60)
    return spark


if __name__ == "__main__":
    # only the script path owns (and therefore stops) the session;
    # in-process callers (tests) keep theirs alive
    main().stop()
