#!/usr/bin/env python
"""ANN serving walkthrough: the full embedding-index lifecycle built
from the registered operators — whiten, fit coarse+product quantizers,
serve top-k three ways (exact, IVF, IVF-PQ), and audit every
approximate path's recall against the exact baseline in its metric.

Run: python examples/ann_serving.py [sf_dir]

Each stage is an independently tested operator; the composition is
plain DataFrame algebra. The serving-path hierarchy this demonstrates
is the 100 TB architecture: exact scan (audit only) → IVF (reads
nprobe/n_lists of the corpus) → IVF-PQ (reads 8 nibbles per scored
vector instead of 64 floats).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from parquet_ingestor_spark.catalog import table
from parquet_ingestor_spark.operators.embeddings import (
    pca_fit,
    pca_project,
    whiten,
)
from parquet_ingestor_spark.operators.similarity import (
    IVF_K,
    _query_set,
    brute_force_l2_topk,
    brute_force_topk,
    ivf_search,
    recall_against,
)
from parquet_ingestor_spark.queries import REGISTRY, _ensure_loaded
from parquet_ingestor_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    _ensure_loaded()
    spark = get_spark(app_name="ann-serving", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()

    # 1. profile + precondition the matrix
    dims = REGISTRY["emb_dim_stats"].fn(spark, sf_dir)
    worst = dims.orderBy(F.desc("dim_var_e4")).first()
    white = whiten(emb)
    print(
        f"corpus: {n} vectors; "
        f"max dim variance {worst['dim_var_e4'] / 10000.0}"
    )
    print(f"whitened sample (e4 ints): {white.limit(1).collect()[0]['whitened_e4'][:4]}")

    # 2. dimensionality reduction (PCA serving path)
    mean, comps, evals = pca_fit(emb, m=4)
    proj = pca_project(emb, mean, comps)
    print(f"top-4 PCA eigenvalues: {[round(float(e), 4) for e in evals]}")
    proj.show(3, truncate=False)

    # 3. serve top-k three ways and audit recall in the right metric
    qs = _query_set(emb)
    cos_exact = brute_force_topk(emb, qs)
    l2_exact = brute_force_l2_topk(emb, qs)
    ivf = ivf_search(emb, n_lists=IVF_K)
    report = (
        recall_against(cos_exact, ivf, "ivf_cosine")
        .unionByName(
            recall_against(
                l2_exact, REGISTRY["sim_ivfpq_topk"].fn(spark, sf_dir), "ivfpq_l2"
            )
        )
        .orderBy("method")
    )
    print("recall@5 audit:")
    report.show(truncate=False)

    # 4. persist the index, then serve from files (train once /
    # serve many; the postings scan prunes to probed partitions)
    import tempfile

    from parquet_ingestor_spark.operators.similarity import (
        N_QUERIES,
        ivf_index_search,
        ivf_index_write,
    )

    with tempfile.TemporaryDirectory() as tmp:
        n_lists = ivf_index_write(emb, tmp)
        queries = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(f"vec_id < {N_QUERIES}")
            .select("vec_id", "embedding")
            .collect()
        ]
        served = ivf_index_search(spark, tmp, queries)
        same = sorted(map(tuple, served.collect())) == sorted(
            map(tuple, ivf.collect())
        )
        print(f"persisted index ({n_lists} lists) == in-process: {same}")

    # 5. the one-call registered audit (what a pipeline schedules)
    REGISTRY["sim_recall_eval"].fn(spark, sf_dir).show(truncate=False)


if __name__ == "__main__":
    main()
