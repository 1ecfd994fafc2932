"""Behavior tests for C4-style line dedup and incremental cluster
maintenance (the registry differential covers their oracles; these pin
the semantics on planted corpora)."""

from __future__ import annotations

import pyspark.sql.functions as F

from parquet_ingestor_spark.operators.corpus import connected_components
from parquet_ingestor_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    exact_jaccard_pairs,
    shingle_col,
)
from parquet_ingestor_spark.operators.incremental import (
    incremental_dedup_clusters,
    stream_dedup_clusters,
)
from parquet_ingestor_spark.operators.lines import line_dedup


def _w(i: int) -> str:
    return f"tok{i}"


def test_line_dedup_keep_first_and_page_gate(spark):
    """A boilerplate line planted in three docs survives only in its
    first (doc_id, line_no) occurrence; docs left under the page gate
    disappear."""
    boiler = " ".join(_w(i) for i in range(10))  # one exact 10-word line
    uniq = [
        " ".join(_w(100 + 10 * d + i) for i in range(10)) for d in range(11)
    ]
    docs = spark.createDataFrame(
        [
            # doc 0: boiler + 3 unique lines -> keeps all 4
            (0, " ".join([boiler, uniq[0], uniq[1], uniq[2]])),
            # doc 1: boiler + 3 unique lines -> boiler removed, 3 kept
            (1, " ".join([boiler, uniq[3], uniq[4], uniq[5]])),
            # doc 2: boiler + 2 unique lines -> 2 kept < 3 -> dropped
            (2, " ".join([boiler, uniq[6], uniq[7]])),
            # doc 3: 3 fresh lines + 2 lines already seen in docs 0/1
            (3, " ".join([uniq[8], uniq[9], uniq[10], uniq[0], uniq[3]])),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert set(got) == {0, 1, 3}
    assert got[0].n_lines_kept == 4 and got[0].n_lines_removed == 0
    assert got[1].n_lines_kept == 3 and got[1].n_lines_removed == 1
    assert boiler in got[0].cleaned_text
    assert boiler not in got[1].cleaned_text
    # doc 3's uniq[0]/uniq[3] already appeared in docs 0/1
    assert got[3].n_lines_kept == 3 and got[3].n_lines_removed == 2


def test_line_dedup_short_tail_line_filtered(spark):
    """The trailing partial segment (< 5 words) never counts."""
    docs = spark.createDataFrame(
        [
            (
                0,
                " ".join(_w(i) for i in range(33)),  # 3 lines + 3-word tail
            )
        ],
        "doc_id long, text string",
    )
    got = line_dedup(docs).collect()
    assert len(got) == 1
    assert got[0].n_lines_kept == 3 and got[0].n_lines_removed == 0


def _bridge_corpus(spark):
    """Two texts below threshold of each other (jac 33/43 ≈ 0.767),
    plus a bridge prefix similar to both (33/38 ≈ 0.868 each), plus a
    singleton — so the bridge's arrival merges two existing clusters."""
    base = [_w(i) for i in range(40)]
    t2 = " ".join(base)
    t3 = " ".join(base[:37] + ["x37", "x38", "x39"])
    bridge = " ".join(base[:35])
    lone = " ".join(_w(1000 + i) for i in range(30))
    rows = [
        (0, t2),
        (3, t2),
        (1, t3),
        (4, t3),
        (2, bridge),
        (5, lone),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_clusters(spark, docs):
    sh = docs.select("doc_id", shingle_col("text").alias("shingles"))
    edges = exact_jaccard_pairs(sh, JACCARD_THRESHOLD).select(
        "doc_a", "doc_b"
    )
    comp = connected_components(docs.select("doc_id"), edges)
    return {(r.id, r.lbl) for r in comp.collect()}


def test_incremental_equals_batch_with_cross_batch_merge(spark):
    """doc 2 (the bridge) arrives last and must merge two clusters
    that were created in different earlier batches — final labels
    equal the batch CC over the union."""
    docs = _bridge_corpus(spark)
    batches = [
        docs.filter(F.pmod("doc_id", F.lit(3)) == i) for i in range(3)
    ]
    got = {
        (r.doc_id, r.cluster_id)
        for r in incremental_dedup_clusters(batches).collect()
    }
    want = _batch_clusters(spark, docs)
    assert got == want
    # the bridge really did merge: docs 0,1,2,3,4 share one cluster
    lbls = {d: l for d, l in got}
    assert len({lbls[i] for i in (0, 1, 2, 3, 4)}) == 1
    assert lbls[5] == 5


def test_stream_dedup_clusters_foreachbatch(spark, tmp_path):
    """The streaming wrapper must reach the same final labels via
    file-stream micro-batches and parquet state epochs."""
    import os

    docs = _bridge_corpus(spark)
    landing = str(tmp_path / "landing")
    for i in range(3):
        docs.filter(F.pmod("doc_id", F.lit(3)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    state_dir = str(tmp_path / "state")
    q = stream_dedup_clusters(stream, state_dir)
    q.awaitTermination(120)
    epochs = [
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(state_dir, "labels"))
    ]
    assert len(epochs) >= 2, "expected multiple micro-batches"
    final = spark.read.parquet(
        os.path.join(state_dir, "labels", f"epoch={max(epochs)}")
    )
    got = {(r.id, r.lbl) for r in final.collect()}
    assert got == _batch_clusters(spark, docs)

    # replay idempotence: a fresh checkpoint re-delivers every batch
    # (the crash-replay worst case) against the EXISTING state dir —
    # batch-id-keyed epochs must absorb the replay, not double-apply
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    import shutil

    shutil.rmtree(os.path.join(state_dir, "_checkpoint"))
    q2 = stream_dedup_clusters(stream2, state_dir)
    q2.awaitTermination(120)
    epochs2 = [
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(state_dir, "labels"))
    ]
    final2 = spark.read.parquet(
        os.path.join(state_dir, "labels", f"epoch={max(epochs2)}")
    )
    rows = final2.collect()
    assert len(rows) == docs.count(), "replay duplicated state rows"
    assert {(r.id, r.lbl) for r in rows} == got


def test_dup_spans_planted_shared_passage(spark, tmp_path):
    """A 20-word passage planted in two docs yields one maximal span
    in each doc covering exactly the passage; unique text yields no
    spans."""
    import pyspark.sql.functions as F  # noqa: F401

    from parquet_ingestor_spark.operators.lines import (
        SPAN_GRAM,
        text_dup_spans,
    )

    passage = " ".join(f"p{i}" for i in range(20))
    uniq = lambda base, n: " ".join(f"u{base}_{i}" for i in range(n))
    docs = spark.createDataFrame(
        [
            (0, uniq(0, 30) + " " + passage + " " + uniq(1, 30)),
            (1, passage + " " + uniq(2, 40)),
            (2, uniq(3, 60)),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: (r.span_start, r.span_end, r.n_grams)
        for r in text_dup_spans(spark, str(tmp_path)).collect()
    }
    # doc 0: passage occupies tokens [30, 49]; duplicated 15-gram
    # positions are 30..(50-15)=35 -> span [30, 49], 6 grams
    assert got[0] == (30, 49, 20 - SPAN_GRAM + 1)
    # doc 1: passage at [0, 19]
    assert got[1] == (0, 19, 20 - SPAN_GRAM + 1)
    assert 2 not in got


def test_apply_dedup_batch_absorbs_redelivered_docs(spark):
    """At-least-once replay: a doc_id arriving again in a later batch
    (or twice within one batch) must not double-count postings/sizes
    (Jaccard denominators) or duplicate label rows."""
    from parquet_ingestor_spark.operators.incremental import (
        apply_dedup_batch,
    )

    words = lambda lo, n: " ".join(_w(lo + i) for i in range(n))
    b1 = spark.createDataFrame(
        [(1, words(0, 12)), (2, words(0, 12))],  # 1 and 2 are dups
        "doc_id long, text string",
    )
    state1 = apply_dedup_batch(None, b1)
    ex1, sz1, lbl1 = (df.collect() for df in state1)

    # batch 2 re-delivers doc 1 verbatim (and itself twice), plus one
    # genuinely new doc
    b2 = spark.createDataFrame(
        [(1, words(0, 12)), (1, words(0, 12)), (3, words(50, 12))],
        "doc_id long, text string",
    )
    ex2, sz2, lbl2 = (df.collect() for df in apply_dedup_batch(state1, b2))

    assert len(lbl2) == 3  # docs 1, 2, 3 — no duplicate label rows
    assert sorted(r.doc_id for r in sz2) == [1, 2, 3]  # one size row each
    from collections import Counter

    by_doc = Counter(r.doc_id for r in ex2)
    by_doc1 = Counter(r.doc_id for r in ex1)
    assert by_doc[1] == by_doc1[1]  # postings for doc 1 unchanged
    # cluster structure intact: 1-2 merged, 3 alone
    roots = {r.id: r.lbl for r in lbl2}
    assert roots[1] == roots[2] != roots[3]
