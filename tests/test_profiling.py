"""Planted-corpus behavior tests for the statistical profiling
operators (Zipf fit, unigram entropy, normalized dedup, source
overlap, novelty score, tf-idf terms, embedding dimension stats) —
the semantic checks the DuckDB differential can't express."""

from __future__ import annotations

import math

from parquet_ingestor_spark.queries import REGISTRY, _ensure_loaded

_ensure_loaded()


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _zipf_corpus():
    """Token t{r} appears floor(C/r) times — an exact Zipf(1) head."""
    c = 1024
    words = []
    for r in range(1, 65):
        words += [f"t{r:03d}"] * (c // r)
    # spread across a few docs; token totals are what the fit sees
    third = len(words) // 3
    return [
        (0, " ".join(words[:third]), "s"),
        (1, " ".join(words[third : 2 * third]), "s"),
        (2, " ".join(words[2 * third :]), "s"),
    ]


def test_zipf_fit_recovers_planted_exponent(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, _zipf_corpus())
    row = REGISTRY["text_zipf_fit"].fn(spark, sf).collect()[0]
    assert row.n_fit == 64
    # numpy twin over the same deterministic (count DESC, token) ranking
    counts = sorted(
        ((1024 // r, f"t{r:03d}") for r in range(1, 65)),
        key=lambda t: (-t[0], t[1]),
    )
    xs = [math.log2(r) for r in range(1, 65)]
    ys = [math.log2(c) for c, _ in counts]
    mx, my = sum(xs) / 64, sum(ys) / 64
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert row.zipf_slope_e4 == round(slope * 10000)
    # the planted law is Zipf(1); floor() discretization bends the tail
    assert -10500 < row.zipf_slope_e4 < -9000


def test_entropy_uniform_equals_log2_vocab(spark, tmp_path):
    sf = _write_docs(
        spark, tmp_path, [(0, " ".join(f"w{i}" for i in range(32)), "s")]
    )
    row = REGISTRY["text_unigram_entropy"].fn(spark, sf).collect()[0]
    assert row.vocab_size == 32 and row.n_tokens == 32
    assert row.unigram_entropy_bits_e4 == 50000  # log2(32) = 5 exactly


def test_entropy_collapses_on_template_spam(spark, tmp_path):
    sf = _write_docs(
        spark, tmp_path, [(0, " ".join(["spam"] * 999 + ["rare"]), "s")]
    )
    row = REGISTRY["text_unigram_entropy"].fn(spark, sf).collect()[0]
    assert row.vocab_size == 2
    assert 0 < row.unigram_entropy_bits_e4 < 200  # ≪ log2(2) = 1 bit


def test_normalized_dedup_groups_planted_variants(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (10, "Hello, World!", "s"),
            (11, "hello world", "s"),
            (12, "HELLO   world.", "s"),
            (20, "something else entirely", "s"),
        ],
    )
    rows = REGISTRY["dedup_exact_normalized"].fn(spark, sf).collect()
    by_copies = {r.copies: r for r in rows}
    assert len(rows) == 2
    assert by_copies[3].keeper_doc_id == 10  # keep-first = min doc_id
    assert by_copies[1].keeper_doc_id == 20
    # byte-exact dedup would NOT have grouped the variants
    exact = REGISTRY["dedup_exact"].fn(spark, sf).collect()
    assert len(exact) == 4


def test_source_overlap_flags_planted_shared_passage(spark, tmp_path):
    shared = " ".join(f"p{i}" for i in range(12))  # 12 tokens → 5 8-grams
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, shared + " uniq_a0 uniq_a1 uniq_a2 uniq_a3 uniq_a4 uniq_a5 uniq_a6 uniq_a7", "srcA"),
            (1, shared + " uniq_b0 uniq_b1 uniq_b2 uniq_b3 uniq_b4 uniq_b5 uniq_b6 uniq_b7", "srcB"),
            (2, "totally disjoint words one two three four five six seven", "srcC"),
        ],
    )
    rows = REGISTRY["corpus_source_overlap"].fn(spark, sf).collect()
    # only the (A, B) pair overlaps; C never appears
    assert [(r.source_a, r.source_b) for r in rows] == [("srcA", "srcB")]
    r = rows[0]
    assert r.common == 5  # exactly the shared passage's 8-grams
    assert r.grams_a == r.grams_b == 13  # 20 tokens → 13 distinct 8-grams
    assert r.jaccard_e4 == round(5 / (13 + 13 - 5) * 10000)


def test_novelty_score_planted_shared_doc(spark, tmp_path):
    shared = " ".join(f"n{i}" for i in range(8))  # exactly one 8-gram
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, shared, "s"),                       # 1 gram, shared
            (1, shared + " extra0 extra1 extra2 extra3 extra4 extra5 extra6 extra7", "s"),
            (2, "u0 u1 u2 u3 u4 u5 u6 u7 u8", "s"),  # 2 grams, unique
            (3, "too short", "s"),                   # < 8 tokens: omitted
        ],
    )
    rows = {r.doc_id: r for r in REGISTRY["text_novelty_score"].fn(spark, sf).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].n_grams == 1 and rows[0].dup_fraction == 1.0
    assert rows[1].n_grams == 9 and rows[1].shared_grams == 1
    assert rows[1].dup_fraction == 1 / 9
    assert rows[2].shared_grams == 0 and rows[2].dup_fraction == 0.0


def test_tfidf_terms_rank_planted_salient_word(spark, tmp_path):
    # 'rare' appears only in doc 0; 'common' in every doc
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "common rare common filler", "s"),
            (1, "common filler other words", "s"),
            (2, "common more words here", "s"),
        ],
    )
    rows = REGISTRY["text_tfidf_terms"].fn(spark, sf).collect()
    top0 = next(r for r in rows if r.doc_id == 0 and r.rk == 1)
    # tf=1 × N/df = 3/1 = 3.0 beats common's 2 × 3/3 = 2.0
    assert top0.term == "rare" and top0.score == 3.0
    assert all(len([r for r in rows if r.doc_id == d]) <= 3 for d in (0, 1, 2))
    for d in (0, 1, 2):  # ranks are dense from 1, scores non-increasing
        scores = [r.score for r in sorted(rows, key=lambda r: r.rk) if r.doc_id == d]
        assert scores == sorted(scores, reverse=True)


def test_dim_stats_planted_constant_and_known_dims(spark, tmp_path):
    rows = [(i, [1.5] * 3 + [float(i)] * 61) for i in range(4)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = {r.dim: r for r in REGISTRY["emb_dim_stats"].fn(spark, str(tmp_path)).collect()}
    assert len(got) == 64
    for d in (1, 2, 3):  # constant dims: exact mean, zero variance
        assert got[d].dim_mean_e4 == 15000 and got[d].dim_var_e4 == 0
    # dims 4..64 hold vec_id ∈ {0,1,2,3}: mean 1.5, var_pop 1.25
    assert got[10].dim_mean_e4 == 15000 and got[10].dim_var_e4 == 12500


def test_length_gini_bounds_and_planted_extremes(spark):
    """Gini invariants: uniform lengths ⇒ 0; one doc owning nearly all
    tokens ⇒ → (n-1)/n; always within [0, 1)."""
    from parquet_ingestor_spark.operators.profiling import text_length_gini
    import pyspark.sql.functions as F
    import tempfile

    rows = (
        [(i, "tok " * 10, "en", "uniform", 40) for i in range(10)]
        + [(100 + i, "tok", "en", "skewed", 3) for i in range(9)]
        + [(199, "tok " * 1000, "en", "skewed", 4000)]
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.source: r.gini_e6 for r in text_length_gini(spark, d).collect()}
    assert got["uniform"] == 0
    assert 800000 < got["skewed"] < 1000000


def test_js_divergence_identity_and_bounds(spark):
    """JS(p, p) = 0; disjoint vocabularies → 1 bit; always in [0, 1]."""
    import tempfile

    from parquet_ingestor_spark.operators.profiling import (
        corpus_js_divergence,
    )

    rows = (
        [(i, "alpha beta gamma", "en", "same1", 15) for i in range(5)]
        + [(10 + i, "alpha beta gamma", "en", "same2", 15) for i in range(5)]
        + [(20 + i, "uno dos tres", "es", "other", 11) for i in range(5)]
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {(r.source_a, r.source_b): r.js_bits_e4
           for r in corpus_js_divergence(spark, d).collect()}
    assert got[("same1", "same2")] == 0
    # fully disjoint pairs share no token: the inner join drops them
    # entirely — by design the matrix covers sources with any overlap
    assert ("other", "same1") not in got and ("same1", "other") not in got
    for v in got.values():
        assert 0 <= v <= 10000
