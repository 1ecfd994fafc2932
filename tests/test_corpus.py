"""Behavioral tests for corpus-curation operators: planted PII,
planted contamination, and cluster transitivity — the cases the clean
synthetic corpus can't exercise through the DuckDB differential."""

from __future__ import annotations

import pyspark.sql.functions as F

from parquet_ingestor_spark.operators.corpus import (
    connected_components,
    scrub_pii,
)


def test_pii_scrub_redacts(spark):
    rows = [
        (1, "contact me at alice.smith+work@example.co.uk for details"),
        (2, "call 555-867-5309 or +1 212.555.0199 x42"),
        (3, "server at 10.0.0.1 and 192.168.255.254 responded"),
        (4, "no pii here at all"),
        (5, "mixed bob@corp.io on 10.1.2.3 dial 800 555 1234 now"),
    ]
    df = scrub_pii(spark.createDataFrame(rows, "doc_id long, text string"))
    got = {r.doc_id: r for r in df.collect()}

    assert got[1].n_emails == 1 and "<EMAIL>" in got[1].scrubbed
    assert "alice" not in got[1].scrubbed
    # 555-867-5309 and 212.555.0199 match; the +1 prefix stays
    assert got[2].n_phones == 2 and got[2].scrubbed.count("<PHONE>") == 2
    assert got[3].n_ips == 2 and got[3].scrubbed.count("<IP>") == 2
    assert got[4].n_emails == got[4].n_phones == got[4].n_ips == 0
    assert got[4].scrubbed == "no pii here at all"
    assert got[5].n_emails == 1 and got[5].n_ips == 1 and got[5].n_phones == 1


def test_connected_components_transitive_chain(spark):
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    # chain 1-2-3 (no direct 1-3 edge), pair 4-5, singletons 6, 7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    got = {
        r.id: r.lbl for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 7}


def test_connected_components_long_chain_converges(spark):
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {r.id: r.lbl for r in connected_components(nodes, edges).collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_sliver_equals_attached(spark):
    """attach=False must return exactly the edge-touched slice of the
    attached result, and the analytic singleton completion (every
    node NOT in the sliver is its own size-1 cluster) must rebuild
    the attached result bit-for-bit — the equivalence dedup_clusters
    and dedup_keep_best rely on since the round-10 rework."""
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, 10)], "doc_id long"
    )
    # chain 1-2-3, pair 4-5; 6..9 untouched singletons
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    attached = {
        r.id: r.lbl
        for r in connected_components(nodes, edges, attach=True).collect()
    }
    sliver = {
        r.id: r.lbl
        for r in connected_components(nodes, edges, attach=False).collect()
    }
    assert sliver == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
    rebuilt = dict(sliver)
    for i in range(1, 10):
        rebuilt.setdefault(i, i)
    assert rebuilt == attached
    # a touched component's label is always an edge-touched id, so
    # sliver cluster ids never collide with untouched singleton ids
    assert set(sliver.values()) <= set(sliver.keys())


def test_connected_components_sliver_fallback_path(spark):
    """attach=False through the star-contraction fallback (diameter
    past max_iter) still returns the touched-only slice."""
    import warnings as w

    n = 12
    nodes = spark.createDataFrame(
        [(i,) for i in range(n + 2)], "doc_id long"
    )  # n, n+1 untouched
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        got = {
            r.id: r.lbl
            for r in connected_components(
                nodes, edges, max_iter=2, attach=False
            ).collect()
        }
    assert got == {i: 0 for i in range(n)}
    assert any("did not converge" in str(c.message) for c in caught)


def test_connected_components_nonconvergence_falls_back(spark):
    """A diameter past max_iter must not silently mis-cluster: the
    hash-min loop warns and hands off to star contraction, so labels
    are still exact."""
    import warnings as w

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        got = {
            r.id: r.lbl
            for r in connected_components(nodes, edges, max_iter=2).collect()
        }
    assert got == {i: 0 for i in range(n)}
    assert any("did not converge" in str(c.message) for c in caught)


def test_reliable_checkpoint_paths(spark, tmp_path):
    """checkpoint_dir switches the iterative operators to reliable
    filesystem checkpoints: results must match the localCheckpoint
    path bit-for-bit, and checkpoint blocks must actually land in the
    directory."""
    from parquet_ingestor_spark.operators.corpus import (
        connected_components_star,
    )
    from parquet_ingestor_spark.operators.text import bpe_train_merges

    ckpt = str(tmp_path / "ckpt")
    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
    )
    for fn in (connected_components, connected_components_star):
        local = {r.id: r.lbl for r in fn(nodes, edges).collect()}
        reliable = {
            r.id: r.lbl
            for r in fn(nodes, edges, checkpoint_dir=ckpt).collect()
        }
        assert local == reliable == {i: 0 for i in range(10)}, fn.__name__

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    local = [tuple(r) for r in bpe_train_merges(docs, n_merges=3).collect()]
    reliable = [
        tuple(r)
        for r in bpe_train_merges(
            docs, n_merges=3, checkpoint_dir=ckpt
        ).collect()
    ]
    assert local == reliable and len(local) == 3

    import os

    assert any(os.scandir(ckpt)), "no checkpoint blocks written"


def test_contamination_finds_planted_overlap(spark, tmp_path):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        # doc_id 0 → benchmark side (0 % 97 == 0)
        (0, bench_text, "en", "bench", len(bench_text)),
        # copies an 8-token run from the benchmark doc → 5 shared
        # 4-grams (CONTAM_N = 4 since round 8)
        (1, "intro words " + " ".join(bench_text.split()[:8]), "en", "s", 1),
        # shares only 3 consecutive tokens — below the 4-gram window
        (2, "other " + " ".join(bench_text.split()[:3]) + " tail", "en", "s", 1),
        (3, "completely unrelated text with enough tokens to shingle ok", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from parquet_ingestor_spark.queries import REGISTRY

    got = {
        r.doc_id: (r.n_shared_ngrams, r.n_bench_docs)
        for r in REGISTRY["benchmark_contamination"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {1: (5, 1)}  # doc 1 contaminated, docs 2/3 clean

    # the LIBRARY default is n=8 (published-practice floor, round-8
    # verdict #5): the same planted 8-token run is exactly ONE shared
    # 8-gram, and the 3-token overlap stays clean
    from parquet_ingestor_spark.operators.corpus import (
        contamination_overlap,
    )

    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    got8 = {
        r.doc_id: (r.n_shared_ngrams, r.n_bench_docs)
        for r in contamination_overlap(docs).collect()
    }
    assert got8 == {1: (1, 1)}


def test_kmeans_fit_objective_monotone_and_deterministic(spark, sf_dir):
    """Spherical Lloyd's: the summed-cosine objective must be
    non-decreasing with more iterations from the same init, sizes must
    partition the corpus, and the fit must be run-to-run stable."""
    import numpy as np

    from parquet_ingestor_spark.catalog import table
    from parquet_ingestor_spark.operators.embeddings import kmeans_fit

    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()

    def objective(max_iter):
        cents, assigned, _ = kmeans_fit(emb, max_iter=max_iter)
        rows = assigned.select("c_id", "u").collect()
        assert len(rows) == n
        return sum(
            float(np.asarray(r.u) @ cents[r.c_id]) for r in rows
        )

    objs = [objective(t) for t in (1, 2, 4)]
    assert objs[0] <= objs[1] + 1e-9 and objs[1] <= objs[2] + 1e-9, objs

    from parquet_ingestor_spark.queries import REGISTRY

    a = REGISTRY["emb_kmeans_fit"].fn(spark, sf_dir).collect()
    b = REGISTRY["emb_kmeans_fit"].fn(spark, sf_dir).collect()
    assert a == b
    assert sum(r.cluster_size for r in a) == n


def test_star_cc_equivalent_to_hashmin(spark):
    """Two-phase star contraction must produce identical components to
    hash-min on adversarial shapes: long chains, merged cliques,
    random graphs, singletons."""
    import random

    from parquet_ingestor_spark.operators.corpus import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(13)
    cases = []
    # long chain + separate triangle + singletons
    cases.append((list(range(20)), [(i, i + 1) for i in range(14)]
                  + [(15, 16), (16, 17), (15, 17)]))
    # two cliques bridged by one edge
    k1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    cases.append((list(range(16)), k1 + k2 + [(4, 10)]))
    # random graphs
    for _ in range(3):
        n = 30
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(25)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        cases.append((list(range(n)), edges))

    for nodes_list, edge_list in cases:
        nodes = spark.createDataFrame([(i,) for i in nodes_list], "doc_id long")
        edges = spark.createDataFrame(edge_list or [(0, 0)], "doc_a long, doc_b long")
        hm = {r.id: r.lbl for r in connected_components(nodes, edges).collect()}
        st = {r.id: r.lbl for r in connected_components_star(nodes, edges).collect()}
        assert st == hm, (edge_list, st, hm)


def test_streaming_ingest_with_quality_filter(spark, tmp_path):
    """Compose the curation rules with the streaming ingest pipeline:
    the corpus filter's keep-predicate runs as the pipeline's O5
    drop_where hook, so low-quality docs are dropped in-flight — the
    shape a streaming training-data feed uses."""
    import json
    import os

    from pyspark.sql import types as T

    from parquet_ingestor_spark.operators.corpus import (
        FILTER_LANGS,
        FILTER_MIN_UNIQ,
        FILTER_MIN_WORDS,
    )
    from parquet_ingestor_spark.pipeline import (
        PipelineConfig,
        start_stream_ingest,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    good_text = " ".join(f"w{i}" for i in range(40))  # 40 uniq words
    docs = [
        (0, good_text, "en"),          # keep
        (1, "short doc", "en"),        # drop: short
        (2, "x " * 39 + "x", "en"),    # drop: repetitive (1 uniq / 40)
        (3, good_text, "zz"),          # drop: lang
        (4, good_text, "fr"),          # keep
    ]
    with open(f"{landing}/docs.json", "w") as f:
        for doc_id, text, lang in docs:
            payload = json.dumps(
                {"doc_id": doc_id, "text": text, "lang": lang}
            )
            f.write(json.dumps({"value": payload, "attributes": {}}) + "\n")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    langs = ", ".join(f"'{l}'" for l in FILTER_LANGS)
    toks = "split(text, ' ')"
    drop = (
        f"size({toks}) < {FILTER_MIN_WORDS} "
        f"OR size(array_distinct({toks})) / size({toks}) < {FILTER_MIN_UNIQ} "
        f"OR lang NOT IN ({langs})"
    )
    q = start_stream_ingest(
        spark,
        landing,
        str(tmp_path / "out"),
        str(tmp_path / "chk"),
        schema,
        PipelineConfig(flush_interval="1 second", drop_where=drop),
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    out = spark.read.parquet(str(tmp_path / "out" / "data"))
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == [0, 4]


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """Bit-exact differential against a pure-Python Sennrich-style BPE
    trainer over the same word frequencies and tie-break rule."""
    import collections

    from parquet_ingestor_spark.operators.text import (
        BPE_MERGES,
        bpe_train_merges,
    )
    from parquet_ingestor_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    freq = collections.Counter()
    for r in docs.select("text").collect():
        for w in r.text.split(" "):
            if w:
                freq[w] += 1

    vocab = {w: list(w) + ["</w>"] for w in freq}
    want = []
    for rank in range(BPE_MERGES):
        counts = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq[w]
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rank, left, right, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out

    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(docs).collect()
    ]
    assert got == want


def test_pq_encode_matches_numpy(spark, sf_dir):
    """Bit-exact differential: recompute codes and reconstruction MSE
    in plain numpy from the same codebook rule."""
    import numpy as np

    from parquet_ingestor_spark.catalog import table
    from parquet_ingestor_spark.operators.similarity import (
        PQ_CODES,
        PQ_SUBSPACES,
        pq_codebooks,
        pq_encode,
    )

    emb = table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    cb = pq_codebooks(emb)
    d_sub = cb.shape[2]
    want = {}
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64).reshape(
            PQ_SUBSPACES, d_sub
        )
        codes = [
            int(((v[s] - cb[s]) ** 2).sum(axis=1).argmin())
            for s in range(PQ_SUBSPACES)
        ]
        recon = np.stack([cb[s][codes[s]] for s in range(PQ_SUBSPACES)])
        key = sum(c * PQ_CODES**i for i, c in enumerate(codes))
        want[r.vec_id] = (key, round(float(((v - recon) ** 2).mean()), 6))

    got = {
        r.vec_id: (r.code_key, r.recon_mse)
        for r in pq_encode(emb).collect()
    }
    assert got == want
    # codebook members must reconstruct exactly
    assert sum(1 for k, (c, m) in got.items() if m == 0.0) >= PQ_CODES

    # the registered expression twin computes the SAME codes (argmin
    # ties broken identically) and the e6-quantized MSE
    from parquet_ingestor_spark.queries import REGISTRY

    twin = {
        r.vec_id: (r.code_key, r.recon_mse_e6)
        for r in REGISTRY["emb_pq_encode"].fn(spark, sf_dir).collect()
    }
    assert set(twin) == set(want)
    for vid, (key, mse) in want.items():
        tk, tm = twin[vid]
        assert tk == key, vid
        assert abs(tm - mse * 1_000_000) <= 1, vid


def test_pq_adc_equals_reconstructed_bruteforce(spark, sf_dir):
    """ADC's exactness contract: its top-k must equal brute-force L2
    against the PQ-reconstructed corpus, computed the same way (per-
    subspace partial sums), including the (dist, vec_id) tie-break."""
    import numpy as np

    from parquet_ingestor_spark.catalog import table
    from parquet_ingestor_spark.operators.similarity import (
        N_QUERIES,
        PQ_CODES,
        PQ_SUBSPACES,
        TOPK,
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    emb = table(spark, sf_dir, "embeddings")
    cb = pq_codebooks(emb)
    d_sub = cb.shape[2]
    codes = {
        r.vec_id: [
            (r.code_key // PQ_CODES**s) % PQ_CODES
            for s in range(PQ_SUBSPACES)
        ]
        for r in pq_encode(emb).collect()
    }
    queries = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64).reshape(
            PQ_SUBSPACES, d_sub
        )
        for r in emb.filter(f"vec_id < {N_QUERIES}").collect()
    }
    want = {}
    for qid, q in queries.items():
        dists = []
        for vid, cs in codes.items():
            d = 0.0
            for s in range(PQ_SUBSPACES):
                d += float(((q[s] - cb[s][cs[s]]) ** 2).sum())
            dists.append((round(d, 6), vid))
        dists.sort()
        want[qid] = [
            (vid, int(round(d * 1_000_000)), rank + 1)
            for rank, (d, vid) in enumerate(dists[:TOPK])
        ]

    got = {}
    for r in pq_adc_topk(emb).collect():
        got.setdefault(r.q_id, []).append((r.vec_id, r.dist_e6, r.rank))
    assert got == want


def test_ivf_expr_twin_matches_serving_path(spark, sf_dir):
    """The registered cosine-IVF expression twin and the numpy
    ivf_search serving path must agree on everything observable at e4
    precision: same per-rank scores and same answer sets per query.
    (Exact within-tie ORDER may differ: the serving path ranks on
    round(sim, 4) then vec_id, the twin on the exact double — at an
    e4 tie each picks a legitimate order, so row-for-row equality is
    deliberately NOT asserted.)"""
    from parquet_ingestor_spark.catalog import table
    from parquet_ingestor_spark.operators.similarity import (
        IVF_K,
        ivf_search,
        ivf_topk_expr,
    )

    emb = table(spark, sf_dir, "embeddings")
    serving = ivf_search(emb, n_lists=IVF_K).collect()
    twin = ivf_topk_expr(emb).collect()
    s_scores = [(r.q_id, r.rank, r.sim_e4) for r in serving]
    t_scores = [(r.q_id, r.rank, r.sim_e4) for r in twin]
    assert s_scores == t_scores
    s_sets: dict[int, set] = {}
    t_sets: dict[int, set] = {}
    for r in serving:
        s_sets.setdefault(r.q_id, set()).add((r.vec_id, r.sim_e4))
    for r in twin:
        t_sets.setdefault(r.q_id, set()).add((r.vec_id, r.sim_e4))
    assert s_sets == t_sets


def test_pq_adc_expr_twin_matches_serving_path(spark, sf_dir):
    """The registered expression twin and the numpy serving path must
    agree row-for-row (the encode-twin guarantee extended to ADC):
    same codes, same e6 distances, same (dist, vec_id) ranking."""
    from parquet_ingestor_spark.catalog import table
    from parquet_ingestor_spark.operators.similarity import (
        pq_adc_topk,
        pq_adc_topk_expr,
    )

    emb = table(spark, sf_dir, "embeddings")
    serving = [
        (r.q_id, r.vec_id, r.dist_e6, r.rank)
        for r in pq_adc_topk(emb).collect()
    ]
    twin = [
        (r.q_id, r.vec_id, r.dist_e6, r.rank)
        for r in pq_adc_topk_expr(emb).collect()
    ]
    assert serving == twin


def test_ivfpq_expr_twin_matches_serving_path(spark, sf_dir):
    """The registered IVF-PQ expression twin and the numpy serving
    path must agree row-for-row: same coarse assignment, same probe
    lists, same codes, same e6 distances and ranking."""
    from parquet_ingestor_spark.catalog import table
    from parquet_ingestor_spark.operators.similarity import (
        ivfpq_topk_expr,
        sim_ivfpq_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    serving = [
        (r.q_id, r.vec_id, r.dist_e6, r.rank)
        for r in sim_ivfpq_topk(spark, sf_dir).collect()
    ]
    twin = [
        (r.q_id, r.vec_id, r.dist_e6, r.rank)
        for r in ivfpq_topk_expr(emb).collect()
    ]
    assert serving == twin


def test_ivfpq_equals_probed_adc_bruteforce(spark, sf_dir):
    """IVF-PQ serving must equal brute-force ADC restricted to the
    probed lists — the approximation lives in list choice + quantizer,
    never the search. Pure-numpy differential."""
    import numpy as np

    from parquet_ingestor_spark.catalog import table
    from parquet_ingestor_spark.operators.similarity import (
        IVF_K,
        IVF_NPROBE,
        N_QUERIES,
        PQ_CODES,
        PQ_SUBSPACES,
        TOPK,
        pq_codebooks,
        sim_ivfpq_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    rows = sorted(
        emb.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id
    )
    vm = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    cb = pq_codebooks(emb)
    m, k, d_sub = cb.shape
    cm = vm[ids < IVF_K][np.argsort(ids[ids < IVF_K])]
    lists = ((vm[:, None, :] - cm[None]) ** 2).sum(axis=2).argmin(axis=1)
    sub = vm.reshape(len(vm), m, d_sub)
    codes = ((sub[:, :, None, :] - cb[None]) ** 2).sum(axis=3).argmin(axis=2)

    qm = vm[ids < N_QUERIES]
    q_ids = ids[ids < N_QUERIES]
    probe = np.argsort(
        ((qm[:, None, :] - cm[None]) ** 2).sum(axis=2), axis=1, kind="stable"
    )[:, :IVF_NPROBE]
    tables = (
        (qm.reshape(len(q_ids), m, d_sub)[:, :, None, :] - cb[None]) ** 2
    ).sum(axis=3)

    want = {}
    for qi, qid in enumerate(q_ids):
        mask = np.isin(lists, probe[qi])
        dist = np.zeros(mask.sum())
        mc = codes[mask]
        for s in range(m):
            dist += tables[qi, s, mc[:, s]]
        order = sorted(zip(np.round(dist, 6), ids[mask]))
        want[int(qid)] = [
            (int(v), int(round(float(d) * 1_000_000)), r + 1)
            for r, (d, v) in enumerate(order[:TOPK])
        ]

    got = {}
    for r in sim_ivfpq_topk(spark, sf_dir).collect():
        got.setdefault(r.q_id, []).append((r.vec_id, r.dist_e6, r.rank))
    assert got == want


def test_unigram_lm_train_matches_python_reference(spark, sf_dir):
    """Bit-exact differential against a pure-Python unigram-LM trainer:
    same substring seeding, same +1 alphabet floor, same exact-rational
    hard-EM Viterbi with the (prob, fewer-pieces, lexicographic) tie
    rule."""
    import collections
    from fractions import Fraction

    from parquet_ingestor_spark.catalog import table
    from parquet_ingestor_spark.operators.text import (
        UNIGRAM_EM_ROUNDS,
        UNIGRAM_MAX_PIECE,
        UNIGRAM_VOCAB,
        unigram_lm_train,
    )

    docs = table(spark, sf_dir, "documents")
    freq = collections.Counter()
    for r in docs.select("text").collect():
        for w in r.text.split(" "):
            if w:
                freq[w] += 1

    # seed: top-K substrings (len 2..L) by freq, ties lexicographic
    subcnt = collections.Counter()
    for w, f in freq.items():
        for n in range(2, UNIGRAM_MAX_PIECE + 1):
            for i in range(len(w) - n + 1):
                subcnt[w[i : i + n]] += f
    cands = sorted(subcnt.items(), key=lambda kv: (-kv[1], kv[0]))[
        :UNIGRAM_VOCAB
    ]
    charcnt = collections.Counter()
    for w, f in freq.items():
        for ch in w:
            charcnt[ch] += f
    pieces = dict(cands)
    for ch, c in charcnt.items():
        pieces[ch] = pieces.get(ch, 0) + c
    alphabet = set(charcnt)

    def segment(w, P, total):
        best = [None] * (len(w) + 1)
        best[0] = (Fraction(1), 0, ())
        for i in range(1, len(w) + 1):
            for j in range(max(0, i - UNIGRAM_MAX_PIECE), i):
                if best[j] is None or w[j:i] not in P:
                    continue
                c = P[w[j:i]]
                cand = (
                    best[j][0] * Fraction(c, total),
                    best[j][1] + 1,
                    best[j][2] + (w[j:i],),
                )
                cur = best[i]
                if (
                    cur is None
                    or cand[0] > cur[0]
                    or (cand[0] == cur[0] and cand[1] < cur[1])
                    or (
                        cand[0] == cur[0]
                        and cand[1] == cur[1]
                        and cand[2] < cur[2]
                    )
                ):
                    best[i] = cand
        return best[len(w)][2]

    for _ in range(UNIGRAM_EM_ROUNDS):
        total = sum(pieces.values())
        got = collections.Counter()
        for w, f in freq.items():
            for piece in segment(w, pieces, total):
                got[piece] += f
        pieces = {
            p: (got.get(p, 0) + 1 if p in alphabet else got.get(p, 0))
            for p in set(got) | alphabet
            if got.get(p, 0) > 0 or p in alphabet
        }

    total = sum(pieces.values())
    want = [
        (p, c, c / total)
        for p, c in sorted(pieces.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    got_rows = [
        (r["piece"], r["cnt"], r["prob"])
        for r in unigram_lm_train(docs).collect()
    ]
    assert got_rows == want


def test_unigram_lm_train_stable_across_partitionings(spark, sf_dir):
    from parquet_ingestor_spark.catalog import table
    from parquet_ingestor_spark.operators.text import unigram_lm_train

    docs = table(spark, sf_dir, "documents")
    base = [tuple(r) for r in unigram_lm_train(docs).collect()]
    rep = [
        tuple(r)
        for r in unigram_lm_train(docs.repartition(7)).collect()
    ]
    assert base == rep
    # a valid probability model: mass sums to 1 over the piece table
    assert abs(sum(r[2] for r in base) - 1.0) < 1e-9


def test_bpe_merge_application_on_identical_token_runs(spark, tmp_path):
    """Pin the double-space replace form (round 8) on the exact
    adversarial shape where a single-space non-lookbehind replace
    diverges from the BPE convention: a run of identical symbols.
    Token-level leftmost non-overlapping greedy must merge a 5-run
    into [xx, xx, x] — a boundary-consuming scan yields [xx, x, xx]
    and changes every later round's pair counts."""
    from parquet_ingestor_spark.operators.text import bpe_train_merges

    rows = [
        # 'xxxxx' -> chars x x x x x </w>; 'xx' appears often enough
        # that (x, x) is the first merge, then (xx, xx) is only
        # learnable if the 5-runs merged [xx, xx, x]
        (i, "xxxxx xxxxx xxxx", "en", "s", 16) for i in range(20)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(docs, n_merges=3).collect()
    ]
    # word freqs: xxxxx ×40, xxxx ×20
    # round 0: (x, x) count = 4*40 + 3*20 = 220
    # after: xxxxx -> [xx, xx, x, </w>]; xxxx -> [xx, xx, </w>]
    #   (the boundary-consuming scan would give xxxxx -> [xx, x, xx])
    # round 1 pairs: (xx, xx) 40+20=60 | (xx, x) 40 | (x, </w>) 40 |
    #   (xx, </w>) 20 -> winner (xx, xx) = 60, ONLY under the
    #   token-level convention
    assert got[0] == (0, "x", "x", 220)
    assert got[1] == (1, "xx", "xx", 60)


def test_bpe_oracles_total_on_degenerate_corpus(spark, tmp_path):
    """Round-8 advice #2: with fewer than BPE_MERGES learnable pairs
    the Spark trainer breaks out early. The unrolled-CTE oracles must
    degrade each unlearnable round to a NO-OP (LEFT JOIN + chr(1)
    sentinel), not CROSS JOIN an empty winner table — which would
    empty the vocab for every later round and NULL-propagate every
    document's token count through the encode oracle's scalar
    subqueries. Run BOTH engines on a corpus where only 2 of the 8
    merges are learnable and require exact agreement."""
    import duckdb

    from parquet_ingestor_spark.operators.text import (
        _bpe_encode_oracle,
        _bpe_train_oracle,
    )
    from parquet_ingestor_spark.queries import REGISTRY

    # 'ab' -> a b </w> -> (a,b) then (ab,</w>) then fully merged:
    # rounds 2..7 have NO learnable pair. Plus one empty document.
    rows = [(i, "ab ab ab", "en", "s", 8) for i in range(6)] + [
        (6, "", "en", "s", 0)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet/*.parquet')"
    )

    got_train = [
        tuple(r)
        for r in REGISTRY["bpe_train_merges"].fn(spark, str(tmp_path)).collect()
    ]
    want_train = [tuple(r) for r in con.execute(_bpe_train_oracle()).fetchall()]
    assert got_train == want_train
    assert [t[:3] for t in got_train] == [(0, "a", "b"), (1, "ab", "</w>")]

    got_enc = [
        tuple(r)
        for r in REGISTRY["text_bpe_encode"].fn(spark, str(tmp_path)).collect()
    ]
    want_enc = [tuple(r) for r in con.execute(_bpe_encode_oracle()).fetchall()]
    assert got_enc == want_enc
    # every 'ab' word fully merges to ONE subword; empty doc is (0, 0)
    assert got_enc == [(i, 3, 3) for i in range(6)] + [(6, 0, 0)]
    assert all(v is not None for t in got_enc for v in t)
