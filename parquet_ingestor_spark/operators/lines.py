"""Within-doc boilerplate / line-level dedup — the C4 cleaning rule.

Raffel et al. 2020 ("Exploring the Limits of Transfer Learning with a
Unified Text-to-Text Transformer", §2.2 — public methodology) clean
Common Crawl by (a) keeping only lines that look like prose, (b)
removing every occurrence-but-one of any span that repeats across the
dataset (boilerplate: nav bars, cookie banners, license footers), and
(c) dropping pages left with fewer than three sentences. This module
is that pass over the ``documents`` table.

Reference parity: the reference engine stops at ingest
(/root/reference/ingestor/ingestor.go) — this extends the declared
north-star scope (SURVEY.md §2 extensions) and composes with
``corpus_filter_pipeline`` (doc-level gates) the way C4 composes its
line and page rules.

Segmentation stand-in: the synthetic corpus has no newlines, so a
"line" here is a fixed run of ``LINE_WORDS`` consecutive words —
deterministic, oracle-expressible, and swap-for-``split('\\n')`` on a
real corpus (the plan shape is identical: the segmenting transform is
per-row).

Scale shape: segmentation is a per-row codegen expression (split +
sequence + slice — no explode of words, no word-level shuffle). The
only corpus-sized shuffle keys on the segment string (the global
keep-first window); reassembly groups by doc_id with a per-doc
``collect_list`` — bounded by one document's own line count, the same
per-row bound every per-doc operator carries, never corpus-sized.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..queries import register

LINE_WORDS = 10  # words per stand-in "line"
MIN_LINE_WORDS = 5  # C4: keep lines with >= 5 words
MIN_DOC_LINES = 3  # C4: drop pages with < 3 surviving sentences


def segment_lines(
    docs: DataFrame, text_col: str = "text", line_words: int = LINE_WORDS
) -> DataFrame:
    """(doc_id, line_no, line, nw): consecutive ``line_words``-word
    segments per doc, built with one per-row transform + explode —
    the word array never leaves its row unsegmented."""
    # toks binds once per row via the array()/lambda trick (the
    # text_quality pattern): slicing an inline split(...) would
    # re-tokenize the doc for every line
    seg = F.expr(
        f"transform(array(split({text_col}, ' ')), toks -> "
        f"transform(sequence(0, CAST(ceil(size(toks) / {line_words}.0) "
        f"AS INT) - 1), i -> struct(CAST(i AS BIGINT) AS line_no, "
        f"concat_ws(' ', slice(toks, i * {line_words} + 1, {line_words})) "
        f"AS line, size(slice(toks, i * {line_words} + 1, {line_words})) "
        f"AS nw)))[0]"
    )
    return docs.select("doc_id", F.explode(seg).alias("s")).select(
        "doc_id", "s.line_no", "s.line", "s.nw"
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    line_words: int = LINE_WORDS,
    min_line_words: int = MIN_LINE_WORDS,
    min_doc_lines: int = MIN_DOC_LINES,
) -> DataFrame:
    """C4-style clean: line quality gate → global keep-first line
    dedup → reassemble → page gate.

    Keep-first = the occurrence with the smallest (doc_id, line_no)
    survives; every other occurrence of the same line text is removed
    corpus-wide. The dedup shuffle keys on the line string — at
    100 TB a production build keys on xxhash64(line) to shrink
    shuffle bytes (kept as strings here so the oracle is
    engine-portable); frequency is Zipf-shaped but the window is a
    partial sort per key, not a collect.

    Returns (doc_id, n_lines_kept, n_lines_removed, cleaned_text)
    for docs with ≥ ``min_doc_lines`` surviving lines.
    """
    lines = segment_lines(docs, text_col, line_words).filter(
        F.col("nw") >= min_line_words
    )
    w = Window.partitionBy("line").orderBy("doc_id", "line_no")
    ranked = lines.withColumn("rn", F.row_number().over(w))
    per_doc = ranked.groupBy("doc_id").agg(
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias(
            "n_lines_kept"
        ),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias(
            "n_lines_removed"
        ),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") == 1,
                            F.struct("line_no", "line"),
                        )
                    )
                ),
                lambda s: s.line,
            ),
            " ",
        ).alias("cleaned_text"),
    )
    return (
        per_doc.filter(F.col("n_lines_kept") >= min_doc_lines)
        .select("doc_id", "n_lines_kept", "n_lines_removed", "cleaned_text")
        .orderBy("doc_id")
    )


@register(
    "corpus_line_dedup",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), ex AS (
            SELECT doc_id, unnest(list_transform(
                range(CAST(ceil(len(toks) / {LINE_WORDS}.0) AS BIGINT)),
                i -> struct_pack(
                    line_no := i,
                    line := array_to_string(
                        toks[i * {LINE_WORDS} + 1 : (i + 1) * {LINE_WORDS}],
                        ' '),
                    nw := len(
                        toks[i * {LINE_WORDS} + 1 : (i + 1) * {LINE_WORDS}])
                ))) AS s
            FROM t
        ), seg AS (
            SELECT doc_id, s.line_no AS line_no, s.line AS line, s.nw AS nw
            FROM ex
        ), q AS (
            SELECT doc_id, line_no, line,
                   ROW_NUMBER() OVER (
                       PARTITION BY line ORDER BY doc_id, line_no
                   ) AS rn
            FROM seg WHERE nw >= {MIN_LINE_WORDS}
        ), per_doc AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_lines_kept,
                   CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_lines_removed,
                   string_agg(CASE WHEN rn = 1 THEN line END, ' '
                              ORDER BY line_no) AS cleaned_text
            FROM q GROUP BY doc_id
        )
        SELECT doc_id, n_lines_kept, n_lines_removed, cleaned_text
        FROM per_doc WHERE n_lines_kept >= {MIN_DOC_LINES}
        ORDER BY doc_id
    """,
    doc=f"C4-style line cleaning: {LINE_WORDS}-word line stand-ins, "
    f"≥{MIN_LINE_WORDS}-word quality gate, corpus-wide keep-first "
    f"line dedup, ≥{MIN_DOC_LINES}-line page gate.",
    tags=("text", "dedup", "corpus"),
)
def corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return line_dedup(table(spark, sf_dir, "documents"))


SPAN_GRAM = 15  # ExactSubstr-style duplicated-span n-gram width


@register(
    "text_dup_spans",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), g AS (
            SELECT doc_id, s.pos AS pos, s.gram AS gram FROM (
                SELECT doc_id, unnest(list_transform(
                    range(len(toks) - {SPAN_GRAM} + 1),
                    i -> struct_pack(
                        pos := i,
                        gram := array_to_string(
                            toks[i + 1 : i + {SPAN_GRAM}], ' ')
                    ))) AS s
                FROM t WHERE len(toks) >= {SPAN_GRAM}
            )
        ), dup AS (
            SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1
        ), d AS (
            SELECT g.doc_id, g.pos,
                   g.pos - ROW_NUMBER() OVER (
                       PARTITION BY g.doc_id ORDER BY g.pos
                   ) AS grp
            FROM g JOIN dup USING (gram)
        )
        SELECT doc_id,
               CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + {SPAN_GRAM} - 1 AS BIGINT) AS span_end,
               CAST(COUNT(*) AS BIGINT) AS n_grams
        FROM d
        GROUP BY doc_id, grp
        ORDER BY doc_id, span_start
    """,
    doc=f"ExactSubstr-style duplicated spans: maximal runs of "
    f"{SPAN_GRAM}-gram positions whose gram repeats anywhere in the "
    "corpus (gaps-and-islands merge), as token [start, end] spans.",
    tags=("text", "dedup", "corpus"),
)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring span detection (Lee et al. 2022,
    'Deduplicating Training Data Makes Language Models Better' —
    public methodology: remove exact substrings repeated across the
    corpus, not just whole near-dup docs).

    Shape: positioned n-grams from a tokenize-once per-row transform →
    one corpus shuffle keyed on the gram (the repeat test is a
    map-side-combinable count; production keys on xxhash64(gram) to
    shrink shuffle bytes) → duplicated positions merge into maximal
    spans with the gaps-and-islands trick (pos − row_number is
    constant within a consecutive run), a per-doc window. Returns
    (doc_id, span_start, span_end, n_grams); a removal pass would
    drop exactly these token ranges.
    """
    grams = (
        table(spark, sf_dir, "documents")
        .filter(F.expr(f"size(split(text, ' ')) >= {SPAN_GRAM}"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(array(split(text, ' ')), toks -> "
                    f"transform(sequence(0, size(toks) - {SPAN_GRAM}), "
                    f"i -> struct(CAST(i AS BIGINT) AS pos, concat_ws(' ', "
                    f"slice(toks, i + 1, {SPAN_GRAM})) AS gram)))[0]"
                )
            ).alias("s"),
        )
        .select("doc_id", "s.pos", "s.gram")
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .select("gram")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    d = grams.join(dup, "gram").withColumn(
        "grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        d.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(SPAN_GRAM - 1)).alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
        .orderBy("doc_id", "span_start")
    )
