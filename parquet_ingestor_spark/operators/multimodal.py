"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store blobs as a
``binary`` column (or a URI pointer column for objects > a few MB) next
to a typed metadata struct, and run decode/feature-extraction as
Arrow-batched ``mapInPandas`` stages, so each Python worker touches one
columnar batch at a time and the shuffle/partition story stays pure
Spark.

Real codecs (PIL/ffmpeg/librosa) are not in this container, so decode
is STUBBED: ``decode_image_batch`` raises ``NotImplementedError`` when
asked for real decoding and otherwise produces a deterministic fake
(first/last payload bytes as "dimensions"). The Spark-side contract —
schema, batch iteration, UDF signature, partition behavior — is real
and tested; swapping in a real decoder changes only the marked lines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..catalog import table
from ..queries import register

#: Output schema of the decode/feature-extract stage.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
    ]
)


def decode_image_batch(
    payloads: pd.Series, real_decode: bool = False
) -> pd.DataFrame:
    """Per-batch 'decode': bytes → (n_bytes, width, height).

    STUB: real decoding needs an image codec library absent from this
    environment. The deterministic fake keeps the pipeline testable —
    width/height are the first/last payload byte values.
    """
    if real_decode:
        raise NotImplementedError(
            "image codecs (PIL/opencv) are not available in this "
            "environment; run with real_decode=False for the "
            "deterministic stub"
        )
    n_bytes = payloads.map(len)
    return pd.DataFrame(
        {
            "n_bytes": n_bytes.astype("int64"),
            "width": payloads.map(lambda b: b[0] if len(b) else None),
            "height": payloads.map(lambda b: b[-1] if len(b) else None),
        }
    )


def extract_media_metadata(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas decode stage: (id, binary payload) → typed metadata.

    Arrow moves whole columnar batches across the Python boundary —
    this is the only sanctioned Python hot path in the engine (10-100×
    the throughput of a row-at-a-time UDF).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = decode_image_batch(pdf[payload_col])
            meta.insert(0, "doc_id", pdf[id_col].astype("int64").values)
            yield meta

    return media.select(id_col, payload_col).mapInPandas(
        _decode, schema=MEDIA_META_SCHEMA
    )


N_FRAMES = 4

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_val", T.LongType(), False),
    ]
)


def sample_frames_batch(pdf: pd.DataFrame, n_frames: int = N_FRAMES) -> pd.DataFrame:
    """Per-batch frame sampling: pick n_frames evenly-spaced bytes from
    each payload — the shape of video frame-sampling / audio windowing
    (STUB: a real decoder would seek keyframes; positions and count
    are the real contract)."""
    rows = []
    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        size = len(payload)
        if size == 0:
            continue
        step = max(1, size // n_frames)
        for k in range(n_frames):
            pos = k * step
            if pos >= size:
                break
            rows.append((int(doc_id), k, payload[pos]))
    return pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_val"])


def sample_frames(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas frame-sampling stage: 1→N rows per media blob."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield sample_frames_batch(
                pdf.rename(columns={id_col: "doc_id", payload_col: "payload"})
            )

    return media.select(id_col, payload_col).mapInPandas(
        _sample, schema=FRAME_SCHEMA
    )


# The operators index BYTES (the honest contract for binary media),
# but DuckDB SQL cannot byte-index a BLOB, so the oracle comparison
# normalizes the stand-in payload to ASCII on BOTH sides — char and
# byte indexing then agree and a non-ASCII documents.text cannot
# silently desynchronize the differential.
_ASCII_ONLY = r"[^\x00-\x7F]"


def _ascii_payload(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.encode(
            F.regexp_replace(F.col("text"), _ASCII_ONLY, ""), "UTF-8"
        ).alias("payload"),
    )


@register(
    "multimodal_frame_sample",
    oracle=rf"""
        WITH a AS (
            SELECT doc_id,
                   regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS t
            FROM documents
        ), f AS (
            SELECT doc_id, t, length(t) AS sz,
                   greatest(1, length(t) // {N_FRAMES}) AS step,
                   unnest(range({N_FRAMES})) AS frame_idx
            FROM a
        )
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(ascii(substring(t, CAST(frame_idx * step + 1 AS INTEGER), 1))
                    AS BIGINT) AS frame_val
        FROM f
        WHERE frame_idx * step < sz
        ORDER BY doc_id, frame_idx
    """,
    doc="Frame sampling over binary media blobs (1→N mapInPandas): "
    "evenly-spaced byte probes stand in for keyframe extraction.",
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _ascii_payload(table(spark, sf_dir, "documents"))
    return sample_frames(media).orderBy("doc_id", "frame_idx")


@register(
    "multimodal_meta",
    oracle=r"""
        WITH a AS (
            SELECT doc_id,
                   regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS t
            FROM documents
        )
        SELECT doc_id,
               CAST(octet_length(encode(t)) AS BIGINT) AS n_bytes,
               CASE WHEN length(t) > 0
                    THEN CAST(ascii(substring(t, 1, 1)) AS BIGINT) END
                   AS width,
               CASE WHEN length(t) > 0
                    THEN CAST(ascii(substring(t, length(t), 1)) AS BIGINT) END
                   AS height
        FROM a
        ORDER BY doc_id
    """,
    doc="Binary-column decode plumbing: documents.text encoded to bytes "
    "stands in for a media blob; mapInPandas extracts typed metadata.",
    tags=("multimodal",),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _ascii_payload(table(spark, sf_dir, "documents"))
    return extract_media_metadata(media).orderBy("doc_id")
