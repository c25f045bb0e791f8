"""Multimodal column handling — image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` (north-star extension, SURVEY.md §2.10).

The container has no image/audio codecs, so the actual decode step is a
clearly-marked stub (``NotImplementedError``) with a deterministic fake
used by tests — but the Spark-side plumbing is real: binary payload
column, metadata struct, mapInPandas batch iterator with a fixed output
schema, partition-preserving flow. Swap ``decode_image`` for a PIL/ffmpeg
call on a real cluster and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, head_sum long"


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    Here the payload is the utf-8 encoded text (a deterministic stand-in
    for image bytes); in production this column comes straight from the
    lakehouse (parquet BINARY), never through the driver.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.length("text").cast("long").alias("n_chars"),
            F.col("lang").alias("mime_hint"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real impl would be PIL/turbojpeg. Not available in this
    container — see module docstring."""
    raise NotImplementedError("image codecs not available in this environment")


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decoder: (n_bytes, sum of first 8 byte values).
    Stands in for (width, height)-style metadata extraction."""
    return len(payload), int(sum(payload[:8]))


def extract_features(docs_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: each batch arrives as a pandas DataFrame; the UDF is
    pure per-row so Spark keeps partitioning intact (no shuffle). This
    is the pattern for decode / resize / frame-sample at scale.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL text → NULL payload → NULL features (the engine-wide
            # NULL contract: missing input propagates, never fabricates
            # a zero-byte decode)
            feats = pdf["payload"].map(
                lambda p: (None, None) if p is None else fake_decode(p)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda t: t[0]).astype("Int64"),
                    "head_sum": feats.map(lambda t: t[1]).astype("Int64"),
                }
            )

    return docs_payload.mapInPandas(batches, FEATURE_SCHEMA)


# DuckDB twin: byte arithmetic on the UTF-8 encoding — head_sum reads
# the first 8 BYTES via hex(encode(text)) two-hex-digit slices, exactly
# matching the Spark side's payload[:8] byte sum (character-based ord()
# would diverge on any non-ASCII text). Even the pandas-UDF path is
# oracle-checked (rare for multimodal plumbing).
MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CASE WHEN text IS NULL THEN NULL ELSE
       CAST(COALESCE(list_aggregate(
           list_transform(
               generate_series(1, least(8, octet_length(encode(text)))),
               i -> CAST(concat('0x', substr(hex(encode(text)), 2*i-1, 2))
                    AS BIGINT)), 'sum'), 0)
            AS BIGINT) END AS head_sum
FROM documents"""


# ---- resize / frame-sample plumbing ----------------------------------

RESIZED_SCHEMA = (
    "doc_id long, payload binary, width int, height int, resized binary"
)
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary"


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """STUB: real impl would be soundfile/ffmpeg (absent here)."""
    raise NotImplementedError("audio codecs not available in this environment")


def fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic fake resize: truncate/tile payload to w*h bytes —
    stands in for a decoded-and-resampled pixel buffer of exactly the
    target size, so downstream batch-shape assertions are real.
    """
    need = w * h
    if not payload:
        return bytes(need)
    reps = (need // len(payload)) + 1
    return (payload * reps)[:need]


def resize_images(docs_payload: DataFrame, width: int = 16, height: int = 8) -> DataFrame:
    """Arrow-batched 'resize': one output row per input row, payload
    replaced by a fixed-size buffer + dimensions. Pure per-row →
    partition-preserving, no shuffle; swap fake_resize for
    PIL.Image.resize and nothing else changes.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"],
                    "width": width,
                    "height": height,
                    "resized": pdf["payload"].map(
                        lambda p: fake_resize(p, width, height)
                    ),
                }
            )

    return docs_payload.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(docs_payload: DataFrame, n_frames: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Arrow-batched 'frame sampling': 1→N row explosion inside the UDF
    (the video-decode shape: one container in, n frames out). Evenly
    spaced deterministic offsets; at scale the output is re-partitioned
    by the caller if frames feed a shuffle-heavy stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                if not p:
                    continue
                step = max(len(p) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(p) - 1, 0))
                    ids.append(did)
                    idxs.append(i)
                    frames.append(bytes(p[off : off + frame_bytes]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return docs_payload.mapInPandas(batches, FRAMES_SCHEMA)
