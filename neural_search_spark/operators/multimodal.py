"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + typed metadata, processed by
Arrow-batched kernels over ``mapInPandas`` — the only sane shape at 10^12
rows (one Python worker per partition, zero per-row overhead, media bytes
never deserialized JVM-side).

The decode kernels themselves need codec libraries (Pillow/ffmpeg/...) that
are NOT in this environment, so the decode step is stubbed two ways:
  * ``decode_stub="fake"``  — deterministic pseudo-decode (dims/duration
    derived from the byte content) so the full pipeline — schema, batching,
    partitioning, downstream aggs — runs and is testable end-to-end.
  * ``decode_stub="error"`` — raises NotImplementedError where the real
    decoder would run, marking the exact integration point.

Everything around the stub is real: binary-safe Arrow transport, bounded
batch sizes (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps memory
per batch — crucial when each row carries megabytes), and metadata
extraction that never touches Python (``media_stats``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, byte_len long, content_md5 string, "
    "width int, height int, n_frames int"
)


def attach_fake_media(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Testing helper: derive a deterministic binary 'media' column + metadata
    from the text payload (utf-8 bytes stand in for an encoded image)."""
    return corpus.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
    )


def _fake_decode_md5(h: str) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: dims from the payload's md5 hex digest.

    md5-derived (not crc) so ANY engine reproduces it — the driver's DuckDB
    oracle mirrors this arithmetic on the same bytes
    (``('0x'||substr(md5(..),1,4))::BIGINT``), putting the full decode
    pipeline shape (Arrow batch in, typed metadata out) under the
    correctness gate even though the real codec call is stubbed."""
    return (
        16 + int(h[0:4], 16) % 1024,
        16 + int(h[4:8], 16) % 1024,
        1 + int(h[8:12], 16) % 64,
    )


def decode_media(corpus: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """(doc_id, media_type, byte_len, content_md5, width, height, n_frames).

    The mapInPandas kernel is the real integration point for a decoder: it
    receives Arrow record batches with the binary column and returns typed
    metadata/features. Swap ``_fake_decode`` for Pillow/av decode in a
    deployment image.
    """
    if decode_stub not in ("fake", "error"):
        raise ValueError("decode_stub must be 'fake' or 'error'")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "real media decode requires codec libraries (Pillow/av); "
                    "this container runs the deterministic fake decoder only"
                )
            md5s = pdf["media"].map(lambda b: hashlib.md5(b).hexdigest())
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_len": pdf["media"].map(len),
                "content_md5": md5s,
            }
            dims = md5s.map(_fake_decode_md5)
            out["width"] = dims.map(lambda t: t[0]).astype("int32")
            out["height"] = dims.map(lambda t: t[1]).astype("int32")
            out["n_frames"] = dims.map(lambda t: t[2]).astype("int32")
            yield pd.DataFrame(out)

    return corpus.select("doc_id", "media", "media_type").mapInPandas(
        kernel, schema=MEDIA_SCHEMA
    )


def media_stats(corpus: DataFrame) -> DataFrame:
    """(doc_id, media_type, byte_len, content_md5) with NO Python worker —
    metadata that doesn't need decoding stays JVM-side (md5/length are
    built-ins), so a metadata-only pass never pays the Arrow transfer."""
    return corpus.select(
        "doc_id",
        "media_type",
        F.octet_length("media").cast("long").alias("byte_len"),
        F.md5("media").alias("content_md5"),
    )


def frame_sample_plan(
    decoded: DataFrame, every_n: int = 8
) -> DataFrame:
    """(doc_id, frame_idx): which frames a sampler would decode — the
    partition-friendly explode that precedes a real frame-extract kernel."""
    return decoded.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
