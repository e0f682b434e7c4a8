"""Multimodal column conventions: opaque binary payloads + typed metadata.

Extension surface (SURVEY §7.7). The convention: media travels as a
``binary`` column plus typed metadata columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas transforms over
``mapInPandas`` so the Python cost is paid per-batch, not per-row, and the
operator composes with any upstream DataFrame plan (partition-parallel,
no shuffle of the payload beyond what the plan already does).

The actual codec step is STUBBED: image/audio libraries are not in this
runtime. ``decode_image_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it derives deterministic pseudo-metadata
from the bytes — the Spark-side plumbing (schema, batch iteration, column
pass-through) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, content_hash string, width int, height int, "
    "mode string"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo payload builder: utf-8 bytes of a text column as the opaque
    ``payload`` binary column (stand-in for image/audio bytes)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side metadata over a binary column — no Python: byte length and
    content hash. This is the cheap pre-pass that dedups / filters
    payloads *before* any expensive decode."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col))).withColumn(
        "content_hash", F.md5(F.col(payload_col))
    )


def decode_image_stub(payload: bytes, fake: bool = True) -> dict:
    """Codec stub. A real deployment swaps in PIL/ffmpeg here; the
    runtime has neither, so ``fake=True`` derives deterministic metadata
    from the bytes and ``fake=False`` raises."""
    if not fake:
        raise NotImplementedError(
            "image/audio codecs are not available in this runtime; "
            "plug a real decoder into decode_batch(fake=False)"
        )
    return {
        "width": 1 + payload[0] % 64 if payload else 0,
        "height": 1 + payload[-1] % 64 if payload else 0,
        "mode": "RGB" if len(payload) % 2 == 0 else "L",
    }


def decode_batch(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched decode over ``mapInPandas``.

    Each pandas batch decodes vectorized-ish in one Python call per
    batch; output schema is fixed (DECODED_SCHEMA) so downstream plans
    stay fully typed. This is the pattern for any per-payload Python
    stage (frame sampling, spectrograms, EXIF), regardless of the codec.
    """
    import hashlib

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = [decode_image_stub(p, fake=fake) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(p) for p in pdf[payload_col]],
                    "content_hash": [
                        hashlib.md5(p).hexdigest() for p in pdf[payload_col]
                    ],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "mode": [m["mode"] for m in metas],
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)
