"""Multimodal column conventions: opaque binary payloads + typed metadata.

Extension surface (SURVEY §7.7). The convention: media travels as a
``binary`` column plus typed metadata columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas transforms over
``mapInPandas`` so the Python cost is paid per-batch, not per-row, and the
operator composes with any upstream DataFrame plan (partition-parallel,
no shuffle of the payload beyond what the plan already does).

The codec step probes for an OPTIONAL real decoder (r6): if PIL/Pillow
is importable, ``fake=False`` decodes actual image bytes; otherwise it
raises ``NotImplementedError`` (this runtime ships neither PIL nor
ffmpeg, so the in-sandbox tests assert the raise and the PIL branch is
exercised wherever Pillow exists). ``fake=True`` derives deterministic
pseudo-metadata from the bytes — the Spark-side plumbing (schema, batch
iteration, column pass-through) is real and tested either way.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

# Probed once at import: the optional real codec. Worker processes
# re-import this module, so the probe result is consistent per-host.
HAS_PIL = importlib.util.find_spec("PIL") is not None

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


def decode_image_real(payload: bytes) -> dict:
    """Real codec branch: decode image bytes with Pillow. Only callable
    when ``HAS_PIL``; kept separate from the stub so the dispatch in
    ``decode_image_stub`` stays a one-line probe."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        return {"width": im.width, "height": im.height, "mode": im.mode}


def decode_image_stub(payload: bytes, fake: bool = True) -> dict:
    """Codec dispatch. ``fake=True`` derives deterministic metadata from
    the bytes (no decoder needed — the Spark plumbing is what's under
    test). ``fake=False`` uses Pillow when importable and raises
    ``NotImplementedError`` otherwise (this sandbox has no image libs;
    a real deployment pip-installs Pillow and the same call decodes for
    real — ffmpeg/audio would slot in the same way)."""
    if not fake:
        if HAS_PIL:
            return decode_image_real(payload)
        raise NotImplementedError(
            "image/audio codecs are not available in this runtime "
            "(PIL not importable); install Pillow or use fake=True"
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

        _null_meta = {"width": None, "height": None, "mode": None}
        for pdf in batches:
            # null payloads yield null metadata — the same semantics as
            # the JVM pre-pass (octet_length/md5 of NULL are NULL); the
            # codec must never see None (len/md5/PIL all crash the
            # whole job on one null row otherwise)
            payloads = list(pdf[payload_col])
            metas = [
                decode_image_stub(p, fake=fake) if p is not None else _null_meta
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [
                        len(p) if p is not None else None for p in payloads
                    ],
                    "content_hash": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "mode": [m["mode"] for m in metas],
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, width int, height int, resized_width int, "
    "resized_height int, resized_hash string"
)


def resize_batch(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_side: int = 32,
    fake: bool = True,
) -> DataFrame:
    """Aspect-preserving resize-to-fit as an Arrow-batched pandas stage.

    The pixel work is the codec stub (a real deployment calls
    PIL.Image.resize here); the *geometry* is pure integer arithmetic —
    ``(side * max_side) // longest`` — so the stage is deterministic and
    oracle-checkable end-to-end. Output carries the original and target
    dimensions plus a content-addressed hash of the (payload, geometry)
    pair, the convention downstream training pipelines key caches on.
    """
    import hashlib

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:  # null payload -> null geometry row
                    rows.append((doc_id, None, None, None, None, None))
                    continue
                m = decode_image_stub(p, fake=fake)
                w, h = m["width"], m["height"]
                longest = max(w, h)
                if longest > max_side:
                    rw = max(1, (w * max_side) // longest)
                    rh = max(1, (h * max_side) // longest)
                else:
                    rw, rh = w, h
                digest = hashlib.md5(
                    f"{hashlib.md5(p).hexdigest()}:{rw}:{rh}".encode()
                ).hexdigest()
                rows.append((doc_id, w, h, rw, rh, digest))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height",
                    "resized_width", "resized_height", "resized_hash",
                ],
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, n_frames int, frame_hash string"


def frame_sample_batch(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_samples: int = 4,
    bytes_per_frame: int = 16,
    fake: bool = True,
) -> DataFrame:
    """Uniform frame sampling over a 'video' payload — the one-to-many
    pandas stage (each input row yields up to ``n_samples`` frame rows;
    ``mapInPandas`` is the UDTF-shaped escape hatch the way ``explode``
    is the built-in one).

    Frame count and stride are deterministic byte arithmetic standing in
    for container parsing (ffprobe in a real deployment): ``n_frames =
    max(1, n_bytes // bytes_per_frame)``, stride ``max(1, n_frames //
    n_samples)``, sampled indexes ``0, s, 2s, ...`` while < n_frames.
    Frame 'content' is hashed from (payload hash, index) — the cache-key
    convention again.
    """
    import hashlib

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:  # no frames decodable from a null payload
                    continue
                decode_image_stub(p, fake=fake)  # codec gate, parity with decode
                n_frames = max(1, len(p) // bytes_per_frame)
                stride = max(1, n_frames // n_samples)
                chash = hashlib.md5(p).hexdigest()
                for i in range(n_samples):
                    idx = i * stride
                    if idx >= n_frames:
                        break
                    rows.append(
                        (
                            doc_id,
                            idx,
                            n_frames,
                            hashlib.md5(f"{chash}:{idx}".encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "n_frames", "frame_hash"]
            )

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)
