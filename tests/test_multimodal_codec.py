"""Codec-branch matrix for the multimodal decode stage (r6, VERDICT r5
task #7): the ``fake=True`` stub must stay deterministic, and
``fake=False`` must dispatch to Pillow when importable or raise the
documented ``NotImplementedError`` when not. The sandbox ships without
PIL, so the raise branch is what's asserted here; the PIL branch runs
wherever Pillow exists (skip-marked, not dead code).
"""

import pytest

from big_data_analysis_of_twitter_emoji_usage_spark.operators.multimodal import (
    HAS_PIL,
    attach_binary_payload,
    decode_batch,
    decode_image_real,
    decode_image_stub,
)


def test_stub_metadata_deterministic():
    m = decode_image_stub(b"hello!", fake=True)
    assert m == {
        "width": 1 + b"hello!"[0] % 64,
        "height": 1 + b"hello!"[-1] % 64,
        "mode": "RGB",
    }
    assert decode_image_stub(b"", fake=True) == {
        "width": 0, "height": 0, "mode": "RGB",
    }
    assert decode_image_stub(b"odd", fake=True)["mode"] == "L"


@pytest.mark.skipif(HAS_PIL, reason="Pillow installed: raise branch unreachable")
def test_real_branch_raises_without_pil():
    with pytest.raises(NotImplementedError, match="PIL not importable"):
        decode_image_stub(b"\x89PNG...", fake=False)


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed in this runtime")
def test_real_branch_decodes_with_pil():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 5)).save(buf, format="PNG")
    m = decode_image_stub(buf.getvalue(), fake=False)
    assert (m["width"], m["height"], m["mode"]) == (7, 5, "RGB")
    assert decode_image_real(buf.getvalue()) == m


def test_decode_batch_fake_false_matches_probe(spark, sf_dir):
    """End-to-end mapInPandas with fake=False: decodes when Pillow
    exists (text bytes are not an image, so PIL raising its own decode
    error is also a valid 'real branch reached' signal), raises the
    documented NotImplementedError when it doesn't. Either way the
    failure surfaces as a task error, not silent nulls."""
    from pyspark.errors.exceptions.base import PySparkException

    from big_data_analysis_of_twitter_emoji_usage_spark.core import load_table

    docs = load_table(spark, sf_dir, "documents").limit(3)
    df = decode_batch(attach_binary_payload(docs), fake=False)
    if HAS_PIL:
        with pytest.raises(Exception):  # UnidentifiedImageError via task
            df.collect()
    else:
        with pytest.raises(PySparkException, match="NotImplementedError"):
            df.collect()


def test_null_payloads_survive_all_pandas_stages(spark):
    """Null binary payloads must not crash the Arrow workers (review
    find: len(None)/md5(None) killed the whole job). decode/resize
    emit null metadata rows — the same semantics as the JVM
    binary_metadata pre-pass — and frame sampling emits no frames."""
    from big_data_analysis_of_twitter_emoji_usage_spark.operators.multimodal import (
        decode_batch,
        frame_sample_batch,
        resize_batch,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"abcdef")), (2, None)],
        "doc_id long, payload binary",
    )
    dec = {r["doc_id"]: r for r in decode_batch(df).collect()}
    assert dec[1]["n_bytes"] == 6 and dec[1]["width"] is not None
    assert dec[2]["n_bytes"] is None and dec[2]["content_hash"] is None
    assert dec[2]["width"] is None and dec[2]["mode"] is None

    rez = {r["doc_id"]: r for r in resize_batch(df).collect()}
    assert rez[1]["resized_hash"] is not None
    assert rez[2]["width"] is None and rez[2]["resized_hash"] is None

    frames = frame_sample_batch(df).collect()
    assert {r["doc_id"] for r in frames} == {1}


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed in this runtime")
def test_decode_batch_real_png_with_pil(spark):
    """VERDICT r10 #7: the full Spark path (mapInPandas → Arrow batch →
    per-row real decode) on actual PNG payloads — proves the codec
    plug-in seam end-to-end where Pillow exists, not just the per-row
    helper. Skipped cleanly in PIL-less runtimes (the stub arithmetic
    remains the oracle-checked path there)."""
    import io

    from PIL import Image

    def png(w, h, mode="RGB"):
        buf = io.BytesIO()
        Image.new(mode, (w, h)).save(buf, format="PNG")
        return bytearray(buf.getvalue())

    df = spark.createDataFrame(
        [(1, png(7, 5)), (2, png(3, 9, "L")), (3, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in decode_batch(df, fake=False).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["mode"]) == (7, 5, "RGB")
    assert (got[2]["width"], got[2]["height"], got[2]["mode"]) == (3, 9, "L")
    assert got[3]["width"] is None and got[3]["content_hash"] is None
