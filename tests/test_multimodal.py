"""Multimodal column plumbing tests: the binary-column schema, the
Arrow-batched mapInPandas kernels, and determinism of the stubbed
decode — over the real documents table (text bytes as opaque payloads).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    return mm.with_media_column(docs, "text", mime="text/plain")


def test_media_column_schema(media_df):
    f = media_df.schema["media"].dataType
    assert f["payload"].dataType.typeName() == "binary"
    assert [x.name for x in f["meta"].dataType.fields] == [
        "mime", "source_uri", "width", "height", "duration_ms",
    ]
    assert media_df.select(F.col("media.meta.mime")).first()[0] == "text/plain"


def test_decode_image_stub_deterministic(media_df):
    out = mm.decode_image(media_df, "media", "doc_id",
                          deterministic_fake=True)
    assert out.columns == ["id", "width", "height", "mean_luma"]
    assert out.count() == 50
    a = {r["id"]: (r["width"], r["height"], r["mean_luma"])
         for r in out.collect()}
    b = {r["id"]: (r["width"], r["height"], r["mean_luma"])
         for r in mm.decode_image(media_df, "media", "doc_id",
                                  deterministic_fake=True).collect()}
    assert a == b  # stable across runs
    assert all(64 <= w <= 2048 and 64 <= h <= 2048 for w, h, _ in a.values())


def test_decode_image_raises_without_codec(media_df):
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL unexpectedly available")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        mm.decode_image(media_df, "media", "doc_id")


def test_image_features_match_python_md5(media_df, spark):
    """The Arrow round-trip must be byte-exact: features computed in the
    executor kernel equal the same md5 recipe computed driver-side."""
    out = mm.image_features(media_df, "media", "doc_id", dim=16)
    rows = {r["id"]: r["features"] for r in out.collect()}
    texts = {r["doc_id"]: r["text"]
             for r in media_df.select("doc_id", "text").collect()}
    for i, text in texts.items():
        payload = text.encode("utf-8")
        expect = [
            b / 255.0
            for b in hashlib.md5(payload + b"0").digest()
        ][:16]
        assert rows[i] == pytest.approx(expect)


def test_resize_images_stub(media_df):
    out = mm.resize_images(media_df, "media", "doc_id", max_side=128,
                           deterministic_fake=True)
    assert out.count() == 50
    for r in out.collect():
        assert max(r["width"], r["height"]) <= 128
        assert r["payload"] is not None


def test_extract_frames_stub(media_df):
    out = mm.extract_frames(media_df, "media", "doc_id", every_ms=1000,
                            deterministic_fake=True)
    pdf = out.toPandas()
    assert set(pdf.columns) == {"id", "frame_idx", "ts_ms", "payload"}
    # 1->N: more frames than inputs, and per-id frame indexes are dense
    assert len(pdf) > 50
    g = pdf.groupby("id")["frame_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()
