"""Optional-dependency lane (VERDICT r5 item 10): exercise the REAL
PIL decode/resize paths of extras/multimodal.py so the Arrow plumbing
is verified against an actual codec.  Skips cleanly when PIL is not
installed (this container has no codec libs); green wherever it is.

Payloads are real PNGs synthesized in-process from the documents table's
ids (no new input data — the parquet corpus still drives the rows)."""

import io

import pytest
from pyspark.sql import functions as F

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from pydiverse_transform_spark.extras import multimodal as mm  # noqa: E402


def _png(w: int, h: int, shade: int) -> bytes:
    img = Image.new("L", (w, h), color=shade)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def png_df(spark, sf_dir):
    ids = [r["doc_id"] for r in
           spark.read.parquet(f"{sf_dir}/documents.parquet")
           .select("doc_id").orderBy("doc_id").limit(6).collect()]
    rows = [
        # widths 64..384 so some rows exceed max_side=256 and resize
        (i, _png(64 * (n + 1), 32 * (n + 1), 40 * n))
        for n, i in enumerate(ids)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return mm.with_media_column(df, "payload", mime="image/png"), rows


def test_decode_image_real_pil(png_df):
    df, rows = png_df
    got = {r["id"]: r for r in mm.decode_image(df).collect()}
    for n, (i, _) in enumerate(rows):
        r = got[i]
        assert (r["width"], r["height"]) == (64 * (n + 1), 32 * (n + 1))
        # uniform shade image: mean luma == shade/255
        assert abs(r["mean_luma"] - (40 * n) / 255.0) < 1e-4


def test_resize_images_real_pil(png_df):
    df, rows = png_df
    got = {r["id"]: r for r in
           mm.resize_images(df, max_side=256).collect()}
    for n, (i, payload) in enumerate(rows):
        r = got[i]
        w0, h0 = 64 * (n + 1), 32 * (n + 1)
        if max(w0, h0) <= 256:
            assert (r["width"], r["height"]) == (w0, h0)
            assert bytes(r["payload"]) == payload
        else:
            assert max(r["width"], r["height"]) <= 256
            # aspect preserved within integer rounding
            assert abs(r["width"] / r["height"] - w0 / h0) < 0.1
            # the payload really was re-encoded: decodes to the new size
            img = Image.open(io.BytesIO(bytes(r["payload"])))
            assert img.size == (r["width"], r["height"])
