"""Multimodal (image/audio/video) columns for training-data pipelines.

Design for 100 TB: media payloads are opaque ``binary`` columns carried
next to a typed metadata struct; all per-item compute (decode, resize,
feature extraction, frame sampling) runs as Arrow-batched pandas
iterators via ``mapInPandas`` — executor-parallel, no driver involvement,
no shuffle (narrow transformations over the scan partitioning).  Batch
size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
payload bytes cross the JVM↔Python boundary exactly once per stage.

The actual codecs (PIL / ffmpeg / librosa) are NOT available in this
environment, so the decode kernels are STUBBED:

- ``decode_image`` / ``extract_frames`` / ``audio_features`` raise
  ``NotImplementedError`` unless the optional library import succeeds, OR
- the ``deterministic_fake=True`` mode derives stable pseudo-content
  (dimensions, pixel stats, features) from the md5 of the payload — the
  Spark-side plumbing (schema, batching, partitioning, UDF signatures) is
  real and tested either way, and the fake is oracle-reproducible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .util import fan_out

__all__ = [
    "MEDIA_META_SCHEMA", "with_media_column", "decode_image",
    "image_features", "resize_images", "extract_frames",
]

# typed metadata carried alongside every opaque payload
MEDIA_META_SCHEMA = StructType([
    StructField("mime", StringType()),
    StructField("source_uri", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("duration_ms", LongType()),
])


def with_media_column(df: DataFrame, payload_col: str,
                      mime: str = "application/octet-stream",
                      out_col: str = "media") -> DataFrame:
    """Wrap an existing binary/string column as (payload: binary,
    meta: struct) — the canonical multimodal column shape."""
    payload = F.col(payload_col)
    if dict(df.dtypes)[payload_col] == "string":
        payload = F.encode(payload, "UTF-8")
    return df.withColumn(
        out_col,
        F.struct(
            payload.alias("payload"),
            F.struct(
                F.lit(mime).alias("mime"),
                F.lit(None).cast(StringType()).alias("source_uri"),
                F.lit(None).cast(LongType()).alias("width"),
                F.lit(None).cast(LongType()).alias("height"),
                F.lit(None).cast(LongType()).alias("duration_ms"),
            ).alias("meta"),
        ),
    )


def _fake_dims(payload: bytes) -> tuple[int, int]:
    h = hashlib.md5(payload).hexdigest()
    return 64 + int(h[:4], 16) % 1985, 64 + int(h[4:8], 16) % 1985


def _fake_features(payload: bytes, dim: int) -> list[float]:
    out: list[float] = []
    h = b""
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(payload + str(counter).encode()).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:dim]


DECODED_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("mean_luma", DoubleType()),
])


def decode_image(df: DataFrame, media_col: str = "media",
                 id_col: str = "doc_id",
                 deterministic_fake: bool = False) -> DataFrame:
    """Decode payloads to (id, width, height, mean_luma) via an
    Arrow-batched ``mapInPandas`` kernel.

    Real decode needs PIL; with ``deterministic_fake`` the dimensions and
    luma are derived from md5(payload) — STUB, clearly marked."""
    try:
        from PIL import Image  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil and not deterministic_fake:
        raise NotImplementedError(
            "image decoding needs PIL, which is not installed; pass "
            "deterministic_fake=True for the md5-derived stub"
        )

    src = fan_out(df).select(F.col(id_col).alias("id"),
                    F.col(f"{media_col}.payload").alias("payload"))

    def kernel(batches: Iterator) -> Iterator:
        import io

        import pandas as pd

        for pdf in batches:
            ids, ws, hs, ls = [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload)
                if have_pil and not deterministic_fake:
                    from PIL import Image

                    img = Image.open(io.BytesIO(data)).convert("L")
                    w, h = img.size
                    luma = sum(img.getdata()) / (w * h * 255.0)
                else:
                    w, h = _fake_dims(data)
                    luma = int(hashlib.md5(data).hexdigest()[8:12], 16) / 65535.0
                ids.append(i)
                ws.append(w)
                hs.append(h)
                ls.append(round(luma, 6))
            yield pd.DataFrame(
                {"id": ids, "width": ws, "height": hs, "mean_luma": ls}
            )

    return src.mapInPandas(kernel, schema=DECODED_SCHEMA)


def image_features(df: DataFrame, media_col: str = "media",
                   id_col: str = "doc_id", dim: int = 16,
                   deterministic_fake: bool = True) -> DataFrame:
    """Fixed-dimension float features per payload (the shape a CLIP-style
    embedder produces) via ``mapInPandas``.  The stub derives features
    from md5(payload) — deterministic and oracle-reproducible."""
    if not deterministic_fake:
        raise NotImplementedError(
            "no embedding model is available in this environment; use "
            "deterministic_fake=True (md5-derived stub)"
        )
    schema = StructType([
        StructField("id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ])
    src = fan_out(df).select(F.col(id_col).alias("id"),
                    F.col(f"{media_col}.payload").alias("payload"))

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf["id"],
                "features": [
                    _fake_features(bytes(p), dim) for p in pdf["payload"]
                ],
            })

    return src.mapInPandas(kernel, schema=schema)


def resize_images(df: DataFrame, media_col: str = "media",
                  id_col: str = "doc_id", max_side: int = 256,
                  deterministic_fake: bool = False) -> DataFrame:
    """Resize payloads so the longer side is ``max_side`` (aspect
    preserved), returning (id, payload, width, height).  Stub mode keeps
    the payload and only rescales the fake dimensions."""
    try:
        from PIL import Image  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil and not deterministic_fake:
        raise NotImplementedError(
            "image resizing needs PIL; pass deterministic_fake=True for "
            "the dimension-only stub"
        )
    schema = StructType([
        StructField("id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ])
    src = fan_out(df).select(F.col(id_col).alias("id"),
                    F.col(f"{media_col}.payload").alias("payload"))

    def kernel(batches: Iterator) -> Iterator:
        import io

        import pandas as pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload)
                if have_pil and not deterministic_fake:
                    from PIL import Image

                    img = Image.open(io.BytesIO(data))
                    fmt = img.format or "PNG"
                    w, h = img.size
                    scale = max_side / max(w, h)
                    if scale < 1.0:
                        img = img.resize(
                            (max(1, int(w * scale)),
                             max(1, int(h * scale))))
                        w, h = img.size
                        buf = io.BytesIO()
                        img.save(buf, format=fmt)
                        data = buf.getvalue()
                else:
                    w, h = _fake_dims(data)
                    scale = max_side / max(w, h)
                    if scale < 1.0:
                        w, h = int(w * scale), int(h * scale)
                rows.append((i, data, w, h))
            yield pd.DataFrame(
                rows, columns=["id", "payload", "width", "height"]
            )

    return src.mapInPandas(kernel, schema=schema)


def extract_frames(df: DataFrame, media_col: str = "media",
                   id_col: str = "doc_id", every_ms: int = 1000,
                   deterministic_fake: bool = False) -> DataFrame:
    """Sample one frame per ``every_ms`` from video payloads, exploding
    to (id, frame_idx, ts_ms, payload) — a 1→N mapInPandas (output rows
    per input row vary, which mapInPandas supports natively).  Stub mode
    derives a fake duration from the payload hash and emits empty frame
    payloads."""
    try:
        import av  # noqa: F401
        have_av = True
    except ImportError:
        have_av = False
    if not have_av and not deterministic_fake:
        raise NotImplementedError(
            "frame extraction needs PyAV/ffmpeg; pass "
            "deterministic_fake=True for the schedule-only stub"
        )
    schema = StructType([
        StructField("id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("ts_ms", LongType()),
        StructField("payload", BinaryType()),
    ])
    src = fan_out(df).select(F.col(id_col).alias("id"),
                    F.col(f"{media_col}.payload").alias("payload"))

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload)
                duration_ms = 500 + int(
                    hashlib.md5(data).hexdigest()[:6], 16
                ) % 30000
                for k, ts in enumerate(range(0, duration_ms, every_ms)):
                    rows.append((i, k, ts, b""))
            yield pd.DataFrame(
                rows, columns=["id", "frame_idx", "ts_ms", "payload"]
            )

    return src.mapInPandas(kernel, schema=schema)
