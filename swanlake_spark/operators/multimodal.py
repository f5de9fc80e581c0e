"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested — schemas, partitioning,
batch shapes, Pandas-UDF signatures. The actual codec step is stubbed
(this container has no image/audio libraries): ``decode_media`` uses a
deterministic fake decoder keyed on a header byte unless a real codec
callback is supplied; ``NotImplementedError`` marks the seam.

Schema convention for a multimodal table:
    id BIGINT, media BINARY, media_type STRING,
    meta STRUCT<width:INT, height:INT, sample_rate:INT, n_frames:INT>
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media blobs for plumbing tests: payload bytes
    derived from the id (sha2 of the id string, repeated), type cycling
    image/audio/video, plausible metadata."""
    sid = F.col(id_col).cast("string")
    payload = F.to_binary(
        F.concat(F.sha2(sid, 256), F.sha2(F.concat(sid, F.lit("x")), 256)), F.lit("hex")
    )
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    meta = F.struct(
        (F.col(id_col) % 640 + 32).cast("int").alias("width"),
        (F.col(id_col) % 480 + 32).cast("int").alias("height"),
        F.when(mtype == "audio", F.lit(16000)).otherwise(F.lit(None)).cast("int").alias("sample_rate"),
        F.when(mtype == "video", (F.col(id_col) % 120 + 1).cast("int"))
        .otherwise(F.lit(None))
        .cast("int")
        .alias("n_frames"),
    )
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("media"),
        mtype.alias("media_type"),
        meta.alias("meta"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def decode_media(
    df: DataFrame,
    codec: Callable[[bytes, str], dict] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode binary media via Arrow-batched ``mapInPandas``.

    ``codec(payload, media_type) -> {width, height, ...}`` plugs in a
    real decoder (PIL/libav/...); without one, a deterministic fake
    decoder (byte checksum + metadata passthrough shape) exercises the
    identical plumbing. Partition-parallel, Arrow transfer, no row-wise
    Python overhead beyond the batch loop.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec is not None:
                decoded = [
                    codec(m, t) for m, t in zip(pdf["media"], pdf["media_type"])
                ]
                width = [d.get("width") for d in decoded]
                height = [d.get("height") for d in decoded]
            else:
                # fake decode: real codecs unavailable in this container.
                # Byte-sum checksum keeps the data-dependency honest.
                width = pdf["meta"].map(
                    lambda s: int(s["width"]) if s and s["width"] is not None else None
                )
                height = pdf["meta"].map(
                    lambda s: int(s["height"]) if s and s["height"] is not None else None
                )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["media"].map(lambda b: len(b) if b is not None else 0),
                    "checksum": pdf["media"].map(
                        lambda b: int(sum(b) % (1 << 31)) if b is not None else 0
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


def decode_media_strict(df: DataFrame) -> DataFrame:
    """The real-codec path: raises NotImplementedError at execution time —
    the documented seam where PIL/torchaudio/pyav plug in."""

    def codec(payload: bytes, media_type: str) -> dict:
        raise NotImplementedError(
            "real media decoding requires an image/audio library not present "
            "in this environment; pass codec= to decode_media instead"
        )

    return decode_media(df, codec=codec)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Byte-histogram feature vector (FEATURE_DIM buckets, L1-normalized)
    from the binary payload — a deterministic, library-free stand-in for
    a real embedding model, with the production batch shape (Arrow in,
    fixed-dim float array out)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["media"]:
                if blob is None or len(blob) == 0:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(
                    np.float64
                )
                hist /= max(hist.sum(), 1.0)
                feats.append([float(x) for x in hist])
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    return df.mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize for image rows: nearest-neighbor index sampling over the
    pixel buffer, vectorized in numpy per Arrow batch (``mapInPandas``).

    The pixel buffer is derived from the payload bytes (a real decoder
    would produce it — codec libs are absent in this container, the
    documented stub seam); the resampling arithmetic, output schema and
    batch shape are the real pipeline plumbing. One narrow pass, no
    shuffle; output rows are fixed-size width×height byte planes.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_px = [], []
            for rid, payload, meta in zip(pdf["id"], pdf["media"], pdf["meta"]):
                if payload is None or meta is None:
                    continue
                src_w = int(meta["width"] or 1)
                src_h = int(meta["height"] or 1)
                buf = np.frombuffer(payload, dtype=np.uint8)
                # stub decode: tile payload bytes into a src_h×src_w plane
                plane = np.resize(buf, (src_h, src_w))
                ys = (np.arange(height) * src_h) // height
                xs = (np.arange(width) * src_w) // width
                resized = plane[ys][:, xs]
                out_ids.append(rid)
                out_px.append(resized.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "id": out_ids,
                    "width": [width] * len(out_ids),
                    "height": [height] * len(out_ids),
                    "pixels": out_px,
                }
            )

    return df.filter(F.col("media_type") == "image").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame sampling for video rows: emits (id, frame_idx) for every
    k-th frame per metadata, the fan-out shape of a real frame extractor
    (explode is JVM-side; the decode of each frame would be a follow-up
    mapInPandas)."""
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_k),
                )
            ).alias("frame_idx"),
        )
    )
