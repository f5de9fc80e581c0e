"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Round 2: the codec step is REAL for PPM/PGM/BMP/WAV — dependency-free
numpy codecs (:mod:`swanlake_spark.operators.codecs`) parse genuine
headers and pixel/sample planes. ``synthesize_media`` emits actual
encoded PPM/WAV bytes, so ``decode_media`` recovers true dimensions from
the payload (not the metadata), and ``resize_images`` resamples real
pixel planes. Formats beyond the built-in set (JPEG/PNG/MP4/...) raise
``UnsupportedMediaError`` — the seam where PIL/torchaudio/pyav plug in.

Schema convention for a multimodal table:
    id BIGINT, media BINARY, media_type STRING,
    meta STRUCT<width:INT, height:INT, sample_rate:INT, n_frames:INT>

Scale notes: all operators are single-pass ``mapInPandas`` (Arrow batch
transfer, partition-parallel, no shuffle); blob synthesis/decoding is
per-row numpy with no driver involvement.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from swanlake_spark.operators import codecs
from swanlake_spark.operators.codecs import UnsupportedMediaError
from swanlake_spark.pyship import ship_package

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

# deterministic synthesis parameters (oracle SQL mirrors these formulas)
_W_MOD, _W_MIN = 48, 8
_H_MOD, _H_MIN = 32, 8
_SR = 16000
_NSAMP_MOD, _NSAMP_MIN = 1000, 100
_NFRAMES_MOD = 120


def _synth_image(doc_id: int) -> tuple[bytes, int, int]:
    import numpy as np

    w = int(doc_id % _W_MOD + _W_MIN)
    h = int(doc_id % _H_MOD + _H_MIN)
    ys = np.arange(h, dtype=np.int64)[:, None]
    xs = np.arange(w, dtype=np.int64)[None, :]
    base = ys * 7 + xs * 3 + doc_id
    px = np.stack(
        [(base % 256), ((base * 5 + 17) % 256), ((base * 11 + 29) % 256)], axis=-1
    ).astype("uint8")
    return codecs.encode_ppm(px), w, h


def _synth_audio(doc_id: int) -> tuple[bytes, int]:
    import numpy as np

    n = int(doc_id % _NSAMP_MOD + _NSAMP_MIN)
    t = np.arange(n, dtype=np.int64)
    samples = ((t * (doc_id % 7 + 1) * 1321) % 65536 - 32768).astype("int16")
    return codecs.encode_wav(samples, _SR), n


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media blobs: image rows carry binary PPM (P6),
    audio rows carry RIFF/WAVE PCM16, video rows carry a PPM poster
    frame plus ``meta.n_frames``. Types cycle image/audio/video on
    ``id % 3``; dimensions/sample counts are id-derived formulas the
    oracle SQL can reproduce."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, mtypes, metas = [], [], [], []
            for raw_id in pdf[id_col]:
                doc_id = int(raw_id)
                kind = ("image", "audio", "video")[doc_id % 3]
                if kind == "audio":
                    blob, _n = _synth_audio(doc_id)
                    meta = {"width": None, "height": None,
                            "sample_rate": _SR, "n_frames": None}
                else:
                    blob, w, h = _synth_image(doc_id)
                    nf = doc_id % _NFRAMES_MOD + 1 if kind == "video" else None
                    meta = {"width": w, "height": h,
                            "sample_rate": None, "n_frames": nf}
                ids.append(doc_id)
                blobs.append(blob)
                mtypes.append(kind)
                metas.append(meta)
            yield pd.DataFrame(
                {"id": ids, "media": blobs, "media_type": mtypes, "meta": metas}
            )

    ship_package(df.sparkSession)
    return df.select(F.col(id_col)).mapInPandas(run, MEDIA_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def _default_codec(payload: bytes, media_type: str) -> dict:
    """Built-in numpy codecs with magic-byte sniffing; raises
    UnsupportedMediaError for formats outside PPM/PGM/BMP/WAV."""
    return codecs.decode_any(payload)


def decode_media(
    df: DataFrame,
    codec: Callable[[bytes, str], dict] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Decode binary media via Arrow-batched ``mapInPandas``.

    The default codec REALLY parses PPM/PGM/BMP/WAV headers and planes
    (width/height/sample_rate come from the bytes, not the metadata).
    ``codec(payload, media_type) -> {width, height, sample_rate, ...}``
    plugs in an external decoder for other formats. With
    ``strict=False`` an unrecognized format degrades to a
    bytes-only record (dims NULL); ``strict=True`` propagates
    ``UnsupportedMediaError`` — the real-codec seam."""
    use_codec = codec or _default_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, mtypes, nbytes, sums, ws, hs, srs = [], [], [], [], [], [], []
            for rid, blob, mtype in zip(pdf["id"], pdf["media"], pdf["media_type"]):
                b = bytes(blob) if blob is not None else b""
                try:
                    d = use_codec(b, mtype) if b else {}
                except UnsupportedMediaError:
                    if strict:
                        raise
                    d = {}
                ids.append(rid)
                mtypes.append(mtype)
                nbytes.append(len(b))
                # vectorized byte sum (uint64 accumulator — exact for any
                # blob under 2^56 bytes, same value as the Python loop)
                sums.append(
                    int(np.frombuffer(b, dtype=np.uint8).sum(dtype=np.uint64))
                    % (1 << 31)
                )
                ws.append(d.get("width"))
                hs.append(d.get("height"))
                srs.append(d.get("sample_rate"))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "media_type": mtypes,
                    "n_bytes": pd.array(nbytes, dtype="Int32"),
                    "checksum": sums,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "sample_rate": pd.array(srs, dtype="Int32"),
                }
            )

    ship_package(df.sparkSession)
    # only the three consumed columns cross the Arrow boundary — an
    # opaque mapInPandas otherwise ships (and reads) every input column,
    # e.g. the unused meta struct synthesize_media attaches (guide §4.1)
    return df.select("id", "media", "media_type").mapInPandas(
        run, DECODED_SCHEMA
    )


def decode_media_strict(df: DataFrame) -> DataFrame:
    """Strict decode: any format the built-in numpy codecs can't parse
    raises ``UnsupportedMediaError`` (a ``NotImplementedError``) at
    execution — the documented seam where PIL/torchaudio/pyav plug in."""
    return decode_media(df, strict=True)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature vector (FEATURE_DIM buckets, L1-normalized) from the
    DECODED content: pixel-intensity histogram for images (real decoded
    planes), sample-amplitude histogram for audio, raw-byte histogram
    for undecodable blobs — deterministic, library-free, with the
    production batch shape (Arrow in, fixed-dim float array out)."""
    import numpy as np

    def _hist(values: "np.ndarray") -> list[float]:
        hist = np.bincount(values % FEATURE_DIM, minlength=FEATURE_DIM).astype(
            np.float64
        )
        hist /= max(hist.sum(), 1.0)
        return [float(x) for x in hist]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["media"]:
                if blob is None or len(blob) == 0:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                b = bytes(blob)
                try:
                    d = codecs.decode_any(b)
                except UnsupportedMediaError:
                    d = None
                if d is None:
                    vals = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                elif "pixels" in d:
                    vals = d["pixels"].astype(np.int64).ravel()
                else:
                    vals = d["samples"].astype(np.int64).ravel() & 0xFF
                feats.append(_hist(vals))
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    ship_package(df.sparkSession)
    # ship only the consumed columns across the Arrow boundary
    return df.select("id", "media").mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Nearest-neighbor resize over REAL decoded pixel planes (PPM/PGM/
    BMP), vectorized in numpy per Arrow batch. Color planes are
    grayscale-reduced (mean over channels) so the output is a fixed-size
    width×height byte plane; undecodable payloads are skipped. One
    narrow pass, no shuffle."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_px = [], []
            for rid, payload in zip(pdf["id"], pdf["media"]):
                if payload is None:
                    continue
                try:
                    d = codecs.decode_any(bytes(payload))
                except UnsupportedMediaError:
                    continue
                if "pixels" not in d:
                    continue
                plane = d["pixels"]
                if plane.ndim == 3:
                    plane = plane.mean(axis=2)
                src_h, src_w = plane.shape
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

    ship_package(df.sparkSession)
    return (
        df.filter(F.col("media_type") == "image")
        .select("id", "media")  # drop unused columns before the boundary
        .mapInPandas(run, RESIZED_SCHEMA)
    )


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
