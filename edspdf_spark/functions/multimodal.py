"""Multimodal (image/audio/video) columns as opaque ``binary`` + typed metadata.

The reference pipeline renders page images for its torch branch
(``edspdf/pipes/extractors/pdfminer.py:186-192``, ``structures.py:102-111``)
but has no general media handling; a 100 TB training-data pipeline does.
Pattern: media rides as an opaque ``BinaryType`` column; decode /
feature-extract / resize / frame-sample are Arrow-batched ``mapInPandas``
stages so payload bytes never cross a Python row-at-a-time boundary.

Container formats here are deterministic stand-ins (documented below) because
no image/audio codec library is installed in this sandbox; the Spark-side
plumbing — schema, UDF signature, batch shape, partition expansion for frame
sampling — is real and tested. Pixel/PCM decode of real formats is stubbed
behind ``decode_image_pixels`` (import-gated PIL → ``NotImplementedError``).

Header layouts (big-endian)::

    IMG0 | width u32 | height u32 | channels u8 | payload…
    AUD0 | sample_rate u32 | n_samples u32 | payload…
    VID0 | width u32 | height u32 | n_frames u32 | fps_milli u32 | payload…
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC_IMAGE = b"IMG0"
MAGIC_AUDIO = b"AUD0"
MAGIC_VIDEO = b"VID0"

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("fps_milli", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


# ---------------------------------------------------------------------------
# encoders (test/fixture side)
# ---------------------------------------------------------------------------

def encode_image(width: int, height: int, channels: int, payload: bytes = b"") -> bytes:
    return MAGIC_IMAGE + struct.pack(">IIB", width, height, channels) + payload


def encode_audio(sample_rate: int, n_samples: int, payload: bytes = b"") -> bytes:
    return MAGIC_AUDIO + struct.pack(">II", sample_rate, n_samples) + payload


def encode_video(
    width: int, height: int, n_frames: int, fps_milli: int, payload: bytes = b""
) -> bytes:
    return MAGIC_VIDEO + struct.pack(">IIII", width, height, n_frames, fps_milli) + payload


def _parse_one(blob: Optional[bytes]) -> dict:
    out = dict.fromkeys([f.name for f in MEDIA_META_SCHEMA.fields])
    out["n_bytes"] = 0 if blob is None else len(blob)
    if blob is None or len(blob) < 4:
        return out
    magic = bytes(blob[:4])
    try:
        if magic == MAGIC_IMAGE and len(blob) >= 13:
            w, h, c = struct.unpack(">IIB", bytes(blob[4:13]))
            out.update(media_type="image", width=w, height=h, channels=c)
        elif magic == MAGIC_AUDIO and len(blob) >= 12:
            sr, ns = struct.unpack(">II", bytes(blob[4:12]))
            out.update(media_type="audio", sample_rate=sr, n_samples=ns)
        elif magic == MAGIC_VIDEO and len(blob) >= 20:
            w, h, nf, fm = struct.unpack(">IIII", bytes(blob[4:20]))
            out.update(
                media_type="video", width=w, height=h, n_frames=nf, fps_milli=fm
            )
    except struct.error:
        pass
    return out


# ---------------------------------------------------------------------------
# decode / feature-extract / resize / frame-sample operators
# ---------------------------------------------------------------------------

def with_media_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Typed-metadata decode: binary header → meta columns, Arrow-batched."""
    passthrough = [f for f in df.schema.fields if f.name != media_col]
    out_schema = T.StructType(list(passthrough) + list(MEDIA_META_SCHEMA.fields))
    pass_names = [f.name for f in passthrough]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pd.DataFrame(
                [_parse_one(b) for b in pdf[media_col]],
                columns=[f.name for f in MEDIA_META_SCHEMA.fields],
            )
            yield pd.concat(
                [pdf[pass_names].reset_index(drop=True), meta], axis=1
            )

    return df.mapInPandas(decode, schema=out_schema)


def with_byte_histogram(
    df: DataFrame, media_col: str = "media", n_bins: int = 16, skip_header: int = 0
) -> DataFrame:
    """Deterministic feature extraction (the modality-agnostic baseline
    "embedding"): normalized ``n_bins``-bin histogram over payload bytes.
    One ``np.bincount`` per row over a zero-copy ``frombuffer`` view — no
    per-byte Python."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("byte_hist", T.ArrayType(T.DoubleType()), False)]
    )
    shift = 8 - (n_bins - 1).bit_length()

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists = []
            for blob in pdf[media_col]:
                body = b"" if blob is None else bytes(blob[skip_header:])
                arr = np.frombuffer(body, dtype=np.uint8)
                counts = np.bincount(arr >> shift, minlength=n_bins).astype(np.float64)
                total = counts.sum()
                hists.append(list(counts / (total if total else 1.0)))
            yield pdf.assign(byte_hist=hists)

    return df.mapInPandas(feat, schema=out_schema)


def resize_plan(
    df: DataFrame, max_side: int = 224
) -> DataFrame:
    """Aspect-preserving resize TARGETS from decoded meta — pure column
    expressions (the arithmetic is relational; only pixel resampling needs a
    codec). Adds ``target_w``/``target_h``/``scale``."""
    scale = F.when(
        F.greatest("width", "height") <= max_side, F.lit(1.0)
    ).otherwise(F.lit(float(max_side)) / F.greatest("width", "height"))
    return (
        df.withColumn("scale", scale)
        .withColumn("target_w", F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1)))
        .withColumn("target_h", F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1)))
    )


def sample_frame_indices(
    df: DataFrame, every_n: int = 10, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame index
    (uniform stride, capped) — ``sequence`` + ``explode``, no UDF. The frame
    DECODE step is the stubbed part (``decode_image_pixels``); the partition
    expansion and schema are the real contract."""
    idx = F.sequence(
        F.lit(0),
        F.least(F.col("n_frames") - 1, F.lit(every_n * (max_frames - 1))),
        F.lit(every_n),
    )
    return (
        # n_frames > 0 guard: a parseable-but-empty video header would make
        # sequence(0, -1, +step) throw 'Illegal sequence boundaries' and one
        # malformed row would kill the whole stage
        df.filter((F.col("media_type") == "video") & (F.col("n_frames") > 0))
        .withColumn("frame_idx", F.explode(idx))
        .withColumn(
            "frame_ts_milli",
            (F.col("frame_idx") * F.lit(1000.0) * F.lit(1000.0)
             / F.col("fps_milli")).cast("long"),
        )
    )


def decode_image_pixels(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Real-codec pixel decode — STUB. No imaging library ships in this
    sandbox; with PIL/pyarrow-image available this becomes a mapInPandas
    stage yielding ``array<binary>`` row-major pixel planes with the exact
    same signature as :func:`with_media_meta`."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "pixel decode requires an imaging library (PIL) not present in "
            "this environment; metadata decode (with_media_meta), feature "
            "extraction (with_byte_histogram), resize planning (resize_plan) "
            "and frame sampling (sample_frame_indices) are fully implemented"
        )
    raise NotImplementedError("PIL present but codec path intentionally ungated in v1")
