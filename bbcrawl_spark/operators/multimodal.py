"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed through
``mapInPandas`` so one Arrow batch of blobs is handled per Python call and
nothing media-sized ever crosses a shuffle unnecessarily.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is STUBBED two ways, both clearly marked:

* ``decode_image(strict=True)`` raises NotImplementedError — the real
  pipeline wires a codec here;
* the deterministic FAKEIMG format (header ``FAKEIMG:w,h:`` + w*h payload
  bytes) makes the Spark-side plumbing — schema, batch shape, partition
  behavior, resize/frame-sample arithmetic — fully real and testable.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media table column contract: id + blob + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("blob", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

_FAKE_RE = re.compile(rb"^FAKEIMG:(\d+),(\d+):")

#: registered real decoder (driver-side). A cluster wires its codec with
#: ``set_decoder`` instead of editing this operator; the registered function
#: is captured into each operator's closure at DataFrame-CONSTRUCTION time
#: and shipped to executors by cloudpickle — mutating this module global
#: alone would never reach the separate worker processes.
_DECODER: list = []


def set_decoder(fn) -> None:
    """Register the real image decoder: ``fn(blob: bytes) -> np.ndarray``
    (grayscale ``(H, W)`` uint8). E.g. on a cluster with PIL::

        set_decoder(lambda b: np.asarray(
            PIL.Image.open(io.BytesIO(b)).convert("L")))

    Operators built AFTER registration use it for any non-FAKEIMG blob; the
    function must be picklable (top-level def or lambda over picklable
    state)."""
    _DECODER[:] = [fn]


def get_decoder():
    return _DECODER[0] if _DECODER else None


def reset_decoder() -> None:
    _DECODER.clear()


def encode_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic stand-in blob: FAKEIMG header + w*h pseudo-pixels."""
    rng = np.random.RandomState(seed)
    payload = rng.randint(0, 256, size=width * height, dtype=np.int64).astype(np.uint8)
    return b"FAKEIMG:%d,%d:" % (width, height) + payload.tobytes()


def _decode_fake(blob: bytes) -> np.ndarray:
    m = _FAKE_RE.match(blob)
    if not m:
        raise ValueError("not a FAKEIMG blob")
    w, h = int(m.group(1)), int(m.group(2))
    payload = np.frombuffer(blob[m.end() :], dtype=np.uint8)
    return payload[: w * h].reshape(h, w)


def decode_image(blob: bytes, strict: bool = True, decoder=None) -> np.ndarray:
    """Decode a blob: FAKEIMG natively, anything else through the pluggable
    decoder (``decoder`` argument, falling back to the ``set_decoder``
    registry). Real codec libraries are not present in this container, so
    with no decoder registered a non-FAKEIMG blob raises (strict) — the
    message points at the registry seam a cluster wires."""
    if _FAKE_RE.match(blob or b""):
        return _decode_fake(blob)
    dec = decoder if decoder is not None else get_decoder()
    if dec is not None:
        return np.asarray(dec(blob), dtype=np.uint8)
    if strict:
        raise NotImplementedError(
            "no image codec available in this environment; register one with "
            "bbcrawl_spark.operators.multimodal.set_decoder(fn) — e.g. "
            "PIL/turbojpeg on a real cluster"
        )
    raise ValueError("unknown image format")


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_intensity", IntegerType()),
        StructField("nonzero_ratio_pct", IntegerType()),
    ]
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract per Arrow batch (mapInPandas): dimensions,
    mean intensity, nonzero ratio. Batch shape is real; the decode is the
    FAKEIMG stub."""

    dec = get_decoder()  # captured NOW — ships to workers inside the closure

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None:
                    continue  # metadata-only / failed-fetch row: skip
                img = decode_image(bytes(blob), strict=False, decoder=dec)
                rows.append(
                    {
                        "media_id": mid,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "mean_intensity": int(img.mean()),
                        "nonzero_ratio_pct": int(100 * (img > 0).mean()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return media.select("media_id", "blob").mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize inside mapInPandas, re-encoded as FAKEIMG —
    demonstrates blob-in/blob-out UDF plumbing with bounded Arrow batches."""
    schema = StructType(
        [StructField("media_id", LongType()), StructField("blob", BinaryType())]
    )

    dec = get_decoder()  # captured NOW — ships to workers inside the closure

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None:
                    continue  # metadata-only / failed-fetch row: skip
                img = decode_image(bytes(blob), strict=False, decoder=dec)
                ys = (np.arange(out_h) * img.shape[0] // out_h).clip(0, img.shape[0] - 1)
                xs = (np.arange(out_w) * img.shape[1] // out_w).clip(0, img.shape[1] - 1)
                small = img[np.ix_(ys, xs)]
                out.append(
                    {
                        "media_id": mid,
                        "blob": b"FAKEIMG:%d,%d:" % (out_w, out_h) + small.tobytes(),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "blob"])

    return media.select("media_id", "blob").mapInPandas(_resize, schema)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling STUB: treats each FAKEIMG row as a frame
    container of `height` frames and emits every_n-th row index — the
    partitioning/explode shape of real frame sampling without a codec."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("height") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


# ---------------------------------------------------------------------------
# audio (the third modality: FAKEAUD stand-in + pluggable codec registry,
# same seam pattern as the image decoder)
# ---------------------------------------------------------------------------

_FAKE_AUD_RE = re.compile(rb"^FAKEAUD:(\d+),(\d+):")

_AUDIO_DECODER: list = []


def set_audio_decoder(fn) -> None:
    """Register the real audio decoder: ``fn(blob: bytes) ->
    (sample_rate: int, samples: np.ndarray[int16])``. E.g. soundfile/ffmpeg
    on a real cluster. Captured into operator closures at construction,
    exactly like ``set_decoder``."""
    _AUDIO_DECODER[:] = [fn]


def get_audio_decoder():
    return _AUDIO_DECODER[0] if _AUDIO_DECODER else None


def reset_audio_decoder() -> None:
    _AUDIO_DECODER.clear()


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    """Deterministic stand-in blob: FAKEAUD header + n int16 pseudo-samples."""
    rng = np.random.RandomState(seed)
    payload = rng.randint(-32768, 32768, size=n_samples, dtype=np.int64).astype(
        np.int16
    )
    return b"FAKEAUD:%d,%d:" % (sample_rate, n_samples) + payload.tobytes()


def decode_audio(
    blob: bytes, strict: bool = True, decoder=None
) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples): FAKEAUD natively, anything else through
    the pluggable audio decoder registry — no audio codec is installable in
    this container, so with no decoder registered a non-FAKEAUD blob raises
    with the seam named."""
    m = _FAKE_AUD_RE.match(blob or b"")
    if m:
        sr, n = int(m.group(1)), int(m.group(2))
        samples = np.frombuffer(blob[m.end() :], dtype=np.int16)[:n]
        return sr, samples
    dec = decoder if decoder is not None else get_audio_decoder()
    if dec is not None:
        sr, samples = dec(blob)
        return int(sr), np.asarray(samples, dtype=np.int16)
    if strict:
        raise NotImplementedError(
            "no audio codec available in this environment; register one with "
            "bbcrawl_spark.operators.multimodal.set_audio_decoder(fn) — e.g. "
            "soundfile/ffmpeg on a real cluster"
        )
    raise ValueError("unknown audio format")


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("rms_e0", IntegerType()),
        StructField("zero_crossings", IntegerType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract audio per Arrow batch (mapInPandas):
    duration, integer RMS amplitude, zero-crossing count. Batch shape,
    schema, and registry capture are real; the decode is the FAKEAUD stub
    until a codec is registered."""

    dec = get_audio_decoder()  # captured NOW — ships to workers in the closure

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None:
                    continue  # metadata-only / failed-fetch row: skip
                sr, x = decode_audio(bytes(blob), strict=False, decoder=dec)
                xf = x.astype(np.float64)
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": sr,
                        "n_samples": len(x),
                        "duration_ms": int(len(x) * 1000 / max(sr, 1)),
                        "rms_e0": int(np.sqrt((xf * xf).mean()) if len(x) else 0),
                        "zero_crossings": int(
                            np.count_nonzero(np.diff(np.signbit(xf)))
                            if len(x) > 1
                            else 0
                        ),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA]
            )

    return media.select("media_id", "blob").mapInPandas(_extract, AUDIO_FEATURES_SCHEMA)
