"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery is real and tested — schema, partition sizing,
Arrow batch shape through ``mapInPandas`` — while the actual codec calls
are stubbed (no image/audio libraries in this container): decode
produces a deterministic fake derived from the bytes when the real
library is absent, or raises NotImplementedError when
``strict=True``. Swapping in PIL/torchaudio/ffmpeg touches ONLY the
``_decode_*`` functions; the distributed plumbing is unchanged.

Schema convention: payload ``content: binary`` + typed metadata struct
(media_type, byte_len, sha) so downstream ops can filter/route without
touching bytes (column pruning keeps scans cheap at 100 TB — the binary
column is only read by stages that decode).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("md5", T.StringType(), True),
    ]
)

try:  # the real decoder, when available
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _decode_image_fake(buf: bytes) -> tuple[int, int, float]:
    """Deterministic fake decode: dims/luma derived from content hash.
    STUB — replace with PIL decode when the library is present."""
    h = hashlib.md5(buf).digest()
    return 64 + h[0] % 1024, 64 + h[1] % 1024, h[2] / 255.0


def extract_image_features(
    media: DataFrame, strict: bool = False, batch_size_hint: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over binary image content.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame;
    decode is per-element inside the batch (codecs are inherently
    per-object) but transport and scheduling are vectorized."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["media_type"] == "image"]
            if pdf.empty:
                continue
            if strict and not _HAS_PIL:
                raise NotImplementedError(
                    "real image decode requires PIL (not in this container); "
                    "run with strict=False for the deterministic stub"
                )
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    rows.append((mid, None, None, None, None))
                    continue
                buf = bytes(buf)
                w, h, luma = _decode_image_fake(buf)
                rows.append((mid, w, h, luma, hashlib.md5(buf).hexdigest()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_luma", "md5"]
            )

    return media.select("media_id", "media_type", "content").mapInPandas(
        op, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, max_dim: int = 256, strict: bool = False
) -> DataFrame:
    """Binary→binary image resize through ``mapInPandas``: scale so the
    longer side is ``max_dim`` (no-op when already smaller). STUB
    resample — dims come from the fake decode and the payload is a
    deterministic byte-stride downsample proportional to the area
    reduction; a real deployment swaps in PIL's ``Image.resize`` only.
    The Spark-side contract (binary in/out, pruned column scan, Arrow
    transport) is the real thing being exercised."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["media_type"] == "image"]
            if pdf.empty:
                continue
            if strict:
                # unconditional (even with PIL importable): no real
                # resample path is implemented yet, so strict=True must
                # never silently fall through to the stub downsample
                raise NotImplementedError(
                    "real image resize is not implemented (stub byte-stride "
                    "downsample only); run with strict=False for the stub"
                )
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    rows.append((mid, None, None, None))
                    continue
                buf = bytes(buf)
                w, h, _ = _decode_image_fake(buf)
                scale = min(1.0, max_dim / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                stride = max(1, int(round(1.0 / (scale * scale))))
                rows.append((mid, nw, nh, buf[::stride]))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "content"]
            )

    return media.select("media_id", "media_type", "content").mapInPandas(
        op, schema=RESIZED_IMAGE_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("md5", T.StringType(), True),
    ]
)

_FAKE_SAMPLE_RATE = 16_000


def extract_audio_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Waveform feature extraction over binary audio content.

    STUB decode — the bytes are interpreted as a raw signed-8-bit PCM
    waveform at 16 kHz (a real deployment swaps in torchaudio/ffmpeg
    decode only); the FEATURES (RMS energy, peak amplitude, duration)
    are genuine vectorized numpy over whatever the decode yields, so the
    per-batch compute shape matches production."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["media_type"] == "audio"]
            if pdf.empty:
                continue
            if strict:
                raise NotImplementedError(
                    "real audio decode requires torchaudio/ffmpeg (not in "
                    "this container); run with strict=False for the stub"
                )
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None or len(buf) == 0:
                    rows.append((mid, None, None, None, None, None))
                    continue
                buf = bytes(buf)
                wave = np.frombuffer(buf, dtype=np.int8).astype(np.float64) / 128.0
                rows.append(
                    (
                        mid,
                        len(wave),
                        len(wave) / _FAKE_SAMPLE_RATE,
                        float(np.sqrt(np.mean(wave * wave))),
                        float(np.max(np.abs(wave))),
                        hashlib.md5(buf).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "duration_s", "rms", "peak", "md5",
                ],
            )

    return media.select("media_id", "media_type", "content").mapInPandas(
        op, schema=AUDIO_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling stub: emits every_n-th 'frame' as a hash of a byte
    slice (real impl: ffmpeg/pyav seek+decode). Demonstrates the 1→many
    mapInPandas shape (one binary row → several frame rows)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["media_type"] == "video"]
            if pdf.empty:
                continue
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    continue
                buf = bytes(buf)
                n_frames = max(1, len(buf) // 64)
                for fi in range(0, n_frames, every_n):
                    chunk = buf[fi * 64 : (fi + 1) * 64]
                    rows.append((mid, fi, hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_md5"])

    return media.select("media_id", "media_type", "content").mapInPandas(
        op, schema=FRAME_SAMPLE_SCHEMA
    )
