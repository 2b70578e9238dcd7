"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched
``mapInPandas`` stages.

Decode kernels sit behind ``DecodeBackend``:
``StdlibDecodeBackend`` REALLY decodes the formats this image can
parse without external codecs — PCM WAV audio (stdlib ``wave`` +
numpy: duration/RMS/peak/zero-crossing features) and binary PPM
images (numpy: dimensions/channel means/luma) — and raises for
codecs that need Pillow/av (JPEG/PNG/MP4). ``FakeDecodeBackend``
remains the deterministic stand-in for plumbing tests.

Scale notes: binary payloads ride the normal columnar path (parquet
binary + Arrow batches); `spark.sql.files.maxPartitionBytes` bounds
task input so a partition of blobs fits executor memory; metadata-only
queries never touch the blob column thanks to column pruning — the
reason metadata lives in a separate struct column, not inside the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), True),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]), True),
])

FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "checksum string, feature array<double>")

FRAME_SCHEMA = ("media_id long, frame_idx int, n_bytes long, checksum string")


class DecodeBackend:
    """Pluggable decode kernel. Real codecs are not in this image."""

    def features(self, payload: bytes, kind: str) -> list[float]:
        raise NotImplementedError(
            "real decode needs Pillow/torchaudio/av — not installed; "
            "use FakeDecodeBackend for plumbing tests")

    def frames(self, payload: bytes, n: int) -> list[bytes]:
        raise NotImplementedError("see features()")


class FakeDecodeBackend(DecodeBackend):
    """Deterministic stand-in: 8-dim feature derived from byte stats,
    frame sampling = byte-range slices. Stable across runs/partitions."""

    def features(self, payload: bytes, kind: str) -> list[float]:
        if not payload:
            return [0.0] * 8
        return [
            float(len(payload)),
            float(payload[0]), float(payload[-1]),
            float(sum(payload) % 997),
            float(max(payload)), float(min(payload)),
            float(len(set(payload))),
            1.0 if kind == "image" else 0.0,
        ]

    def frames(self, payload: bytes, n: int) -> list[bytes]:
        if not payload:
            return [b""] * n
        step = max(1, len(payload) // n)
        return [payload[i * step:(i + 1) * step] for i in range(n)]


class StdlibDecodeBackend(DecodeBackend):
    """REAL decode for the formats the standard library + numpy can
    parse without external codecs: PCM WAV audio (``wave`` + numpy)
    and binary PPM (P6) images (pure numpy). Formats needing Pillow/av
    (JPEG/PNG/MP4...) still raise — the honest boundary of this image.

    Feature layout (8-dim, matches FEATURE_SCHEMA):
      WAV: [duration_ms, n_channels, sample_rate, rms, peak,
            zero_crossings_per_sec, dc_mean, 0.0]   (samples in [-1,1])
      PPM: [width, height, mean_r, mean_g, mean_b, luma_mean,
            luma_std, 1.0]
    """

    def features(self, payload: bytes, kind: str) -> list[float]:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._wav_features(payload)
        if payload[:2] == b"P6":
            return self._ppm_features(payload)
        raise NotImplementedError(
            "StdlibDecodeBackend handles PCM WAV and binary PPM; "
            "other codecs need Pillow/av (not in this image)")

    @staticmethod
    def _wav_features(payload: bytes) -> list[float]:
        import io
        import wave

        import numpy as np

        with wave.open(io.BytesIO(payload)) as w:
            n_ch, sampwidth, rate = (w.getnchannels(), w.getsampwidth(),
                                     w.getframerate())
            n_frames = w.getnframes()
            raw = w.readframes(n_frames)
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sampwidth)
        if dtype is None:
            raise NotImplementedError(f"sample width {sampwidth}")
        x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        if sampwidth == 1:
            x = (x - 128.0) / 128.0
        else:
            x = x / float(2 ** (8 * sampwidth - 1))
        if n_ch > 1:
            x = x.reshape(-1, n_ch).mean(axis=1)
        dur_s = n_frames / float(rate) if rate else 0.0
        if len(x) == 0:
            return [0.0, float(n_ch), float(rate), 0.0, 0.0, 0.0, 0.0, 0.0]
        crossings = int(np.count_nonzero(np.diff(np.signbit(x))))
        return [dur_s * 1000.0, float(n_ch), float(rate),
                float(np.sqrt(np.mean(x * x))), float(np.max(np.abs(x))),
                crossings / dur_s if dur_s else 0.0,
                float(np.mean(x)), 0.0]

    @staticmethod
    def _ppm_features(payload: bytes) -> list[float]:
        import numpy as np

        # P6 header: magic, whitespace/comments, width, height, maxval,
        # single whitespace, then raw RGB triples
        tokens: list[bytes] = []
        i = 2
        while len(tokens) < 3:
            while i < len(payload) and payload[i:i + 1].isspace():
                i += 1
            if payload[i:i + 1] == b"#":          # comment to EOL
                while i < len(payload) and payload[i:i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
        i += 1                                     # the single whitespace
        width, height, maxval = (int(t) for t in tokens)
        px = (np.frombuffer(payload, dtype=np.uint8, count=width * height * 3,
                            offset=i)
              .reshape(height, width, 3).astype(np.float64) / float(maxval))
        means = px.mean(axis=(0, 1))
        luma = 0.2126 * px[..., 0] + 0.7152 * px[..., 1] + 0.0722 * px[..., 2]
        return [float(width), float(height),
                float(means[0]), float(means[1]), float(means[2]),
                float(luma.mean()), float(luma.std()), 1.0]

    def frames(self, payload: bytes, n: int) -> list[bytes]:
        # frame extraction needs a container/codec parser (av) — the
        # byte-slice fallback is the deterministic stand-in
        return FakeDecodeBackend().frames(payload, n)


def extract_features(media: DataFrame,
                     backend: DecodeBackend | None = None) -> DataFrame:
    """decode + feature-extract as a mapInPandas stage: Arrow batches
    in, Arrow batches out; the backend runs once per row inside the
    batch loop (vectorize inside the backend when the real libs land)."""
    backend = backend or FakeDecodeBackend()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                "checksum": payloads.map(
                    lambda b: hashlib.md5(b or b"").hexdigest()),
                "feature": [backend.features(b or b"", k)
                            for b, k in zip(payloads, pdf["kind"])],
            })

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4,
                  backend: DecodeBackend | None = None) -> DataFrame:
    """video frame-sampling: one input row fans out to n_frames rows
    (flatMap-shaped mapInPandas)."""
    backend = backend or FakeDecodeBackend()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, frame in enumerate(backend.frames(payload or b"", n_frames)):
                    rows.append((media_id, idx, len(frame),
                                 hashlib.md5(frame).hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "n_bytes", "checksum"])

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — demonstrates that blob-free queries
    prune the payload column at the scan (check ReadSchema in explain)."""
    return (media.groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg(F.col("meta.width")).alias("avg_width"),
                 F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms")))
