"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched
``mapInPandas`` stages.

The decode kernels themselves are STUBBED — the image/audio libraries
are not in this container — behind ``DecodeBackend``:
``FakeDecodeBackend`` produces deterministic synthetic outputs so the
Spark-side plumbing (schema, batch shape, partitioning, UDF signature)
is fully real and testable; ``LibraryDecodeBackend`` raises
NotImplementedError until Pillow/av are available.

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
