"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched
``mapInPandas`` stages.

Decode kernels sit behind ``DecodeBackend``:
``StdlibDecodeBackend`` REALLY decodes the formats this image can
parse without external codecs — PCM WAV audio (stdlib ``wave`` +
numpy: duration/RMS/peak/zero-crossing features), binary PPM images
(numpy: dimensions/channel means/luma), PNG (stdlib ``zlib`` + numpy
scanline unfiltering, all five filter types), and baseline JPEG
(``jpeg_codec``: Huffman + DCT, gray/4:4:4/4:2:2/4:2:0, restart
markers) — and raises for the codecs that genuinely need a library
(progressive JPEG, MP4/video containers). ``FakeDecodeBackend``
remains the deterministic stand-in for plumbing tests; ``encode_wav``
/ ``encode_ppm`` / ``encode_png`` / ``jpeg_codec.encode_baseline_jpeg``
+ ``synthesize_real_media`` generate real encoded bytes executor-side
for the end-to-end path.

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


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


class StdlibDecodeBackend(DecodeBackend):
    """REAL decode for the formats the standard library + numpy can
    parse without external codecs: PCM WAV audio (``wave`` + numpy),
    binary PPM (P6) images (pure numpy), PNG (stdlib ``zlib`` inflate
    + numpy scanline unfiltering — all five PNG filter types, 8-bit
    gray / gray+alpha / RGB / RGBA, non-interlaced), and baseline JPEG
    (``jpeg_codec`` — Huffman + DCT per ITU-T T.81, grayscale/YCbCr,
    4:4:4 / 4:2:2 / 4:2:0, restart markers; progressive/arithmetic
    streams raise from the codec itself). Formats needing a real
    media library (MP4/video containers...) still raise — the honest
    boundary of this image.

    Feature layout (8-dim, matches FEATURE_SCHEMA):
      WAV: [duration_ms, n_channels, sample_rate, rms, peak,
            zero_crossings_per_sec, dc_mean, 0.0]   (samples in [-1,1])
      PPM: [width, height, mean_r, mean_g, mean_b, luma_mean,
            luma_std, 1.0]
      PNG/JPEG: same layout as PPM (gray images repeat the gray
           channel as r = g = b; alpha is ignored for the color means)
    """

    def features(self, payload: bytes, kind: str) -> list[float]:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._wav_features(payload)
        if payload[:2] == b"P6":
            return self._ppm_features(payload)
        if payload[:8] == PNG_SIGNATURE:
            return self._png_features(payload)
        if payload[:3] == b"\xff\xd8\xff":
            return self._jpeg_features(payload)
        raise NotImplementedError(
            "StdlibDecodeBackend handles PCM WAV, binary PPM, PNG and "
            "baseline JPEG; other codecs (MP4/video...) need Pillow/av "
            "(not in this image)")

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

    @staticmethod
    def _png_pixels(payload: bytes):
        """Decode a non-interlaced 8-bit PNG to an (h, w, channels)
        uint8 array: chunk walk -> zlib inflate -> per-scanline
        unfilter (None/Sub/Up/Average/Paeth, the complete public PNG
        filter set, RFC 2083 §6)."""
        import struct
        import zlib

        import numpy as np

        pos = len(PNG_SIGNATURE)
        width = height = bit_depth = color_type = interlace = None
        idat = bytearray()
        while pos + 8 <= len(payload):
            (length,), ctype = (struct.unpack(">I", payload[pos:pos + 4]),
                                payload[pos + 4:pos + 8])
            data = payload[pos + 8:pos + 8 + length]
            pos += 12 + length               # length + type + data + crc
            if ctype == b"IHDR":
                (width, height, bit_depth, color_type, _, _,
                 interlace) = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
        if width is None:
            raise NotImplementedError("PNG without IHDR")
        if bit_depth != 8 or interlace != 0:
            raise NotImplementedError(
                f"PNG bit_depth={bit_depth} interlace={interlace}; the "
                f"stdlib decoder handles 8-bit non-interlaced")
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
        if channels is None:                 # 3 = palette: needs PLTE walk
            raise NotImplementedError(f"PNG color_type={color_type}")
        raw = zlib.decompress(bytes(idat))
        stride = width * channels
        out = np.zeros((height, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int32)
        p = 0
        for y in range(height):
            f = raw[p]
            line = np.frombuffer(raw[p + 1:p + 1 + stride],
                                 dtype=np.uint8).astype(np.int32)
            p += 1 + stride
            if f == 0:
                rec = line
            elif f == 2:                      # Up: vectorized
                rec = (line + prev) % 256
            else:                             # Sub/Average/Paeth: sequential
                rec = np.zeros(stride, dtype=np.int32)
                for i in range(stride):
                    a = int(rec[i - channels]) if i >= channels else 0
                    b = int(prev[i])
                    c = int(prev[i - channels]) if i >= channels else 0
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) // 2
                    elif f == 4:
                        q = a + b - c
                        pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                        pred = (a if pa <= pb and pa <= pc
                                else (b if pb <= pc else c))
                    else:
                        raise NotImplementedError(f"PNG filter {f}")
                    rec[i] = (line[i] + pred) % 256
            out[y] = rec
            prev = rec
        return out.reshape(height, width, channels)

    @classmethod
    def _png_features(cls, payload: bytes) -> list[float]:
        import numpy as np

        px = cls._png_pixels(payload).astype(np.float64) / 255.0
        h, w, ch = px.shape
        rgb = (px[..., :3] if ch >= 3
               else np.repeat(px[..., :1], 3, axis=2))
        means = rgb.mean(axis=(0, 1))
        luma = (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
                + 0.0722 * rgb[..., 2])
        return [float(w), float(h),
                float(means[0]), float(means[1]), float(means[2]),
                float(luma.mean()), float(luma.std()), 1.0]

    @staticmethod
    def _jpeg_features(payload: bytes) -> list[float]:
        import numpy as np

        from .jpeg_codec import decode_baseline_jpeg

        px = decode_baseline_jpeg(payload).astype(np.float64) / 255.0
        h, w, _ = px.shape
        means = px.mean(axis=(0, 1))
        luma = (0.2126 * px[..., 0] + 0.7152 * px[..., 1]
                + 0.0722 * px[..., 2])
        return [float(w), float(h),
                float(means[0]), float(means[1]), float(means[2]),
                float(luma.mean()), float(luma.std()), 1.0]

    def frames(self, payload: bytes, n: int) -> list[bytes]:
        # frame extraction needs a container/codec parser (av) — the
        # byte-slice fallback is the deterministic stand-in
        return FakeDecodeBackend().frames(payload, n)


# --------------------------------------------------- stdlib encoders
# Deterministic fixture/synthesis encoders for the three formats the
# stdlib backend really decodes. Used by tests and by
# synthesize_real_media; real pipelines land encoded bytes from their
# upstream store instead.

def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """float samples in [-1, 1] -> 16-bit mono PCM WAV bytes."""
    import io
    import wave

    import numpy as np

    x = (np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
         * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def encode_ppm(pixels) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6) bytes."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> 8-bit truecolor PNG bytes.

    ``filter_type`` applies that PNG scanline filter (0-4) to EVERY
    row — the encoder computes the real filter math, so round-tripping
    through the decoder exercises each unfilter path."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    assert ch == 3, "encoder writes truecolor RGB"
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        left = np.concatenate([np.zeros(ch, dtype=np.int32), line[:-ch]])
        if filter_type == 0:
            filt = line
        elif filter_type == 1:
            filt = line - left
        elif filter_type == 2:
            filt = line - prev
        elif filter_type == 3:
            filt = line - (left + prev) // 2
        elif filter_type == 4:
            upleft = np.concatenate([np.zeros(ch, dtype=np.int32),
                                     prev[:-ch]])
            q = left + prev - upleft
            pa = np.abs(q - left)
            pb = np.abs(q - prev)
            pc = np.abs(q - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            filt = line - pred
        else:
            raise ValueError(f"PNG filter {filter_type}")
        raw.append(filter_type)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def synthesize_real_media(ids: DataFrame) -> DataFrame:
    """Deterministically synthesize REAL encoded media from an id
    frame (column ``media_id``): id % 3 picks WAV (sine whose
    frequency derives from the id) or an image — PPM (gradient), PNG
    (gradient, id-rotated filter type so every unfilter path runs) or
    baseline JPEG (id-rotated 4:4:4 / 4:2:0 subsampling so both MCU
    layouts decode). Encoding happens on the EXECUTORS inside a
    mapInPandas stage — the driver never holds a payload — which is
    also the plumbing shape a real ingest uses (bytes arrive inside
    Arrow batches).

    Output matches MEDIA_SCHEMA."""
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [synthesize_payload(int(mid)) for mid in pdf["media_id"]],
                columns=["media_id", "kind", "payload", "meta"])

    return ids.select("media_id").mapInPandas(op, schema=MEDIA_SCHEMA)


def synthesize_payload(mid: int) -> tuple:
    """The pure per-id synthesis kernel behind
    ``synthesize_real_media`` — also runs WITHOUT Spark (the
    multimodal oracle-fixture generator, tools/
    make_multimodal_fixture.py, replays it driver-free so the landed
    expected frame is produced by a non-DataFrame path). Returns
    (media_id, kind, payload_bytes, meta_dict)."""
    import numpy as np

    from .jpeg_codec import encode_baseline_jpeg

    if mid % 3 == 0:
        n, rate = 160 + (mid % 5) * 40, 8000
        t = np.arange(n) / rate
        freq = 200.0 + (mid % 17) * 25.0
        payload = encode_wav(0.5 * np.sin(2 * np.pi * freq * t), rate)
        return (mid, "audio", payload,
                {"width": None, "height": None,
                 "duration_ms": int(1000 * n / rate), "format": "wav"})
    w, h = 8 + mid % 5, 6 + mid % 3
    grad = ((np.arange(h)[:, None] * 31 + np.arange(w) * 17
             + mid) % 256).astype(np.uint8)
    px = np.stack([grad, grad[::-1], (grad * 3 + 7) % 256],
                  axis=2).astype(np.uint8)
    if mid % 3 == 1:
        payload, fmt = encode_ppm(px), "ppm"
    elif (mid // 3) % 2 == 0:
        payload, fmt = encode_png(px, filter_type=mid % 5), "png"
    else:
        payload = encode_baseline_jpeg(
            px, quality=90,
            subsampling="4:2:0" if (mid // 6) % 2 else "4:4:4")
        fmt = "jpeg"
    return (mid, "image", payload,
            {"width": w, "height": h, "duration_ms": None, "format": fmt})


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
