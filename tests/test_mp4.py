"""MP4 builder/probe round trips + the probe_media dispatch layer."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from kgforge.functions.mp4 import _box, _full, build_mp4, probe_mp4


def test_round_trip_both_tracks():
    b = build_mp4(4321, video=(640, 360), audio_rate=44100)
    got = probe_mp4(b)
    assert got == {
        "brand": "isom",
        "duration_ms": 4321,
        "tracks": [
            {"kind": "video", "codec": "avc1", "width": 640, "height": 360},
            {"kind": "audio", "codec": "mp4a", "sample_rate": 44100},
        ],
    }


def test_round_trip_single_tracks_and_brand():
    a = probe_mp4(build_mp4(999, audio_rate=8000, brand=b"mp42"))
    assert a["brand"] == "mp42" and a["tracks"][0]["sample_rate"] == 8000
    v = probe_mp4(build_mp4(1500, video=(32, 18)))
    assert v["tracks"] == [
        {"kind": "video", "codec": "avc1", "width": 32, "height": 18}
    ]


def test_version1_mvhd_and_largesize():
    """Real-world robustness: 64-bit mvhd (version 1) and a largesize
    (size=1) top-level box are parsed, not rejected."""
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    mvhd = _full(
        b"mvhd", 1, 0,
        struct.pack(">QQIQ", 0, 0, 90000, 90000 * 7)  # 7 s at 90 kHz
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10 + matrix + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd)
    # wrap moov in a largesize envelope
    large = (
        struct.pack(">I", 1) + b"moov"
        + struct.pack(">Q", len(moov[8:]) + 16) + moov[8:]
    )
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    got = probe_mp4(ftyp + large)
    assert got["duration_ms"] == 7000 and got["tracks"] == []


def test_invalid_payloads_raise():
    with pytest.raises(ValueError, match="ftyp"):
        probe_mp4(b"not a movie at all")
    with pytest.raises(ValueError, match="moov"):
        probe_mp4(_box(b"ftyp", b"isom" + struct.pack(">I", 0)))
    good = build_mp4(100, video=(8, 8))
    with pytest.raises(ValueError):
        probe_mp4(good[:40])  # truncated inside moov
    with pytest.raises(ValueError):
        build_mp4(100)  # no tracks


def test_probe_media_dispatch_all_families():
    from kgforge.functions.jpeg import encode_jpeg
    from kgforge.functions.multimodal import encode_png, probe_media

    px = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)
    png = probe_media(encode_png(px))
    assert png == {"kind": "image", "format": "png", "width": 16,
                   "height": 12}
    jpg = probe_media(encode_jpeg(px))
    assert jpg == {"kind": "image", "format": "jpeg", "width": 16,
                   "height": 12}
    ppm = probe_media(b"P6\n16 12\n255\n" + bytes(16 * 12 * 3))
    assert (ppm["format"], ppm["width"], ppm["height"]) == ("ppm", 16, 12)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(22050)
        wf.writeframes(b"\x00\x00" * 8)
    w = probe_media(buf.getvalue())
    assert w == {"kind": "audio", "format": "wav", "sample_rate": 22050,
                 "channels": 2}
    m = probe_media(build_mp4(2500, video=(320, 240), audio_rate=16000))
    assert m["kind"] == "video_container" and m["duration_ms"] == 2500
    assert [t["codec"] for t in m["tracks"]] == ["avc1", "mp4a"]
    with pytest.raises(ValueError, match="unrecognized"):
        probe_media(b"\x00\x01\x02\x03garbage")
