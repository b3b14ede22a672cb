"""MP4 / ISO-BMFF metadata probe (pure stdlib) + deterministic builder.

Video DECODING stays behind the `extract_features(kernel=...)` seam
(an H.264 entropy decoder is not a reasonable stdlib build), but a
media pipeline over web crawl data needs the METADATA long before it
needs pixels: duration, track layout, codec fourccs, dimensions,
sample rates — the fields dedup keys, curation filters, and storage
planners read. ISO/IEC 14496-12 box structure is a public, simple
length-prefixed tree; `probe_mp4` walks it with `struct` only.

`build_mp4` is the writer twin (same role as warc.build_warc): a
minimal-but-valid ftyp + moov(mvhd + trak(tkhd + mdia(mdhd + hdlr +
minf(stbl(stsd))))) + mdat skeleton whose every probed field is a
parameter — which is what lets the driver gate certify the
build -> probe round trip with an oracle that COMPUTES the expected
metadata from table columns (no frozen gold, media_probe_mp4).

Reference behavior: ffprobe's container-level output for the same
fields (public tool); box layouts follow the published spec, not any
implementation's source.
"""

from __future__ import annotations

import struct


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(
        fourcc, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload
    )


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def build_mp4(
    duration_ms: int,
    video: tuple[int, int] | None = None,
    audio_rate: int | None = None,
    brand: bytes = b"isom",
) -> bytes:
    """Minimal valid MP4: movie timescale 1000 (so duration == ms),
    optional avc1 video track (width, height) and mp4a audio track
    (sample rate). All fields version-0 boxes."""
    if video is None and audio_rate is None:
        raise ValueError("at least one track is required")
    timescale = 1000
    traks = []
    track_id = 1

    def tkhd(tid: int, w: int, h: int) -> bytes:
        return _full(
            b"tkhd", 0, 7,
            struct.pack(">II", 0, 0)              # ctime, mtime
            + struct.pack(">I", tid)
            + b"\x00" * 4                          # reserved
            + struct.pack(">I", duration_ms)
            + b"\x00" * 8                          # reserved
            + struct.pack(">hhhh", 0, 0, 0, 0)     # layer, group, vol, rsvd
            + _MATRIX
            + struct.pack(">II", w << 16, h << 16),
        )

    def mdia(handler: bytes, name: bytes, stsd_entry: bytes) -> bytes:
        mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">IIII", 0, 0, timescale, duration_ms)
            + struct.pack(">HH", 0x55C4, 0),       # language 'und', quality
        )
        hdlr = _full(
            b"hdlr", 0, 0,
            b"\x00" * 4 + handler + b"\x00" * 12 + name + b"\x00",
        )
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        return _box(b"mdia", mdhd + hdlr + minf)

    if video is not None:
        w, h = video
        avc1 = _box(
            b"avc1",
            b"\x00" * 6 + struct.pack(">H", 1)     # reserved, data-ref idx
            + b"\x00" * 16                          # pre-defined/reserved
            + struct.pack(">HH", w, h)
            + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
            + b"\x00" * 4
            + struct.pack(">H", 1)                 # frame count
            + b"\x00" * 32                          # compressor name
            + struct.pack(">Hh", 24, -1),          # depth, color table
        )
        traks.append(
            _box(b"trak", tkhd(track_id, w, h) + mdia(b"vide", b"vid", avc1))
        )
        track_id += 1
    if audio_rate is not None:
        mp4a = _box(
            b"mp4a",
            b"\x00" * 6 + struct.pack(">H", 1)
            + b"\x00" * 8                           # reserved
            + struct.pack(">HH", 2, 16)            # channels, sample size
            + b"\x00" * 4
            + struct.pack(">I", audio_rate << 16), # rate 16.16
        )
        traks.append(
            _box(
                b"trak",
                tkhd(track_id, 0, 0) + mdia(b"soun", b"aud", mp4a),
            )
        )
        track_id += 1
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration_ms)
        + struct.pack(">I", 0x00010000)            # rate 1.0
        + struct.pack(">H", 0x0100)                # volume
        + b"\x00" * 10
        + _MATRIX
        + b"\x00" * 24                              # pre-defined
        + struct.pack(">I", track_id),             # next track id
    )
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mp41")
    moov = _box(b"moov", mvhd + b"".join(traks))
    mdat = _box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in a span."""
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", data, off)[0]
        fourcc = data[off + 4:off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", data, off + 8)[0]
            body = off + 16
        elif size == 0:  # box extends to end of file
            size = end - off
        if size < body - off or off + size > end:
            raise ValueError(f"bad box size for {fourcc!r}")
        yield fourcc, body, off + size
        off += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _walk(data, start, end):
        if fc == fourcc:
            return b, e
    return None


def probe_mp4(payload: bytes) -> dict:
    """ISO-BMFF metadata probe: {brand, duration_ms, tracks: [...]}.

    Each track dict: {"kind": "video"|"audio"|<handler fourcc>,
    "codec": <stsd fourcc>, and kind-specific fields — width/height
    (tkhd 16.16) for video, sample_rate (stsd 16.16) for audio}.
    Handles mvhd/mdhd/tkhd versions 0 and 1, 64-bit largesize boxes,
    and size-0 (to-EOF) top-level boxes. Raises ValueError on
    structurally invalid input (not an error class worth hiding: a
    crawl pipeline quarantines these rows)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no ftyp)")
    brand = payload[8:12].decode("latin-1")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    ms, me = moov
    mvhd = _find(payload, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("no mvhd box")
    vb, _ve = mvhd
    version = payload[vb]
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, vb + 4 + 16)
    else:
        timescale, duration = struct.unpack_from(">II", payload, vb + 4 + 8)
    if timescale == 0:
        raise ValueError("mvhd timescale 0")
    tracks = []
    for fc, tb, te in _walk(payload, ms, me):
        if fc != b"trak":
            continue
        tr: dict = {}
        tk = _find(payload, tb, te, b"tkhd")
        width = height = None
        if tk is not None:
            kb, ke = tk
            # width/height are the LAST 8 bytes of tkhd either version
            width = struct.unpack_from(">I", payload, ke - 8)[0] >> 16
            height = struct.unpack_from(">I", payload, ke - 4)[0] >> 16
        md = _find(payload, tb, te, b"mdia")
        if md is None:
            continue
        db, de = md
        hd = _find(payload, db, de, b"hdlr")
        handler = payload[hd[0] + 8:hd[0] + 12] if hd else b"\x00" * 4
        kind = {b"vide": "video", b"soun": "audio"}.get(
            handler, handler.decode("latin-1").strip("\x00") or "unknown"
        )
        tr["kind"] = kind
        mi = _find(payload, db, de, b"minf")
        codec = None
        sample_rate = None
        if mi is not None:
            st = _find(payload, mi[0], mi[1], b"stbl")
            if st is not None:
                sd = _find(payload, st[0], st[1], b"stsd")
                if sd is not None:
                    sb, se = sd
                    n_entries = struct.unpack_from(">I", payload, sb + 4)[0]
                    if n_entries >= 1:
                        entry = list(_walk(payload, sb + 8, se))
                        if entry:
                            efc, eb, _ee = entry[0]
                            codec = efc.decode("latin-1")
                            if kind == "audio":
                                sample_rate = (
                                    struct.unpack_from(
                                        ">I", payload, eb + 24
                                    )[0] >> 16
                                )
        tr["codec"] = codec
        if kind == "video":
            tr["width"], tr["height"] = width, height
        if kind == "audio":
            tr["sample_rate"] = sample_rate
        tracks.append(tr)
    return {
        "brand": brand,
        "duration_ms": duration * 1000 // timescale,
        "tracks": tracks,
    }
