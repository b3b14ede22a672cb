"""Baseline JPEG codec (functions/jpeg.py, VERDICT r04 #3): the decoder
must invert the encoder twin BIT-EXACTLY against an independent
spatial-domain reference of the same arithmetic (forward DCT -> quantize
-> dequantize -> IDCT) — the entropy layer is lossless, the quantizer is
the only information loss. Plus restart markers, a hand-built DC-only
golden, and named raises for out-of-subset variants."""

from __future__ import annotations

import numpy as np
import pytest

from kgforge.functions.jpeg import (
    _C,
    _forward_blocks,
    _pad_to,
    _rgb_to_ycbcr,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def _expected(px, quality, subsample):
    """Spatial-domain reference: same color/subsample/pad conventions,
    DCT -> quant -> dequant -> IDCT, never touching the entropy layer."""
    px = np.asarray(px, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ql, qc = quality_tables(quality)
    if ch == 1:
        planes, factors, qs = [px[:, :, 0]], [(1, 1)], [ql]
    else:
        y, cb, cr = _rgb_to_ycbcr(px)
        mode = {False: "444", True: "420"}.get(subsample, subsample)

        def box(p, fy, fx):
            p = _pad_to(p, fy, fx).astype(np.float64)
            q = p.reshape(
                p.shape[0] // fy, fy, p.shape[1] // fx, fx
            ).mean(axis=(1, 3))
            return np.clip(np.round(q), 0, 255).astype(np.uint8)

        if mode == "420":
            planes = [y, box(cb, 2, 2), box(cr, 2, 2)]
            factors = [(2, 2), (1, 1), (1, 1)]
        elif mode == "422":
            planes = [y, box(cb, 1, 2), box(cr, 1, 2)]
            factors = [(2, 1), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]
        qs = [ql, qc, qc]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    outp = []
    for plane, (hi, vi), q in zip(planes, factors, qs):
        padded = _pad_to(plane, mcuy * vi * 8, mcux * hi * 8)
        padded = padded[: mcuy * vi * 8, : mcux * hi * 8]
        coef = _forward_blocks(padded, q)
        deq = coef * q.reshape(8, 8)
        blocks = np.einsum(
            "ij,nmjk,kl->nmil", _C.T, deq.astype(np.float64), _C
        )
        rec = np.clip(np.round(blocks) + 128.0, 0, 255).astype(np.uint8)
        nby, nbx = rec.shape[:2]
        pl = rec.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        pl = np.repeat(
            np.repeat(pl, vmax // vi, axis=0), hmax // hi, axis=1
        )
        outp.append(pl[:h, :w])
    if len(outp) == 1:
        return outp[0][:, :, None]
    y, cb, cr = (p.astype(np.float64) for p in outp)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "shape,quality,subsample",
    [
        ((16, 16), 85, False),           # grayscale, aligned
        ((20, 24, 3), 85, False),        # RGB 4:4:4
        ((17, 33, 3), 50, True),         # RGB 4:2:0, odd dims (pad + crop)
        ((64, 64, 3), 95, False),        # near-lossless tables
        ((8, 8, 3), 10, True),           # brutal quantization
        ((9, 7), 75, False),             # tiny gray, both dims odd
        ((19, 21, 3), 70, "422"),        # horizontal-only chroma (2,1)
        ((32, 24, 3), 85, "422"),        # aligned 4:2:2
    ],
)
def test_round_trip_bit_exact(shape, quality, subsample):
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, shape, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(px, quality=quality, subsample=subsample))
    want = _expected(px, quality, subsample)
    assert got.shape == want.shape
    assert (got == want).all()


def test_smooth_image_near_lossless():
    """Sanity anchor against the SOURCE (not just the reference):
    a smooth gradient at q75 must come back within 2/255 everywhere."""
    g = (
        np.arange(32)[:, None, None] * 4
        + np.arange(48)[None, :, None] * 2
        + np.arange(3) * 10
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=75, subsample=True))
    assert int(np.abs(dec.astype(int) - g.astype(int)).max()) <= 2


def test_restart_markers_do_not_change_pixels():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (40, 56, 3), np.uint8)
    base = decode_jpeg(encode_jpeg(px, quality=80))
    for ri in (1, 2, 3, 7):
        withr = decode_jpeg(
            encode_jpeg(px, quality=80, restart_interval=ri)
        )
        assert (withr == base).all(), ri
    px2 = rng.randint(0, 256, (33, 31, 3), np.uint8)
    b2 = decode_jpeg(encode_jpeg(px2, quality=70, subsample=True))
    r2 = decode_jpeg(
        encode_jpeg(px2, quality=70, subsample=True, restart_interval=2)
    )
    assert (b2 == r2).all()


def test_dc_only_golden():
    """Hand-derivable golden: a flat image is DC-only; the decoded value
    is round(round((v-128)/(q*dc_q)) * q*dc_q) + 128 per the orthonormal
    pipeline (DC coeff of a flat 8x8 block = 8 * (v - 128))."""
    ql, _ = quality_tables(85)
    dcq = int(ql[0])
    for v in (0, 7, 128, 200, 255):
        px = np.full((8, 8), v, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(px, quality=85))
        coeff = round(8.0 * (v - 128.0) / dcq)  # quantized DC
        want = int(np.clip(round(coeff * dcq / 8.0) + 128, 0, 255))
        assert (dec == want).all(), (v, want, dec[0, 0, 0])


def test_out_of_subset_raises_by_name():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"nope")
    # minimal SOF2 fragment: SOI + progressive frame header
    sof2 = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(sof2)
    sof3 = b"\xff\xd8\xff\xc3\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(sof3)
    twelve = b"\xff\xd8\xff\xc0\x00\x0b\x0c\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(twelve)
    with pytest.raises(ValueError, match="SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_decode_digest_covers_jpeg_and_is_stable():
    """decode_digest (the media_decode_real oracle hash) is a pure
    function of the payload and format-dispatches like decode_media."""
    from kgforge.functions.multimodal import decode_digest

    px = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3 + 10)
    pay = encode_jpeg(px, quality=90)
    d1 = decode_digest(pay)
    d2 = decode_digest(bytes(bytearray(pay)))
    assert d1 == d2 and len(d1) == 32
    assert decode_digest(encode_jpeg(px, quality=50)) != d1
