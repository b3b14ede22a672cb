"""Derive the frozen `media_decode_real` oracle literals (VERDICT r04 #6).

Runs the deterministic `synth_real_media` corpus through `decode_digest`
DRIVER-SIDE (no Spark) and prints the VALUES rows to paste into the gate's
oracle SQL in kgforge/driver_queries.py. Same freeze discipline as the
fixture gold: the literals are reviewed and committed; the driver then
verifies that the EXECUTOR-side decode reproduces them bit-for-bit.

    python tools/derive_media_gold.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import io
    import wave

    import numpy as np

    from kgforge.functions.jpeg import encode_jpeg
    from kgforge.functions.multimodal import (
        decode_digest,
        encode_gif,
        encode_png,
    )

    # mirror synth_real_media's generation loop WITHOUT Spark (payload
    # synthesis is driver-deterministic; keep in lockstep with
    # kgforge/functions/multimodal.py::synth_real_media)
    rng = np.random.RandomState(42)
    rows = []
    for i in range(60):
        kind = 4 if i >= 48 else i % 4
        if kind == 0:
            ch = [1, 3, 4][(i // 4) % 3]
            h, w = 8 + int(rng.randint(0, 9)), 8 + int(rng.randint(0, 9))
            px = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
            payload = encode_png(px, filter_type=(i // 4) % 5)
            mt = "image"
        elif kind == 1:
            h, w = 16 + int(rng.randint(0, 17)), 16 + int(rng.randint(0, 17))
            yy, xx = np.mgrid[0:h, 0:w]
            base = (
                128.0
                + 96.0 * np.sin(yy / (2.0 + (i % 5)))
                + 64.0 * np.cos(xx / (1.5 + (i % 3)))
            )
            if (i // 4) % 3 == 0:
                px = np.clip(base, 0, 255).astype(np.uint8)
            else:
                px = np.clip(
                    np.stack(
                        [base, np.roll(base, 3, 0), np.roll(base, 5, 1)],
                        axis=2,
                    ),
                    0, 255,
                ).astype(np.uint8)
            payload = encode_jpeg(
                px,
                quality=60 + 10 * ((i // 4) % 4),
                subsample=(i // 4) % 3 == 2,
                restart_interval=(i // 4) % 3,
            )
            mt = "image"
        elif kind == 2:
            h, w = 6 + int(rng.randint(0, 7)), 6 + int(rng.randint(0, 7))
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
            mt = "image"
        elif kind == 3:
            rate = 8000
            dur = 0.05 + 0.01 * (i % 5)
            t = np.arange(int(rate * dur)) / rate
            sig = np.sin(2 * np.pi * (200 + 50 * i) * t)
            pcm = (sig * 32000).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(rate)
                wf.writeframes(pcm.tobytes())
            payload = buf.getvalue()
            mt = "audio"
        else:
            ncol = 4 + (i % 13) * 8
            pal = np.unique(
                rng.randint(0, 256, size=(ncol, 3), dtype=np.uint8), axis=0
            )
            h, w = 8 + int(rng.randint(0, 17)), 8 + int(rng.randint(0, 17))
            px = pal[rng.randint(0, len(pal), size=(h, w))]
            payload = encode_gif(px)
            mt = "image"
        rows.append((i, mt, decode_digest(bytes(payload))))

    print("    SELECT * FROM (VALUES")
    for i, (mid, mt, dg) in enumerate(rows):
        comma = "," if i < len(rows) - 1 else ""
        print(f"        ({mid}, '{mt}', '{dg}'){comma}")
    print("    ) AS t(media_id, media_type, digest) ORDER BY media_id")


if __name__ == "__main__":
    main()
