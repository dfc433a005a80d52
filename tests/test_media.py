"""Audio/video opaque-binary plumbing tests: deterministic fake containers
drive the real Spark-side path (mapInPandas schema, batching, fingerprint,
SimHash clustering); real codec decode stays stubbed (NotImplementedError)."""

from __future__ import annotations

import numpy as np
import pytest

from text_dedup_spark.functions.media_udf import (
    audio_meta_table,
    decode_audio,
    decode_video_frames,
    fake_frames,
    fake_pcm,
    media_near_dup_assignments,
    video_meta_table,
)


def _audio_rows():
    rng = np.random.RandomState(7)
    base = (rng.randn(16000) * 1000).astype(np.int16)
    # near-dup: tiny additive noise (fingerprint-stable), distinct: fresh
    near = (base + rng.randint(-2, 3, size=base.shape).astype(np.int16))
    other = (rng.randn(16000) * 1000).astype(np.int16)
    return [
        (0, fake_pcm(base)),
        (1, fake_pcm(near)),
        (2, fake_pcm(other)),
    ]


def test_audio_meta_and_cluster(spark):
    df = spark.createDataFrame(_audio_rows(), "clip_id long, bytes binary")
    meta = audio_meta_table(df)
    rows = {r["clip_id"]: r for r in meta.collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["sample_rate"] == 16000
    assert rows[0]["n_samples"] == 16000
    assert abs(rows[0]["duration_sec"] - 1.0) < 1e-9
    assert "bytes" not in meta.columns  # payload dropped before shuffle

    assigns = media_near_dup_assignments(meta, "afp", "clip_id")
    pairs = {(r["clip_id"], r["component"]) for r in assigns.collect()}
    assert (1, 0) in pairs       # near-dup clip joined to representative 0
    assert all(cid != 2 for cid, _ in pairs)  # distinct clip untouched


def test_video_meta_and_frame_sample(spark):
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, size=(12, 32, 32), dtype=np.uint8)
    jitter = base.astype(np.int16)
    jitter[:, :2, :2] += 1
    near = jitter.clip(0, 255).astype(np.uint8)
    other = rng.randint(0, 256, size=(12, 32, 32), dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, fake_frames(base)), (1, fake_frames(near)), (2, fake_frames(other))],
        "clip_id long, bytes binary",
    )
    meta = video_meta_table(df, sample_every=3)
    rows = {r["clip_id"]: r for r in meta.collect()}
    assert rows[0]["n_frames"] == 12 and rows[0]["height"] == 32
    assert rows[0]["vfp"] == rows[1]["vfp"]  # jitter below aHash sensitivity
    assert rows[0]["vfp"] != rows[2]["vfp"]


def test_real_codec_paths_are_stubbed():
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF....WAVEfmt ")
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"\x00\x00\x00 ftypisom")
