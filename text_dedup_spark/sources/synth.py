"""Deterministic synthetic image+caption table (FIXTURES.md T1).

Schema = BASELINE.json input_hint exactly:
  (image_id string, bytes binary, w int, h int, fmt string,
   caption string, phash long)
plus a sidecar truth table recording the planted cluster structure per
modality, so dup-pair recall is computable exactly.

Generation is DISTRIBUTED and per-row deterministic: ``spark.range(n)`` ->
``mapInPandas`` with all randomness derived from (seed, group) — no driver
materialization, unbounded scale. Rows are organized in groups of 10 with
planted duplicates (FIXTURES.md):

  slot 0  anchor (unique base image + caption)
  slot 1  exact duplicate of slot 0 (same bytes + caption)      ~10%
  slot 2  near-duplicate caption of slot 0 (word edits)         ~10%
  slot 3  near-duplicate image of slot 0 (pixel perturbation,
          phash Hamming <= 3), own caption                      ~10%
  slot 4  caption embeds a global >=100-byte shared passage     ~10%
  slot 5  short caption (fewer tokens than any shingle size)    ~10%
  slot 6-9 unique singletons

Lossy-path simulation: slot 3 and one singleton per group carry
fmt='jpeg_sim' — pixels quantized to steps of 4 (PSNR ≈ 48 dB vs the
unquantized source, exercising the >=40 dB check) then PNG-packed. The
repo now carries real pure-numpy JPEG codecs (sources/jpeg.py: baseline
AND progressive) — jpeg_sim is kept because the oracle truth tables are
constructed from these exact deterministic bytes, and real-JPEG rows are
exercised by tests/test_images.py and the CLI drives instead.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .png import encode_png, phash64

VOCAB = (
    "model data train sample batch epoch loss token image caption pixel "
    "filter kernel layer deep wide sparse dense random uniform normal "
    "the a an of and or with from over under near far red green blue "
    "bright dark small large tiny huge quick slow first last"
).split()

SHARED_PASSAGE = (
    "this shared passage is planted verbatim across documents to exercise the "
    "suffix array substring deduplication path and it is comfortably longer than "
    "one hundred bytes of text"
)

IMG_W = IMG_H = 32

SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)

TRUTH_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("group", LongType()),
        StructField("slot", IntegerType()),
        StructField("exact_cluster", LongType()),
        StructField("caption_cluster", LongType()),
        StructField("image_cluster", LongType()),
    ]
)


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _base_pixels(rng: np.random.RandomState) -> np.ndarray:
    """Smooth structured image (gradients + sinusoid) + mild noise — gives a
    phash that is stable under small perturbations, like a real photo."""
    y, x = np.mgrid[0:IMG_H, 0:IMG_W].astype(np.float64)
    img = np.zeros((IMG_H, IMG_W, 3))
    for c in range(3):
        a, b = rng.uniform(-3, 3, 2)
        fx, fy = rng.uniform(0.1, 0.8, 2)
        ph = rng.uniform(0, 6.28)
        img[:, :, c] = (
            128
            + a * (x - IMG_W / 2)
            + b * (y - IMG_H / 2)
            + 60 * np.sin(fx * x + fy * y + ph)
        )
    img += rng.normal(0, 4, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _caption(rng: np.random.RandomState) -> str:
    # 30-80 words: enough 5-shingles that a 1-2 word append stays well above
    # Jaccard 0.7 (the deliberately-short case is slot 5)
    n = rng.randint(30, 80)
    words = [VOCAB[rng.randint(len(VOCAB))] for _ in range(n)]
    # sprinkle punctuation/newlines to exercise the NON_ALPHA tokenizer
    out = []
    for i, w in enumerate(words):
        out.append(w)
        if i % 11 == 10:
            out.append(", " if rng.rand() < 0.7 else "\n")
    return " ".join(out)


def _perturb_pixels(arr: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    noisy = arr.astype(np.int16) + rng.randint(-2, 3, arr.shape)
    return np.clip(noisy, 0, 255).astype(np.uint8)


def _quantize(arr: np.ndarray) -> np.ndarray:
    """Deterministic lossy simulation: quantize to steps of 4
    (RMSE ~1.1 -> PSNR ~47 dB)."""
    return ((arr.astype(np.int16) // 4) * 4 + 2).clip(0, 255).astype(np.uint8)


def _group_rows(group: int, seed: int):
    """10 (row_dict, truth_dict) pairs for one group, fully deterministic."""
    rng = np.random.RandomState((seed * 1_000_003 + group) % (1 << 31))
    base_id = group * 10

    anchor_px = _base_pixels(rng)
    anchor_caption = _caption(rng)

    rows = []

    def emit(slot, px, caption, fmt, exact_c, cap_c, img_c, lossy_src=None):
        i = base_id + slot
        data = encode_png(px)
        rows.append(
            (
                {
                    "image_id": f"img-{i:010d}",
                    "bytes": data,
                    "w": IMG_W,
                    "h": IMG_H,
                    "fmt": fmt,
                    "caption": caption,
                    "phash": _signed64(phash64(px)),
                },
                {
                    "image_id": f"img-{i:010d}",
                    "group": group,
                    "slot": slot,
                    "exact_cluster": exact_c,
                    "caption_cluster": cap_c,
                    "image_cluster": img_c,
                },
            )
        )

    # slot 0 anchor
    emit(0, anchor_px, anchor_caption, "png", base_id, base_id, base_id)
    # slot 1 exact duplicate
    emit(1, anchor_px, anchor_caption, "png", base_id, base_id, base_id)
    # slot 2 near-dup caption: append 1-2 words — keeps every original
    # 5-shingle, Jaccard ~ (w-4)/(w-2) >= 0.93 at w>=30, so the LSH hit
    # probability at threshold 0.7 is ~1 (deterministic recall, FIXTURES.md)
    extra = " ".join(VOCAB[rng.randint(len(VOCAB))] for _ in range(rng.randint(1, 3)))
    cap2 = anchor_caption + " " + extra
    emit(2, _base_pixels(rng), cap2, "png", base_id + 2, base_id, base_id + 2)
    # slot 3 near-dup image (lossy container), own caption
    emit(3, _quantize(_perturb_pixels(anchor_px, rng)), _caption(rng), "jpeg_sim",
         base_id + 3, base_id + 3, base_id)
    # slot 4 shared passage embedded
    emit(4, _base_pixels(rng), _caption(rng) + " " + SHARED_PASSAGE + " " + _caption(rng),
         "png", base_id + 4, base_id + 4, base_id + 4)
    # slot 5 short caption
    emit(5, _base_pixels(rng), " ".join(VOCAB[rng.randint(len(VOCAB))] for _ in range(3)),
         "png", base_id + 5, base_id + 5, base_id + 5)
    # slots 6-9 singletons (one lossy)
    for slot in range(6, 10):
        fmt = "jpeg_sim" if slot == 6 else "png"
        px = _base_pixels(rng)
        if fmt == "jpeg_sim":
            px = _quantize(px)
        emit(slot, px, _caption(rng), fmt, base_id + slot, base_id + slot, base_id + slot)

    return rows


def images_table(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    return _build(spark, n_rows, seed, which="rows")


def truth_table(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    return _build(spark, n_rows, seed, which="truth")


def _build(spark: SparkSession, n_rows: int, seed: int, which: str) -> DataFrame:
    n_groups = (n_rows + 9) // 10
    schema = SCHEMA if which == "rows" else TRUTH_SCHEMA

    cols = [f.name for f in schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # flush at group boundaries every ~20k rows: one unbounded yield per
        # input batch produced ~300 MB Arrow batches at multi-M-row scale,
        # and 32 concurrent tasks then exhaust the JVM's direct-memory cap
        # (netty OutOfDirectMemoryError). Bounded batches cost nothing and
        # hold at any corpus size.
        out = []
        for pdf in batches:
            for g in pdf["id"].tolist():
                for row, truth in _group_rows(int(g), seed):
                    out.append(row if which == "rows" else truth)
                if len(out) >= 20_000:
                    yield pd.DataFrame(out, columns=cols)
                    out = []
        if out:
            yield pd.DataFrame(out, columns=cols)

    # ~1000 groups (10k rows) per partition, capped: the old flat cap of 64
    # partitions made partition size grow linearly with the corpus
    n_parts = max(2, min(1024, n_groups // 1000 + 1))
    groups = spark.range(n_groups).repartition(n_parts)
    return groups.mapInPandas(gen, schema)


# --- synthetic audio clips (opaque-binary modality, FPCM container) ---------

AUDIO_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
    ]
)


def audio_table(
    spark: SparkSession, n_rows: int, seed: int = 42, container: str = "wav"
) -> DataFrame:
    """Deterministic synthetic audio table: groups of 5 clips with planted
    duplicates (slot 0 anchor, slot 1 exact dup, slot 2 near-dup [tiny
    additive noise, fingerprint-stable], slots 3-4 singletons). Same
    distributed mapInPandas generation scheme as images_table.

    ``container``: 'wav' (default — real RIFF/PCM bytes through the pure-
    Python parser) or 'fpcm' (the deterministic test container)."""
    from ..functions.media_udf import encode_wav, fake_pcm

    if container not in ("wav", "fpcm"):
        raise ValueError(f"unknown audio container {container!r}")
    pack = (
        (lambda samples, rate: encode_wav(samples, rate))
        if container == "wav"
        else fake_pcm
    )

    n_groups = (n_rows + 4) // 5
    rate, n_samp = 8000, 4000

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for g in pdf["id"].tolist():
                rng = np.random.RandomState((seed * 999983 + int(g)) % (1 << 31))
                base_id = int(g) * 5
                anchor = (rng.randn(n_samp) * 1200).astype(np.int16)

                def emit(slot, samples):
                    rows.append(
                        {
                            "clip_id": f"clip-{base_id + slot:010d}",
                            "bytes": pack(samples, rate),
                            "sample_rate": rate,
                            "n_samples": n_samp,
                        }
                    )

                emit(0, anchor)
                emit(1, anchor)  # exact duplicate
                noise = rng.randint(-2, 3, size=n_samp).astype(np.int16)
                emit(2, (anchor + noise).astype(np.int16))  # near-dup
                emit(3, (rng.randn(n_samp) * 1200).astype(np.int16))
                emit(4, (rng.randn(n_samp) * 1200).astype(np.int16))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    groups = spark.range(n_groups).repartition(max(2, min(64, n_groups)))
    return groups.mapInPandas(gen, AUDIO_SCHEMA)


VIDEO_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("n_frames", IntegerType()),
        StructField("h", IntegerType()),
        StructField("w", IntegerType()),
    ]
)


def video_table(
    spark: SparkSession, n_rows: int, seed: int = 42, container: str = "avi"
) -> DataFrame:
    """Deterministic synthetic video table: groups of 5 (anchor, exact dup,
    near-dup [sub-aHash pixel jitter], 2 singletons).

    ``container``: 'avi' (default — real RIFF/AVI uncompressed-DIB bytes
    through the pure-Python parser, sources/avi.py), 'fvid' (the
    deterministic test container), or 'mixed' (AVI except the exact-dup
    slot, which ships as FVID of the SAME pixels — both containers are
    lossless, so the pair still fingerprints identically, proving the
    per-row container dispatch inside one binary column)."""
    from ..functions.media_udf import fake_frames
    from .avi import encode_avi

    if container not in ("avi", "fvid", "mixed"):
        raise ValueError(f"unknown video container {container!r}")

    def pack(frames: np.ndarray, slot: int) -> bytes:
        if container == "fvid" or (container == "mixed" and slot == 1):
            return fake_frames(frames)
        return encode_avi(frames, codec="dib")

    n_groups = (n_rows + 4) // 5
    nf, h, w = 8, 24, 24

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for g in pdf["id"].tolist():
                rng = np.random.RandomState((seed * 1000003 + int(g) + 7) % (1 << 31))
                base_id = int(g) * 5
                anchor = rng.randint(0, 256, size=(nf, h, w), dtype=np.uint8)

                def emit(slot, frames):
                    rows.append(
                        {
                            "clip_id": f"vid-{base_id + slot:010d}",
                            "bytes": pack(frames, slot),
                            "n_frames": nf,
                            "h": h,
                            "w": w,
                        }
                    )

                emit(0, anchor)
                emit(1, anchor)
                jit = anchor.astype(np.int16)
                jit[:, :2, :2] += 1
                emit(2, jit.clip(0, 255).astype(np.uint8))
                emit(3, rng.randint(0, 256, size=(nf, h, w), dtype=np.uint8))
                emit(4, rng.randint(0, 256, size=(nf, h, w), dtype=np.uint8))
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_SCHEMA.fields])

    groups = spark.range(n_groups).repartition(max(2, min(64, n_groups)))
    return groups.mapInPandas(gen, VIDEO_SCHEMA)


# --- container-parity fixture (round 3: png/jpeg/gif/bmp, same pixels) ------

CONTAINERS_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("fmt", StringType(), False),   # decode routing label
        StructField("codec", StringType(), False), # parity grouping label
        StructField("bytes", BinaryType(), False),
    ]
)


def image_containers_table(
    spark: SparkSession, n_images: int = 8, seed: int = 7
) -> DataFrame:
    """One deterministic image per id, shipped in all SEVEN real codecs
    the engine decodes natively — png, jpeg (baseline, near-lossless
    quant_scale=1), gif, bmp, tiff (LZW + horizontal predictor), webp
    lossless (VP8L: subtract-green + color cache + runs) and webp lossy
    (pure-Python VP8 at near-lossless qi=4) — with IDENTICAL source
    pixels per image_id.  ``fmt`` is the decode-routing label (both webp
    rows say 'webp'); ``codec`` distinguishes the parity rows.

    Pixels are pre-quantized to 4 levels per channel (<=64 unique colors)
    so the GIF palette is exact: png/gif/bmp rows are bit-losslessly
    decodable and the jpeg row is near-lossless. Used by the
    `image_container_parity` contract query, whose oracle asserts that one
    image yields ONE perceptual hash and ONE geometry regardless of which
    container carried it. Distributed generation, per-row deterministic
    from (seed, image index) like the other fixtures."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .bmp import encode_bmp
        from .gif import encode_gif
        from .jpeg import encode_jpeg_baseline
        from .tiff import encode_tiff
        from .vp8_enc import encode_webp_lossy
        from .vp8l import encode_vp8l

        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.RandomState((seed * 1_000_003 + int(i)) % (2**31))
                px = (_base_pixels(rng) // 64 * 64).astype(np.uint8)
                image_id = f"cim-{int(i):06d}"
                for fmt, codec, blob in (
                    ("png", "png", encode_png(px)),
                    ("jpeg", "jpeg", encode_jpeg_baseline(px, 1)),
                    ("gif", "gif", encode_gif(px)),
                    ("bmp", "bmp", encode_bmp(px)),
                    ("tiff", "tiff", encode_tiff(px, compression=5, predictor=2)),
                    ("webp", "webp", encode_vp8l(px, subtract_green=True,
                                                 cache_bits=6, lz77_runs=True)),
                    # seventh codec: lossy VP8 through the pure-Python
                    # encoder (sources/vp8_enc.py) at a near-lossless
                    # quantizer — same container ('webp' routing/sniff
                    # label), distinct parity row
                    ("webp", "webp_lossy", encode_webp_lossy(px, y_ac_qi=4)),
                ):
                    rows.append({"image_id": image_id, "fmt": fmt,
                                 "codec": codec, "bytes": blob})
            yield pd.DataFrame(rows, columns=[f.name for f in CONTAINERS_SCHEMA.fields])

    ids = spark.range(n_images).repartition(max(2, min(16, n_images)))
    return ids.mapInPandas(gen, CONTAINERS_SCHEMA)
