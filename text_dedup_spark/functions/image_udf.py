"""Multimodal (image) pandas UDFs over opaque binary columns.

The reference has no image path; BASELINE.json adds it (F14 in SURVEY §2.3):
"vectorized Arrow/pandas UDFs compute ... perceptual features from
phash/pixels", per-row fidelity PSNR >= 40 dB. All UDFs here are
Arrow-batched; the PNG decode is real (sources/png.py), real-JPEG decode is
stubbed per the container constraints.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.png import (
    decode_image,
    encode_png,
    phash64,
    psnr,
    sniff_format,
    try_decode_image,
)

IMAGE_META = StructType(
    [
        StructField("dec_w", IntegerType()),
        StructField("dec_h", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def _to_signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


@pandas_udf(IMAGE_META)
def image_meta(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    """Decode + basic feature extraction: decoded dims and mean luminance."""
    ws, hs, lumas = [], [], []
    for b, f in zip(data, fmt):
        arr = decode_image(bytes(b), f)
        hs.append(arr.shape[0])
        ws.append(arr.shape[1])
        lumas.append(float(arr.astype(np.float64).mean()))
    return pd.DataFrame({"dec_w": ws, "dec_h": hs, "mean_luma": lumas})


@pandas_udf(StringType())
def sniffed_format(data: pd.Series) -> pd.Series:
    """Magic-byte format of each binary payload ('png'/'jpeg'/'gif'/'bmp'/
    'tiff'/'webp'/'wav'/'avi', null if unrecognized). Web corpora mislabel
    payloads constantly; use ``coalesce(sniffed_format(bytes), fmt)`` — or
    compare the two to audit label lies — before the decode pass, so a
    JPEG served from a .png URL decodes instead of flag-skipping."""
    return pd.Series([sniff_format(bytes(b)) if b is not None else None for b in data])


def with_sniffed_fmt(df, fmt_col: str = "fmt", bytes_col: str = "bytes"):
    """Repair the fmt column from magic bytes before a decode pass:
    ``fmt = coalesce(sniffed_format(bytes), fmt)``. Unrecognized payloads
    keep their label (they'll flag-skip at decode). One Arrow-batched
    projection, no shuffle — prepend to any image pipeline whose labels
    came from URLs/content-types (`--fmt_source sniff` on the CLI)."""
    return df.withColumn(
        fmt_col, F.coalesce(sniffed_format(bytes_col), F.col(fmt_col))
    )


@pandas_udf(LongType())
def phash_from_bytes(data: pd.Series, fmt: pd.Series) -> pd.Series:
    """Recompute the 64-bit perceptual hash from pixels (validates/derives
    the phash column; feeds the SimHash Hamming dedup)."""
    return pd.Series(
        [_to_signed64(phash64(decode_image(bytes(b), f))) for b, f in zip(data, fmt)]
    )


def _embed_gray(arr: np.ndarray) -> list:
    """Centered 8x8 block-mean luma vector of a decoded image (the
    embedding body shared by image_embedding and the combined UDF)."""
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    if h >= 8 and w >= 8:  # same 8x8 block grid as phash64
        bh, bw = h // 8, w // 8
        blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
        vec = (blocks - blocks.mean()).flatten()
    else:  # tiny image: centered raw pixels, zero-padded to 64
        vec = (gray - gray.mean()).flatten()[:64]
        vec = np.pad(vec, (0, 64 - vec.size))
    return vec.tolist()


PHASH_EMB = StructType(
    [
        StructField("phash", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


@pandas_udf(PHASH_EMB)
def phash_embedding_from_bytes(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    """Both pixel features from ONE decode: the 64-bit perceptual hash and
    the centered block-mean embedding (they share the same 8x8 gray-block
    grid — phash is its sign bits, the embedding its centered values).
    Use instead of phash_from_bytes + image_embedding when a pipeline
    wants both modalities: halves the decode cost of the feature pass."""
    ph, em = [], []
    for b, f in zip(data, fmt):
        arr = decode_image(bytes(b), f)
        ph.append(_to_signed64(phash64(arr)))
        em.append(_embed_gray(arr))
    return pd.DataFrame({"phash": ph, "embedding": em})


@pandas_udf(ArrayType(DoubleType()))
def image_embedding(data: pd.Series, fmt: pd.Series) -> pd.Series:
    """Decode -> 64-dim visual embedding: 8x8 grayscale block means,
    mean-centered. Cosine over this vector is the Pearson correlation of
    block intensities — invariant to affine brightness changes (gain and
    offset) and degrading smoothly under noise/overlays, where the
    thresholded phash can flip several bits at once. Feeds
    ``operators.semdedup.semantic_dedup`` as the image-space near-dup
    tier; flat (zero-variance) images embed to the zero vector, which the
    semantic-dedup zero-vector guard never groups."""
    return pd.Series(
        [_embed_gray(decode_image(bytes(b), f)) for b, f in zip(data, fmt)]
    )


PHASH_FLAGGED = StructType(
    [
        StructField("phash", LongType()),  # null when decode_ok is false
        StructField("decode_ok", BooleanType()),
    ]
)


@pandas_udf(PHASH_FLAGGED)
def phash_from_bytes_flagged(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    """Skip+flag variant of ``phash_from_bytes`` (VERDICT r2 #7): payloads
    the container cannot decode (arithmetic-coded/lossless JPEG, corrupt
    streams — progressive SOF2 now decodes for real) yield (phash=null,
    decode_ok=false) instead of failing the task — the only sane policy on
    a web corpus."""
    hashes, oks = [], []
    for b, f in zip(data, fmt):
        arr = try_decode_image(bytes(b), f)
        if arr is None:
            hashes.append(None)
            oks.append(False)
        else:
            hashes.append(_to_signed64(phash64(arr)))
            oks.append(True)
    return pd.DataFrame({"phash": pd.array(hashes, dtype="Int64"), "decode_ok": oks})


@pandas_udf(DoubleType())
def pixel_psnr(a: pd.Series, fmt_a: pd.Series, b: pd.Series, fmt_b: pd.Series) -> pd.Series:
    """PSNR between two image byte columns (inf-> large sentinel 999.0 for
    bit-identical pixels, keeping the column a plain double)."""
    out = []
    for xa, fa, xb, fb in zip(a, fmt_a, b, fmt_b):
        v = psnr(decode_image(bytes(xa), fa), decode_image(bytes(xb), fb))
        out.append(999.0 if v == float("inf") else float(v))
    return pd.Series(out)


def make_resize_udf(out_w: int, out_h: int):
    """Block-mean resize (real decode -> numpy mean-pool -> re-encode PNG).
    Dimensions must divide the source dims (the synthetic corpus is 32x32)."""

    @pandas_udf(BinaryType())
    def resize(data: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for b, f in zip(data, fmt):
            arr = decode_image(bytes(b), f)
            h, w, _ = arr.shape
            if h % out_h or w % out_w:
                raise ValueError(f"{w}x{h} not divisible into {out_w}x{out_h}")
            pooled = (
                arr.astype(np.float64)
                .reshape(out_h, h // out_h, out_w, w // out_w, 3)
                .mean(axis=(1, 3))
                .round()
                .astype(np.uint8)
            )
            out.append(encode_png(pooled))
        return pd.Series(out)

    return resize


@pandas_udf(BinaryType())
def frame_sample(data: pd.Series, fmt: pd.Series) -> pd.Series:  # pragma: no cover
    """Video frame sampling STUB: no video codec exists in this container.
    The Spark-side plumbing (binary in, binary out, Arrow-batched) is the
    real contract; swap the body for a real decoder on a cluster."""
    raise NotImplementedError("video decode requires codecs not present in this container")


@pandas_udf(ArrayType(LongType()))
def tile_phashes(data: pd.Series, fmt: pd.Series) -> pd.Series:
    """[full, top-left, top-right, bottom-left, bottom-right] phash64 per
    image — the fingerprint table for crop/partial-duplicate detection
    (operators/tiles.py). Images whose quadrants are too small for an 8x8
    block hash (< 16px a side) emit the full-frame hash only."""
    out = []
    for blob, f in zip(data, fmt):
        arr = decode_image(bytes(blob), f)
        h, w = arr.shape[:2]
        h2, w2 = h // 2, w // 2
        tiles = [arr]
        if h2 >= 8 and w2 >= 8:
            tiles += [arr[:h2, :w2], arr[:h2, w2:], arr[h2:, :w2], arr[h2:, w2:]]
        out.append([_to_signed64(phash64(t)) for t in tiles])
    return pd.Series(out)
