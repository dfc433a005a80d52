"""Synthetic image table, PNG codec, multimodal UDFs, and the combined
image+caption dedup suite with planted-truth recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_dedup_spark.config import MinHashConfig, SimHashConfig
from text_dedup_spark.functions.image_udf import image_meta, make_resize_udf, phash_from_bytes
from text_dedup_spark.kernel.union_find import UnionFind
from text_dedup_spark.plans.image_pipeline import image_dedup, verify_fidelity
from text_dedup_spark.sources.png import decode_png, encode_png, phash64, psnr
from text_dedup_spark.sources.synth import images_table, truth_table

N = 200  # 20 groups
MINHASH_CFG = MinHashConfig(ngram_size=5, num_perm=64, threshold=0.7)
SIMHASH_CFG = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram=3)


@pytest.fixture(scope="module")
def images(spark):
    return images_table(spark, N, seed=42).persist()


@pytest.fixture(scope="module")
def truth(spark):
    return truth_table(spark, N, seed=42).persist()


def test_png_roundtrip_and_psnr():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
    assert (decode_png(encode_png(arr)) == arr).all()
    assert psnr(arr, arr) == float("inf")


def test_table_is_deterministic_and_schema_exact(spark, images):
    again = images_table(spark, N, seed=42)
    a = {r["image_id"]: (bytes(r["bytes"]), r["caption"], r["phash"]) for r in images.collect()}
    b = {r["image_id"]: (bytes(r["bytes"]), r["caption"], r["phash"]) for r in again.collect()}
    assert a == b
    assert images.count() == N
    assert [(f.name, f.dataType.simpleString()) for f in images.schema.fields] == [
        ("image_id", "string"), ("bytes", "binary"), ("w", "int"), ("h", "int"),
        ("fmt", "string"), ("caption", "string"), ("phash", "bigint"),
    ]


def test_stored_phash_matches_recomputed(spark, images):
    df = images.withColumn("rephash", phash_from_bytes("bytes", "fmt"))
    assert df.where(F.col("rephash") != F.col("phash")).count() == 0


def test_image_meta_and_resize(spark, images):
    meta = images.select("image_id", image_meta("bytes", "fmt").alias("m")).select(
        "image_id", "m.dec_w", "m.dec_h", "m.mean_luma"
    )
    rows = meta.collect()
    assert all(r["dec_w"] == 32 and r["dec_h"] == 32 for r in rows)
    assert all(0 < r["mean_luma"] < 255 for r in rows)

    resize = make_resize_udf(8, 8)
    small = images.limit(5).select(resize("bytes", "fmt").alias("small")).collect()
    for r in small:
        arr = decode_png(bytes(r["small"]))
        assert arr.shape == (8, 8, 3)


def _planted_pairs(truth_rows, cluster_col):
    byc = {}
    for r in truth_rows:
        byc.setdefault(r[cluster_col], []).append(r["image_id"])
    pairs = set()
    for members in byc.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def _detected_pairs(corpus_rows, assign_rows, id_col="__id__"):
    id2img = {r[id_col]: r["image_id"] for r in corpus_rows}
    uf = UnionFind()
    for x in id2img:
        uf.find(x)
    for r in assign_rows:
        uf.union(r[id_col], r["component"])
    pairs = set()
    for c in uf.clusters().values():
        ms = sorted(id2img[x] for x in c)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def test_image_dedup_recall_on_planted_truth(spark, images, truth):
    res = image_dedup(images, MINHASH_CFG, SIMHASH_CFG)
    corpus_rows = res.corpus.select("__id__", "image_id").collect()
    truth_rows = truth.collect()

    # exact modality: recall 1.0 required (bytes are identical)
    got = _detected_pairs(corpus_rows, res.exact.collect())
    planted = _planted_pairs(truth_rows, "exact_cluster")
    assert planted <= got

    # caption near-dups: slot 1 (identical caption) + slot 2 (light edits)
    got_c = _detected_pairs(corpus_rows, res.caption_clusters.collect())
    planted_c = _planted_pairs(truth_rows, "caption_cluster")
    recall_c = len(planted_c & got_c) / len(planted_c)
    assert recall_c >= 0.99, recall_c

    # image near-dups via phash Hamming<=3: slot 1 (identical) + slot 3
    got_i = _detected_pairs(corpus_rows, res.image_clusters.collect())
    planted_i = _planted_pairs(truth_rows, "image_cluster")
    recall_i = len(planted_i & got_i) / len(planted_i)
    assert recall_i >= 0.99, recall_i

    # survivor accounting: kept + removed-by-merged == N, one rep per cluster
    assert res.kept.count() < N
    assert res.kept.select("image_id").distinct().count() == res.kept.count()


def test_fidelity_verifier_passes_identity_and_catches_corruption(spark, images):
    ok = verify_fidelity(images, images)
    assert ok.count() == 0

    # corrupt one caption -> flagged
    bad = images.withColumn(
        "caption",
        F.when(F.col("image_id") == "img-0000000000", F.lit("corrupted")).otherwise(
            F.col("caption")
        ),
    )
    flagged = verify_fidelity(images, bad).collect()
    assert {r["image_id"] for r in flagged} == {"img-0000000000"}


def _pair_set(comp_rows, idmap):
    from collections import defaultdict

    comp = defaultdict(set)
    for r in comp_rows:
        comp[r["component"]].add(r["__id__"])
        comp[r["component"]].add(r["component"])
    out = set()
    for members in comp.values():
        mm = sorted(idmap[m] for m in members)
        out.update((mm[i], mm[j]) for i in range(len(mm)) for j in range(i + 1, len(mm)))
    return out


def _truth_pair_set(truth_rows, col):
    from collections import defaultdict

    comp = defaultdict(set)
    for r in truth_rows:
        comp[r[col]].add(r["image_id"])
    out = set()
    for members in comp.values():
        mm = sorted(members)
        out.update((mm[i], mm[j]) for i in range(len(mm)) for j in range(i + 1, len(mm)))
    return out


def test_precision_and_recall_with_short_doc_policy(spark, images, truth):
    """With short docs excluded from banding (they carry no shingle
    evidence), caption MinHash achieves P=1.0 R=1.0 on the planted truth;
    the parity default ('cluster') reproduces the reference's degenerate
    all-short-docs mega-cluster instead (SURVEY §7.4)."""
    res = image_dedup(images, MINHASH_CFG, SIMHASH_CFG, short_doc_policy="keep")
    idmap = {r["__id__"]: r["image_id"] for r in res.corpus.select("__id__", "image_id").collect()}
    got = _pair_set(res.caption_clusters.collect(), idmap)
    want = _truth_pair_set(truth.collect(), "caption_cluster")
    assert got == want  # precision 1.0 AND recall 1.0

    res_parity = image_dedup(images, MINHASH_CFG, SIMHASH_CFG)
    idmap2 = {r["__id__"]: r["image_id"] for r in res_parity.corpus.select("__id__", "image_id").collect()}
    got2 = _pair_set(res_parity.caption_clusters.collect(), idmap2)
    assert want <= got2           # recall still 1.0
    assert len(got2) > len(want)  # plus the degenerate short-doc cluster


# --- real baseline JPEG (pure-numpy codec, sources/jpeg.py) ------------------


def _smooth_rgb(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.clip(100 + yy + seed, 0, 255),
            np.clip(80 + xx // 2 + seed, 0, 255),
            np.clip(60 + (xx + yy) // 3, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_codec_roundtrips():
    from text_dedup_spark.sources.jpeg import decode_jpeg_baseline, encode_jpeg_baseline

    rng = np.random.RandomState(3)
    gray = (rng.rand(40, 56) * 255).astype(np.uint8)
    assert psnr(gray, decode_jpeg_baseline(encode_jpeg_baseline(gray, 1))) > 50
    img = _smooth_rgb(50, 70)
    for sub in ("444", "420"):
        for rst in (0, 2):
            back = decode_jpeg_baseline(
                encode_jpeg_baseline(img, 1, subsampling=sub, restart_interval=rst)
            )
            assert back.shape == img.shape
            assert psnr(img, back) > 45, (sub, rst)
    # lossier quant still decodes, with measurably lower fidelity
    q8 = decode_jpeg_baseline(encode_jpeg_baseline(img, 8))
    assert 30 < psnr(img, q8) < psnr(img, decode_jpeg_baseline(encode_jpeg_baseline(img, 1)))


def test_jpeg_decoder_rejects_unsupported_sof_and_garbage():
    import pytest as _pytest

    from text_dedup_spark.sources.jpeg import decode_jpeg_baseline, encode_jpeg_baseline

    data = bytearray(encode_jpeg_baseline(_smooth_rgb(16, 16), 1))
    sof = data.index(b"\xff\xc0")
    # SOF9 (sequential arithmetic) DECODES as of round 4 — the unsupported
    # representative is now SOF10 (progressive arithmetic)
    data[sof + 1] = 0xCA
    with _pytest.raises(NotImplementedError):
        decode_jpeg_baseline(bytes(data))
    # SOF0 -> SOF2 with a baseline SOS (Ss=0, Se=63) is MALFORMED
    # progressive (a progressive DC scan must have Se=0): rejected, typed
    data[sof + 1] = 0xC2
    with _pytest.raises(ValueError):
        decode_jpeg_baseline(bytes(data))
    with _pytest.raises(ValueError):
        decode_jpeg_baseline(b"not a jpeg at all")


def test_jpeg_progressive_decodes_identically_to_baseline():
    """Real SOF2 streams (spectral selection + successive approximation,
    T.81 Annex G) decode to EXACTLY the baseline image: same flat quant
    tables => same reconstructed coefficients once every refinement scan
    has landed, so the pixel output must match byte for byte."""
    from text_dedup_spark.sources.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(11)
    cases = [
        ((rng.rand(40, 56) * 255).astype(np.uint8), 1),       # gray noise
        (_smooth_rgb(50, 70), 1),                              # smooth color
        (_smooth_rgb(33, 17), 8),                              # odd dims, lossy
        (np.full((24, 24, 3), 200, np.uint8), 4),              # flat: EOB runs
        ((np.indices((32, 32)).sum(0) % 2 * 255).astype(np.uint8), 1),  # checker
    ]
    for img, scale in cases:
        base = decode_jpeg_baseline(encode_jpeg_baseline(img, scale))
        prog = decode_jpeg_baseline(encode_jpeg_progressive(img, scale))
        assert np.array_equal(base, prog), (img.shape, scale)
    # 4:2:0 (the layout most real web progressive JPEGs use): exercises the
    # sampling-factor interleaved DC order and the per-component
    # non-interleaved AC grids, including odd dims where the luma grid is
    # smaller than the MCU-padded grid
    for shape, scale in [((32, 32, 3), 1), ((24, 33, 3), 1), ((17, 9, 3), 8),
                         ((31, 47, 3), 2)]:
        img = (rng.rand(*shape) * 255).astype(np.uint8)
        base = decode_jpeg_baseline(
            encode_jpeg_baseline(img, scale, subsampling="420"))
        prog = decode_jpeg_baseline(
            encode_jpeg_progressive(img, scale, subsampling="420"))
        assert np.array_equal(base, prog), (shape, scale, "420")
    # and the near-lossless fidelity invariant holds straight off SOF2 bytes
    img = _smooth_rgb(48, 32)
    assert psnr(img, decode_jpeg_baseline(encode_jpeg_progressive(img, 1))) > 45

    # encoder determinism goldens: the deploy/test design requires stable
    # bytes for identical input (content-stable ids, oracle fixtures)
    import hashlib

    gimg = (np.arange(24 * 24 * 3, dtype=np.uint64) * 2654435761 % 256).astype(
        np.uint8
    ).reshape(24, 24, 3)
    assert hashlib.sha256(encode_jpeg_progressive(gimg, 2)).hexdigest() == (
        "6febe56694c306bcdc719813de1df35e6031e4d91228bda4ac7658f2b81d343d"
    )
    assert hashlib.sha256(encode_jpeg_baseline(gimg, 2)).hexdigest() == (
        "914e5d81131155f05b9de86c0c0c886b7cc0fc891f50821cb5667096298886e3"
    )


def test_jpeg_rows_through_phash_and_fidelity(spark):
    """fmt='jpeg' rows flow through the pixels phash path and the PSNR
    fidelity verifier (the BASELINE.json input contract for lossy rows)."""
    from text_dedup_spark.sources.jpeg import encode_jpeg_baseline

    rows_png, rows_jpg, rows_bad = [], [], []
    for i in range(6):
        img = _smooth_rgb(32, 32, seed=7 * i)
        cap = f"caption {i}"
        rows_png.append((f"im{i}", bytearray(encode_png(img)), 32, 32, "png", cap, 0))
        rows_jpg.append(
            (f"im{i}", bytearray(encode_jpeg_baseline(img, 1)), 32, 32, "jpeg", cap, 0)
        )
        rows_bad.append(
            (f"im{i}", bytearray(encode_jpeg_baseline(img, 60)), 32, 32, "jpeg", cap, 0)
        )
    schema = "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    png_df = spark.createDataFrame(rows_png, schema)
    jpg_df = spark.createDataFrame(rows_jpg, schema)
    bad_df = spark.createDataFrame(rows_bad, schema)

    # phash over real-JPEG bytes equals phash over the PNG of the same image
    # (near-lossless quant => identical 64-bit perceptual hash)
    ph_png = {
        r["image_id"]: r["ph"]
        for r in png_df.select("image_id", phash_from_bytes(F.col("bytes"), F.col("fmt")).alias("ph")).collect()
    }
    ph_jpg = {
        r["image_id"]: r["ph"]
        for r in jpg_df.select("image_id", phash_from_bytes(F.col("bytes"), F.col("fmt")).alias("ph")).collect()
    }
    assert ph_png == ph_jpg

    # fidelity verifier: near-lossless JPEG passes PSNR>=40 vs the PNG truth
    assert verify_fidelity(png_df, jpg_df).count() == 0
    # brutally quantized JPEG rows are flagged
    assert verify_fidelity(png_df, bad_df).count() == 6


def test_undecodable_jpeg_flag_policy_end_to_end(spark):
    """VERDICT r2 #7: a mixed decodable+undecodable fixture processes
    end-to-end under undecodable='flag' — arithmetic-coded rows get
    decode_ok=false (excluded from the phash modality only), none crash,
    and exact-bytes + caption dedup still cover them (sequential
    arithmetic now decodes; SOF10 stands in). Progressive (SOF2)
    rows now DECODE for real and ride the pixel modality."""
    from text_dedup_spark.config import MinHashConfig, SimHashConfig
    from text_dedup_spark.functions.image_udf import phash_from_bytes_flagged
    from text_dedup_spark.plans.image_pipeline import image_dedup
    from text_dedup_spark.sources.jpeg import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )
    from text_dedup_spark.sources.png import try_decode_image

    def undecodable(img):
        data = bytearray(encode_jpeg_baseline(img, 1))
        sof = data.index(b"\xff\xc0")
        data[sof + 1] = 0xCA  # progressive arithmetic: valid format, no codec
        return bytes(data)

    assert try_decode_image(undecodable(_smooth_rgb(16, 16)), "jpeg") is None
    assert try_decode_image(b"garbage", "jpeg") is None
    assert try_decode_image(
        encode_jpeg_progressive(_smooth_rgb(16, 16), 1), "jpeg"
    ) is not None

    def rand_img(seed):
        rng = np.random.RandomState(seed)
        y, x = np.mgrid[0:32, 0:32].astype(np.float64)
        img = np.zeros((32, 32, 3))
        for c in range(3):
            a, b = rng.uniform(-3, 3, 2)
            fx, fy = rng.uniform(0.1, 0.8, 2)
            img[:, :, c] = 128 + a * (x - 16) + b * (y - 16) + 60 * np.sin(
                fx * x + fy * y + rng.uniform(0, 6.28)
            )
        return np.clip(img, 0, 255).astype(np.uint8)

    def cap(i):
        rng = np.random.RandomState(1000 + i)
        return " ".join(f"w{rng.randint(10_000)}" for _ in range(40))

    rows = []
    for i in range(8):
        rows.append(
            (f"ok{i}", bytearray(encode_jpeg_baseline(rand_img(i), 1)), 32, 32,
             "jpeg", cap(i), 0)
        )
    # arithmetic-coded rows: one is a BYTE-exact clone of another, one
    # near-dups a caption — both must still dedup without pixels
    und_bytes = undecodable(rand_img(999))
    rows.append(("prog0", bytearray(und_bytes), 32, 32, "jpeg", cap(999), 0))
    rows.append(("prog1", bytearray(und_bytes), 32, 32, "jpeg", cap(999), 0))
    rows.append(
        ("prog2", bytearray(undecodable(rand_img(998))), 32, 32,
         "jpeg", cap(0) + " extra", 0)
    )
    # a REAL progressive (SOF2) row: pixels identical to ok5's baseline row
    # (same flat quant => same decoded array), caption unrelated — it must
    # decode (NOT flagged) and dedup against ok5 through the pixel modality
    rows.append(
        ("sof2", bytearray(encode_jpeg_progressive(rand_img(5), 1)), 32, 32,
         "jpeg", cap(777), 0)
    )
    schema = "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    df = spark.createDataFrame(rows, schema)

    res = image_dedup(
        df,
        MinHashConfig(ngram_size=5, num_perm=64, threshold=0.7),
        SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram=3),
        phash_source="pixels",
        undecodable="flag",
    )
    kept_ids = {r["image_id"] for r in res.kept.select("image_id").collect()}
    # exactly the 3 arithmetic rows are flagged — the SOF2 row decodes
    assert res.decode_flags is not None and res.decode_flags.count() == 3
    flagged_ids = {
        r["image_id"]
        for r in res.corpus.join(res.decode_flags, "__id__").select("image_id").collect()
    }
    assert flagged_ids == {"prog0", "prog1", "prog2"}
    # byte-exact undecodable clone deduped via exact hash
    assert not {"prog0", "prog1"} <= kept_ids
    # caption-near undecodable row deduped via MinHash (vs ok0's caption)
    assert "prog2" not in kept_ids or "ok0" not in kept_ids
    # the progressive row pixel-dups ok5 (identical decoded array =>
    # identical phash): exactly one of the pair survives
    assert len({"sof2", "ok5"} & kept_ids) == 1
    # every other decodable row survives (unique pixels + captions)
    assert {f"ok{i}" for i in range(1, 8) if i != 5} <= kept_ids

    # the flagged struct UDF itself: nulls exactly where decode fails
    got = {
        r["image_id"]: (r["pf"]["phash"], r["pf"]["decode_ok"])
        for r in df.select(
            "image_id", phash_from_bytes_flagged(F.col("bytes"), F.col("fmt")).alias("pf")
        ).collect()
    }
    for i in range(8):
        ph, ok = got[f"ok{i}"]
        assert ok and ph is not None
    for p in ("prog0", "prog1", "prog2"):
        ph, ok = got[p]
        assert not ok and ph is None
    ph, ok = got["sof2"]
    assert ok and ph == got["ok5"][0]  # SOF2 decodes to ok5's exact pixels

    # undecodable='error' (the default) still raises on the same corpus
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception):
        image_dedup(df, phash_source="pixels").kept.count()


def test_corrupt_jpeg_never_escapes_the_flag_seam():
    """Truncations/bit-flips of a real JPEG stream raise ONLY ValueError /
    NotImplementedError from decode_image (low-level IndexError/
    struct.error normalized), so try_decode_image's catch is closed — a
    corrupt row can never become a task-killing stray exception."""
    import numpy as np

    from text_dedup_spark.sources.jpeg import encode_jpeg_baseline
    from text_dedup_spark.sources.png import decode_image, try_decode_image

    img = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
    blob = encode_jpeg_baseline(img)
    for cut in range(2, len(blob), 13):  # every truncation class
        try:
            decode_image(blob[:cut], "jpeg")
        except (ValueError, NotImplementedError):
            pass
        assert try_decode_image(blob[:cut], "jpeg") is None or cut > len(blob) - 4
    for i in range(0, len(blob), 29):  # single-byte corruption sweep
        b = bytearray(blob)
        b[i] ^= 0xFF
        try:
            out = decode_image(bytes(b), "jpeg")
        except (ValueError, NotImplementedError):
            continue
        assert out.shape[0] == 32  # corrupted-but-decodable is acceptable

    # same closed contract for the progressive (SOF2) entropy coders.
    # NOTE: truncated progressive may legitimately DECODE — the format is
    # designed to render from a scan prefix (partial refinement), so the
    # contract here is "None or a well-shaped image", never a stray raise.
    from text_dedup_spark.sources.jpeg import encode_jpeg_progressive

    pblob = encode_jpeg_progressive(img)
    for cut in range(2, len(pblob), 17):
        try:
            decode_image(pblob[:cut], "jpeg")
        except (ValueError, NotImplementedError):
            pass
        out = try_decode_image(pblob[:cut], "jpeg")
        assert out is None or out.shape == (32, 32)
    for i in range(0, len(pblob), 31):
        b = bytearray(pblob)
        b[i] ^= 0xFF
        try:
            out = decode_image(bytes(b), "jpeg")
        except (ValueError, NotImplementedError):
            continue
        assert out.shape[0] == 32


# --- GIF + BMP codecs (round 3: widen real still-image format coverage) -----


def test_gif_codec_roundtrips():
    """Pure-Python GIF87a/89a codec: lossless round trip for <=256-color
    images (the encoder contract), interlaced rows, multi-frame animation
    with full-canvas frames, deterministic quantize for true-color input,
    and a clean ValueError for garbage."""
    import hashlib

    from text_dedup_spark.sources.gif import decode_gif, encode_gif, is_gif

    rng = np.random.RandomState(3)
    for shape in [(1, 1, 3), (7, 5, 3), (33, 17, 3)]:
        img = (rng.randint(0, 4, shape) * 64).astype(np.uint8)
        blob = encode_gif(img)
        assert is_gif(blob)
        dec = decode_gif(blob)
        assert dec.shape[0] == 1 and np.array_equal(dec[0], img), shape

    # interlace changes row transmission order, not pixels
    img = (rng.randint(0, 8, (21, 13, 3)) * 32).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True))[0], img)

    # animation: every composited frame equals its source frame
    frames = (rng.randint(0, 6, (5, 16, 24, 3)) * 40).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(frames)), frames)

    # 256 colors exactly still round-trips losslessly
    grad = np.tile(np.arange(256, dtype=np.uint8)[None, :, None], (8, 1, 3))
    assert np.array_equal(decode_gif(encode_gif(grad))[0], grad)

    # true-color input: fixed 6x7x6 cube quantize, bounded per-channel error
    noisy = rng.randint(0, 256, (40, 40, 3)).astype(np.uint8)
    dec = decode_gif(encode_gif(noisy))[0]
    assert int(np.abs(dec.astype(np.int16) - noisy.astype(np.int16)).max()) < 52

    # error contract: garbage and truncations raise ValueError, never hang
    blob = encode_gif(img)
    for junk in (b"", b"GIF89a", b"notagif!", blob[:20], blob[: len(blob) // 2]):
        with pytest.raises(ValueError):
            decode_gif(junk)

    # encoder determinism golden (content-stable ids / oracle fixtures)
    gimg = (np.arange(24 * 24 * 3, dtype=np.uint64) * 2654435761 % 256).astype(
        np.uint8
    ).reshape(24, 24, 3)
    assert hashlib.sha256(encode_gif(gimg)).hexdigest() == (
        "68ef60750a6dcf422fe99727e0f9025313247342c41a75725569477968a64155"
    )


def test_gif_transparency_and_disposal():
    """Hand-built 89a stream: a sub-canvas second frame with a transparent
    checker composited over frame 1 (disposal=keep) — transparent pixels
    keep the prior canvas, opaque ones paint."""
    import struct

    from text_dedup_spark.sources.gif import _lzw_encode, _write_subblocks, decode_gif

    w, h = 8, 6
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    out = bytearray(b"GIF89a") + struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)
    out += pal.tobytes()
    idx1 = np.full((h, w), 1, np.uint8)  # all red
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(2)
    out += _write_subblocks(_lzw_encode(2, idx1.tobytes()))
    out += b"\x21\xf9" + _write_subblocks(struct.pack("<BHB", 0x05, 4, 3))
    idx2 = np.array([[2, 3], [3, 2]], np.uint8)  # green / transparent checker
    out += struct.pack("<BHHHHB", 0x2C, 3, 2, 2, 2, 0)
    out.append(2)
    out += _write_subblocks(_lzw_encode(2, idx2.tobytes()))
    out.append(0x3B)

    fr = decode_gif(bytes(out))
    assert fr.shape == (2, h, w, 3)
    assert (fr[0] == [255, 0, 0]).all()
    assert (fr[1][2, 3] == [0, 255, 0]).all() and (fr[1][3, 4] == [0, 255, 0]).all()
    assert (fr[1][2, 4] == [255, 0, 0]).all() and (fr[1][3, 3] == [255, 0, 0]).all()


def test_bmp_codec_roundtrips():
    """Pure-Python BMP codec: lossless 24bpp round trip, 8bpp palettized
    top-down and 32bpp hand-built streams, error contract, determinism."""
    import hashlib
    import struct

    from text_dedup_spark.sources.bmp import decode_bmp, encode_bmp, is_bmp

    rng = np.random.RandomState(5)
    for shape in [(1, 1, 3), (5, 7, 3), (33, 31, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        blob = encode_bmp(img)
        assert is_bmp(blob)
        assert np.array_equal(decode_bmp(blob), img), shape

    # 8bpp palettized, top-down (negative height)
    w, h = 6, 4
    pal = np.array([[10, 20, 30, 0], [200, 100, 50, 0]], np.uint8)  # BGRX
    idx = rng.randint(0, 2, (h, w)).astype(np.uint8)
    stride = (w + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx
    offset = 14 + 40 + 8
    data = b"BM" + struct.pack("<IHHI", offset + stride * h, 0, 0, offset)
    data += struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 8, 0, stride * h, 0, 0, 2, 0)
    data += pal.tobytes() + rows.tobytes()
    assert np.array_equal(decode_bmp(data), pal[:, 2::-1][idx])

    # 32bpp BGRX
    px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    rows32 = np.zeros((h, w * 4), np.uint8)
    rows32[:, 0::4], rows32[:, 1::4], rows32[:, 2::4] = (
        px[:, :, 2], px[:, :, 1], px[:, :, 0],
    )
    offset = 14 + 40
    d = b"BM" + struct.pack("<IHHI", offset + rows32.nbytes, 0, 0, offset)
    d += struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, rows32.nbytes, 0, 0, 0, 0)
    d += rows32.tobytes()
    assert np.array_equal(decode_bmp(d), px)

    blob = encode_bmp(px)
    for junk in (b"", b"BM", b"BM" + b"\x00" * 30, blob[:40]):
        with pytest.raises(ValueError):
            decode_bmp(junk)

    gimg = (np.arange(24 * 24 * 3, dtype=np.uint64) * 2654435761 % 256).astype(
        np.uint8
    ).reshape(24, 24, 3)
    assert hashlib.sha256(encode_bmp(gimg)).hexdigest() == (
        "1f0e2638d8bd5e24aceaa2c385c5765daf339a06413779c7eac374686eebb474"
    )


def test_gif_bmp_rows_through_phash_and_fidelity(spark):
    """fmt='gif' / fmt='bmp' rows decode through the same typed seam as
    png/jpeg: identical pixels -> identical phash across all three
    containers, and the PSNR fidelity verifier sees them as lossless."""
    from text_dedup_spark.sources.bmp import encode_bmp
    from text_dedup_spark.sources.gif import encode_gif

    rows_png, rows_gif, rows_bmp = [], [], []
    for i in range(5):
        # quantize to few levels so the GIF palette is exact (lossless)
        img = (_smooth_rgb(32, 32, seed=11 * i) // 32 * 32).astype(np.uint8)
        cap = f"caption {i}"
        rows_png.append((f"im{i}", bytearray(encode_png(img)), 32, 32, "png", cap, 0))
        rows_gif.append((f"im{i}", bytearray(encode_gif(img)), 32, 32, "gif", cap, 0))
        rows_bmp.append((f"im{i}", bytearray(encode_bmp(img)), 32, 32, "bmp", cap, 0))
    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long"
    )
    png_df = spark.createDataFrame(rows_png, schema)
    gif_df = spark.createDataFrame(rows_gif, schema)
    bmp_df = spark.createDataFrame(rows_bmp, schema)

    def phashes(df):
        return {
            r["image_id"]: r["ph"]
            for r in df.select(
                "image_id", phash_from_bytes(F.col("bytes"), F.col("fmt")).alias("ph")
            ).collect()
        }

    ph = phashes(png_df)
    assert ph == phashes(gif_df) == phashes(bmp_df)

    # both containers are lossless here: fidelity verifier flags nothing
    assert verify_fidelity(png_df, gif_df).count() == 0
    assert verify_fidelity(png_df, bmp_df).count() == 0

    # corrupt GIF/BMP rows follow the flag policy, not a task failure
    from text_dedup_spark.sources.png import try_decode_image

    assert try_decode_image(b"GIF89a\x00\x01", "gif") is None
    assert try_decode_image(b"BMtrash", "bmp") is None
