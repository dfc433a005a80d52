"""Property-based tests (hypothesis) for the pure kernels — no Spark.

These complement the golden-vector tests: goldens pin reference parity at
specific points; properties pin the algebraic invariants over the whole
input space."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from text_dedup_spark.kernel.intervals import merge_intervals, restore_and_merge
from text_dedup_spark.kernel.minhash import (
    MAX_HASH,
    generate_permutations,
    minhash_signature,
    minhash_signatures_batch,
    tokenize,
)
from text_dedup_spark.kernel.simhash import (
    hamming_distance,
    simhash_signature,
    simhash_signatures_batch,
)
from text_dedup_spark.kernel.substr import duplicate_segments
from text_dedup_spark.kernel.xxh import xxh64_batch, xxh64_int

# --- tokenizer / shingles ---------------------------------------------------

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@given(texts, st.integers(1, 8))
@settings(max_examples=200, deadline=None)
def test_tokenize_shingle_count(content, n):
    """Spark-script semantics (minhash_spark.py:58-85): shingle count is
    bounded by max(0, words-n+1); short docs yield the empty set (never the
    whole-doc fallback of utils/tokenization.py)."""
    import re

    words = [w for w in re.split("[^A-Za-z_0-9]", content.replace("\n", " ")) if w]
    sh = tokenize(content, n)
    if len(words) < n:
        assert sh == set()
    else:
        assert 0 < len(sh) <= len(words) - n + 1
        assert all(len(g.split(" ")) == n for g in sh)


# --- minhash ----------------------------------------------------------------

PERMS = generate_permutations(16)


@given(st.lists(texts, max_size=12))
@settings(max_examples=50, deadline=None)
def test_minhash_batch_equals_scalar(batch):
    got = minhash_signatures_batch(batch, 16, 3, PERMS, chunk_tokens=11)
    ref = np.stack(
        [minhash_signature(t, 16, 3, PERMS) for t in batch]
    ) if batch else np.empty((0, 16), np.uint64)
    assert (got == ref).all()
    # signatures are bounded by MAX_HASH (the reference's & MAX_HASH)
    assert (got <= np.uint64(MAX_HASH)).all()


@given(texts, texts)
@settings(max_examples=100, deadline=None)
def test_minhash_identical_docs_identical_sigs(a, b):
    sa = minhash_signature(a, 16, 3, PERMS)
    sb = minhash_signature(b, 16, 3, PERMS)
    if tokenize(a, 3) == tokenize(b, 3):
        assert (sa == sb).all()


# --- simhash ----------------------------------------------------------------


@given(st.lists(texts, max_size=10))
@settings(max_examples=50, deadline=None)
def test_simhash_batch_equals_scalar(batch):
    got = simhash_signatures_batch(batch, 64, 3)
    ref = np.array([simhash_signature(t, 64, 3) for t in batch], dtype=np.uint64)
    assert (got == ref).all()


@given(st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1))
@settings(max_examples=200, deadline=None)
def test_hamming_is_a_metric(a, b, c):
    assert hamming_distance(a, a) == 0
    assert hamming_distance(a, b) == hamming_distance(b, a)
    assert hamming_distance(a, c) <= hamming_distance(a, b) + hamming_distance(b, c)


# --- xxh64 ------------------------------------------------------------------


@given(st.lists(st.binary(max_size=40), max_size=20), st.integers(0, 2**32))
@settings(max_examples=100, deadline=None)
def test_xxh64_batch_equals_scalar(datas, seed):
    got = xxh64_batch(datas, seed)
    ref = np.array([xxh64_int(d, seed) for d in datas], dtype=np.uint64)
    assert (got == ref).all()


@given(st.lists(st.binary(min_size=32, max_size=400), max_size=12),
       st.integers(0, 2**32))
@settings(max_examples=100, deadline=None)
def test_xxh64_batch_equals_scalar_long_inputs(datas, seed):
    """>=32-byte inputs exercise the vectorized 4-accumulator stripe loop
    (previously a scalar fallback — VERDICT r3 #4), including rows mixing
    stripe counts inside one batch and stripe-aligned lengths."""
    datas = datas + [b"x" * 32, b"y" * 64, b"z" * 95]
    got = xxh64_batch(datas, seed)
    ref = np.array([xxh64_int(d, seed) for d in datas], dtype=np.uint64)
    assert (got == ref).all()


# --- intervals --------------------------------------------------------------

intervals = st.lists(
    st.tuples(st.integers(0, 60), st.integers(1, 30)).map(lambda t: (t[0], t[0] + t[1])),
    max_size=15,
)


@given(intervals)
@settings(max_examples=200, deadline=None)
def test_merge_overlapping_covers_exactly_the_union(iv):
    merged = merge_intervals(iv, "overlapping")
    want = set()
    for a, b in iv:
        want.update(range(a, b))
    got = set()
    prev_end = -1
    for a, b in merged:
        assert a < b
        assert a > prev_end  # disjoint, non-touching, sorted
        prev_end = b
        got.update(range(a, b))
    assert got == want


@given(intervals)
@settings(max_examples=100, deadline=None)
def test_merge_longest_keeps_maximal_intervals(iv):
    merged = merge_intervals(iv, "longest")
    distinct = set(iv)
    for m in merged:
        assert m in distinct
    # no kept interval is contained in another kept interval
    for x in merged:
        for y in merged:
            if x != y:
                assert not (y[0] <= x[0] and x[1] <= y[1])


# --- duplicate substrings ---------------------------------------------------


@given(st.binary(max_size=200), st.integers(1, 8))
@settings(max_examples=100, deadline=None)
def test_duplicate_segments_match_naive_model(data, k):
    def naive(d, kk):
        pos = defaultdict(list)
        for i in range(len(d) - kk + 1):
            pos[d[i : i + kk]].append(i)
        dups = sorted(p for v in pos.values() if len(v) >= 2 for p in v)
        return merge_intervals([(p, p + kk) for p in dups], "overlapping")

    assert duplicate_segments(data, k) == naive(data, k)


@given(st.binary(max_size=120), st.integers(1, 6))
@settings(max_examples=60, deadline=None)
def test_restore_and_merge_total_is_sum_of_ranges(data, k):
    # split data into 3 docs; restored per-doc ranges must re-sum
    n = len(data)
    bounds = [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    segs = duplicate_segments(data, k)
    per_doc, total = restore_and_merge(bounds, segs, k, "overlapping")
    assert total == sum(b - a for ranges in per_doc for a, b in ranges)
    for (s, e), ranges in zip(bounds, per_doc):
        for a, b in ranges:
            assert 0 <= a < b <= e - s


# --- AVI container (sources/avi.py) ------------------------------------------


@given(
    st.integers(1, 3),        # frames
    st.integers(1, 24),       # height
    st.integers(1, 25),       # width (hits every stride-padding residue)
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_avi_dib_round_trip_property(n, h, w, seed):
    """Lossless DIB round-trip at arbitrary geometries — including 1-pixel
    rows/cols and every row-stride padding class (w*3 mod 4)."""
    import numpy as np

    from text_dedup_spark.sources.avi import decode_avi, encode_avi

    rng = np.random.RandomState(seed % (1 << 31))
    frames = rng.randint(0, 256, size=(n, h, w), dtype=np.uint8)
    out = decode_avi(encode_avi(frames, codec="dib"))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, frames)


@given(st.binary(max_size=64))
@settings(max_examples=60, deadline=None)
def test_avi_decode_never_hangs_on_garbage(data):
    """Arbitrary bytes either raise cleanly (ValueError /
    NotImplementedError) or decode — never loop or crash the interpreter.
    The operator layer maps the raises to decode_ok=false rows."""
    import pytest as _pytest

    from text_dedup_spark.sources.avi import decode_avi

    blob = b"RIFF" + data  # steer toward the parser's deeper branches
    try:
        decode_avi(blob)
    except (ValueError, NotImplementedError, IndexError):
        pass
    try:
        decode_avi(data)
    except (ValueError, NotImplementedError, IndexError):
        pass


@given(
    st.integers(1, 36), st.integers(1, 36),
    st.booleans(), st.sampled_from([1, 2, 4, 8]),
    st.sampled_from(["444", "420"]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=15, deadline=None)
def test_progressive_jpeg_equals_baseline_property(h, w, color, scale, sub, seed):
    """For ANY image content/geometry/quant scale/subsampling, the
    progressive (SOF2) encode->decode path reconstructs EXACTLY the
    baseline encode->decode pixels: both quantize the same flat tables
    over the same planes, and successive approximation is lossless once
    every refinement scan has landed."""
    import numpy as np

    from text_dedup_spark.sources.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(seed % (2**31))
    shape = (h, w, 3) if color else (h, w)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    if not color:
        sub = "444"  # subsampling is a color-plane concept
    base = decode_jpeg_baseline(encode_jpeg_baseline(img, scale, subsampling=sub))
    prog = decode_jpeg_baseline(encode_jpeg_progressive(img, scale, subsampling=sub))
    assert np.array_equal(base, prog)


@given(st.binary(max_size=80))
@settings(max_examples=60, deadline=None)
def test_gif_bmp_decode_never_hangs_on_garbage(data):
    """Arbitrary bytes either raise ValueError cleanly or decode — never
    loop or crash; the operator layer maps raises to decode_ok=false."""
    from text_dedup_spark.sources.bmp import decode_bmp
    from text_dedup_spark.sources.gif import decode_gif

    for blob in (data, b"GIF89a" + data, b"BM" + data):
        try:
            decode_gif(blob)
        except ValueError:
            pass
        try:
            decode_bmp(blob)
        except ValueError:
            pass


@given(
    st.integers(1, 24), st.integers(1, 24), st.integers(1, 3),
    st.integers(2, 16), st.booleans(), st.integers(0, 2**32 - 1),
)
@settings(max_examples=20, deadline=None)
def test_gif_roundtrip_property(h, w, n_frames, n_colors, interlace, seed):
    """For ANY geometry/frame count/palette size <=256 and either row
    order, GIF encode->decode reproduces the exact input pixels; BMP
    (always lossless) round-trips the same frames one by one."""
    import numpy as np

    from text_dedup_spark.sources.bmp import decode_bmp, encode_bmp
    from text_dedup_spark.sources.gif import decode_gif, encode_gif

    rng = np.random.RandomState(seed % (2**31))
    palette = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    frames = palette[rng.randint(0, n_colors, (n_frames, h, w))]
    dec = decode_gif(encode_gif(frames, interlace=interlace))
    assert dec.shape == frames.shape
    assert np.array_equal(dec, frames)
    for f in frames:
        assert np.array_equal(decode_bmp(encode_bmp(f)), f)


# --- decoder robustness fuzz (closed exception set on a 100-TB corpus) ------


@given(
    fmt_i=st.integers(0, 5),
    mode=st.sampled_from(["truncate", "bitflip", "garbage"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=120, deadline=None)
@example(
    fmt_i=1,
    mode='bitflip',
    seed=376695100,
).via('discovered failure')
def test_try_decode_never_raises_on_mangled_bytes(fmt_i, mode, seed):
    """try_decode_image must return an array or None for ANY bytes — a
    corrupt row on a web corpus becomes decode_ok=false, never a stray
    exception that kills the task. Fuzz every container with truncation,
    bit flips, and pure garbage."""
    import numpy as np

    from text_dedup_spark.sources.bmp import encode_bmp
    from text_dedup_spark.sources.gif import encode_gif
    from text_dedup_spark.sources.jpeg import encode_jpeg_baseline
    from text_dedup_spark.sources.png import encode_png, try_decode_image
    from text_dedup_spark.sources.tiff import encode_tiff
    from text_dedup_spark.sources.vp8l import encode_vp8l

    rng = np.random.RandomState(seed)
    fmt, enc = [
        ("png", encode_png),
        ("jpeg", encode_jpeg_baseline),
        ("gif", lambda a: encode_gif([a])),
        ("bmp", encode_bmp),
        ("tiff", lambda a: encode_tiff(a, compression=5, predictor=2)),
        ("webp", lambda a: encode_vp8l(a, cache_bits=4, lz77_runs=True)),
    ][fmt_i]
    px = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    data = bytearray(enc(px))
    if mode == "truncate":
        data = data[: rng.randint(0, len(data))]
    elif mode == "bitflip":
        for _ in range(rng.randint(1, 6)):
            i = rng.randint(0, len(data))
            data[i] ^= 1 << rng.randint(0, 8)
    else:
        data = bytearray(rng.randint(0, 256, rng.randint(0, 200)).astype(np.uint8))
    out = try_decode_image(bytes(data), fmt)
    assert out is None or (out.ndim == 3 and out.dtype == np.uint8)


# --- semantic dedup vs brute-force oracle (randomized corpora) --------------

small_vecs = st.lists(
    st.lists(st.integers(-3, 3), min_size=4, max_size=4),
    min_size=2,
    max_size=16,
)


@given(vec_rows=small_vecs, eps=st.sampled_from([0.9, 0.95, 0.99]))
@settings(max_examples=10, deadline=None)
def test_semantic_dedup_matches_bruteforce_oracle(spark, vec_rows, eps):
    """At n_clusters=1 the within-cell approximation vanishes: groups and
    min-id survivors must EXACTLY match an all-pairs rounded-cosine
    union-find. The tiny integer value space makes identical vectors (the
    collapse path), scaled copies, and zero vectors all arise naturally."""
    from tests.test_semdedup import make_df, py_min_id_assignments
    from text_dedup_spark.operators.semdedup import semantic_dedup

    ids = list(range(10, 10 + len(vec_rows)))
    got = {
        (r["vec_id"], r["component"])
        for r in semantic_dedup(
            make_df(spark, ids, vec_rows), eps=eps, n_clusters=1, keep="min_id"
        ).collect()
    }
    assert got == py_min_id_assignments(ids, vec_rows, eps)
