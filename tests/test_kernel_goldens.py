"""Golden-vector tests: every doctest constant from the reference
(SURVEY.md §5 / FIXTURES.md T4) must reproduce bit-exactly."""

import numpy as np
import pytest

from text_dedup_spark.kernel.intervals import (
    clean_up,
    merge_intervals,
    restore,
    restore_and_merge,
)
from text_dedup_spark.kernel.minhash import (
    MAX_HASH,
    band_bytes,
    generate_permutations,
    hash_ranges,
    minhash_signature,
    ngrams,
    optimal_param,
    sha1_hash,
    sha1_hash32,
    tokenize,
)
from text_dedup_spark.kernel.simhash import (
    Permutation,
    char_ngrams,
    compute,
    create_permutations,
    hamming_distance,
    simhash_signature,
    unsigned_hash,
)
from text_dedup_spark.kernel.xxh import xxh64_digest, xxh64_int


# --- MinHash goldens (reference doctests: minhash_spark.py, minhash.py) ---


def test_ngrams_goldens():
    assert list(ngrams(["a", "b", "c", "d"], 2)) == [("a", "b"), ("b", "c"), ("c", "d")]
    assert list(ngrams(["a", "b", "c", "d"], 3)) == [("a", "b", "c"), ("b", "c", "d")]
    # spark-script behavior: short docs yield NO grams (minhash_spark.py:58-85)
    assert list(ngrams(["a", "b"], 3)) == []


def test_sha1_goldens():
    assert sha1_hash32(b"hello") == 499578026
    assert bin(sha1_hash32(b"hello")) == "0b11101110001101111010010101010"
    assert sha1_hash32(b"hello world").bit_length() == 30
    assert sha1_hash(b"hello world", 64) == 13028719972609469994
    assert sha1_hash(b"hello", 32) == 499578026


def test_optimal_param_goldens():
    assert optimal_param(0.7, 256) == (25, 10)
    assert optimal_param(0.75, 256) == (21, 12)
    assert optimal_param(0.75, 256, 0.1, 0.9) == (28, 9)
    # the fork's production config (RunFullSet.sh:41): thr 0.8, 64 perm -> 5 bands
    assert optimal_param(0.8, 64) == (5, 11)


def test_permutations_draw_order():
    # pairs drawn in order, as uint64, then transposed (minhash_spark.py:313-322)
    perms = generate_permutations(4, seed=42)
    rng = np.random.RandomState(42)
    expect = []
    for _ in range(4):
        a = rng.randint(1, (1 << 61) - 1, dtype=np.uint64)
        b = rng.randint(0, (1 << 61) - 1, dtype=np.uint64)
        expect.append((a, b))
    expect = np.array(expect, dtype=np.uint64).T
    assert perms.shape == (2, 4)
    assert (perms == expect).all()


def test_minhash_signature_reference_formula():
    # independently recompute the reference math for one document
    perms = generate_permutations(16)
    content = "the quick brown fox jumps over the lazy dog again and again"
    sig = minhash_signature(content, 16, 3, perms)
    tokens = tokenize(content, 3)
    hv = np.array([sha1_hash32(t.encode()) for t in tokens], dtype=np.uint64)
    a, b = perms
    p = np.uint64((1 << 61) - 1)
    phv = np.bitwise_and(((hv * np.tile(a, (len(hv), 1)).T).T + b) % p, MAX_HASH)
    expect = np.vstack([phv, np.ones(16, dtype=np.uint64) * MAX_HASH]).min(axis=0)
    assert (sig == expect).all()
    assert sig.dtype == np.uint64


def test_minhash_signature_short_and_empty_docs():
    perms = generate_permutations(8)
    # fewer tokens than ngram size -> all-MAX_HASH signature (degenerate bucket)
    sig = minhash_signature("one two", 8, 5, perms)
    assert (sig == MAX_HASH).all()
    sig = minhash_signature("", 8, 5, perms)
    assert (sig == MAX_HASH).all()


def test_band_bytes_layout():
    # big-endian serialization per band (minhash_spark.py:155)
    hv = np.array([1, 2, 3, 4], dtype=np.uint64)
    ranges = hash_ranges(2, 2)
    bands = band_bytes(hv, ranges)
    assert bands[0] == (1).to_bytes(8, "big") + (2).to_bytes(8, "big")
    assert bands[1] == (3).to_bytes(8, "big") + (4).to_bytes(8, "big")


def test_token_cache_is_transparent():
    perms = generate_permutations(8)
    cache: dict = {}
    s1 = minhash_signature("a b c d e f g", 8, 3, perms, token_cache=cache)
    s2 = minhash_signature("a b c d e f g", 8, 3, perms, token_cache=cache)
    s3 = minhash_signature("a b c d e f g", 8, 3, perms)
    assert (s1 == s2).all() and (s1 == s3).all()
    assert len(cache) > 0


# --- xxh64 (public test vectors + spec) ---


def test_xxh64_published_vectors():
    assert xxh64_int(b"") == 0xEF46DB3751D8E999
    assert xxh64_digest(b"") == bytes.fromhex("ef46db3751d8e999")
    # >=32-byte path exercises the 4-lane stripe loop
    assert xxh64_int(b"a" * 101) != xxh64_int(b"a" * 100)
    # seed parameter changes the hash
    assert xxh64_int(b"hello", seed=42) != xxh64_int(b"hello", seed=0)


# --- SimHash goldens (reference doctests: simhash.py) ---


def test_hamming_distance_golden():
    assert hamming_distance(0b1010, 0b1010) == 0
    assert hamming_distance(0b1010, 0b0010) == 1


def test_compute_golden():
    assert compute([13352372148217134600, 5020219685658847592]) == 74633958390507528


def test_unsigned_hash_lengths():
    assert unsigned_hash(b"hello world", 64) < (1 << 64)
    assert unsigned_hash(b"hello world", 64).bit_length() <= 64


def test_create_permutations_golden():
    perms = create_permutations(128, 3, 4)
    assert len(perms) == 4
    for p in perms:
        assert sum(p.widths) == 128
    perms64 = create_permutations(64, 3, 4)
    assert len(perms64) == 4
    # permute must be a bijection on the block bits: applying it to a random
    # value and collecting (mask, offset) pairs must preserve popcount
    x = 0xDEADBEEFCAFEBABE
    for p in perms64:
        assert bin(p.permute(x)).count("1") == bin(x).count("1")


def test_permutation_bucket_prefix_semantics():
    # two values differing only outside the prefix share a bucket key
    perms = create_permutations(64, 3, 4)
    p = perms[0]
    x = 0x0123456789ABCDEF
    # flip a bit that lands outside the search prefix after permutation
    for bit in range(64):
        y = x ^ (1 << bit)
        same = p.bucket_key(x) == p.bucket_key(y)
        affects_prefix = (p.permute(1 << bit) & p.search_mask) != 0
        assert same == (not affects_prefix)


def test_char_ngrams_short_doc_fallback():
    # utils/tokenization.py:35-36 fallback: short doc = one whole-doc token
    assert char_ngrams("ab", 3) == {"ab"}
    assert char_ngrams("", 3) == {""}
    assert char_ngrams("abcd", 3) == {"abc", "bcd"}


def test_simhash_signature_embed_shape():
    # embed_func doctest: 64-bit signature = 8 bytes (simhash.py:284-289)
    sig = simhash_signature("hello world", f=64, ngram=3)
    assert 0 <= sig < (1 << 64)
    assert len(sig.to_bytes(8, "big")) == 8
    # determinism
    assert sig == simhash_signature("hello world", f=64, ngram=3)


# --- interval algebra goldens (suffix_array.py doctests) ---


def test_merge_intervals_goldens():
    eight = [(0, 10), (1, 11), (2, 12), (3, 13), (4, 14), (5, 15), (6, 16), (7, 21)]
    assert merge_intervals(eight, "overlapping") == [(0, 21)]
    assert merge_intervals(eight, "longest") == eight
    assert merge_intervals([(0, 2), (2, 4), (4, 5)], "overlapping") == [(0, 5)]
    assert merge_intervals([(0, 4), (2, 4), (4, 5)], "longest") == [(0, 4), (4, 5)]
    assert merge_intervals([(0, 10)] * 5) == [(0, 10)]


def test_restore_golden():
    assert list(restore([(0, 10), (10, 20)], [(0, 5), (5, 10), (5, 15), (5, 19)])) == [
        (0, (0, 5)),
        (0, (5, 10)),
        (1, (0, 5)),
        (1, (0, 9)),
    ]


def test_restore_and_merge_goldens():
    assert restore_and_merge(
        [(0, 10), (10, 20)], [(0, 5), (5, 10), (12, 19)], 5, "longest"
    ) == ([[(0, 5), (5, 10)], [(2, 9)]], 17)
    assert restore_and_merge(
        [(0, 10), (10, 20)], [(0, 5), (5, 10), (12, 19)], 5, "overlapping"
    ) == ([[(0, 10)], [(2, 9)]], 17)


def test_clean_up_golden():
    assert clean_up("This is a test.", [(0, 4), (5, 7)]) == "  a test."


def test_xxh64_batch_bit_exact_all_lengths():
    """Vectorized xxh64 must equal the scalar implementation for every
    length through the 32-byte stripe boundary, all tail shapes, and
    multiple seeds."""
    import random

    import numpy as np

    from text_dedup_spark.kernel.xxh import xxh64_batch, xxh64_int

    rng = random.Random(5)
    datas = []
    for ln in list(range(0, 41)) * 10:
        datas.append(bytes(rng.randrange(256) for _ in range(ln)))
    for seed in (0, 42):
        got = xxh64_batch(datas, seed)
        ref = np.array([xxh64_int(d, seed) for d in datas], dtype=np.uint64)
        assert (got == ref).all()


def test_simhash_batch_bit_exact():
    import numpy as np

    from text_dedup_spark.kernel.simhash import (
        simhash_signature,
        simhash_signatures_batch,
    )

    texts = ["", "ab", "abc", "aaaa", "the quick brown fox", "ab" * 300]
    got = simhash_signatures_batch(texts, 64, 3)
    ref = np.array([simhash_signature(t, 64, 3) for t in texts], dtype=np.uint64)
    assert (got == ref).all()


def test_minhash_batch_bit_exact():
    import numpy as np

    from text_dedup_spark.kernel.minhash import (
        generate_permutations,
        minhash_signature,
        minhash_signatures_batch,
    )

    perms = generate_permutations(16)
    texts = ["", "one two", "a b c d e f g h i j", "x " * 50]
    got = minhash_signatures_batch(texts, 16, 3, perms, chunk_tokens=7)
    ref = np.stack([minhash_signature(t, 16, 3, perms) for t in texts])
    assert (got == ref).all()


def test_xxh3_128_batch_matches_scalar():
    """Vectorized XXH3-128 (all <=16-byte lanes + scalar fallback) is
    bit-exact vs the spec implementation."""
    import random

    from text_dedup_spark.kernel.xxh import xxh3_128_batch, xxh3_128_int

    rng = random.Random(5)
    datas = [bytes(rng.getrandbits(8) for _ in range(n)) for n in list(range(0, 41)) * 10]
    hi, lo = xxh3_128_batch(datas)
    for i, d in enumerate(datas):
        assert (int(hi[i]) << 64) | int(lo[i]) == xxh3_128_int(d), len(d)


def test_simhash128_batch_matches_scalar():
    import random

    from text_dedup_spark.kernel.simhash import (
        simhash128_signatures_batch,
        simhash_signature,
    )

    rng = random.Random(9)
    texts = ["", "ab", "hello world this is a test", "ünïcödé tëxt wíth áccents"]
    for _ in range(40):
        texts.append(
            " ".join(rng.choice(["alpha", "beta", "gamma", "x"]) for _ in range(rng.randint(0, 25)))
        )
    hi, lo = simhash128_signatures_batch(texts, 3)
    for i, t in enumerate(texts):
        assert ((int(hi[i]) << 64) | int(lo[i])) == simhash_signature(t, f=128, ngram=3), i
