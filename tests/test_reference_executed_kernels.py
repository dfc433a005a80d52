"""Executed-reference parity for the SimHash and suffix-array kernels.

Companion to tests/test_reference_parity.py (which executes the
reference's MinHash+LSH+CC dataflow): here the reference's OWN
``simhash.py`` and ``suffix_array.py`` modules are imported from
/root/reference (absent third-party deps substituted — see
tests/_refstubs.py) and their actual functions run against this engine.

Stub risk is addressed head-on: the pure-Python ``bitarray`` substitute
is validated against an independent list-of-bits model on randomized
operation sequences AND against the reference's own embedded doctest
vectors (compute() golden 74633958390507528 = kernel/simhash.py's pinned
golden, hamming examples) before any parity claim uses it.

Reference citations: simhash.py:40-303 (_hamming_distance, Permutation,
_create_permutations, _unsigned_hash, compute, embed_func),
simhash.py:305-400 (__main__ bucket/union loop, replayed verbatim
driver-side), suffix_array.py:34-235 (merge_intervals, restore,
restore_and_merge).
"""

from __future__ import annotations

import random

import pytest

from tests._refstubs import bitarray_impl, load_reference_module

# Resolve bitarray through the SAME module object the reference holds
# after stub install (real package if present, stub otherwise) — direct
# stub-class imports could diverge from the reference's instances when a
# real bitarray is installed (ADVICE r3).
bitarray, frozenbitarray, _ba_util = bitarray_impl()
_int2ba, _ba2int = _ba_util.int2ba, _ba_util.ba2int
from text_dedup_spark.config import SimHashConfig
from text_dedup_spark.kernel import intervals as k_intervals
from text_dedup_spark.kernel import simhash as k_simhash
from text_dedup_spark.operators.simhash_dedup import simhash_assignments_from_text


# ---------------------------------------------------------------------------
# stub self-validation
# ---------------------------------------------------------------------------


class _ListBits:
    """Independent naive model of bitarray semantics: a plain list of bits,
    index 0 = most significant. Used only to validate the stub."""

    def __init__(self, bits):
        self.bits = list(bits)

    @classmethod
    def random(cls, rng, n):
        return cls(rng.randrange(2) for _ in range(n))

    def op(self, other, fn):
        return _ListBits(fn(a, b) for a, b in zip(self.bits, other.bits))

    def shift_left(self, n):  # toward index 0, zero-fill at the end
        return _ListBits(self.bits[n:] + [0] * min(n, len(self.bits)))

    def shift_right(self, n):
        return _ListBits([0] * min(n, len(self.bits)) + self.bits[: len(self.bits) - n])

    def to_stub(self):
        return bitarray("".join(map(str, self.bits)))


def test_bitarray_stub_matches_naive_model():
    rng = random.Random(1234)
    for _ in range(200):
        n = rng.randint(1, 130)
        a, b = _ListBits.random(rng, n), _ListBits.random(rng, n)
        sa, sb = a.to_stub(), b.to_stub()
        assert (sa & sb) == a.op(b, lambda x, y: x & y).to_stub()
        assert (sa | sb) == a.op(b, lambda x, y: x | y).to_stub()
        assert (sa ^ sb) == a.op(b, lambda x, y: x ^ y).to_stub()
        k = rng.randint(0, n)
        assert (sa << k) == a.shift_left(k).to_stub()
        assert (sa >> k) == a.shift_right(k).to_stub()
        assert sa.count(1) == sum(a.bits)
        assert sa.tolist() == a.bits
        lo, hi = sorted((rng.randint(0, n), rng.randint(0, n)))
        c = a.to_stub()
        c[lo:hi] = 1
        assert c.tolist() == a.bits[:lo] + [1] * (hi - lo) + a.bits[lo:][hi - lo :]
        # slice assignment to 0 — the reference's Permutation uses both
        # setall(0) and slice=1; cover the clearing direction too
        z = a.to_stub()
        z[lo:hi] = 0
        assert z.tolist() == a.bits[:lo] + [0] * (hi - lo) + a.bits[lo:][hi - lo :]
        # pack(): one bit per BYTE of input (reference compute() uses it)
        payload = bytes(rng.randrange(256) for _ in range(rng.randint(0, 9)))
        p = a.to_stub()
        p.pack(payload)
        assert p.tolist() == a.bits + [1 if byte else 0 for byte in payload]
        # tobytes at ANY length zero-pads the tail to a whole byte;
        # frombytes APPENDS onto a non-empty, possibly unaligned array
        raw = sa.tobytes()
        assert len(raw) == (n + 7) // 8
        rt = a.to_stub()  # non-empty target
        rt.frombytes(raw)
        expect_appended = a.bits + a.bits + [0] * (8 * len(raw) - n)
        assert rt.tolist() == expect_appended


def test_stub_reproduces_reference_doctests():
    ref = load_reference_module("simhash.py")
    assert ref._hamming_distance(bitarray("1010"), bitarray("1010")) == 0
    assert ref._hamming_distance(bitarray("1010"), bitarray("0010")) == 1
    # compute() doctest golden — also kernel/simhash.py's pinned golden
    res = ref.compute(
        [
            _int2ba(13352372148217134600, length=64),
            _int2ba(5020219685658847592, length=64),
        ]
    )
    assert _ba2int(res) == 74633958390507528
    assert len(ref._unsigned_hash(b"hello world", f=64)) == 64
    assert len(ref._unsigned_hash(b"hello world", f=128)) == 128


# ---------------------------------------------------------------------------
# kernel-level parity: reference functions vs kernel/simhash.py
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("f", [64, 128])
def test_unsigned_hash_and_signature_match_reference_execution(f):
    ref = load_reference_module("simhash.py")
    rng = random.Random(99)
    words = "spark dedup simhash bucket image caption pixel hash near".split()
    for _ in range(25):
        token = "".join(rng.choice(words) for _ in range(rng.randint(1, 4)))
        assert _ba2int(ref._unsigned_hash(token.encode(), f=f)) == (
            k_simhash.unsigned_hash(token.encode(), f=f)
        )
    for _ in range(15):
        content = " ".join(rng.choice(words) for _ in range(rng.randint(3, 40)))
        theirs = ref.embed_func(content, 0, f=f, ngram=3)["__signature__"]
        assert int.from_bytes(theirs, "big") == k_simhash.simhash_signature(
            content, f=f, ngram=3
        )


def _reference_simhash_partition(ref, docs, f, k, b, ngram):
    """Replay the reference __main__ clustering loop (simhash.py:325-400)
    driver-side: embed_func per row in dataset order, bucket dict keyed by
    (search_mask bytes, permuted-prefix bytes), hamming verify <= k,
    UnionFind union."""
    import sys

    UnionFind = sys.modules["text_dedup.utils"].UnionFind
    perms = ref._create_permutations(f, k=k, b=b)
    uf = UnionFind()
    buckets: dict = {}
    for idx, content in docs:
        emb = ref.embed_func(content, idx, f=f, ngram=ngram, permutations=perms)
        sig = frozenbitarray(buffer=emb["__signature__"])
        neighbors = set()
        for key in emb["__keys__"]:
            key = tuple(key)
            bucket = buckets.setdefault(key, [])
            for idy, other in bucket:
                if idy in neighbors:
                    continue
                if ref._hamming_distance(sig, other) <= k:
                    neighbors.add(idy)
            bucket.append((idx, sig))
        for idy in neighbors:
            uf.union(idx, idy)
    clusters: dict = {}
    for idx, _ in docs:
        clusters.setdefault(uf.find(idx), set()).add(idx)
    return {frozenset(m) for m in clusters.values() if len(m) > 1}


def _pairs(cluster_sets):
    out = set()
    for members in cluster_sets:
        ms = sorted(members)
        for i, x in enumerate(ms):
            for y in ms[i + 1 :]:
                out.add((x, y))
    return out


@pytest.mark.parametrize("f", [64, 128])
def test_simhash_clusters_match_reference_execution(spark, f):
    """North-rule parity for the SimHash tier: the reference's executed
    embed/bucket/verify/union loop and this engine's distributed
    simhash pipeline produce IDENTICAL duplicate-pair sets at the same
    (f, bit_diff, num_bucket, ngram)."""
    from tests.conftest import synth_corpus

    ref = load_reference_module("simhash.py")
    k, b, ngram = 3, 4, 3
    docs = synth_corpus(120, seed=11, dup_frac=0.35)

    theirs = _reference_simhash_partition(ref, docs, f, k, b, ngram)

    cfg = SimHashConfig(f=f, bit_diff=k, num_bucket=b, ngram=ngram)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    assignments = simhash_assignments_from_text(df, "text", cfg, id_col="doc_id")
    ours_map = {r["doc_id"]: r["component"] for r in assignments.collect()}
    clusters: dict = {}
    for node, comp in ours_map.items():
        clusters.setdefault(comp, {comp}).add(node)
    ours = {frozenset(m) for m in clusters.values() if len(m) > 1}

    ref_pairs, our_pairs = _pairs(theirs), _pairs(ours)
    assert ref_pairs, "reference found no duplicate pairs — corpus is broken"
    assert ref_pairs == our_pairs


# ---------------------------------------------------------------------------
# suffix-array interval functions: reference executed vs kernel/intervals.py
# ---------------------------------------------------------------------------


def _rand_segments(rng, length, count):
    segs = []
    for _ in range(count):
        s = rng.randint(0, max(0, length - 2))
        e = rng.randint(s + 1, min(length, s + rng.randint(1, 40)))
        segs.append((s, e))
    return sorted(set(segs))


@pytest.mark.parametrize("strategy", ["longest", "overlapping"])
def test_merge_intervals_matches_reference_execution(strategy):
    ref = load_reference_module("suffix_array.py")
    rng = random.Random(7)
    for _ in range(60):
        segs = _rand_segments(rng, 200, rng.randint(0, 25))
        theirs = ref.merge_intervals([slice(s, e) for s, e in segs], strategy)
        ours = k_intervals.merge_intervals(segs, strategy)
        assert [(s.start, s.stop) for s in theirs] == list(ours)


def test_restore_and_merge_matches_reference_execution():
    ref = load_reference_module("suffix_array.py")
    rng = random.Random(21)
    for _ in range(40):
        # document boundaries: contiguous non-overlapping cover of [0, L)
        cuts = sorted(rng.sample(range(1, 400), rng.randint(1, 8)))
        bounds = list(zip([0] + cuts, cuts + [400]))
        segs = _rand_segments(rng, 400, rng.randint(0, 30))
        k = rng.choice([1, 5, 15])
        for strategy in ("longest", "overlapping"):
            t_res, t_size = ref.restore_and_merge(
                [slice(s, e) for s, e in bounds],
                [slice(s, e) for s, e in segs],
                k,
                strategy,
            )
            o_res, o_size = k_intervals.restore_and_merge(bounds, segs, k, strategy)
            assert [[(s.start, s.stop) for s in doc] for doc in t_res] == [
                list(doc) for doc in o_res
            ]
            assert t_size == o_size


def test_clean_up_matches_reference_execution():
    ref = load_reference_module("suffix_array.py")
    rng = random.Random(33)
    for _ in range(40):
        text = "".join(rng.choice("abcdef gh") for _ in range(rng.randint(0, 120)))
        segs = _rand_segments(rng, max(1, len(text)), rng.randint(0, 6))
        theirs = ref.clean_up(text, [slice(s, e) for s, e in segs])
        assert theirs == k_intervals.clean_up(text, segs)


# ---------------------------------------------------------------------------
# exact-hash: execute the reference's actual __main__ (exact_hash.py:19-73)
# ---------------------------------------------------------------------------


def test_exact_hash_main_matches_engine(spark, tmp_path):
    """The reference's exact_hash.py has no importable functions — its whole
    pipeline is the __main__ block. Execute that block itself via runpy
    (datasets.load_dataset returns an in-memory Dataset shim; the real
    add_args/Timer/logger load from the reference) and compare its
    keep-first-in-order survivors with this engine's md5 exact_dedup
    (min-id survivor == first occurrence when ids are dataset order)."""
    import runpy
    import sys as _sys

    from tests import _refstubs
    from text_dedup_spark.operators.exact import exact_dedup

    _refstubs.install_reference_stubs()
    from tests.conftest import synth_corpus

    texts = [t for _, t in synth_corpus(150, seed=5, dup_frac=0.4)]
    _refstubs._DATASET_HOOK["ds"] = _refstubs.FakeDataset({"text": texts})
    _refstubs._DATASET_HOOK.pop("saved", None)
    argv = [
        "exact_hash",
        "--path", "in-memory",
        "--output", str(tmp_path / "out"),
        "--column", "text",
        "--batch_size", "64",
    ]
    old_argv = _sys.argv
    _sys.argv = argv
    try:
        runpy.run_path(
            f"{_refstubs.REFERENCE_ROOT}/exact_hash.py", run_name="__main__"
        )
    finally:
        _sys.argv = old_argv
    saved = _refstubs._DATASET_HOOK["saved"]
    assert saved.saved_to == str(tmp_path / "out")
    ref_survivors = saved.columns["text"]
    assert 0 < len(ref_survivors) < len(texts)  # dedup actually happened

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    ours = exact_dedup(df, "text", id_col="doc_id").orderBy("doc_id").collect()
    assert [r["text"] for r in ours] == ref_survivors


# ---------------------------------------------------------------------------
# bloom filter: execute the reference's actual __main__ (bloom_filter.py:19-80)
# ---------------------------------------------------------------------------


def test_bloom_filter_main_matches_engine_history_path(spark, tmp_path):
    """Execute the reference's bloom_filter.py __main__ via runpy with an
    exact-set ScalableBloomFilter stand-in (the error_rate -> 0 limit —
    the one surface on which the two implementations are DEFINED to agree:
    the reference accepts FP drops at its error rate, this engine's Bloom
    pre-filter routes every Bloom hit through an exact anti-join and so
    can never drop a novel row, operators/bloom.py). The reference keeps
    the first occurrence of each md5 in dataset order; the engine replays
    the same corpus as an incremental job — first half exact-deduped, the
    second half Bloom-pre-filtered against that history via
    ``dedup_against_history`` — and must keep the identical rows."""
    import runpy
    import sys as _sys

    from tests import _refstubs
    from text_dedup_spark.operators.bloom import dedup_against_history
    from text_dedup_spark.operators.exact import exact_dedup

    _refstubs.install_reference_stubs()
    from tests.conftest import synth_corpus

    texts = [t for _, t in synth_corpus(160, seed=7, dup_frac=0.45)]
    _refstubs._DATASET_HOOK["ds"] = _refstubs.FakeDataset({"text": texts})
    _refstubs._DATASET_HOOK.pop("saved", None)
    argv = [
        "bloom_filter",
        "--path", "in-memory",
        "--output", str(tmp_path / "out"),
        "--column", "text",
        "--batch_size", "48",
        "--error_rate", "1e-9",
    ]
    old_argv = _sys.argv
    _sys.argv = argv
    try:
        runpy.run_path(
            f"{_refstubs.REFERENCE_ROOT}/bloom_filter.py", run_name="__main__"
        )
    finally:
        _sys.argv = old_argv
    saved = _refstubs._DATASET_HOOK["saved"]
    ref_survivors = saved.columns["text"]
    assert 0 < len(ref_survivors) < len(texts)  # dedup actually happened

    half = len(texts) // 2
    h1 = spark.createDataFrame(
        list(enumerate(texts[:half])), ["doc_id", "text"])
    h2 = spark.createDataFrame(
        [(half + i, t) for i, t in enumerate(texts[half:])],
        ["doc_id", "text"])
    kept1 = exact_dedup(h1, "text", id_col="doc_id")
    # within-batch keep-first, then the Bloom-pre-filtered history check
    kept2 = dedup_against_history(
        exact_dedup(h2, "text", id_col="doc_id"), h1, "text", n_shards=0)
    ours = kept1.unionByName(kept2).orderBy("doc_id").collect()
    assert [r["text"] for r in ours] == ref_survivors

    # and the sharded (100-TB) layout keeps the identical rows
    kept2s = dedup_against_history(
        exact_dedup(h2, "text", id_col="doc_id"), h1, "text", n_shards=4)
    ours_s = kept1.unionByName(kept2s).orderBy("doc_id").collect()
    assert [r["text"] for r in ours_s] == ref_survivors


# ---------------------------------------------------------------------------
# single-node minhash: execute the reference's actual __main__ (minhash.py)
# ---------------------------------------------------------------------------


def test_minhash_single_node_main_matches_engine(spark, tmp_path):
    """Execute minhash.py's whole __main__ via runpy (Dataset shim gains
    ``map``; rich/scipy/bare-``utils`` stubbed — the script imports
    ``utils`` unqualified because it is launched from inside text_dedup/).
    Two things are pinned:

    1. EXECUTED FINDING — explicit ``--b/--r`` are dead flags: the branch
       that accepts them immediately overwrites both with
       ``optimal_param`` (minhash.py:234-236), so the script ALWAYS runs
       at the optimal parameters. The engine therefore compares at its
       own ``MinHashConfig.resolve()`` values and asserts they equal the
       (B, R) the executed reference chose.
    2. The reference's keep-cluster-root survivors (``uf.find(idx) ==
       idx``) equal ``minhash_dedup``'s kept rows row-for-row at the same
       shingle/permutation config — the single-node UnionFind path this
       time (no star rounds), complementing the executed minhash_spark
       parity."""
    import runpy
    import sys as _sys

    from tests import _refstubs
    from tests.test_reference_staged_executed import _install_exec_stubs
    from text_dedup_spark.config import MinHashConfig
    from text_dedup_spark.plans.minhash_pipeline import minhash_dedup

    _install_exec_stubs()
    _refstubs._install_rich()
    _refstubs._install_bare_utils()
    from tests.conftest import synth_corpus

    texts = [t for _, t in synth_corpus(140, seed=9, dup_frac=0.4)]
    _refstubs._DATASET_HOOK["ds"] = _refstubs.FakeDataset({"text": texts})
    _refstubs._DATASET_HOOK.pop("saved", None)
    argv = [
        "minhash",
        "--path", "in-memory",
        "--output", str(tmp_path / "out"),
        "--column", "text",
        "--ngram", "5",
        "--num_perm", "64",
        "--threshold", "0.7",
        "--batch_size", "50",
        # dead flags, passed deliberately to pin the finding:
        "--b", "3", "--r", "21",
    ]
    old_argv = _sys.argv
    _sys.argv = argv
    try:
        g = runpy.run_path(
            f"{_refstubs.REFERENCE_ROOT}/minhash.py", run_name="__main__"
        )
    finally:
        _sys.argv = old_argv

    cfg = MinHashConfig(ngram_size=5, num_perm=64, threshold=0.7).resolve()
    # finding 1: the explicit (3, 21) was ignored; the executed run chose
    # optimal_param's answer, which our resolve() reproduces exactly
    assert (g["B"], g["R"]) == (cfg.b, cfg.r) != (3, 21)

    saved = _refstubs._DATASET_HOOK["saved"]
    ref_survivors = saved.columns["text"]
    assert 0 < len(ref_survivors) < len(texts)
    ref_kept_ids = [i for i in range(len(texts)) if g["uf"].find(i) == i]
    assert [texts[i] for i in ref_kept_ids] == ref_survivors

    # EXECUTED FINDING 2 — short-doc semantics diverge WITHIN the
    # reference family: the single-node utils/tokenization.ngrams returns
    # the whole sequence as ONE gram when len < n (tokenization.py:34-35),
    # so each sub-ngram doc hashes its own text and stays distinct; the
    # spark scripts' own ngrams (minhash_spark.py:58-85, docstring even
    # says "[Almost same as the one in utils/tokenization.py]") yields NO
    # grams, so every short doc gets the all-MAX_HASH signature and they
    # mega-bucket together. This engine follows the SPARK semantics (the
    # north-star target, and what the executed minhash_spark parity pins).
    import re as _re

    shorts = [i for i, t in enumerate(texts)
              if len([x for x in _re.split("[^A-Za-z_0-9]", t) if x]) < 5]
    assert shorts and len({texts[i] for i in shorts}) == len(shorts)
    # the executed single-node reference kept every (textually distinct)
    # short doc...
    assert set(shorts) <= set(ref_kept_ids)

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    res = minhash_dedup(df, "text", cfg, id_col="doc_id")
    ours_ids = sorted(r["doc_id"] for r in res.kept.collect())
    # ...while the engine (spark semantics) collapses the shorts to their
    # min id; on every >=ngram-token doc the two agree row-for-row
    expected = sorted((set(ref_kept_ids) - set(shorts)) | {min(shorts)})
    assert ours_ids == expected
