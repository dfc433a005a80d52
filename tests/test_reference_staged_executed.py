"""Execute the FORK'S OWN staged 3-phase Spark pipeline and match it.

The fork's headline contribution over upstream text-dedup is the
checkpointed trio run via spark-submit (RunFullSet.sh:41-128):

  minhash_spark_onlyHash.py          (phase A: ids + band hashes -> CSV)
  minhash_spark_loadHashAndDedup.py  (phase B: edges -> components -> CSV)
  minhash_spark_onlyRemove.py        (phase C: split kept/removed JSON)

Earlier rounds executed the one-shot minhash_spark.py and the single-node
kernels; this file executes the staged trio itself — the actual scripts,
via runpy against the test SparkSession (their missing deps stubbed:
scipy.integrate.quad trapezoid, memory_profiler no-op, tqdm identity) —
on a planted multi-file multi-dataset corpus, including the PREV_ID
side-channel that carries consecutive ids across jobs
(onlyHash.py:307-309,381-382), and proves:

1. the id-stamped checkpoint (``<ds>_tmp_withid``) equals an independent
   reconstruction of lines2passage + row_number + PREV_ID semantics;
2. the fork's duplicate components (phase B CSV) induce the same cluster
   PARTITION as this engine's ``minhash_dedup`` assignments at the same
   (ngram, num_perm, b, r) on the same id-stamped corpus — partitions,
   not raw maps, because the reference's a==b halting rule can stop at a
   parent-pointer state on chain graphs (operators/cc.py:260-264);
3. phase C AS COMMITTED CANNOT RUN: minhash_spark_onlyRemove.py:213 reads
   ``rm_df`` before any assignment (and the frame it evidently meant to
   split was already overwritten on line 212) — executed here to pin the
   NameError, the same evidence class as the CC chain divergence;
4. with the minimal intent-restoring patch (split the joined frame into
   kept/removed instead of the undefined name), phase C's kept/removed
   JSON outputs equal this engine's survivor split to the row.
"""

from __future__ import annotations

import glob
import json
import os
import runpy
import sys
import types

import numpy as np
import pytest

from tests import _refstubs

REF = _refstubs.REFERENCE_ROOT

# planted passages per dataset/file: lists of LINES (no newlines); a
# passage's canonical text under lines2passage (onlyHash.py:239-263) is
# each line + '\n' concatenated.  Duplicates are planted within a file,
# across files of one dataset, and ACROSS datasets (ids only line up
# across jobs if PREV_ID works).
_BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a second line with plenty of alphanumeric tokens for shingling",
]
_NEAR = [
    "the quick brown fox jumps over the lazy cat near the river bank",
    "a second line with plenty of alphanumeric tokens for shingling",
]
_UNIQ = [
    ["completely unrelated passage about spark partitions and shuffles"],
    ["another singleton text block that matches nothing else in corpus"],
    ["third standalone paragraph mentioning tiles planes and codecs ok"],
    ["fourth lonely block where tokens overlap with no other passage"],
]

DATASETS = {
    "dsA": {
        "00.txt": [_BASE, _UNIQ[0], _NEAR],
        "01.txt": [_UNIQ[1], _BASE, _UNIQ[2]],
    },
    "dsB": {
        "00.txt": [_BASE, _UNIQ[3], _NEAR],
    },
}

CFG = dict(ngram_size=3, num_perm=16, b=8, r=2, threshold=0.7)


def _passage_text(lines):
    return "".join(line + "\n" for line in lines)


def _write_corpus(root):
    for ds, files in DATASETS.items():
        d = os.path.join(root, ds)
        os.makedirs(d, exist_ok=True)
        for fname, passages in files.items():
            # one blank line between passages AND a trailing blank line:
            # lines2passage (onlyHash.py:239-263) only flushes a block on
            # seeing a blank line, so a file not ending in one silently
            # drops its last passage
            body = "\n".join("\n".join(p) + "\n" for p in passages) + "\n"
            with open(os.path.join(d, fname), "w") as f:
                f.write(body)


def _expected_withid(root):
    """Independent reconstruction of phase A's id stamping: files sorted
    per dataset, passages in file order, __idconsec__ = 1..N continued
    across datasets in run order via PREV_ID."""
    rows = []
    nxt = 1
    for ds in ("dsA", "dsB"):
        for fname in sorted(DATASETS[ds]):
            for p in DATASETS[ds][fname]:
                rows.append((nxt, _passage_text(p)))
                nxt += 1
    return rows


def _install_exec_stubs():
    _refstubs.install_reference_stubs()
    if "scipy.integrate" not in sys.modules:
        s = types.ModuleType("scipy")
        si = types.ModuleType("scipy.integrate")

        def quad(f, lo, hi, n=4000):
            xs = np.linspace(lo, hi, n + 1)
            ys = np.array([f(x) for x in xs])
            return (float((ys[:-1] + ys[1:]).sum() * (hi - lo) / n / 2.0), 0.0)

        si.quad = quad
        s.integrate = si
        sys.modules["scipy"] = s
        sys.modules["scipy.integrate"] = si
    if "memory_profiler" not in sys.modules:
        m = types.ModuleType("memory_profiler")

        def profile(func=None, **_kw):
            return (lambda f: f) if func is None else func

        m.profile = profile
        sys.modules["memory_profiler"] = m


def _run_script(path, argv, monkeypatch, tmp_path):
    """runpy the reference script as __main__: cwd pinned to tmp_path (the
    PREV_ID side-channel lives in cwd), argv swapped, its 10 s debug
    sleeps elided."""
    import time as _time

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(_time, "sleep", lambda *_a: None)
    old = sys.argv
    sys.argv = [os.path.basename(path)] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    except SystemExit as e:  # the scripts sys.exit(0) on some paths
        assert not e.code
    finally:
        sys.argv = old


def _read_json_rows(outdir):
    rows = []
    for part in sorted(glob.glob(os.path.join(outdir, "part-*"))):
        with open(part) as f:
            rows.extend(json.loads(line) for line in f if line.strip())
    return rows


def _read_csv_pairs(outdir):
    pairs = []
    for part in sorted(glob.glob(os.path.join(outdir, "part-*"))):
        with open(part) as f:
            for line in f:
                if line.strip():
                    a, b = line.strip().split(",")
                    pairs.append((int(a), int(b)))
    return pairs


def _partition(edges, universe):
    """{frozenset cluster, ...} induced by (node, other) edges — the
    representation-independent view of a component map."""
    from text_dedup_spark.kernel.union_find import UnionFind

    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    clusters: dict = {}
    for n in universe:
        clusters.setdefault(uf.find(n), set()).add(n)
    return {frozenset(c) for c in clusters.values() if len(c) > 1}


@pytest.fixture(scope="module")
def staged_run(spark, tmp_path_factory):
    """Run phases A (twice: dsA then dsB, PREV_ID carrying over) and B
    once for the module; tests assert on the artifacts."""
    tmp_path = tmp_path_factory.mktemp("fork_staged")

    class _MP:
        """Module-scoped stand-in for the function-scoped monkeypatch."""

        def chdir(self, p):
            os.chdir(p)

        def setattr(self, obj, name, val):
            setattr(obj, name, val)

    mp = _MP()
    cwd = os.getcwd()
    _install_exec_stubs()
    _write_corpus(tmp_path)
    common = [
        "--column", "text",
        "--ngram_size", str(CFG["ngram_size"]),
        "--num_perm", str(CFG["num_perm"]),
        "--b", str(CFG["b"]),
        "--r", str(CFG["r"]),
        "--threshold", str(CFG["threshold"]),
    ]
    try:
        for ds in ("dsA", "dsB"):
            _run_script(
                f"{REF}/minhash_spark_onlyHash.py",
                ["--data_path", str(tmp_path / ds),
                 "--output", str(tmp_path / f"{ds}_hashes")] + common,
                mp, tmp_path)
        paths_file = tmp_path / "data_paths.txt"
        paths_file.write_text(f"{tmp_path}/dsA\n{tmp_path}/dsB\n")
        _run_script(
            f"{REF}/minhash_spark_loadHashAndDedup.py",
            ["--data_path_file", str(paths_file),
             "--output", str(tmp_path / "dedup_ids")] + common,
            mp, tmp_path)
    finally:
        os.chdir(cwd)
    return tmp_path


def test_phase_a_id_stamping_matches_reconstruction(staged_run):
    rows = []
    for ds in ("dsA", "dsB"):
        for fname in sorted(DATASETS[ds]):
            for r in _read_json_rows(str(staged_run / f"{ds}_tmp_withid" / fname)):
                rows.append((r["__idconsec__"], r["text"]))
    assert sorted(rows) == _expected_withid(str(staged_run))
    # PREV_ID carried the max id of dsA into dsB's job
    assert int((staged_run / "PREV_ID").read_text()) == len(rows)


def test_phase_b_components_match_engine_partition(spark, staged_run):
    from text_dedup_spark.config import MinHashConfig
    from text_dedup_spark.plans.minhash_pipeline import minhash_dedup

    fork_pairs = _read_csv_pairs(str(staged_run / "dedup_ids"))
    assert fork_pairs, "fork found no duplicate components"

    corpus = _expected_withid(str(staged_run))
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    cfg = MinHashConfig(
        ngram_size=CFG["ngram_size"], num_perm=CFG["num_perm"],
        threshold=CFG["threshold"], b=CFG["b"], r=CFG["r"])
    res = minhash_dedup(df, "text", cfg, id_col="doc_id")
    ours = [(r["doc_id"], r["component"]) for r in res.assignments.collect()]

    universe = [i for i, _ in corpus]
    assert _partition(fork_pairs, universe) == _partition(ours, universe)
    # the planted truth: every exact/near duplicate of _BASE clusters
    # together (5 copies across files and datasets), nothing else does
    texts = dict(corpus)
    (cluster,) = _partition(fork_pairs, universe)
    assert {texts[i] for i in cluster} == {
        _passage_text(_BASE), _passage_text(_NEAR)}
    assert len(cluster) == 5


def test_phase_c_as_committed_cannot_run(spark, staged_run, monkeypatch, tmp_path):
    """minhash_spark_onlyRemove.py:213 uses ``rm_df`` before assignment —
    the committed phase C crashes on its first input file. Executed (not
    inferred from reading): the documented-divergence evidence class."""
    with pytest.raises(NameError, match="rm_df"):
        _run_script(
            f"{REF}/minhash_spark_onlyRemove.py",
            ["--data_path", str(staged_run / "dsA"),
             "--dedup_ids", str(staged_run / "dedup_ids"),
             "--column", "text",
             "--num_perm", str(CFG["num_perm"]),
             "--b", str(CFG["b"]), "--r", str(CFG["r"])],
            monkeypatch, staged_run)


def test_phase_c_patched_split_matches_engine(spark, staged_run, monkeypatch,
                                              tmp_path):
    """Minimal intent-restoring patch (keep the joined frame, split it into
    null/non-null component halves) -> kept/removed JSON per input file;
    must equal this engine's survivor split on the same corpus."""
    src = open(f"{REF}/minhash_spark_onlyRemove.py").read()
    broken = (
        '        df = df.filter(F.col("component").isNull()).drop("__idconsec__", "component").persist(StorageLevel.MEMORY_AND_DISK) # cache()\n'
        '        rm_df = rm_df.filter(F.col("component").isNotNull()).drop("__idconsec__", "component").persist(StorageLevel.MEMORY_AND_DISK) # cache()\n'
    )
    fixed = (
        "        joined = df\n"
        '        df = joined.filter(F.col("component").isNull()).drop("__idconsec__", "component").persist(StorageLevel.MEMORY_AND_DISK)\n'
        '        rm_df = joined.filter(F.col("component").isNotNull()).drop("__idconsec__", "component").persist(StorageLevel.MEMORY_AND_DISK)\n'
    )
    assert broken in src, "reference onlyRemove.py changed; re-derive patch"
    patched = tmp_path / "onlyRemove_patched.py"
    patched.write_text(src.replace(broken, fixed))

    for ds in ("dsA", "dsB"):
        _run_script(
            str(patched),
            ["--data_path", str(staged_run / ds),
             "--dedup_ids", str(staged_run / "dedup_ids"),
             "--column", "text",
             "--num_perm", str(CFG["num_perm"]),
             "--b", str(CFG["b"]), "--r", str(CFG["r"])],
            monkeypatch, staged_run)

    kept, removed = [], []
    for ds in ("dsA", "dsB"):
        for fname in sorted(DATASETS[ds]):
            kept += [r["text"] for r in
                     _read_json_rows(str(staged_run / f"{ds}_dedup" / fname))]
            removed += [r["text"] for r in
                        _read_json_rows(str(staged_run / f"{ds}_rm" / fname))]

    from text_dedup_spark.config import MinHashConfig
    from text_dedup_spark.plans.minhash_pipeline import minhash_dedup

    corpus = _expected_withid(str(staged_run))
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    cfg = MinHashConfig(
        ngram_size=CFG["ngram_size"], num_perm=CFG["num_perm"],
        threshold=CFG["threshold"], b=CFG["b"], r=CFG["r"])
    res = minhash_dedup(df, "text", cfg, id_col="doc_id")
    ours_kept = sorted(r["text"] for r in res.kept.collect())
    ours_removed = sorted(r["text"] for r in res.removed.collect())
    assert sorted(kept) == ours_kept
    assert sorted(removed) == ours_removed
    assert len(kept) + len(removed) == len(corpus)


def _read_csv3(outdir):
    rows = set()
    for part in sorted(glob.glob(os.path.join(outdir, "part-*"))):
        with open(part) as f:
            for line in f:
                if line.strip():
                    a, b, c = line.strip().split(",")
                    rows.add((int(a), b, int(c)))
    return rows


def test_tmpid2hash_matches_onlyhash_bands(spark, staged_run, monkeypatch):
    """minhash_spark_tmpID2Hash.py (the one-file staged variant: re-hash an
    already id-stamped checkpoint) executed on dsB's withid JSON — its
    (band_idx, b64 hash, id) CSV must equal phase A's, proving the two
    fork entry points emit interchangeable band checkpoints."""
    _run_script(
        f"{REF}/minhash_spark_tmpID2Hash.py",
        ["--data_path", str(staged_run / "dsB"),
         "--output", str(staged_run / "dsB_rehash"),
         "--column", "text",
         "--ngram_size", str(CFG["ngram_size"]),
         "--num_perm", str(CFG["num_perm"]),
         "--b", str(CFG["b"]), "--r", str(CFG["r"]),
         "--threshold", str(CFG["threshold"])],
        monkeypatch, staged_run)
    a = _read_csv3(str(staged_run / "dsB_hashes"))
    b = _read_csv3(str(staged_run / "dsB_rehash"))
    assert a and a == b


def test_show_splithashesdiff_executes_zero_diff(spark, staged_run,
                                                 monkeypatch, capsys):
    """show_splitHashesDiff.py — the fork's own fidelity tool (split-run
    hashes vs a one-shot merged run; its merged baseline path is HARDCODED
    to /tmp/code/tiny_owt_hashes, show_splitHashesDiff.py:291). Executed:
    a merged copy of the corpus (files renamed so sorted order preserves
    the split runs' id order) hashed in a FRESH cwd (PREV_ID restarts at
    0) produces byte-identical band records — 'Differences: 0' — and its
    CC pass finds the same duplicate count as phase B."""
    import shutil

    merged = staged_run / "merged"
    merged.mkdir(exist_ok=True)
    renames = [("dsA", "00.txt", "a00.txt"), ("dsA", "01.txt", "a01.txt"),
               ("dsB", "00.txt", "b00.txt")]
    for ds, src, dst in renames:
        shutil.copyfile(staged_run / ds / src, merged / dst)
    fresh_cwd = staged_run / "merged_cwd"
    fresh_cwd.mkdir(exist_ok=True)
    os.makedirs("/tmp/code", exist_ok=True)
    common = [
        "--column", "text",
        "--ngram_size", str(CFG["ngram_size"]),
        "--num_perm", str(CFG["num_perm"]),
        "--b", str(CFG["b"]), "--r", str(CFG["r"]),
        "--threshold", str(CFG["threshold"]),
    ]
    _run_script(
        f"{REF}/minhash_spark_onlyHash.py",
        ["--data_path", str(merged),
         "--output", "/tmp/code/tiny_owt_hashes"] + common,
        monkeypatch, fresh_cwd)
    paths_file = staged_run / "data_paths.txt"  # dsA + dsB, written earlier
    _run_script(
        f"{REF}/show_splitHashesDiff.py",
        ["--data_path_file", str(paths_file),
         "--output", str(staged_run / "diff_out")] + common,
        monkeypatch, staged_run)
    out = capsys.readouterr().out
    assert "Differences:  0" in out
    n_dups = len(_read_csv_pairs(str(staged_run / "dedup_ids")))
    assert f"duplicate items found:  {n_dups}" in out
