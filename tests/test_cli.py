"""CLI smoke tests: every subcommand drives the real operators end-to-end
over a tiny parquet corpus (same surface as the reference's spark-submit
scripts, SURVEY §2.1/§3.2)."""

from __future__ import annotations

import pytest

from text_dedup_spark import cli
from tests.conftest import synth_corpus


@pytest.fixture()
def corpus_path(spark, tmp_path):
    path = str(tmp_path / "corpus")
    spark.createDataFrame(
        synth_corpus(60, seed=7), "doc_id long, text string"
    ).write.mode("overwrite").parquet(path)
    return path


def _run(argv):
    # cli reuses the active pytest session and leaves it running
    cli.main(argv)


def test_cli_minhash_one_shot(spark, corpus_path, tmp_path):
    out = str(tmp_path / "out")
    _run([
        "minhash", "--input", corpus_path, "--output", out,
        "--column", "text", "--id_column", "doc_id",
        "--ngram_size", "3", "--num_perm", "16", "--threshold", "0.7",
    ])
    kept = spark.read.parquet(f"{out}/kept")
    clusters = spark.read.parquet(f"{out}/clusters")
    total = spark.read.parquet(corpus_path).count()
    assert kept.count() + clusters.count() == total


def test_cli_staged_hash_dedup_remove(spark, corpus_path, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    common = ["--column", "text", "--ngram_size", "3", "--num_perm", "16",
              "--threshold", "0.7", "--checkpoint_dir", ckpt]
    _run(["hash", "--input", corpus_path, "--dataset", "ds1", *common])
    _run(["dedup", "--checkpoint_dir", ckpt, "--datasets", "ds1"])
    _run(["remove", "--checkpoint_dir", ckpt, "--dataset", "ds1"])
    kept = spark.read.parquet(f"{ckpt}/ds1__kept")
    removed = spark.read.parquet(f"{ckpt}/ds1__removed")
    total = spark.read.parquet(corpus_path).count()
    assert kept.count() + removed.count() == total
    assert removed.count() > 0  # planted dups exist

    # incremental stage B: ds2 is a full copy of the corpus, so every ds2
    # row is an exact duplicate of a ds1 row -> all of ds2 is removed
    _run(["hash", "--input", corpus_path, "--dataset", "ds2",
          "--start_id", str(total), *common])
    _run(["dedup", "--checkpoint_dir", ckpt,
          "--datasets", "ds1", "--new_datasets", "ds2"])
    _run(["remove", "--checkpoint_dir", ckpt, "--dataset", "ds2"])
    assert spark.read.parquet(f"{ckpt}/ds2__removed").count() == total


def test_cli_exact_and_suffix(spark, corpus_path, tmp_path):
    out1 = str(tmp_path / "exact_out")
    _run(["exact", "--input", corpus_path, "--output", out1,
          "--column", "text", "--id_column", "doc_id"])
    n_exact = spark.read.parquet(out1).count()
    assert 0 < n_exact <= spark.read.parquet(corpus_path).count()

    # --normalize folds case/punct/whitespace into the dedup key: a
    # shouting clone of every doc dedups away entirely
    shout = str(tmp_path / "shout")
    d = spark.read.parquet(corpus_path)
    d.unionByName(
        d.selectExpr("doc_id + 1000 AS doc_id", "upper(text) || ' !!' AS text")
    ).write.mode("overwrite").parquet(shout)
    out_norm = str(tmp_path / "exact_norm_out")
    _run(["exact", "--input", shout, "--output", out_norm,
          "--column", "text", "--id_column", "doc_id", "--normalize"])
    assert spark.read.parquet(out_norm).count() == n_exact

    out2 = str(tmp_path / "suffix_out")
    _run(["suffix", "--input", corpus_path, "--output", out2,
          "--column", "text", "--id_column", "doc_id", "--k", "20",
          "--global_scope"])
    assert spark.read.parquet(out2).count() > 0


def test_cli_simhash(spark, corpus_path, tmp_path):
    out = str(tmp_path / "sim_out")
    _run(["simhash", "--input", corpus_path, "--output", out,
          "--column", "text", "--id_column", "doc_id"])
    kept = spark.read.parquet(f"{out}/kept")
    removed = spark.read.parquet(f"{out}/removed")
    assert kept.count() + removed.count() == spark.read.parquet(corpus_path).count()


def test_cli_staged_image(spark, tmp_path):
    from text_dedup_spark.sources.synth import images_table

    inp = str(tmp_path / "imgs")
    images_table(spark, 100, seed=42).write.mode("overwrite").parquet(inp)
    ckpt = str(tmp_path / "ickpt")
    _run(["image-features", "--input", inp, "--checkpoint_dir", ckpt,
          "--dataset", "d1", "--num_perm", "64", "--threshold", "0.7"])
    _run(["image-cluster", "--checkpoint_dir", ckpt, "--datasets", "d1"])
    _run(["image-apply", "--input", inp, "--checkpoint_dir", ckpt,
          "--dataset", "d1"])
    kept = spark.read.parquet(f"{ckpt}/d1__kept").count()
    removed = spark.read.parquet(f"{ckpt}/d1__removed").count()
    assert kept + removed == 100 and removed > 0


def test_cli_image_features_fmt_sniff(spark, tmp_path):
    """--fmt_source sniff repairs lying fmt labels before the decode pass:
    a corpus whose fmt column says 'png' for JPEG/TIFF bytes flag-skips
    those rows when trusted, but decodes all of them after sniffing."""
    import numpy as np

    from text_dedup_spark.sources.jpeg import encode_jpeg_baseline
    from text_dedup_spark.sources.png import encode_png
    from text_dedup_spark.sources.tiff import encode_tiff

    rng = np.random.RandomState(5)
    rows = []
    for i in range(12):
        px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        blob = [encode_png(px), encode_jpeg_baseline(px), encode_tiff(px)][i % 3]
        rows.append((f"im{i}", bytearray(blob), "png", f"caption {i}"))
    inp = str(tmp_path / "lying")
    spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, caption string"
    ).write.mode("overwrite").parquet(inp)

    flagged = str(tmp_path / "ck_flag")
    _run(["image-features", "--input", inp, "--checkpoint_dir", flagged,
          "--dataset", "d", "--phash_source", "pixels", "--undecodable", "flag"])
    n_bad = (
        spark.read.parquet(f"{flagged}/d__feats")
        .where("phash IS NULL").count()
    )
    assert n_bad == 8  # the jpeg and tiff rows flag-skip under the lie

    sniffed = str(tmp_path / "ck_sniff")
    _run(["image-features", "--input", inp, "--checkpoint_dir", sniffed,
          "--dataset", "d", "--phash_source", "pixels", "--undecodable", "flag",
          "--fmt_source", "sniff"])
    feats = spark.read.parquet(f"{sniffed}/d__feats")
    assert feats.where("phash IS NULL").count() == 0
    assert feats.count() == 12


def test_cli_text_paragraph_ingest(spark, tmp_path):
    from text_dedup_spark.sources.text import read_paragraphs

    f = tmp_path / "corpus.txt"
    f.write_text("para one line a\npara one line b\n\npara two\n\n\n  \n\npara three\n")
    df = read_paragraphs(spark, str(f))
    texts = sorted(r["text"].strip() for r in df.collect())
    assert texts == ["para one line a\npara one line b", "para three", "para two"]

    out = str(tmp_path / "exact_txt_out")
    _run(["exact", "--input", str(tmp_path), "--format", "text", "--output", out,
          "--column", "text"])
    assert spark.read.parquet(out).count() == 3


def test_read_input_json_csv(spark, tmp_path):
    from text_dedup_spark.sources.text import read_input

    rows = spark.createDataFrame([(1, "a b c"), (2, "d e f")], "doc_id long, text string")
    jp, cp = str(tmp_path / "j"), str(tmp_path / "c")
    rows.write.mode("overwrite").json(jp)
    rows.write.mode("overwrite").option("header", "true").csv(cp)
    assert {r["text"] for r in read_input(spark, jp, "json").collect()} == {"a b c", "d e f"}
    assert {r["text"] for r in read_input(spark, cp, "csv").collect()} == {"a b c", "d e f"}


def test_pyfiles_zip_self_contained(tmp_path):
    """Deploy surface (north rule: spark-submit --py-files): the built
    archive is deterministic and the package resolves from the zip ALONE
    in a clean interpreter — proving executors need nothing but the zip."""
    import subprocess
    import sys

    sys.path.insert(0, "/root/repo/tools")
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)

    z1 = build(str(tmp_path / "a.zip"))
    z2 = build(str(tmp_path / "b.zip"))
    b1, b2 = open(z1, "rb").read(), open(z2, "rb").read()
    assert b1 == b2  # byte-identical rebuilds (checksum-pinned deploys)

    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]);"
        "import text_dedup_spark.cli as c, text_dedup_spark.operators.lsh as l;"
        "assert c.__file__.startswith(sys.argv[1]), c.__file__;"
        "assert l.__file__.startswith(sys.argv[1]), l.__file__;"
        "print('zip-ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", probe, z1],
        capture_output=True, text=True, cwd=str(tmp_path), check=True,
    )
    assert "zip-ok" in out.stdout


def test_cli_line_dedup(spark, tmp_path):
    path = str(tmp_path / "lined")
    spark.createDataFrame(
        [(1, "keep me\nshared footer"), (2, "other\nshared footer")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(path)
    out = str(tmp_path / "out")
    _run(["line-dedup", "--input", path, "--output", out,
          "--column", "text", "--id_column", "doc_id"])
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["text"] == "keep me\nshared footer"
    assert rows[2]["text"] == "other" and rows[2]["n_lines_removed"] == 1


def test_cli_decontaminate(spark, corpus_path, tmp_path):
    bench_path = str(tmp_path / "bench")
    # benchmark = 5 corpus docs verbatim -> those docs must land in removed
    bench = spark.read.parquet(corpus_path).where("doc_id % 13 = 0").select("text")
    bench = bench.where("length(text) > 40")
    n_bench = bench.count()
    bench.write.mode("overwrite").parquet(bench_path)
    out = str(tmp_path / "out")
    _run(["decontaminate", "--input", corpus_path, "--benchmark", bench_path,
          "--output", out, "--column", "text", "--id_column", "doc_id",
          "--ngram_size", "5"])
    kept = spark.read.parquet(f"{out}/kept")
    removed = spark.read.parquet(f"{out}/removed")
    total = spark.read.parquet(corpus_path).count()
    assert kept.count() + removed.count() == total
    assert removed.count() >= n_bench  # at least the benchmark docs themselves
    assert "contaminated" not in kept.columns
    assert removed.where("n_contaminated_grams <= 0").count() == 0


def test_cli_quality_stats(spark, corpus_path, tmp_path):
    out = str(tmp_path / "out")
    _run(["quality-stats", "--input", corpus_path, "--output", out,
          "--column", "text", "--id_column", "doc_id"])
    df = spark.read.parquet(out)
    assert df.count() == spark.read.parquet(corpus_path).count()
    for c in ("n_tokens", "quality", "top_2gram_char_frac", "dup_line_frac"):
        assert c in df.columns


def test_cli_redact_pii(spark, tmp_path):
    path = str(tmp_path / "piid")
    spark.createDataFrame(
        [(1, "reach me at a.b@example.org or 10.1.2.3")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(path)
    out = str(tmp_path / "out")
    _run(["redact-pii", "--input", path, "--output", out,
          "--column", "text", "--id_column", "doc_id"])
    row = spark.read.parquet(out).collect()[0]
    assert row["text"] == "reach me at <EMAIL> or <IP>"
    assert row["n_email"] == 1 and row["n_ipv4"] == 1 and row["n_pii"] == 2


def test_cli_semdedup(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(31)
    rows = []
    for g in range(20):
        u = rng.normal(size=16)
        rows.append((g * 2, [float(x) for x in u]))
        if g < 8:  # planted scaled duplicate
            rows.append((g * 2 + 1, [float(x) for x in u * 2.0]))
    inp = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .write.mode("overwrite").parquet(inp)
    out = str(tmp_path / "sem_out")
    _run(["semdedup", "--input", inp, "--output", out,
          "--id_column", "vec_id", "--eps", "0.99", "--n_clusters", "4"])
    kept = spark.read.parquet(f"{out}/kept")
    removed = spark.read.parquet(f"{out}/removed")
    assert kept.count() == 20 and removed.count() == 8
    assert {r["vec_id"] for r in removed.collect()} == {g * 2 + 1 for g in range(8)}


def test_cli_semdedup_from_text(spark, corpus_path, tmp_path):
    out = str(tmp_path / "sem_text_out")
    _run(["semdedup", "--input", corpus_path, "--output", out,
          "--column", "text", "--id_column", "doc_id", "--from_text",
          "--eps", "0.95", "--n_clusters", "4"])
    kept = spark.read.parquet(f"{out}/kept")
    removed = spark.read.parquet(f"{out}/removed")
    total = spark.read.parquet(corpus_path).count()
    assert kept.count() + removed.count() == total
    assert removed.count() > 0  # planted exact dups embed identically
    assert set(kept.columns) == {"doc_id", "text"}  # original schema kept


def test_cli_image_dedup_one_shot(spark, tmp_path):
    from text_dedup_spark.sources.synth import images_table

    inp = str(tmp_path / "imgs1s")
    images_table(spark, 100, seed=42).write.mode("overwrite").parquet(inp)
    out = str(tmp_path / "imgout")
    _run(["image-dedup", "--input", inp, "--output", out,
          "--num_perm", "64", "--threshold", "0.7",
          "--phash_source", "pixels", "--pixel_embedding_eps", "0.995"])
    kept = spark.read.parquet(f"{out}/kept").count()
    assert 0 < kept < 100  # planted duplicate slots removed


def test_cli_bloom(spark, corpus_path, tmp_path):
    """`bloom` subcommand: incremental dedup vs a history corpus; output
    equals the plain anti-join truth on both sketch layouts."""
    hist_path = str(tmp_path / "hist")
    new_path = str(tmp_path / "new")
    corpus = spark.read.parquet(corpus_path)
    hist = corpus.where("doc_id % 3 != 0")
    hist.write.mode("overwrite").parquet(hist_path)
    novel = corpus.where("doc_id % 3 = 0")
    dups = hist.where("doc_id % 4 = 1").selectExpr("doc_id + 5000 AS doc_id", "text")
    novel.unionByName(dups).write.mode("overwrite").parquet(new_path)

    truth = {
        r["doc_id"]
        for r in spark.read.parquet(new_path)
        .join(hist.select("text"), "text", "left_anti")
        .collect()
    }
    for tag, extra in (("auto", []), ("sharded", ["--n_shards", "4"])):
        out = str(tmp_path / f"out_{tag}")
        _run(["bloom", "--input", new_path, "--history", hist_path,
              "--output", out, "--column", "text", *extra])
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got == truth, tag


def test_cli_ann_index_build_append_query(spark, tmp_path):
    """ann-index drive: build -> query -> append -> query; results equal
    the library calls on the loaded index (same sidecar trainers)."""
    import numpy as np

    from text_dedup_spark.operators.ann_index import (
        ivfpq_index_topk,
        load_ivfpq_index,
    )

    rng = np.random.RandomState(5)
    rows = [(i, rng.normal(size=16).astype(np.float32).tolist())
            for i in range(200)]
    corpus_path = str(tmp_path / "vecs")
    spark.createDataFrame(rows, ["vec_id", "embedding"]).write.parquet(corpus_path)
    idx_path = str(tmp_path / "annidx")
    qpath = str(tmp_path / "qs")
    spark.createDataFrame(rows[:3], ["vec_id", "embedding"]).write.parquet(qpath)

    common = ["--index_path", idx_path, "--n_centroids", "8", "--m", "8"]
    _run(["ann-index", "--action", "build", "--input", corpus_path, *common])
    out1 = str(tmp_path / "res1")
    _run(["ann-index", "--action", "query", "--input", qpath,
          "--output", out1, "--k", "5", "--n_probe", "3", *common])
    got = {tuple(r) for r in spark.read.parquet(out1).collect()}
    index = load_ivfpq_index(spark, idx_path)
    lib = {tuple(r) for r in ivfpq_index_topk(
        spark, index, spark.read.parquet(qpath), 5, n_probe=3).collect()}
    assert got == lib and len(got) == 15

    # append new vectors; a query AT one of them must now see its planted
    # exact twin (cosine 1.0 neighbor)
    twin = [(10_000, rows[7][1]), (10_001, rng.normal(size=16).astype(np.float32).tolist())]
    apath = str(tmp_path / "new")
    spark.createDataFrame(twin, ["vec_id", "embedding"]).write.parquet(apath)
    _run(["ann-index", "--action", "append", "--input", apath, *common])
    q2 = str(tmp_path / "q2")
    spark.createDataFrame([twin[0]], ["vec_id", "embedding"]).write.parquet(q2)
    out2 = str(tmp_path / "res2")
    _run(["ann-index", "--action", "query", "--input", q2,
          "--output", out2, "--k", "3", "--n_probe", "3",
          "--refine", "10", "--corpus", corpus_path, *common])
    res = spark.read.parquet(out2).collect()
    top = [r for r in res if r["rank"] == 1][0]
    assert top["neighbor_id"] == 7 and top["score"] == 1.0
