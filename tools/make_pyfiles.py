"""Build the --py-files archive for spark-submit deployment.

    python tools/make_pyfiles.py [dist/text_dedup_spark.zip]

Produces a deterministic zip of the ``text_dedup_spark`` package (sorted
member order, fixed timestamps — byte-identical across rebuilds of the
same tree, so cluster-side caches and checksum-pinned deploy configs stay
stable). Ship it with the thin launcher:

    spark-submit --py-files dist/text_dedup_spark.zip tools/submit_cli.py \\
        minhash --input s3://bucket/in.parquet --output s3://bucket/out \\
        --column caption --ngram_size 5 --num_perm 64 --threshold 0.7

(spark-submit takes a script path, not ``-m``; the launcher just imports
``text_dedup_spark.cli`` — resolved from the shipped zip on every
executor — and calls ``main()``.)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "text_dedup_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    members = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(members):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", f"{PKG}.zip")
    print(build(dest))
