#!/usr/bin/env python3
"""Build the ``--py-files`` archive for cluster submission.

The deployment unit the north rule names — ``spark-submit --py-files
dist/docling_serve_spark.zip jobs/extract.py`` — is a single zip with
the package at the archive root, importable on every executor without
any install step (the package is pure Python; reference deploys a
container image instead, reference:Dockerfile:1).

Usage:
  python jobs/package.py [dist/docling_serve_spark.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str, repo_root: str = REPO_ROOT) -> str:
    """Zip ``docling_serve_spark/**/*.py`` with repo-relative arcnames
    so ``import docling_serve_spark`` resolves from the archive root.
    Deterministic: fixed timestamp, sorted entries (so re-builds of an
    unchanged tree are byte-identical and cacheable by spark-submit's
    file-upload dedup)."""
    pkg = os.path.join(repo_root, "docling_serve_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, repo_root), full))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO_ROOT, "dist", "docling_serve_spark.zip"
    )
    print(build_zip(out))
