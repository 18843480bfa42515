"""Build the --py-files artifact for spark-submit (north-rule run shape):

    python tools/package.py            # writes dist/exactextractr_spark.zip
    spark-submit --py-files dist/exactextractr_spark.zip \
        -m exactextractr_spark.cli --polys ... --tiles ... -o out.parquet

The zip contains only the package sources (no tests/tools), importable from
executors exactly as from the driver.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "exactextractr_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    p = build()
    names = zipfile.ZipFile(p).namelist()
    print(f"{p}: {len(names)} files, {os.path.getsize(p)} bytes")
