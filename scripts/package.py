"""Build comm_detect_spark.zip for `spark-submit --py-files` (the north
rule's launch path; see jobs/run_algorithm.py).

Usage: python scripts/package.py [--out comm_detect_spark.zip]
"""

from __future__ import annotations

import argparse
import os
import zipfile


def build_zip(out: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "comm_detect_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root)
                zf.write(full, rel)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="comm_detect_spark.zip")
    args = ap.parse_args()
    path = build_zip(args.out)
    print(path)


if __name__ == "__main__":
    main()
