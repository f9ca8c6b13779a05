#!/usr/bin/env python
"""Build lshdedup.zip for spark-submit --py-files.

Zips the locality_sensitive_hashing_spark package so executors import the
exact same kernels (hash family, band hashing, WAV decode) as the driver.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "locality_sensitive_hashing_spark"


def main(out: str = "lshdedup.zip") -> None:
    out_path = os.path.join(ROOT, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
