#!/usr/bin/env python
"""Build erx.zip for `spark-submit --py-files erx.zip main.py ...`.

Zips the `entity_resolution_pipeline_spark` package (source only) so every
executor can import it; main.py ships separately as the driver script.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "entity_resolution_pipeline_spark"


def main(out: str = "erx.zip") -> None:
    out_path = os.path.join(ROOT, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    names = zipfile.ZipFile(out_path).namelist()
    print(f"wrote {out_path} ({len(names)} modules)")


if __name__ == "__main__":
    main(*sys.argv[1:])
