"""Package tripwire_spark for `spark-submit --py-files`.

Zips the library (sources only) into build/tripwire_spark.zip and prints
the path, so a cluster launch is:

    spark-submit --py-files $(python tools/package_pyfiles.py) job.py

The zip contains the package at top level (importable as
``tripwire_spark``); executors need nothing else — every operator is
pure pyspark + numpy/pandas (cluster-standard deps).
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "build", "tripwire_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "tripwire_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
