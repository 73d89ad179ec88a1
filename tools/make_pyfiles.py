"""Build the --py-files artifact: a zip of the gate_spark package.

    python tools/make_pyfiles.py [dest.zip]   # default dist/gate_spark.zip

The zip is importable directly from sys.path (package dir at the zip
root), which is exactly how spark-submit distributes it to the driver
and every executor's PYTHONPATH.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(dest: str | None = None) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = dest or os.path.join(repo, "dist", "gate_spark.zip")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    pkg = os.path.join(repo, "gate_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, repo))
    return dest


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
