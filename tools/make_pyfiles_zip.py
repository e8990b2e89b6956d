"""Package snorkel_spark/ for ``spark-submit --py-files`` (north_rule:
"runs via spark-submit --py-files on multi-executor clusters").

Usage:  python tools/make_pyfiles_zip.py [out.zip]
Then:   spark-submit --py-files snorkel_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "snorkel_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "snorkel_spark.zip")
    print(build(out))
