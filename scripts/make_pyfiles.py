"""Build the --py-files zip for spark-submit deployments.

Usage: python scripts/make_pyfiles.py /tmp/ife_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(dest: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "image_feature_extraction_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, repo)
                    zf.write(full, rel)
    return dest


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ife_spark.zip"
    print(build(dest))
