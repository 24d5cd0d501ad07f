"""Build the spark-submit --py-files archive.

    python scripts/package.py [dest_dir]    # default dist/

Produces ``<dest>/hepcrawl_spark.zip`` containing the package sources
(no tests, no caches) — the artifact a cluster job ships with
``spark-submit --py-files``.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(dest_dir: str = "dist") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "hepcrawl_spark")
    os.makedirs(dest_dir, exist_ok=True)
    out = os.path.join(dest_dir, "hepcrawl_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                arc = os.path.relpath(full, repo)
                zf.write(full, arc)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
