"""Build the --py-files artifact for spark-submit deployment.

    python scripts/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files olympian_spark.zip your_job.py

The zip contains the olympian_spark package only (no tests/bench); jobs
import it exactly as the repo does."""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "olympian_spark.zip")
    pkg = os.path.join(REPO, "olympian_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
