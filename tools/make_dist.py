"""Package the engine for spark-submit --py-files (north rule).

    python tools/make_dist.py            # -> dist/go_scrapper_spark.zip
    spark-submit --py-files dist/go_scrapper_spark.zip jobs/crawl.py ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "go_scrapper_spark.zip")
    pkg = os.path.join(REPO, "go_scrapper_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
