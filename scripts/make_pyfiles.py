"""Package the engine for ``spark-submit --py-files`` (BASELINE.json:6,14).

Produces dist/spider_1_spark.zip containing the package tree; ship it
to a cluster with:

    spark-submit --master <cluster> \
        --py-files dist/spider_1_spark.zip \
        scripts/submit_crawl.py --frontier <parquet> --state-root <dir>
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "spider_1_spark.zip")
    pkg = os.path.join(REPO, "spider_1_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith((".py", ".xml")):  # + fairscheduler.xml
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
