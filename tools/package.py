"""Build the spark-submit artifact (north_star: runs via
spark-submit --py-files at cluster scale).

    python tools/package.py            # -> dist/triplestore_spark.zip
    spark-submit --py-files dist/triplestore_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        your_job.py

The zip contains only the engine package (no tests/tools); __main__
entry for the CLI: `spark-submit --py-files dist/triplestore_spark.zip
$(python -c 'import triplestore_spark.cli as m; print(m.__file__)') ...`
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "triplestore_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "triplestore_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
