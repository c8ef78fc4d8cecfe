"""Build the --py-files artifact for cluster submission.

    python tools/build_pyfiles.py          # -> dist/rsmetacheck_spark.zip
    spark-submit --py-files dist/rsmetacheck_spark.zip main.py \
        --input s3://bucket/pages/ --output s3://bucket/out/ --resume

The zip contains only the package (no tests/tools); main.py ships as the
application file itself.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "rsmetacheck_spark.zip")
    pkg = os.path.join(ROOT, "rsmetacheck_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
