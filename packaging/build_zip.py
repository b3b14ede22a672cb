#!/usr/bin/env python
"""Build kgforge.zip for spark-submit --py-files (north_rule submission shape).

Usage:  python packaging/build_zip.py [out.zip]
Then:   spark-submit --py-files kgforge.zip packaging/submit_job.py \
            --pages s3://bucket/pages --out s3://bucket/graph \
            --ontology ontology.json
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "kgforge.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "kgforge")
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith((".py", ".json")):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
