#!/usr/bin/env python
"""Build the deployment artifact for `spark-submit --py-files`: a zip of
the dygiepp_spark package (north rule: "deploys via spark-submit
--py-files"; reference analogue: the pip/conda env its scripts assume,
/root/reference/scripts/train.sh invokes allennlp from an installed env).

    python scripts/make_pyfiles.py [out.zip]        # default dist/dygiepp_spark.zip
    spark-submit --py-files dist/dygiepp_spark.zip scripts/run_extraction.py ...

Source-only (.py) by design: the zip lands on every executor's sys.path,
and bytecode/caches would make the artifact non-deterministic.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out = out_path or os.path.join(REPO, "dist", "dygiepp_spark.zip")
    pkg = os.path.join(REPO, "dygiepp_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
                n += 1
    if n == 0:
        raise RuntimeError(f"no .py files found under {pkg}")
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
