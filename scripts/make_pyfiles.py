#!/usr/bin/env python
"""Build the deployment artifact for `spark-submit --py-files`: a zip of
the dygiepp_spark package (north rule: "deploys via spark-submit
--py-files"; reference analogue: the pip/conda env its scripts assume,
/root/reference/scripts/train.sh invokes allennlp from an installed env).

    python scripts/make_pyfiles.py [out.zip]        # default dist/dygiepp_spark.zip
    spark-submit --py-files dist/dygiepp_spark.zip scripts/run_extraction.py ...

Source-only (.py) by design: the zip lands on every executor's sys.path,
and bytecode/caches would make the artifact non-deterministic. The zip is
byte-deterministic for identical sources (r5 ADVICE): entries are walked
in sorted order and written via ZipInfo with a fixed timestamp, so the
artifact hash identifies the code version — rebuild ≡ re-release only
when a source byte changed (pinned by tests/test_spark_submit_deploy.py).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# any valid fixed DOS timestamp; 1980-01-01 is the zip epoch
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build(out_path: str | None = None) -> str:
    out = out_path or os.path.join(REPO, "dist", "dygiepp_spark.zip")
    pkg = os.path.join(REPO, "dygiepp_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                info = zipfile.ZipInfo(
                    os.path.relpath(full, REPO).replace(os.sep, "/"), date_time=_EPOCH
                )
                info.compress_type = zipfile.ZIP_DEFLATED
                info.external_attr = 0o644 << 16  # plain file, rw-r--r--
                with open(full, "rb") as src:
                    z.writestr(info, src.read())
                n += 1
    if n == 0:
        raise RuntimeError(f"no .py files found under {pkg}")
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
