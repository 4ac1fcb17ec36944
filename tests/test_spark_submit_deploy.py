"""REAL spark-submit --py-files deployment check (north rule: "deploys via
spark-submit --py-files"): package the engine with scripts/make_pyfiles.py,
then launch the actual `spark-submit` binary from a scratch directory with
the repo stripped from every import path — the pipeline must run end-to-end
with `dygiepp_spark` importable ONLY from the zip, exactly as on a cluster
where executors receive the artifact and nothing else."""

import os
import shutil
import subprocess

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not on PATH"
)
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_pyfiles", os.path.join(REPO, "scripts", "make_pyfiles.py")
    )
    mp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mp)
    zip_path = mp.build(str(tmp_path / "dygiepp_spark.zip"))

    # run from scratch dir with a copied entrypoint: sys.path[0] becomes the
    # scratch dir (NOT the repo), so the zip is the only import source
    script = str(tmp_path / "run_extraction.py")
    shutil.copyfile(os.path.join(REPO, "scripts", "run_extraction.py"), script)
    out_dir = str(tmp_path / "kg")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            script,
            "--turns", "synth:6",
            "--out", out_dir,
            "--n-partitions", "8",
            "--run-id", "deploy-test",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # the run must have produced canonical triples — verified engine-free
    # (output is hive-partitioned by pred, hence the */ glob + hive flag)
    con = duckdb.connect()
    glob = f"{out_dir}/data/canonical/*/*.parquet"
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{glob}', hive_partitioning=1)"
    ).fetchone()[0]
    assert n > 0
    cols = {
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{glob}', hive_partitioning=1)"
        ).fetchall()
    }
    assert {"subj_canonical", "pred", "obj_canonical"} <= cols
