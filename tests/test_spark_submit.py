"""The north-rule deployment path, literally: `spark-submit
--py-files <pkg.zip> scripts/submit_job.py` with no repo on
PYTHONPATH and a cwd outside the repo — the zip must be the only
source of the package for driver AND executors."""

import glob
import os
import subprocess
import tempfile
import zipfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)


def test_spark_submit_py_files_pipeline(tmp_path):
    from yamlpyowl_spark.sources.corpus import corpus_rows

    zpath = str(tmp_path / "pkg.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, "yamlpyowl_spark")):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, REPO))

    src_dir, out = str(tmp_path / "src"), str(tmp_path / "out")
    os.makedirs(src_dir)
    rows = corpus_rows(n_forks=4)
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {n: list(c) for n, c in zip(("repo", "path", "commit", "lang", "content"), cols)}
        ),
        f"{src_dir}/src.parquet",
    )

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[8]",
            "--py-files",
            zpath,
            os.path.join(REPO, "scripts", "submit_job.py"),
            f"{src_dir}/src.parquet",
            out,
        ],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "new documents" in r.stdout
    assert len(glob.glob(f"{out}/triples/run_id=*")) == 1
    assert glob.glob(f"{out}/_progress/*.parquet")
