"""spark-submit --py-files packaging: the north-rule deployment path,
exercised through a REAL spark-submit subprocess — the zip built by
scripts/package.py is the only way the executors can resolve
``hepcrawl_spark``, so a pass proves the archive is self-contained."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not available")
def test_spark_submit_py_files_crawl(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package import build

    zip_path = os.path.abspath(build(str(tmp_path / "dist")))
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "records")

    env = dict(os.environ)
    # the zip must be the ONLY source of the package
    env["PYTHONPATH"] = ""
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_crawl.py"),
            "--sf-dir", "/root/testdata/sf0.001",
            "--checkpoint", ckpt, "--out", out,
        ],
        cwd=str(tmp_path),   # NOT the repo dir — no accidental imports
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["records"] == 500
    assert summary["errors"] == 0
    assert summary["records_written"] == 500
    assert os.path.exists(os.path.join(ckpt, "manifest.json"))
