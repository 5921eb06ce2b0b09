"""spark-submit --py-files smoke (the north rule's launch surface).

Runs the real `spark-submit` binary against jobs/freeze_job.py with the
package shipped as a --py-files zip, from a cwd OUTSIDE the repo, and
checks the printed FreezeSummary JSON + decode row count. This is the
exact invocation README.md documents for cluster use — the only
difference on a real cluster is the master URL.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_freeze_job(tmp_path):
    from cryo_spark.fixtures import write_sequences

    # the documented packaging step: zip the package for --py-files
    pkgdir = tmp_path / "pkg"
    shutil.copytree(f"{REPO}/cryo_spark", pkgdir / "cryo_spark")
    zpath = shutil.make_archive(str(tmp_path / "cryo_spark"), "zip",
                                root_dir=pkgdir)
    inp = str(tmp_path / "in.parquet")
    write_sequences(inp, n=2_000, seed=3)
    out = str(tmp_path / "out")
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]", "--py-files", zpath,
         f"{REPO}/jobs/freeze_job.py",
         "--input", inp, "--output", out,
         "--target-tokens", "100000", "--decode-verify"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_failed"] == 0
    assert summary["decoded_rows"] == 2_000
    # resumability through the same surface: a second submit encodes 0
    r2 = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]", "--py-files", zpath,
         f"{REPO}/jobs/freeze_job.py",
         "--input", inp, "--output", out, "--target-tokens", "100000"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    summary2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary2["n_encoded"] == 0
