"""Smoke for the two-config differential harness (tools/differential.py).

Runs in a subprocess: the harness creates and STOPS its own Spark
sessions, which would kill the suite's shared SparkContext in-process
(the test_cli.py lesson).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_differential_quick_matrix_identical():
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "differential.py"),
         "--quick"],
        capture_output=True, text=True, timeout=570, cwd=REPO,
    )
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    assert "3/3 cases identical" in p.stdout
