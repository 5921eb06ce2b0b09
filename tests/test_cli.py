"""End-to-end CLI coverage: the `python -m cryo_spark` surface.

Drives main() in a SUBPROCESS — the CLI stops its SparkSession when a
command finishes (correct for shell use), so running it in-process
would kill the test session's shared SparkContext and cascade failures
through every later test. One subprocess runs the whole lifecycle
(freeze -> verify -> describe -> collect-to-csv -> resume ->
snapshots -> --remember replay) against a single JVM.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import csv, json, os, sys
sys.path.insert(0, {repo!r})
from cryo_spark.__main__ import main
from cryo_spark.fixtures import write_sequences

tmp = sys.argv[1]
inp = os.path.join(tmp, "in.parquet")
write_sequences(inp, n=1500, seed=11)
out = os.path.join(tmp, "out")

assert main(["freeze", "--input", inp, "--output", out,
             "--target-tokens", "60000", "--master", "local[4]"]) == 0
reports = [json.load(open(os.path.join(out, "report", f)))
           for f in os.listdir(os.path.join(out, "report"))]
assert any(r.get("status") == "completed" for r in reports), reports

assert main(["verify", "--output", out, "--master", "local[4]"]) == 0
assert main(["describe", "--output", out, "--master", "local[4]"]) == 0

dst = os.path.join(tmp, "dump")
assert main(["collect", "--input", out, "--columns", "doc_id,n_tok,source",
             "--filter", "source=web", "--format", "csv",
             "--output", dst, "--master", "local[4]"]) == 0
rows = []
for f in os.listdir(dst):
    if f.endswith(".csv"):
        rows.extend(list(csv.DictReader(open(os.path.join(dst, f)))))
assert rows and all(r["source"] == "web" for r in rows), len(rows)

# resume: second freeze encodes nothing new; snapshots lists history
assert main(["freeze", "--input", inp, "--output", out,
             "--target-tokens", "60000", "--master", "local[4]"]) == 0
assert main(["snapshots", "--output", out]) == 0

# --remember saves the command; a bare invocation replays it
os.chdir(tmp)
assert main(["freeze", "--input", inp, "--output", out,
             "--target-tokens", "60000", "--master", "local[4]",
             "--remember"]) == 0
assert os.path.exists("remembered_command.json")
assert main([]) == 0
print("CLI-LIFECYCLE-OK")
"""


def test_cli_lifecycle_subprocess(tmp_path):
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO), str(tmp_path)],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert "CLI-LIFECYCLE-OK" in r.stdout
