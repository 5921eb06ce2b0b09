"""End-to-end CLI coverage: the `python -m cryo_spark` surface.

Drives main() in-process (same arg parsing, same code paths as the
shell) through the common operator lifecycle: freeze -> verify ->
describe -> collect-to-csv -> resume -> snapshots. The reference's CLI
is its primary interface; ours must hold up as one too.
"""

from __future__ import annotations

import csv
import json
import os

from cryo_spark.__main__ import main
from cryo_spark.fixtures import write_sequences


def test_cli_lifecycle(spark, tmp_path):
    inp = str(tmp_path / "in.parquet")
    write_sequences(inp, n=1_500, seed=11)
    out = str(tmp_path / "out")

    rc = main(["freeze", "--input", inp, "--output", out,
               "--target-tokens", "60000", "--master", "local[4]"])
    assert rc == 0
    report_dir = os.path.join(out, "report")
    reports = [json.load(open(os.path.join(report_dir, f)))
               for f in os.listdir(report_dir)]
    assert any(r.get("status") == "completed" for r in reports)

    assert main(["verify", "--output", out, "--master", "local[4]"]) == 0
    assert main(["describe", "--output", out, "--master", "local[4]"]) == 0

    # projected, filtered collect to csv
    dst = str(tmp_path / "dump")
    rc = main(["collect", "--input", out, "--columns", "doc_id,n_tok,source",
               "--filter", "source=web", "--format", "csv",
               "--output", dst, "--master", "local[4]"])
    assert rc == 0
    rows = []
    for f in os.listdir(dst):
        if f.endswith(".csv"):
            with open(os.path.join(dst, f)) as fh:
                rows.extend(list(csv.DictReader(fh)))
    assert rows and all(r["source"] == "web" for r in rows)

    # resume: second freeze encodes nothing new
    rc = main(["freeze", "--input", inp, "--output", out,
               "--target-tokens", "60000", "--master", "local[4]"])
    assert rc == 0
    # snapshots log lists both commits
    assert main(["snapshots", "--output", out]) == 0


def test_cli_remember_default(spark, tmp_path, monkeypatch):
    """--remember saves the command; a bare invocation replays it."""
    inp = str(tmp_path / "in.parquet")
    write_sequences(inp, n=500, seed=12)
    out = str(tmp_path / "out")
    monkeypatch.chdir(tmp_path)
    rc = main(["freeze", "--input", inp, "--output", out,
               "--target-tokens", "60000", "--master", "local[4]",
               "--remember"])
    assert rc == 0
    assert os.path.exists("remembered_command.json")
    # replay with no args: the remembered freeze resumes (no new chunks)
    assert main([]) == 0
