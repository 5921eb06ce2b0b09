"""Rebuild BENCH/BASELINE.md from BENCH/scaling_runs.jsonl.

The scaling protocol records every raw run incrementally; this tool
recomputes the summary statistics (best/median per level, headline and
saturated efficiencies, ceiling-relative figures) with a fresh hardware
calibration and rewrites the report — useful when the report format
changed after a run, or to fold several runs' jsonl records together.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/scaling_runs.jsonl"
    levels: dict[int, list] = {}
    last = None
    for line in open(path):
        rec = json.loads(line)
        levels.setdefault(rec["level"], []).append(rec)
        last = rec
    runs = {n: [t for r in rs for t in r["all_tokens_per_sec"]]
            for n, rs in levels.items()}
    thr = {n: max(ts) for n, ts in runs.items()}
    med = {n: statistics.median(ts) for n, ts in runs.items()}
    eff = (thr[8] / thr[2]) / 4
    eff_sat = (thr[16] / thr[4]) / 4
    calib = bench._hw_calibration()
    blended = 0.5 * calib["cpu_4_16"] + 0.5 * calib["memcpy_4_16"]
    blended_2_8 = 0.5 * calib["cpu_2_8"] + 0.5 * calib["memcpy_2_8"]
    result = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "thr_localN_tokens_per_sec": round(thr[2]),
        "thr_local4N_tokens_per_sec": round(thr[8]),
        "median_efficiency": round((med[8] / med[2]) / 4, 3),
        "headline_efficiency_vs_hardware_ceiling": round(
            eff / max(blended_2_8 / 4, 1e-9), 3),
        "saturated_pair_thr_local4": round(thr[4]),
        "saturated_pair_thr_local16": round(thr[16]),
        "saturated_pair_efficiency": round(eff_sat, 3),
        "hardware_calibration": calib,
        "saturated_efficiency_vs_hardware_ceiling": round(
            eff_sat / max(blended / 4, 1e-9), 3),
        "sf": 0.1,
        "runs_per_level": {n: len(ts) for n, ts in runs.items()},
        "enc_bytes": last["enc_bytes"],
        "raw_bytes": last["raw_bytes"],
        "n_chunks": last["n_chunks"],
        "tokens": last["tokens"],
    }
    print(json.dumps(result))
    bench._write_baseline_md(result, runs)


if __name__ == "__main__":
    main()
