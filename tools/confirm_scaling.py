"""Reduced scaling confirmation: the headline local[2] -> local[8] pair only.

Re-measures the BENCH/BASELINE.md headline pair after a code change
without re-running the full 4-level protocol (~2h). Two interleaved
rounds, fresh JVM per invocation, best-of across all runs per level —
the protocol BENCH/BASELINE.md documents for this steal-wave-prone host.

Refuses to measure when the host itself is degraded: the sandbox's
memory bus intermittently collapses to <1.5 GB/s single-thread memcpy
(vs ~5 healthy), which makes every end-to-end number 4-8x slow and any
scaling ratio meaningless. A reading taken in that state looks exactly
like a code regression (we lost an afternoon to one); gate first.

Usage: python tools/confirm_scaling.py [--force] [--input PATH]
                                       [--label NAME]

``--input`` points the window at an alternate parquet sequences table
(e.g. the adversarial-skew fixture); ``--label`` tags the JSON record.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

MIN_MEMCPY_GBPS = 3.0


def main() -> int:
    cal = bench.host_calibration()
    print("host calibration:", cal, flush=True)
    if cal["host_memcpy_gbps"] < MIN_MEMCPY_GBPS and "--force" not in sys.argv:
        print(f"HOST DEGRADED (memcpy {cal['host_memcpy_gbps']} < "
              f"{MIN_MEMCPY_GBPS} GB/s) — refusing to measure; re-run when "
              "the bus recovers, or pass --force.")
        return 2

    label = None
    if "--input" in sys.argv:
        # resolve the override FIRST: bench.scaling_input() generates +
        # validates the 2.1B-token default cache, minutes of wasted CPU
        # when an alternate input is supplied
        inp = sys.argv[sys.argv.index("--input") + 1]
    else:
        inp = bench.scaling_input()
    if "--label" in sys.argv:
        label = sys.argv[sys.argv.index("--label") + 1]
    print("INPUT ready:", inp, flush=True)
    # bus-scaling snapshot BEFORE the windows (and again after): the
    # 2->8 memcpy ratio swings 3.7x..1.9x within a session, and a raw
    # window is only interpretable against the regime it ran in
    hw_pre = bench._hw_calibration(pairs=((2, 8),))
    print("hw 2->8 pre:", hw_pre, flush=True)
    levels: dict[int, list[int]] = {2: [], 8: []}
    for rnd in range(2):
        for n in (2, 8):
            out = subprocess.run(
                [sys.executable, "bench.py", "--encode-only",
                 "--master", f"local[{n}]", "--runs", "3" if n == 2 else "4",
                 "--input", inp,
                 "--target-tokens", str(bench.SCALING_TARGET_TOKENS)],
                capture_output=True, text=True, timeout=3600)
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            for d in os.listdir(bench.SHM_DIR):
                if d.startswith("out_"):
                    shutil.rmtree(f"{bench.SHM_DIR}/{d}", ignore_errors=True)
            levels[n].extend(rec["all_tokens_per_sec"])
            print(f"ROUND {rnd} local[{n}]: {rec['all_tokens_per_sec']}",
                  flush=True)
    best = {n: max(ts) for n, ts in levels.items()}
    eff = best[8] / best[2] / 4
    # post-window snapshot brackets the regime; blend uses the more
    # conservative (higher) of the two readings per metric so the
    # ceiling-relative figure is not inflated by a transiently bad probe
    hw_post = bench._hw_calibration(pairs=((2, 8),))
    scal = {k: max(hw_pre[k], hw_post[k]) for k in hw_pre}
    blended = (scal["cpu_2_8"] + scal["memcpy_2_8"]) / 2
    print("CONFIRM best:", best, "efficiency:", round(eff, 3),
          "hw 2->8 pre/post:", hw_pre, hw_post,
          "ceiling-relative:", round(best[8] / best[2] / blended, 3),
          flush=True)
    print(json.dumps({"best": best, "efficiency": round(eff, 3),
                      **({"label": label} if label else {}),
                      "input": inp,
                      "calibration": cal,
                      "hw_scaling_pre": hw_pre, "hw_scaling_post": hw_post,
                      "ceiling_relative":
                          round(best[8] / best[2] / blended, 3),
                      "runs": levels}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
