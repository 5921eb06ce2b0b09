"""Disk-backed 10x scale proof: freeze -> kill -> resume -> decode-verify.

r3 verdict item 1: everything measured so far topped out at the 2.09
B-token scaling input on tmpfs. This script generates a ~20 B-token
input ON THE VIRTIO DISK, runs the full freeze with a mid-run SIGKILL
and a resume, decodes the output and verifies it against the input
with a distributed content hash, and records the four numbers the
proof needs: tokens/s, peak driver RSS (python driver ru_maxrss AND
the local-mode JVM VmHWM, reported separately — the JVM holds the
executors in local mode, so only the python number is the
driver-state bound), manifest size, and chunk-size spread
(max/median tokens per chunk).

Shuffle stays on /dev/shm, as in every scaling run (BENCH/BASELINE.md:
the sandbox has ONE virtio disk shared by all cores, while a real
cluster's shuffle space is per-executor NVMe); the DATA - input,
encoded output, manifests - lives on the disk.

Run:   python tools/bigproof.py --docs 61000000          # ~20B tokens
Also:  python tools/bigproof.py --docs 6400000           # 2B comparison
Emits one JSON line and appends it to BENCH/bigproof_runs.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHUFFLE_DIR = "/dev/shm/cryo_spark_bigproof"
TARGET_TOKENS = 1 << 21  # scaling-protocol chunk size


def _jvm_hwm_mb() -> float:
    """Peak RSS (VmHWM) of this process's java child, MB; 0 if none."""
    me = os.getpid()
    best = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if int(parts[3]) != me or "java" not in parts[1]:
                continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        best = max(best, int(line.split()[1]))
        except (OSError, ValueError, IndexError):
            continue
    return round(best / 1024, 1)


def _session(master: str):
    from cryo_spark.session import get_spark

    os.makedirs(f"{SHUFFLE_DIR}/local", exist_ok=True)
    return get_spark(app="cryo_bigproof", master=master,
                     shuffle_partitions=int(
                         master.split("[")[1].rstrip("]")),
                     extra_conf={"spark.local.dir": f"{SHUFFLE_DIR}/local"})


def child_freeze(args) -> None:
    """Freeze in ``--waves`` disjoint key-range slices.

    Each wave is one atomically committed run — the per-partition
    checkpoint the north rule asks for: a kill mid-wave loses ONLY the
    in-flight wave (uncommitted files are invisible by the snapshot
    contract), and a resume re-issues every wave, skipping committed
    ones entirely via the plan-scoped chunk resume.
    """
    from cryo_spark import engine

    spark = _session(args.master)
    t0 = time.perf_counter()
    step = (args.docs + args.waves - 1) // args.waves
    agg = {k: 0 for k in ("n_chunks", "n_encoded", "n_failed", "n_skipped",
                          "tokens", "enc_bytes", "raw_bytes")}
    encode_wall = 0.0
    for w in range(args.waves):
        lo, hi = w * step, min(args.docs, (w + 1) * step)
        if lo >= hi:
            break
        s = engine.freeze(spark, args.input, args.output,
                          target_tokens=TARGET_TOKENS,
                          keys=f"{lo}:{hi}")
        for k in agg:
            agg[k] += s.get(k, 0)
        encode_wall += s.get("encode_wall_s", 0.0)  # absent on skip-all
        print(f"WAVE {w} {json.dumps({k: s.get(k) for k in agg})}",
              flush=True)
    stats = agg
    stats["encode_wall_s"] = round(encode_wall, 1)
    stats["tokens_per_sec"] = round(
        stats["tokens"] / max(encode_wall, 1e-9))
    stats["wall_total_s"] = round(time.perf_counter() - t0, 1)
    stats["python_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
    stats["jvm_hwm_mb"] = _jvm_hwm_mb()
    spark.stop()
    print("CHILD_JSON " + json.dumps(stats), flush=True)


def child_verify(args) -> None:
    """Distributed content equality: input vs decoded output.

    count + token mass + sum of per-doc xxhash64(doc_id, tokens) mod p
    (bounded: 61M * 1e6 << 2^63). No join, two scans.
    """
    from pyspark.sql import functions as F

    from cryo_spark import engine

    spark = _session(args.master)

    def sig(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_tok").cast("long")).alias("tok_sum"),
            F.sum(F.pmod(F.xxhash64("doc_id", "tokens"),
                         F.lit(1_000_003)).cast("long")).alias("hash_sum"),
        ).first()
        return [r.n, r.tok_sum, r.hash_sum]

    t0 = time.perf_counter()
    got = sig(engine.decode_frozen(spark, args.output)
              .select("doc_id", "n_tok", "tokens"))
    decode_wall = round(time.perf_counter() - t0, 1)
    want = sig(spark.read.parquet(args.input)
               .select("doc_id", "n_tok", "tokens"))
    out = {
        "input_sig": want, "decoded_sig": got,
        "match": got == want, "decode_wall_s": decode_wall,
        "python_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1),
        "jvm_hwm_mb": _jvm_hwm_mb(),
    }
    spark.stop()
    print("CHILD_JSON " + json.dumps(out), flush=True)


def _child_cmd(mode: str, args) -> list[str]:
    return [sys.executable, os.path.abspath(__file__), "--child", mode,
            "--input", args.input, "--output", args.output,
            "--master", args.master, "--docs", str(args.docs),
            "--waves", str(args.waves)]


def _run_child(mode: str, args, timeout: int = 14400) -> dict:
    p = subprocess.run(_child_cmd(mode, args), capture_output=True,
                       text=True, timeout=timeout)
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_JSON "):
            return json.loads(line[len("CHILD_JSON "):])
    raise RuntimeError(
        f"child {mode} produced no JSON (rc={p.returncode}):\n"
        f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def _kill_midrun(args, min_snapshots: int, max_wait: int = 7200) -> int:
    """Start the wave freeze; SIGKILL it once >= min_snapshots waves have
    COMMITTED (snapshot log entries) — so the kill lands mid-wave with
    real committed checkpoints behind it."""
    p = subprocess.Popen(_child_cmd("freeze", args),
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL,
                         start_new_session=True)
    snap_root = os.path.join(args.output, "snapshots")
    t0 = time.time()
    seen = 0
    try:
        while time.time() - t0 < max_wait:
            if p.poll() is not None:  # finished before we killed it
                return -1
            try:
                seen = sum(1 for f in os.listdir(snap_root)
                           if f.endswith(".json"))
            except OSError:
                seen = 0
            if seen >= min_snapshots:
                break
            time.sleep(2)
    finally:
        if p.poll() is None:
            os.killpg(p.pid, signal.SIGKILL)
            p.wait()
    return seen


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=61_000_000)
    ap.add_argument("--base", default="/root/bigproof")
    ap.add_argument("--master", default="local[16]")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--gen-procs", type=int, default=16)
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--kill-after-snapshots", type=int, default=2)
    ap.add_argument("--keep", action="store_true",
                    help="keep input/output dirs after the proof")
    ap.add_argument("--child", choices=["freeze", "verify"])
    ap.add_argument("--input")
    ap.add_argument("--output")
    args = ap.parse_args()

    if args.child == "freeze":
        child_freeze(args)
        return
    if args.child == "verify":
        child_verify(args)
        return

    args.input = os.path.join(args.base, f"in_n{args.docs}")
    args.output = os.path.join(args.base, f"out_n{args.docs}")
    rec: dict = {"docs": args.docs, "master": args.master}

    # --- generate -----------------------------------------------------
    meta_path = os.path.join(args.input, "_gen_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            gen = json.load(f)
    else:
        from cryo_spark.fixtures import write_sequences_big

        shutil.rmtree(args.input, ignore_errors=True)
        t0 = time.perf_counter()
        total = write_sequences_big(args.input, args.docs, seed=args.seed,
                                    shards=args.shards,
                                    processes=args.gen_procs)
        gen = {"tokens": total, "gen_wall_s": round(
            time.perf_counter() - t0, 1)}
        with open(meta_path, "w") as f:
            json.dump(gen, f)
    rec["input_tokens"] = gen["tokens"]
    rec["input_bytes"] = sum(
        os.path.getsize(os.path.join(args.input, f))
        for f in os.listdir(args.input) if f.endswith(".parquet"))
    rec["gen_wall_s"] = gen.get("gen_wall_s")

    # --- freeze with mid-run kill, then resume ------------------------
    shutil.rmtree(args.output, ignore_errors=True)
    shutil.rmtree(SHUFFLE_DIR, ignore_errors=True)
    rec["waves"] = args.waves
    killed_at = _kill_midrun(args, args.kill_after_snapshots)
    rec["killed_after_snapshots"] = killed_at
    shutil.rmtree(SHUFFLE_DIR, ignore_errors=True)
    t0 = time.perf_counter()
    fz = _run_child("freeze", args)
    rec["resume_wall_s"] = round(time.perf_counter() - t0, 1)
    rec["freeze"] = {k: fz.get(k) for k in (
        "n_chunks", "n_encoded", "n_failed", "n_skipped", "tokens",
        "enc_bytes", "raw_bytes", "tokens_per_sec", "encode_wall_s",
        "wall_total_s", "python_rss_mb", "jvm_hwm_mb")}
    rec["resumed_work"] = bool(fz.get("n_skipped"))
    rec["compression_ratio"] = round(
        fz["enc_bytes"] / max(1, fz["raw_bytes"]), 4)

    # --- verify -------------------------------------------------------
    vf = _run_child("verify", args)
    rec["verify"] = vf
    if not vf["match"]:
        raise SystemExit(f"DECODE MISMATCH: {vf}")

    # --- manifest size + chunk spread ---------------------------------
    import duckdb

    man_glob = os.path.join(args.output, "manifest", "*", "*.parquet")
    rec["manifest_bytes"] = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(args.output, "manifest"))
        for f in fs)
    row = duckdb.sql(
        f"SELECT max(n_values), median(n_values), count(*) "
        f"FROM parquet_scan('{man_glob}') "
        "WHERE \"column\" = 'tokens' AND status = 'ok'").fetchone()
    rec["chunk_tokens_max"] = int(row[0])
    rec["chunk_tokens_median"] = float(row[1])
    rec["chunk_spread_max_over_median"] = round(row[0] / row[1], 3)
    rec["n_ok_chunks"] = int(row[2])

    if not args.keep:
        shutil.rmtree(args.output, ignore_errors=True)
    shutil.rmtree(SHUFFLE_DIR, ignore_errors=True)

    print(json.dumps(rec))
    with open(os.path.join(REPO, "BENCH", "bigproof_runs.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
