"""One-shot round-3 TPU validation queue.

Runs, STRICTLY ONE TPU PROCESS AT A TIME (concurrent tunnel use wedges
the grant), with a per-step timeout and structured capture:

  1. pool probe (health canary)
  2. kernel attestation (sort/merge/reduce vs XLA at 2^22)
  3. bench.py headline (default config: static-q build + LSM runs)
  4. bench.py A/B: KAT_TPU_SORT_STATIC_Q=0 (no static build)
  5. bench.py A/B: KAT_TPU_LSM_RUNS=0   (fused per-flush merge)
  6. sharded-vs-single one-chip ratio
  7. large gz ingest exercise

Results land in TPU_VALIDATION_r03.json as they arrive (the file is
rewritten after every step, so a mid-queue tunnel death still leaves
everything measured so far).  Steps that fail record their error and the
queue continues.

Usage: python benchmarks/tpu_validation.py [--skip probe,ab ...]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "TPU_VALIDATION_r03.json")


def run_step(name: str, argv: list[str], timeout: float,
             env_extra: dict | None = None) -> dict:
    env = dict(os.environ)
    env.update(env_extra or {})
    t0 = time.time()
    proc = subprocess.Popen(argv, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, env=env, text=True,
                            cwd=ROOT, start_new_session=True)
    try:
        out, err = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        proc.wait()
        return {"error": f"timeout after {timeout:.0f}s",
                "seconds": round(time.time() - t0, 1)}
    rec: dict = {"rc": proc.returncode,
                 "seconds": round(time.time() - t0, 1)}
    for line in reversed(out.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                rec["result"] = json.loads(line)
                break
            except json.JSONDecodeError:
                pass
        elif line and "result" not in rec:
            rec.setdefault("last_line", line)
    if proc.returncode != 0 and "result" not in rec:
        rec["error"] = (err or out)[-500:]
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="",
                    help="comma list: probe,verify,bench,ab,sharded,"
                         "ingest")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    py = sys.executable
    results: dict = {"started": time.strftime("%Y-%m-%d %H:%M:%S")}

    def record(name, rec):
        results[name] = rec
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(f"== {name}: "
              f"{json.dumps(rec.get('result', rec))[:300]}", flush=True)

    if "probe" not in skip:
        rec = run_step("probe", [py, "benchmarks/probe_pool.py"], 300)
        record("probe", rec)
        if rec.get("rc") != 0 or \
                "HEALTHY" not in str(rec.get("last_line", "")):
            print("pool probe not healthy — tunnel down or degraded; "
                  "continuing anyway (bench has its own watchdog)",
                  flush=True)

    if "verify" not in skip:
        record("verify_kernels",
               run_step("verify", [py, "benchmarks/verify_kernels_tpu.py"],
                        1200))

    # bench's own watchdog envelope is 2400s/attempt + one retry; the
    # outer bound must exceed it so the structured failure JSON (or a
    # slow success) is never SIGKILLed mid-retry
    BENCH_T = 5200
    if "bench" not in skip:
        record("bench_default", run_step(
            "bench", [py, "bench.py"], BENCH_T))

    if "ab" not in skip:
        record("bench_no_static_q", run_step(
            "bench", [py, "bench.py"], BENCH_T,
            {"KAT_TPU_SORT_STATIC_Q": "0",
             "KAT_TPU_BENCH_NO_VERIFY": "1"}))
        record("bench_no_lsm", run_step(
            "bench", [py, "bench.py"], BENCH_T,
            {"KAT_TPU_LSM_RUNS": "0", "KAT_TPU_BENCH_NO_VERIFY": "1"}))

    if "sharded" not in skip:
        record("sharded_one_chip", run_step(
            "sharded", [py, "benchmarks/sharded_one_chip.py"], 2400))

    if "ingest" not in skip:
        record("ingest_large", run_step(
            "ingest", [py, "benchmarks/ingest_large.py"], 3600))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
