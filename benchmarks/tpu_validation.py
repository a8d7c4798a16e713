"""One-shot TPU validation queue (round 5).

Runs, STRICTLY ONE TPU PROCESS AT A TIME (concurrent tunnel use wedges
the grant), with a per-step timeout and structured capture:

  1. pool probe (health canary)
  2. kernel attestation (sort/merge/reduce vs XLA at 2^22)
  3. bench.py headline
  4. analysis-phase benchmark (join vs binary lookup, sect path, comp)
  5. join stage decomposition + comp ablation
  6. golden CLI sweep ON the chip (auto policy, then KAT_TPU_JOIN=1)
  7. sharded-vs-single one-chip ratio
  8. large gz ingest exercise
  9. wide-key (k=33, 4-word) steady-state throughput
 10. BASELINE config 5 end-to-end (filter kmer -> filter seq -> comp)

Results land in TPU_VALIDATION_r05.json as they arrive (the file is
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
OUT = os.path.join(ROOT, "TPU_VALIDATION_r05.json")


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
                    help="comma list: probe,verify,bench,analysis,join,"
                         "golden,sharded,ingest,wide,bucketed,config5")
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

    if "analysis" not in skip:
        record("analysis", run_step(
            "analysis", [py, "benchmarks/analysis_bench.py"], 3600))

    if "join" not in skip:
        record("profile_join", run_step(
            "join", [py, "benchmarks/profile_join.py"], 3000))

    if "golden" not in skip:
        # the conftest honors KAT_TPU_TEST_PLATFORM: the SAME 15 golden
        # byte-parity configs, with the real chip doing counting+lookup
        for name, extra in (("golden_tpu_auto", {}),
                            ("golden_tpu_join", {"KAT_TPU_JOIN": "1"})):
            record(name, run_step(
                name, [py, "-m", "pytest", "tests/test_golden_parity.py",
                       "-q", "--tb=line", "-p", "no:cacheprovider"], 5400,
                {"KAT_TPU_TEST_PLATFORM": "axon", **extra}))

    if "wide" not in skip:
        record("wide_throughput", run_step(
            "wide", [py, "benchmarks/wide_bench.py"], 3600))

    if "bucketed" not in skip:
        record("bucketed_ab", run_step(
            "bucketed", [py, "benchmarks/bucketed_bench.py"], 4800))
        record("bucketed_profile", run_step(
            "bucketed", [py, "benchmarks/profile_bucketed.py"], 3600))

    if "config5" not in skip:
        record("config5", run_step(
            "config5", [py, "benchmarks/config5_bench.py"], 5400))

    if "sharded" not in skip:
        record("sharded_one_chip", run_step(
            "sharded", [py, "benchmarks/sharded_one_chip.py"], 2400))
        record("sharded_routed_lookup", run_step(
            "sharded", [py, "benchmarks/sharded_lookup_bench.py"], 3600))

    if "ingest" not in skip:
        record("ingest_large", run_step(
            "ingest", [py, "benchmarks/ingest_large.py"], 3600))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
