"""Serial, load-gated, best-of-N driver for bench.py at a fixed parallelism
(VERDICT r03 #2: the single-shot local[32] driver bench showed unexplained
1.7-2.5x swings on build/bm25 that serial load-gated evidence contradicted —
this tool produces the clean measurement).

Each repetition: record 1-min load average, run `python bench.py` as a fresh
process (fresh JVM — no cross-rep cache effects), parse its one JSON line,
append {load_at_start, queries...} to BENCH/local32_runs.jsonl.  Finally
print the per-op BEST-OF merge over reps whose load_at_start was below the
gate (default 2.0; CLAUDE.md: timings taken while another tenant bursts are
garbage — observed 3-4x inflation), plus how many reps were load-rejected.

Usage: python tools/bench_gate.py [reps=5] [cpus=32] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))


def load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_path = os.path.join(REPO, "BENCH", "local32_runs.jsonl")
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=sf_dir)
    settle = int(os.environ.get("SPARK_GRAFT_SETTLE_S", "45"))
    runs = []
    for i in range(reps):
        if i:  # let the 1-min load average shed OUR previous rep's threads,
            # otherwise load_at_start self-rejects every rep after the first
            time.sleep(settle)
        la = load1()
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        rec = {
            "rep": i, "load_at_start": la, "cpus": int(cpus), "sf": sf_dir,
            "wall_s": round(time.monotonic() - t0, 1),
            "rc": proc.returncode,
        }
        if line:
            parsed = json.loads(line[-1])
            rec["queries"] = parsed["queries"]
            rec["build_docs_per_sec"] = parsed.get("build_docs_per_sec")
            rec["bm25_queries_per_sec"] = parsed.get("bm25_queries_per_sec")
        with open(out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), file=sys.stderr, flush=True)
        runs.append(rec)
    # crashed reps (no JSON / rc != 0) are NOT load rejections — conflating
    # them would read a failing bench as host burstiness and an all-crashed
    # run would print a silent best-of-0
    crashed = [r for r in runs if not r.get("queries")]
    gated = [r for r in runs if r.get("queries")
             and r["load_at_start"] > LOAD_GATE]
    ok = [r for r in runs if r.get("queries")
          and r["load_at_start"] <= LOAD_GATE]
    best: dict[str, float] = {}
    for r in ok:
        for k, v in r["queries"].items():
            best[k] = min(best.get(k, float("inf")), v)
    print(json.dumps({
        "metric": f"best-of-{len(ok)} load-gated (gate {LOAD_GATE}) per-op sec",
        "cpus": int(cpus), "sf": sf_dir, "reps": reps,
        "load_rejected": len(gated),
        "crashed": len(crashed),
        "queries": best,
        "loads": [r["load_at_start"] for r in runs],
    }))
    if not ok:
        print("bench_gate: NO usable rep (crashed="
              f"{len(crashed)}, load_rejected={len(gated)})", file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
