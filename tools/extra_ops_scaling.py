"""Two-level (N vs 4N cores) scaling evidence for the round-4 extended
query surface (regex / approx / ci-substring / NEAR / wildcard /
more-like-this / collocations / PII / containment / field-collapse /
significant-terms / best-passage+snippets / suggest / spellcheck).

Same methodology as tools/scaling_bench.py (BENCH/BASELINE.md): serial
runs only (one Spark JVM at a time), 1-min load average recorded at each
rep and reps above the gate rejected, SPARK_GRAFT_SETTLE_S sleep between
JVMs so our own previous rep's threads shed from the load average,
per-op best-of merge across accepted reps, in-JVM min-of-R per op so the
first-collect plan/codegen constants don't count.  Indexes come from the
shared on-disk .index_cache (pre-warmed once, OUTSIDE the timed section
— both levels read the identical artifacts).

Driver:   python tools/extra_ops_scaling.py <sf_dir> <lo> <hi> [reps]
Worker:   python tools/extra_ops_scaling.py --worker <sf_dir> <cpus>

Appends per-rep records to BENCH/extra_ops_runs.jsonl (DELETE after any
engine change, like the other sidecars) and prints a markdown table for
BENCH/EXTRA.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOAD_GATE = 1.0
IN_JVM_REPS = 2

# entry names timed (each callable returns a DataFrame; we time .collect())
OPS = [
    "regex_search",
    "approx_locate",
    "substring_locate_ci",
    "near_search",
    "wildcard_search",
    "more_like_this",
    "collocations",
    "pii_redact",
    "dedup_containment",
    "collapse_topk",
    "significant_terms",
    "best_passage",
    "passage_snippets",
    "suggest_terms",
    "spellcheck",
    "facet_counts",
    "boolean_search",
    "ranked_snippets",
    "phrase_prefix",
]


def load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def worker(sf_dir: str, cpus: int) -> None:
    import __spark_entry__ as entry
    from full_text_index_spark.session import get_spark

    spark = get_spark("extra-ops-bench", cpus=cpus,
                      shuffle_partitions=max(cpus, 2))
    qs = entry.queries()
    # untimed warmup: materialize both cached indexes + pay codegen/Arrow
    # worker spin-up once (per-JVM constants, amortized on a real cluster)
    qs["term_count"](spark, sf_dir).collect()
    qs["substring_count"](spark, sf_dir).collect()
    out: dict[str, float] = {}
    for name in OPS:
        fn = qs[name]
        best = float("inf")
        for _ in range(IN_JVM_REPS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"cpus": cpus, "sf": sf_dir, "queries": out}))


def main() -> None:
    if sys.argv[1:2] == ["--worker"]:
        worker(sys.argv[2], int(sys.argv[3]))
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    settle = int(os.environ.get("SPARK_GRAFT_SETTLE_S", "45"))
    out_path = os.path.join(REPO, "BENCH", "extra_ops_runs.jsonl")
    # reload prior accepted reps (same sidecar-accumulation contract as
    # scaling_bench/query_scaling: reps accumulate across invocations of
    # IDENTICAL engine code — delete the sidecar after any engine change)
    runs: list[dict] = []
    if os.path.exists(out_path):
        with open(out_path) as fh:
            for line in fh:
                rec = json.loads(line)
                if rec.get("sf") == sf_dir and rec.get("cpus") in (lo, hi):
                    runs.append(rec)
    first = True
    for rep in range(reps):
        for cpus in (lo, hi):  # interleaved, like scaling_bench
            if not first:
                time.sleep(settle)
            first = False
            la = load1()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 sf_dir, str(cpus)],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("{")]
            rec = {"rep": rep, "cpus": cpus, "load_at_start": la,
                   "rc": proc.returncode, "sf": sf_dir}
            if line:
                rec["queries"] = json.loads(line[-1])["queries"]
            elif proc.returncode:
                rec["err"] = proc.stderr[-500:]
            with open(out_path, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), file=sys.stderr, flush=True)
            runs.append(rec)
    best: dict[int, dict[str, float]] = {lo: {}, hi: {}}
    rejected = 0
    for r in runs:
        if not r.get("queries"):
            continue
        if r["load_at_start"] > LOAD_GATE:
            rejected += 1
            continue
        for k, v in r["queries"].items():
            cur = best[r["cpus"]].get(k, float("inf"))
            best[r["cpus"]][k] = min(cur, v)
    lines = [
        f"| op | {lo} core s | {hi} cores s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for op in OPS:
        a, b = best[lo].get(op), best[hi].get(op)
        if not a or not b:
            continue
        sp = a / b
        eff = sp / (hi / lo)
        lines.append(f"| {op} | {a:.2f} | {b:.2f} | {sp:.2f}x | {eff:.2f} |")
    print(json.dumps({"best": best, "load_rejected": rejected,
                      "loads": [r["load_at_start"] for r in runs]}))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
