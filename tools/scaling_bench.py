"""N-vs-4N scaling evidence (BASELINE.md §c): run bench.py at two local
parallelism levels on identical input and report throughput + efficiency.

A real cluster is unavailable in this sandbox, so — per the driver
instruction — the proxy is the same job at local[N] and local[4N].
Writes BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [sf_dir] [N] [4N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    r_lo = run_bench(sf_dir, lo)
    r_hi = run_bench(sf_dir, hi)

    def eff(metric: str) -> tuple[float, float, float]:
        a, b = r_lo[metric], r_hi[metric]
        return a, b, round((b / a) / (hi / lo), 3)

    b_lo, b_hi, b_eff = eff("build_docs_per_sec")
    q_lo, q_hi, q_eff = eff("bm25_queries_per_sec")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as fh:
        fh.write(f"""# BENCH/BASELINE — two-parallelism scaling evidence

Same job, same input ({sf_dir}, {r_lo['n_docs']} docs), two parallelism
levels (`local[{lo}]` vs `local[{hi}]`; the in-sandbox proxy for N vs 4N
executors per the north_rule). Fresh JVM per level via subprocess.

| workload | local[{lo}] | local[{hi}] | speedup | scaling efficiency (target ≥0.8·ideal is 1.0 at {hi//lo}×) |
|---|---|---|---|---|
| index build (docs/sec) | {b_lo} | {b_hi} | {round(b_hi / b_lo, 2)}× | {b_eff} |
| BM25 top-10 batch (queries/sec) | {q_lo} | {q_hi} | {round(q_hi / q_lo, 2)}× | {q_eff} |

Efficiency = (throughput_{hi} / throughput_{lo}) / ({hi}/{lo}).

Raw bench lines:

```json
{json.dumps(r_lo)}
{json.dumps(r_hi)}
```

Full per-op timings are in the `queries` field of each line.
""")
    print(f"wrote {path}")
    print(f"build eff={b_eff} query eff={q_eff}")


if __name__ == "__main__":
    main()
