"""Query-path N-vs-4N scaling: batched BM25 over a PREBUILT index.

Isolates the query workload from build noise: the index (layout is
parallelism-independent — fixed n_segments) is built once and reused at
both levels; each JVM times the batch min-of-3 after a warmup pass, levels
interleave across repetitions, and every run is load-gated.  A larger
batch than the headline bench (default 6000 distinct queries) is used so
the per-batch constants (plan, broadcast, collect — ~1-2 s regardless of
batch size) don't dominate the measurement: the north_rule's metric is
batched queries/sec, and batch size is a workload parameter.

Usage: python tools/query_scaling.py [lo] [hi] [n_docs] [nq] [reps]
Appends per-run records to BENCH/query_runs.jsonl and prints a summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
from full_text_index_spark.build import build_index, prepare_corpus
from full_text_index_spark.index import InvertedIndex
from full_text_index_spark.query import bm25_topk
from full_text_index_spark.session import get_spark
import bench as benchmod
import os, json

cpus = int(sys.argv[1]); nq = int(sys.argv[2])
corpus = sys.argv[3]; idx_root = sys.argv[4]
spark = get_spark(f"qscale-{{cpus}}", cpus=cpus, shuffle_partitions=cpus)
docs = prepare_corpus(spark.read.parquet(corpus))
# completion sentinel, NOT meta.json: build_index writes meta mid-build
# (before the postings pack), so a killed build would leave a partial
# index that a meta-existence check silently reuses.  The sentinel is
# written only after build_index returns; delete .bench_cache after any
# postings-format change (same rule as the BENCH sidecars).
done_marker = os.path.join(idx_root, ".qscale_build_complete")
if not os.path.exists(done_marker):
    docs.cache()
    build_index(spark, docs, idx_root, n_segments=32, block_size=128,
                resume=False)
    with open(done_marker, "w") as fh:
        fh.write("ok")
idx = InvertedIndex.open(spark, idx_root)
qdf = benchmod._query_batch(spark, docs, n=nq)
qdf.cache(); n_q = qdf.count()
bm25_topk(idx, qdf, k=10).collect()   # warmup: codegen + worker spin-up
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    bm25_topk(idx, qdf, k=10).collect()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"cpus": cpus, "nq": n_q, "batch_s": round(best, 3),
                   "qps": round(n_q / best, 1)}}), flush=True)
"""


def main() -> None:
    from tools.scaling_bench import ensure_corpus, wait_quiet

    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 240_000
    nq = int(sys.argv[4]) if len(sys.argv) > 4 else 6_000
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3

    corpus = ensure_corpus(n_docs)
    idx_root = os.path.join(REPO, ".bench_cache", f"qscale_idx{n_docs}")
    child = _CHILD.format(repo=REPO)
    sidecar = os.path.join(REPO, "BENCH", "query_runs.jsonl")
    runs = {lo: [], hi: []}
    if os.path.exists(sidecar):
        with open(sidecar) as fh:
            for line in fh:
                rec = json.loads(line)
                if rec.get("config") == [lo, hi, n_docs, nq]:
                    runs[rec["cpus"]].append(rec)
    for _ in range(reps):
        for level in (lo, hi):
            load = wait_quiet()
            out = subprocess.run(
                [sys.executable, "-c", child, str(level), str(nq),
                 corpus, idx_root],
                capture_output=True, text=True, cwd=REPO, check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            rec = json.loads(line)
            rec["load_at_start"] = round(load, 2)
            rec["config"] = [lo, hi, n_docs, nq]
            runs[level].append(rec)
            with open(sidecar, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(rec, flush=True)
    b_lo = max(r["qps"] for r in runs[lo])
    b_hi = max(r["qps"] for r in runs[hi])
    print(json.dumps({
        "lo_qps": b_lo, "hi_qps": b_hi,
        "efficiency": round((b_hi / b_lo) / (hi / lo), 3),
        "reps": [len(runs[lo]), len(runs[hi])],
    }))


if __name__ == "__main__":
    main()
