"""Capture .explain('formatted') for queries() entries into a directory.

Usage: python tools/capture_plans.py <sf_dir> <out_dir> <suffix> [name ...]

Writes <out_dir>/<name>_<suffix>.txt for each selected entry (all when no
names given).  Index builds triggered by entries are cached in .index_cache
as usual, so a capture run is cheap after the first.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2]
    suffix = sys.argv[3]
    only = set(sys.argv[4:])

    import __spark_entry__ as entrymod
    from full_text_index_spark.session import get_spark

    spark = get_spark("plan-capture", cpus=8, shuffle_partitions=8)
    os.makedirs(out_dir, exist_ok=True)
    failures = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"OK   {name} -> {path}")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"FAIL {name}: {e}")
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
