"""Per-query isolation bench (guide §1) — NOT the frozen bench.py.

Times individual declared queries with the same session + methodology
as bench.py (``.count()`` on the declared DataFrame), optionally
repeats, and optionally writes ``.explain('formatted')`` output to
plans/r07/<name>_<tag>.txt.

Usage:
    python bench_extra.py [--sf DIR] [--reps N] [--explain TAG] q1 q2 ...
Prints one JSON line: {"sf": ..., "queries": {name: [sec, ...]}}
"""

from __future__ import annotations

import argparse
import io
import json
import os
import time
from contextlib import redirect_stdout


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--explain", default=None, help="write plans/r07/<name>_<TAG>.txt")
    ap.add_argument("--noop", action="store_true", help="time with noop sink instead of count()")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))
    from batch_import_spark.session import build_session

    spark = build_session(
        app_name="bench-extra-r07",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out: dict[str, list[float]] = {}
    for name in args.names:
        fn = qs[name]
        if args.explain:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            os.makedirs("plans/r07", exist_ok=True)
            with open(f"plans/r07/{name}_{args.explain}.txt", "w") as f:
                f.write(buf.getvalue())
        runs = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = runs
        print(json.dumps({"q": name, "runs": runs}), flush=True)
    print(json.dumps({"sf": args.sf, "queries": out}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
