"""Driver-protocol confirm for kg_pipeline_{pandas,expr} (round-4
VERDICT "What's wrong #2"): replicate bench.py's KG section verbatim
(same generator, same localCheckpoint, same best-of-3) in a fresh JVM
at a given parallelism. Usage: python scripts/bench_kg_confirm.py [cpus]
Prints one JSON line."""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "60000"))
    from pyspark.sql import functions as F

    from batch_import_spark.pipeline.kg import run_kg_pipeline
    from batch_import_spark.session import build_session
    from batch_import_spark.sources.transcripts import (
        alias_dict_df,
        generate_transcripts,
    )

    spark = build_session(
        app_name="kg-confirm",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = generate_transcripts(spark, n_convs=n_convs, median_turns=16, hot_factor=100)
    t = t.localCheckpoint(eager=True)
    n_turns = t.count()
    out = {"cpus": int(cpus), "n_turns": n_turns, "load1_start": os.getloadavg()[0]}
    for kernel in ("pandas", "expr"):
        best = None
        runs = []
        for _ in range(3):
            t0 = time.time()
            res = run_kg_pipeline(t, alias_dict_df(spark), extraction=kernel)
            res.edges.count()
            sec = time.time() - t0
            runs.append(round(sec, 3))
            best = sec if best is None else min(best, sec)
        out[f"kg_pipeline_{kernel}"] = round(best, 3)
        out[f"kg_pipeline_{kernel}_runs"] = runs
        out[f"turns_per_sec_{kernel}"] = round(n_turns / best, 1)
    out["load1_end"] = os.getloadavg()[0]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
