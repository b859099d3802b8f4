#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): noop-sink timing + plan capture.

Separate from the FROZEN bench.py (driver contract). Usage:

    python bench_extra.py [--sf DIR] [--reps N] [--plans DIR] [q1 q2 ...]

Times each named query (default: all) with df.write.format("noop") under the
same session shape as bench.py's run_queries (local[$SPARK_GRAFT_CPUS],
shuffle_partitions=CPUS), labels jobs, and optionally writes
.explain("formatted") output per query to --plans.
Prints one JSON line per query: {"q": name, "secs": [..], "best": s}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None, help="directory for explain('formatted') dumps")
    ap.add_argument("--suffix", default="", help="plan filename suffix (e.g. _before)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from crawlspark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    qs = entrymod.queries()
    names = args.names or list(qs)
    # same JVM warmup as bench.py run_queries
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    warm = spark.range(0, 200_000, 1, cpus).withColumn("k", F.col("id") % 1000)
    firsts = warm.groupBy("k").agg(F.min("id").alias("v")).persist()
    ranked = (
        firsts.repartitionByRange("v", "k")
        .withColumn("r", F.row_number().over(
            Window.partitionBy(F.col("k") % 16).orderBy("v", "k")))
    )
    (
        ranked.join(F.broadcast(firsts.limit(100)), "k")
        .join(warm, "k")
        .write.format("noop").mode("overwrite").save()
    )
    firsts.unpersist()
    spark.catalog.clearCache()

    if args.plans:
        Path(args.plans).mkdir(parents=True, exist_ok=True)
    for name in names:
        fn = qs[name]
        secs = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            try:
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                secs.append(round(time.time() - t0, 3))
            except Exception as e:
                sys.stderr.write(f"{name} FAILED: {e}\n")
                secs.append(-1.0)
                break
            finally:
                spark.sparkContext.setJobDescription(None)
        if args.plans and secs and secs[-1] > 0:
            spark.catalog.clearCache()
            df = fn(spark, args.sf)
            plan_txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            (Path(args.plans) / f"{name}{args.suffix}.txt").write_text(plan_txt)
        print(json.dumps({"q": name, "secs": secs, "best": min(s for s in secs)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
