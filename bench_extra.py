#!/usr/bin/env python3
"""Optimization-round side benchmark (guide §1.4): time individual catalog
queries through the noop sink, without touching the frozen bench.py.

Usage:
    python bench_extra.py [--sf-dir DIR] [--repeats N] [--cpus N] [q1 q2 ...]

Prints per-query seconds (all repeats + best) as one JSON line.  Also
supports `--explain plans/r06` to dump .explain("formatted") per query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--explain", default=None, metavar="DIR",
                    help="write <DIR>/<query>.txt explain('formatted') dumps")
    ap.add_argument("--suffix", default="", help="explain filename suffix")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cdx_writer_spark.plans.catalog import QUERIES
    from cdx_writer_spark.session import get_spark

    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", heap)
    spark = get_spark(app_name="cdx-writer-spark-bench-extra", cores=args.cpus,
                      extra={"spark.driver.extraJavaOptions":
                             f"-Xms{heap} -XX:+AlwaysPreTouch "
                             f"-XX:+UseParallelGC"})
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries or list(QUERIES)
    # session warmup: same shape as bench.py so first-query numbers are
    # comparable (codegen + arrow workers + parquet footers)
    from pyspark.sql import Window, functions as F
    from cdx_writer_spark.functions.udfs import surt_key
    warm = spark.read.parquet(f"{args.sf_dir}/orders.parquet").limit(20000)
    (warm.withColumn("k", surt_key(F.concat(F.lit("http://w.com/"),
                                            F.col("o_orderkey").cast("string"))))
     .withColumn("rn", F.row_number().over(
         Window.partitionBy("o_custkey").orderBy("o_orderkey")))
     .groupBy("o_orderstatus").count().count())

    out: dict[str, dict] = {}
    for name in names:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = QUERIES[name](spark, args.sf_dir)
            path = os.path.join(args.explain, f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        runs = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            (QUERIES[name](spark, args.sf_dir)
             .write.format("noop").mode("overwrite").save())
            runs.append(round(time.time() - t0, 3))
        out[name] = {"best": min(runs) if runs else None, "runs": runs}
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": args.cpus,
                      "queries": out}))


if __name__ == "__main__":
    main()
