"""Per-query isolation bench (guide §1.4): time any subset of the
declared queries with the noop sink on a fresh local[$SPARK_GRAFT_CPUS]
session at $SPARK_GRAFT_SF_DIR, and optionally dump
``explain("formatted")`` to plans/r06/<query>_<tag>.txt.

This is the OPTIMIZATION round's measurement harness — bench.py is
frozen for the driver; numbers cited in OPTIMIZATION_r06.md come from
here unless marked as full-suite bench.py runs.

Usage:
  python bench_extra.py q1 q2 ...            # time queries (3 reps each)
  python bench_extra.py --plans TAG q1 ...   # also write plans/r06/<q>_<TAG>.txt
  python bench_extra.py --reps N ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def main() -> None:
    os.environ["SPARK_GRAFT_SKIP_FIXTURES"] = "1"
    args = sys.argv[1:]
    plan_tag = None
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plan_tag = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    import __spark_entry__ as entrymod
    from tegenaria_spark.session import get_spark

    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    if not names:
        names = list(qs)

    spark = get_spark("tegenaria-bench-extra", master=f"local[{CPUS}]")
    from pyspark.sql.functions import col, pandas_udf

    # same warm-up as bench.py: absorb JIT/codegen + python worker pools
    qs["q2_politeness_budget"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).repartition(CPUS).select(_warm(col("id"))).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(1000).repartition(CPUS).withColumn("g", col("id") % CPUS).groupBy(
        "g"
    ).applyInPandas(lambda pdf: pdf, "id long, g long").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        samples = []
        for r in range(reps):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = samples
        if plan_tag is not None:
            os.makedirs(PLAN_DIR, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLAN_DIR, f"{name}_{plan_tag}.txt"), "w") as fh:
                fh.write(plan)
        print(json.dumps({name: samples}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print("RESULT " + json.dumps({k: min(v) for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
