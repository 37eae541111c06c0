"""Per-query isolation bench + plan capture (guide §1.1/§1.4/§7.2).

bench.py is FROZEN (driver contract). This extra harness exists for the
optimization loop: run a subset of gate queries in ONE fresh process, time
each with the noop sink (best-of-N like bench.py), and optionally dump
`.explain("formatted")` to plans/r06/<query>_<tag>.txt so plan-shape claims
in OPTIMIZATION_r06.md are checkable without running Spark.

Usage:
  python bench_extra.py q1 q2 ...                 # time only
  PLAN_TAG=before python bench_extra.py q1 q2 ... # also dump plans
  RUNS=3 python bench_extra.py q1                 # repeats (default 2)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: python bench_extra.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("RUNS", "2"))
    plan_tag = os.environ.get("PLAN_TAG", "")

    from spatialflink_spark.session import get_spark

    spark = get_spark("spatialflink-bench-extra", cores=cpus,
                      shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # same warm-up as bench.py (JVM/codegen/parquet-footer caches)
    qs["range_tumbling_count"](spark, sf_dir).count()

    plan_dir = REPO / "plans" / "r06"
    timings: dict[str, list[float]] = {}
    for name in names:
        if plan_tag:
            plan_dir.mkdir(parents=True, exist_ok=True)
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plan_dir / f"{name}_{plan_tag}.txt").write_text(txt)
            spark.catalog.clearCache()
            gc.collect()
        samples = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
            gc.collect()
        timings[name] = samples
        print(json.dumps({"query": name, "samples": samples,
                          "best": min(samples)}), flush=True)
    print(json.dumps({
        "metric": "isolated_queries",
        "best_total": round(sum(min(s) for s in timings.values()), 3),
        "sf_dir": sf_dir, "cpus": cpus, "runs": runs,
    }))


if __name__ == "__main__":
    main()
