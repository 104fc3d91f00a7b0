#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1) — bench.py is
FROZEN for the driver's measurement, so everything exploratory lives
here.

Modes:
  python bench_extra.py time [query ...]     time .count() per query (bench methodology)
  python bench_extra.py noop [query ...]     time a noop-sink write per query (guide §1.4)
  python bench_extra.py plans [query ...]    dump .explain("formatted") to plans/r07/<q>_<tag>.txt

Env: SPARK_GRAFT_SF_DIR (default sf1.0 — the driver's r6 measurement
scale), SPARK_GRAFT_CPUS, YPO_PLAN_TAG (before/after), YPO_REPEAT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TAG = os.environ.get("YPO_PLAN_TAG", "before")
REPEAT = int(os.environ.get("YPO_REPEAT", "1"))
REPO = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import HEADLINE

    from yamlpyowl_spark.plans.session import get_spark
    from yamlpyowl_spark.queries import QUERIES

    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or HEADLINE

    spark = get_spark(cpus=CPUS, app_name=f"ypo-bench-extra-{mode}")
    out = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"{mode}: {name}")
        if mode == "plans":
            df = fn(spark, SF_DIR)
            os.makedirs(os.path.join(REPO, "plans", "r07"), exist_ok=True)
            p = os.path.join(REPO, "plans", "r07", f"{name}_{TAG}.txt")
            with open(p, "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
            log(f"wrote {p}")
            continue
        samples = []
        for _ in range(REPEAT):
            t0 = time.time()
            if mode == "noop":
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            else:
                n = fn(spark, SF_DIR).count()
            samples.append(round(time.time() - t0, 3))
        out[name] = min(samples)
        log(f"  {name}: {samples} -> {out[name]}s")
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"mode": mode, "sf_dir": SF_DIR, "loadavg": list(os.getloadavg()), "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
