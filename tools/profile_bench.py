"""Per-query time decomposition for the bench headline set (guide §1):
build (Python DataFrame construction incl. any lifecycle actions inside
fn), plan (analysis+optimization+physical planning via executedPlan),
exec (noop-sink materialization — engine only). Prints one JSON line.

Run: SPARK_GRAFT_SF_DIR=... python tools/profile_bench.py [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_catalog_postgres_spark.registry import load_all
from iceberg_catalog_postgres_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    names = sys.argv[1:] or sorted(
        n for n, s in registry.items() if "bench" in s.tags
    )
    spark = get_spark(app_name="profile_bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    out: dict = {}
    for name in names:
        spec = registry[name]
        spec.fn(spark, sf_dir).collect()  # warm-up
        reps = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            reps.append(
                {
                    "build": round(t1 - t0, 3),
                    "plan": round(t2 - t1, 3),
                    "exec": round(t3 - t2, 3),
                    "total": round(t3 - t0, 3),
                }
            )
        best = min(reps, key=lambda r: r["total"])
        out[name] = {"best": best, "reps": reps}
        print(f"{name}: {best}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
