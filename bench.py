"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Timing methodology: one warm-up pass of a trivial action to absorb JVM/codegen
startup, then per query one untimed pass (JIT/codegen/footer caches) followed
by 3 timed ``.collect()`` passes (best-of-3; per-rep times emitted under
"reps"). ``.collect()`` stays the HEADLINE number for round-over-round
comparability with BENCH_r1-r4. Since r5 each query is ALSO timed against the
JVM noop sink (``df.write.format("noop")`` — engine-only, no driver
serialization), emitted under "queries_noop"; the r4 verdict asked for the
collect-vs-noop delta to be quantified. Measured at sf0.1 the deltas are
within rep-to-rep host jitter for every headline query (results are a few
rows to a few thousand rows by design), so ``.collect()`` is kept as honest —
documented here and visible in both key sets of every BENCH_r5+ artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_catalog_postgres_spark.registry import load_all
from iceberg_catalog_postgres_spark.session import get_spark

# Headline set: tagged "bench" in the registry, fallback to all oracle-backed.
BENCH_TAG = "bench"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    names = [n for n, s in sorted(registry.items()) if BENCH_TAG in s.tags]
    if not names:
        names = sorted(registry)

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + parquet footer caches with a trivial action.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    noop: dict[str, float] = {}
    for name in names:
        spec = registry[name]
        # Pass 1 (untimed): JVM JIT + codegen compile + file-footer caches.
        # Passes 2-4 (timed, best-of-3): steady-state execution; min filters
        # out scheduler noise on shared hardware. Per-rep times are emitted
        # too, so a round-over-round drift in the best can be attributed
        # (host-load jitter shows as rep spread; a plan change shows as a
        # shifted floor across all reps).
        spec.fn(spark, sf_dir).collect()
        rep_times: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            # Materialize fully (not just count, which can prune aggregates):
            # collect to driver; headline queries return small results by design.
            spec.fn(spark, sf_dir).collect()
            rep_times.append(round(time.perf_counter() - t0, 3))
        reps[name] = rep_times
        timings[name] = min(rep_times)
        noop_times: list[float] = []
        for _ in range(2):
            t0 = time.perf_counter()
            # Engine-only materialization: the noop sink runs the full plan on
            # the executors and discards rows JVM-side — no Arrow/pickle
            # transfer, no driver materialization.
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop_times.append(round(time.perf_counter() - t0, 3))
        noop[name] = min(noop_times)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "reps": reps,
                "queries_noop": noop,
                "methodology": "queries=best-of-3 .collect(); queries_noop="
                "best-of-2 noop-sink (engine-only, no driver serialization)",
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
