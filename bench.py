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

Since r7 every artifact also carries a ``calibration`` block (VERDICT r6 item
2): three FIXED workloads whose cost is independent of any query code —
``scan_sec`` (full lineitem scan + sum/count), ``jvm_cpu_sec`` (pure-CPU
xxhash64 fold over a constant ``spark.range``, no IO), and ``py_cpu_sec``
(single-thread SHA-256 over a constant buffer on the driver). The canaries
measure the HOST's speed that day; ``normalized`` reports the headline total
divided by each canary, so a round-over-round delta can be attributed in one
line: raw total up but normalized flat → slow host (the r6 +43% episode);
normalized up with canaries flat → a real engine regression.
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


def _secondary_sf_dir(sf_dir: str) -> str | None:
    """One decade below the primary SF, as a sibling dir: sf0.1 -> sf0.01,
    sf0.01 -> sf0.001. None when the name doesn't parse."""
    head, _, tail = sf_dir.rstrip("/").rpartition("sf")
    try:
        sec = float(tail) / 10.0
    except ValueError:
        return None
    return f"{head}sf{sec:g}"


def run_calibration(spark, sf_dir: str) -> dict:
    """Fixed-cost host-speed canaries (VERDICT r6 item 2). The workloads are
    CONSTANT across rounds — any change in their times is the host, not the
    engine — so BENCH artifacts become normalizable round-over-round."""
    import hashlib

    out: dict = {"reps": {}}

    # 1) IO/scan canary: full lineitem scan, two fixed aggregates.
    li = f"{sf_dir}/lineitem.parquet"

    def scan():
        spark.read.parquet(li).selectExpr(
            "sum(l_quantity)", "count(*)", "sum(l_extendedprice)"
        ).collect()

    # 2) JVM CPU canary: pure-CPU xxhash64 fold over a constant range —
    #    no IO, fixed 32-way parallelism, exercises codegen + task dispatch.
    def jvm_cpu():
        spark.range(0, 1_000_000_000, 1, 32).selectExpr(
            "avg(xxhash64(id))"  # avg: no ANSI long-overflow, same CPU work
        ).collect()

    # 3) Python single-thread canary: SHA-256 over a constant buffer on the
    #    driver — isolates raw host scalar speed from anything Spark.
    buf = b"\x5a" * (1 << 20)

    def py_cpu():
        h = hashlib.sha256()
        for _ in range(400):
            h.update(buf)
        h.digest()

    for key, fn in (("scan_sec", scan), ("jvm_cpu_sec", jvm_cpu), ("py_cpu_sec", py_cpu)):
        fn()  # untimed warm-up (JIT/codegen/footer caches)
        rep_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            rep_times.append(round(time.perf_counter() - t0, 3))
        out["reps"][key] = rep_times
        out[key] = min(rep_times)
    out["cpus"] = os.cpu_count()
    out["load_avg_1m"] = round(os.getloadavg()[0], 2)
    return out


def wait_for_idle_host() -> dict:
    """Load gate (r17, judge item 8): wall-clock on this class of host
    swings 20-50% with background load, so an artifact captured busy
    overstates cost and wastes a judge round on canary archaeology. Wait
    (bounded) for 1-minute load_avg under the gate before timing; always
    RECORD what happened — launch load, final load, seconds waited,
    whether the gate was met — so the artifact carries its own noise
    context. Gate/patience via SPARK_GRAFT_LOAD_GATE /
    SPARK_GRAFT_LOAD_WAIT_S (defaults 1.0 / 600); never blocks forever."""
    gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "1.0"))
    patience = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT_S", "600"))
    launch = os.getloadavg()[0]
    waited = 0.0
    load = launch
    while load > gate and waited < patience:
        time.sleep(15.0)
        waited += 15.0
        load = os.getloadavg()[0]
    return {
        "gate": gate,
        "load_at_launch": round(launch, 2),
        "load_at_start": round(load, 2),
        "waited_sec": round(waited, 1),
        "gate_met": load <= gate,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_gate = wait_for_idle_host()
    registry = load_all()
    names = [n for n, s in sorted(registry.items()) if BENCH_TAG in s.tags]
    if not names:
        names = sorted(registry)

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + parquet footer caches with a trivial action.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    calibration = run_calibration(spark, sf_dir)

    from iceberg_catalog_postgres_spark.catalog.maintenance import BENCH_PHASES

    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    noop: dict[str, float] = {}
    phases: dict[str, list[dict]] = {}
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
            rep = round(time.perf_counter() - t0, 3)
            rep_times.append(rep)
            # Lifecycle rows publish commit-phase sub-timings (r13): carry
            # them per rep with the derived read remainder, so the 25% rep
            # spread of commit machinery is attributable in the artifact.
            if name in BENCH_PHASES:
                ph = dict(BENCH_PHASES.pop(name))
                ph["read_sec"] = round(rep - sum(ph.values()), 3)
                phases.setdefault(name, []).append(ph)
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

    # --- secondary scale factor (r8, VERDICT item 6): the same headline set
    # one decade down, so every artifact carries a measured per-query scaling
    # slope — the local proxy for the 100x claim. Slope ~= data ratio means
    # scan/shuffle-bound (healthy); slope << ratio means fixed overhead
    # dominates at the small SF (also healthy); slope >> ratio is the red
    # flag (super-linear work — a plan that won't survive scale-up).
    secondary: dict = {}
    sec_dir = _secondary_sf_dir(sf_dir)
    if sec_dir and os.path.isdir(sec_dir):
        sec_timings: dict[str, float] = {}
        for name in names:
            spec = registry[name]
            spec.fn(spark, sec_dir).collect()  # untimed warm-up
            rep_times = []
            for _ in range(2):
                t0 = time.perf_counter()
                spec.fn(spark, sec_dir).collect()
                rep_times.append(round(time.perf_counter() - t0, 3))
            sec_timings[name] = min(rep_times)
        sec_sf = sec_dir.rstrip("/").rsplit("sf", 1)[-1]
        secondary = {
            "sf": float(sec_sf),
            "queries": sec_timings,
            "total": round(sum(sec_timings.values()), 3),
            # wall-time ratio primary/secondary per query (data ratio = 10x)
            "slope": {
                n: round(timings[n] / sec_timings[n], 2)
                for n in names
                if sec_timings.get(n)
            },
        }

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # The PRINTED line (the driver's artifact) carries the contract keys +
    # the small attribution blocks only. The bulky sub-blocks — per-rep
    # times, lifecycle phase timings, the secondary-SF sweep — go to
    # BENCH_LOCAL.json alongside everything printed (r18, VERDICT r17 item
    # 5: the r12-r16 artifacts all lost their geomean to tail-truncation of
    # a ~4 KB line; the slim line is ~1 KB and cannot straddle the capture
    # window). Nothing in the timed region or methodology changed; the
    # `queries` key keeps the exact same entries.
    slim = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_noop": noop,
        "load_gate": load_gate,
        "calibration": {
            k: v for k, v in calibration.items() if k != "reps"
        },
        "normalized": {
            # dimensionless ratios: headline total per unit of fixed
            # canary work — stable across host-speed swings
            "total_per_scan": round(total / calibration["scan_sec"], 3),
            "total_per_jvm_cpu": round(total / calibration["jvm_cpu_sec"], 3),
            "total_per_py_cpu": round(total / calibration["py_cpu_sec"], 3),
        },
        **(
            {"secondary_total": secondary["total"], "secondary_sf": secondary["sf"]}
            if secondary
            else {}
        ),
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    full = dict(slim)
    full["reps"] = reps
    full["phases"] = phases
    full["calibration"] = calibration
    if secondary:
        full["secondary"] = secondary
    full["methodology"] = (
        "queries=best-of-3 .collect(); queries_noop=best-of-2 noop-sink "
        "(engine-only, no driver serialization); secondary=best-of-2 "
        ".collect() one SF-decade down, slope=primary/secondary wall ratio "
        "(data ratio 10x; slope<<10 = fixed-overhead-bound at small SF, "
        "slope>>10 = super-linear red flag); full per-rep/phase/secondary "
        "detail in BENCH_LOCAL.json"
    )
    payload = json.dumps(slim)
    # The driver captures stdout's last line; a truncated pipe once lost a
    # round's numbers (BENCH_r08 arrived mid-JSON, parsed:null). Persist the
    # FULL JSON to a local file and print a checksum line FIRST so the slim
    # stdout line can be validated against it.
    import hashlib

    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
            "w",
        ) as fh:
            fh.write(json.dumps(full) + "\n")
    except OSError:
        pass  # read-only checkout: stdout line still carries the result
    print(f"# bench sha256[:16]={hashlib.sha256(payload.encode()).hexdigest()[:16]} bytes={len(payload)}")
    print(payload)
    spark.stop()


if __name__ == "__main__":
    main()
