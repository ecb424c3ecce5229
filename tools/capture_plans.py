"""Capture .explain('formatted') for queries into plans/<round>/<query>_<suffix>.txt.

Run: python tools/capture_plans.py <suffix> [query ...]   (default: bench set)
Round dir via SPARK_GRAFT_PLANS_ROUND (default r18).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_catalog_postgres_spark.plans.audit import explain_formatted
from iceberg_catalog_postgres_spark.registry import load_all
from iceberg_catalog_postgres_spark.session import get_spark

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r18"),
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = sys.argv[1]
    registry = load_all()
    names = sys.argv[2:] or sorted(
        n for n, s in registry.items() if "bench" in s.tags
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        txt = explain_formatted(df)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
