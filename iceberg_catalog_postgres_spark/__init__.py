"""iceberg_catalog_postgres_spark — a PySpark-native analytics engine with an
Iceberg-style Postgres-backed catalog.

Re-implements, Spark-first, the capabilities of the reference
``JanKaul/iceberg-catalog-postgres`` (an Apache Iceberg catalog backed by
Postgres, ``/root/reference/src/catalog/mod.rs``) plus the analytic engine that
the reference explicitly delegates to "a compute engine like Spark or Flink"
(``src/catalog/mod.rs:359-361``).

Layout:
- ``catalog/``   — the catalog port: pointer table + CAS commit protocol
                   (reference §2.A operators), pluggable SQL backend
                   (SQLite default, Postgres when reachable).
- ``operators/`` — relational operator inventory (scans, filters, joins,
                   aggregations, windows, set ops) as registered queries.
- ``functions/`` — scalar function families (string/date/math/array/json).
- ``llm/``       — large-scale training-data pipeline operators: dedup
                   (exact, MinHash-LSH, n-gram Jaccard), similarity search,
                   text analysis, multimodal column plumbing.
- ``streaming/`` — Structured Streaming window/watermark/session operators.
- ``registry``   — the query registry the driver contract consumes.
"""

from iceberg_catalog_postgres_spark.registry import REGISTRY, register  # noqa: F401

__version__ = "0.1.0"
