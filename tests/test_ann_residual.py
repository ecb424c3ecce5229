"""IVFADC residual-encoding checks: geometric identity of the residual
trick, and recall parity with the non-residual IVFPQ on the (isotropic)
fixture embeddings — where residuals can't help but must not hurt."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_residual_distance_identity(spark):
    """||q - x|| == ||(q - c) - (x - c)|| for vectors in the same probed
    cluster — the identity the whole residual design rests on, checked on
    real fixture vectors and their actual coarse centroids."""
    from iceberg_catalog_postgres_spark.llm.ann_residual import _centroid_sql
    from iceberg_catalog_postgres_spark.llm.pq import _load_vectors
    from iceberg_catalog_postgres_spark.llm.similarity import (
        _ivf_assign,
        _ivf_final_centroids,
    )

    e = _load_vectors(spark, SF_ORACLE)
    cents = _ivf_final_centroids(e)
    a = _ivf_assign(e, cents).select("vec_id", "e", "cluster")
    res = a.select(
        "vec_id", "cluster",
        F.zip_with("e", F.expr(_centroid_sql(cents)), lambda x, c: x - c).alias("r"),
    )
    full = a.join(
        res.select(F.col("vec_id").alias("rid"), "r"), F.col("vec_id") == F.col("rid")
    ).select("vec_id", "cluster", "e", "r")
    pairs = (
        full.alias("x")
        .join(full.alias("y"), F.expr("x.cluster = y.cluster AND x.vec_id < y.vec_id"))
        .limit(500)
    )
    l2 = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda p, q: (p - q) * (p - q)), F.lit(0.0), lambda s, t: s + t
    )
    chk = pairs.select(
        (F.abs(l2(F.col("x.e"), F.col("y.e")) - l2(F.col("x.r"), F.col("y.r"))) < 1e-9
         ).alias("ok")
    )
    assert chk.filter(~F.col("ok")).count() == 0


def test_residual_recall_within_noise_of_ivfpq(spark):
    from iceberg_catalog_postgres_spark.registry import load_all

    reg = load_all()
    adc = (
        reg["sim_ann_ivfadc_residual_recall"].fn(spark, SF_ORACLE)
        .agg(F.avg("recall_at_k")).first()[0]
    )
    ivfpq = (
        reg["sim_ann_ivfpq_recall"].fn(spark, SF_ORACLE)
        .agg(F.avg("recall_at_k")).first()[0]
    )
    # isotropic fixture: no residual advantage expected, but no collapse
    # either (within 0.1 of the non-residual composition)
    assert adc >= ivfpq - 0.1
