"""Round-6 embedding operators: JL projection, dim-variance profile,
nearest-centroid confusion."""

import math

import pytest
from pyspark.sql import functions as F


def test_jl_projection_preserves_relative_distance(spark):
    """JL with ±1 signs is linear: proj(2v) = 2*proj(v); and the
    output has out_dim entries with the 1/sqrt(out_dim) scale."""
    from dbt_incremental_ci_spark.operators.similarity import jl_project

    v = [float(i % 7 - 3) for i in range(16)]
    v2 = [2.0 * x for x in v]
    df = spark.createDataFrame(
        [(1, v), (2, v2)], "vec_id int, embedding array<double>"
    )
    out = {r["vec_id"]: r["proj"] for r in
           jl_project(df, "embedding", dim=16, out_dim=4).collect()}
    assert len(out[1]) == 4
    for a, b in zip(out[1], out[2]):
        assert b == pytest.approx(2 * a, abs=1e-9)


def test_jl_sign_vector_deterministic_and_pm1(spark):
    from dbt_incremental_ci_spark.operators.similarity import (
        jl_sign_vector,
    )

    a = jl_sign_vector(64, 3)
    b = jl_sign_vector(64, 3)
    assert a == b and set(a) <= {1.0, -1.0} and len(a) == 64
    assert jl_sign_vector(64, 4) != a


def test_dim_variance_profile_hand_computed(spark):
    """Dim 0 values (0, 2): mean 1, var 1. Dim 1 constant: var 0."""
    from dbt_incremental_ci_spark.operators.embstats import (
        dim_variance_profile,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 5.0]), (2, [2.0, 5.0])],
        "vec_id int, embedding array<double>",
    )
    out = {r["dim"]: r for r in
           dim_variance_profile(df, "embedding").collect()}
    assert out[0]["mean"] == 1.0 and out[0]["variance"] == 1.0
    assert out[1]["mean"] == 5.0 and out[1]["variance"] == 0.0
    assert out[0]["var_rank"] == 1 and out[1]["var_rank"] == 2


def test_nearest_centroid_separable_classes_perfect(spark):
    """Two well-separated clusters classify perfectly: confusion is
    diagonal with share 1.0."""
    from dbt_incremental_ci_spark.operators.embstats import (
        nearest_centroid_confusion,
    )

    rows = []
    for i in range(10):
        rows.append((i, [10.0 + i % 3, 0.1 * i, 0.0], 0))
        rows.append((100 + i, [0.0, 0.1 * i, 10.0 + i % 3], 1))
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>, label int"
    )
    out = nearest_centroid_confusion(
        df, "embedding", "vec_id", "label"
    ).collect()
    cells = {(r["label_true"], r["label_pred"]): (r["n"], r["share"])
             for r in out}
    assert cells == {(0, 0): (10, 1.0), (1, 1): (10, 1.0)}
