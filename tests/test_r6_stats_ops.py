"""Round-6 statistics operators: Kaplan-Meier survival, BH-FDR,
doubly-robust OPE, group snake k-fold."""

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ Kaplan-Meier
def test_kaplan_meier_hand_computed(spark):
    """Classic textbook fixture: 6 subjects, events at t=1 (1), t=3
    (2), censored at t=2 and t=4, event at t=5.

    t=1: n=6, d=1 -> S = 5/6
    t=2: censored only   -> S unchanged 5/6
    t=3: n=4, d=2 -> S = 5/6 * 2/4 = 5/12
    t=4: censored only   -> S unchanged
    t=5: n=1, d=1 -> S = 0 (extinction, no ln(0))
    """
    from dbt_incremental_ci_spark.operators.survival import kaplan_meier

    rows = [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0), (5, 1)]
    df = spark.createDataFrame(rows, "duration int, event int")
    out = {
        r["duration"]: (r["n_risk"], r["d_events"], r["survival"])
        for r in kaplan_meier(df, "duration", "event").collect()
    }
    assert out[1] == (6, 1, round(5 / 6, 6))
    assert out[2] == (5, 0, round(5 / 6, 6))
    assert out[3] == (4, 2, round(5 / 12, 6))
    assert out[4] == (2, 0, round(5 / 12, 6))
    assert out[5] == (1, 1, 0.0)


def test_kaplan_meier_all_events_reaches_zero(spark):
    from dbt_incremental_ci_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 1)], "duration int, event int"
    )
    out = {r["duration"]: r["survival"] for r in
           kaplan_meier(df, "duration", "event").collect()}
    assert out[1] == round(1 / 3, 6)
    assert out[2] == 0.0


# ------------------------------------------------------------- BH-FDR
def test_bh_fdr_rejects_prefix_of_sorted_pvalues(spark):
    """Planted experiment: slices s0/s1 have a huge real effect,
    s2..s5 are null. BH must reject a PREFIX of the p-ranked list
    (step-up property), include the planted slices, and exclude the
    clearly-null ones."""
    from dbt_incremental_ci_spark.operators.evalmetrics import slice_ztest_bh

    rows = []
    for s, lift in [("s0", 0.4), ("s1", 0.4), ("s2", 0.0),
                    ("s3", 0.0), ("s4", 0.0), ("s5", 0.0)]:
        for i in range(400):
            variant = "A" if i % 2 == 0 else "B"
            base = (i * 2654435761) % 100 / 100.0
            thresh = 0.3 + (lift if variant == "A" else 0.0)
            rows.append((s, variant, base < thresh))
    df = spark.createDataFrame(rows, "slice string, variant string, conv boolean")
    out = slice_ztest_bh(df, "slice", "variant", "conv", alpha=0.05)
    got = {r["slice"]: r for r in out.collect()}
    assert got["s0"]["rejected"] and got["s1"]["rejected"]
    assert not got["s4"]["rejected"] and not got["s5"]["rejected"]
    # step-up property: rejected set is exactly ranks 1..k
    ranks_rej = sorted(r["p_rank"] for r in got.values() if r["rejected"])
    assert ranks_rej == list(range(1, len(ranks_rej) + 1))


def test_bh_fdr_missing_arm_gets_p_one(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import slice_ztest_bh

    rows = [("only_a", "A", True)] * 10 + [("both", "A", True)] * 10 + [
        ("both", "B", False)
    ] * 10
    df = spark.createDataFrame(rows, "slice string, variant string, conv boolean")
    got = {r["slice"]: r for r in
           slice_ztest_bh(df, "slice", "variant", "conv").collect()}
    assert got["only_a"]["z"] == 0.0
    assert got["only_a"]["p_value"] == 1.0
    assert not got["only_a"]["rejected"]


# ------------------------------------------------------ doubly robust
def test_doubly_robust_matches_hand_computation(spark):
    """One context, two actions: a (n=3, rewards 1,1,1) and b (n=1,
    reward 0). Target = argmax qhat = a. p(a)=0.75, qhat(a)=1,
    qhat(b)=0.

    IPS  = mean over rows of 1{a}=target/p * r = (3 * (1/0.75)*1)/4 = 1
    DR   = mean of qt + 1{match}/p*(r - qhat)
         rows a: 1 + (1/0.75)*(1-1) = 1 ; row b: 1 + 0 = 1 -> DR = 1
    ESS  = (sum w)^2 / sum w^2 = 4^2 / (3*(4/3)^2) = 16/ (16/3) = 3
    """
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        doubly_robust_eval,
    )

    rows = [("c", "a", 1.0), ("c", "a", 1.0), ("c", "a", 1.0),
            ("c", "b", 0.0)]
    df = spark.createDataFrame(rows, "ctx string, act string, r double")
    out = doubly_robust_eval(df, "ctx", "act", "r").collect()[0]
    assert out["n"] == 4 and out["n_matched"] == 3
    assert out["ips"] == pytest.approx(1.0, abs=1e-6)
    assert out["dr"] == pytest.approx(1.0, abs=1e-6)
    assert out["ess"] == pytest.approx(3.0, abs=1e-4)


def test_doubly_robust_dr_corrects_where_model_wrong(spark):
    """DR with a perfect reward model equals the true value even when
    the target action is rarely logged; plain IPS is noisier. Here
    rewards are exactly determined by action, so qhat is exact and DR
    must equal qhat(target) regardless of propensities."""
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        doubly_robust_eval,
    )

    rows = [("c", "good", 5.0)] + [("c", "bad", 1.0)] * 19
    df = spark.createDataFrame(rows, "ctx string, act string, r double")
    out = doubly_robust_eval(df, "ctx", "act", "r").collect()[0]
    assert out["dr"] == pytest.approx(5.0, abs=1e-6)


# ---------------------------------------------------- group k-fold
def test_group_kfold_no_leakage_and_balanced(spark):
    from dbt_incremental_ci_spark.operators.sampling import (
        group_snake_kfold,
    )

    # 40 groups with skewed sizes 1..40
    rows = [(g, i) for g in range(40) for i in range(g + 1)]
    df = spark.createDataFrame(rows, "grp int, x int")
    out = group_snake_kfold(df, "grp", k=4).collect()
    assert len(out) == 4
    assert sum(r["n_groups"] for r in out) == 40
    total = sum(r["n_rows"] for r in out)
    assert total == sum(range(1, 41))
    # snake balancing: max fold within 10% of min fold on this fixture
    sizes = [r["n_rows"] for r in out]
    assert max(sizes) - min(sizes) <= 0.1 * min(sizes) + 4
    assert sum(r["row_share"] for r in out) == pytest.approx(1.0, abs=1e-4)


def test_group_kfold_rejects_k_below_two(spark):
    from dbt_incremental_ci_spark.operators.sampling import (
        group_snake_kfold,
    )

    df = spark.createDataFrame([(1, 1)], "grp int, x int")
    with pytest.raises(ValueError):
        group_snake_kfold(df, "grp", k=1)
