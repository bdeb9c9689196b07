"""Round-5 second batch: ranking eval (NDCG/AP/lift), IPS off-policy
eval, concentration measures, JS divergence, mutual information,
trimmed stats, zone-map pruning report."""

import math

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------- ndcg@k
def test_ndcg_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import ndcg_at_k

    # one group, ranked by score desc: rels in rank order = [3, 0, 2]
    df = spark.createDataFrame(
        [("g", 1, 9.0, 3), ("g", 2, 5.0, 0), ("g", 3, 1.0, 2)],
        "grp string, id int, score double, rel int",
    )
    r = ndcg_at_k(df, "grp", "score", "rel", "id", k=10).collect()[0]
    dcg = (2**3 - 1) / math.log2(2) + 0 + (2**2 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + 0
    assert r["n"] == 3
    assert r["dcg"] == pytest.approx(dcg, abs=1e-6)
    assert r["idcg"] == pytest.approx(idcg, abs=1e-6)
    assert r["ndcg"] == pytest.approx(round(dcg / idcg, 6), abs=1e-9)


def test_ndcg_perfect_ranking_is_one(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import ndcg_at_k

    df = spark.createDataFrame(
        [("g", i, float(100 - i), 5 - i) for i in range(5)],
        "grp string, id int, score double, rel int",
    )
    r = ndcg_at_k(df, "grp", "score", "rel", "id", k=5).collect()[0]
    assert r["ndcg"] == pytest.approx(1.0, abs=1e-9)


def test_ndcg_truncates_at_k(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import ndcg_at_k

    # relevant item at rank 3 contributes nothing when k=2
    df = spark.createDataFrame(
        [("g", 1, 9.0, 0), ("g", 2, 5.0, 0), ("g", 3, 1.0, 3)],
        "grp string, id int, score double, rel int",
    )
    r = ndcg_at_k(df, "grp", "score", "rel", "id", k=2).collect()[0]
    assert r["dcg"] == 0.0
    assert r["ndcg"] == 0.0


# ------------------------------------------------------------- ap@k
def test_average_precision_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        average_precision_at_k,
    )

    # rank order: rel = [1, 0, 1, 0] -> AP = (1/1 + 2/3) / 2
    df = spark.createDataFrame(
        [("g", 1, 9.0, 1), ("g", 2, 7.0, 0), ("g", 3, 5.0, 1),
         ("g", 4, 3.0, 0)],
        "grp string, id int, score double, rel int",
    )
    r = average_precision_at_k(
        df, "grp", "score", "rel", "id", k=10
    ).collect()[0]
    assert r["n_relevant"] == 2
    assert r["ap"] == pytest.approx(round((1 + 2 / 3) / 2, 6), abs=1e-9)


def test_average_precision_no_relevant_is_null(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        average_precision_at_k,
    )

    df = spark.createDataFrame(
        [("g", 1, 9.0, 0), ("g", 2, 7.0, 0)],
        "grp string, id int, score double, rel int",
    )
    r = average_precision_at_k(
        df, "grp", "score", "rel", "id", k=10
    ).collect()[0]
    assert r["ap"] is None


# ------------------------------------------------------- decile lift
def test_decile_lift_separable_scores(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import decile_lift

    # 100 rows, top 20 scores are the 20 positives -> first two
    # quintiles capture everything, lift 5x in tile 1
    rows = [(i, float(1000 - i), 1 if i < 20 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, score double, label int")
    out = {
        r["tile"]: r
        for r in decile_lift(df, "score", "label", "id", n_tiles=5).collect()
    }
    assert out[1]["n_pos"] == 20 and out[1]["pos_rate"] == 1.0
    assert out[1]["lift"] == pytest.approx(5.0, abs=1e-9)
    assert out[1]["cum_capture"] == pytest.approx(1.0, abs=1e-9)
    assert out[5]["cum_capture"] == pytest.approx(1.0, abs=1e-9)
    assert out[3]["n_pos"] == 0


def test_decile_lift_rejects_bad_tiles(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import decile_lift

    df = spark.createDataFrame([(1, 1.0, 1)], "id int, score double, label int")
    with pytest.raises(ValueError):
        decile_lift(df, "score", "label", "id", n_tiles=1)


# --------------------------------------------------------------- ips
def test_ips_uniform_logging_recovers_target_mean(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        ips_offline_eval,
    )

    # logging policy plays a/b evenly per context; rewards differ.
    # target always plays 'a' -> IPS estimate = mean reward of 'a'
    # rows under weight 2 at exactly the 'a' rows: avg = reward_a
    rows = []
    for ctx in range(4):
        for i in range(10):
            rows.append((ctx, "a", 1.0, "a"))
            rows.append((ctx, "b", 0.0, "a"))
    df = spark.createDataFrame(
        rows, "ctx int, action string, reward double, target string"
    )
    r = ips_offline_eval(df, "ctx", "action", "reward", "target").collect()[0]
    # w = 2 on the 40 'a' rows, 0 elsewhere; ips = sum(2*1)/80 = 1.0
    assert r["n"] == 80 and r["n_matched"] == 40
    assert r["ips"] == pytest.approx(1.0, abs=1e-6)
    assert r["snips"] == pytest.approx(1.0, abs=1e-6)
    # ess = (sum w)^2 / sum w^2 = 6400/160 = 40
    assert r["ess"] == pytest.approx(40.0, abs=1e-6)


# ----------------------------------------------------- concentration
def test_concentration_equal_shares(spark):
    from dbt_incremental_ci_spark.operators.concentration import (
        group_concentration,
    )

    df = spark.createDataFrame(
        [("g", f"m{i}", 10.0) for i in range(4)],
        "grp string, m string, v double",
    )
    r = group_concentration(df, "grp", "m", "v").collect()[0]
    assert r["gini"] == pytest.approx(0.0, abs=1e-9)
    assert r["hhi"] == pytest.approx(0.25, abs=1e-6)
    assert r["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert r["evenness"] == pytest.approx(1.0, abs=1e-6)


def test_concentration_total_monopoly(spark):
    from dbt_incremental_ci_spark.operators.concentration import (
        group_concentration,
    )

    df = spark.createDataFrame(
        [("g", "big", 100.0)] + [("g", f"z{i}", 0.0) for i in range(9)],
        "grp string, m string, v double",
    )
    r = group_concentration(df, "grp", "m", "v").collect()[0]
    # gini = (n-1)/n for a single holder among n
    assert r["gini"] == pytest.approx(0.9, abs=1e-6)
    assert r["hhi"] == pytest.approx(1.0, abs=1e-6)
    assert r["entropy"] == pytest.approx(0.0, abs=1e-9)


# ------------------------------------------------------ js divergence
def test_jsd_identical_distributions_zero(spark):
    from dbt_incremental_ci_spark.operators.drift import js_divergence

    a = spark.createDataFrame(
        [("x",)] * 50 + [("y",)] * 50, "c string"
    )
    r = js_divergence(a, a, "c").collect()[0]
    assert r["jsd_nats"] == pytest.approx(0.0, abs=1e-9)
    assert r["js_distance"] == pytest.approx(0.0, abs=1e-6)


def test_jsd_disjoint_near_ln2(spark):
    from dbt_incremental_ci_spark.operators.drift import js_divergence

    a = spark.createDataFrame([("x",)] * 1000, "c string")
    b = spark.createDataFrame([("y",)] * 1000, "c string")
    r = js_divergence(a, b, "c", smooth=0.01).collect()[0]
    # disjoint supports -> JSD -> ln 2 (1 bit), dampened by smoothing
    assert r["jsd_bits"] == pytest.approx(1.0, abs=0.01)
    assert 0 <= r["jsd_bits"] <= 1.0


# -------------------------------------------------- mutual information
def test_mi_independent_is_zero(spark):
    from dbt_incremental_ci_spark.operators.profiling import (
        mutual_information,
    )

    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(25)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["mi_nats"] == pytest.approx(0.0, abs=1e-9)
    assert r["h_x"] == pytest.approx(math.log(2), abs=1e-6)
    assert r["nmi"] == pytest.approx(0.0, abs=1e-9)


def test_mi_deterministic_equals_entropy(spark):
    from dbt_incremental_ci_spark.operators.profiling import (
        mutual_information,
    )

    # y = f(x), uniform over 4 values -> MI = H(X) = H(Y) = ln 4, nmi=1
    rows = [(f"x{i}", f"y{i}") for i in range(4) for _ in range(10)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["mi_nats"] == pytest.approx(math.log(4), abs=1e-6)
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)


# ------------------------------------------------------ trimmed stats
def test_trimmed_stats_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.robust import trimmed_stats

    # 10 values 1..9 plus an outlier 1000; trim=0.1 cuts one from
    # each end -> kept = 2..9 and the winsorized tail clamps to 2/9
    vals = [float(i) for i in range(1, 10)] + [1000.0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "grp string, id int, v double",
    )
    r = trimmed_stats(df, "grp", "v", "id", trim=0.1).collect()[0]
    kept = list(range(2, 10))
    assert r["n"] == 10 and r["n_trimmed"] == 8
    assert r["trimmed_mean"] == pytest.approx(sum(kept) / 8, abs=1e-6)
    wins = (sum(kept) + 2 + 9) / 10
    assert r["winsorized_mean"] == pytest.approx(wins, abs=1e-6)
    assert r["mean"] == pytest.approx(sum(vals) / 10, abs=1e-6)


def test_trimmed_stats_rejects_bad_trim(spark):
    from dbt_incremental_ci_spark.operators.robust import trimmed_stats

    df = spark.createDataFrame([("g", 1, 1.0)], "grp string, id int, v double")
    with pytest.raises(ValueError):
        trimmed_stats(df, "grp", "v", "id", trim=0.5)


# -------------------------------------------------- zone-map pruning
def test_pruning_report_skips_disjoint_zones(spark):
    from dbt_incremental_ci_spark.sinks.layout import pruning_report

    # three zones with disjoint value ranges 0-9 / 10-19 / 20-29
    rows = [(f"z{v // 10}", i, float(v)) for i, v in enumerate(range(30))]
    df = spark.createDataFrame(rows, "zone string, id int, v double")
    out = {
        r["pred_id"]: r
        for r in pruning_report(
            df, "zone", "v", [("mid", 10.0, 19.0), ("all", 0.0, 29.0)]
        ).collect()
    }
    mid = out["mid"]
    assert mid["zones_total"] == 3 and mid["zones_scanned"] == 1
    assert mid["rows_scanned"] == 10 and mid["rows_matching"] == 10
    assert mid["false_positive_fraction"] == 0.0
    assert out["all"]["zones_scanned"] == 3
    assert out["all"]["scan_fraction"] == 1.0


def test_pruning_report_counts_false_positives(spark):
    from dbt_incremental_ci_spark.sinks.layout import pruning_report

    # one zone spans 0..100 but only 2 rows match the narrow predicate
    rows = [("z", 0, 0.0), ("z", 1, 50.0), ("z", 2, 51.0), ("z", 3, 100.0)]
    df = spark.createDataFrame(rows, "zone string, id int, v double")
    r = pruning_report(df, "zone", "v", [("p", 50.0, 51.0)]).collect()[0]
    assert r["rows_scanned"] == 4 and r["rows_matching"] == 2
    assert r["false_positive_fraction"] == 0.5


def test_pruning_report_rejects_empty_and_oversized(spark):
    from dbt_incremental_ci_spark.sinks.layout import pruning_report

    df = spark.createDataFrame([("z", 1, 1.0)], "zone string, id int, v double")
    with pytest.raises(ValueError):
        pruning_report(df, "zone", "v", [])
    with pytest.raises(ValueError):
        pruning_report(
            df, "zone", "v", [(f"p{i}", 0.0, 1.0) for i in range(65)]
        )
