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


# ---------------------------------------------------- power analysis
def test_power_analysis_known_baseline(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        power_analysis,
    )

    # p = 0.2, n = 1000: textbook two-proportion sizing at 80%/5%
    rows = [("g", 1 if i < 200 else 0) for i in range(1000)]
    df = spark.createDataFrame(rows, "grp string, conv int")
    r = power_analysis(df, "grp", "conv", rel_lift=0.10).collect()[0]
    assert r["p_hat"] == pytest.approx(0.2, abs=1e-9)
    zsum = 1.9599639845400545 + 0.8416212335729143
    import math

    mde = zsum * math.sqrt(2 * 0.2 * 0.8 / 1000)
    assert r["mde_abs"] == pytest.approx(round(mde, 6), abs=1e-9)
    p2 = 0.2 * 1.1
    n_req = math.ceil(
        zsum * zsum * (0.2 * 0.8 + p2 * (1 - p2)) / (p2 - 0.2) ** 2
    )
    assert r["n_required"] == n_req
    assert 6000 < n_req < 7000  # sanity: ~6.3k per arm for +10% on 20%


def test_power_analysis_degenerate_baseline_is_null(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        power_analysis,
    )

    df = spark.createDataFrame(
        [("a", 0), ("a", 0), ("b", 1), ("b", 1)], "grp string, conv int"
    )
    out = {r["grp"]: r for r in power_analysis(df, "grp", "conv").collect()}
    assert out["a"]["mde_abs"] is None and out["a"]["n_required"] is None
    assert out["b"]["mde_abs"] is None


# ------------------------------------------------- weighted quantiles
def test_weighted_quantiles_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.robust import (
        weighted_quantiles,
    )

    # values 1..4 with weights 1,1,1,7 -> W=10; median threshold 5
    # falls in the weight-7 block -> wq(0.5) = 4; q=0.2 -> cum 2 -> 2
    df = spark.createDataFrame(
        [("g", 1, 1.0, 1.0), ("g", 2, 2.0, 1.0), ("g", 3, 3.0, 1.0),
         ("g", 4, 4.0, 7.0)],
        "grp string, id int, v double, w double",
    )
    out = {
        r["q"]: r
        for r in weighted_quantiles(
            df, "grp", "v", "w", "id", [0.2, 0.5]
        ).collect()
    }
    assert out[0.5]["wq"] == 4.0
    assert out[0.2]["wq"] == 2.0
    assert out[0.5]["total_weight"] == 10.0


def test_weighted_quantiles_uniform_weights_match_rank_median(spark):
    from dbt_incremental_ci_spark.operators.robust import (
        weighted_quantiles,
    )

    df = spark.createDataFrame(
        [("g", i, float(i), 1.0) for i in range(1, 101)],
        "grp string, id int, v double, w double",
    )
    out = {
        r["q"]: r["wq"]
        for r in weighted_quantiles(
            df, "grp", "v", "w", "id", [0.5, 0.9, 1.0]
        ).collect()
    }
    assert out[0.5] == 50.0 and out[0.9] == 90.0 and out[1.0] == 100.0


def test_weighted_quantiles_drops_zero_weights(spark):
    from dbt_incremental_ci_spark.operators.robust import (
        weighted_quantiles,
    )

    df = spark.createDataFrame(
        [("g", 1, 1.0, 0.0), ("g", 2, 2.0, 1.0)],
        "grp string, id int, v double, w double",
    )
    r = weighted_quantiles(df, "grp", "v", "w", "id", [0.5]).collect()[0]
    assert r["wq"] == 2.0 and r["total_weight"] == 1.0


# -------------------------------------------------- rare collapse
def test_rare_category_collapse(spark):
    from dbt_incremental_ci_spark.operators.featurehygiene import (
        rare_category_collapse,
    )

    rows = [("big",)] * 10 + [("mid",)] * 3 + [("r1",), ("r2",)]
    df = spark.createDataFrame(rows, "c string")
    out = {
        r["category"]: r
        for r in rare_category_collapse(df, "c", 3).collect()
    }
    assert out["big"]["n_rows"] == 10
    assert out["mid"]["n_rows"] == 3
    assert out["__other__"]["n_rows"] == 2
    assert out["__other__"]["n_source_categories"] == 2


# -------------------------------------------------- ngram novelty
def test_ngram_novelty_disjoint_and_identical(spark):
    from dbt_incremental_ci_spark.operators.decontam import ngram_novelty

    prev = spark.createDataFrame([("a b c d",)], "text string")
    cur_same = spark.createDataFrame([("a b c d",)], "text string")
    cur_new = spark.createDataFrame([("x y z w",)], "text string")
    r_same = ngram_novelty(prev, cur_same, "text", n=2).collect()[0]
    assert r_same["n_novel"] == 0 and r_same["novelty_rate"] == 0.0
    r_new = ngram_novelty(prev, cur_new, "text", n=2).collect()[0]
    assert r_new["n_novel"] == 3 and r_new["novelty_rate"] == 1.0


def test_ngram_novelty_partial(spark):
    from dbt_incremental_ci_spark.operators.decontam import ngram_novelty

    prev = spark.createDataFrame([("a b c",)], "text string")
    # bigrams of cur: "a b" (seen), "b x" (novel) -> rate 0.5
    cur = spark.createDataFrame([("a b x",)], "text string")
    r = ngram_novelty(prev, cur, "text", n=2).collect()[0]
    assert r["n_cur_ngrams"] == 2 and r["n_novel"] == 1
    assert r["novelty_rate"] == 0.5


# ---------------------------------------------- feature hash stats
def test_feature_hash_stats_pigeonhole(spark):
    from dbt_incremental_ci_spark.operators.featurehygiene import (
        feature_hash_stats,
    )

    # 10 features into 4 buckets: collisions guaranteed (pigeonhole)
    df = spark.createDataFrame([(f"f{i}",) for i in range(10)], "f string")
    r = feature_hash_stats(df, "f", 4).collect()[0]
    assert r["n_features"] == 10
    assert r["buckets_used"] <= 4
    assert r["colliding_buckets"] >= 1
    assert r["features_in_collisions"] >= 10 - 4 + 1
    assert 0 < r["collision_rate"] <= 1.0


def test_feature_hash_stats_no_collisions_when_sparse(spark):
    from dbt_incremental_ci_spark.operators.featurehygiene import (
        feature_hash_stats,
    )

    df = spark.createDataFrame([("a",), ("b",)], "f string")
    r = feature_hash_stats(df, "f", 65536).collect()[0]
    assert r["n_features"] == 2
    assert r["collision_rate"] in (0.0, 1.0)  # 2/65536 collision odds
    assert r["load_factor"] == pytest.approx(
        round(r["buckets_used"] / 65536, 6), abs=1e-9
    )


# ------------------------------------------------ wilson slice metrics
def test_wilson_interval_brackets_accuracy(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        slice_metrics_wilson,
    )

    rows = [("s", 1, 1)] * 80 + [("s", 1, 0)] * 20
    df = spark.createDataFrame(rows, "slc string, label int, pred int")
    r = slice_metrics_wilson(df, "slc", "label", "pred").collect()[0]
    assert r["accuracy"] == pytest.approx(0.8, abs=1e-9)
    assert r["wilson_lo"] < 0.8 < r["wilson_hi"]
    # textbook Wilson 95% bounds for 80/100
    assert r["wilson_lo"] == pytest.approx(0.7112, abs=2e-3)
    assert r["wilson_hi"] == pytest.approx(0.8666, abs=2e-3)


def test_wilson_degenerate_slice_stays_in_unit_interval(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        slice_metrics_wilson,
    )

    df = spark.createDataFrame(
        [("s", 1, 1), ("s", 0, 0)], "slc string, label int, pred int"
    )
    r = slice_metrics_wilson(df, "slc", "label", "pred").collect()[0]
    assert r["accuracy"] == 1.0
    assert 0.0 <= r["wilson_lo"] <= 1.0
    assert r["wilson_hi"] == 1.0  # clamped


# --------------------------------------------------- poisson bootstrap
def test_bootstrap_ci_brackets_mean_and_shrinks(spark):
    from dbt_incremental_ci_spark.operators.sampling import (
        poisson_bootstrap_ci,
    )

    rows = [("g", i, 100.0 + (i % 21) - 10) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, id int, v double")
    r = poisson_bootstrap_ci(
        df, "grp", "v", "id", n_resamples=40
    ).collect()[0]
    assert r["n"] == 2000
    assert r["ci_lo"] <= r["mean_full"] <= r["ci_hi"]
    # sd ~ 6, so the CI of the mean at n=2000 is well under +-1
    assert r["ci_hi"] - r["ci_lo"] < 1.5


def test_bootstrap_ci_deterministic_across_runs(spark):
    from dbt_incremental_ci_spark.operators.sampling import (
        poisson_bootstrap_ci,
    )

    rows = [("g", i, float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, id int, v double")
    a = poisson_bootstrap_ci(df, "grp", "v", "id").collect()[0]
    b = poisson_bootstrap_ci(
        df.repartition(7), "grp", "v", "id"
    ).collect()[0]
    assert (a["ci_lo"], a["ci_hi"]) == (b["ci_lo"], b["ci_hi"])


def test_bootstrap_rejects_bad_params(spark):
    from dbt_incremental_ci_spark.operators.sampling import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame([("g", 1, 1.0)], "grp string, id int, v double")
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "grp", "v", "id", n_resamples=5)
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "grp", "v", "id", alpha=0.7)


# ------------------------------------------------- mergeable minhash
def test_minhash_merge_is_register_exact(spark):
    from dbt_incremental_ci_spark.operators.mhsketch import (
        minhash_merge_proof,
    )

    rows = [
        ("A", f"t{i}", i % 4) for i in range(100)
    ] + [("B", f"t{i}", i % 4) for i in range(40, 140)]
    df = spark.createDataFrame(rows, "s string, tok string, shard int")
    out = minhash_merge_proof(df, "s", "tok", "shard", m=16).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_perms"] == 16
        assert r["n_agree"] == 16  # merge must be lossless


def test_minhash_registers_estimate_jaccard(spark):
    from dbt_incremental_ci_spark.operators.mhsketch import (
        minhash_md5_registers,
    )

    # |A∩B| / |A∪B| = 60/140 ~ 0.43; register agreement estimates it
    rows = [("A", f"t{i}") for i in range(100)] + [
        ("B", f"t{i}") for i in range(40, 140)
    ]
    df = spark.createDataFrame(rows, "s string, tok string")
    regs = minhash_md5_registers(df, "s", "tok", m=128).collect()
    byset = {}
    for r in regs:
        byset.setdefault(r["s"], {})[r["j"]] = r["h"]
    agree = sum(
        1 for j in range(128) if byset["A"][j] == byset["B"][j]
    )
    assert abs(agree / 128 - 60 / 140) < 0.15


def test_minhash_registers_rejects_bad_m(spark):
    from dbt_incremental_ci_spark.operators.mhsketch import (
        minhash_md5_registers,
    )

    df = spark.createDataFrame([("a", "t")], "s string, tok string")
    with pytest.raises(ValueError):
        minhash_md5_registers(df, "s", "tok", m=0)


# ------------------------------------------------- lsh banding eval
def test_lsh_banding_eval_catches_exact_dups(spark):
    from dbt_incremental_ci_spark.operators.mhsketch import (
        lsh_banding_eval,
    )

    # two identical docs + one unrelated: truth = 1 pair, banding must
    # catch it (identical signatures agree on every band)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "zeta eta theta iota")],
        "doc_id int, text string",
    )
    r = lsh_banding_eval(df, "doc_id", "text", m=16, bands=4).collect()[0]
    assert r["n_docs"] == 3
    assert r["n_truth"] == 1
    assert r["n_hits"] == 1
    assert r["recall"] == 1.0


def test_lsh_banding_eval_rejects_bad_bands(spark):
    from dbt_incremental_ci_spark.operators.mhsketch import (
        lsh_banding_eval,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    import pytest as _pt

    with _pt.raises(ValueError):
        lsh_banding_eval(df, "doc_id", "text", m=16, bands=5)


# --------------------------------------------------------------- hits
def test_hits_star_graph(spark):
    from dbt_incremental_ci_spark.operators.hits import hits_scores

    # every hub points at 'center'; center is the max authority (1.0)
    # and all hubs tie at 1.0
    edges = [(f"u{i}", "center") for i in range(5)] + [
        ("u0", "side")
    ]
    df = spark.createDataFrame(edges, "s string, d string")
    out = {(r["role"], r["node"]): r["score"]
           for r in hits_scores(df, "s", "d", iterations=3).collect()}
    assert out[("authority", "center")] == 1.0
    assert out[("authority", "side")] < 1.0
    assert out[("hub", "u0")] == 1.0  # points at both
    assert out[("hub", "u1")] < 1.0


def test_hits_deterministic_across_partitionings(spark):
    from dbt_incremental_ci_spark.operators.hits import hits_scores

    edges = [(f"s{i % 7}", f"d{(i * 3) % 11}") for i in range(200)]
    df = spark.createDataFrame(edges, "s string, d string")
    a = sorted(map(tuple, hits_scores(df, "s", "d").collect()))
    b = sorted(
        map(tuple, hits_scores(df.repartition(13), "s", "d").collect())
    )
    assert a == b


def test_hits_rejects_bad_iterations(spark):
    from dbt_incremental_ci_spark.operators.hits import (
        hits_scores,
        hits_scores_sql,
    )

    df = spark.createDataFrame([("a", "b")], "s string, d string")
    with pytest.raises(ValueError):
        hits_scores(df, "s", "d", iterations=0)
    with pytest.raises(ValueError):
        hits_scores_sql("(t)", "s", "d", iterations=0)


# ------------------------------------------------------- dataset card
def test_dataset_card_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.datasetcard import dataset_card

    df = spark.createDataFrame(
        [(1, "a b c", "en", "s1"), (2, "a b c", "en", "s1"),
         (3, "x y", "de", "s2"), (4, "zz", "en", "s1")],
        "doc_id int, text string, lang string, source string",
    )
    r = dataset_card(df).collect()[0]
    assert r["n_docs"] == 4 and r["n_langs"] == 2 and r["n_sources"] == 2
    assert r["n_tokens"] == 3 + 3 + 2 + 1
    assert r["exact_dup_rate"] == 0.25  # one duplicated text among 4
    assert r["top_lang"] == "en"
    assert r["top_lang_share"] == 0.75
    assert r["top_source_share"] == 0.75


# -------------------------------------------------- krippendorff alpha
def test_krippendorff_perfect_agreement(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        krippendorff_alpha_nominal,
    )

    rows = [(u, v) for u, v in [(1, "a"), (2, "b"), (3, "a")]
            for _ in range(3)]
    df = spark.createDataFrame(rows, "unit int, rating string")
    r = krippendorff_alpha_nominal(df, "unit", "rating").collect()[0]
    assert r["alpha"] == pytest.approx(1.0, abs=1e-9)
    assert r["do_rate"] == 0.0


def test_krippendorff_textbook_example(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        krippendorff_alpha_nominal,
    )

    # Krippendorff (2004) binary example: units/ratings chosen so a
    # hand computation is easy — 4 units, 2 raters:
    # (a,a), (a,b), (b,b), (b,b)  ->  Do = (1/n)*sum off-diag
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b"),
         (3, "b"), (3, "b"), (4, "b"), (4, "b")],
        "unit int, rating string",
    )
    r = krippendorff_alpha_nominal(df, "unit", "rating").collect()[0]
    # coincidence matrix: aa=2, ab=ba=1, bb=4 (each pair weight 1/(2-1))
    # n=8, n_a=3, n_b=5; Do=2/8=0.25; De=(8*8-(9+25))/(8*7)=30/56
    import math
    de = 30 / 56
    want = 1 - 0.25 / de
    assert r["alpha"] == pytest.approx(round(want, 9), abs=1e-9)
    assert r["n_units"] == 4 and r["n_ratings"] == 8


def test_krippendorff_single_rating_units_drop(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        krippendorff_alpha_nominal,
    )

    # unit 9 has one rating -> contributes nothing
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (9, "b")], "unit int, rating string"
    )
    r = krippendorff_alpha_nominal(df, "unit", "rating").collect()[0]
    assert r["do_rate"] == 0.0


# ------------------------------------------------ quantile normalize
def test_quantile_normalize_shifts_group_to_global(spark):
    from dbt_incremental_ci_spark.operators.robust import (
        quantile_normalize,
    )

    # group A = 1..4 (low), group B = 101..104 (high); global ranks
    # 1..8. A's rank i of 4 maps to global rank 2i
    rows = [("A", i, float(i)) for i in range(1, 5)] + [
        ("B", i + 4, float(100 + i)) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    out = {
        (r["g"], r["v"]): r["normalized"]
        for r in quantile_normalize(df, "g", "v", "id").collect()
    }
    # A rank1 -> global rank 2 -> value 2.0 ; A rank4 -> rank8 -> 104
    assert out[("A", 1.0)] == 2.0
    assert out[("A", 4.0)] == 104.0
    assert out[("B", 101.0)] == 2.0
    assert out[("B", 104.0)] == 104.0


def test_quantile_normalize_identity_on_single_group(spark):
    from dbt_incremental_ci_spark.operators.robust import (
        quantile_normalize,
    )

    rows = [("g", i, float(i * 3)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    out = quantile_normalize(df, "g", "v", "id").collect()
    assert all(r["normalized"] == r["v"] for r in out)


# ----------------------------------------------- split leakage audit
def test_split_leakage_detects_spanning_units(spark):
    from dbt_incremental_ci_spark.operators.featurehygiene import (
        split_leakage_audit,
    )

    rows = [
        (1, "train", 1), (1, "test", 0),   # unit 1 leaks
        (2, "train", 1), (2, "train", 0),  # unit 2 clean
        (3, "test", 1),
    ]
    df = spark.createDataFrame(rows, "u int, fold string, label int")
    out = {r["fold"]: r for r in
           split_leakage_audit(df, "u", "fold", "label").collect()}
    assert out["train"]["leaky_units_total"] == 1
    assert out["train"]["leaky_rows_total"] == 2
    assert out["train"]["n_rows"] == 3 and out["train"]["n_units"] == 2
    assert out["test"]["pos_rate"] == 0.5


def test_split_leakage_clean_group_split(spark):
    from dbt_incremental_ci_spark.operators.featurehygiene import (
        split_leakage_audit,
    )

    rows = [(u, "train" if u % 2 else "test", u % 2)
            for u in range(10) for _ in range(3)]
    df = spark.createDataFrame(rows, "u int, fold string, label int")
    out = split_leakage_audit(df, "u", "fold", "label").collect()
    assert all(r["leaky_units_total"] == 0 for r in out)


def test_concentration_zero_total_group_drops(spark):
    from dbt_incremental_ci_spark.operators.concentration import (
        group_concentration,
    )

    df = spark.createDataFrame(
        [("dead", "m1", 0.0), ("dead", "m2", 0.0), ("live", "m1", 5.0)],
        "grp string, m string, v double",
    )
    out = {r["grp"] for r in group_concentration(df, "grp", "m", "v").collect()}
    assert out == {"live"}


def test_quantile_normalize_drops_null_values(spark):
    from dbt_incremental_ci_spark.operators.robust import (
        quantile_normalize,
    )

    rows = [("g", 1, 1.0), ("g", 2, None), ("g", 3, 3.0)]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    out = quantile_normalize(df, "g", "v", "id").collect()
    assert len(out) == 2 and all(r["v"] is not None for r in out)


# ---------------------------------------------- cluster size profile
def test_cluster_size_profile_shape(spark, sf_dir="/root/testdata/sf0.001"):
    from dbt_incremental_ci_spark import workload

    out = workload.QUERIES["q227_cluster_size_profile"](
        spark, sf_dir
    ).collect()
    total_docs = sum(r["n_docs_covered"] for r in out)
    assert total_docs > 0
    assert abs(sum(r["pct_docs"] for r in out) - 1.0) < 1e-4
    rates = {r["corpus_dup_rate"] for r in out}
    assert len(rates) == 1 and 0 <= rates.pop() < 1
