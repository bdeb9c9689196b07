"""Round-4 batch-2 operators: SCD2, privacy (k-anon / DP), count-min,
Fellegi-Sunter linkage, semi-structured JSON."""

import math

import pytest
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.countmin import (
    countmin_build,
    countmin_estimate,
)
from dbt_incremental_ci_spark.operators.linkage import (
    block_pairs,
    classify,
    fs_score,
)
from dbt_incremental_ci_spark.operators.privacy import (
    dp_group_counts,
    k_anonymity_audit,
    laplace_noise,
    suppression_summary,
)
from dbt_incremental_ci_spark.operators.scd import (
    scd2_from_events,
    scd2_merge_snapshot,
)
from dbt_incremental_ci_spark.operators.semistructured import (
    json_kv,
    json_typed,
    key_census,
)


# ----------------------------------------------------------------- scd2
def test_scd2_from_events_compacts_runs(spark):
    ev = spark.createDataFrame(
        [
            (1, "a", 10, 100),
            (1, "a", 20, 101),  # no change -> same interval
            (1, "b", 30, 102),  # change -> new interval
            (1, "a", 40, 103),  # back to a -> third interval
            (2, "x", 15, 104),
        ],
        ["k", "v", "ts", "eid"],
    )
    out = scd2_from_events(ev, "k", ["v"], "ts", "eid").orderBy(
        "k", "valid_from"
    )
    rows = [tuple(r) for r in out.collect()]
    assert rows == [
        (1, "a", 10, 30, False),
        (1, "b", 30, 40, False),
        (1, "a", 40, None, True),
        (2, "x", 15, None, True),
    ]


def test_scd2_null_transitions_are_changes(spark):
    ev = spark.createDataFrame(
        [(1, None, 10, 1), (1, "a", 20, 2), (1, None, 30, 3)],
        "k int, v string, ts int, eid int",
    )
    out = scd2_from_events(ev, "k", ["v"], "ts", "eid")
    assert out.count() == 3  # null->a and a->null both open intervals


def test_scd2_merge_snapshot_is_one_dbt_snapshot_run(spark):
    scd = spark.createDataFrame(
        [
            (1, "a", 10, 20, False),
            (1, "b", 20, None, True),  # will change to c
            (2, "x", 10, None, True),  # unchanged
            (3, "y", 10, None, True),  # vanishes
        ],
        "k int, v string, valid_from int, valid_to int, is_current boolean",
    )
    snap = spark.createDataFrame(
        [(1, "c"), (2, "x"), (4, "new")], "k int, v string"
    )
    out = scd2_merge_snapshot(scd, snap, "k", ["v"], 50)
    got = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }
    assert got == {
        (1, "a", 10, 20, False),  # history untouched
        (1, "b", 20, 50, False),  # closed
        (1, "c", 50, None, True),  # new version
        (2, "x", 10, None, True),  # unchanged current
        (3, "y", 10, 50, False),  # key vanished -> closed
        (4, "new", 50, None, True),  # brand-new key
    }
    # re-running the same snapshot is a fixpoint (idempotent)
    again = scd2_merge_snapshot(out, snap, "k", ["v"], 60)
    assert {tuple(r) for r in again.collect()} == got


def test_scd2_from_events_cdc_deletes(spark):
    """Delete tombstones close the open interval, emit no row, and a
    re-insert of the SAME value after a delete opens a fresh interval."""
    ev = spark.createDataFrame(
        [
            (1, "a", 10, 1, "U"),
            (1, "a", 20, 2, "D"),   # closes [10,20), no tombstone row
            (1, "a", 30, 3, "U"),   # same value, but key was absent
            (2, "x", 5, 4, "U"),
            (2, "x", 8, 5, "D"),
            (2, "x", 9, 6, "D"),    # consecutive deletes collapse
        ],
        "k int, v string, ts int, eid int, op string",
    )
    out = scd2_from_events(ev, "k", ["v"], "ts", "eid", op_col="op")
    got = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }
    assert got == {
        (1, "a", 10, 20, False),
        (1, "a", 30, None, True),
        (2, "x", 5, 8, False),
    }


def test_scd2_apply_log_split_equals_full_rebuild(spark):
    """Replay equivalence: applying an event log in K in-order batches
    via scd2_apply_log equals one scd2_from_events over the whole log
    — the property the streaming ingest pipeline is built on."""
    import random

    from dbt_incremental_ci_spark.operators.scd import scd2_apply_log

    rnd = random.Random(5)
    log = []
    for eid in range(240):
        k = rnd.randint(1, 12)
        op = "D" if rnd.random() < 0.2 else "U"
        v = None if op == "D" else f"v{rnd.randint(1, 4)}"
        log.append((k, v, eid * 10, eid, op))
    schema = "k int, v string, ts int, eid int, op string"
    full = scd2_from_events(
        spark.createDataFrame(log, schema), "k", ["v"], "ts", "eid", op_col="op"
    )
    want = {tuple(r) for r in full.collect()}

    from dbt_incremental_ci_spark.streaming.ingest import _empty_scd

    events0 = spark.createDataFrame(log[:1], schema)
    scd = _empty_scd(spark, events0, "k", ["v"], "ts")
    for lo in range(0, 240, 80):  # three key-overlapping batches
        batch = spark.createDataFrame(log[lo : lo + 80], schema)
        scd = scd2_apply_log(
            scd, batch, "k", ["v"], "ts", tiebreak_col="eid", op_col="op"
        ).localCheckpoint()
    assert {tuple(r) for r in scd.collect()} == want


# -------------------------------------------------------------- privacy
def test_k_anonymity_and_suppression(spark):
    df = spark.createDataFrame(
        [("a", 1, "s1")] * 5 + [("a", 2, "s1")] * 2 + [("b", 1, "s2")] * 6,
        "qi1 string, qi2 int, sens string",
    )
    audit = k_anonymity_audit(df, ["qi1", "qi2"], "sens", k=5, l=2)
    got = {(r["qi1"], r["qi2"]): (r["grp_n"], r["k_ok"], r["l_ok"]) for r in audit.collect()}
    assert got[("a", 1)] == (5, True, False)  # big enough, no diversity
    assert got[("a", 2)] == (2, False, False)
    assert got[("b", 1)] == (6, True, False)
    summ = suppression_summary(audit, ["qi1", "qi2"]).collect()[0]
    assert summ["total_rows"] == 13
    assert summ["suppressed_rows"] == 13  # every group fails l=2
    assert summ["k_violations"] == 1


def test_laplace_noise_deterministic_and_symmetric(spark):
    df = spark.createDataFrame([(u,) for u in (0.1, 0.5, 0.9)], "u double")
    out = df.select(
        F.round(laplace_noise(F.col("u"), 2.0), 9).alias("x")
    ).collect()
    xs = [r["x"] for r in out]
    assert xs[1] == 0.0  # u=0.5 -> zero noise
    # u and 1-u give mirrored noise: -2*sign*ln(1-2|u-.5|)
    assert xs[0] == -xs[2]
    assert xs[0] == round(2.0 * math.log(1 - 2 * abs(0.1 - 0.5)), 9)


def test_dp_counts_never_exposes_exact(spark):
    df = spark.createDataFrame([("a",)] * 7 + [("b",)] * 3, "g string")
    out = dp_group_counts(df, ["g"], epsilon=1.0)
    assert set(out.columns) == {"g", "noised_n"}
    vals = {r["g"]: r["noised_n"] for r in out.collect()}
    # deterministic: same seed -> same release
    vals2 = {r["g"]: r["noised_n"] for r in dp_group_counts(df, ["g"]).collect()}
    assert vals == vals2
    # noise is bounded for eps=1 with u in (0,1): |noise| = |ln(...)|
    assert all(abs(vals[g] - n) < 25 for g, n in (("a", 7), ("b", 3)))


def test_dp_counts_multicol_null_matches_duckdb_twin(spark):
    """Round-4 ADVICE: the Spark seed key and the DuckDB twin must hash
    identical bytes for multi-column groups and NULL group values, and
    ('ab','c') vs ('a','bc') must get DIFFERENT noise (separator)."""
    import duckdb
    import pandas as pd

    from dbt_incremental_ci_spark.operators.privacy import dp_group_counts_sql

    rows = [
        ("ab", "c"),
        ("ab", "c"),
        ("a", "bc"),
        ("a", None),
        (None, "bc"),
        (None, None),
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 string")
    got = {
        (r["g1"], r["g2"]): r["noised_n"]
        for r in dp_group_counts(df, ["g1", "g2"], epsilon=1.0).collect()
    }

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g1", "g2"]))
    want = {
        (g1, g2): n
        for g1, g2, n in con.execute(
            dp_group_counts_sql("t", ["g1", "g2"], epsilon=1.0)
        ).fetchall()
    }
    assert got == want
    # separator prevents ('ab','c') / ('a','bc') seed collision: their
    # noised deltas from the exact counts must differ
    assert got[("ab", "c")] - 2 != got[("a", "bc")] - 1


# ------------------------------------------------------------- countmin
def test_countmin_one_sided_error(spark):
    rows = [(f"k{i % 17}",) for i in range(500)] + [("hot",)] * 200
    df = spark.createDataFrame(rows, "key string")
    sk = countmin_build(df, "key", depth=4, width=16)  # force collisions
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("exact_n"))
    est = countmin_estimate(sk, exact.select("key"), "key", depth=4, width=16)
    j = exact.join(est, "key").collect()
    assert len(j) == 18
    for r in j:
        assert r["cm_est"] >= r["exact_n"], "count-min never undercounts"
    # sketch is bounded by depth*width cells
    assert sk.count() <= 4 * 16


def test_countmin_merge_is_cellwise_add(spark):
    a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "key string")
    b = spark.createDataFrame([("x",)] * 4, "key string")
    both = a.unionAll(b)
    merged = (
        countmin_build(a, "key", 2, 8)
        .unionByName(countmin_build(b, "key", 2, 8))
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = countmin_build(both, "key", 2, 8)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


# -------------------------------------------------------------- linkage
def test_fs_linkage_weights_and_decision(spark):
    left = spark.createDataFrame(
        [(1, "jon", 1), (2, "ann", 1)], "lid int, lname string, blk int"
    )
    right = spark.createDataFrame(
        [(10, "jon", 1), (11, "zzz", 1), (12, "jon", 2)],
        "rid int, rname string, blk int",
    )
    pairs = block_pairs(left, right, ["blk"])
    assert pairs.count() == 4  # rid=12 in another block: never generated
    scored = fs_score(
        pairs, {"name": (F.col("lname") == F.col("rname"), 0.9, 0.01)}
    )
    out = {(r["lid"], r["rid"]): r["fs_weight"] for r in scored.collect()}
    assert out[(1, 10)] == round(math.log2(0.9 / 0.01), 6)
    assert out[(2, 11)] == round(math.log2(0.1 / 0.99), 6)
    dec = classify(scored, upper=3.0, lower=-1.0)
    d = {(r["lid"], r["rid"]): r["decision"] for r in dec.collect()}
    assert d[(1, 10)] == "link" and d[(2, 11)] == "non_link"


# ------------------------------------------------------- semistructured
def test_json_typed_and_kv(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5, "s": "x"}'), (2, '{"k": 7}'), (3, None)],
        "id int, props string",
    )
    typed = json_typed(df, "props", "k INT, s STRING")
    got = {r["id"]: (r["parsed"], r["parse_ok"]) for r in typed.collect()}
    assert got[1][0]["k"] == 5 and got[1][0]["s"] == "x"
    assert got[3][1] is False  # NULL payload -> not parsed
    kv = json_kv(df, "props")
    pairs = {
        (r["id"], r["json_key"], r["json_value"]) for r in kv.collect()
    }
    assert (1, "k", "5") in pairs and (1, "s", "x") in pairs
    assert (3, None, None) in pairs  # explode_outer keeps the row
    census = {r["json_key"]: (r["n"], r["n_integral"]) for r in key_census(df, "props").collect()}
    assert census["k"] == (2, 2)
    assert census["s"] == (1, 0)


def test_linkage_em_fit_recovers_planted_parameters(spark):
    """EM on a planted mixture: 300 true-match pairs (agree name 95%,
    city 80%) among 2700 non-match pairs (agree name 5%, city 30%)
    must recover m/u/λ near the planted values without priors."""
    import random

    from dbt_incremental_ci_spark.operators.linkage import linkage_em_fit

    rnd = random.Random(42)
    rows = []
    for _ in range(300):  # matches
        rows.append(
            (rnd.random() < 0.95, rnd.random() < 0.90, rnd.random() < 0.80)
        )
    for _ in range(2700):  # non-matches
        rows.append(
            (rnd.random() < 0.02, rnd.random() < 0.05, rnd.random() < 0.30)
        )
    df = spark.createDataFrame(
        rows, "agree_name boolean, agree_dob boolean, agree_city boolean"
    )
    cols = ["agree_name", "agree_dob", "agree_city"]
    fit = linkage_em_fit(df, cols, lam_init=0.5, n_iter=200)
    assert fit["converged"]
    assert abs(fit["lam"] - 0.1) < 0.02
    assert abs(fit["m"]["agree_name"] - 0.95) < 0.05
    assert abs(fit["u"]["agree_name"] - 0.02) < 0.02
    assert abs(fit["m"]["agree_dob"] - 0.90) < 0.05
    assert abs(fit["u"]["agree_dob"] - 0.05) < 0.03
    assert abs(fit["m"]["agree_city"] - 0.80) < 0.08
    assert abs(fit["u"]["agree_city"] - 0.30) < 0.05


# ------------------------------------------------------------------ cdc
def test_cdc_latest_state_last_op_wins_and_deletes_drop(spark):
    from dbt_incremental_ci_spark.operators.cdc import (
        cdc_latest_state,
        cdc_op_census,
    )

    log = spark.createDataFrame(
        [
            (1, 10, 1, "U", "a"),
            (1, 20, 2, "U", "b"),   # winner for key 1
            (2, 10, 3, "U", "x"),
            (2, 30, 4, "D", None),  # key 2 deleted
            (3, 5, 5, "D", None),
            (3, 6, 6, "U", "y"),    # re-created after delete
        ],
        "k int, seq int, eid int, op string, payload string",
    )
    out = cdc_latest_state(log, ["k"], "seq", "op", tiebreak_col="eid")
    got = {(r["k"], r["payload"]) for r in out.collect()}
    assert got == {(1, "b"), (3, "y")}
    census = {r["k"]: (r["n_versions"], r["last_op"]) for r in cdc_op_census(log, ["k"], "seq", "op").collect()}
    assert census[2] == (2, "D") and census[1] == (2, "U")


def test_cdc_null_op_is_kept_not_conflated_with_delete(spark):
    """Round-4 ADVICE: a winning row with a NULL op is malformed input,
    not a delete — `!= delete_op` would silently drop it."""
    from dbt_incremental_ci_spark.operators.cdc import cdc_latest_state

    log = spark.createDataFrame(
        [(1, 10, 1, "U", "a"), (1, 20, 2, None, "b"), (2, 5, 3, "D", None)],
        "k int, seq int, eid int, op string, payload string",
    )
    out = cdc_latest_state(log, ["k"], "seq", "op", tiebreak_col="eid")
    got = {(r["k"], r["op"], r["payload"]) for r in out.collect()}
    assert got == {(1, None, "b")}  # NULL-op winner survives; delete drops


def test_cdc_tiebreak_on_equal_seq(spark):
    from dbt_incremental_ci_spark.operators.cdc import cdc_latest_state

    log = spark.createDataFrame(
        [(1, 10, 1, "U", "first"), (1, 10, 2, "U", "second")],
        "k int, seq int, eid int, op string, payload string",
    )
    out = cdc_latest_state(log, ["k"], "seq", "op", tiebreak_col="eid")
    assert out.collect()[0]["payload"] == "second"


# --------------------------------------------------------------- neyman
def test_neyman_allocates_more_to_high_variance_strata(spark):
    import random

    from dbt_incremental_ci_spark.operators.sampling import (
        neyman_stratified_sample,
    )

    rng = random.Random(7)
    rows = [(i, "low", 50.0 + rng.uniform(-0.5, 0.5)) for i in range(1000)]
    rows += [
        (10_000 + i, "high", 50.0 + rng.uniform(-40, 40)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    out = neyman_stratified_sample(df, "id", "s", "v", n_target=400)
    by = {r["s"]: r["cnt"] for r in out.groupBy("s").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # equal sizes, ~80x the std-dev -> 'high' gets nearly the whole budget
    assert by.get("high", 0) > 5 * by.get("low", 1)
    # budget respected in expectation (hash sampling: allow slack)
    assert sum(by.values()) < 400 * 1.3


def test_neyman_single_stratum_degenerates_to_uniform_rate(spark):
    from dbt_incremental_ci_spark.operators.sampling import (
        neyman_stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "only", float(i % 13)) for i in range(500)],
        "id long, s string, v double",
    )
    out = neyman_stratified_sample(df, "id", "s", "v", n_target=100)
    rates = {r["sample_rate"] for r in out.select("sample_rate").distinct().collect()}
    assert len(rates) == 1
    assert next(iter(rates)) == pytest.approx(100 / 500)


# ------------------------------------------------------------ pq arrow
def test_pq_arrow_backend_matches_expression_backend(spark):
    """The Arrow encode/LUT must produce byte-identical codes and
    distances to the Catalyst HOF fold (in-order accumulation + 9dp
    round + first-argmin)."""
    import random

    from dbt_incremental_ci_spark.operators.similarity import pq_adc_topk

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 4)
    a = pq_adc_topk(emb, q, k=5, dim=16, m=4, ks=4, backend="pandas")
    b = pq_adc_topk(emb, q, k=5, dim=16, m=4, ks=4, backend="expr")
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb


# -------------------------------------------------------------- roc auc
def test_roc_auc_hand_computed_with_ties(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import roc_auc

    # scores: pos {0.9, 0.5}, neg {0.5, 0.1} -> pairs: (0.9 beats both)
    # 2 wins; (0.5 vs 0.5) tie = 0.5; (0.5 vs 0.1) win -> AUC = 3.5/4
    df = spark.createDataFrame(
        [(0.9, True), (0.5, True), (0.5, False), (0.1, False)],
        "score double, y boolean",
    )
    r = roc_auc(df, "score", "y").collect()[0]
    assert (r["n"], r["n_pos"], r["n_neg"]) == (4, 2, 2)
    assert r["auc"] == 3.5 / 4


def test_roc_auc_perfect_and_random(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import roc_auc

    perfect = spark.createDataFrame(
        [(float(i), i >= 50) for i in range(100)], "score double, y boolean"
    )
    assert roc_auc(perfect, "score", "y").collect()[0]["auc"] == 1.0
    # all scores identical -> every pair is a tie -> AUC 0.5
    flat = spark.createDataFrame(
        [(1.0, i % 2 == 0) for i in range(40)], "score double, y boolean"
    )
    assert roc_auc(flat, "score", "y").collect()[0]["auc"] == 0.5


# ------------------------------------------------------- count anomaly
def test_count_anomaly_flags_spike(spark):
    from dbt_incremental_ci_spark.operators.timeseries import (
        count_anomaly_zscore,
    )

    rows = []
    for h in range(10):
        rows += [("a", h)] * 5          # steady 5/hour
    rows += [("a", 10)] * 50            # spike hour
    df = spark.createDataFrame(rows, "k string, h int")
    out = {r["bucket"]: r for r in count_anomaly_zscore(df, ["k"], "h", 2.0).collect()}
    assert out[10]["is_anomaly"]
    assert not any(out[h]["is_anomaly"] for h in range(10))
    assert out[10]["z"] > 3.0


# -------------------------------------------------------------- agg ivm
def test_agg_delta_apply_matches_recompute_and_drops_empty_groups(spark):
    from dbt_incremental_ci_spark.incremental.ivm import agg_delta_apply

    base = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0), ("c", 1.0)],
        "g string, v double",
    )
    view = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("v").cast("decimal(18,2)")).alias("sum_v"),
    )
    # delete both 'a' rows? no — delete one 'a', both 'c' (group dies),
    # insert new 'd' and another 'b'
    delta = spark.createDataFrame(
        [
            ("a", 10.0, "D"),
            ("c", 1.0, "D"),
            ("d", 7.0, "I"),
            ("b", 3.0, "I"),
        ],
        "g string, v double, op string",
    )
    out = agg_delta_apply(
        view, delta, ["g"], count_col="cnt", sum_cols=["v"], op_col="op"
    )
    got = {r["g"]: (r["cnt"], float(r["sum_v"])) for r in out.collect()}
    assert got == {
        "a": (1, 20.0),
        "b": (2, 8.0),
        "d": (1, 7.0),
    }  # 'c' retracted to zero support -> gone


# -------------------------------------------------------------- ab test
def test_two_proportion_ztest_hand_computed(spark):
    import math

    from dbt_incremental_ci_spark.operators.evalmetrics import (
        two_proportion_ztest,
    )

    rows = [("A", True)] * 30 + [("A", False)] * 70
    rows += [("B", True)] * 50 + [("B", False)] * 50
    df = spark.createDataFrame(rows, "variant string, converted boolean")
    r = two_proportion_ztest(df, "variant", "converted").collect()[0]
    assert (r["n_a"], r["c_a"], r["n_b"], r["c_b"]) == (100, 30, 100, 50)
    pool = 80 / 200
    se = math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert r["z"] == round((0.3 - 0.5) / se, 6)
    assert r["significant"]  # |z| ~ 2.89 > 1.96
    assert r["lift"] == round(-0.2, 6)


def test_two_proportion_ztest_custom_labels_and_missing_arm(spark):
    """Round-4 ADVICE: variant labels are parameters; a missing arm
    fails loudly instead of emitting NULL counts."""
    import pytest as _pytest

    from dbt_incremental_ci_spark.operators.evalmetrics import (
        two_proportion_ztest,
    )

    rows = [("ctl", True)] * 3 + [("ctl", False)] * 7
    rows += [("trt", True)] * 5 + [("trt", False)] * 5
    df = spark.createDataFrame(rows, "variant string, converted boolean")
    r = two_proportion_ztest(
        df, "variant", "converted", label_a="ctl", label_b="trt"
    ).collect()[0]
    assert (r["n_a"], r["c_a"], r["n_b"], r["c_b"]) == (10, 3, 10, 5)

    with _pytest.raises(Exception, match="no rows for variant"):
        two_proportion_ztest(df, "variant", "converted").collect()


# ------------------------------------------------------- eval coverage
def test_eval_coverage_fraction(spark):
    from dbt_incremental_ci_spark.operators.decontam import eval_coverage

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], "doc_id long, text string"
    )
    evals = spark.createDataFrame(
        [
            (10, "the quick brown fox"),     # both trigrams covered
            (11, "totally novel words here"),  # none covered
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in eval_coverage(corpus, evals, n=3).collect()}
    assert out[10]["n_eval_ngrams"] == 2 and out[10]["coverage"] == 1.0
    assert out[11]["coverage"] == 0.0


# ------------------------------------------------------------- rrf
def test_rrf_fuse_missing_item_contributes_nothing(spark):
    from dbt_incremental_ci_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "g int, item int, rank_a int"
    )
    b = spark.createDataFrame([(1, 11, 1)], "g int, item int, rank_b int")
    out = {
        r["item"]: r
        for r in rrf_fuse(
            [a, b], ["g", "item"], ["rank_a", "rank_b"], k=60
        ).collect()
    }
    assert out[10]["rrf_score"] == round(1 / 61, 9)
    assert out[10]["rank_b"] is None
    assert out[11]["rrf_score"] == round(1 / 62 + 1 / 61, 9)


# ------------------------------------------------------------- hll
def test_hll_estimate_within_tolerance_and_validates_m(spark):
    import pytest

    from dbt_incremental_ci_spark.operators.hll import hll_cardinality

    df = spark.range(2000).select((F.col("id") * 7).alias("k"))
    r = hll_cardinality(df, "k", m=128).collect()[0]
    assert r["exact_distinct"] == 2000
    # HLL with m=128 has ~9% std error; 3 sigma bound
    assert abs(r["rel_error"]) < 0.3
    with pytest.raises(ValueError):
        hll_cardinality(df, "k", m=100)


def test_hll_registers_merge_as_max(spark):
    """Sketching two shards then merging registers (max per bucket)
    must equal sketching the union — the mergeability contract."""
    from dbt_incremental_ci_spark.operators.hll import _u32

    df = spark.range(1000).select(F.col("id").alias("k"))
    a, b = df.filter("k < 500"), df.filter("k >= 500")

    def regs(frame):
        bucket = _u32(F.col("k"), "hll:b") % 128
        ur = _u32(F.col("k"), "hll:r")
        rank = F.when(ur == 0, F.lit(33)).otherwise(
            F.lit(32) - F.floor(F.log2(ur)).cast("int")
        )
        return {
            r["__b"]: r["__m"]
            for r in frame.select(bucket.alias("__b"), rank.alias("__r"))
            .groupBy("__b")
            .agg(F.max("__r").alias("__m"))
            .collect()
        }

    ra, rb, ru = regs(a), regs(b), regs(df)
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    assert merged == ru


# ----------------------------------------------------- calibration
def test_calibration_bins_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        calibration_bins,
    )

    rows = [(0.05, False), (0.15, False), (0.15, True), (0.95, True)]
    df = spark.createDataFrame(rows, "prob double, y boolean")
    out = {r["bin"]: r for r in calibration_bins(df, "prob", "y", 10).collect()}
    assert out[0]["n"] == 1 and out[0]["pos_rate"] == 0.0
    assert out[1]["n"] == 2 and out[1]["mean_prob"] == 0.15
    assert out[1]["pos_rate"] == 0.5 and out[1]["gap"] == 0.35
    assert out[1]["ece_term"] == round(0.35 * 2 / 4, 9)
    assert out[9]["n"] == 1 and out[9]["mean_prob"] == 0.95
    assert out[5]["n"] == 0 and out[5]["ece_term"] == 0.0
    assert out[5]["mean_prob"] is None


# ----------------------------------------------------------- funnel
def test_funnel_counts_strict_order(spark):
    from dbt_incremental_ci_spark.operators.patterns import funnel_counts

    rows = [
        # u1 completes the funnel in order
        (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
        # u2 clicks BEFORE viewing -> stops at view
        (2, 100, "click"), (2, 200, "view"),
        # u3 views only
        (3, 100, "view"),
        # u4 never views (click+purchase don't count without a view)
        (4, 100, "click"), (4, 200, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts long, event_type string")
    out = {
        r["step"]: r
        for r in funnel_counts(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert out["view"]["users"] == 3
    assert out["click"]["users"] == 1
    assert out["purchase"]["users"] == 1
    assert out["view"]["conv_from_prev"] is None
    assert out["click"]["conv_from_prev"] == round(1 / 3, 6)
    assert out["purchase"]["conv_from_first"] == round(1 / 3, 6)


def test_hll_merge_equals_full_sketch(spark):
    from dbt_incremental_ci_spark.operators.hll import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    df = spark.range(3000).select(F.col("id").alias("k"))
    full = hll_estimate(hll_registers(df, "k", m=64), 64).collect()[0]
    merged = hll_estimate(
        hll_merge(
            hll_registers(df.filter("k % 3 = 0"), "k", m=64),
            hll_registers(df.filter("k % 3 = 1"), "k", m=64),
            hll_registers(df.filter("k % 3 = 2"), "k", m=64),
        ),
        64,
    ).collect()[0]
    assert merged == full  # register-exact, not approximate


# ---------------------------------------------------- hard negatives
def test_hard_negatives_excludes_same_domain(spark):
    from dbt_incremental_ci_spark import workload

    out = workload.QUERIES["q175_hard_negatives"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out, "expected some negatives"
    for r in out:
        assert r["neg_id"] % 7 != r["anchor_id"] % 7
        assert 1 <= r["rnk"] <= 3


# ------------------------------------------------- negative sampling
def test_negative_sampling_excludes_interactions(spark):
    from dbt_incremental_ci_spark import workload

    sf = "/root/testdata/sf0.001"
    out = workload.QUERIES["q176_negative_sampling"](spark, sf)
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    inter = {
        (r["o_custkey"], r["l_partkey"])
        for r in o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_partkey")
        .distinct()
        .collect()
    }
    rows = out.collect()
    assert rows
    for r in rows:
        assert (r["o_custkey"], r["cand_item"]) not in inter


# -------------------------------------------------------------- srm
def test_srm_check_flags_mismatch(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import srm_check

    rows = [("A",)] * 70 + [("B",)] * 30  # designed 50/50, observed 70/30
    df = spark.createDataFrame(rows, "variant string")
    out = {
        r["variant"]: r
        for r in srm_check(df, "variant", {"A": 0.5, "B": 0.5}).collect()
    }
    # chi2 = (70-50)^2/50 + (30-50)^2/50 = 16 > 3.84
    assert out["A"]["chi2"] == 16.0 and out["A"]["srm"]
    assert out["A"]["expected_n"] == 50.0
    balanced = srm_check(
        spark.createDataFrame([("A",)] * 50 + [("B",)] * 50,
                              "variant string"),
        "variant",
        {"A": 0.5, "B": 0.5},
    ).collect()[0]
    assert balanced["chi2"] == 0.0 and not balanced["srm"]


# ------------------------------------------------------ attribution
def test_linear_attribution_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.attribution import (
        linear_attribution,
    )

    conv = spark.createDataFrame(
        [(1, 1000, 99, 10.0)],
        "user_id int, ts long, event_id int, value double",
    )
    tch = spark.createDataFrame(
        [
            (1, 500, "view"),    # in window
            (1, 800, "click"),   # in window
            (1, 900, "view"),    # in window -> 3 touches, floor shares
            (1, 1000, "click"),  # AT conv ts -> excluded (strict <)
            (1, 100, "view"),    # outside lookback
            (2, 900, "view"),    # other user
        ],
        "user_id int, ts long, channel string",
    )
    out = {
        r["channel"]: r
        for r in linear_attribution(
            conv, tch, "user_id", "ts", "value", "channel",
            lookback=500, id_col="event_id",
        ).collect()
    }
    share = 10_000_000 // 3  # 3333333 micro
    assert out["view"]["attributed_micro"] == 2 * share
    assert out["click"]["attributed_micro"] == share
    assert out["view"]["touches"] == 2 and out["view"]["conversions"] == 1
    assert out["click"]["attributed"] == round(share / 1e6, 6)


# ------------------------------------------------------ expectations
def test_expectation_suite_counts_violations(spark):
    from dbt_incremental_ci_spark.operators import expectations as ex

    child = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, None), (3, "zz"), (None, "a")],
        "k int, v string",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    out = {
        r["check_name"]: r
        for r in ex.suite(
            [
                ex.not_null(child, "k"),
                ex.unique(child, "k"),
                ex.accepted_values(child, "v", ["a", "b"]),
                ex.relationships(child, "k", parent, "pk"),
            ]
        ).collect()
    }
    assert out["not_null:k"]["violations"] == 1
    assert out["unique:k"]["violations"] == 1  # k=1 twice -> 1 excess
    assert out["accepted_values:v"]["violations"] == 1  # 'zz'; NULL passes
    assert out["relationships:k"]["violations"] == 1  # k=3 orphan
    assert not out["unique:k"]["passed"]


def test_expectation_unique_all_distinct_passes(spark):
    from dbt_incremental_ci_spark.operators import expectations as ex

    df = spark.createDataFrame([(1,), (2,)], "k int")
    r = ex.unique(df, "k").collect()[0]
    assert r["violations"] == 0 and r["passed"]


# ------------------------------------------------------ golden record
def test_golden_record_latest_nonnull_value(spark):
    from dbt_incremental_ci_spark import workload

    out = {
        r["user_id"]: r
        for r in workload.QUERIES["q180_golden_record"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert out  # nonempty
    # re-derive one user's expectation directly
    import pyspark.sql.functions as FF

    e = workload.events_table(spark, "/root/testdata/sf0.001")
    uid = next(iter(out))
    rows = (
        e.filter(FF.col("user_id") == uid)
        .orderBy(FF.desc("ts"), FF.desc("event_id"))
        .collect()
    )
    assert out[uid]["last_type"] == rows[0]["event_type"]
    assert out[uid]["n_events"] == len(rows)
    nn = [r for r in rows if r["value"] is not None]
    if nn:
        assert out[uid]["last_value"] == round(nn[0]["value"], 6)


# --------------------------------------------------------- seasonal
def test_seasonal_decompose_gap_yields_null_trend(spark):
    from dbt_incremental_ci_spark import workload

    out = workload.QUERIES["q181_seasonal_decompose"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out
    by_key = {(r["nationkey"], r["midx"]): r for r in out}
    months = {}
    for nk, mi in by_key:
        months.setdefault(nk, set()).add(mi)
    for (nk, mi), r in by_key.items():
        has_neighbors = (mi - 1 in months[nk]) and (mi + 1 in months[nk])
        assert (r["trend"] is not None) == has_neighbors


# ---------------------------------------------------- session metrics
def test_session_metrics_hand_case(spark):
    from dbt_incremental_ci_spark.operators import patterns  # noqa: F401
    from dbt_incremental_ci_spark import workload
    import pyspark.sql.functions as FF

    # verify internal consistency against q30's session counts
    sf = "/root/testdata/sf0.001"
    m = {
        r["user_id"]: r
        for r in workload.QUERIES["q182_session_metrics"](spark, sf).collect()
    }
    s30 = {
        r["user_id"]: r["n_sessions"]
        for r in workload.QUERIES["q30_sessionize"](spark, sf).collect()
    }
    assert m and set(m) == set(s30)
    for uid, r in m.items():
        assert r["n_sessions"] == s30[uid]
        assert 0 <= r["bounces"] <= r["n_sessions"]
        assert r["max_session_sec"] >= 0


# ------------------------------------------------------------ cohort
def test_cohort_retention_offset_zero_is_full(spark):
    from dbt_incremental_ci_spark import workload

    out = workload.QUERIES["q183_cohort_retention"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out
    for r in out:
        if r["offset_weeks"] == 0:
            # every cohort member is active in their first week
            assert r["active_users"] == r["cohort_size"]
            assert r["retention"] == 1.0
        assert r["offset_weeks"] >= 0


# -------------------------------------------------------- association
def test_association_rules_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.association import (
        association_rules,
    )

    rows = [  # 4 baskets; (x,y) together in 2; x in 3, y in 2
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "z"),
        (4, "z"),  # duplicate line -> dedup
    ]
    df = spark.createDataFrame(rows, "b int, i string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(df, "b", "i", min_pair_count=2).collect()
    }
    r = out[("x", "y")]
    assert r["pair_count"] == 2
    assert r["support"] == 0.5            # 2 of 4 baskets
    assert r["conf_a_to_b"] == round(2 / 3, 6)
    assert r["conf_b_to_a"] == 1.0
    assert r["lift"] == round(2 * 4 / (3 * 2), 6)
    assert ("x", "z") not in out          # pair_count 1 < min


def test_association_rules_mega_basket_raises_loudly(spark):
    """Round-4 verdict item 5: pair volume is Σ C(|basket|,2) — a
    degenerate basket above max_basket_items must fail loudly, not
    silently attempt a quadratic blow-up; a raised cap (or None)
    accepts it."""
    import pytest as _pytest

    from dbt_incremental_ci_spark.operators.association import (
        association_rules,
    )

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y")]
    rows += [(9, f"item{i}") for i in range(50)]  # 50-item basket
    df = spark.createDataFrame(rows, "b int, i string")
    with _pytest.raises(Exception, match="max_basket_items"):
        association_rules(df, "b", "i", max_basket_items=10).collect()
    ok = association_rules(df, "b", "i", max_basket_items=50, min_pair_count=2)
    assert {(r["item_a"], r["item_b"]) for r in ok.collect()} == {("x", "y")}


def test_semdedup_arrow_assign_null_vector_propagates(spark):
    from dbt_incremental_ci_spark.operators import semdedup as sd

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r
        for r in sd.semdedup(
            df,
            dim=2,
            n_clusters=2,
            threshold=0.99,
            centroids=[[1.0, 0.0], [0.0, 1.0]],
        ).collect()
    }
    assert out[2]["cluster"] is None and out[2]["centroid_cos"] is None
    assert out[1]["cluster"] == 0 and out[1]["centroid_cos"] == 1.0
    assert out[3]["cluster"] == 1
