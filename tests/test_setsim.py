"""Exact set-similarity join (PPJoin-style prefix filter) and
containment join: exactness vs brute force, asymmetry, edge cases."""

import itertools
import random

import pytest

from dbt_incremental_ci_spark.operators import setsim


def _tokset(s):
    return set(t for t in s.lower().split() if t)


def _brute_jaccard(rows, t):
    out = set()
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        a, b = _tokset(ta), _tokset(tb)
        if not a or not b:
            continue
        inter = len(a & b)
        j = inter / (len(a) + len(b) - inter)
        if round(j, 6) >= t:
            out.add((min(ia, ib), max(ia, ib)))
    return out


def _brute_containment(small, big, t):
    out = set()
    for ia, ta in small:
        a = _tokset(ta)
        if not a:
            continue
        for ib, tb in big:
            if ia == ib:
                continue
            b = _tokset(tb)
            if not b:
                continue
            if round(len(a & b) / len(a), 6) >= t:
                out.add((ia, ib))
    return out


VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
         "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi", "rho",
         "sigma", "tau", "ups"]


def _random_corpus(n=60, seed=7):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        k = rnd.randint(1, 12)
        rows.append((i, " ".join(rnd.sample(VOCAB, k))))
    # clones and near-clones to guarantee matches at high thresholds
    rows.append((100, rows[0][1]))
    rows.append((101, rows[1][1] + " extraword"))
    rows.append((102, ""))  # empty doc must be ignored, not crash
    return rows


@pytest.mark.parametrize("threshold", [0.3, 0.6, 0.9])
def test_jaccard_join_exact_vs_brute_force(spark, threshold):
    rows = _random_corpus()
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"])
        for r in setsim.jaccard_set_join(df, threshold=threshold).collect()
    }
    assert got == _brute_jaccard(rows, threshold)


def test_jaccard_join_values_and_clone(spark):
    rows = [(1, "a b c d"), (2, "a b c d"), (3, "a b x y"), (4, "p q r s")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["id_a"], r["id_b"]): r for r in
           setsim.jaccard_set_join(df, threshold=0.2).collect()}
    assert out[(1, 2)]["jaccard"] == 1.0 and out[(1, 2)]["inter"] == 4
    assert out[(1, 3)]["jaccard"] == pytest.approx(2 / 6)
    assert (1, 4) not in out


def test_containment_quote_in_page(spark):
    # a 3-token "quote" fully inside a 12-token "page": Jaccard is low
    # (3/12) but containment is 1.0 — the case the operator exists for.
    quote = (1, "quick brown fox")
    page = (2, "the quick brown fox jumps over a lazy dog near river bank")
    df = spark.createDataFrame([quote, page], ["doc_id", "text"])
    cont = setsim.containment_join(
        df.filter("doc_id = 1"), df, threshold=0.9
    ).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["id_a"], r["id_b"], r["containment"]) == (1, 2, 1.0)
    # symmetric jaccard at the same threshold finds nothing
    assert setsim.jaccard_set_join(df, threshold=0.9).count() == 0
    # and the reverse direction (page contained in quote) fails too
    assert (
        setsim.containment_join(df.filter("doc_id = 2"), df, threshold=0.9).count()
        == 0
    )


def test_containment_vs_brute_force(spark):
    rows = _random_corpus(n=40, seed=11)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    small = df.filter("doc_id % 5 = 0")
    got = {
        (r["id_a"], r["id_b"])
        for r in setsim.containment_join(small, df, threshold=0.7).collect()
    }
    small_rows = [r for r in rows if r[0] % 5 == 0]
    assert got == _brute_containment(small_rows, rows, 0.7)


def test_containment_identical_sets_and_df_cap_exact(spark):
    """Round-5: distinct-set reduction must still emit identical-set
    pairs (containment exactly 1.0, rep_a == rep_b at set level), and
    probe_df_cap must be EXACT at any value — the prefix theorem admits
    any p-subset, so a cap only reorders probes, never drops pairs."""
    rows = _random_corpus(n=40, seed=23)
    # clone some docs so several signatures have multiple members
    rows += [(200 + i, rows[i][1]) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    small = df.filter("doc_id % 5 = 0")
    small_rows = [r for r in rows if r[0] % 5 == 0]
    want = _brute_containment(small_rows, rows, 0.7)
    base = {
        (r["id_a"], r["id_b"])
        for r in setsim.containment_join(small, df, threshold=0.7).collect()
    }
    assert base == want
    # clones of small-side docs must be found with containment 1.0
    assert any(a % 5 == 0 and b >= 200 for a, b in base)
    # any cap (tight, loose, all-capped) returns the identical pair set
    for cap in (1, 5, 10_000, 0):
        got = {
            (r["id_a"], r["id_b"])
            for r in setsim.containment_join(
                small, df, threshold=0.7, probe_df_cap=cap
            ).collect()
        }
        assert got == want, f"cap={cap} changed the result"


def test_threshold_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        setsim.jaccard_set_join(df, threshold=0.0)
    with pytest.raises(ValueError):
        setsim.containment_join(df, df, threshold=1.5)


def test_ceil_mul_exact_on_float_hostile_thresholds(spark):
    """ADVICE r3 (medium): float F.ceil(t*sz) overshoots when the
    double product lands above the exact rational (0.07*100 →
    7.000000000000001 → ceil 8), silently dropping boundary pairs.
    _ceil_mul must equal the exact Fraction ceiling for every (t, sz)
    in a hostile sweep, including a huge-denominator fallback t where
    conservative undershoot is allowed but overshoot never is."""
    import math
    from fractions import Fraction

    from pyspark.sql import functions as F

    from dbt_incremental_ci_spark.operators.setsim import _ceil_mul

    base = spark.range(1, 501).select(F.col("id").alias("sz"))
    for t in (0.07, 0.28, 0.9, 0.85, 0.1, 0.3, 0.55, 0.99, 1.0):
        got = base.select("sz", _ceil_mul(t, "sz").alias("c")).collect()
        frac = Fraction(str(t))
        for r in got:
            want = math.ceil(frac * r["sz"])
            assert r["c"] == want, (t, r["sz"], r["c"], want)
    # pathological denominator → epsilon fallback: never overshoot
    t = 1.0 / 3.0
    got = base.select("sz", _ceil_mul(t, "sz").alias("c")).collect()
    for r in got:
        exact = math.ceil(Fraction(t) * r["sz"])
        assert r["c"] <= exact, (r["sz"], r["c"], exact)
        assert r["c"] >= exact - 1


def test_jaccard_join_pathological_threshold_denominator(spark):
    """Round-10 ADVICE (setsim.py positional filter): a threshold like
    1/3 rationalizes from its decimal string to a ~1e16 denominator;
    ``num * (sz_a + sz_b)`` then overflows int64 and wraps silently
    under non-ANSI Spark, so the positional filter could drop TRUE
    pairs.  The fix skips the positional filter (pruning only) when the
    denominator exceeds the _ceil_mul cap — the result must stay exact
    vs brute force."""
    rows = _random_corpus(seed=13)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    t = 1 / 3  # str() -> '0.3333333333333333', denominator 10**16
    got = {
        (r["id_a"], r["id_b"])
        for r in setsim.jaccard_set_join(df, threshold=t).collect()
    }
    assert got == _brute_jaccard(rows, t)
