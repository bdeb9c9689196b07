"""Decision-stump training — the one-level tree that anchors weak
supervision, boosting, and feature-screening pipelines: over a
candidate threshold grid on a numeric feature, pick the split
maximizing information gain on a binary label (Quinlan's ID3
criterion at depth 1).

Scale shape: one (min, max) aggregate fixes the equal-width candidate
grid (exact arithmetic over two scalars — no data-adaptive quantiles,
so both engines derive identical thresholds); the corpus then
fans out x #candidates (bounded, default 9 — the Poisson-bootstrap
B-fold precedent: you budget the candidate count, not passes) into
one hash aggregate of per-candidate left/right label counts. Entropy
arithmetic is a fixed double expression over exact integer counts.
No window, sort, or collect anywhere; output is #candidates rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _h(p: F.Column) -> F.Column:
    """Binary entropy with 0·ln0 = 0, p an exact-count ratio."""
    q = F.lit(1.0) - p
    term_p = F.when(p > 0, -p * F.log(p)).otherwise(F.lit(0.0))
    term_q = F.when(q > 0, -q * F.log(q)).otherwise(F.lit(0.0))
    return term_p + term_q


def decision_stump(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    candidates: int = 9,
) -> DataFrame:
    """Evaluate ``candidates`` equal-width thresholds between the
    feature's min and max; report each split's confusion counts and
    information gain, ranked (1 = best split).

    ``label_col`` must be boolean. Output per candidate:
    ``(k, threshold, n_left, pos_left, n_right, pos_right,
    info_gain, gain_rank)`` — threshold at 6 dp, gain at 9 dp,
    rank ties broken by k.
    """
    bounds = df.agg(
        F.min(feature_col).cast("double").alias("__mn"),
        F.max(feature_col).cast("double").alias("__mx"),
    )
    spine = df.sparkSession.range(1, candidates + 1).select(
        F.col("id").cast("int").alias("k")
    )
    grid = F.broadcast(bounds.crossJoin(spine)).select(
        "k",
        (
            F.col("__mn")
            + F.col("k")
            * (F.col("__mx") - F.col("__mn"))
            / F.lit(float(candidates + 1))
        ).alias("__thr"),
    )
    pts = df.select(
        F.col(feature_col).cast("double").alias("__x"),
        F.col(label_col).cast("int").alias("__y"),
    )
    # bounded fan-out: corpus x candidates, map-side combined
    cells = (
        pts.crossJoin(F.broadcast(grid))
        .groupBy("k", "__thr")
        .agg(
            F.sum(F.when(F.col("__x") <= F.col("__thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_left"),
            F.sum(
                F.when(F.col("__x") <= F.col("__thr"), F.col("__y")).otherwise(0)
            )
            .cast("bigint")
            .alias("pos_left"),
            F.sum(F.when(F.col("__x") > F.col("__thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_right"),
            F.sum(
                F.when(F.col("__x") > F.col("__thr"), F.col("__y")).otherwise(0)
            )
            .cast("bigint")
            .alias("pos_right"),
        )
    )
    n = (F.col("n_left") + F.col("n_right")).cast("double")
    pos = (F.col("pos_left") + F.col("pos_right")).cast("double")
    h_parent = _h(pos / n)
    nl, nr = F.col("n_left").cast("double"), F.col("n_right").cast("double")
    h_l = F.when(
        F.col("n_left") > 0, _h(F.col("pos_left").cast("double") / nl)
    ).otherwise(F.lit(0.0))
    h_r = F.when(
        F.col("n_right") > 0, _h(F.col("pos_right").cast("double") / nr)
    ).otherwise(F.lit(0.0))
    gain = F.round(h_parent - (nl / n) * h_l - (nr / n) * h_r, 9)
    scored = cells.select(
        "k",
        F.round(F.col("__thr"), 6).alias("threshold"),
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        gain.alias("info_gain"),
    )
    # candidate-sized frame: deliberate tiny 1-part window
    w = Window.orderBy(F.desc("info_gain"), F.asc("k"))
    return scored.withColumn(
        "gain_rank", F.row_number().over(w).cast("int")
    )


def decision_stump_sql(
    rows: str, feature_col: str, label_col: str, candidates: int = 9
) -> str:
    """DuckDB twin of :func:`decision_stump`."""
    return f"""
    WITH bounds AS (
      SELECT CAST(min({feature_col}) AS DOUBLE) AS mn,
             CAST(max({feature_col}) AS DOUBLE) AS mx
      FROM {rows}
    ),
    grid AS (
      SELECT CAST(k AS INT) AS k,
             mn + k * (mx - mn) / {float(candidates + 1)!r} AS thr
      FROM bounds, unnest(generate_series(1, {candidates})) AS g(k)
    ),
    cells AS (
      SELECT g.k, g.thr,
        CAST(SUM(CASE WHEN CAST(p.{feature_col} AS DOUBLE) <= g.thr
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_left,
        CAST(SUM(CASE WHEN CAST(p.{feature_col} AS DOUBLE) <= g.thr
                 THEN CAST(p.{label_col} AS INT) ELSE 0 END) AS BIGINT)
          AS pos_left,
        CAST(SUM(CASE WHEN CAST(p.{feature_col} AS DOUBLE) > g.thr
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_right,
        CAST(SUM(CASE WHEN CAST(p.{feature_col} AS DOUBLE) > g.thr
                 THEN CAST(p.{label_col} AS INT) ELSE 0 END) AS BIGINT)
          AS pos_right
      FROM {rows} p CROSS JOIN grid g
      GROUP BY g.k, g.thr
    ),
    ent AS (
      SELECT *,
        CAST(n_left + n_right AS DOUBLE) AS n,
        CAST(pos_left + pos_right AS DOUBLE) AS pos
      FROM cells
    ),
    gains AS (
      SELECT k, ROUND(thr, 6) AS threshold,
             n_left, pos_left, n_right, pos_right,
             ROUND(
               (CASE WHEN pos/n > 0 THEN -(pos/n)*ln(pos/n) ELSE 0 END
                + CASE WHEN 1-pos/n > 0
                       THEN -(1-pos/n)*ln(1-pos/n) ELSE 0 END)
               - (n_left/n) * (CASE WHEN n_left > 0 THEN
                   (CASE WHEN CAST(pos_left AS DOUBLE)/n_left > 0
                     THEN -(CAST(pos_left AS DOUBLE)/n_left)
                          *ln(CAST(pos_left AS DOUBLE)/n_left)
                     ELSE 0 END
                    + CASE WHEN 1-CAST(pos_left AS DOUBLE)/n_left > 0
                     THEN -(1-CAST(pos_left AS DOUBLE)/n_left)
                          *ln(1-CAST(pos_left AS DOUBLE)/n_left)
                     ELSE 0 END) ELSE 0 END)
               - (n_right/n) * (CASE WHEN n_right > 0 THEN
                   (CASE WHEN CAST(pos_right AS DOUBLE)/n_right > 0
                     THEN -(CAST(pos_right AS DOUBLE)/n_right)
                          *ln(CAST(pos_right AS DOUBLE)/n_right)
                     ELSE 0 END
                    + CASE WHEN 1-CAST(pos_right AS DOUBLE)/n_right > 0
                     THEN -(1-CAST(pos_right AS DOUBLE)/n_right)
                          *ln(1-CAST(pos_right AS DOUBLE)/n_right)
                     ELSE 0 END) ELSE 0 END), 9) AS info_gain
      FROM ent
    )
    SELECT k, threshold, n_left, pos_left, n_right, pos_right,
           info_gain,
           CAST(row_number() OVER (ORDER BY info_gain DESC, k) AS INT)
             AS gain_rank
    FROM gains
    """
