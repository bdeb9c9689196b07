"""Embedding-column statistics and centroid classification — the
"know your vector corpus" operators: per-dimension moments (collapsed
/ dead / high-variance dims are the first thing to audit before ANN
or quantization work) and nearest-class-centroid classification
(Rocchio) with a confusion-matrix readout.

Scale shape: everything is posexplode → hash aggregate. The dim
profile reduces the corpus to a ``dim``-sized frame (64 rows) before
any window; the centroid classifier joins the exploded corpus to a
BROADCAST centroid relation (classes x dims rows — model-sized, not
data-sized) with a fan-out of #classes per point, then reduces to
(point, class) partial dot products. No data-sized sort or collect.

Determinism: element values arrive as exact float→double widenings;
per-element terms are rounded and summed as DECIMAL (order-exact
folds); derived means/variances/cosines are single double expressions
over those exact sums, rounded to 6 dp (workload_base rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dim_variance_profile(
    df: DataFrame,
    vec_col: str = "embedding",
    top: int | None = None,
) -> DataFrame:
    """Per-dimension count / mean / population variance of an
    embedding column; optionally only the ``top`` dimensions by
    variance (descending, dim-ascending tiebreak).

    Output: ``(dim, n, mean, variance, var_rank)``.
    """
    pts = df.select(
        F.posexplode(F.col(vec_col)).alias("dim", "__v")
    ).select("dim", F.col("__v").cast("double").alias("__v"))
    per = pts.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("__v"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("__s1"),
        F.sum(
            F.round(F.col("__v") * F.col("__v"), 10).cast("decimal(38,10)")
        )
        .cast("double")
        .alias("__s2"),
    )
    prof = per.select(
        "dim",
        "n",
        F.round(F.col("__s1") / F.col("n"), 6).alias("mean"),
        F.round(
            (F.col("__s2") - F.col("__s1") * F.col("__s1") / F.col("n"))
            / F.col("n"),
            6,
        ).alias("variance"),
    )
    # dim-sized frame (e.g. 64 rows): deliberate tiny 1-part window
    w = Window.orderBy(F.desc("variance"), F.asc("dim"))
    ranked = prof.withColumn(
        "var_rank", F.row_number().over(w).cast("int")
    )
    if top is not None:
        ranked = ranked.filter(F.col("var_rank") <= top)
    return ranked


def dim_variance_profile_sql(
    rows: str, vec_col: str = "embedding", top: int | None = None
) -> str:
    """DuckDB twin of :func:`dim_variance_profile`."""
    where = f"WHERE var_rank <= {top}" if top is not None else ""
    return f"""
    WITH pts AS (
      SELECT i - 1 AS dim, CAST({vec_col}[i] AS DOUBLE) AS v
      FROM {rows},
           unnest(generate_series(1, len({vec_col}))) AS g(i)
    ),
    per AS (
      SELECT dim, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(v, 6) AS DECIMAL(38,6))) AS DOUBLE)
               AS s1,
             CAST(SUM(CAST(ROUND(v * v, 10) AS DECIMAL(38,10)))
               AS DOUBLE) AS s2
      FROM pts GROUP BY dim
    ),
    prof AS (
      SELECT dim, n,
             ROUND(s1 / n, 6) AS mean,
             ROUND((s2 - s1 * s1 / n) / n, 6) AS variance
      FROM per
    )
    SELECT * FROM (
      SELECT dim, n, mean, variance,
             CAST(row_number() OVER (ORDER BY variance DESC, dim)
               AS INT) AS var_rank
      FROM prof
    ) {where}
    """


def _fit_centroid_model(
    df: DataFrame, vec_col: str, label_col: str
) -> tuple[dict, dict]:
    """Fit per-class mean vectors (terms rounded per the house grid)
    and their L2 norms; returns ``(model, norms)`` with
    ``model[c][dim] -> rounded-6 centroid value``.

    The fitted model is #classes × dims values — driver-bound by the
    same convention as the IVF trained centroids (similarity.py):
    collect it once and score MAP-ONLY via array expressions. The
    only shuffle is the centroid fit itself (n×d → k×d, map-side
    combinable)."""
    pts = df.select(
        F.col(label_col).alias("__lbl"),
        F.posexplode(F.col(vec_col)).alias("dim", "__v"),
    ).select("__lbl", "dim", F.col("__v").cast("double").alias("__v"))
    cent = pts.groupBy(F.col("__lbl").alias("__c"), "dim").agg(
        F.round(
            F.sum(F.round(F.col("__v"), 6).cast("decimal(38,6)"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("__cv")
    )
    cnorm = cent.groupBy("__c").agg(
        F.sqrt(
            F.sum(
                F.round(F.col("__cv") * F.col("__cv"), 12).cast(
                    "decimal(38,12)"
                )
            ).cast("double")
        ).alias("__cn")
    )
    # driver-bound: #classes × dims rows (the fitted model)
    cent_rows = cent.join(cnorm, "__c").collect()
    model: dict = {}
    norms: dict = {}
    for r in cent_rows:
        model.setdefault(r["__c"], {})[r["dim"]] = r["__cv"]
        norms[r["__c"]] = r["__cn"]
    return model, norms


def _vn_expr(vec_d: Column) -> Column:
    """Row L2 norm on the integer micro-grid — exact sums WITHOUT
    per-element BigDecimal work: each rounded term is lifted onto its
    integer micro-grid (round(x,s)*10^s is within ~1e-4 of an integer
    for unit-scale embeddings, so round(.,0) recovers it EXACTLY while
    |term|*10^s < 2^53), summed as plain longs (exact, order-free;
    |sum| < 2^53 so the double cast is exact), divided back by 10^s in
    one correctly-rounded double op — bit-equal to the DECIMAL-sum
    cast the oracle computes."""
    return F.sqrt(
        F.aggregate(
            F.transform(
                vec_d,
                lambda v: F.round(F.round(v * v, 12) * 1e12, 0).cast(
                    "bigint"
                ),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.lit(1e12)
    )


def _cos_to_centroid(model: dict, norms: dict, c, vec_d: Column) -> Column:
    """Rounded-6 cosine of the row vector (``vec_d``, with its norm in
    column ``__vn``) against class ``c``'s collected centroid — the
    literal centroid array is keyed off the MAX observed dim so a
    sparse/ragged fit degrades to 0.0-filled missing dims instead of a
    KeyError. A ragged INPUT vector still null-pads through zip_with
    into a NULL cosine for that class — by design: a malformed row
    must not silently win an argmax."""
    cv = F.array(
        *[
            F.lit(float(model[c].get(d, 0.0)))
            for d in range(max(model[c]) + 1)
        ]
    )
    dot = (
        F.aggregate(
            F.zip_with(
                vec_d,
                cv,
                lambda v, w: F.round(F.round(v * w, 10) * 1e10, 0).cast(
                    "bigint"
                ),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.lit(1e10)
    )
    return F.round(dot / (F.col("__vn") * F.lit(float(norms[c]))), 6)


def nearest_centroid_confusion(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Rocchio / nearest-class-centroid classification by cosine,
    reported as a confusion matrix: fit per-class mean vectors,
    assign every point to the most-cosine-similar centroid
    (rounded-6 cosine, label-ascending tiebreak), count
    (true, predicted) cells.

    Output: ``(label_true, label_pred, n, share)`` — share of the
    true class (6 dp).
    """
    # The r06 shape joined the exploded n×d frame against the
    # centroids and re-aggregated (an n×d×k shuffle plus an n×k argmax
    # window, all linear in the corpus); the collected-model MAP-ONLY
    # scoring leaves only the centroid fit and the k²-cell confusion
    # aggregate as shuffles. Numerics: identical per-term rounding,
    # DECIMAL sums (order-independent), rounded-6 cosine,
    # label-ascending tiebreak. The integer-micro-grid fold in
    # _vn_expr/_cos_to_centroid runs interpreted per element, but long
    # ops there are ~3x cheaper than BigDecimal ones; a fully-unrolled
    # flat Add chain (no lambdas, codegen-able) was also tried and
    # planned 10x SLOWER — Catalyst analysis + codegen of the 640-term
    # tree cost ~16s per build at ANY data size.
    model, norms = _fit_centroid_model(df, vec_col, label_col)
    classes = sorted(model)
    if not classes:  # empty input: no classes to score against
        return df.sparkSession.createDataFrame(
            [],
            "label_true int, label_pred int, n bigint, share double",
        )
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vn = _vn_expr(vec_d)

    def cos_for(c) -> Column:
        return _cos_to_centroid(model, norms, c, vec_d)

    # argmax by (cosine desc, label asc) via struct array_max: ties on
    # the rounded cosine resolve to the LARGEST -c = smallest label
    from dbt_incremental_ci_spark.operators.scaling import (
        ensure_min_parallelism,
    )

    pred = (
        # round-11: the per-row k-centroid integer-micro cosine fold is
        # the query's cost and runs pre-shuffle — spread the projected
        # (label, vec) frame so a single-split local scan doesn't pin
        # it to one core (no-op at cluster split counts)
        ensure_min_parallelism(
            df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
            .select(
                F.col(label_col).alias("__lbl"),
                F.col(vec_col).alias(vec_col),
            )
        )
        .select(
            "__lbl",
            F.col(vec_col).alias(vec_col),
            vn.alias("__vn"),
        )
        .select(
            "__lbl",
            F.array_max(
                F.array(
                    *[
                        F.struct(
                            cos_for(c).alias("cos"),
                            F.lit(-int(c)).alias("negc"),
                        )
                        for c in classes
                    ]
                )
            ).alias("__best"),
        )
        .select("__lbl", (-F.col("__best")["negc"]).alias("__pred"))
    )
    cells = pred.groupBy(
        F.col("__lbl").alias("label_true"),
        F.col("__pred").cast("int").alias("label_pred"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w_true = Window.partitionBy("label_true")
    return cells.select(
        "label_true",
        "label_pred",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w_true), 6
        ).alias("share"),
    )


def nearest_centroid_confusion_sql(
    rows: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> str:
    """DuckDB twin of :func:`nearest_centroid_confusion`."""
    return f"""
    WITH pts AS (
      SELECT {id_col} AS id, {label_col} AS lbl,
             i - 1 AS dim, CAST({vec_col}[i] AS DOUBLE) AS v
      FROM {rows},
           unnest(generate_series(1, len({vec_col}))) AS g(i)
    ),
    cent AS (
      SELECT lbl AS c, dim,
             ROUND(CAST(SUM(CAST(ROUND(v, 6) AS DECIMAL(38,6)))
                     AS DOUBLE) / count(*), 6) AS cv
      FROM pts GROUP BY lbl, dim
    ),
    cnorm AS (
      SELECT c,
             sqrt(CAST(SUM(CAST(ROUND(cv * cv, 12) AS DECIMAL(38,12)))
               AS DOUBLE)) AS cn
      FROM cent GROUP BY c
    ),
    vnorm AS (
      SELECT id,
             sqrt(CAST(SUM(CAST(ROUND(v * v, 12) AS DECIMAL(38,12)))
               AS DOUBLE)) AS vn
      FROM pts GROUP BY id
    ),
    dots AS (
      SELECT p.id, p.lbl, c.c,
             CAST(SUM(CAST(ROUND(p.v * c.cv, 10) AS DECIMAL(38,10)))
               AS DOUBLE) AS dt
      FROM pts p JOIN cent c ON p.dim = c.dim
      GROUP BY p.id, p.lbl, c.c
    ),
    scored AS (
      SELECT d.id, d.lbl, d.c,
             ROUND(d.dt / (v.vn * n.cn), 6) AS cos
      FROM dots d
      JOIN cnorm n ON d.c = n.c
      JOIN vnorm v ON d.id = v.id
    ),
    pred AS (
      SELECT id, lbl, c AS pred FROM (
        SELECT *, row_number() OVER (PARTITION BY id
                    ORDER BY cos DESC, c) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    cells AS (
      SELECT lbl AS label_true, pred AS label_pred,
             CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    )
    SELECT label_true, label_pred, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY label_true), 6) AS share
    FROM cells
    """


def simplified_silhouette(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Simplified silhouette per class (Hruschka et al.'s
    centroid-based variant of Rousseeuw 1987): per point, a = cosine
    distance (1 − cos) to the OWN class centroid, b = distance to the
    nearest OTHER centroid, s = (b − a) / max(a, b); reported as the
    per-class mean plus the share of negative-silhouette points (the
    "probably mislabeled / cluster bleed" fraction).

    The classic silhouette is all-pairs (quadratic); the simplified
    form replaces mean-pairwise distances with centroid distances —
    one collected k×d model and MAP-ONLY scoring, linear in the
    corpus. Distances ride the same rounded-6 cosine grid as
    :func:`nearest_centroid_confusion`, so the DuckDB twin replays the
    pipeline value-exact; s is rounded to 6 dp per point BEFORE the
    DECIMAL-fold mean (order-free).

    Output: ``(label, n, mean_silhouette, n_negative,
    share_negative)``, one row per class.

    FIXED-DIMENSION CONTRACT (round-8 ADVICE item 4): every vector
    must have the corpus's embedding dimensionality. A ragged/short
    vector null-pads through ``zip_with`` to a NULL cosine in Spark,
    while the DuckDB twin's dim inner-join silently computes a
    partial-dot cosine — a cross-engine divergence. Spark-side we
    enforce the contract cheaply: rows whose OWN-class cosine is NULL
    (only possible via a ragged vector or a non-finite component) are
    dropped from the score frame, so they can never enter ``n`` with
    a fabricated s = 0. The twin mirrors the guard (round-9 ADVICE
    item 3): its ``cdim``/``vlen`` CTEs drop every (row, class)
    cosine where ``len(vec) != max(dim)+1`` of that class's centroid
    — exactly the pairs whose Spark ``zip_with`` cosine null-pads to
    NULL — so a mixed-dimension corpus scores identically on both
    engines.
    """
    model, norms = _fit_centroid_model(df, vec_col, label_col)
    classes = sorted(model)
    if len(classes) < 2:  # silhouette undefined without ≥2 clusters
        return df.sparkSession.createDataFrame(
            [],
            "label int, n bigint, mean_silhouette double, "
            "n_negative bigint, share_negative double",
        )
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # materialize each class cosine ONCE per row into a struct array
    # (computing them separately for the own-class branch and the
    # best-other max would evaluate every zip_with fold twice — the
    # r08 first cut did exactly that and ran 2x the q238 cost)
    scored = (
        df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .select(
            F.col(label_col).alias("__lbl"),
            F.col(vec_col).alias(vec_col),
            _vn_expr(vec_d).alias("__vn"),
        )
        .select(
            "__lbl",
            F.array(
                *[
                    F.struct(
                        F.lit(int(c)).alias("c"),
                        _cos_to_centroid(model, norms, c, vec_d).alias(
                            "cos"
                        ),
                    )
                    for c in classes
                ]
            ).alias("__arr"),
        )
    )
    own = F.element_at(
        F.filter(F.col("__arr"), lambda s: s["c"] == F.col("__lbl")), 1
    )["cos"]
    # array_max skips the NULL the own class contributes
    other_best = F.array_max(
        F.transform(
            F.col("__arr"),
            lambda s: F.when(s["c"] != F.col("__lbl"), s["cos"]),
        )
    )
    a = F.round(F.lit(1.0) - own, 6)
    b = F.round(F.lit(1.0) - other_best, 6)
    s = F.when(F.greatest(a, b) > 0, (b - a) / F.greatest(a, b)).otherwise(
        F.lit(0.0)
    )
    # fixed-dim contract guard (see docstring): a ragged vector makes
    # the own-class cosine NULL — NULL out s for that row INSIDE the
    # projection instead of filtering on own.isNotNull(): a Filter
    # would be pushed below the Project, and since codegen's
    # common-subexpression elimination does not span operators, the
    # per-row cosine array would be built TWICE (measured 3.6 → 6.7 s
    # at sf0.1 before this form — the same double-fold pathology the
    # round-8 q357 fix removed). NULLs then fall out of the aggregates
    # (count/sum skip them) at zero extra cost.
    #
    # other_best NULL (round-10 ADVICE): a row matching its own class's
    # centroid dim but NO other class's has b NULL.  When a > 0 the
    # NULL propagates through (b-a)/greatest and s is already NULL,
    # but at a == 0 (own cosine exactly 1.0) ``greatest(0, NULL) = 0``
    # fails the ``> 0`` branch and the .otherwise(0.0) would COUNT the
    # row with s = 0 — while the DuckDB twin's inner join on the
    # other-class cosine subquery drops it.  Silhouette is undefined
    # without a reachable second cluster, so NULL (drop) is the chosen
    # semantics, mirrored here by also guarding on other_best.
    pts = scored.select(
        "__lbl",
        F.when(
            own.isNotNull() & other_best.isNotNull(), F.round(s, 6)
        ).alias("__s"),
    )
    return (
        pts.groupBy(F.col("__lbl").cast("int").alias("label"))
        .agg(
            F.count(F.col("__s")).cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("__s").cast("decimal(38,6)")).cast("double")
                / F.count(F.col("__s")),
                6,
            ).alias("mean_silhouette"),
            F.sum(F.when(F.col("__s") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
            F.round(
                F.sum(F.when(F.col("__s") < 0, 1).otherwise(0))
                / F.count(F.col("__s")).cast("double"),
                6,
            ).alias("share_negative"),
        )
        # a class whose every vector is ragged has no scored points
        .where(F.col("n") > 0)
    )


def simplified_silhouette_sql(
    rows: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> str:
    """DuckDB twin of :func:`simplified_silhouette` (same pts/cent/
    cnorm/dots/scored pipeline as the nearest-centroid twin)."""
    return f"""
    WITH pts AS (
      SELECT {id_col} AS id, {label_col} AS lbl,
             i - 1 AS dim, CAST({vec_col}[i] AS DOUBLE) AS v
      FROM {rows},
           unnest(generate_series(1, len({vec_col}))) AS g(i)
    ),
    cent AS (
      SELECT lbl AS c, dim,
             ROUND(CAST(SUM(CAST(ROUND(v, 6) AS DECIMAL(38,6)))
                     AS DOUBLE) / count(*), 6) AS cv
      FROM pts GROUP BY lbl, dim
    ),
    cnorm AS (
      SELECT c,
             sqrt(CAST(SUM(CAST(ROUND(cv * cv, 12) AS DECIMAL(38,12)))
               AS DOUBLE)) AS cn
      FROM cent GROUP BY c
    ),
    vnorm AS (
      SELECT id,
             sqrt(CAST(SUM(CAST(ROUND(v * v, 12) AS DECIMAL(38,12)))
               AS DOUBLE)) AS vn
      FROM pts GROUP BY id
    ),
    dots AS (
      SELECT p.id, p.lbl, c.c,
             CAST(SUM(CAST(ROUND(p.v * c.cv, 10) AS DECIMAL(38,10)))
               AS DOUBLE) AS dt
      FROM pts p JOIN cent c ON p.dim = c.dim
      GROUP BY p.id, p.lbl, c.c
    ),
    scored AS (
      SELECT d.id, d.lbl, d.c,
             ROUND(d.dt / (v.vn * n.cn), 6) AS cos
      FROM dots d
      JOIN cnorm n ON d.c = n.c
      JOIN vnorm v ON d.id = v.id
    ),
    -- ragged-dim guard mirroring Spark (round-9 ADVICE item 3): a
    -- zip_with cosine is NULL whenever len(vec) != the class centroid
    -- array length (max dim + 1), so the twin must drop exactly those
    -- (row, class) cosines instead of keeping a partial inner-join dot
    cdim AS (
      SELECT c, max(dim) + 1 AS cd FROM cent GROUP BY c
    ),
    vlen AS (
      SELECT {id_col} AS id, len({vec_col}) AS vl FROM {rows}
    ),
    ab AS (
      SELECT o.id, o.lbl,
             ROUND(1 - o.cos, 6) AS a,
             ROUND(1 - x.b_cos, 6) AS b
      FROM (SELECT s.id, s.lbl, s.cos FROM scored s
            JOIN vlen v ON s.id = v.id
            JOIN cdim d ON s.c = d.c
            WHERE s.c = s.lbl AND v.vl = d.cd) o
      JOIN (SELECT s.id, max(s.cos) AS b_cos FROM scored s
            JOIN vlen v ON s.id = v.id
            JOIN cdim d ON s.c = d.c
            WHERE s.c != s.lbl AND v.vl = d.cd GROUP BY s.id) x
        USING (id)
    ),
    s AS (
      SELECT lbl,
             ROUND(CASE WHEN greatest(a, b) > 0
                   THEN (b - a) / greatest(a, b) ELSE 0.0 END, 6) AS s
      FROM ab
    )
    SELECT CAST(lbl AS INT) AS label,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE)
                 / count(*), 6) AS mean_silhouette,
           CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative,
           ROUND(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS share_negative
    FROM s
    GROUP BY lbl
    """
