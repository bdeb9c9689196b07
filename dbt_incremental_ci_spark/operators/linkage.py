"""Probabilistic record linkage — Fellegi & Sunter (1969) scoring.

Links records across two sources without a shared key: block on
cheap deterministic keys (every pair NOT sharing a block key is never
generated — the linkage analogue of LSH banding), compare a handful
of fields per candidate pair, and sum per-field log-likelihood-ratio
weights:

    agree on field i   → log2(m_i / u_i)        (positive evidence)
    disagree on field i → log2((1-m_i)/(1-u_i))  (negative evidence)

where m_i = P(agree | true match) and u_i = P(agree | non-match) —
the parametrization used by production linkers (e.g. the Splink
family). m/u here are caller-supplied priors; EM fitting would sit on
top of the same pair frame.

Scale: the only joins are block-key equi-joins (shuffle on the block
key, AQE splits hot blocks); field comparison and scoring are pure
Column expressions. Pair volume is Σ_blocks |L_b|·|R_b| — the
blocking-key choice is the knob, exactly as in the dedup stack
(operators/dedup.py, operators/fuzzy.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_pairs(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
) -> DataFrame:
    """Candidate pairs sharing every block key. Columns are prefixed
    ``l_``/``r_`` (the test tables' own prefixes are preserved —
    callers pass already-prefixed frames)."""
    return left.join(right, on=block_cols, how="inner")


def fs_score(
    pairs: DataFrame,
    agreements: dict[str, tuple[Column, float, float]],
) -> DataFrame:
    """Add per-field agreement flags and the summed Fellegi-Sunter
    match weight. ``agreements`` maps field name → (agree_expr, m, u).
    Weights are compile-time Python floats, so the whole score is one
    codegen'd expression."""
    out = pairs
    total = F.lit(0.0)
    for name, (agree, m, u) in agreements.items():
        w_a = math.log2(m / u)
        w_d = math.log2((1.0 - m) / (1.0 - u))
        out = out.withColumn(f"agree_{name}", agree)
        total = total + F.when(F.col(f"agree_{name}"), F.lit(w_a)).otherwise(
            F.lit(w_d)
        )
    return out.withColumn("fs_weight", F.round(total, 6))


def linkage_em_fit(
    pairs: DataFrame,
    agree_cols: list[str],
    m_init: dict[str, float] | None = None,
    u_init: dict[str, float] | None = None,
    lam_init: float = 0.1,
    n_iter: int = 20,
    tol: float = 1e-6,
    clip: float = 1e-6,
) -> dict:
    """Fit Fellegi-Sunter m/u (and the match proportion λ) by EM over
    an already-blocked candidate pair frame with boolean agreement
    columns — the unsupervised fit production linkers (Splink; Winkler
    1988) use, so the linker is usable without hand-supplied priors
    (round-4 verdict item 7).

    Model: each pair is a mixture of "true match" (agreement on field
    i ~ Bernoulli(m_i)) and "non-match" (~ Bernoulli(u_i)) with mixing
    weight λ, fields conditionally independent (the standard FS
    assumption).

    E-step: P(match | γ) per pair, computed in log space as a pure
    Column expression (the per-iteration parameters are compile-time
    Python floats, so each pass is one codegen'd projection).
    M-step: m_i = Σ w·γ_i / Σ w, u_i = Σ (1−w)·γ_i / Σ (1−w),
    λ = Σ w / N — ONE hash aggregate per iteration collecting a single
    2+2k-value row; the pair frame itself never reaches the driver.
    Estimates are clipped to [clip, 1−clip] so log-weights stay finite.

    Returns ``{"m": {...}, "u": {...}, "lam": float,
    "iterations": int, "converged": bool}`` — feed ``m``/``u``
    straight into :func:`fs_score`'s agreements dict.
    """
    m = {c: (m_init or {}).get(c, 0.9) for c in agree_cols}
    u = {c: (u_init or {}).get(c, 0.1) for c in agree_cols}
    lam = lam_init

    def _clip(x: float) -> float:
        return min(max(x, clip), 1.0 - clip)

    # The pair frame is re-scanned once per iteration — truncate its
    # (possibly expensive blocked-join) lineage once up front.
    pairs = pairs.select(
        *[F.col(c).cast("boolean").alias(c) for c in agree_cols]
    ).localCheckpoint(eager=False)

    converged = False
    it = 0
    for it in range(1, n_iter + 1):
        log_num = F.lit(math.log(lam))
        log_den = F.lit(math.log(1.0 - lam))
        for c in agree_cols:
            g = F.col(c)
            log_num = log_num + F.when(
                g, F.lit(math.log(m[c]))
            ).otherwise(F.lit(math.log(1.0 - m[c])))
            log_den = log_den + F.when(
                g, F.lit(math.log(u[c]))
            ).otherwise(F.lit(math.log(1.0 - u[c])))
        # responsibility in log space: 1 / (1 + exp(den - num))
        w = F.lit(1.0) / (F.lit(1.0) + F.exp(log_den - log_num))
        aggs = [
            F.sum(w).alias("__sw"),
            F.count(F.lit(1)).alias("__n"),
        ]
        for c in agree_cols:
            aggs.append(
                F.sum(F.when(F.col(c), w).otherwise(0.0)).alias(f"__mw_{c}")
            )
            aggs.append(
                F.sum(F.when(F.col(c), F.lit(1.0) - w).otherwise(0.0)).alias(
                    f"__uw_{c}"
                )
            )
        # driver-bound: single aggregate row of 2 + 2·len(agree_cols)
        # doubles per iteration (EM parameter update is inherently a
        # driver-side scalar recurrence)
        row = pairs.agg(*aggs).collect()[0]
        sw, n = float(row["__sw"]), float(row["__n"])
        if n == 0:
            raise ValueError("linkage_em_fit: empty pair frame")
        new_m = {c: _clip(float(row[f"__mw_{c}"]) / sw) for c in agree_cols}
        new_u = {
            c: _clip(float(row[f"__uw_{c}"]) / (n - sw)) for c in agree_cols
        }
        new_lam = _clip(sw / n)
        delta = max(
            abs(new_lam - lam),
            *(abs(new_m[c] - m[c]) for c in agree_cols),
            *(abs(new_u[c] - u[c]) for c in agree_cols),
        )
        m, u, lam = new_m, new_u, new_lam
        if delta < tol:
            converged = True
            break
    return {
        "m": m,
        "u": u,
        "lam": lam,
        "iterations": it,
        "converged": converged,
    }


def classify(
    scored: DataFrame,
    upper: float,
    lower: float,
) -> DataFrame:
    """Fellegi-Sunter three-way decision: link / possible / non-link."""
    return scored.withColumn(
        "decision",
        F.when(F.col("fs_weight") >= upper, F.lit("link"))
        .when(F.col("fs_weight") <= lower, F.lit("non_link"))
        .otherwise(F.lit("possible")),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_col: str,
    id_col: str,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD'95):
    candidate pairs are records within ``window`` positions of each
    other in ``sort_col`` order — the classic alternative to key
    blocking when near-matches share a PREFIX/ordering rather than an
    exact key (names, addresses).

    Distributed shape: the global rank comes from
    :func:`~.ranks.two_phase_row_number` (partition-parallel); the
    neighborhood theta-join (0 < rank_b − rank_a ≤ w) is rewritten as
    an EQUI-join on rank + an exploded 1..w offset — candidate volume
    is EXACTLY n·w, never n².

    Output: ``(id_a, id_b, rank_gap)`` with id_a at the lower rank.
    """
    from dbt_incremental_ci_spark.operators.ranks import (
        two_phase_row_number,
    )

    ranked = two_phase_row_number(
        df.select(
            F.col(sort_col).alias("__sk"), F.col(id_col).alias("__id")
        ),
        [F.asc("__sk"), F.asc("__id")],
        out_col="__rn",
    ).localCheckpoint(eager=False)  # both join sides branch from this
    offs = F.array(*[F.lit(i) for i in range(1, window + 1)])
    probes = ranked.select(
        F.col("__id").alias("id_a"),
        F.col("__rn").alias("__ra"),
        F.explode(offs).alias("__gap"),
    ).select("id_a", "__gap", (F.col("__ra") + F.col("__gap")).alias("__rn"))
    return probes.join(
        ranked.select(F.col("__id").alias("id_b"), "__rn"), "__rn"
    ).select("id_a", "id_b", F.col("__gap").cast("int").alias("rank_gap"))


def sorted_neighborhood_pairs_sql(
    rows: str, sort_col: str, id_col: str, window: int = 3
) -> str:
    """DuckDB twin of :func:`sorted_neighborhood_pairs`."""
    return f"""
    WITH ranked AS (
      SELECT {id_col} AS id,
             row_number() OVER (ORDER BY {sort_col}, {id_col}) AS rn
      FROM {rows}
    ),
    probes AS (
      SELECT r.id AS id_a, o.gap, r.rn + o.gap AS rn
      FROM ranked r,
           (SELECT unnest(generate_series(1, {window})) AS gap) o
    )
    SELECT p.id_a, b.id AS id_b, CAST(p.gap AS INT) AS rank_gap
    FROM probes p JOIN ranked b ON p.rn = b.rn
    """
