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
