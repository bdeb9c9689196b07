"""SemDeDup-style semantic deduplication over an embedding column.

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): k-means the
corpus embeddings, compare pairs only WITHIN a cluster (the clusters
bound the quadratic), call a pair semantic duplicates above a cosine
threshold, and keep the member with the LOWEST similarity to the
cluster centroid (the most "extreme" exemplar generalizes best).

Deterministic variant implemented here (and replayed value-exactly by
the DuckDB oracle): a document is dropped iff some same-cluster
neighbor above the threshold has strictly lower keeper priority
``(round(centroid_cos, 6), id)`` — pairwise domination rather than the
paper's iterative scan, so the kept set is order-free and
engine-reproducible. Ties are impossible (ids are distinct).

Scale shape: cluster assignment is a map-side expression against
broadcast centroid literals (hash-derived defaults or
``similarity.train_ivf_centroids`` output — SemDeDup's own k-means
step); the only shuffle is the within-cluster self-join, whose cost is
sum of squared cluster sizes — the knob is ``n_clusters`` (the paper
uses ~100k clusters at web scale to keep clusters ~1k docs). Nothing
driver-sized anywhere.

No counterpart in the reference repo; part of the training-data
operator surface this engine adds on top.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.similarity import (
    cosine,
    dot,
    dot_arrow,
    ivf_assign,
    ivf_centroid,
)


def _assign_arrow(centroids: list[list[float]]) -> "Column":
    """Arrow-batch (cluster, centroid_cos, norm) for trained centroids.

    The expression path unrolls k `aggregate(zip_with(...))` folds —
    k x dim interpreted element-ops per row (~5k nodes at k=79, past
    the janino codegen budget, so it runs interpreted: measured as the
    dominant cost of the q111 sf1 gate run). One numpy batch computes
    the full distance matrix via the norm expansion instead; round-9
    before argmin gives the same cell as the fold (centroid-distance
    gaps are O(1), the oracle's own immunity argument), round-6 on the
    cosine is the dot_arrow contract."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    cn2 = (C * C).sum(1)
    cn = np.sqrt(cn2)

    @F.pandas_udf(
        "struct<cluster:int, centroid_cos:double, norm:double>"
    )
    def _assign(v: pd.Series) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "cluster": pd.array([None] * len(v), dtype="Int32"),
                "centroid_cos": pd.array([None] * len(v), dtype="Float64"),
                "norm": pd.array([None] * len(v), dtype="Float64"),
            }
        )
        # NULL vectors yield NULL struct fields, matching the
        # expression path's null-propagation semantics
        mask = v.notna().to_numpy()
        if not mask.any():
            return out
        V = np.vstack(v.to_numpy()[mask]).astype(np.float64)
        G = V @ C.T
        d = np.round(
            (V * V).sum(1)[:, None] - 2.0 * G + cn2[None, :], 9
        )
        cell = np.argmin(d, axis=1)
        vn = np.sqrt((V * V).sum(1))
        denom = vn * cn[cell]
        cos = np.where(
            denom > 0, G[np.arange(len(cell)), cell] / denom, 0.0
        )
        out.loc[mask, "cluster"] = cell.astype("int32")
        out.loc[mask, "centroid_cos"] = np.round(cos, 6)
        out.loc[mask, "norm"] = vn
        return out

    return _assign


def semdedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_clusters: int = 8,
    threshold: float = 0.95,
    seed: int = 7,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(id_col, cluster, centroid_cos, semdedup_keep) for every input
    row. ``centroid_cos`` is the cosine to the assigned cluster's
    centroid rounded to 6; ``semdedup_keep`` is false iff a same-
    cluster neighbor with cosine >= ``threshold`` (rounded to 6) has a
    strictly lower (centroid_cos, id) keeper priority."""
    proj = emb.select(
        F.col(id_col).alias("__id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__v"),
    )
    if centroids is not None:
        # trained path: one Arrow batch per partition replaces the
        # k x dim interpreted fold per row (see _assign_arrow)
        asg = proj.withColumn("__a", _assign_arrow(centroids)(F.col("__v")))
        base = asg.select(
            "__id",
            "__v",
            F.col("__a.cluster").alias("cluster"),
            F.col("__a.centroid_cos").alias("centroid_cos"),
            F.col("__a.norm").alias("__n"),
        ).localCheckpoint(eager=False)
    else:
        cvecs = [ivf_centroid(dim, c, seed) for c in range(n_clusters)]
        carr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cvecs])
        base = proj.withColumn(
            "cluster", ivf_assign("__v", dim, n_clusters, seed, None)
        ).withColumn(
            "centroid_cos",
            F.round(
                cosine(
                    F.col("__v"), F.element_at(carr, F.col("cluster") + 1)
                ),
                6,
            ),
        ).withColumn(
            "__n", F.sqrt(dot(F.col("__v"), F.col("__v")))
        ).localCheckpoint(eager=False)
    # ^ referenced by both self-join sides AND the final keep join:
    # without truncating lineage the centroid-distance assignment
    # (n_clusters × dim expression per row) executes three times.
    a = base.select(
        F.col("__id").alias("__ida"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        "cluster",
        F.col("centroid_cos").alias("__cca"),
    )
    b = base.select(
        F.col("__id").alias("__idb"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        "cluster",
        F.col("centroid_cos").alias("__ccb"),
    )
    # Pairwise cosine through the Arrow dot (norms precomputed per
    # row): the interpreted zip_with fold costs ~26 µs/pair — 50 s for
    # the 1.9M within-cluster pairs a skewed clustering produces at
    # sf0.1 — where the einsum batch is milliseconds. Same
    # numerator/denominator shape as the oracle's
    # dp(a,b)/(sqrt(dp(a,a))·sqrt(dp(b,b))), round-6 absorbs the
    # association difference (the dot_arrow contract, validated on the
    # q36 family).
    denom = F.col("__na") * F.col("__nb")
    pair_cos = F.when(
        denom > 0, dot_arrow()(F.col("__va"), F.col("__vb")) / denom
    ).otherwise(F.lit(0.0))
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(F.round(pair_cos, 6) >= threshold)
    )
    losers = pairs.select(
        F.when(
            F.struct(F.col("__cca"), F.col("__ida"))
            > F.struct(F.col("__ccb"), F.col("__idb")),
            F.col("__ida"),
        )
        .otherwise(F.col("__idb"))
        .alias("__id")
    ).dropDuplicates(["__id"])
    return (
        base.join(losers.withColumn("__lost", F.lit(1)), "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "cluster",
            "centroid_cos",
            F.col("__lost").isNull().alias("semdedup_keep"),
        )
    )
