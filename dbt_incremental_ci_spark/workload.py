"""The engine's query workload — registration hub.

The queries live in twelve band modules (split round 5, verdict item 8;
the original single module had grown past 9k lines):

- ``workload_q1`` — q01-q50 (reference-parity relational band + first
  pipeline operators)
- ``workload_q2`` — q51-q100 (sampling, dedup/ANN, text quality,
  retrieval, pagination)
- ``workload_q3`` — q101-q145 (curation v2, sketches, graph, drift,
  IVM, timeseries)
- ``workload_q4`` — q146-q184 (eval metrics, privacy, linkage,
  CDC/SCD2, HLL, patterns)
- ``workload_q5`` — q185+ (round-5 additions: HLL set ops / sketch
  cube, Benford, WOE/IV, conformal, ANN recall, FD discovery,
  attribution variants, histogram quantiles, readability, moments,
  phrase search, CUSUM, confusion matrix, bitemporal as-of,
  categorical drift, skyline, peak concurrency)
- ``workload_q6`` — q204-q227 (ranking eval NDCG/MAP/lift, IPS off-policy
  eval, concentration/Gini, JS divergence, mutual information,
  trimmed stats, zone-map pruning, power analysis, weighted
  quantiles, rare-collapse, n-gram novelty, feature-hash stats,
  Wilson slice metrics, Poisson bootstrap, mergeable MinHash +
  LSH-banding QA, HITS, dataset card, Krippendorff alpha, quantile
  normalization, split-leakage audit)
- ``workload_q7`` — q228+ (round-6 additions: survival analysis +
  log-rank, BH-FDR, doubly-robust OPE, group k-fold, Simpson audit,
  Apriori L3, skip-gram PMI + G² collocations, RAKE, JL projection,
  embedding dim profile, nearest-centroid, Mann-Whitney, mergeable
  moments, Zipf/Heaps fits, decision stump, CUPED/SMD, TF-IDF pair
  join, dedup threshold curve, Markov accuracy, reshard audit, CMS
  accuracy, two-hop, HLL overlap matrix, DAU/WAU, sorted-neighborhood
  blocking, assortativity, burstiness, RBO rank agreement, operating
  point, dedup impact)
- ``workload_q12`` — q365+ (round-8 third batch: content-defined
  chunk dedup, Kneser-Ney bigram LM, two-way fixed effects,
  Aalen-Johansen competing risks, power-iteration top eigenpair,
  audio autocorrelation period detection, cross-source chunk
  contamination, IV/Wald LATE estimator, difference-in-differences,
  Weiszfeld geometric median, Freedman-Diaconis adaptive histogram,
  Bloom FPR curve, LOSO rank stability, session-gap sensitivity,
  Fightin'-Words log-odds terms, dedup transitivity audit, Qini
  uplift curve)
- ``workload_q11`` — q357+ (round-8 second batch: simplified
  silhouette, RFM quintile segmentation, interval-overlap range join
  (session concurrency), ε-DP clipped mean, perceptual image aHash,
  scene-change keyframe selection, media shard planning off exact
  encoder byte formulas, Church-Gale term burstiness)
- ``workload_q10`` — q339+ (round-8 additions: negative-path
  multimodal QA with oracle-predicted skip counts, temperature-
  scaling calibration grid, confident-learning label-noise matrix,
  Ljung-Box whiteness test, fairness audit, weighted reservoir
  sampling, shuffle-key skew census, canary probe extraction,
  facility-location subset selection, license-conflict audit,
  A/V sync check, weighted Cohen's kappa, exact Shapley reach
  attribution, Burrows-delta stylometry, shingle-size curve,
  tokenizer fertility, ε-DP histogram release, revenue drawdown)
- ``workload_q9`` — q310+ (round-7 build: REAL multimodal decode
  proofs — BMP/PPM images (q310-q313), WAV/PCM16 audio (q333-q334),
  uncompressed-AVI video (q335), joint QA gate (q336) — plus
  Cochran-Armitage, Mantel-Haenszel, IPF raking, Chao1, quantile-reg
  grid, LOSO valuation, cross-source dup matrix, Brier decomposition,
  QTE, AMS F2, EB shrinkage, Hill index, Wasserstein-1, zlib
  compression filter, segmented trend, overdispersion, isotonic PAVA,
  dedup degree histogram, filter waterfall, SPRT crossing, grouped
  jackknife)
- ``workload_q8`` — q262+ (round-7 additions: link prediction CN/RA/AA,
  item-item co-occurrence cosine, Kruskal-Wallis, one-way ANOVA +
  Brown-Forsythe, effect sizes d/g/Cliff's δ, Spearman, ACF,
  Good-Turing, sequential patterns, seasonal-naive MASE, IND / key
  discovery, Page-Hinkley, embedding covariance, reciprocal best
  match, Theil-Sen, Kendall tau-b, rec coverage/novelty, popularity
  hit rate, Shannon diversity, audience-overlap Jaccard, Gini gain,
  time-to-convert percentiles, key-skew audit, entropy rate,
  grid-density clustering, join-size estimation, TextRank, HLL
  accuracy curve, LSH parameter planner, CEM ATT, dow-hour profile,
  dedup pair explanations, group conformal coverage, rich club,
  inter-event burstiness, TWAP, token-budget waterfilling)

Importing this module imports all thirteen, which registers every query
into the shared ``QUERIES``/``ORACLES`` registries defined in
``workload_base`` (the @q decorator). External surface is unchanged:
``workload.QUERIES``, ``workload.get_oracles``, ``workload.t``,
``workload.events_table`` etc. all resolve exactly as before the
split. Determinism rules (decimal casts, rounding, lowercase aliases)
are documented in ``workload_base``.
"""

from __future__ import annotations

from dbt_incremental_ci_spark.workload_base import (  # noqa: F401
    _LAZY_ORACLES,
    ORACLES,
    QUERIES,
    d,
    dec,
    events_table,
    get_oracles,
    q,
    t,
)

# import order matters: later bands import helpers from earlier ones
from dbt_incremental_ci_spark import workload_q1  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q2  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q3  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q4  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q5  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q6  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q7  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q8  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q9  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q10  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q11  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q12  # noqa: F401,E402
from dbt_incremental_ci_spark import workload_q13  # noqa: F401,E402
