"""Skew-mitigation joins: explicit key salting.

AQE's skew-join split (``spark.sql.adaptive.skewJoin``) handles most
skew by splitting oversized shuffle partitions, but it only helps
sort-merge joins and only when the skew shows up in shuffle-file
sizes. Explicit salting is the deterministic fallback for the
pathological case — one key carrying a double-digit percentage of a
100 TB fact table — and for shuffled-hash paths AQE won't split:

  - the BIG side gets a uniform salt in ``[0, salts)`` derived by
    hashing the whole row (cheap, no extra column needed from the
    caller),
  - the SMALL side is replicated ``salts`` times via ``explode``,
  - the join key becomes (key, salt), so the hot key's rows spread
    over ``salts`` reducers instead of one straggler.

Replication multiplies the small side by ``salts`` — keep it for
dimension-sized right sides (the same regime where ``broadcast()``
would apply if the dim fit in memory; salting is for when it does
not quite, or when the build side must stay on disk).

Result is IDENTICAL to ``big.join(small, on=keys, how=...)`` — the
salt is an implementation detail that never escapes. Supported hows:
inner and left (the replicated side must be the non-preserved side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Join ``big`` to ``small`` on ``on`` with the big side salted
    ``salts`` ways and the small side replicated to match."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if salts < 1:
        raise ValueError("salts must be >= 1")
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"column {_SALT} already present")

    # pmod(hash(*)) is uniform and needs no caller-provided id; xxhash64
    # keeps it cheap and JVM-side
    b = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
    )
    s = small.withColumn(
        _SALT, F.explode(F.array([F.lit(i) for i in range(salts)]))
    )
    return b.join(s, on=[*on, _SALT], how=how).drop(_SALT)
