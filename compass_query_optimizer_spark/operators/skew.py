"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting is the deterministic fallback when one build-side
key dominates so heavily that even split partitions bottleneck — the
100 TB version of the reference's single-node "TooManyHashEntries" wall
(JoinHashTable.h:53).

``salted_join(large, small, on)`` spreads each large-side row across
``n_salt`` shuffle partitions via a deterministic per-row salt and
replicates the small side ``n_salt``× with `explode` — an equi-join on
(key, salt) whose result is row-identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    n_salt: int = 16,
) -> DataFrame:
    """Join with the large side salted across ``n_salt`` sub-keys.

    The salt is derived from a hash of the large side's full row (xxhash64,
    deterministic), so repeated runs shuffle identically; the small side is
    exploded n_salt×. Output is row-identical to a plain ``large.join(small,
    on, how)`` for ``how`` in {inner, left, left_semi, cross} — large-side
    rows appear once per salt value they hash to (exactly one). Right/full
    outer joins are rejected: the replicated small side would emit each
    unmatched small row n_salt times instead of once."""
    if how not in {"inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side is "
            "replicated n_salt times, so right/full-outer unmatched rows "
            "would be duplicated"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salt))
    big = large.withColumn(SALT_COL, salt.cast("int"))
    rep = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return big.join(rep, keys + [SALT_COL], how).drop(SALT_COL)
