"""Skew-mitigation: deterministic salted equi-join.

AQE's skew-join splitting (on by default in ``session.get_spark``) handles
most skew at runtime; explicit salting remains the tool when one join key
dominates so heavily that even split partitions bottleneck (the classic
null-key / celebrity-entity case in web-scale corpora), or when AQE is
unavailable (streaming joins).

Mechanics: the big (skewed) side gets a deterministic salt in ``[0, s)``
derived from a unique column — NOT ``rand()``, which would break retries,
resume, and the oracle; the small side is replicated ``s`` times so every
(key, salt) bucket finds its match. Shuffle keys become (key, salt): a hot
key's rows spread over ``s`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int,
    salt_source: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over
    ``salt_buckets`` reducers.

    ``salt_source`` is any column of ``skewed`` with high cardinality (a
    row id); the salt is ``pmod(xxhash64(salt_source), salt_buckets)`` —
    deterministic per row. ``small`` is replicated ``salt_buckets``×, so
    keep it the dimension side (its shuffle volume multiplies by ``s``).
    """
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    if how not in ("inner", "left", "left_semi", "left_anti", "leftsemi", "leftanti"):
        # right/full would emit each unmatched small-side row once per salt
        # replica — wrong multiplicities by construction
        raise ValueError(f"salted_join supports inner/left/left_semi/left_anti, got {how!r}")
    sk = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))
    )
    sm = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = sk.join(sm, on=[on, "_salt"], how=how)
    return out.drop("_salt")
