"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked result sets.

The two retrieval paths this engine serves — BM25 term search
(``operators.text_index`` / ``operators.ranking``) and embedding kNN
(``operators.knn`` / ``operators.similarity``) — rank by incomparable
scores; RRF (Cormack et al. 2009) fuses them on RANKS alone:

    rrf(d) = Σ_r 1 / (c + rank_r(d))        (c = 60 by convention)

which needs no score normalization, is robust to outliers, and is the
standard first fusion every hybrid-search stack ships. All arithmetic is
a handful of exact integer ranks and double divisions in a fixed
left-associative order, so fused results replay bit-for-bat in a SQL
oracle whenever the component rankings do.

Scale: each input ranking is already a top-k (tiny); the fusion is an
outer join of k-row sets plus a TakeOrderedAndProject — driver-side
nothing, broadcast everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_C = 60


def with_rank(df: DataFrame, order_cols, id_col: str = "id") -> DataFrame:
    """Attach a dense 1-based ``rank`` by the given ordering (ties must be
    broken by the caller's ordering — pass the id last for determinism).
    Single window over an already-tiny top-k set."""
    w = Window.orderBy(*order_cols)
    return df.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "id",
    k: int = 10,
    c: int = RRF_C,
) -> DataFrame:
    """Fuse ranked DataFrames (each carrying ``id_col`` + ``rank``) →
    top-``k`` ``(id_col, rrf, rank_0, rank_1, ...)`` by descending RRF,
    ties to min id. A document absent from a ranking contributes exactly
    +0.0 for it (and reports a NULL rank)."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    sides = [
        r.select(
            F.col(id_col), F.col("rank").cast("long").alias(f"rank_{i}")
        )
        for i, r in enumerate(rankings)
    ]
    joined = sides[0]
    for s in sides[1:]:
        joined = joined.join(s, id_col, "full_outer")
    score = F.coalesce(
        F.lit(1.0) / (F.lit(float(c)) + F.col("rank_0").cast("double")),
        F.lit(0.0),
    )
    for i in range(1, len(sides)):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"rank_{i}").cast("double")),
            F.lit(0.0),
        )
    return (
        joined.select(
            F.col(id_col),
            score.alias("rrf"),
            *[F.col(f"rank_{i}") for i in range(len(sides))],
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
        .limit(k)
    )
