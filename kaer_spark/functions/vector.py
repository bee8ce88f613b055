"""Vector distance expressions — Catalyst higher-order functions, no UDFs.

The reference's distance is squared L2 evaluated inside its HNSW library
(SURVEY.md O15; call site ``/root/reference/db/db.go:137``). Here distances
are ordinary column expressions (``zip_with`` + ``aggregate``), so they run
JVM-side under whole-stage codegen and Catalyst can plan
``ORDER BY dist LIMIT k`` as ``TakeOrderedAndProject`` — a per-partition
heap top-k with no global sort and no resident index.

All arithmetic is performed in float64 (inputs cast from ``array<float>``),
which both makes results deterministic across runs and matches what a
float64 oracle (DuckDB) computes on the same parquet data: the float32 →
float64 widening is exact, and the subsequent IEEE ops are identical.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _as_col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def _as_double_array(v: ColumnOrName | Sequence[float]) -> Column:
    """Accept a column name, a Column, or a Python list of floats."""
    if isinstance(v, (list, tuple)):
        return F.array(*[F.lit(float(x)) for x in v])
    return _as_col(v).cast("array<double>")


def l2sq(a: ColumnOrName, b: ColumnOrName | Sequence[float]) -> Column:
    """Squared Euclidean distance between two vectors (column or literal)."""
    aa, bb = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(aa, bb, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_distance(a: ColumnOrName, b: ColumnOrName | Sequence[float]) -> Column:
    return F.sqrt(l2sq(a, b))


def dot(a: ColumnOrName, b: ColumnOrName | Sequence[float]) -> Column:
    aa, bb = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(aa, bb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vector_norm(a: ColumnOrName) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: ColumnOrName, b: ColumnOrName | Sequence[float]) -> Column:
    """Cosine similarity; NULL-safe for zero vectors (returns NULL)."""
    denom = vector_norm(a) * (
        F.lit(float(_norm_of(b))) if isinstance(b, (list, tuple)) else vector_norm(b)
    )
    return F.when(denom != 0.0, dot(a, b) / denom)


def _norm_of(v: Sequence[float]) -> float:
    return sum(float(x) * float(x) for x in v) ** 0.5
