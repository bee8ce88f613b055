"""As-of join — for each left row, the latest right row with
``right.ts <= left.ts`` per key. Spark has no native as-of join; this is
the scalable union-merge formulation:

1. tag both sides and union them (schema-aligned),
2. one shuffle: window partitioned by key, ordered by (ts, side),
3. ``last_value(right payload, ignorenulls)`` carries the most recent
   right-side row forward onto every left row.

Cost: a single hash shuffle by key + per-partition sort — no range
explosion, no per-key driver loop, skew handled by AQE. This beats the
join-then-filter formulation (which materializes |left|×|right-per-key|
candidates) and is the standard large-scale shape; ``pd.merge_asof`` inside
``applyInPandas`` is the fallback for exotic tolerances.

Tie rule: right rows at exactly ``ts`` count (<=); among equal-ts right
rows the one with the greatest tiebreak column wins (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For each ``left`` row: columns of the matched ``right`` row with
    equal ``by`` key (NULL if none).

    ``direction="backward"`` (default) matches the LATEST right row with
    ``right[on] <= left[on]`` — the price-at-trade-time shape.
    ``direction="forward"`` matches the EARLIEST right row with
    ``right[on] >= left[on]`` — the next-event shape (first response
    after a request, next deploy after a commit). ``direction="nearest"``
    takes whichever of the two is closer in ``on`` (ties → the backward
    match, pandas' convention). Same single-shuffle union-merge in every
    mode: nearest computes both directional windows over the SAME
    partitioning, so it still costs one exchange (two in-partition
    sorts), never a second shuffle.

    ``on`` must be an orderable numeric/timestamp column present in both
    (numeric for ``nearest``, which compares gaps); ``tolerance`` (same
    units as ``on``) drops matches farther than ``tolerance`` from
    ``left[on]`` in the match direction (either direction for nearest).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]

    l_tagged = left.withColumn("__side", F.lit(1))
    r_payload = F.struct(
        F.col(on).alias("__r_on"), *[F.col(c).alias(c) for c in right_cols]
    )
    r_tagged = (
        right.select(
            F.col(by),
            F.col(on),
            r_payload.alias("__r"),
        )
        .withColumn("__side", F.lit(0))
    )
    # align schemas for the union: left carries a null payload
    l_aligned = l_tagged.select(
        F.col(by),
        F.col(on),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        "__side",
        *[c for c in left.columns if c not in (by, on)],
    )
    r_aligned = r_tagged.select(
        by,
        on,
        "__r",
        "__side",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (by, on)],
    )
    unioned = l_aligned.unionByName(r_aligned)

    # right rows sort before left rows at equal ts (side 0 < 1) so a
    # same-instant right row is visible to the left row (<=/>= inclusive);
    # the trailing __r sort makes the winner among equal-ts right rows
    # deterministic (struct comparison: __r_on, then right_cols in order).
    # Forward = the same merge walking `on` downward: the last right row
    # seen before a left row is then the EARLIEST one at-or-after it.
    def directional_window(d: str):
        on_ord = F.col(on).asc() if d == "backward" else F.col(on).desc()
        return (
            Window.partitionBy(by)
            .orderBy(on_ord, F.col("__side").asc(), F.col("__r").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    def within_tol(match, d: str):
        if tolerance is None:
            return match
        in_tol = (
            match["__r_on"] >= F.col(on) - F.lit(tolerance)
            if d == "backward"
            else match["__r_on"] <= F.col(on) + F.lit(tolerance)
        )
        return F.when(in_tol, match)

    if direction == "nearest":
        # both windows share the `by` partitioning — one exchange, two
        # in-partition sorts; pick the smaller |gap|, ties to backward
        mb = within_tol(
            F.last(F.col("__r"), ignorenulls=True).over(
                directional_window("backward")
            ),
            "backward",
        )
        mf = within_tol(
            F.last(F.col("__r"), ignorenulls=True).over(
                directional_window("forward")
            ),
            "forward",
        )
        matched = (
            unioned.withColumn("__mb", mb)
            .withColumn("__mf", mf)
            .withColumn(
                "__match",
                F.when(F.col("__mb").isNull(), F.col("__mf")).when(
                    F.col("__mf").isNull()
                    | (
                        (F.col(on) - F.col("__mb.__r_on"))
                        <= (F.col("__mf.__r_on") - F.col(on))
                    ),
                    F.col("__mb"),
                ).otherwise(F.col("__mf")),
            )
            .drop("__mb", "__mf")
            .filter(F.col("__side") == 1)
        )
    else:
        matched = unioned.withColumn(
            "__match",
            within_tol(
                F.last(F.col("__r"), ignorenulls=True).over(
                    directional_window(direction)
                ),
                direction,
            ),
        ).filter(F.col("__side") == 1)

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__match.__r_on").alias(f"{on}{suffix}"))
    out_cols.extend(F.col(f"__match.{c}").alias(f"{c}{suffix}") if c in left.columns
                    else F.col(f"__match.{c}").alias(c) for c in right_cols)
    return matched.select(*out_cols)
