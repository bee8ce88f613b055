"""Ordered-step funnel analysis over an event stream.

Semantics (the classic "strict-order funnel from first entry", identical to
a chained ``min(ts)`` SQL formulation, so a SQL oracle can replay it):

* ``t1`` = the user's earliest event of ``steps[0]``;
* ``t[k]`` = the earliest event of ``steps[k]`` with ``ts > t[k-1]`` and,
  when ``max_gap`` is set, ``ts <= t[k-1] + max_gap``;
* a user "reaches step k" iff ``t[k]`` exists. Greedy-earliest anchoring —
  deterministic, depends only on the per-type timestamp multisets.

Design for 100 TB of events:

* Events are **filtered to the step types inside the scan** (predicate
  pushdown) before anything wide happens.
* ONE shuffle: ``groupBy(user)`` collecting the (ts, type) pairs; the
  chain is then a single O(len) fold over the time-sorted array — no
  self-join per step, no window function, events scanned once. Per-user
  event counts are bounded in practice; a pathological hot user is a
  salting problem upstream, not a plan problem here.
* The final per-step count is an explode of ``sequence(1, depth)`` over
  one row per user — negligible.

Pure Catalyst: array_sort + aggregate fold, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_depth(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap: int | None = None,
) -> DataFrame:
    """(user, depth): how many funnel steps the user completed, 0..len(steps).

    ``ts_col`` may be any orderable type; when ``max_gap`` is given it must
    support ``+`` with it (use integer epoch nanos — see ``_events``).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ts_type = events.schema[ts_col].dataType
    step_arr = F.array(*[F.lit(s) for s in steps])

    ev = events.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("user"),
        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("typ")).alias("e"),
    )
    per_user = ev.groupBy("user").agg(F.array_sort(F.collect_list("e")).alias("evs"))

    init = F.struct(
        F.lit(0).cast("int").alias("depth"),
        F.lit(None).cast(ts_type).alias("anchor"),
    )

    def step(acc: Column, e: Column) -> Column:
        # 1-based; least() keeps the index in bounds once depth==len(steps)
        # (ANSI mode makes out-of-range element_at an error, and & does not
        # short-circuit) — the `depth < len` conjunct keeps semantics right.
        want = F.element_at(step_arr, F.least(acc["depth"] + 1, F.lit(len(steps))))
        ok = (acc["depth"] < F.lit(len(steps))) & (e["typ"] == want)
        # step 1 anchors anywhere; later steps must be strictly after the
        # previous anchor (and inside the gap window when configured)
        after = F.when(acc["depth"] == 0, F.lit(True)).otherwise(
            e["ts"] > acc["anchor"]
        )
        if max_gap is not None:
            after = after & F.when(acc["depth"] == 0, F.lit(True)).otherwise(
                e["ts"] <= acc["anchor"] + F.lit(max_gap)
            )
        adv = ok & after
        return F.struct(
            F.when(adv, acc["depth"] + 1).otherwise(acc["depth"]).alias("depth"),
            F.when(adv, e["ts"]).otherwise(acc["anchor"]).alias("anchor"),
        )

    depth = F.aggregate(F.col("evs"), init, step, lambda acc: acc["depth"])
    return per_user.select("user", depth.cast("long").alias("depth"))


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap: int | None = None,
) -> DataFrame:
    """Per-step reach: (step_idx 1-based, step_name, users) — ``users`` =
    count of users whose depth >= step_idx. Always len(steps) rows (0 for
    unreached steps)."""
    step_arr = F.array(*[F.lit(s) for s in steps])
    d = funnel_depth(events, steps, user_col, ts_col, type_col, max_gap)
    reached = (
        d.filter(F.col("depth") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("depth"))).alias("step_idx"))
        .groupBy("step_idx")
        .agg(F.count("*").cast("long").alias("users"))
    )
    # left-join against the full step list so unreached steps show 0
    all_steps = (
        d.sparkSession.range(1, len(steps) + 1)
        .select(F.col("id").cast("int").alias("step_idx"))
    )
    return (
        all_steps.join(reached, "step_idx", "left")
        .select(
            F.col("step_idx").cast("long").alias("step_idx"),
            F.element_at(step_arr, F.col("step_idx").cast("int")).alias("step_name"),
            F.coalesce(F.col("users"), F.lit(0)).cast("long").alias("users"),
        )
    )
