"""Funnel operator: greedy strict-order semantics vs a brute-force Python
replay, gap windows, unreached steps, and plan shape (single shuffle)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kaer_spark.operators.funnel import funnel, funnel_depth

STEPS = ["view", "click", "purchase"]


def _brute_depth(events: list[tuple[int, str]], steps: list[str], gap=None) -> int:
    """Reference implementation: chained earliest-match anchoring."""
    depth, anchor = 0, None
    for ts, typ in sorted(events):
        if depth >= len(steps) or typ != steps[depth]:
            continue
        if depth == 0:
            depth, anchor = 1, ts
        elif ts > anchor and (gap is None or ts <= anchor + gap):
            depth, anchor = depth + 1, ts
    return depth


ROWS = [
    (1, 10, "view"), (1, 15, "click"), (1, 18, "purchase"),
    (2, 10, "view"), (2, 50, "click"),           # outside 20-tick gap
    (3, 10, "view"),
    (4, 5, "click"), (4, 10, "view"), (4, 12, "click"), (4, 40, "purchase"),
    (5, 10, "click"), (5, 12, "purchase"),       # never views
    (1, 99, "error"),                            # non-step noise
    (6, 10, "view"), (6, 11, "click"), (6, 50, "click"), (6, 60, "purchase"),
    # ^ greedy anchors at the ts=11 click; the ts=60 purchase misses its
    #   20-tick window from 11 even though (50, 60) would have matched —
    #   the documented greedy semantics.
]


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        ROWS, "user_id long, ts long, event_type string"
    )


def test_depth_matches_bruteforce(spark, ev):
    got = {
        r["user"]: r["depth"]
        for r in funnel_depth(ev, STEPS, max_gap=20).collect()
    }
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, ts, typ in ROWS:
        if typ in STEPS:
            by_user.setdefault(u, []).append((ts, typ))
    want = {u: _brute_depth(evs, STEPS, gap=20) for u, evs in by_user.items()}
    assert got == want
    assert got[6] == 2  # greedy window miss, documented above


def test_counts_and_unreached_steps(spark, ev):
    rows = {r["step_idx"]: r for r in funnel(ev, STEPS, max_gap=20).collect()}
    assert [rows[i]["step_name"] for i in (1, 2, 3)] == STEPS
    assert rows[1]["users"] == 5   # users 1,2,3,4,6 viewed
    assert rows[2]["users"] == 3   # 1, 4, 6 clicked in-window
    # only user 1 purchases in-window: user 4's purchase@40 misses the
    # (12, 32] window anchored at its click@12
    assert rows[3]["users"] == 1
    # a step nobody reaches still yields a row with 0
    rows4 = {
        r["step_idx"]: r["users"]
        for r in funnel(ev, STEPS + ["refund"], max_gap=20).collect()
    }
    assert rows4[4] == 0


def test_no_gap_chains_unbounded(spark, ev):
    rows = {r["step_idx"]: r["users"] for r in funnel(ev, STEPS).collect()}
    assert rows[2] == 4  # user 2's ts=50 click now counts


def test_single_shuffle_plan(spark, ev):
    plan = funnel_depth(ev, STEPS, max_gap=20)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the groupBy(user) — and nothing else
    assert "Python" not in plan  # pure Catalyst fold


def test_empty_steps_rejected(spark, ev):
    with pytest.raises(ValueError):
        funnel_depth(ev, [])
