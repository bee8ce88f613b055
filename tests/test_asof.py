"""As-of join vs DuckDB's native ASOF JOIN (the oracle) + edge cases."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from kaer_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", 100, 10.0), (2, "A", 205, 11.0), (3, "A", 300, 12.0),
         (4, "B", 150, 20.0), (5, "B", 90, 21.0), (6, "C", 500, 30.0)],
        "trade_id long, sym string, ts long, price double",
    )
    quotes = spark.createDataFrame(
        [("A", 90, 9.9), ("A", 100, 10.1), ("A", 200, 10.9), ("A", 205, 11.1),
         ("B", 100, 19.9), ("B", 160, 20.9)],
        "sym string, ts long, quote double",
    )
    return trades, quotes


def test_asof_join_vs_duckdb(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="ts", by="sym").orderBy("trade_id")
    got = [
        (r["trade_id"], r["ts_right"], r["quote"]) for r in out.collect()
    ]
    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    want = [
        tuple(r)
        for r in con.sql(
            """
            SELECT t.trade_id, q.ts, q.quote
            FROM trades t ASOF LEFT JOIN quotes q
              ON t.sym = q.sym AND t.ts >= q.ts
            ORDER BY t.trade_id
            """
        ).fetchall()
    ]
    assert got == want
    # semantic spot-checks: <= inclusive; no match → NULL; key isolation
    d = {t: (ts, q) for t, ts, q in got}
    assert d[2] == (205, 11.1)   # equal-ts right row matches (<=)
    assert d[5] == (None, None)  # before any quote
    assert d[6] == (None, None)  # key with no right rows


def test_asof_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="ts", by="sym", tolerance=10)
    d = {r["trade_id"]: r["quote"] for r in out.collect()}
    assert d[1] == 10.1          # exact-age 0 match kept
    assert d[3] is None          # quote at 205 is 95 old > 10
    assert d[4] is None          # quote at 100 is 50 old


def test_asof_events_scale(spark, sf_dir):
    """As-of on the events fixture: each click matched to the user's most
    recent signup — cross-checked against DuckDB ASOF JOIN."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id"), F.col("ts"), F.col("event_id").alias("signup_event")
    )
    out = asof_join(clicks, signups, on="ts", by="user_id")
    got = {r["event_id"]: r["signup_event"] for r in out.collect()}

    want = dict(
        duckdb.sql(
            f"""
            WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts, event_type
                       FROM read_parquet('{sf_dir}/events.parquet'))
            SELECT c.event_id, s.event_id
            FROM (SELECT * FROM e WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = 'signup') s
              ON c.user_id = s.user_id AND c.ts >= s.ts
            """
        ).fetchall()
    )
    assert got == want and len(got) > 100


def test_asof_forward_vs_duckdb(spark, sf_dir):
    """direction='forward': earliest right row at-or-after each left row,
    checked against DuckDB's ASOF >= join on the real events fixture;
    plus tolerance in the forward direction."""
    import duckdb

    from kaer_spark.functions.time import read_events

    ev = read_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id"), F.col("ts"), F.col("event_id").alias("next_signup")
    )
    out = asof_join(clicks, signups, on="ts", by="user_id", direction="forward")
    got = {r["event_id"]: r["next_signup"] for r in out.collect()}
    want = dict(
        duckdb.sql(
            f"""
            WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts, event_type
                       FROM read_parquet('{sf_dir}/events.parquet'))
            SELECT c.event_id, s.event_id
            FROM (SELECT * FROM e WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = 'signup') s
              ON c.user_id = s.user_id AND c.ts <= s.ts
            """
        ).fetchall()
    )
    assert got == want and len(got) > 100
    # forward tolerance: matches farther than tol ahead are nulled
    tol = 3_600_000_000_000  # one hour in nanos
    tout = asof_join(
        clicks, signups, on="ts", by="user_id",
        direction="forward", tolerance=tol,
    )
    rows = tout.select("event_id", "ts", "ts_right").collect()
    base = {r["event_id"]: r["ts"] for r in rows}
    for r in rows:
        if r["ts_right"] is not None:
            assert 0 <= r["ts_right"] - base[r["event_id"]] <= tol
    # every in-tolerance unrestricted match survives, every other is null
    for r in rows:
        g = got[r["event_id"]]
        if r["ts_right"] is None:
            continue
        assert g is not None


def test_asof_direction_validation(trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="ts", by="sym", direction="sideways")


def test_asof_nearest_matches_python_and_one_shuffle(spark):
    """direction='nearest': smaller |gap| wins, ties go backward, and the
    two directional windows share one exchange (same by-partitioning)."""
    from kaer_spark.plans import executed_plan

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 7), (3, 5)],
        "k long, ts long",
    )
    right = spark.createDataFrame(
        [(1, 8, "a"), (1, 20, "b"), (1, 30, "c"), (2, 7, "d"), (2, 9, "e")],
        "k long, ts long, tag string",
    )
    out = asof_join(left, right, on="ts", by="k", direction="nearest")
    # plan BEFORE execution: AQE's post-run final plan re-lists the
    # exchange per query stage, which would double-count it
    plan = executed_plan(out)
    assert plan.count("Exchange hashpartitioning") == 1
    got = {(r["k"], r["ts"]): r["tag"] for r in out.collect()}
    # python reference: nearest by |gap|, tie -> backward (<=)
    rrows = [(1, 8, "a"), (1, 20, "b"), (1, 30, "c"), (2, 7, "d"), (2, 9, "e")]
    want = {}
    for k, ts in [(1, 10), (1, 25), (1, 40), (2, 7), (3, 5)]:
        cands = [(abs(rts - ts), 0 if rts <= ts else 1, rts, tag)
                 for rk, rts, tag in rrows if rk == k]
        want[(k, ts)] = min(cands)[3] if cands else None
    assert got == want
    assert got[(1, 25)] == "b"   # gap 5 backward beats gap 5 forward (tie)
    assert got[(2, 7)] == "d"    # exact hit
    assert got[(3, 5)] is None   # no right rows for the key
    # tolerance applies on both sides of the gap
    tout = asof_join(left, right, on="ts", by="k", direction="nearest", tolerance=4)
    tgot = {(r["k"], r["ts"]): r["tag"] for r in tout.collect()}
    assert tgot[(1, 10)] == "a" and tgot[(1, 40)] is None
