"""Self-check harness replicating the driver's correctness gate locally:
runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compares row count, column names, and
order-insensitive values (exact — the engine claims bit-identical math).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                if x != y and not (pd.isna(x) and pd.isna(y)):
                    return False, f"{col}[{i}]: {x!r} != {y!r} (float, exact)"
            elif x != y:
                return False, f"{col}[{i}]: {x!r} != {y!r}"
    return True, "ok"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from kaer_spark.session import get_spark

    spark = get_spark(app_name="selfcheck")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    print(f"== entry() smoke on sf0.001 ==")
    t0 = time.time()
    erows = entrymod.entry(spark).collect()
    print(f"entry: {len(erows)} rows in {time.time() - t0:.1f}s (expect >= 0)")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = canon(fn(spark, sf_dir).toPandas())
            t_spark = time.time() - t0
            if name not in oracles:
                print(f"  {name:28s} rows={len(sdf):6d}  (no oracle: rows-only) "
                      f"spark={t_spark:.1f}s")
                continue
            t0 = time.time()
            ddf = canon(con.sql(oracles[name]).df())
            ok, why = values_equal(sdf, ddf)
            status = "OK " if ok else "FAIL"
            print(f"  {name:28s} rows={len(sdf):6d}  {status} "
                  f"spark={t_spark:.1f}s duck={time.time() - t0:.1f}s"
                  + ("" if ok else f"  → {why}"))
            if not ok:
                fails.append((name, why))
        except Exception as e:  # noqa: BLE001
            print(f"  {name:28s} ERROR: {type(e).__name__}: {str(e)[:200]}")
            fails.append((name, str(e)[:200]))
    if fails:
        print(f"\n{len(fails)} FAILURES: {[f[0] for f in fails]}")
        return 1
    print("\nall queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
