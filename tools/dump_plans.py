"""Dump ``explain("formatted")`` for named driver queries to files.

Usage: python tools/dump_plans.py <outdir> <suffix> <query> [query ...]
Writes ``<outdir>/<query>_<suffix>.txt`` for each query (plans captured at
sf0.001 — plan shape is scale-invariant modulo AQE runtime choices).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from kaer_spark.session import get_spark

    spark = get_spark(app_name="kaer-dump-plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
