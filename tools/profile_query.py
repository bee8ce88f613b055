"""Per-job/stage wall-time profile for one or more driver queries.

Runs each named query from ``__spark_entry__.queries()`` once (timed with
the bench's own action, ``.count()``) in a session with the UI enabled,
then reads the Spark REST API (``/api/v1``) for the jobs/stages the query
ran: job wall seconds, stage task counts and times, and call sites —
enough to see WHERE a multi-job operator (LSH chains, ingest batches,
mining pipelines) spends its time without a browser (guide §7.1
empirical loop, headless variant). The gap between the query wall and
the sum of job walls is driver-side work: planning, codegen, collect
round-trips.

Usage: python tools/profile_query.py <query> [query ...] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _parse_ts(s: str) -> float:
    # REST timestamps: "2026-08-17T10:12:00.123GMT"
    from datetime import datetime, timezone

    s = s.replace("GMT", "+0000")
    return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if not argv:
        print("usage: profile_query.py <query> [...] [--sf DIR]", file=sys.stderr)
        return 2

    import __spark_entry__ as entrymod
    from kaer_spark.session import get_spark

    spark = get_spark(
        app_name="kaer-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm
    base = None
    for port in range(4050, 4060):
        try:
            apps = _get(f"http://localhost:{port}/api/v1/applications")
            base = f"http://localhost:{port}/api/v1/applications/{apps[0]['id']}"
            break
        except Exception:
            continue
    if base is None:
        print("cannot reach Spark REST API", file=sys.stderr)
        return 1

    import gc

    for name in argv:
        fn = qs[name]
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        wall = time.time() - t0
        print(f"\n=== {name}: {wall:.3f}s total, rows={n} ===")
        _report(base, t0, wall)
    spark.stop()
    return 0


def _report(base: str, t0: float, wall: float) -> None:
    jobs = [
        j for j in _get(f"{base}/jobs")
        if "submissionTime" in j and _parse_ts(j["submissionTime"]) >= t0 - 0.05
    ]
    stages = {
        s["stageId"]: s
        for s in _get(f"{base}/stages?status=complete")
        if "submissionTime" in s and _parse_ts(s["submissionTime"]) >= t0 - 0.05
    }
    jobs.sort(key=lambda j: j["jobId"])
    tot = 0.0
    lines = []
    for j in jobs:
        if "completionTime" not in j:
            continue
        jwall = _parse_ts(j["completionTime"]) - _parse_ts(j["submissionTime"])
        tot += jwall
        desc = (j.get("description") or j.get("name") or "")[:100]
        lines.append(f"  job {j['jobId']:4d} {jwall:7.3f}s  {desc}")
        for sid in sorted(j.get("stageIds", [])):
            s = stages.get(sid)
            if not s:
                continue
            swall = (
                _parse_ts(s["completionTime"]) - _parse_ts(s["submissionTime"])
                if "completionTime" in s else 0.0
            )
            if swall >= 0.08:
                lines.append(
                    f"       stage {sid:4d} {swall:7.3f}s "
                    f"tasks={s['numCompleteTasks']:3d} "
                    f"taskTime={s.get('executorRunTime', 0)/1000:7.2f}s "
                    f"shuffleR={s.get('shuffleReadBytes', 0)//1024}KB "
                    f"{s['name'][:60]}"
                )
    print(f"  {len(jobs)} jobs, sum of job walls {tot:.3f}s "
          f"(driver/planning gap: {wall - tot:.3f}s)")
    for ln in lines:
        print(ln)


if __name__ == "__main__":
    raise SystemExit(main())
