"""Print inter-job driver gaps for one query run (REST API variant of
profile_query) — where the wall time goes when no job is running."""
import json, os, sys, time, urllib.request
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())

def _ts(s):
    from datetime import datetime
    return datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()

def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    import __spark_entry__ as entrymod
    from kaer_spark.session import get_spark
    spark = get_spark(app_name="kaer-gaps", extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"})
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    base = None
    for port in range(4050, 4060):
        try:
            apps = _get(f"http://localhost:{port}/api/v1/applications")
            base = f"http://localhost:{port}/api/v1/applications/{apps[0]['id']}"
            break
        except Exception:
            continue
    # run twice: first warm, second measured (codegen/planning caches hot)
    for it in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        wall = time.time() - t0
        print(f"iter{it} {name}: {wall:.3f}s rows={n}")
    jobs = [j for j in _get(f"{base}/jobs") if "submissionTime" in j and _ts(j["submissionTime"]) >= t0 - 0.05]
    jobs.sort(key=lambda j: j["jobId"])
    prev_end = t0
    for j in jobs:
        sub, comp = _ts(j["submissionTime"]), _ts(j.get("completionTime", j["submissionTime"]))
        gap = sub - prev_end
        if gap > 0.15:
            print(f"  GAP {gap:6.3f}s before job {j['jobId']}")
        print(f"  job {j['jobId']:4d} {comp-sub:7.3f}s")
        prev_end = comp
    tail = t0 + wall - prev_end
    if tail > 0.15:
        print(f"  GAP {tail:6.3f}s after last job")
    spark.stop()

main()
