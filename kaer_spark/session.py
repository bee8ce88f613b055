"""SparkSession construction tuned for this engine.

The reference boots an embedded PostgreSQL + FerretDB proxy per process
(``/root/reference/db/kaer.go:84-117``); here the entire ladder collapses to
one SparkSession over a warehouse directory.

Scale notes (100 TB design, tested on local[32]):

* AQE on — runtime shuffle-partition coalescing and skew-join splitting mean
  one static ``spark.sql.shuffle.partitions`` value survives a 1000× scale-up.
* Arrow enabled — every pandas-UDF boundary (embedding provider, multimodal
  decode) moves columnar batches, not pickled rows.
* Session timezone pinned to UTC so results are reproducible against
  timestamp-naive oracles (DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Where JVM fatal-error files and GC logs land — a mid-run JVM death must
#: leave an artifact (one full-suite run died with `Py4JJavaError:
#: <exception str() failed>` + a connection-refused cascade and NO hs_err
#: file anywhere, so the crash was undiagnosable). Overridable for test
#: isolation; defaults beside the session's cwd.
_DIAG_DIR = os.environ.get(
    "SPARK_GRAFT_JVM_DIAG_DIR", os.path.join(os.getcwd(), "jvm-diag")
)


def _java_major() -> int | None:
    """Major version of the JVM Spark will launch, or None if undetectable.
    Reads ``$JAVA_HOME/release`` (present in every JDK image since 7, no
    subprocess) and falls back to ``java -version``. Needed because the GC
    diag flag dialect changed at JDK 9: ``-Xlog:gc*`` (unified logging) is
    an UNRECOGNIZED option on JDK 8 and the driver JVM refuses to start —
    a diagnosability flag must never itself break session startup."""
    import re
    import subprocess

    jh = os.environ.get("JAVA_HOME")
    if jh:
        try:
            with open(os.path.join(jh, "release")) as f:
                for line in f:
                    if line.startswith("JAVA_VERSION="):
                        return _parse_java_major(line.split("=", 1)[1])
        except (OSError, ValueError):
            pass
    java = os.path.join(jh, "bin", "java") if jh else "java"
    try:
        out = subprocess.run(
            [java, "-version"], capture_output=True, text=True, timeout=10
        ).stderr
        m = re.search(r'version "([^"]+)"', out)
        if m:
            return _parse_java_major(m.group(1))
    except (OSError, subprocess.SubprocessError, ValueError):
        pass
    return None


def _parse_java_major(version: str) -> int:
    """``"17.0.9"`` → 17, ``"1.8.0_392"`` → 8 (the pre-9 ``1.x`` scheme)."""
    parts = version.strip().strip('"').split(".")
    return int(parts[1]) if parts[0] == "1" else int(parts[0])


def _diag_java_options() -> str:
    """-XX flags ensuring a JVM death is diagnosable: pin the hs_err fatal
    log to a known directory (the JVM default scatters it to the process
    cwd, which under pytest/driver harnesses is wherever the runner
    chdir'd) and keep a small rolling GC log so heap-pressure deaths show
    their run-up. Only applied when the caller hasn't set its own
    ``spark.driver.extraJavaOptions``. The GC flag is dialect-gated on the
    detected Java major version: unified ``-Xlog:gc*`` on 9+, legacy
    ``-Xloggc`` on 8 (where ``-Xlog`` aborts JVM startup), and 9+ syntax
    when undetectable (every Spark this engine pins requires 17+, so an
    undetectable JVM is far likelier modern than JDK 8)."""
    os.makedirs(_DIAG_DIR, exist_ok=True)
    major = _java_major()
    if major is not None and major < 9:
        gc_flag = f"-Xloggc:{_DIAG_DIR}/gc_%p.log"
    else:
        gc_flag = (
            f"-Xlog:gc*:file={_DIAG_DIR}/gc_%p.log:time,uptime:"
            "filecount=2,filesize=8m"
        )
    return f"-XX:ErrorFile={_DIAG_DIR}/hs_err_pid%p.log {gc_flag}"


_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # local[32] on 128 GiB: single JVM, driver memory is the only knob.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    "spark.ui.enabled": "false",
    # [r18] Whole-stage-codegen class cache. Spark's default is 100
    # entries, sized for a handful of hot queries — this engine's wider
    # operators (index stats, LSH chains, ingest bodies) each generate
    # 30-95 codegen classes per execution, so at the default EVERY call
    # re-compiled its whole pipeline: thread dumps showed all 32
    # executor threads blocked in CodeGenerator.compile, and the
    # CodegenMetrics counter confirmed 40-53 Janino compiles per WARM
    # signlsh_index_stats call (wall 4.3-5.9s) vs 0 compiles / 2.0s wall
    # once the cache holds the working set. NOT a scale-dependent knob:
    # the cache is per-JVM and generated sources are data-independent —
    # on a production cluster each executor JVM pays the same compile
    # per stage shape, and a long-lived engine session serving hundreds
    # of distinct query shapes wants them compiled once. Memory ceiling
    # ≈ entries × (source string + class bytecode, typically 10-50 KB)
    # — a few hundred MB at 8192, right-sized for the 48g driver here;
    # override downward for small executor JVMs.
    "spark.sql.codegen.cache.maxEntries": os.environ.get(
        "SPARK_GRAFT_CODEGEN_CACHE_ENTRIES", "8192"
    ),
}


def get_spark(
    app_name: str = "kaer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``); ``shuffle_partitions`` defaults to the core count so local
    shuffles are neither over- nor under-parallelized.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if "spark.driver.extraJavaOptions" not in (extra_conf or {}):
        conf["spark.driver.extraJavaOptions"] = _diag_java_options()
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
