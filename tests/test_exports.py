"""Package-surface contract: everything __all__ promises exists, and the
README quick-start imports keep working."""

from __future__ import annotations


def test_all_exports_resolve():
    import kaer_spark as k

    missing = [n for n in k.__all__ if not hasattr(k, n)]
    assert not missing, missing


def test_readme_quickstart_imports():
    from kaer_spark import (  # noqa: F401
        KaerContext,
        bigram_lm_fit,
        bigram_lm_scores,
        dedup_against,
        dsir_scores,
        duplicate_passages,
        get_spark,
        overlap_fraction,
        perplexity_buckets,
        token_budget_mix,
        token_budget_pipeline,
    )
    from kaer_spark.context import Collection

    assert callable(Collection.deduplicate_against)


def test_diag_java_options_gate_on_jdk_major(monkeypatch, tmp_path):
    """ADVICE r16: -Xlog:gc* (JDK9+ unified logging) aborts a JDK 8 JVM
    at startup — the GC diag flag must follow the detected dialect."""
    from kaer_spark import session as sess

    monkeypatch.setattr(sess, "_DIAG_DIR", str(tmp_path / "diag"))
    monkeypatch.setattr(sess, "_java_major", lambda: 8)
    opts = sess._diag_java_options()
    assert "-Xloggc:" in opts and "-Xlog:gc*" not in opts
    assert "-XX:ErrorFile=" in opts
    monkeypatch.setattr(sess, "_java_major", lambda: 17)
    assert "-Xlog:gc*" in sess._diag_java_options()
    # undetectable → modern syntax (this engine pins Spark on 17+)
    monkeypatch.setattr(sess, "_java_major", lambda: None)
    assert "-Xlog:gc*" in sess._diag_java_options()
    # version-string parsing: pre-9 "1.x" scheme and modern scheme
    assert sess._parse_java_major('"1.8.0_392"') == 8
    assert sess._parse_java_major("17.0.9") == 17
