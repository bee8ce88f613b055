"""Composed training-data pipeline: filtering, dedup determinism, stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaer_spark.pipelines import corpus_stats, prepare_training_corpus


def test_pipeline_filters_and_dedups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog in the park"),
        (2, "the quick brown fox jumps over the lazy dog in the park"),  # dup of 1
        (3, "!!! ??? !!! ??? !!!"),  # junk: high punct ratio
        (4, "a different long enough document with many plain words and the usual structure"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = prepare_training_corpus(docs, min_quality=0.5, min_tokens=5)
    kept = {r["doc_id"] for r in out.collect()}
    assert 3 not in kept  # junk filtered
    assert kept & {1, 2} == {1}  # min-id representative of the dup group
    assert 4 in kept


def test_pipeline_columns_and_stats(documents):
    corpus = prepare_training_corpus(documents.limit(100), min_quality=0.0)
    assert set(corpus.columns) == {"doc_id", "text", "lang_guess", "quality", "n_tokens", "fp"}
    stats = corpus_stats(corpus)
    total = stats.agg(F.sum("n_docs")).collect()[0][0]
    assert total == corpus.count()


def test_pipeline_lang_restriction(documents):
    corpus = prepare_training_corpus(documents.limit(200), min_quality=0.0, langs=["en"])
    langs = {r["lang_guess"] for r in corpus.select("lang_guess").distinct().collect()}
    assert langs <= {"en"}


def test_stratified_split_exact_and_deterministic(spark, documents):
    from kaer_spark.pipelines import stratified_split

    out = stratified_split(documents, strata_col="lang", id_col="doc_id")
    counts = {
        (r["lang"], r["split"]): r["n"]
        for r in out.groupBy("lang", "split").count().withColumnRenamed("count", "n").collect()
    }
    langs = {l for l, _ in counts}
    for lang in langs:
        tr = counts.get((lang, "train"), 0)
        va = counts.get((lang, "val"), 0)
        te = counts.get((lang, "test"), 0)
        n = tr + va + te
        # exact round-robin dealing: train gets 8 of every full 10, and the
        # partial last round fills train first, then val, then test
        full, rem = divmod(n, 10)
        assert tr == full * 8 + min(rem, 8)
        assert va == full + min(max(rem - 8, 0), 1)
        assert te == full + max(rem - 9, 0)
    # deterministic: same assignment on re-run
    a = sorted((r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect())
    b = sorted((r["doc_id"], r["split"]) for r in
               stratified_split(documents, "lang", "doc_id").select("doc_id", "split").collect())
    assert a == b


def test_stratified_split_two_level_exact_counts(spark, documents):
    """sub_strata=S spreads a mega-stratum over S window partitions but must
    keep EXACT per-(stratum, split) counts — the composed rank is a
    permutation of 1..N within each stratum."""
    from kaer_spark.pipelines import stratified_split

    def counts(df):
        return {
            (r["lang"], r["split"]): r["n"]
            for r in df.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
        }

    single = counts(stratified_split(documents, "lang", "doc_id"))
    sharded = counts(stratified_split(documents, "lang", "doc_id", sub_strata=32))
    assert sharded == single
    # deterministic: same assignment on re-run
    a = sorted(
        (r["doc_id"], r["split"])
        for r in stratified_split(documents, "lang", "doc_id", sub_strata=32)
        .select("doc_id", "split")
        .collect()
    )
    b = sorted(
        (r["doc_id"], r["split"])
        for r in stratified_split(documents, "lang", "doc_id", sub_strata=32)
        .select("doc_id", "split")
        .collect()
    )
    assert a == b


def test_numeric_profile_approx_brackets_exact(documents):
    """approximate=True: same schema, percentiles within the sketch's rank
    error of the exact ones (on 500 rows with accuracy=10000 the sketch is
    value-exact at these quantiles), every other stat identical."""
    from kaer_spark.pipelines import numeric_profile

    exact = numeric_profile(documents, "n_chars", group_col="lang").collect()
    approx = numeric_profile(
        documents, "n_chars", group_col="lang", approximate=True
    ).collect()
    assert exact[0].asDict().keys() == approx[0].asDict().keys()
    ex = {r["lang"]: r for r in exact}
    ap = {r["lang"]: r for r in approx}
    assert set(ex) == set(ap)
    vals = {
        r["lang"]: sorted(
            x["n_chars"] for x in documents.filter(F.col("lang") == r["lang"])
            .select("n_chars").collect()
        )
        for r in exact
    }
    for lang, e in ex.items():
        a = ap[lang]
        for f in ("n_rows", "n_nulls", "min_val", "max_val", "mean_val"):
            assert a[f] == e[f], (lang, f)
        # sketch percentile is an actual column value within rank error;
        # with accuracy >> n it is the exact lower-neighbor order statistic
        for p in ("p25", "p50", "p90"):
            assert a[p] in vals[lang], (lang, p)
            lo, hi = min(vals[lang]), max(vals[lang])
            assert lo <= a[p] <= hi


def test_token_budget_pipeline_shapes_and_budgets(spark, documents):
    """token_budget_pipeline: every (shard, pack) respects the pack budget
    on its exclusive prefix, per-source kept tokens respect the budgets
    (+ at most the boundary doc's overshoot), and the composition equals
    running the stages by hand."""
    from pyspark.sql import functions as F

    from kaer_spark.functions.text import token_count
    from kaer_spark.operators.sampling import (
        temperature_rates,
        token_budget_mix,
        weighted_mix,
    )
    from kaer_spark.pipelines import token_budget_pipeline

    budgets = {"src0": 900, "src1": 400}
    out = token_budget_pipeline(
        documents, tau=0.7, budgets=budgets, default_budget=300,
        max_tokens=256, shards=4,
    ).collect()
    assert len(out) > 0
    # pack budget: a pack overshoots only by its boundary document
    for r in out:
        assert r["sum_tokens"] > 0 and r["n_docs"] > 0

    # composition ≡ hand-run stages
    rates = temperature_rates(documents, "lang", tau=0.7)
    toked = documents.withColumn("__ntok", token_count("text"))
    mixed = weighted_mix(toked, "lang", rates)
    kept = token_budget_mix(mixed, "source", budgets, "__ntok",
                            default_budget=300, shards=4)
    # per-source budget honored up to the crossing doc
    per_src = {
        r["source"]: r["s"]
        for r in kept.groupBy("source")
        .agg(F.sum("__ntok").alias("s"), F.max("__ntok").alias("m"))
        .collect()
    }
    for src, total in per_src.items():
        budget = budgets.get(src, 300)
        max_doc = kept.filter(F.col("source") == src).agg(
            F.max("__ntok")
        ).collect()[0][0]
        assert total < budget + max_doc + 1
    from kaer_spark.operators.packing import pack_sequences, pack_stats

    manual = {
        (r["shard"], r["pack_id"]): (r["n_docs"], r["sum_tokens"])
        for r in pack_stats(
            pack_sequences(kept, 256, shards=4, tokens_col=F.col("__ntok"))
        ).collect()
    }
    got = {(r["shard"], r["pack_id"]): (r["n_docs"], r["sum_tokens"]) for r in out}
    assert got == manual


def test_pipeline_boilerplate_stage_fused_equals_stagewise(spark):
    """prepare_training_corpus(remove_boilerplate_lines=True) must equal
    running remove_duplicate_lines first and feeding the cleaned text
    through the flag-less pipeline — the fused plan changes nothing but
    the program count. Also: a doc unique only by its boilerplate
    deduplicates against its clean twin once the stage runs."""
    from pyspark.sql import functions as F

    from kaer_spark.operators.dedup import remove_duplicate_lines
    from kaer_spark.pipelines import prepare_training_corpus

    body = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "COOKIE BANNER\n" + body),
        (2, body),  # identical once the banner is stripped from doc 1
        (3, "COOKIE BANNER\nan entirely different document body here okay"),
        (4, "no banner plain unique document body with words to count"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fused = prepare_training_corpus(
        docs, min_quality=0.0, min_tokens=0,
        remove_boilerplate_lines=True, boilerplate_min_docs=2,
    )
    cleaned = remove_duplicate_lines(docs, min_docs=2).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    stagewise = prepare_training_corpus(cleaned, min_quality=0.0, min_tokens=0)
    a = sorted(fused.collect(), key=lambda r: r["doc_id"])
    b = sorted(stagewise.collect(), key=lambda r: r["doc_id"])
    assert a == b
    # docs 1 and 2 collapse (same fp after cleaning); without the stage
    # they both survive
    assert [r["doc_id"] for r in a] == [1, 3, 4]
    plain = prepare_training_corpus(docs, min_quality=0.0, min_tokens=0)
    assert plain.count() == 4


def test_corpus_datasheet_python_replay(spark):
    """Datasheet numbers ≡ python on a constructed corpus: exact-dup rate,
    language diversity, token/char totals, decimal-exact quality mean —
    and no Expand in the plan (two-level distinct discipline)."""
    from pyspark.sql import functions as F

    from kaer_spark.pipelines import corpus_datasheet

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "the quick brown fox jumps over the lazy dog", "a"),  # exact dup
        (3, "der schnelle braune fuchs und so weiter hier", "a"),
        (4, "one single unique document", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in corpus_datasheet(docs).collect()}
    a, b = out["a"], out["b"]
    assert a["n_docs"] == 3 and a["n_unique"] == 2
    assert a["dup_rate"] == 1 / 3
    assert a["total_chars"] == sum(len(t) for _, t, s in rows if s == "a")
    assert a["n_langs"] == 2  # en + de heuristics differ
    assert b["n_docs"] == 1 and b["dup_rate"] == 0.0 and b["n_unique"] == 1
    plan = corpus_datasheet(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
