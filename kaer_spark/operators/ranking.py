"""Corpus-statistics ranking: BM25 scoring as pure Catalyst expressions.

The reference has no lexical ranking surface; this is part of the engine's
LLM-data-pipeline extension (SURVEY §2.3) — scoring documents against a
term set is the standard retrieval/quality-mix primitive (e.g. selecting
pretraining documents matching a target distribution).

Scale shape (100 TB): per-document token/term-frequency columns are narrow
projections evaluated in the scan stage; the corpus statistics (N, Σdl,
per-term document frequency) are ONE aggregate producing a single row that
is broadcast back — so the whole score is scan → tiny agg → broadcast →
scan-shaped projection. No per-term shuffle, no inverted index needed for
a fixed query term set.

Determinism note: the classic BM25 idf is ``ln((N-df+0.5)/(df+0.5))``.
``ln`` is a transcendental whose last-ulp behavior differs across libm
implementations, which would break this repo's bit-exact oracle contract —
so ``bm25_scores`` uses the RATIONAL idf ``(N-df+0.5)/(df+0.5)`` (the
argument of the ln, a strictly monotone transform of it per term). Every
operation is then IEEE-754 double +,*,/ in a fixed association order,
replayable bit-for-bit by any SQL engine. Set ``log_idf=True`` for
textbook BM25 when cross-engine hashing is not required.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kaer_spark.functions.text import tokens

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def bm25_scores(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    log_idf: bool = False,
) -> DataFrame:
    """Score every document against ``terms`` → ``(id_col, bm25)``.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b + b·|d|/avgdl))

    with idf(t) = (N - df(t) + 0.5)/(df(t) + 0.5) (rational form; see
    module docstring). Tokenization is the engine-wide whitespace split,
    lowercased. Terms are summed in the given order (fixed left-assoc
    association so an oracle replays the exact IEEE result).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = [t.lower() for t in terms]
    toks = F.transform(tokens(text_col), F.lower)

    def term_freq(t: str):
        # NB: the predicate lambda must take exactly ONE arg — a two-arg
        # lambda would make F.filter pass the array INDEX as the second
        return F.size(F.filter("__toks", lambda x: x == F.lit(t))).cast("long")

    base = df.select(F.col(id_col), toks.alias("__toks")).select(
        id_col,
        F.size("__toks").cast("long").alias("__dl"),
        *[term_freq(t).alias(f"__tf{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("__n"),
        F.sum("__dl").alias("__sumdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("__sumdl").cast("double") / F.col("__n").cast("double")
    norm = F.col("__dl").cast("double") / avgdl
    score = None
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}").cast("double")
        df_t = F.col(f"__df{i}").cast("double")
        n = F.col("__n").cast("double")
        idf = (
            F.log((n - df_t + F.lit(0.5)) / (df_t + F.lit(0.5)))
            if log_idf
            else (n - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        )
        num = tf * F.lit(float(k1) + 1.0)
        denom = tf + F.lit(float(k1)) * (
            F.lit(1.0 - float(b)) + F.lit(float(b)) * norm
        )
        term_score = (idf * num) / denom
        score = term_score if score is None else score + term_score
    return joined.select(F.col(id_col), score.alias("bm25"))


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str):
    """(base, grams): tokenized docs and their exploded (id, w, v) bigrams.

    0/1-token docs contribute no bigram rows: the size guard matters
    because ``sequence(1, size-1)`` on such docs would generate a
    DESCENDING sequence (Spark steps -1 when stop < start) whose
    ``element_at`` then reads out of bounds — an ANSI-mode error. The
    ``when`` yields NULL for them and ``explode`` drops NULL arrays, which
    is exactly the contract (the doc re-enters via the final left join)."""
    base = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__t"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("__t") - 1),
        lambda i: F.struct(
            F.element_at("__t", i).alias("w"),
            F.element_at("__t", i + 1).alias("v"),
        ),
    )
    grams = base.select(
        "id",
        F.explode(F.when(F.size("__t") >= 2, pairs)).alias("g"),
    ).select("id", F.col("g.w").alias("w"), F.col("g.v").alias("v"))
    return base, grams


def bigram_lm_fit(
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Train the add-alpha bigram model on a REFERENCE corpus and return
    it as ``{"uni": DataFrame(w, cw), "bi": DataFrame(w, v, cwv),
    "vocab_size": int}`` — for scoring a different corpus with
    ``bigram_lm_scores(df, model=...)``, the actual CCNet workflow (train
    on a clean reference like Wikipedia, score the crawl; Wenzek et al.
    2020). The count frames stay distributed (cache or write them to
    parquet to amortize across scoring runs); only the scalar vocabulary
    size is computed eagerly (keyed distinct → bounded count)."""
    _, grams = _doc_bigrams(ref, id_col, text_col)
    uni = grams.groupBy("w").agg(F.count("*").alias("cw"))
    bi = grams.groupBy("w", "v").agg(F.count("*").alias("cwv"))
    vocab_size = (
        ref.select(F.explode(tokens(text_col)).alias("w")).distinct().count()
    )
    if vocab_size == 0:
        # scoring under an empty model would divide by alpha*0: every logp
        # becomes ln(inf) — fail at fit time with the actual cause instead
        raise ValueError("reference corpus has no tokens to fit a model on")
    return {"uni": uni, "bi": bi, "vocab_size": int(vocab_size)}


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    model: dict | None = None,
    quantize: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-document average bigram log-likelihood under the corpus's OWN
    add-``alpha`` bigram language model — the CCNet-style fluency signal
    (Wenzek et al. 2020 score documents with a KenLM model; self-trained
    add-alpha bigrams are the dependency-free analogue): gibberish,
    boilerplate and shuffled text score low because their transitions are
    rare in the corpus, fluent prose scores high.

    Output: ``(id, n_bigrams, avg_logp)`` — documents with fewer than one
    bigram (0- or 1-token) are emitted with ``n_bigrams = 0`` and NULL
    score so the caller decides their fate explicitly.

    Scale shape (100 TB): bigram explosion is a scan-stage ``transform``
    + ``explode`` (rows × ~tokens, narrow); the model is two
    map-side-combined aggregates (unigram-prefix and bigram counts); the
    scoring join keys on the bigram — a standard shuffle join whose both
    sides are already bigram-keyed — followed by one per-doc aggregate.
    No driver-side model, no Python; the "model" never materializes
    outside the shuffle.

    ``model`` (from :func:`bigram_lm_fit`) switches to scoring under a
    PRE-TRAINED reference model: bigrams unseen in the reference take the
    smoothing floor (``cwv=0``, and ``cw=0`` for unseen prefixes) via
    left joins — out-of-distribution documents score low instead of
    silently dropping their unknown transitions.

    ``quantize=(cell_decimals, avg_decimals)`` switches on the
    ORACLE-REPLAYABLE aggregation: each bigram's log-probability is cast
    to ``DECIMAL(28, cell_decimals)`` (quantized once, at a fixed grid),
    summed per document in exact decimal arithmetic — order-independent,
    unlike a float sum over shuffled rows — and the average is the decimal
    sum divided by the count in float64, rounded to ``avg_decimals``.
    ``log()`` is the one transcendental in this module (the BM25 scorer
    avoids it via the rational idf; here the log IS the semantics), and
    measured on this box JVM ``Math.log`` and libm ``ln`` disagree by
    1 ulp on ~5% of inputs — the two-stage quantization makes those last-
    ulp differences vanish: a 1e-12 grid absorbs 1e-16-relative log
    noise except at grid boundaries, and the final 1e-6 rounding absorbs
    any boundary stragglers in the average. ``(12, 6)`` is the driver
    entry's setting. Default ``None`` keeps full float64 resolution (the
    scores feed threshold cuts, where last-ulp noise is irrelevant).
    """
    base, grams = _doc_bigrams(df, id_col, text_col)
    if model is not None:
        uni, bi = model["uni"], model["bi"]
        v_count = F.lit(int(model["vocab_size"]))
        scored = (
            grams.join(bi, ["w", "v"], "left")
            .join(uni, "w", "left")
            .select(
                "id",
                F.log(
                    (F.coalesce("cwv", F.lit(0)) + F.lit(float(alpha)))
                    / (F.coalesce("cw", F.lit(0)) + F.lit(float(alpha)) * v_count)
                ).alias("__lp"),
            )
        )
    else:
        # vocabulary size via keyed distinct THEN count: countDistinct's
        # final merge would ship every distinct token to one reducer; this
        # shape dedups on a parallel w-keyed exchange and the
        # single-partition stage receives only count partials (longs)
        vocab = (
            base.select(F.explode("__t").alias("w"))
            .distinct()
            .agg(F.count(F.lit(1)).alias("__vocab"))
        )
        uni = grams.groupBy("w").agg(F.count("*").alias("cw"))
        bi = grams.groupBy("w", "v").agg(F.count("*").alias("cwv"))
        joined = bi.join(uni, "w").crossJoin(F.broadcast(vocab))
        logp = F.log(
            (F.col("cwv") + F.lit(float(alpha)))
            / (F.col("cw") + F.lit(float(alpha)) * F.col("__vocab"))
        )
        scored = grams.join(joined, ["w", "v"]).select("id", logp.alias("__lp"))
    if quantize is not None:
        cell_d, avg_d = quantize
        qlp = F.col("__lp").cast(f"decimal(28,{int(cell_d)})")
        per_doc = scored.groupBy("id").agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum(qlp).cast("double") / F.count("*").cast("double"),
                int(avg_d),
            ).alias("avg_logp"),
        )
    else:
        per_doc = scored.groupBy("id").agg(
            F.count("*").alias("n_bigrams"), F.avg("__lp").alias("avg_logp")
        )
    # docs with no bigram (empty/one-token text) re-enter with NULL score
    return (
        base.select("id")
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_logp",
        )
    )


def dsir_scores(
    df: DataFrame,
    target_ref: DataFrame,
    source_ref: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    quantize: tuple[int, int] | None = None,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document average
    log-likelihood RATIO between a bigram model of the TARGET distribution
    (the domain you want more of — e.g. curated reference text) and one of
    the SOURCE distribution (the raw pool) —
    ``dsir = avg_logp_target − avg_logp_source``. Documents that look more
    like the target than like the pool score high; select the top mass.

    ``source_ref=None`` trains the source model on ``df`` itself (the
    common case: the pool is its own background distribution). Both models
    score over ONE joined gram frame — the pool's bigram explosion appears
    once in the scoring path, the four model-count joins hang off it, and
    a single per-doc aggregate computes both averages (vs. running two
    full scoring plans and joining their outputs, which would double the
    heavy per-gram work). The model aggregates themselves are independent
    map-side-combined counts, and the two vocab sizes are bounded eager
    counts (same as :func:`bigram_lm_fit`).

    Output: ``(id_col, n_bigrams, dsir)`` — NULL dsir for 0/1-token
    documents (no transitions to judge). With ``quantize`` both averages
    use the decimal-grid aggregation, making the difference — and hence
    the selection — replayable cross-engine (the driver-entry mode).
    """
    base, grams = _doc_bigrams(df, id_col, text_col)
    t_model = bigram_lm_fit(target_ref, id_col, text_col)
    s_model = bigram_lm_fit(
        df if source_ref is None else source_ref, id_col, text_col
    )
    a = F.lit(float(alpha))
    scored = (
        grams
        .join(t_model["bi"].select(
            "w", "v", F.col("cwv").alias("__t_cwv")), ["w", "v"], "left")
        .join(t_model["uni"].select(
            "w", F.col("cw").alias("__t_cw")), "w", "left")
        .join(s_model["bi"].select(
            "w", "v", F.col("cwv").alias("__s_cwv")), ["w", "v"], "left")
        .join(s_model["uni"].select(
            "w", F.col("cw").alias("__s_cw")), "w", "left")
    )
    # left joins + coalesce-to-0: unseen transitions take the smoothing
    # floor under EITHER model (for a self-trained source every gram
    # matches, so the coalesce is a no-op and values equal the inner join)
    tlp = F.log(
        (F.coalesce("__t_cwv", F.lit(0)) + a)
        / (F.coalesce("__t_cw", F.lit(0)) + a * F.lit(int(t_model["vocab_size"])))
    )
    slp = F.log(
        (F.coalesce("__s_cwv", F.lit(0)) + a)
        / (F.coalesce("__s_cw", F.lit(0)) + a * F.lit(int(s_model["vocab_size"])))
    )
    if quantize is not None:
        cell_d, avg_d = quantize
        dec = f"decimal(28,{int(cell_d)})"
        n = F.count("*").cast("double")
        t_avg = F.round(F.sum(tlp.cast(dec)).cast("double") / n, int(avg_d))
        s_avg = F.round(F.sum(slp.cast(dec)).cast("double") / n, int(avg_d))
    else:
        t_avg, s_avg = F.avg(tlp), F.avg(slp)
    per_doc = scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        (t_avg - s_avg).alias("__dsir"),
    )
    return (
        base.select("id")
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.col("__dsir").alias("dsir"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "lang",
    n_buckets: int = 3,
    alpha: float = 1.0,
    model: dict | None = None,
    quantize: tuple[int, int] | None = None,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank each
    group's documents by LM fluency and deal them into ``n_buckets``
    equal-mass buckets — bucket 1 = "head" (most fluent), bucket
    ``n_buckets`` = "tail". CCNet keeps head+middle per language; the
    bucket column makes that a plain filter.

    Ranking is per-``by`` group (languages must not compete with each
    other — absolute perplexity is not comparable across languages, which
    is the whole reason CCNet buckets per-language). Documents with no
    bigrams (NULL score) sort to the tail, deterministically by id.
    ``model``/``quantize`` pass through to :func:`bigram_lm_scores`; one
    window shuffle on ``by`` on top of the scoring plan.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    scores = bigram_lm_scores(
        df, id_col, text_col, alpha, model=model, quantize=quantize
    )
    joined = df.select(F.col(id_col), F.col(by)).join(scores, id_col)
    w = Window.partitionBy(by).orderBy(
        F.col("avg_logp").desc_nulls_last(), F.col(id_col).asc()
    )
    return joined.select(
        F.col(id_col),
        F.col(by),
        F.col("avg_logp"),
        F.ntile(n_buckets).over(w).alias("bucket"),
    )


def token_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    quantize: tuple[int, int] | None = None,
) -> DataFrame:
    """Lexical drift between two corpora: KL and Jensen-Shannon divergence
    of their add-``alpha``-smoothed unigram distributions — the
    token-level sibling of ``operators.pca.embedding_drift`` (same
    question, answered in vocabulary space instead of embedding space).
    This is the standard corpus-shift diagnostic run before mixing a new
    crawl into a training blend: JS near 0 means the new source is
    lexically redundant, a large KL(b||a) means corpus b spends mass where
    a has none (new domains — or garbage).

    Distributions are over the UNION vocabulary with add-``alpha``
    smoothing (``p(w) = (c(w)+α) / (n+α·|V|)``), so every term is finite
    even for tokens one side never saw. Output is ONE row:
    ``(n_tokens_a, n_tokens_b, vocab_union, kl_ab, kl_ba, js_div)`` with
    ``kl_ab = KL(P_a‖P_b)`` in nats. Both corpora empty → zero counts and
    NULL divergences.

    Scale shape (100 TB): two scan-stage token explodes into two
    map-side-combined ``w``-keyed counts, one vocab-sized full-outer join,
    a 3-scalar totals aggregate broadcast back, and one global sum over
    the per-token terms — the corpus rows themselves never shuffle, only
    (token, count) pairs do, and nothing vocab-sized is collected.

    ``quantize=(cell_decimals, out_decimals)`` switches on the
    oracle-replayable aggregation (same machinery as
    :func:`bigram_lm_scores`): each per-token term is quantized once to a
    fixed decimal grid, summed exactly (order-independent), and the final
    value rounded — ``log()``'s last-ulp JVM/libm disagreement vanishes
    below the grid. The driver entry uses ``(14, 6)``: terms are ≤ ~1 in
    magnitude so a 1e-14 grid loses nothing, and a vocab-sized sum of
    1e-14-grid roundings stays far inside the 1e-6 output rounding.
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive (smoothing keeps KL finite)")

    def _counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(text_col)).alias("w"))
            .groupBy("w")
            .agg(F.count("*").alias(name))
        )

    joined = (
        _counts(df_a, "ca")
        .join(_counts(df_b, "cb"), "w", "full_outer")
        .select(
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .localCheckpoint(eager=False)
    )
    tot = joined.agg(
        F.coalesce(F.sum("ca"), F.lit(0)).alias("na"),
        F.coalesce(F.sum("cb"), F.lit(0)).alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    al = F.lit(float(alpha))
    pa = (F.col("ca") + al) / (F.col("na") + al * F.col("v"))
    pb = (F.col("cb") + al) / (F.col("nb") + al * F.col("v"))
    mid = (pa + pb) / F.lit(2.0)
    t_ab = pa * F.log(pa / pb)
    t_ba = pb * F.log(pb / pa)
    t_js = (pa * F.log(pa / mid) + pb * F.log(pb / mid)) / F.lit(2.0)
    terms = joined.crossJoin(F.broadcast(tot)).select(
        "na", "nb", "v", t_ab.alias("t_ab"), t_ba.alias("t_ba"),
        t_js.alias("t_js"),
    )
    if quantize is not None:
        cell_d, out_d = int(quantize[0]), int(quantize[1])

        def _q(c: str) -> Column:
            return F.round(
                F.sum(F.col(c).cast(f"decimal(28,{cell_d})")).cast("double"),
                out_d,
            )

        sums = [_q("t_ab").alias("kl_ab"), _q("t_ba").alias("kl_ba"),
                _q("t_js").alias("js_div")]
    else:
        sums = [F.sum("t_ab").alias("kl_ab"), F.sum("t_ba").alias("kl_ba"),
                F.sum("t_js").alias("js_div")]
    return terms.agg(
        F.coalesce(F.max("na"), F.lit(0)).alias("n_tokens_a"),
        F.coalesce(F.max("nb"), F.lit(0)).alias("n_tokens_b"),
        F.count(F.lit(1)).alias("vocab_union"),
        *sums,
    )


def zipf_profile(
    df: DataFrame,
    text_col: str = "text",
    top_ranks: int = 200,
    quantize: tuple[int, int] | None = None,
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus's top tokens: least-squares
    slope (and R²) of ``ln(freq)`` against ``ln(rank)`` — natural language
    sits near slope −1 (Zipf's law); machine-generated spam, template
    boilerplate, and over-deduplicated corpora bend the curve, making the
    (slope, R²) pair a cheap corpus-health check alongside
    :func:`token_divergence`.

    Output: ONE row ``(n_tokens, vocab, ranks_used, zipf_slope, zipf_r2)``.
    ``ranks_used = min(top_ranks, vocab)``; fewer than 2 ranks → NULL fit.
    Ranks order by (freq DESC, token) so ties are deterministic.

    Scale shape (100 TB): one scan-stage token explode into a
    map-side-combined count aggregate, a heap top-``top_ranks`` cut
    (``TakeOrderedAndProject`` — the vocab never sorts globally), rank
    assignment by ``row_number`` over the ``top_ranks``-row remainder
    (bounded single-partition window), and one 5-scalar aggregate. The
    corpus-sized side never shuffles anything wider than (token, count).

    ``quantize=(cell_decimals, out_decimals)``: the five ln-product sums
    are quantized to a fixed decimal grid and summed exactly (the
    :func:`bigram_lm_scores` machinery), making the fit order-free and
    oracle-replayable; slope/R² are then a handful of float64 ops on the
    five scalars, rounded to ``out_decimals``.
    """
    if top_ranks < 2:
        raise ValueError("top_ranks must be >= 2 to fit a line")
    counts = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
    )
    top = counts.orderBy(F.col("c").desc(), F.col("w").asc()).limit(
        int(top_ranks)
    )
    ranked = top.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("w").asc()))
        .alias("r"),
    )
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("c").cast("double"))
    if quantize is not None:
        cell_d, out_d = int(quantize[0]), int(quantize[1])

        def _s(e: Column, name: str) -> Column:
            return (
                F.sum(e.cast(f"decimal(28,{cell_d})"))
                .cast("double")
                .alias(name)
            )
    else:
        out_d = None

        def _s(e: Column, name: str) -> Column:
            return F.sum(e).alias(name)

    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        _s(x, "sx"),
        _s(y, "sy"),
        _s(x * y, "sxy"),
        _s(x * x, "sxx"),
        _s(y * y, "syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(varx > 0, cov / varx)
    r2 = F.when((varx > 0) & (vary > 0), cov * cov / (varx * vary))
    if out_d is not None:
        slope, r2 = F.round(slope, out_d), F.round(r2, out_d)
    return tot.crossJoin(F.broadcast(sums)).select(
        "n_tokens",
        "vocab",
        F.col("n").alias("ranks_used"),
        slope.alias("zipf_slope"),
        r2.alias("zipf_r2"),
    )


def oov_stats(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_col: str = "token",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document out-of-vocabulary accounting against a reference
    vocabulary → ``(id_col, n_tokens, n_oov, oov_fraction)``.

    The tokenizer-prep / domain-shift diagnostic: before committing a
    vocabulary (or reusing a pretrained tokenizer) on a new corpus,
    measure how much of each document it cannot represent; high-OOV docs
    are either noise (drop them) or evidence the vocab needs extending.
    ``vocab`` is any one-column DataFrame of tokens (e.g. the distinct
    tokens of the training corpus, or a fixed tokenizer vocabulary).

    ``lowercase`` (default True) folds BOTH the probed tokens and the
    vocabulary to lower case — the same normalization
    :func:`build_vocab` applies — so the documented build_vocab →
    oov_stats pairing measures real coverage instead of counting every
    capitalized occurrence of an in-vocab token as OOV. Pass False only
    when the vocabulary is deliberately case-sensitive.

    Scale shape: one whitespace-token explode of the corpus (the shared
    ``functions.text.tokens`` definition, so counts agree with
    ``token_count``), then a LEFT SEMI probe of the exploded tokens
    against the DISTINCT vocab — a vocabulary is ≤ a few million rows, so
    AQE turns this into a broadcast probe; nothing is collected — and one
    per-doc aggregate. Zero-token docs report ``(0, 0, NULL)``.
    """
    tok_arr = tokens(text_col)
    voc_tok = F.col(vocab_col)
    if lowercase:
        tok_arr = F.transform(tok_arr, F.lower)
        voc_tok = F.lower(voc_tok)
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tok_arr).alias("tok")
    )
    voc = vocab.select(voc_tok.alias("tok")).distinct()
    inv = toks.join(voc, "tok", "left_semi").groupBy("id").agg(
        F.count("*").alias("n_in")
    )
    totals = toks.groupBy("id").agg(F.count("*").alias("n_tokens"))
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(totals, "id", "left")
        .join(inv, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            (
                F.coalesce("n_tokens", F.lit(0)) - F.coalesce("n_in", F.lit(0))
            ).cast("long").alias("n_oov"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                (
                    F.coalesce("n_tokens", F.lit(0))
                    - F.coalesce("n_in", F.lit(0))
                ).cast("double")
                / F.col("n_tokens"),
            ).alias("oov_fraction"),
        )
    )


def build_vocab(
    docs: DataFrame,
    size: int,
    text_col: str = "text",
) -> DataFrame:
    """Induce a ``size``-entry vocabulary by corpus frequency →
    ``(rank, token, n_occurrences, n_docs, coverage)`` where ``coverage``
    is the cumulative fraction of ALL token occurrences the vocabulary
    explains through that rank — the number that tells you whether 30k
    entries cover 99.5% of the corpus or you need 60k.

    This is the frequency-induction half of tokenizer prep (pair it with
    :func:`oov_stats` to measure the held-out corpus): rank by
    (occurrences DESC, token ASC) so the cut is deterministic, cumulative
    sums accumulate in exact DECIMAL, and the final fraction divides by
    the corpus-total occurrence count once, in float64.

    Scale shape: one token explode + one (token) hash aggregate
    (map-side combined) + a global top-``size`` (TakeOrdered) — the only
    single-partition work is the window over the ``size`` surviving rows,
    bounded by the requested vocabulary, never the corpus.
    """
    if size <= 0:
        raise ValueError("size must be positive")
    toks = docs.select(
        F.explode(F.transform(tokens(text_col), F.lower)).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("n_occurrences"))
    # distinct-doc counts ride the same explode shape, deduped per row
    # BEFORE the explode so no (token, doc) shuffle is needed
    per_doc = (
        docs.select(
            F.explode(
                F.array_distinct(F.transform(tokens(text_col), F.lower))
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("n_docs"))
    )
    total = counts.agg(F.sum("n_occurrences")).collect()[0][0] or 0
    top = (
        counts.join(per_doc, "tok")
        .orderBy(F.col("n_occurrences").desc(), F.col("tok").asc())
        .limit(int(size))
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("tok").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        F.col("tok").alias("token"),
        F.col("n_occurrences"),
        F.col("n_docs"),
        (
            F.sum(F.col("n_occurrences").cast("decimal(28,2)")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("double")
            / F.lit(float(total))
        ).alias("coverage"),
    )


def subword_segment_counts(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_col: str = "token",
    lowercase: bool = True,
) -> DataFrame:
    """Deterministic WordPiece-style subword accounting against a
    vocabulary → ``(id_col, n_words, n_subwords, n_unk_chars)``.

    Completes the tokenizer-prep story around :func:`build_vocab` /
    :func:`oov_stats` (r9 verdict item #7): each whitespace word segments
    by GREEDY LONGEST-MATCH — repeatedly take the longest vocabulary
    piece prefixing the remainder; when none matches, consume one
    character as an UNK unit. ``n_subwords`` counts all emitted units
    (pieces + UNKs) per document — a real subword budget for
    ``token_budget_mix`` instead of the regex pre-token estimate
    (``functions.text.bpe_token_count``) — and ``n_unk_chars`` counts the
    UNK units (vocabulary-miss mass). Greedy longest-match is the
    WordPiece inference rule (Wu et al. 2016 §4.1) minus the ``##``
    continuation marking, chosen because it is deterministic and
    SQL-replayable end to end (the oracle walks the same rule with a
    recursive CTE).

    Scale shape: segmentation depends only on the word string, so it runs
    once per DISTINCT word (Zipf: distinct words ≪ token occurrences).
    Per distinct word, all ``(position, ≤maxlen)`` substrings explode
    (bounded by word chars × the vocabulary's max piece length — ONE
    bounded scalar collect), match the vocabulary with a plain join
    (map-side-combined max per position), fold to counts with a single
    linear ``aggregate`` over positions, and the per-word result joins
    back to occurrences (distinct-words-sized side, AQE-broadcastable)
    for one per-doc aggregate. Nothing corpus-sized is ever collected.
    """
    voc = vocab.select(F.col(vocab_col).alias("piece"))
    if lowercase:
        voc = voc.select(F.lower(F.col("piece")).alias("piece"))
    voc = voc.filter(F.length("piece") > 0).distinct()
    max_len = voc.agg(F.max(F.length("piece"))).collect()[0][0]
    L = int(max_len or 1)

    tok_arr = tokens(text_col)
    if lowercase:
        tok_arr = F.transform(tok_arr, F.lower)
    words = docs.select(
        F.col(id_col).alias("id"), F.explode(tok_arr).alias("word")
    ).filter(F.length("word") > 0)
    uw = words.select("word").distinct()

    cand = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.length("word") - 1),
            lambda p: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(L), F.length("word") - p)),
                lambda l: F.struct(
                    p.alias("pos"),
                    F.col("word").substr(p + 1, l).alias("piece"),
                ),
            ),
        )
    )
    ex = uw.select("word", F.explode(cand).alias("c")).select(
        "word", F.col("c.pos").alias("pos"), F.col("c.piece").alias("piece")
    )
    # longest vocabulary match starting at each position (absent = UNK)
    steps = ex.join(voc, "piece").groupBy("word", "pos").agg(
        F.max(F.length("piece")).alias("step")
    )
    step_map = steps.groupBy("word").agg(
        F.map_from_entries(
            F.collect_list(F.struct("pos", "step"))
        ).alias("steps")
    )

    def _stp(j):
        return F.coalesce(F.element_at(F.col("steps"), j), F.lit(0))

    fold = F.aggregate(
        F.sequence(F.lit(0), F.length("word") - 1),
        F.struct(
            F.lit(0).cast("int").alias("nxt"),
            F.lit(0).cast("long").alias("n"),
            F.lit(0).cast("long").alias("unk"),
        ),
        lambda acc, j: F.when(
            j == acc["nxt"],
            F.struct(
                (acc["nxt"] + F.greatest(_stp(j), F.lit(1)))
                .cast("int")
                .alias("nxt"),
                (acc["n"] + F.lit(1)).alias("n"),
                (
                    acc["unk"]
                    + F.when(_stp(j) == 0, F.lit(1)).otherwise(F.lit(0))
                ).alias("unk"),
            ),
        ).otherwise(acc),
    )
    seg = (
        uw.join(step_map, "word", "left")
        .withColumn("__seg", fold)
        .select(
            "word",
            F.col("__seg.n").alias("n_sub"),
            F.col("__seg.unk").alias("n_unk"),
        )
    )
    per_doc = words.join(seg, "word").groupBy("id").agg(
        F.count("*").alias("n_words"),
        F.sum("n_sub").alias("n_subwords"),
        F.sum("n_unk").alias("n_unk_chars"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_subwords", F.lit(0)).cast("long").alias("n_subwords"),
            F.coalesce("n_unk_chars", F.lit(0)).cast("long").alias("n_unk_chars"),
        )
    )


#: Symbol separator for BPE training state — a control char that cannot
#: appear in whitespace tokens of normal text; words containing it are
#: excluded from training (documented contract, zero rows on real corpora).
BPE_SEP = "\x1f"


def bpe_train_merges(
    docs: DataFrame,
    merges: int,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn ``merges`` byte-pair-encoding merge rules from the corpus —
    the training half of the tokenizer-prep story (``build_vocab`` ranks
    whole words, ``subword_segment_counts`` applies a vocabulary; this
    LEARNS the subword units the way GPT-2/LLaMA tokenizers are built).

    Classic BPE (Sennrich et al. 2016) on the word-frequency table: start
    from character symbols, repeatedly take the most frequent adjacent
    symbol pair (ties: lexicographically smallest left, then right — the
    deterministic tie-break) and fuse it everywhere. Returns
    ``[(step, lhs, rhs, pair_count), ...]`` — fewer than ``merges`` rows
    if the corpus runs out of distinct pairs.

    Spark-first shape: ONE corpus-sized job (lowercased whitespace token
    explode → (word, freq) aggregate, the same shape as ``build_vocab``),
    then every round runs on the distinct-WORD table, whose size is
    corpus-independent (Heaps' law: ~millions of rows at 100 TB, not
    trillions). Each round is a pair-count aggregate plus a 1-row
    bounded collect for the argmax; the merge application is a plain
    ``replace`` on a separator-encoded symbol string —

        state    =  SEP SEP sym1 SEP SEP sym2 SEP SEP ... SEP SEP
        pattern  =  SEP l SEP SEP r SEP   →   SEP l·r SEP

    which is exactly left-to-right non-overlapping greedy fusion (the
    doubled separator keeps one SEP of context on each side, so a shared
    boundary never hides the next occurrence and a symbol-SUFFIX never
    false-matches), in whole-stage-codegen string ops — no UDF, no
    per-round corpus pass, and the whole procedure replays in ANSI SQL
    (the driver oracle unrolls the rounds as CTEs).
    """
    return _bpe_train(docs, merges, text_col)[0]


def _bpe_train(
    docs: DataFrame, merges: int, text_col: str
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared training loop → (learned merges, final per-distinct-word
    state ``(w, freq, s)`` with ``s`` the separator-encoded symbols —
    the trained state IS the segmentation of every corpus word)."""
    if merges <= 0:
        raise ValueError("merges must be positive")
    sep2 = BPE_SEP + BPE_SEP
    words = (
        docs.select(F.explode(F.transform(tokens(text_col), F.lower)).alias("w"))
        .filter(~F.col("w").contains(BPE_SEP))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .withColumn(
            "s",
            # '.' in Java regex matches a full CODE POINT (a surrogate
            # pair stays one symbol), matching RE2's ''-split in the
            # oracle; split("") would shear non-BMP chars into halves
            F.concat(
                F.lit(sep2),
                F.array_join(
                    F.regexp_extract_all("w", F.lit("."), 0), sep2
                ),
                F.lit(sep2),
            ),
        )
        # pin the one corpus-sized aggregate; rounds replay only the
        # (constant-depth) replace lineage over this vocab-sized table
        .localCheckpoint(eager=True)
    )
    learned: list[tuple[int, str, str, int]] = []
    for step in range(int(merges)):
        syms = words.withColumn(
            "arr", F.filter(F.split("s", sep2), lambda c: c != "")
        ).filter(F.size("arr") >= 2)
        pairs = (
            syms.withColumn("a1", F.slice("arr", 1, F.size("arr") - 1))
            .withColumn("a2", F.slice("arr", 2, F.size("arr") - 1))
            .select("freq", F.explode(F.arrays_zip("a1", "a2")).alias("p"))
            .groupBy(F.col("p.a1").alias("lhs"), F.col("p.a2").alias("rhs"))
            .agg(F.sum("freq").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.desc("pair_count"), F.asc("lhs"), F.asc("rhs")
        ).limit(1).collect()
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], best[0]["pair_count"]
        learned.append((step, lhs, rhs, int(cnt)))
        words = words.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(BPE_SEP + lhs + sep2 + rhs + BPE_SEP),
                F.lit(BPE_SEP + lhs + rhs + BPE_SEP),
            ),
        )
    return learned, words


def bpe_merges_df(
    docs: DataFrame, merges: int, text_col: str = "text"
) -> DataFrame:
    """``bpe_train_merges`` as a DataFrame ``(step, lhs, rhs,
    pair_count)`` — the driver-query/oracle surface."""
    spark = docs.sparkSession
    rows = bpe_train_merges(docs, merges, text_col=text_col)
    return spark.createDataFrame(
        rows or [], "step BIGINT, lhs STRING, rhs STRING, pair_count BIGINT"
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token counts under the LEARNED ``merges``-rule BPE →
    ``(id_col, n_words, n_bpe_tokens)`` — the apply half of
    :func:`bpe_train_merges`, giving ``token_budget_mix`` a budget in
    units of the tokenizer you just trained rather than the regex
    estimate (``functions.text.bpe_token_count``) or a fixed external
    vocabulary (``subword_segment_counts``).

    The trained state already IS the segmentation: after the k-th merge,
    a word's symbol string holds exactly its BPE units, so applying = one
    symbol count per DISTINCT word plus the same occurrences join-back /
    per-doc aggregate shape as ``subword_segment_counts`` (zero-token
    docs report (0, 0)). Words containing the reserved separator are
    excluded from training AND counting (zero such words on real text).
    """
    sep2 = BPE_SEP + BPE_SEP
    _, words = _bpe_train(docs, merges, text_col)
    per_word = words.select(
        "w",
        F.size(
            F.filter(F.split("s", sep2), lambda c: c != "")
        ).cast("long").alias("n_units"),
    )
    occurrences = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("w"),
    ).filter(~F.col("w").contains(BPE_SEP))
    per_doc = occurrences.join(per_word, "w").groupBy("id").agg(
        F.count("*").alias("n_words"),
        F.sum("n_units").alias("n_bpe_tokens"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias("n_bpe_tokens"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document novelty: the fraction of its DISTINCT word n-grams
    that occur in NO other document → ``(doc_id, n_grams, n_unique,
    novelty)``, NULL novelty for docs too short for one n-gram.

    The self-corpus complement of :func:`~kaer_spark.operators.
    contamination.overlap_fraction` (which scores an eval set against a
    train corpus): low novelty = the document is assembled from text the
    corpus already has elsewhere — boilerplate, mirrored pages, template
    farms — the rows a dedup pass hasn't caught yet but a quality cut
    should down-weight; high novelty = genuinely new content. The n-gram
    document frequency is the SAME quantity the line-level and Jaccard
    dedup families key on, so the score is a cheap corpus-health
    dimension next to them.

    Scale shape: one explode of per-doc distinct grams, one gram-keyed
    df count (map-side combinable), one join back to the exploded grams
    (both sides already gram-partitioned — AQE plans it shuffle-reusing),
    one per-doc aggregate. No strings leave the gram stages except as
    join keys; nothing is collected."""
    from kaer_spark.functions.text import word_shingles
    from kaer_spark.operators.util import ensure_parallelism

    grams = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            word_shingles(text_col, n=n, distinct=True)
        ).alias("g"),
    )
    dfreq = grams.groupBy("g").agg(
        F.count("*").cast("long").alias("df")
    )
    per_doc = (
        grams.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_unique"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            (
                F.col("n_unique").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("novelty"),
        )
    )


def pmi_bigrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Top collocations by pointwise mutual information → ``(w, v,
    n_pair, lift)`` where ``lift = c(wv)·N / (c(w·)·c(·v))`` is the
    exact PMI ratio (PMI = ln(lift); ln is strictly monotone, so the
    ranking is PMI's) against the pair distribution's own marginals,
    ``min_count`` support floor (PMI's rare-pair pathology),
    deterministic (lift desc, w, v) top-``top_n``. The ratio is reported
    instead of its log because it replays BIT-exactly (one float64
    division of exact int64 products) — engine `ln`s disagree by 1 ulp
    on some arguments (measured vs DuckDB), and a score that can't pass
    the value-hash gate is worth less than its monotone twin that can.

    The collocation extractor of tokenizer prep and corpus analysis:
    high-PMI pairs ("Hong Kong", "ice cream") are the units BPE/WordPiece
    should learn as one token and the phrases a dedup/quality reviewer
    reads first. Tokenization matches the bigram-LM family
    (``_doc_bigrams``: whitespace, case-preserving).

    Exactness: both ln arguments are exact int64 products cast once to
    float64 and divided once — the single-ln replay discipline the LM
    scorers established. Scale shape: one (w, v)-keyed shuffle of the
    corpus bigram stream (map-side combined); the marginals derive from
    the DISTINCT-pair table (vocab²-bounded, not corpus-bounded); the
    corpus total crossJoins as one broadcast row; final cut is
    TakeOrderedAndProject."""
    _, grams = _doc_bigrams(df, id_col, text_col)
    # localCheckpoint (r17 item 13): four consumers (the support filter
    # and all three marginals) otherwise EACH re-scan and re-explode the
    # corpus — profiled as four parallel single-split scan stages; the
    # checkpointed pair table is vocab²-bounded, so materializing it
    # turns four corpus passes into one at any scale. eager=False per
    # the family discipline (folds into the first consuming job).
    pair = (
        grams.groupBy("w", "v")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    left = pair.groupBy("w").agg(F.sum("c").cast("long").alias("cl"))
    right = pair.groupBy("v").agg(F.sum("c").cast("long").alias("cr"))
    tot = pair.agg(F.sum("c").cast("long").alias("n"))
    return (
        pair.filter(F.col("c") >= int(min_count))
        .join(left, "w")
        .join(right, "v")
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            "v",
            F.col("c").alias("n_pair"),
            (
                (F.col("c") * F.col("n")).cast("double")
                / (F.col("cl") * F.col("cr")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("w").asc(), F.col("v").asc())
        .limit(int(top_n))
    )
