"""Text-analysis expressions for the LLM-data-pipeline surface.

All pure Catalyst expressions (split / transform / aggregate / sequence) —
JVM-side, codegen-friendly, and exactly reproducible by a SQL oracle. Every
function documents its oracle-SQL equivalent so the DuckDB correctness gate
can replicate it bit-for-bit.

Design notes for 100 TB: these are narrow per-row projections with no
shuffle; they pipeline inside the parquet scan stage. The only wide ops in
this module's consumers (dedup, similarity join) are documented there.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kaer_spark.functions.vector import _as_col, ColumnOrName

#: tiny per-language stopword lists for the n-gram/lexicon language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "una"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "que"],
}
# zh detection is script-based (CJK codepoints), not lexicon-based.

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31

ENGLISH_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def tokens(c: ColumnOrName) -> Column:
    """Whitespace tokenization; empty/blank text yields an empty array.

    Oracle SQL: ``CASE WHEN trim(text)='' THEN [] ELSE
    regexp_split_to_array(trim(text), '\\s+') END``.
    """
    t = F.trim(_as_col(c))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(c: ColumnOrName) -> Column:
    return F.size(tokens(c)).cast("long")


#: GPT-2-style pre-tokenizer pattern, restricted to constructs whose meaning
#: is identical in Java regex (Spark) and RE2 (DuckDB): English contractions,
#: optional-space letter runs, digit runs, and non-alphanumeric runs. This is
#: the "BPE-ish" token accounting used for per-document token budgeting —
#: the subword merge step is model-specific and out of scope.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_tokens(c: ColumnOrName) -> Column:
    """BPE-style pre-tokens (contractions / word / number / punct runs).

    Oracle SQL: ``regexp_extract_all(text, <BPE_PATTERN>)``.
    """
    return F.regexp_extract_all(_as_col(c), F.lit(BPE_PATTERN), F.lit(0))


def bpe_token_count(c: ColumnOrName) -> Column:
    """Number of BPE-style pre-tokens — the per-doc training-token estimate."""
    return F.size(bpe_tokens(c)).cast("long")


def char_shingles(c: ColumnOrName, n: int = 8, distinct: bool = True) -> Column:
    """Character n-gram shingles (optionally distinct) of a string column.

    Guarded so strings shorter than ``n`` produce an empty array (Spark's
    ``sequence(1, 0)`` would otherwise count *down*).
    """
    col = _as_col(c)
    idx = F.sequence(F.lit(1), F.length(col) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.substring(col, i, F.lit(n)))
    grams = F.when(F.length(col) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(grams) if distinct else grams


def word_shingles(c: ColumnOrName, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles joined with a single space."""
    toks = tokens(c)
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    grams = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(grams) if distinct else grams


def punct_ratio(c: ColumnOrName) -> Column:
    """Fraction of characters that are not alphanumeric/whitespace."""
    col = _as_col(c)
    stripped = F.regexp_replace(col, r"[^A-Za-z0-9\s]", "")
    return F.when(
        F.length(col) > 0,
        (F.length(col) - F.length(stripped)).cast("double") / F.length(col),
    ).otherwise(F.lit(0.0))


def stopword_ratio(c: ColumnOrName, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    sw = F.array(*[F.lit(w) for w in (stopwords or ENGLISH_STOPWORDS)])
    toks = tokens(c)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(c: ColumnOrName) -> Column:
    """Deterministic document-quality heuristic in [0, 1].

    0.4 · min(tokens/64, 1)  — enough content
    0.3 · (1 − punct_ratio)  — not symbol soup
    0.3 · min(4·stopword_ratio, 1) — natural-language-ness

    Pure per-row double arithmetic; identical IEEE ops on the oracle side.
    """
    tc = token_count(c).cast("double")
    return (
        F.lit(0.4) * F.least(tc / F.lit(64.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(c))
        + F.lit(0.3) * F.least(F.lit(4.0) * stopword_ratio(c), F.lit(1.0))
    )


def lang_id(c: ColumnOrName) -> Column:
    """Lexicon/script language guesser over {en, de, es, fr, zh, und}.

    CJK script share decides ``zh``; otherwise the language with the most
    distinct stopword hits wins, ties broken by language-code order. A text
    with zero evidence is ``und`` (undetermined).
    """
    col = _as_col(c)
    toks = F.transform(tokens(col), F.lower)
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in LANG_MARKERS.items()
    }
    cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", ""))
    best = F.greatest(*scores.values())
    expr = F.when(cjk > 0, F.lit("zh")).when(best <= 0, F.lit("und"))
    for lang in sorted(scores):  # deterministic tie-break: first max in order
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def with_lang_guess(df, text_col: str = "text", out_col: str = "lang_guess"):
    """DataFrame-level language ID: same semantics as ``lang_id`` but the
    four stopword-intersection scores are materialized as named columns
    first, so the CASE's repeated references (each branch compares against
    ``greatest`` of all four) are evaluated once per row instead of once
    per branch — ~2× faster on real corpora.
    """
    s_cols = {lang: f"_lang_s_{lang}" for lang in LANG_MARKERS}
    toks = F.transform(tokens(text_col), F.lower)
    scored = df.select(
        "*",
        *[
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))
            ).alias(s_cols[lang])
            for lang, ws in LANG_MARKERS.items()
        ],
    )
    cjk = F.length(F.regexp_replace(_as_col(text_col), r"[^一-鿿]", ""))
    best = F.greatest(*[F.col(n) for n in s_cols.values()])
    expr = F.when(cjk > 0, F.lit("zh")).when(best <= 0, F.lit("und"))
    for lang in sorted(s_cols):
        expr = expr.when(F.col(s_cols[lang]) == best, F.lit(lang))
    return scored.select(*df.columns, expr.alias(out_col))


def doc_fingerprint(c: ColumnOrName) -> Column:
    """Polynomial rolling-hash fingerprint of the full text.

    ``fp = fold(chars, acc -> (acc*31 + codepoint) mod 1_000_000_007)`` —
    pure int64 arithmetic (max intermediate ≈ 3.1e10), so a SQL oracle
    reproduces it exactly:
    ``list_reduce(list_transform(range(1, length(t)+1),
    i -> ascii(substr(t, i, 1))), (a, x) -> (a*31 + x) % 1000000007)``
    (DuckDB's reduce seeds with the first element, which equals our
    ``(0*31 + c1) mod p`` first step).
    """
    col = _as_col(c)
    # split('') yields the char array in ONE pass; the per-index
    # substring(col, i, 1) form is O(n²) on UTF8 strings (each call scans
    # from the start to find the i-th codepoint) — ~3× slower end-to-end.
    codes = F.transform(F.split(col, ""), lambda ch: F.ascii(ch).cast("long"))
    folded = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FINGERPRINT_BASE + x) % FINGERPRINT_MOD,
    )
    return F.when(F.length(col) > 0, folded).otherwise(F.lit(0).cast("long"))


# -- PII redaction / normalization (training-data hygiene) ------------------
# Deliberately simple, auditable patterns (the production stance: high
# recall regexes + a human-reviewed allowlist, not ML): emails, bare
# phone-ish digit runs, http(s) URLs. Pure regexp_replace — stays inside
# whole-stage codegen, oracle-replayable in any regex-capable engine.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL_RE = r"https?://[^\s]+"
PII_PHONE_RE = r"\+?\d[\d() .-]{7,}\d"


def redact_pii(
    c: ColumnOrName,
    email_token: str = "<EMAIL>",
    url_token: str = "<URL>",
    phone_token: str = "<PHONE>",
) -> Column:
    """Replace emails, URLs, then phone-like digit runs with stable tokens.

    Order matters and is part of the contract: URLs are redacted before
    phone runs so digit-bearing URLs don't get half-eaten by the phone
    pattern; the oracle applies the same three regexes in the same order.
    """
    col = F.col(c) if isinstance(c, str) else c
    out = F.regexp_replace(col, PII_EMAIL_RE, email_token)
    out = F.regexp_replace(out, PII_URL_RE, url_token)
    return F.regexp_replace(out, PII_PHONE_RE, phone_token)


def normalize_whitespace(c: ColumnOrName) -> Column:
    """Collapse runs of whitespace to single spaces and trim — the
    canonicalization step before fingerprinting/dedup."""
    col = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def chunk_spans(c: ColumnOrName, size: int, overlap: int = 0) -> Column:
    """1-based start offsets of fixed-size chunks with ``overlap`` chars of
    context carried between consecutive chunks (context-window chunking for
    training/embedding). stride = size - overlap; a final short chunk is
    kept. Empty text yields no spans."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    col = F.col(c) if isinstance(c, str) else c
    stride = size - overlap
    # number of chunks = ceil(max(len - overlap, 0) / stride), at least 1
    # for non-empty text; sequence() is inclusive so the last start is
    # (n_chunks - 1) * stride + 1
    n = F.ceil((F.greatest(F.length(col) - F.lit(overlap), F.lit(0)))
               / F.lit(stride)).cast("long")
    n = F.when(F.length(col) > 0, F.greatest(n, F.lit(1))).otherwise(F.lit(0))
    return F.when(
        n > 0,
        F.sequence(F.lit(1), (n - 1) * stride + 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<long>"))


def chunk_documents(
    df, id_col: str = "doc_id", text_col: str = "text",
    size: int = 512, overlap: int = 64,
):
    """Explode documents into overlapping chunks: one row per chunk with
    (doc id, 0-based chunk index, 1-based char start, chunk text). The
    standard pre-embedding shape; explode keeps it one narrow scan-side
    pass — no shuffle, no UDF."""
    spans = F.posexplode(chunk_spans(text_col, size, overlap))
    return df.select(
        F.col(id_col), F.col(text_col), spans.alias("chunk_idx", "chunk_start")
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start"),
        F.substring(F.col(text_col), F.col("chunk_start").cast("int"), size).alias(
            "chunk_text"
        ),
    )


# ---------------------------------------------------------------------------
# repetition metrics (Gopher-style "repetitive document" signals)
# ---------------------------------------------------------------------------
def distinct_word_ratio(c: ColumnOrName) -> Column:
    """|distinct words| / |words| — 1.0 means no repeated word, → 0 for
    highly repetitive text. NULL (not NaN) for empty/blank text.

    Oracle SQL: ``len(list_distinct(ws))::DOUBLE / len(ws)`` over the same
    whitespace tokenization (a single int/int IEEE division, bit-exact
    across engines).
    """
    toks = tokens(c)
    return F.when(
        F.size(toks) > 0,
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
    )


def _max_run(arr: Column) -> Column:
    """Longest run of equal consecutive elements of a string array — a
    single O(len) fold (struct state: previous element, current run, best
    run), no explode, no shuffle. Empty array -> 0."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = (
            F.when(acc["prev"].eqNullSafe(x), acc["run"] + F.lit(1))
            .otherwise(F.lit(1))
            .cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(arr, init, step, lambda acc: acc["best"])


def max_word_run(c: ColumnOrName) -> Column:
    """Longest run of the *same word* repeated consecutively ("go go go go"
    -> 4). The classic stutter/boilerplate signal. 0 for empty text.

    Oracle SQL: gaps-and-islands over ``unnest(ws) WITH ORDINALITY``
    (an independent algorithm — cross-checks the fold).
    """
    return _max_run(tokens(c))


def top_ngram_fraction(c: ColumnOrName, n: int = 2) -> Column:
    """Share of all word n-grams taken by the single most frequent n-gram
    (Gopher repetition rule: high -> boilerplate/spam). NULL when the text
    has fewer than ``n`` words.

    Computed as a sort + run-length fold over the *non-distinct* shingle
    array: O(L log L) per row, no explode, no shuffle — survives any corpus
    size because cost is per-document, and documents are bounded by
    upstream chunking ([[doc_chunks]]).

    Oracle SQL: per-doc ``max(cnt)::DOUBLE / sum(cnt)`` over
    ``GROUP BY doc, gram`` (independent algorithm, same single division).
    """
    grams = word_shingles(c, n=n, distinct=False)
    return F.when(
        F.size(grams) > 0,
        _max_run(F.array_sort(grams)).cast("double") / F.size(grams),
    )
