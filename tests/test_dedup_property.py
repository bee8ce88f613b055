"""Property-based cross-checks for the round-9 text transforms: random
small corpora vs independent pure-python references. The engine computes
with poly-hash fingerprints and Catalyst folds; the references compare raw
substrings/lines — agreement over a tight alphabet (forcing heavy
collisions of CONTENT, while 64-bit hash collisions stay ~impossible)
pins the span-merge, threshold, ordering, and rebuild semantics far
beyond the hand-picked unit cases."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

L = 4  # window length for passage tests (small → dense collisions)


def _py_remove_lines(rows, min_docs, sep="\n"):
    from collections import defaultdict

    docfreq = defaultdict(set)
    for doc_id, text in rows:
        for ln in text.split(sep):
            if ln.strip():
                docfreq[ln].add(doc_id)
    out = {}
    for doc_id, text in rows:
        lines = [ln for ln in text.split(sep) if ln.strip()]
        kept = [ln for ln in lines if len(docfreq[ln]) < min_docs]
        out[doc_id] = (sep.join(kept), len(lines), len(kept))
    return out


def _py_remove_passages(rows, length, min_docs):
    from collections import defaultdict

    per_win = defaultdict(set)
    for doc_id, text in rows:
        for i in range(len(text) - length + 1):
            per_win[text[i : i + length]].add(doc_id)
    dup = {w for w, ids in per_win.items() if len(ids) >= min_docs}
    out = {}
    for doc_id, text in rows:
        starts = [
            i for i in range(len(text) - length + 1)
            if text[i : i + length] in dup
        ]
        spans = []
        for s in starts:  # merge [s, s+L-1], +1 adjacency
            e = s + length - 1
            if spans and s <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        clean, prev = [], 0
        for s, e in spans:
            clean.append(text[prev:s])
            prev = e + 1
        clean.append(text[prev:])
        removed = sum(e - s + 1 for s, e in spans)
        out[doc_id] = ("".join(clean), len(spans), removed)
    return out


_words = st.sampled_from(["aa", "ab", "ba", "x", "yz", "  ", ""])
_line = st.lists(_words, min_size=0, max_size=3).map(" ".join)
_doc = st.lists(_line, min_size=0, max_size=5).map("\n".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


@given(texts=_corpus, min_docs=st.integers(1, 3))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_remove_duplicate_lines_matches_python(spark, texts, min_docs):
    from kaer_spark.operators.dedup import remove_duplicate_lines

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_kept"])
        for r in remove_duplicate_lines(df, min_docs=min_docs).collect()
    }
    assert got == _py_remove_lines(rows, min_docs)


# passage alphabet: 3 symbols → length-4 windows collide constantly
_ptext = st.text(alphabet="ab ", min_size=0, max_size=30)


@given(texts=st.lists(_ptext, min_size=1, max_size=6), min_docs=st.integers(1, 3))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_remove_duplicate_passages_matches_python(spark, texts, min_docs):
    from kaer_spark.operators.dedup import remove_duplicate_passages

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_spans"], r["n_chars_removed"])
        for r in remove_duplicate_passages(
            df, length=L, min_docs=min_docs
        ).collect()
    }
    assert got == _py_remove_passages(rows, L, min_docs)


@given(texts=st.lists(_ptext, min_size=2, max_size=6))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_passage_against_matches_python(spark, texts):
    """Cross-corpus variant: left = even rows, right = odd rows; flagged =
    left windows present anywhere in right."""
    from kaer_spark.operators.dedup import remove_duplicate_passages_against

    rows = list(enumerate(texts))
    left = [(i, t) for i, t in rows if i % 2 == 0]
    right = [(i, t) for i, t in rows if i % 2 == 1]
    ldf = spark.createDataFrame(left, "doc_id long, text string")
    rdf = spark.createDataFrame(right, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_spans"], r["n_chars_removed"])
        for r in remove_duplicate_passages_against(ldf, rdf, length=L).collect()
    }
    # python reference: right windows as the dup set, min_docs irrelevant
    rwins = {
        t[i : i + L] for _, t in right for i in range(len(t) - L + 1)
    }
    from collections import defaultdict  # noqa: F401  (parity with helpers)

    want = {}
    for doc_id, text in left:
        starts = [
            i for i in range(len(text) - L + 1) if text[i : i + L] in rwins
        ]
        spans = []
        for s in starts:
            e = s + L - 1
            if spans and s <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        clean, prev = [], 0
        for s, e in spans:
            clean.append(text[prev:s])
            prev = e + 1
        clean.append(text[prev:])
        want[doc_id] = (
            "".join(clean), len(spans), sum(e - s + 1 for s, e in spans)
        )
    assert got == want


def test_minhash_recall_report_consistency(spark, sf_dir):
    """found ⊆ truth (the verified-candidate invariant the one-aggregate
    report relies on), and the report numbers reconcile with the two
    underlying pair sets."""
    from kaer_spark.operators.dedup import (
        minhash_near_dups,
        minhash_recall_report,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, n=8, threshold=0.4, max_doc_freq=None
        ).collect()
    }
    found = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dups(
            docs, n=8, num_hashes=16, bands=4, threshold=0.4, seed=42
        ).collect()
    }
    assert found <= truth
    rep = minhash_recall_report(
        docs, n=8, num_hashes=16, bands=4, threshold=0.4, seed=42
    ).collect()[0]
    assert rep["n_truth"] == len(truth)
    assert rep["n_found"] == len(found)
    assert rep["n_missed"] == len(truth) - len(found)
    if truth:
        assert rep["recall"] == len(found) / len(truth)
    else:
        assert rep["recall"] is None


def test_minhash_recall_empty_sample(spark):
    from kaer_spark.operators.dedup import minhash_recall_report

    docs = spark.createDataFrame(
        [(1, "short")], "doc_id long, text string"
    )
    rep = minhash_recall_report(docs, sample_permille=0).collect()[0]
    assert (rep["n_truth"], rep["n_found"], rep["n_missed"]) == (0, 0, 0)
    assert rep["recall"] is None


# --- CDC chunking (r11) ------------------------------------------------------

_ctext = st.text(alphabet="abc xyz", min_size=0, max_size=60)


@given(texts=st.lists(_ctext, min_size=1, max_size=6),
       divisor=st.sampled_from([4, 8, 16]))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cdc_chunks_match_python(spark, texts, divisor):
    """Random small corpora: every (start, len, fp) chunk row equals the
    pure-python Rabin-boundary replay — boundary rule, truncation, short-
    doc and empty-doc conventions all pinned (w=4 over a 7-symbol alphabet
    forces frequent boundaries AND frequent none-at-all)."""
    from kaer_spark.operators.dedup import cdc_chunks
    from tests.test_dedup import _py_cdc

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(df, w=4, divisor=divisor).collect():
        got.setdefault(r["id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_len"], r["chunk_fp"])
        )
    for v in got.values():
        v.sort()
    want = {
        i: [(j, s, ln, fp) for j, (s, ln, fp) in enumerate(_py_cdc(t, 4, divisor))]
        for i, t in rows
        if t
    }
    assert got == want


def _py_jaccard_serve_time_cap(rows, n, cap, threshold):
    """Pure-python reference for the v2 shingle index's serving semantics:
    distinct char n-grams, doc-freq cap applied over the WHOLE corpus
    (serve-time), Jaccard over kept shingles."""
    from collections import Counter

    sh = {
        d: {t[i:i + n] for i in range(len(t) - n + 1)}
        for d, t in rows
        if len(t) >= n
    }
    dfc = Counter(g for s in sh.values() for g in s)
    hot = (
        {g for g, c in dfc.items() if c > cap} if cap is not None else set()
    )
    kept = {d: s - hot for d, s in sh.items()}
    out = {}
    ids = sorted(kept)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(kept[a] & kept[b])
            if inter == 0:
                continue
            j = inter / len(kept[a] | kept[b])
            if j >= threshold:
                out[(a, b)] = j
    return out


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=1, max_size=8,
    ),
    cut=st.integers(0, 8),
    cap=st.sampled_from([None, 1, 2, 4]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_shingle_refresh_serves_from_text_semantics(spark, texts, cut, cap):
    """Prefix build + refresh over ANY random corpus/split/cap must serve
    pairs identical to the from-text semantics over the union with the
    cap decided on the union's doc frequencies — the exact property the
    v1 frozen-cap layout could not have (its hot set froze at the
    prefix). The tight alphabet makes 4-gram collisions constant, so
    the cap genuinely bites; degenerate cases (empty prefix, all-short
    docs, empty corpus sides) ride along."""
    import shutil
    import tempfile

    from kaer_spark.operators.dedup import (
        build_shingle_index,
        ngram_jaccard_pairs_indexed,
        refresh_shingle_index,
    )

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = tempfile.mkdtemp(prefix="shprop_")
    try:
        build_shingle_index(
            df.filter(f"doc_id < {cut}"), path, n=4, max_doc_freq=cap
        )
        refresh_shingle_index(df, path)
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs_indexed(
                spark, path, threshold=0.2
            ).collect()
        }
        assert got == _py_jaccard_serve_time_cap(rows, 4, cap, 0.2)
    finally:
        shutil.rmtree(path, ignore_errors=True)
