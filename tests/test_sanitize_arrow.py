"""The r6 Arrow/RE2 sanitize + sentence-dot kernels must agree byte-for-byte
with the Catalyst (Java regex) chain they replaced, across adversarial inputs:
mixed-case 'www' runs, digits/punctuation/newlines, non-ASCII (multi-byte and
astral codepoints), repeated/leading/trailing spaces, and word counts around
the 10-word sentence boundary."""

from __future__ import annotations

import pyarrow as pa
import pytest

from pdf_extract_sys_spark.queries import (
    _SANITIZE_SPARK,
    _SENT_WORDS,
    _sanitize_arrow,
    _sentence_dots_arrow,
)

ADVERSARIAL = [
    "",
    "   ",
    "plain words only here",
    "  leading and trailing  ",
    "double  spaces   collapse",
    "WWW wWw wwW WwW www WWWW wwwww",
    "interleaved wwwwww runs wwW.www",
    "digits 123 and punct !?.,;: and\nnewlines\ttabs",
    "naïve café déjà vu 中文 字 🙂 emoji",
    "wẅw unicode ẅww lookalikes",
    "a " * 9 + "a",          # exactly 10 words
    "b " * 10 + "b",         # 11 words (partial tail)
    "c " * 19 + "c",         # exactly 20 words
    "word" * 50,             # one giant word
    ". . . www. ... w w w",
    "q" * 300 + " " + "z" * 300,
]


@pytest.fixture(scope="module")
def catalyst(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, t) for i, t in enumerate(ADVERSARIAL)],
                               "i long, text string")
    group_pat = r"((?:[A-Za-z]+ ){%d}[A-Za-z]+)" % (_SENT_WORDS - 1)
    t = _SANITIZE_SPARK(F.col("text"))
    n_words = F.size(F.split(t, " "))
    sent = F.regexp_replace(t, group_pat, r"$1.")
    sent = F.when(n_words % _SENT_WORDS == 0, sent).otherwise(
        F.concat(sent, F.lit(".")))
    rows = (df.select("i", t.alias("san"), sent.alias("sent"))
            .orderBy("i").collect())
    return [r["san"] for r in rows], [r["sent"] for r in rows]


def test_sanitize_arrow_matches_catalyst(catalyst):
    got = _sanitize_arrow(pa.array(ADVERSARIAL, pa.string())).to_pylist()
    assert got == catalyst[0]


def test_sentence_dots_arrow_matches_catalyst(catalyst):
    san = _sanitize_arrow(pa.array(ADVERSARIAL, pa.string()))
    got = _sentence_dots_arrow(san).to_pylist()
    assert got == catalyst[1]
