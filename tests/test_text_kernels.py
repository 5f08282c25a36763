"""Focused differentials for the r6 text-analysis Arrow kernels: each must
reproduce its Catalyst/regex reference exactly on adversarial rows (empty,
whitespace runs, non-ASCII fallback, mixed classes, long rows)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from pdf_extract_sys_spark.kernels.shingle import (
    bpe_token_count_batches,
    ngram_distinct_array_batches,
    ngram_string_batches,
    simhash_batches,
)
from pdf_extract_sys_spark.kernels.md5np import md5_first56_long


def _batch(texts):
    return pa.RecordBatch.from_arrays(
        [pa.array(list(range(len(texts))), pa.int64()),
         pa.array(texts, pa.string())],
        names=["doc_id", "t"],
    )


BPE_PAT = re.compile("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")
BPE_TEXTS = [
    "", " ", "abc", "abc123def", "a1b2 c3!d4?", "hello  world!!",
    "naïve café 123 déjà", "中文123abc", "🙂a1🙂", "tabs\tand\nnewlines",
    "UPPER lower MiXeD 000111", "!@#$%^&*()", "a" * 300 + "5" * 300,
]


def test_bpe_token_counts_match_re():
    (out,) = list(bpe_token_count_batches()(iter([_batch(BPE_TEXTS)])))
    for i, t in enumerate(BPE_TEXTS):
        assert out.column(1)[i].as_py() == len(BPE_PAT.findall(t)), t
        assert out.column(2)[i].as_py() == len(t.split(" ")), t


NGRAM_TEXTS = [
    "", "a b", "one two three four five six seven eight nine ten eleven",
    "a  b   c " + "w " * 12, "naïve café x " + "tok " * 12, "t " * 9 + "t",
]


def test_ngram_strings_match_explode_reference():
    (out,) = list(ngram_string_batches(10)(iter([_batch(NGRAM_TEXTS)])))
    got = sorted(zip(out.column(0).to_pylist(), out.column(1).to_pylist()))
    exp = []
    for i, t in enumerate(NGRAM_TEXTS):
        toks = t.split(" ")
        for j in range(len(toks) - 9):
            exp.append((i, " ".join(toks[j:j + 10])))
    assert got == sorted(exp)


TG_TEXTS = [
    "", "a", "a b", "a b c", "one two three four two three four five",
    "x  y   z w", "naïve café x y z", "a b c " * 40, "t " * 2 + "t",
]


def test_ngram_distinct_arrays_match_reference_sets():
    (out,) = list(ngram_distinct_array_batches(3)(iter([_batch(TG_TEXTS)])))
    for i, t in enumerate(TG_TEXTS):
        toks = t.split(" ")
        exp = ({" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
               if len(toks) >= 3 else set())
        got = out.column(1)[i].as_py()
        assert set(got) == exp and len(got) == len(exp), t


SIMHASH_TEXTS = ["", "one", "one two  three", "naïve café 中文", "w " * 80]


def test_simhash_matches_reference():
    nbits = 16
    (out,) = list(simhash_batches(nbits)(iter([_batch(SIMHASH_TEXTS)])))
    for i, t in enumerate(SIMHASH_TEXTS):
        hs = [md5_first56_long(tok.encode("utf-8")) for tok in t.split(" ")]
        sim = 0
        for j in range(nbits):
            votes = sum(1 if (h >> j) & 1 else -1 for h in hs)
            if votes > 0:
                sim |= 1 << j
        assert out.column(1)[i].as_py() == sim, t
