"""Randomized differential fuzzing of the surprisal text kernels
(r6 verdict item 8): `doc_token_sums` and `doc_bigram_keys` against a
straight-line Python reference of the expression-face semantics
(split on runs of the Java ``\\s`` ASCII class over 0x20-trimmed
text, leading/trailing empties kept, interior runs collapsed — the
semantics the DuckDB oracle pins on the expression faces), across the
Arrow representations the kernels branch on: utf8 vs large_utf8
offsets (`flatten_utf8:56`), sliced arrays with non-zero
`arr.offset`, chunked arrays, and the utf8→large_utf8 switchover in
`tokens_string_array:232` (exercised by lowering the patchable
`_I32_MAX` threshold instead of allocating 2 GiB).

No SparkSession needed — these are pure Arrow/numpy kernels, so the
property tests run hundreds of corpora in seconds.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from otrrentetl_spark.operators import textkernel as tk

SEP_RE = re.compile("[ \t\n\x0b\f\r]+")

# separator-heavy alphabet plus multi-byte unicode (2- and 3-byte
# UTF-8, including the dotted-I casefold corner), dots and hashes
PIECES = [
    " ", "  ", "\t", "\n", "\x0b", "\f", "\r", ".", "...", "#",
    "the", "The", "a", "x", "yz", "123", "!?", "für", "naïve",
    "héllo", "İT", "ıs", "€", "日本", "", "ab.cd", "#tag",
]

texts_st = st.lists(
    st.lists(st.sampled_from(PIECES), min_size=0, max_size=12).map("".join),
    min_size=0,
    max_size=10,
)


def _ref_seq(doc: str) -> list[str]:
    """split()-style token sequence of a 0x20-trimmed doc: leading /
    trailing empty tokens kept, interior separator runs collapse, and
    the empty doc is []."""
    t = doc.strip(" ")
    if t == "":
        return []
    return SEP_RE.split(t)


def _vocab_of(texts: list[str]) -> list[str]:
    terms = sorted({t for d in texts for t in _ref_seq(d)} - {""})
    terms.append("")  # empty_code slot, like the bigram caller
    return terms


def _arrays_of(texts: list[str]):
    """The Arrow shapes a kernel can legitimately receive. The
    kernels take 0x20-TRIMMED input (callers run pc.utf8_trim), so
    trim here; other separators survive and exercise lead/trail."""
    texts = [d.strip(" ") for d in texts]
    plain = pa.array(texts, pa.string())
    yield "utf8", plain
    yield "large_utf8", pa.array(texts, pa.large_string())
    padded = pa.array(["PAD seps\t\n", *texts, "\fPAD"], pa.string())
    yield "sliced", padded.slice(1, len(texts))
    if len(texts) >= 2:
        half = len(texts) // 2
        yield "chunked", pa.chunked_array(
            [pa.array(texts[:half]), pa.array(texts[half:])]
        )


def _check_token_sums(texts: list[str]) -> None:
    vocab = _vocab_of(texts)
    rng = np.random.default_rng(len(vocab))
    weights = rng.integers(1, 10**9, size=len(vocab), dtype=np.int64)
    wmap = dict(zip(vocab, weights))
    want_n = [sum(1 for t in _ref_seq(d) if t != "") for d in texts]
    want_s = [
        sum(int(wmap[t]) for t in _ref_seq(d) if t != "") for d in texts
    ]
    for label, arr in _arrays_of(texts):
        n_tok, s = tk.doc_token_sums(
            arr, pa.array(vocab, pa.string()), weights
        )
        assert n_tok.tolist() == want_n, label
        assert s.tolist() == want_s, label


def _check_bigram_keys(texts: list[str]) -> None:
    vocab = _vocab_of(texts)
    empty_code = vocab.index("")
    code = {t: i for i, t in enumerate(vocab)}
    v = len(vocab)
    want_keys, want_docs, want_m = [], [], []
    for di, d in enumerate(texts):
        seq = [code[t] for t in _ref_seq(d)]
        want_m.append(len(seq))
        for a, b in zip(seq, seq[1:]):
            want_keys.append(a * v + b)
            want_docs.append(di)
    for label, arr in _arrays_of(texts):
        keys, docs, m = tk.doc_bigram_keys(
            arr, pa.array(vocab, pa.string()), empty_code
        )
        assert m.tolist() == want_m, label
        assert keys.tolist() == want_keys, label
        assert docs.tolist() == want_docs, label


@settings(max_examples=150, deadline=None)
@given(texts_st)
def test_doc_token_sums_matches_reference(texts):
    _check_token_sums(texts)


@settings(max_examples=150, deadline=None)
@given(texts_st)
def test_doc_bigram_keys_matches_reference(texts):
    _check_bigram_keys(texts)


@settings(max_examples=60, deadline=None)
@given(texts_st)
def test_kernels_under_large_offset_switchover(texts):
    """Force tokens_string_array onto its large_utf8 branch (total
    token bytes 'over' int32) and re-check both kernels — the branch
    the 2 GiB production corner takes."""
    prev = tk._I32_MAX
    tk._I32_MAX = 0
    try:
        _check_token_sums(texts)
        _check_bigram_keys(texts)
    finally:
        tk._I32_MAX = prev


BPE_RE = re.compile("[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0b\f\r]")


def _check_counts(texts: list[str]) -> None:
    want_tok = [len(SEP_RE.split(d.strip(" "))) if d.strip(" ") else 0
                for d in texts]
    for label, arr in _arrays_of(texts):
        buf, offs = tk.flatten_utf8(
            arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        )
        assert tk.token_counts(buf, offs).tolist() == want_tok, label
    # bpe_counts runs over RAW (untrimmed) text
    raw = pa.array(texts, pa.string())
    buf, offs = tk.flatten_utf8(raw)
    assert tk.bpe_counts(buf, offs).tolist() == [
        len(BPE_RE.findall(d)) for d in texts
    ]


@settings(max_examples=150, deadline=None)
@given(texts_st)
def test_count_kernels_match_reference(texts):
    """token_counts / bpe_counts (r7 — the corpus_curation_pipeline
    kernels) vs the regex semantics of token_count/bpe_token_count:
    per-codepoint 'other' matches, ASCII letter runs, single digits,
    Java-\\s separators."""
    _check_counts(texts)


def test_count_kernels_spark_expression_parity(spark):
    """One Spark round-trip pinning the kernel twins against the REAL
    JVM expressions (token_count / regexp_count) — the regex engine of
    record, not just the Python re model."""
    from otrrentetl_spark.operators import text as otext

    texts = [
        "", "   ", "\tab  cd\n", "a1b2 ... #x", "für İT ıs €42",
        "hello,world!x", "...", "a" * 300, "日本語 text 123",
        "\x0b\fmixed\rseps\x0b", "UPPER lower MiXeD",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        otext.token_count("text").alias("n_tok"),
        otext.bpe_token_count("text").alias("n_bpe"),
    ).collect()
    trimmed = pa.array([t.strip(" ") for t in texts])
    buf_t, off_t = tk.flatten_utf8(trimmed)
    raw = pa.array(texts)
    buf_r, off_r = tk.flatten_utf8(raw)
    assert tk.token_counts(buf_t, off_t).tolist() == [
        r["n_tok"] for r in rows
    ]
    assert tk.bpe_counts(buf_r, off_r).tolist() == [
        r["n_bpe"] for r in rows
    ]


def test_edge_docs_exact():
    """Deterministic corners: empty doc, all-separator doc (['','']),
    lone separators, edge empties on both sides."""
    texts = ["", "   ", "\t", " a ", "a", "\x0b\x0ba\r", "..#..", "a b"]
    _check_token_sums(texts)
    _check_bigram_keys(texts)


def test_empty_corpus_shapes():
    for arr in (pa.array([], pa.string()), pa.array([], pa.large_string())):
        n_tok, s = tk.doc_token_sums(
            arr, pa.array([""], pa.string()), np.zeros(1, dtype=np.int64)
        )
        assert n_tok.tolist() == [] and s.tolist() == []
        keys, docs, m = tk.doc_bigram_keys(arr, pa.array([""]), 0)
        assert keys.tolist() == [] and m.tolist() == []


def test_vocabulary_miss_raises():
    arr = pa.array(["hello world"])
    with pytest.raises(ValueError, match="missing from vocabulary"):
        tk.doc_token_sums(
            arr, pa.array(["hello"]), np.zeros(1, dtype=np.int64)
        )
    with pytest.raises(ValueError, match="missing from vocabulary"):
        tk.doc_bigram_keys(arr, pa.array(["hello", ""]), 1)
