"""Byte-level vectorized text kernel: the Arrow/numpy engine behind
the per-token text operators (Gopher gate metrics, surprisal probes).

Motivation (r6, measured at the 5M-doc 1000x fixture): every prior
formulation of the per-token metrics paid per-token or per-doc
interpreter costs — the per-token Python loop 21.7 s, per-doc
C-regex findall 23 s, Arrow RE2 `count_substring_regex` 40 s, JVM
codegen `regexp_count` 45 s — against DuckDB's 7 s. This module
instead runs a handful of WHOLE-BUFFER numpy passes over the Arrow
string data (one flat uint8 view of every document in the batch plus
the offsets array), so the cost per byte is a vectorized mask/cumsum
op, not an interpreter step. mapInArrow transfer floor for the same
batch is ~1.9 s, so the kernel runs near the transport bound.

Semantics are BIT-IDENTICAL to the HOF expression faces (pinned by
parity tests):

- documents are space-trimmed (0x20 only — Spark `trim`/Python
  ``str.strip(" ")``), then tokenized on runs of the Java ``\\s``
  ASCII class [ \\t\\n\\x0b\\f\\r] — a "token" here is a maximal
  non-separator run; the split()-style leading/trailing empty
  strings contribute to the token COUNT (runs+1) but are empty, so
  length/alpha/stopword metrics see only the maximal runs;
- total length counts CHARACTERS: non-separator bytes that are not
  UTF-8 continuation bytes (0b10xxxxxx);
- stopword matching is token == word after ASCII case folding
  (byte | 0x20 on the token, compared to the lowercase word) — for
  non-ASCII tokens the byte-length comparison already fails, which
  matches ``tk.lower() in stop`` (no single non-ASCII codepoint
  lowers into the stopword alphabet; U+0130 lowers to TWO
  codepoints and fails equality in both faces);
- '...' occurrences count non-overlapping left-to-right, i.e. each
  maximal run of k dots contributes k // 3 (``str.count``).

All functions take (buf, offsets) — the flattened corpus view — and
return per-doc or per-token numpy arrays. Empty documents are safe
everywhere (cumsum-diff segment sums, never reduceat).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# the Java \s ASCII class (Spark's split / trim semantics)
SEPS = np.frombuffer(b" \t\n\x0b\f\r", dtype=np.uint8)

# utf8 → large_utf8 switchover for materialized token arrays (module
# constant so the parity tests can lower it and exercise the
# large-offsets branch without allocating 2 GiB)
_I32_MAX = np.iinfo(np.int32).max


def flatten_utf8(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(buf, offsets) view of a non-null pyarrow string array: buf is
    the concatenated UTF-8 bytes, offsets has len(arr)+1 entries with
    doc i occupying buf[offsets[i]:offsets[i+1]]. Handles sliced
    arrays (non-zero arr.offset) and normalizes offsets to start at 0."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else (
        np.zeros(0, dtype=np.uint8)
    )
    buf = data[offsets[0] : offsets[-1]]
    return buf, offsets - offsets[0]


def _seg_sum(mask_cumsum: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-doc segment sums from an inclusive-style cumsum array with
    a leading 0 (length = len(buf)+1). Safe for empty docs."""
    return mask_cumsum[offsets[1:]] - mask_cumsum[offsets[:-1]]


def _cs(mask: np.ndarray) -> np.ndarray:
    out = np.zeros(len(mask) + 1, dtype=np.int64)
    np.cumsum(mask, out=out[1:])
    return out


def doc_metrics(buf: np.ndarray, offsets: np.ndarray):
    """Gopher gate metrics per doc over SPACE-TRIMMED documents:
    (n tokens incl. split empties, l total chars, a alpha tokens,
    st stopword tokens). Returns int64 arrays."""
    n_docs = len(offsets) - 1
    if len(buf) == 0:
        z = np.zeros(n_docs, dtype=np.int64)
        return z, z.copy(), z.copy(), z.copy()
    sep = np.isin(buf, SEPS)
    nonsep = ~sep
    # doc-start flags to break runs at document boundaries
    doc_start = np.zeros(len(buf) + 1, dtype=bool)
    doc_start[offsets[:-1][offsets[:-1] < len(buf)]] = True
    prev_sep = np.empty(len(buf), dtype=bool)
    prev_sep[0] = False
    prev_sep[1:] = sep[:-1]
    prev_nonsep = np.empty(len(buf), dtype=bool)
    prev_nonsep[0] = False
    prev_nonsep[1:] = nonsep[:-1]
    at_start = doc_start[: len(buf)]
    # separator-run starts (within docs)
    sep_run_start = sep & (at_start | ~prev_sep)
    # token starts / ends (maximal non-separator runs within docs)
    tok_start = nonsep & (at_start | ~prev_nonsep)
    next_sep = np.empty(len(buf), dtype=bool)
    next_sep[-1] = True
    next_sep[:-1] = sep[1:] | doc_start[1:len(buf)]
    tok_end = nonsep & next_sep
    # n = sep runs + 1 (non-empty docs; caller zeroes empties)
    n = _seg_sum(_cs(sep_run_start), offsets) + 1
    n[offsets[1:] == offsets[:-1]] = 0
    # l = non-sep, non-continuation bytes (== characters)
    is_char = nonsep & ((buf & 0xC0) != 0x80)
    l = _seg_sum(_cs(is_char), offsets)
    # per-token any-letter
    letter = ((buf >= 65) & (buf <= 90)) | ((buf >= 97) & (buf <= 122))
    starts_idx = np.flatnonzero(tok_start)
    ends_idx = np.flatnonzero(tok_end)
    lcs = _cs(letter)
    has_letter = (lcs[ends_idx + 1] - lcs[starts_idx]) > 0
    doc_of_tok = np.searchsorted(offsets, starts_idx, side="right") - 1
    a = np.bincount(
        doc_of_tok[has_letter], minlength=n_docs
    ).astype(np.int64)
    # stopword tokens: byte-length match then case-folded compare
    tok_len = ends_idx - starts_idx + 1
    lowered = np.bitwise_or(buf, 0x20)
    st_counts = np.zeros(n_docs, dtype=np.int64)
    from otrrentetl_spark.operators.text import STOPWORDS

    words = [w.encode() for w in STOPWORDS["en"]]
    by_len: dict[int, list[bytes]] = {}
    for w in words:
        by_len.setdefault(len(w), []).append(w)
    for ln, ws in by_len.items():
        cand = np.flatnonzero(tok_len == ln)
        if len(cand) == 0:
            continue
        # (k, ln) byte matrix of candidate tokens, case-folded
        gather = starts_idx[cand][:, None] + np.arange(ln)[None, :]
        mat = lowered[gather]
        match = np.zeros(len(cand), dtype=bool)
        for w in ws:
            target = np.frombuffer(w, dtype=np.uint8)
            match |= (mat == target[None, :]).all(axis=1)
        if match.any():
            st_counts += np.bincount(
                doc_of_tok[cand[match]], minlength=n_docs
            ).astype(np.int64)
    return n, l, a, st_counts


def token_counts(buf: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-doc split()-style token count over SPACE-TRIMMED docs —
    doc_metrics' ``n`` (separator runs + 1, split-empties counted,
    empty doc → 0) without the per-token letter/stopword passes.
    Twin of operators.text.token_count (size(split(trim(c), '\\s+')))."""
    n_docs = len(offsets) - 1
    if len(buf) == 0:
        return np.zeros(n_docs, dtype=np.int64)
    sep = np.isin(buf, SEPS)
    doc_start = np.zeros(len(buf), dtype=bool)
    doc_start[offsets[:-1][offsets[:-1] < len(buf)]] = True
    prev_sep = np.empty(len(buf), dtype=bool)
    prev_sep[0] = False
    prev_sep[1:] = sep[:-1]
    sep_run_start = sep & (doc_start | ~prev_sep)
    n = _seg_sum(_cs(sep_run_start), offsets) + 1
    n[offsets[1:] == offsets[:-1]] = 0
    return n


def bpe_counts(buf: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-doc BPE-ish lexer token count over RAW (untrimmed) docs —
    twin of operators.text.bpe_token_count, i.e.
    regexp_count(c, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'):
    maximal ASCII-letter runs count once, each ASCII digit counts
    once, and every OTHER non-separator CODEPOINT (multi-byte
    included — the regex matches per codepoint, so continuation
    bytes are excluded) counts once. Pure mask/cumsum passes — no
    token-string materialization, unlike regexp_extract_all."""
    n_docs = len(offsets) - 1
    if len(buf) == 0:
        return np.zeros(n_docs, dtype=np.int64)
    folded = buf | 0x20
    letter = (folded >= 0x61) & (folded <= 0x7A)
    digit = (buf >= 0x30) & (buf <= 0x39)
    sep = np.isin(buf, SEPS)
    cont = (buf & 0xC0) == 0x80
    other = ~letter & ~digit & ~sep & ~cont
    doc_start = np.zeros(len(buf), dtype=bool)
    doc_start[offsets[:-1][offsets[:-1] < len(buf)]] = True
    prev_letter = np.empty(len(buf), dtype=bool)
    prev_letter[0] = False
    prev_letter[1:] = letter[:-1]
    letter_run_start = letter & (doc_start | ~prev_letter)
    hits = letter_run_start | digit | other
    return _seg_sum(_cs(hits), offsets)


def symbol_counts(buf: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-doc '#' count + non-overlapping '...' count (str.count
    semantics: each maximal dot run of length k contributes k // 3)."""
    n_docs = len(offsets) - 1
    if len(buf) == 0:
        return np.zeros(n_docs, dtype=np.int64)
    hashes = _seg_sum(_cs(buf == 0x23), offsets)
    dot = buf == 0x2E
    doc_start = np.zeros(len(buf), dtype=bool)
    doc_start[offsets[:-1][offsets[:-1] < len(buf)]] = True
    prev_dot = np.empty(len(buf), dtype=bool)
    prev_dot[0] = False
    prev_dot[1:] = dot[:-1]
    run_start = dot & (doc_start | ~prev_dot)
    starts_idx = np.flatnonzero(run_start)
    if len(starts_idx) == 0:
        return hashes
    next_nondot = np.empty(len(buf), dtype=bool)
    next_nondot[-1] = True
    next_nondot[:-1] = (~dot[1:]) | doc_start[1:]
    run_end = dot & next_nondot
    ends_idx = np.flatnonzero(run_end)
    run_len = ends_idx - starts_idx + 1
    trip = run_len // 3
    doc_of_run = np.searchsorted(offsets, starts_idx, side="right") - 1
    return hashes + np.bincount(
        doc_of_run, weights=trip, minlength=n_docs
    ).astype(np.int64)


def token_table(buf: np.ndarray, offsets: np.ndarray):
    """(starts, lens, doc_idx) of every NON-EMPTY token (maximal
    non-separator run) — the probe-side view: `term != ''` filtered
    tokenization, exactly the explode+filter the expression faces
    run. int64/int64/int64 numpy arrays."""
    n_docs = len(offsets) - 1  # noqa: F841 — doc count for callers
    if len(buf) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    sep = np.isin(buf, SEPS)
    nonsep = ~sep
    doc_start = np.zeros(len(buf) + 1, dtype=bool)
    doc_start[offsets[:-1][offsets[:-1] < len(buf)]] = True
    prev_nonsep = np.empty(len(buf), dtype=bool)
    prev_nonsep[0] = False
    prev_nonsep[1:] = nonsep[:-1]
    tok_start = nonsep & (doc_start[: len(buf)] | ~prev_nonsep)
    next_sep = np.empty(len(buf), dtype=bool)
    next_sep[-1] = True
    next_sep[:-1] = sep[1:] | doc_start[1:len(buf)]
    tok_end = nonsep & next_sep
    starts_idx = np.flatnonzero(tok_start).astype(np.int64)
    ends_idx = np.flatnonzero(tok_end).astype(np.int64)
    lens = ends_idx - starts_idx + 1
    doc_of_tok = (
        np.searchsorted(offsets, starts_idx, side="right") - 1
    ).astype(np.int64)
    return starts_idx, lens, doc_of_tok


def tokens_string_array(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> pa.Array:
    """Materialize the token table as a pyarrow StringArray (one
    vectorized gather — no per-token Python) so Arrow's C hash
    kernels (index_in / value_counts) can consume it."""
    total = int(lens.sum())
    out_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    if total > 0:
        # output position -> input position map, one fancy gather
        idx = np.arange(total, dtype=np.int64) + np.repeat(
            starts - out_off[:-1], lens
        )
        data = buf[idx]
    else:
        data = np.zeros(0, dtype=np.uint8)
    if out_off[-1] <= _I32_MAX:
        return pa.Array.from_buffers(
            pa.utf8(),
            len(lens),
            [None, pa.py_buffer(out_off.astype(np.int32)), pa.py_buffer(data)],
        )
    return pa.Array.from_buffers(
        pa.large_utf8(),
        len(lens),
        [None, pa.py_buffer(out_off), pa.py_buffer(data)],
    )


def doc_token_sums(
    trimmed: pa.Array,
    vocab: pa.Array,
    weights: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (n_tok, weighted sum) over NON-EMPTY tokens, where each
    token's weight is ``weights[index of token in vocab]`` — the
    vectorized probe behind the surprisal kernels: tokenize once
    (byte masks), look every token up in Arrow's C hash table
    (index_in), and reduce per doc with exact int64 cumsums (tokens
    arrive in document order, so per-doc sums are two cumsum reads;
    no float accumulation anywhere).

    Raises if any token is missing from ``vocab`` — the callers build
    the vocabulary from the SAME corpus, so a miss means the model and
    probe diverged (fail loudly, never return silently wrong sums)."""
    import pyarrow.compute as pc

    n_docs = len(trimmed)
    buf, offs = flatten_utf8(trimmed)
    starts, lens, doc_of_tok = token_table(buf, offs)
    n_tok = np.bincount(doc_of_tok, minlength=n_docs).astype(np.int64)
    if len(starts) == 0:
        return n_tok, np.zeros(n_docs, dtype=np.int64)
    toks = tokens_string_array(buf, starts, lens)
    codes = pc.index_in(toks, value_set=vocab)
    if codes.null_count:
        raise ValueError(
            "probe token missing from vocabulary — model/probe drift"
        )
    codes_np = codes.to_numpy(zero_copy_only=False).astype(np.int64)
    w = weights[codes_np]
    cs = np.zeros(len(w) + 1, dtype=np.int64)
    np.cumsum(w, out=cs[1:])
    bounds = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_tok, out=bounds[1:])
    s = cs[bounds[1:]] - cs[bounds[:-1]]
    return n_tok, s


def doc_bigram_keys(
    trimmed: pa.Array, vocab: pa.Array, empty_code: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-batch bigram PAIR KEYS (left_code * |vocab| + right_code)
    and their doc index, plus the per-doc sequence length m — the
    probe-side view of the bigram model whose token sequence follows
    split() semantics EXACTLY: a leading empty token when the trimmed
    doc starts with a separator, a trailing one when it ends with one
    (interior separator runs collapse, so those are the only
    empties), and an all-separator doc is ['',''].

    The caller supplies the vocabulary (which must contain '' at
    ``empty_code`` when any doc has edge empties, and every corpus
    token — a miss raises). Pairs are emitted in document order, so
    per-doc reductions are exact int64 cumsum reads."""
    import pyarrow.compute as pc

    n_docs = len(trimmed)
    buf, offs = flatten_utf8(trimmed)
    starts, lens, doc_of_tok = token_table(buf, offs)
    n_tok = np.bincount(doc_of_tok, minlength=n_docs).astype(np.int64)
    doc_len = offs[1:] - offs[:-1]
    nonempty = doc_len > 0
    lead = np.zeros(n_docs, dtype=bool)
    trail = np.zeros(n_docs, dtype=bool)
    if nonempty.any():
        lead[nonempty] = np.isin(buf[offs[:-1][nonempty]], SEPS)
        trail[nonempty] = np.isin(buf[offs[1:][nonempty] - 1], SEPS)
    m = n_tok + lead + trail
    total = int(m.sum())
    if total < 2:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), m
    if len(starts) > 0:
        toks = tokens_string_array(buf, starts, lens)
        codes_pa = pc.index_in(toks, value_set=vocab)
        if codes_pa.null_count:
            raise ValueError(
                "probe token missing from vocabulary — model/probe drift"
            )
        codes = codes_pa.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        codes = np.zeros(0, dtype=np.int64)
    bounds = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(m, out=bounds[1:])
    seq = np.full(total, empty_code, dtype=np.int64)
    if len(codes) > 0:
        tok_prefix = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(n_tok, out=tok_prefix[1:])
        idx = (
            np.arange(len(codes), dtype=np.int64)
            - np.repeat(tok_prefix[:-1], n_tok)
            + np.repeat(bounds[:-1] + lead, n_tok)
        )
        seq[idx] = codes
    seq_doc = np.repeat(np.arange(n_docs, dtype=np.int64), m)
    same = seq_doc[:-1] == seq_doc[1:]
    v = np.int64(len(vocab))
    keys = seq[:-1][same] * v + seq[1:][same]
    return keys, seq_doc[:-1][same], m
