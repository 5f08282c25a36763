"""Arrow-batch shingle/fingerprint kernels (guide §4.2: hand whole batches to
vectorized native code instead of per-element JVM expression evaluation).

Each kernel consumes (doc_id, t) batches where ``t`` is the ALREADY-LOWERED
text — lowering stays in Catalyst so case semantics never leave the JVM — and
reproduces, bit for bit, the values the previous pure-Catalyst formulations
computed (the same MD5-derived hashes via kernels.md5np, the same integer
arithmetic). The fast path slices shingles directly out of the Arrow byte
buffer, which is valid only when one byte == one character (pure ASCII); rows
containing any non-ASCII byte take a per-row Python fallback with identical
semantics (str slicing/split by code points == Spark substr/split, and
hashlib MD5 over the UTF-8 bytes == Catalyst md5).

Shared conventions (mirroring the Catalyst originals):
  * char-5-gram starts: substr(i,5) for i in 1..greatest(len-4, 1) — docs
    shorter than 5 chars yield ONE shingle (the whole text, possibly empty).
  * word tokens: split on the literal single space, empties preserved — so
    the byte span between two token starts is exactly the joined n-gram.
  * hash value: first 32 bits of md5 as a non-negative int64, the engine-wide
    conv(substr(md5(x),1,8),16,10) convention.
"""

from __future__ import annotations

import numpy as np

from .md5np import md5_first32_long, md5_first32_var

_MH_P = (1 << 61) - 1


def _string_parts(arr):
    """(byte buffer, per-row offsets int64) of an Arrow string/large_string
    array — accounting for array offset/slicing."""
    import pyarrow as pa

    if arr.null_count:
        raise ValueError("shingle kernels expect non-null text")
    if pa.types.is_large_string(arr.type):
        odt = np.int64
    elif pa.types.is_string(arr.type):
        odt = np.int32
    else:
        raise ValueError(f"unexpected type {arr.type}")
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else \
        np.zeros(0, dtype=np.uint8)
    return buf, offs


def _ascii_rows(buf: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Bool per row: every byte < 0x80 (fast path eligible)."""
    if len(buf) == 0:
        return np.ones(len(offs) - 1, dtype=bool)
    hi = np.concatenate(([0], np.cumsum((buf >= 0x80).astype(np.int64))))
    return (hi[offs[1:]] - hi[offs[:-1]]) == 0


def _shingle5_spans(offs: np.ndarray, rows: np.ndarray):
    """Per selected row: char-5-gram byte spans. Returns (starts, lens,
    counts) where counts[j] is row j's shingle count (>=1)."""
    o = offs[rows]
    ln = offs[rows + 1] - o
    counts = np.where(ln >= 5, ln - 4, 1)
    total = int(counts.sum())
    seg0 = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(counts, out=seg0[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(seg0[:-1], counts)
    starts = np.repeat(o, counts) + within
    lens = np.minimum(np.repeat(ln, counts) - within, 5)
    return starts, lens, counts


def _hash5_ascii(buf, offs, rows):
    """All char-5-gram hashes for the given ASCII rows, row-major, plus the
    per-row counts."""
    starts, lens, counts = _shingle5_spans(offs, rows)
    return md5_first32_var(buf, starts, lens), counts


def _hash5_fallback(text: str) -> np.ndarray:
    n = max(len(text) - 4, 1)
    return np.fromiter(
        (md5_first32_long(text[i : i + 5].encode("utf-8")) for i in range(n)),
        dtype=np.int64,
        count=n,
    )


def _per_row_hash5(batch_t):
    """list of per-row int64 hash arrays (ASCII vectorized, fallback exact)."""
    buf, offs = _string_parts(batch_t)
    n = len(offs) - 1
    ascii_ok = _ascii_rows(buf, offs)
    out: list = [None] * n
    rows = np.nonzero(ascii_ok)[0]
    if rows.size:
        h, counts = _hash5_ascii(buf, offs, rows)
        bounds = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(counts, out=bounds[1:])
        for j, r in enumerate(rows):
            out[r] = h[bounds[j] : bounds[j + 1]]
    for r in np.nonzero(~ascii_ok)[0]:
        out[r] = _hash5_fallback(batch_t[r].as_py())
    return out


def _token_bounds(buf: np.ndarray, o: int, ln: int):
    """Token start/end byte positions (relative) for one row under
    split-on-single-space-keeping-empties semantics."""
    sp = np.nonzero(buf[o : o + ln] == 0x20)[0]
    starts = np.concatenate(([0], sp + 1))
    ends = np.concatenate((sp, [ln]))
    return starts, ends


def minhash_batches(coeffs):
    """mapInArrow factory: (doc_id, t) -> (doc_id, h0..h7) minhash signatures.
    coeffs: list of (a, b) affine permutation coefficients."""
    import pyarrow as pa

    k = len(coeffs)

    def fn(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            hs = _per_row_hash5(batch.column(1))
            counts = np.fromiter((len(h) for h in hs), dtype=np.int64, count=len(hs))
            big = np.concatenate(hs).astype(np.uint64)
            seg = np.zeros(len(hs), dtype=np.int64)
            np.cumsum(counts[:-1], out=seg[1:])
            cols = [batch.column(0)]
            for a, b in coeffs:
                v = (np.uint64(a) * big + np.uint64(b)) % np.uint64(_MH_P)
                mins = np.minimum.reduceat(v, seg).astype(np.int64)
                cols.append(pa.array(mins, type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                cols, names=["doc_id"] + [f"h{i}" for i in range(k)]
            )

    return fn


def _window_mins(a: np.ndarray, w: int) -> np.ndarray:
    """Sorted-distinct sliding-window-of-w mins, O(n) via block prefix/suffix
    mins (the vectorized monotonic-deque equivalent)."""
    m = len(a)
    if m <= w:
        return np.array([a.min()]) if m else np.array([], dtype=np.int64)
    nb = -(-m // w)
    pad = np.full(nb * w, np.iinfo(np.int64).max, dtype=np.int64)
    pad[:m] = a
    blocks = pad.reshape(nb, w)
    lmin = np.minimum.accumulate(blocks, axis=1).ravel()
    rmin = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
    kk = m - w + 1
    return np.unique(np.minimum(rmin[:kk], lmin[w - 1 : w - 1 + kk]))


def winnow_batches(w: int):
    """mapInArrow factory: (doc_id, t) -> (doc_id, fp array<long>) winnowing
    fingerprints (min 5-gram hash per sliding window of w, sorted-distinct)."""
    import pyarrow as pa

    def fn(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            hs = _per_row_hash5(batch.column(1))
            fps = [_window_mins(np.asarray(h, dtype=np.int64), w) for h in hs]
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(fps, type=pa.list_(pa.int64()))],
                names=["doc_id", "fp"],
            )

    return fn


def modp_batches(mod: int):
    """mapInArrow factory: (doc_id, t) -> (doc_id, fp array<long>) — the
    sorted-distinct 5-gram hashes that are 0 mod ``mod``."""
    import pyarrow as pa

    def fn(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            hs = _per_row_hash5(batch.column(1))
            fps = [np.unique(h[h % mod == 0]) for h in hs]
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(fps, type=pa.list_(pa.int64()))],
                names=["doc_id", "fp"],
            )

    return fn


def _ngram_spans_ascii(buf, offs, rows, gram: int):
    """Word-n-gram byte spans for ASCII rows (joined with the original single
    spaces): per row max(n_tok - gram + 1, 1) grams; rows-major flat arrays
    plus per-row counts."""
    starts_all, lens_all, counts = [], [], np.empty(len(rows), dtype=np.int64)
    for j, r in enumerate(rows):
        o = offs[r]
        ln = offs[r + 1] - o
        ts, te = _token_bounds(buf, o, ln)
        ntok = len(ts)
        g = max(ntok - gram + 1, 1)
        idx = np.arange(g, dtype=np.int64)
        st = ts[idx]
        en = te[np.minimum(idx + gram - 1, ntok - 1)]
        starts_all.append(st + o)
        lens_all.append(en - st)
        counts[j] = g
    if starts_all:
        return np.concatenate(starts_all), np.concatenate(lens_all), counts
    return np.zeros(0, np.int64), np.zeros(0, np.int64), counts


def _hash_spans(buf, starts, lens):
    """md5-first32 for byte spans of any length (vectorized <=119, exact
    fallback beyond)."""
    out = np.empty(len(starts), dtype=np.int64)
    short = lens <= 119
    si = np.nonzero(short)[0]
    out[si] = md5_first32_var(buf, starts[si], lens[si])
    for i in np.nonzero(~short)[0]:
        out[i] = md5_first32_long(buf[starts[i] : starts[i] + lens[i]].tobytes())
    return out


def _ngram_hashes_fallback(text: str, gram: int) -> np.ndarray:
    toks = text.split(" ")
    g = max(len(toks) - gram + 1, 1)
    return np.fromiter(
        (
            md5_first32_long(" ".join(toks[i : i + gram]).encode("utf-8"))
            for i in range(g)
        ),
        dtype=np.int64,
        count=g,
    )


def _per_row_ngram_hashes(batch_t, gram: int):
    """list of per-row int64 hash arrays of word-n-grams (row order kept)."""
    buf, offs = _string_parts(batch_t)
    n = len(offs) - 1
    ascii_ok = _ascii_rows(buf, offs)
    out: list = [None] * n
    rows = np.nonzero(ascii_ok)[0]
    if rows.size:
        starts, lens, counts = _ngram_spans_ascii(buf, offs, rows, gram)
        h = _hash_spans(buf, starts, lens)
        bounds = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(counts, out=bounds[1:])
        for j, r in enumerate(rows):
            out[r] = h[bounds[j] : bounds[j + 1]]
    for r in np.nonzero(~ascii_ok)[0]:
        out[r] = _ngram_hashes_fallback(batch_t[r].as_py(), gram)
    return out


def dsir_count_batches(buckets: int, lo: int, hi: int):
    """mapInArrow factory: (doc_id, t) -> (doc_id, is_target, h, cnt) —
    per-(doc, bigram-hash-bucket) counts. is_target = token count in
    [lo, hi]. Docs with fewer than 2 tokens emit nothing (the Catalyst
    formulation's NULL-bigram filter + explode)."""
    import pyarrow as pa

    def fn(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            hs = _per_row_ngram_hashes(batch.column(1), 2)
            doc_ids = batch.column(0).to_numpy(zero_copy_only=False)
            # token count per row = bigram count + 1 (single-token rows
            # produced one "gram" = the whole text; drop them below)
            buf, offs = _string_parts(batch.column(1))
            sp = _ascii_spaces(buf, offs)
            out_doc, out_tgt, out_h, out_cnt = [], [], [], []
            for r, h in enumerate(hs):
                ntok = sp[r] + 1
                if ntok < 2:
                    continue
                bh = h % buckets
                uh, cnt = np.unique(bh, return_counts=True)
                out_doc.append(np.full(len(uh), doc_ids[r], dtype=np.int64))
                out_tgt.append(
                    np.full(len(uh), lo <= ntok <= hi, dtype=np.bool_)
                )
                out_h.append(uh)
                out_cnt.append(cnt.astype(np.int64))
            if not out_doc:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_doc), type=pa.int64()),
                    pa.array(np.concatenate(out_tgt), type=pa.bool_()),
                    pa.array(np.concatenate(out_h), type=pa.int64()),
                    pa.array(np.concatenate(out_cnt), type=pa.int64()),
                ],
                names=["doc_id", "is_target", "h", "cnt"],
            )

    return fn


def _ascii_spaces(buf: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Space count per row (token count - 1 under single-space split) — valid
    for ASCII and non-ASCII rows alike (0x20 never appears inside a UTF-8
    multibyte sequence)."""
    if len(buf) == 0:
        return np.zeros(len(offs) - 1, dtype=np.int64)
    c = np.concatenate(([0], np.cumsum((buf == 0x20).astype(np.int64))))
    return c[offs[1:]] - c[offs[:-1]]


def substring_fp_batches(gram: int, mod: int):
    """mapInArrow factory: (doc_id, t) -> (doc_id, h) — the DISTINCT sampled
    (h % mod == 0) word-``gram``-gram fingerprints, one row per (doc, h)."""
    import pyarrow as pa

    def fn(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            hs = _per_row_ngram_hashes(batch.column(1), gram)
            doc_ids = batch.column(0).to_numpy(zero_copy_only=False)
            out_doc, out_h = [], []
            for r, h in enumerate(hs):
                uh = np.unique(h[h % mod == 0])
                if len(uh):
                    out_doc.append(np.full(len(uh), doc_ids[r], dtype=np.int64))
                    out_h.append(uh)
            if not out_doc:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_doc), type=pa.int64()),
                    pa.array(np.concatenate(out_h), type=pa.int64()),
                ],
                names=["doc_id", "h"],
            )

    return fn
