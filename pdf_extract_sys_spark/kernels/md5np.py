"""Vectorized MD5 (RFC 1321) over numpy arrays — batch hashing for the
shingle/fingerprint kernels.

Why this exists (optimization guide §4.2): the dedup/fingerprint family hashes
every char-5-gram / word-n-gram of the corpus. One Catalyst ``md5(substr(...))``
call per shingle allocates a shingle string, a 32-char hex string, a substring
and a base-16 parse — ~3 µs/shingle of JVM object churn. Hashing a whole Arrow
batch of shingles through one vectorized 64-round MD5 loop runs the same math
at ~0.2-0.4 µs/shingle, and the value is BIT-IDENTICAL: this is the same MD5,
not an approximation, so oracle hashes cannot drift.

Scope: messages up to 119 bytes (1 or 2 blocks — every 5-gram and almost every
word-n-gram). Longer messages must go through the caller's hashlib fallback
(`md5_first32_long`). Only the first 32 bits of the digest are returned,
matching the engine-wide ``conv(substr(md5(x),1,8),16,10)`` convention.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

_K = np.array(
    [int(abs(math.sin(i + 1.0)) * 4294967296.0) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_S = (
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4
)
# per-round message word index
_G = (
    list(range(16))
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)]
)

_INIT = (
    np.uint32(0x67452301),
    np.uint32(0xEFCDAB89),
    np.uint32(0x98BADCFE),
    np.uint32(0x10325476),
)


def _compress(state, words):
    """One MD5 compression round over vectorized words.

    state: 4-tuple of uint32 scalars/arrays; words: list of 16 uint32 arrays
    (each length n). Returns the new 4-tuple (elementwise chaining)."""
    A, B, C, D = state
    a, b, c, d = A, B, C, D
    for i in range(64):  # uint32 wrap-around is the intended MD5 arithmetic
        if i < 16:
            f = (b & c) | (~b & d)
        elif i < 32:
            f = (d & b) | (~d & c)
        elif i < 48:
            f = b ^ c ^ d
        else:
            f = c ^ (b | ~d)
        tmp = a + f + _K[i] + words[_G[i]]
        a, d, c = d, c, b
        s = _S[i]
        b = b + ((tmp << np.uint32(s)) | (tmp >> np.uint32(32 - s)))
    return (A + a, B + b, C + c, D + d)


def md5_first32_var(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """First 32 digest bits (as the non-negative int64 the engine's
    conv(substr(md5,1,8),16,10) yields) for n messages given as byte slices
    ``buf[starts[i] : starts[i]+lens[i]]`` of one uint8 buffer.

    Handles lengths 0..119 (1-2 MD5 blocks). Raises for longer messages —
    route those through :func:`md5_first32_long`."""
    n = len(starts)
    out = np.empty(n, dtype=np.uint32)
    if n == 0:
        return out.astype(np.int64)
    if int(lens.max(initial=0)) > 119:
        raise ValueError("md5_first32_var handles <=119-byte messages")
    starts = starts.astype(np.int64, copy=False)
    lens = lens.astype(np.int64, copy=False)
    one = lens <= 55
    for mask, nblocks in ((one, 1), (~one, 2)):
        idxs = np.nonzero(mask)[0]
        if idxs.size == 0:
            continue
        st, ln = starts[idxs], lens[idxs]
        total = 64 * nblocks
        pos = np.arange(total, dtype=np.int64)
        gather = np.minimum(st[:, None] + pos[None, :], len(buf) - 1 if len(buf) else 0)
        valid = pos[None, :] < ln[:, None]
        if len(buf):
            m = np.where(valid, buf[gather], 0).astype(np.uint8)
        else:
            m = np.zeros((idxs.size, total), dtype=np.uint8)
        m[np.arange(idxs.size), ln] = 0x80
        words = np.ascontiguousarray(m).view("<u4")
        words[:, nblocks * 16 - 2] = (ln * 8).astype(np.uint32)
        state = _INIT
        with np.errstate(over="ignore"):  # modular uint32 arithmetic by design
            for blk in range(nblocks):
                w = [words[:, blk * 16 + j] for j in range(16)]
                state = _compress(state, w)
        out[idxs] = state[0].byteswap()
    return out.astype(np.int64)


def md5_first32_long(data: bytes) -> int:
    """Scalar fallback for messages the vectorized path rejects."""
    return int(hashlib.md5(data).hexdigest()[:8], 16)


def md5_first32_concat(chunks: "list[bytes]") -> np.ndarray:
    """Convenience: hash a python list of byte strings (any lengths).
    Vectorizes the <=119-byte ones, falls back per element beyond."""
    lens = np.fromiter((len(c) for c in chunks), dtype=np.int64, count=len(chunks))
    buf = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    starts = np.zeros(len(chunks), dtype=np.int64)
    if len(chunks):
        np.cumsum(lens[:-1], out=starts[1:])
    short = lens <= 119
    out = np.empty(len(chunks), dtype=np.int64)
    si = np.nonzero(short)[0]
    out[si] = md5_first32_var(buf, starts[si], lens[si])
    for i in np.nonzero(~short)[0]:
        out[i] = md5_first32_long(chunks[i])
    return out
