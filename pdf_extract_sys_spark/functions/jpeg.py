"""Baseline JPEG codec in pure numpy — no codec libraries.

Implements ITU-T T.81 (the public JPEG spec) baseline sequential DCT with
Huffman entropy coding: segment parsing (DQT/DHT/SOF0/SOF1/DRI/SOS, multiple
tables per segment), canonical Huffman decode (spec F.2.2), byte-destuffing
and restart markers, dequantize → dezigzag → vectorized 8x8 IDCT (one einsum
over all blocks of a component), chroma upsampling for the standard integer
sampling factors, and JFIF YCbCr→RGB. Progressive (SOF2), arithmetic coding,
12-bit precision, and 4-component (CMYK) scans are out of scope and return
None — the caller degrades to the deterministic stand-in feature.

The matching encoder exists so fixtures and registry queries can synthesize
REAL JPEG bytes deterministically (same precedent as the PDF serializer in
queries.py): flat-quant tables, per-image fixed-length Huffman tables (the
all-ones codeword is provably unused, as T.81 requires), optional 2x2 chroma
subsampling and restart intervals.

Why per-blob Python is acceptable here: entropy decoding is inherently
sequential per blob; this runs only inside the declared Arrow-batched binary
boundary (mapInPandas featureizer), never in a row-wise Spark UDF. The
reference delegates raster work to its OCR stack (main.py:570-632); this
module makes the most common embedded-image codec decodable without it.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Malformed or out-of-scope JPEG data."""


# zigzag scan: stream position -> block index (generated, T.81 figure A.6)
def _zigzag() -> list[int]:
    out = []
    for s in range(15):
        rng = range(s, -1, -1) if s % 2 == 0 else range(0, s + 1)
        for i in rng:
            j = s - i
            if i < 8 and j < 8:
                out.append(i * 8 + j)
    return out


_ZZ = np.array(_zigzag(), dtype=np.int64)

# orthonormal DCT-II basis: forward F = C @ f @ C.T, inverse f = C.T @ F @ C
_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) spatial samples."""
    return np.einsum("ij,njk,kl->nil", _C.T, blocks, _C)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,njk,kl->nil", _C, blocks, _C.T)


# ---------------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------------


def _build_decode_table(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman (T.81 C.2): {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise JpegError("DHT: count/value mismatch")
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    __slots__ = ("d", "pos", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.n = len(data) * 8

    def bit(self) -> int:
        p = self.pos
        if p >= self.n:
            raise JpegError("entropy data exhausted")
        self.pos = p + 1
        return (self.d[p >> 3] >> (7 - (p & 7))) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map t received magnitude bits to the signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# ---------------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------------


def decode_baseline_jpeg(b: bytes) -> np.ndarray | None:
    """JPEG bytes → uint8 array (H, W) grayscale or (H, W, 3) RGB;
    None for non-JPEG, truncated, or out-of-scope (progressive/arithmetic/
    CMYK/12-bit) data — never an exception, never garbage pixels."""
    try:
        return _decode(b)
    except (JpegError, ValueError, IndexError, KeyError, struct.error, MemoryError):
        return None


def _decode(b: bytes) -> np.ndarray | None:
    if not b.startswith(b"\xff\xd8"):
        return None
    qtabs: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (H, W, [(cid, hs, vs, tq)])
    dri = 0
    i = 2
    scan = None
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise JpegError("marker expected")
        m = b[i + 1]
        if m == 0xD9:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack_from(">H", b, i + 2)[0]
        seg = b[i + 4 : i + 2 + seglen]
        if m == 0xDB:  # DQT — possibly several tables per segment
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq == 0:
                    qtabs[tq] = np.frombuffer(seg[j : j + 64], np.uint8).astype(
                        np.float64
                    )
                    j += 64
                elif pq == 1:
                    qtabs[tq] = np.frombuffer(
                        seg[j : j + 128], ">u2"
                    ).astype(np.float64)
                    j += 128
                else:
                    raise JpegError("DQT precision")
                if len(qtabs[tq]) != 64:
                    raise JpegError("short DQT")
        elif m == 0xC4:  # DHT — possibly several tables per segment
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = seg[j + 1 : j + 17]
                n = sum(bits)
                vals = seg[j + 17 : j + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, vals
                )
                j += 17 + n
        elif m in (0xC0, 0xC1):  # baseline / extended sequential Huffman
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8 or not (1 <= nc <= 3) or h == 0 or w == 0:
                return None  # 12-bit or CMYK: out of scope
            if h * w > 16_000_000:
                # coefficient planes are allocated from these header fields
                # BEFORE any entropy data validates them — a corrupt SOF
                # declaring 65535x65535 would attempt a ~32 GiB allocation.
                # 16 MP bounds the plane arrays to ~128 MB per component.
                raise JpegError("declared dimensions exceed the 16 MP cap")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / lossless: out of scope
        elif m == 0xDD:
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:
            ns = seg[0]
            scan = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
                    for c in range(ns)]
            i = i + 2 + seglen
            break
        i += 2 + seglen
    if frame is None or scan is None:
        return None
    h, w, comps = frame
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    if [cid for cid, _, _ in scan] != [cid for cid, _, _, _ in comps]:
        raise JpegError("non-interleaved or reordered scan")  # out of scope

    # destuff entropy data, split at restart markers
    segments: list[bytes] = []
    cur = bytearray()
    j = i
    while j < len(b):
        c = b[j]
        if c != 0xFF:
            cur.append(c)
            j += 1
            continue
        if j + 1 >= len(b):
            break
        nxt = b[j + 1]
        if nxt == 0x00:
            cur.append(0xFF)
            j += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            j += 2
        else:
            break  # EOI or any other marker ends the scan
    segments.append(bytes(cur))

    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    for _, hs, vs, _ in comps:
        if hs < 1 or vs < 1 or hmax % hs or vmax % vs:
            return None  # non-integer upsampling ratio: out of scope
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per component: coefficient blocks in MCU layout
    blocks = {
        cid: np.zeros((mcus_y * vs * mcus_x * hs, 64))
        for cid, hs, vs, _ in comps
    }
    pred = {cid: 0 for cid, _, _ in scan}
    reader = _BitReader(segments[0])
    seg_idx = 0
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if dri and mcu and mcu % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise JpegError("missing restart segment")
            reader = _BitReader(segments[seg_idx])
            pred = {cid: 0 for cid, _, _ in scan}
        my, mx = divmod(mcu, mcus_x)
        for cid, td, ta in scan:
            hs, vs, tq = by_id[cid]
            q = qtabs[tq]
            dc_t, ac_t = huff_dc[td], huff_ac[ta]
            row_blocks = mcus_x * hs
            for v in range(vs):
                for hblk in range(hs):
                    coef = np.zeros(64)
                    t = reader.huff(dc_t)
                    if t > 11:
                        raise JpegError("DC category out of range")
                    pred[cid] += _extend(reader.bits(t), t)
                    coef[0] = pred[cid] * q[0]
                    k = 1
                    while k < 64:
                        rs = reader.huff(ac_t)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise JpegError("AC index overflow")
                        coef[k] = _extend(reader.bits(s), s) * q[k]
                        k += 1
                    bi = (my * vs + v) * row_blocks + (mx * hs + hblk)
                    blocks[cid][bi] = coef

    # dezigzag → IDCT → planes → upsample → color transform
    planes = []
    for cid, hs, vs, _tq in comps:
        nrows, ncols = mcus_y * vs, mcus_x * hs
        spatial = np.zeros((nrows * ncols, 64))
        spatial[:, _ZZ] = blocks[cid]
        px = _idct_blocks(spatial.reshape(-1, 8, 8)) + 128.0
        plane = (
            px.reshape(nrows, ncols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nrows * 8, ncols * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, bch], axis=-1)), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------------
# encoder (deterministic fixture/testdata generation)
# ---------------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-pad
        return bytes(self.out)


def _fixed_encode_table(symbols: set[int]) -> tuple[bytes, bytes, dict[int, tuple[int, int]]]:
    """Fixed-length canonical table over the symbols actually used: n symbols
    of length L with 2^L >= n+1, so the all-ones codeword is never assigned
    (T.81 requires it unused)."""
    syms = sorted(symbols) or [0]
    length = max(1, len(syms).bit_length())
    bits = bytearray(16)
    bits[length - 1] = len(syms)
    codes = {s: (i, length) for i, s in enumerate(syms)}
    return bytes(bits), bytes(syms), codes


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (category, magnitude bits) per T.81 F.1.2.1."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def encode_baseline_jpeg(
    img: np.ndarray,
    *,
    qtable: np.ndarray | None = None,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H, W) or (H, W, 3) → baseline JFIF JPEG bytes. Deterministic:
    flat default quant table (all 8s — near-lossless), per-image fixed-length
    Huffman tables. subsampling applies to the two chroma components."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise JpegError("unencodable dimensions")
    q = (
        np.full(64, 8.0) if qtable is None else np.asarray(qtable, np.float64)
    )
    if len(q) != 64 or q.min() < 1 or q.max() > 255:
        raise JpegError("bad quant table")
    sh, sv = subsampling
    if gray:
        comps = [(1, 1, 1, 0)]
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        comps = [(1, sh, sv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]

        def _sub(p: np.ndarray) -> np.ndarray:
            if sh == 1 and sv == 1:
                return p
            hp = np.pad(p, ((0, (-h) % sv), (0, (-w) % sh)), mode="edge")
            return hp.reshape(hp.shape[0] // sv, sv, hp.shape[1] // sh, sh).mean(
                axis=(1, 3)
            )

        planes = [y, _sub(cb), _sub(cr)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # quantized blocks per component, padded to full-MCU coverage
    qblocks = []
    for (cid, hs, vs, _tq), plane in zip(comps, planes):
        need_r, need_c = mcus_y * vs * 8, mcus_x * hs * 8
        plane = np.pad(
            plane,
            ((0, need_r - plane.shape[0]), (0, need_c - plane.shape[1])),
            mode="edge",
        )
        nr, ncol = need_r // 8, need_c // 8
        blk = plane.reshape(nr, 8, ncol, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coef = _fdct_blocks(blk - 128.0).reshape(-1, 64)
        qb = np.round(coef / q[np.newaxis, :]).astype(np.int64)[:, _ZZ]
        qblocks.append((qb, nr, ncol, hs, vs))

    # DC table: the full category set 0..11 (12 symbols, fixed length 4 —
    # restart-independent); AC table: the (run|size) symbols actually used
    ac_syms: set[int] = set()
    for qb, _nr, _ncol, _hs, _vs in qblocks:
        for zz in qb:
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms.add(0xF0)
                    run -= 16
                ac_syms.add((run << 4) | _magnitude(v)[0])
                run = 0
            if run:
                ac_syms.add(0x00)  # EOB
    dc_bits, dc_vals, dc_codes = _fixed_encode_table(set(range(12)))
    ac_bits, ac_vals, ac_codes = _fixed_encode_table(ac_syms or {0x00})

    def _emit_block(writer: _BitWriter, zz: np.ndarray, dc_diff: int) -> None:
        t, mbits = _magnitude(dc_diff)
        code, clen = dc_codes[t]
        writer.write(code, clen)
        if t:
            writer.write(mbits, t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, clen = ac_codes[0xF0]
                writer.write(code, clen)
                run -= 16
            t, mbits = _magnitude(v)
            code, clen = ac_codes[(run << 4) | t]
            writer.write(code, clen)
            if t:
                writer.write(mbits, t)
            run = 0
        if run:
            code, clen = ac_codes[0x00]
            writer.write(code, clen)

    chunks: list[bytes] = []
    writer = _BitWriter()
    pred = [0] * len(comps)
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            chunks.append(writer.flush())
            writer = _BitWriter()
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, (qb, _nr, ncol, hs, vs) in enumerate(qblocks):
            for v in range(vs):
                for hblk in range(hs):
                    zz = qb[(my * vs + v) * ncol + (mx * hs + hblk)]
                    dc = int(zz[0])
                    _emit_block(writer, zz, dc - pred[ci])
                    pred[ci] = dc
    chunks.append(writer.flush())
    entropy = bytearray(chunks[0])
    for n, chunk in enumerate(chunks[1:]):
        entropy += bytes([0xFF, 0xD0 + (n % 8)]) + chunk

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    qz = q[_ZZ].astype(np.uint8)  # DQT stores the table in zigzag order
    out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([0x00]) + qz.tobytes()
    ncomp = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, hs, vs, tq in comps:
        out += bytes([cid, (hs << 4) | vs, 0])  # all comps share qtable 0
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(dc_vals)) + bytes([0x00]) + dc_bits + dc_vals
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(ac_vals)) + bytes([0x10]) + ac_bits + ac_vals
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid, _hs, _vs, _tq in comps:
        out += bytes([cid, 0x00])  # DC table 0, AC table 0
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for baseline
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
