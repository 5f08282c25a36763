"""Pure-Python AES (FIPS-197) — the minimal core the PDF standard security
handler needs: ECB single-block encrypt/decrypt for 128/192/256-bit keys plus
CBC helpers with the PDF flavors of IV/padding handling.

Why hand-rolled: the sandbox has no ``cryptography``/``pycryptodome``; AES is
pure public specification (FIPS-197 / ISO 18033-3). Used ONLY on the rare
encrypted-PDF path (reference behavior: pdfium's standard security handler,
reached via main.py:161) — never in the hot extraction loop, so a table-driven
pure-Python implementation is the right cost/benefit. All tables are DERIVED
at import time from the spec's definitions (GF(2^8) inverse + affine map)
rather than transcribed, and the module self-checks against the FIPS-197
Appendix C known-answer vectors in tests/test_pdf_round5.py.
"""
from __future__ import annotations

# ---------------------------------------------------------------------------------
# GF(2^8) arithmetic and the S-boxes, derived per FIPS-197 §5.1.1
# ---------------------------------------------------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a = _xtime(a)
        b >>= 1
    return r


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse table via exponentiation by generator 3
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    exp[255] = exp[0]  # the generator cycle has period 255: x^255 = x^0 = 1
    inv = [0] * 256
    for a in range(1, 256):
        inv[a] = exp[255 - log[a]]
    sbox = bytearray(256)
    for a in range(256):
        b = inv[a]
        # affine transform: b XOR rot(b,1..4) XOR 0x63
        s = b
        for r in (1, 2, 3, 4):
            s ^= ((b << r) | (b >> (8 - r))) & 0xFF
        sbox[a] = s ^ 0x63
    inv_sbox = bytearray(256)
    for a in range(256):
        inv_sbox[sbox[a]] = a
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_MUL2 = bytes(_gmul(a, 2) for a in range(256))
_MUL3 = bytes(_gmul(a, 3) for a in range(256))
_MUL9 = bytes(_gmul(a, 9) for a in range(256))
_MUL11 = bytes(_gmul(a, 11) for a in range(256))
_MUL13 = bytes(_gmul(a, 13) for a in range(256))
_MUL14 = bytes(_gmul(a, 14) for a in range(256))
_RCON = [1]
while len(_RCON) < 14:
    _RCON.append(_xtime(_RCON[-1]))


def _expand_key(key: bytes) -> list[list[int]]:
    """Key schedule (FIPS-197 §5.2) → list of round keys, each 16 bytes."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16, 24, or 32 bytes")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [
        [b for w in words[4 * r : 4 * r + 4] for b in w] for r in range(nr + 1)
    ]


def _encrypt_block(block: bytes, rk: list[list[int]]) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[0])]
    nr = len(rk) - 1
    for rnd in range(1, nr):
        # SubBytes + ShiftRows (column-major state: byte i sits at
        # row i%4, col i//4; ShiftRows moves row r left by r columns)
        t = [_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)]
        # MixColumns
        s = []
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = t[c : c + 4]
            s += [
                _MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3,
                a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3,
                a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3],
                _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3],
            ]
        s = [b ^ k for b, k in zip(s, rk[rnd])]
    t = [_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)]
    return bytes(b ^ k for b, k in zip(t, rk[nr]))


def _decrypt_block(block: bytes, rk: list[list[int]]) -> bytes:
    nr = len(rk) - 1
    s = [b ^ k for b, k in zip(block, rk[nr])]
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows (row r right by r) + InvSubBytes
        t = [_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16)]
        t = [b ^ k for b, k in zip(t, rk[rnd])]
        # InvMixColumns
        s = []
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = t[c : c + 4]
            s += [
                _MUL14[a0] ^ _MUL11[a1] ^ _MUL13[a2] ^ _MUL9[a3],
                _MUL9[a0] ^ _MUL14[a1] ^ _MUL11[a2] ^ _MUL13[a3],
                _MUL13[a0] ^ _MUL9[a1] ^ _MUL14[a2] ^ _MUL11[a3],
                _MUL11[a0] ^ _MUL13[a1] ^ _MUL9[a2] ^ _MUL14[a3],
            ]
    t = [_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16)]
    return bytes(b ^ k for b, k in zip(t, rk[0]))


# ---------------------------------------------------------------------------------
# CBC modes as the PDF security handlers use them
# ---------------------------------------------------------------------------------


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC encrypt with PKCS#5/7 padding; returns iv + ciphertext (the
    PDF stream layout: 16-byte IV prefix, §7.6.2 of ISO 32000)."""
    rk = _expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        prev = _encrypt_block(
            bytes(a ^ b for a, b in zip(data[i : i + 16], prev)), rk
        )
        out += prev
    return bytes(out)


def cbc_decrypt_pdf_stream(key: bytes, data: bytes) -> bytes:
    """Decrypt a PDF AES stream: first 16 bytes are the IV, PKCS#5/7 padding
    is stripped. Tolerates (returns b'') degenerate short inputs and a
    malformed final padding byte (clamped, pdfium-style) rather than raising —
    encrypted garbage should surface as a downstream parse sentinel, not an
    exception from the cipher layer."""
    if len(data) < 32 or len(data) % 16:
        return b""
    rk = _expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for i in range(16, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rk), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16:
        pad = 0
    return bytes(out[: len(out) - pad])


def cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC encrypt, no padding, no IV prefix (len(data) % 16 == 0) —
    the ISO 32000-2 Algorithm 2.B hardened-hash primitive."""
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = _encrypt_block(
            bytes(a ^ b for a, b in zip(data[i : i + 16], prev)), rk
        )
        out += prev
    return bytes(out)


def cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC decrypt, no padding, no IV prefix — used to unwrap the /UE
    key blob in AES-256 handlers (ISO 32000-2 Algorithm 2.A step f)."""
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rk), prev))
        prev = blk
    return bytes(out)
