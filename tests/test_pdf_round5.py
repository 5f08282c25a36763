"""Round-5 PDF interpreter surface (r4 VERDICT #2-#5 + ADVICE):

  * /ToUnicode precedence on SIMPLE fonts (custom-encoded subset fonts)
  * per-PAGE error isolation (one corrupt page keeps the others)
  * xref-FIRST object discovery: classic tables, xref streams, /Prev chains,
    incremental updates — and the motivating case, stream data containing
    literal `endobj` bytes that truncates scan-based discovery
  * RC4 empty-user-password decryption (standard security handler V1/V2 R2/R3)
  * /Rotate with a non-zero MediaBox origin
  * /DecodeParms array entries that are indirect references
  * inline-image EI false positives inside sample data
  * ToUnicode UTF-16BE destinations: ligature multi-char expansion, surrogate
    pairs, multi-unit bfrange increment, map-to-nothing, lone-surrogate
    tolerance; embedded CMap /Encoding on Type0 sentinels

All fixtures hand-built from the public PDF 1.x spec; the reference gets this
surface from pdfium (main.py:161) — parity is behavioral.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import pytest

from pdf_extract_sys_spark.sources.pdf_bytes import (
    PdfParseError,
    _PW_PAD,
    _rc4,
    pdf_to_page_records,
    pdf_to_pdf_chars_payloads,
)
from test_pdf_bytes import LONG1, LONG2, _extract_texts, make_pdf

PAD2 = "Padding words so this page also clears the fifty character searchable gate."


# ---------------------------------------------------------------------------------
# helpers: classic-xref writer + RC4 encryptor (both pure public spec)
# ---------------------------------------------------------------------------------


def build_pdf(objs: dict[int, bytes], *, xref: bool = True,
              header: bytes = b"%PDF-1.4\n",
              trailer_extra: bytes = b"") -> bytes:
    """Assemble numbered objects into a PDF, optionally with a spec-correct
    classic xref table + trailer + startxref."""
    out = bytearray(header)
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    if xref:
        xref_off = len(out)
        maxnum = max(objs)
        out += b"xref\n0 " + str(maxnum + 1).encode() + b"\n"
        out += b"0000000000 65535 f \n"
        for num in range(1, maxnum + 1):
            if num in offsets:
                out += b"%010d 00000 n \n" % offsets[num]
            else:
                out += b"0000000000 65535 f \n"
        out += (
            b"trailer\n<< /Size " + str(maxnum + 1).encode()
            + b" /Root 1 0 R" + trailer_extra + b" >>\nstartxref\n"
            + str(xref_off).encode() + b"\n"
        )
    return bytes(out) + b"%%EOF"


def basic_objs(content: bytes, *, filt: bytes = b"",
               page_extra: bytes = b"") -> dict[int, bytes]:
    return {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>" + page_extra),
        4: (b"<< /Length " + str(len(content)).encode() + filt
            + b" >>\nstream\n" + content + b"\nendstream"),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
    }


def _derive_file_key(o: bytes, p: int, id0: bytes, r: int, n: int) -> bytes:
    h = hashlib.md5(_PW_PAD + o + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0)
    key = h.digest()[:n]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()[:n]
    return key


def encrypt_pdf(objs: dict[int, bytes], *, r: int = 3,
                user_pw_matches: bool = True) -> bytes:
    """Standard-security-handler writer (public Algorithms 2/3/4/5): empty
    owner+user password, RC4 over every stream payload. user_pw_matches=False
    writes a corrupted /U — the reader must demand a password (sentinel)."""
    v, n = (2, 16) if r == 3 else (1, 5)
    id0 = bytes(range(16))
    p = -44  # permissions bits, arbitrary but realistic
    # Algorithm 3: /O for empty owner password (= empty user password)
    okey = hashlib.md5(_PW_PAD).digest()
    if r >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey[:n]).digest()
    okey = okey[:n]
    o = _rc4(okey, _PW_PAD)
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)
    key = _derive_file_key(o, p, id0, r, n)
    # Algorithm 4/5: /U
    if r == 2:
        u = _rc4(key, _PW_PAD)
    else:
        u = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16
    if not user_pw_matches:
        u = bytes(255 - b for b in u[:16]) + u[16:]

    enc_objs = dict(objs)
    for num, body in objs.items():
        m = body.find(b"stream\n")
        if m < 0:
            continue
        s = m + len(b"stream\n")
        e = body.rfind(b"\nendstream")
        raw = body[s:e]
        ok = hashlib.md5(
            key + num.to_bytes(3, "little") + (0).to_bytes(2, "little")
        ).digest()[: min(n + 5, 16)]
        enc_objs[num] = body[:s] + _rc4(ok, raw) + body[e:]
    encnum = max(objs) + 1
    enc_objs[encnum] = (
        b"<< /Filter /Standard /V " + str(v).encode() + b" /R " + str(r).encode()
        + b" /Length " + str(n * 8).encode()
        + b" /O <" + o[:32].hex().encode() + b"> /U <" + u[:32].hex().encode()
        + b"> /P " + str(p).encode() + b" >>"
    )
    return build_pdf(
        enc_objs,
        trailer_extra=(
            b" /Encrypt " + str(encnum).encode() + b" 0 R /ID [<"
            + id0.hex().encode() + b"> <" + id0.hex().encode() + b">]"
        ),
    )


# ---------------------------------------------------------------------------------
# /ToUnicode on simple fonts (r4 VERDICT #2)
# ---------------------------------------------------------------------------------


def test_simple_font_tounicode_overrides_builtin_encoding():
    """A subsetted simple font with a CUSTOM built-in encoding (no
    /Differences) and a /ToUnicode CMap — standard pdftex/LaTeX output — must
    decode through the CMap, not as Latin-1 mojibake (pdfium behavior)."""
    # remap each distinct char of LONG1 to a small custom code
    codes = {c: i + 1 for i, c in enumerate(dict.fromkeys(LONG1))}
    shown = bytes(codes[c] for c in LONG1)
    bfchars = b"\n".join(
        b"<%02x> <%04x>" % (code, ord(c)) for c, code in codes.items()
    )
    tounicode = (
        str(len(codes)).encode() + b" beginbfchar\n" + bfchars + b"\nendbfchar"
    )
    content = b"BT /F1 12 Tf 72 720 Td <" + shown.hex().encode() + b"> Tj ET"
    objs = basic_objs(content)
    objs[5] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /ABCDEF+CustomSubset "
        b"/FirstChar 1 /ToUnicode 6 0 R >>"
    )
    objs[6] = (
        b"<< /Length " + str(len(tounicode)).encode() + b" >>\nstream\n"
        + tounicode + b"\nendstream"
    )
    assert _extract_texts(build_pdf(objs))[0] == LONG1


def test_simple_font_tounicode_beats_winansi():
    """Spec precedence: where /ToUnicode and the base encoding disagree, the
    CMap wins."""
    tounicode = b"1 beginbfchar\n<41> <0042>\nendbfchar"  # 'A' -> 'B'
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"(A long sentence that clears the fifty char searchable gate easily.) Tj ET"
    )
    objs = basic_objs(content)
    objs[5] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding /ToUnicode 6 0 R >>"
    )
    objs[6] = (
        b"<< /Length " + str(len(tounicode)).encode() + b" >>\nstream\n"
        + tounicode + b"\nendstream"
    )
    assert _extract_texts(build_pdf(objs))[0].startswith("B long sentence")


# ---------------------------------------------------------------------------------
# per-page error isolation (r4 VERDICT #3)
# ---------------------------------------------------------------------------------


def test_corrupt_page_isolated_other_pages_extract():
    """A 2-page doc whose page 2 has a corrupt content stream yields page 1's
    spans PLUS one page-2 error span — main.py:361-372 granularity, not a
    whole-doc sentinel."""
    good = f"BT /F1 12 Tf 72 720 Td ({LONG1} {PAD2}) Tj ET".encode()
    bad = b"BI /W 2 /H 2 ID \xff\x00 no terminator present at all"
    pdf = make_pdf([good, bad])
    payloads = pdf_to_pdf_chars_payloads(pdf)
    assert payloads[0] is not None and payloads[1] is None
    texts = _extract_texts(pdf)
    assert texts[0] == LONG1
    assert texts[-1] == "[Error processing page 1]"


def test_doc_level_failure_still_doc_sentinel():
    with pytest.raises(PdfParseError):
        pdf_to_pdf_chars_payloads(b"%PDF-1.4\nnothing here\n%%EOF")


# ---------------------------------------------------------------------------------
# xref-first discovery (r4 VERDICT #4)
# ---------------------------------------------------------------------------------


def _objs_with_endobj_in_binary_stream() -> dict[int, bytes]:
    """Object 6 is a binary stream (an embedded font file, say) whose DATA
    contains literal `endobj` followed by a phantom `5 0 obj` that SHADOWS
    the real font object under scan discovery — the exact truncation class
    xref-first discovery exists to prevent (r4 VERDICT #4)."""
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1} {PAD2}) Tj ET".encode()
    objs = basic_objs(content)
    binary = (
        b"\x00\x01\xff\xfe endobj\n5 0 obj\n"
        b"<< /Type /Font /Subtype /Type0 /Encoding /Bogus-CMap >>\n\x80\x81"
    )
    objs[6] = (
        b"<< /Length " + str(len(binary)).encode() + b" >>\nstream\n"
        + binary + b"\nendstream"
    )
    return objs


def test_xref_rescues_stream_containing_endobj():
    pdf = build_pdf(_objs_with_endobj_in_binary_stream())
    texts = _extract_texts(pdf)
    assert texts[0] == LONG1
    assert all("[Error" not in t for t in texts)


def test_scan_only_same_file_degrades_safely():
    """The SAME file without an xref (scan discovery): the phantom object
    shadows the real font — the result must be an ERROR, never silently
    garbled text (the old scan-only failure mode, degraded safely)."""
    pdf = build_pdf(_objs_with_endobj_in_binary_stream(), xref=False)
    try:
        texts = _extract_texts(pdf)
    except PdfParseError:
        return
    assert any((t or "").startswith("[Error") for t in texts)


def test_damaged_xref_falls_back_to_scan():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1} {PAD2}) Tj ET".encode()
    pdf = build_pdf(basic_objs(content))
    # corrupt every xref entry offset: discovery must fall back to the scan
    import re as _re

    pdf = _re.sub(rb"\n\d{10} 00000 n ", b"\n9999999999 00000 n ", pdf)
    assert _extract_texts(pdf)[0] == LONG1


def test_incremental_update_newest_object_wins():
    """An appended incremental update (new page content + xref with /Prev)
    must override the original object — first claim from the NEWEST section
    wins."""
    old = f"BT /F1 12 Tf 72 720 Td (Old text that should be replaced entirely by the update.) Tj ET".encode()
    new = f"BT /F1 12 Tf 72 720 Td ({LONG1} {PAD2}) Tj ET".encode()
    base = build_pdf(basic_objs(old))
    first_xref = base.rfind(b"xref")
    startxref_old = int(base[base.rfind(b"startxref") + 9 :].split()[0])
    body = base[: base.rfind(b"%%EOF")]
    new_obj_off = len(body)
    update = (
        b"4 0 obj\n<< /Length " + str(len(new)).encode() + b" >>\nstream\n"
        + new + b"\nendstream\nendobj\n"
    )
    new_xref_off = new_obj_off + len(update)
    update += (
        b"xref\n4 1\n%010d 00000 n \n" % new_obj_off
        + b"trailer\n<< /Size 6 /Root 1 0 R /Prev "
        + str(startxref_old).encode() + b" >>\nstartxref\n"
        + str(new_xref_off).encode() + b"\n%%EOF"
    )
    texts = _extract_texts(body + update)
    assert texts[0] == LONG1
    assert all("Old text" not in (t or "") for t in texts)


def make_pdf_xref_stream(content: bytes) -> bytes:
    """Modern layout: dict objects packed in a Flate ObjStm, located via a
    /Type /XRef cross-reference STREAM with type-2 entries and a PNG-Up
    predictor — the realistic post-2005 writer shape."""
    members = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
    }
    offs, pos = [], 0
    for b in members.values():
        offs.append(pos)
        pos += len(b) + 1
    header = b" ".join(
        b"%d %d" % (n, o) for n, o in zip(members, offs)
    ) + b"\n"
    payload = header + b"\n".join(members.values()) + b"\n"
    objstm_data = zlib.compress(payload)
    objstm = (
        b"<< /Type /ObjStm /N 4 /First " + str(len(header)).encode()
        + b" /Length " + str(len(objstm_data)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + objstm_data + b"\nendstream"
    )
    cobj = (b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream")

    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    for num, body in ((4, cobj), (6, objstm)):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    offsets[7] = xref_off
    # W [1 4 2]; entries for objects 0..7
    rows = []
    rows.append((0, 0, 65535))  # obj 0: free
    for num in (1, 2, 3):
        rows.append((2, 6, list(members).index(num)))
    rows.append((1, offsets[4], 0))
    rows.append((2, 6, 3))  # obj 5 at index 3 in the ObjStm
    rows.append((1, offsets[6], 0))
    rows.append((1, xref_off, 0))
    raw = b"".join(
        bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        for t, f2, f3 in rows
    )
    # PNG Up predictor over 7-byte rows, then Flate — the common writer output
    rowlen = 7
    pred = bytearray()
    prev = bytes(rowlen)
    for i in range(0, len(raw), rowlen):
        row = raw[i : i + rowlen]
        pred.append(2)
        pred += bytes((row[j] - prev[j]) & 0xFF for j in range(rowlen))
        prev = row
    xdata = zlib.compress(bytes(pred))
    xobj = (
        b"<< /Type /XRef /Size 8 /W [1 4 2] /Root 1 0 R /Filter /FlateDecode"
        b" /DecodeParms << /Predictor 12 /Columns 7 >> /Length "
        + str(len(xdata)).encode() + b" >>\nstream\n" + xdata + b"\nendstream"
    )
    out += b"7 0 obj\n" + xobj + b"\nendobj\n"
    out += b"startxref\n" + str(xref_off).encode() + b"\n%%EOF"
    return bytes(out)


def test_xref_stream_with_objstm_type2_entries():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1} {LONG2}) Tj ET".encode()
    assert _extract_texts(make_pdf_xref_stream(content)) == [LONG1, LONG2]


def test_hybrid_xrefstm_takes_precedence_over_classic_table():
    """Hybrid-reference file (spec 7.5.8.4): startxref points at a CLASSIC
    table whose trailer carries /XRefStm, and the STREAM's entries take
    precedence over the table's. Here the classic table still points the page
    dict at its stale top-level offset while the /XRefStm supersedes it with a
    type-2 entry into an ObjStm holding the UPDATED page (new /Contents) —
    reading the table first would extract the stale text. ObjStm expansion's
    setdefault cannot mask this case: the stale object IS present top-level."""
    stale = (b"BT /F1 12 Tf 72 720 Td "
             b"(Stale text that a conforming reader must never surface here.)"
             b" Tj ET")
    fresh = f"BT /F1 12 Tf 72 720 Td ({LONG1} {PAD2}) Tj ET".encode()
    top = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        4: (b"<< /Length " + str(len(stale)).encode() + b" >>\nstream\n"
            + stale + b"\nendstream"),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
        9: (b"<< /Length " + str(len(fresh)).encode() + b" >>\nstream\n"
            + fresh + b"\nendstream"),
    }
    new_page = (b"<< /Type /Page /Parent 2 0 R /Contents 9 0 R "
                b"/Resources << /Font << /F1 5 0 R >> >> >>")
    hdr = b"3 0\n"
    payload = hdr + new_page + b"\n"
    sdata = zlib.compress(payload)
    top[8] = (b"<< /Type /ObjStm /N 1 /First " + str(len(hdr)).encode()
              + b" /Length " + str(len(sdata)).encode()
              + b" /Filter /FlateDecode >>\nstream\n" + sdata + b"\nendstream")

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num in sorted(top):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + top[num] + b"\nendobj\n"
    # the /XRefStm: obj 7, covering ONLY the superseding entries —
    # type-2 for the updated page 3, type-1 for the ObjStm 8 and stream 9
    xref_stream_off = len(out)
    offsets[7] = xref_stream_off
    rows = [(2, 8, 0), (1, xref_stream_off, 0), (1, offsets[8], 0),
            (1, offsets[9], 0)]
    raw = b"".join(bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
                   for t, f2, f3 in rows)
    xdata = zlib.compress(raw)
    out += (b"7 0 obj\n<< /Type /XRef /Size 10 /Index [3 1 7 3] /W [1 4 2]"
            b" /Root 1 0 R /Filter /FlateDecode /Length "
            + str(len(xdata)).encode() + b" >>\nstream\n" + xdata
            + b"\nendstream\nendobj\n")
    # the CLASSIC table startxref points at: objects 1-5 at their top-level
    # offsets — including the STALE page 3 — with 6-9 marked free ("hidden"
    # from legacy readers, per the hybrid convention)
    table_off = len(out)
    out += b"xref\n0 10\n0000000000 65535 f \n"
    for num in range(1, 10):
        if num in (1, 2, 3, 4, 5):
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (b"trailer\n<< /Size 10 /Root 1 0 R /XRefStm "
            + str(xref_stream_off).encode() + b" >>\nstartxref\n"
            + str(table_off).encode() + b"\n%%EOF")
    texts = _extract_texts(bytes(out))
    assert texts[0] == LONG1
    assert all("Stale text" not in (t or "") for t in texts)


# ---------------------------------------------------------------------------------
# RC4 empty-user-password decryption (r4 VERDICT #5)
# ---------------------------------------------------------------------------------


def test_rc4_r3_empty_password_extracts():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1} {LONG2}) Tj ET".encode()
    pdf = encrypt_pdf(basic_objs(content), r=3)
    assert _extract_texts(pdf) == [LONG1, LONG2]


def test_rc4_r2_40bit_empty_password_extracts():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    pdf = encrypt_pdf(basic_objs(content), r=2)
    assert _extract_texts(pdf)[0] == LONG1


def test_rc4_real_password_still_sentinels():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    pdf = encrypt_pdf(basic_objs(content), r=3, user_pw_matches=False)
    with pytest.raises(PdfParseError, match="password"):
        pdf_to_pdf_chars_payloads(pdf)


def test_aes_v4_wrong_password_sentinels():
    """V4/AESV2 is now DECRYPTED for the empty user password — a /U that does
    not validate means a real password is required ⇒ sentinel."""
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    objs = basic_objs(content)
    objs[6] = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 /O <"
        + b"00" * 32 + b"> /U <" + b"00" * 32 + b"> /P -44 "
        b"/CF << /StdCF << /CFM /AESV2 >> >> /StmF /StdCF >>"
    )
    pdf = build_pdf(
        objs, trailer_extra=b" /Encrypt 6 0 R /ID [<0102> <0102>]"
    )
    with pytest.raises(PdfParseError, match="password required"):
        pdf_to_pdf_chars_payloads(pdf)


def test_unknown_cfm_sentinels():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    objs = basic_objs(content)
    objs[6] = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 /O <"
        + b"00" * 32 + b"> /U <" + b"00" * 32 + b"> /P -44 "
        b"/CF << /StdCF << /CFM /Bogus >> >> /StmF /StdCF >>"
    )
    pdf = build_pdf(
        objs, trailer_extra=b" /Encrypt 6 0 R /ID [<0102> <0102>]"
    )
    with pytest.raises(PdfParseError, match="unsupported /CFM"):
        pdf_to_pdf_chars_payloads(pdf)


def test_v4_stmf_identity_extracts_without_decryption():
    """Per spec, /StmF /Identity (or absent) means streams are NOT encrypted —
    the document must extract even though an /Encrypt dict is present."""
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    objs = basic_objs(content)
    objs[6] = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 /O <"
        + b"00" * 32 + b"> /U <" + b"00" * 32 + b"> /P -44 "
        b"/CF << /StdCF << /CFM /AESV2 >> >> /StmF /Identity >>"
    )
    pdf = build_pdf(
        objs, trailer_extra=b" /Encrypt 6 0 R /ID [<0102> <0102>]"
    )
    assert _extract_texts(pdf) == [LONG1]


def test_rc4_flate_combo():
    """Encryption applies to the RAW stream bytes BEFORE filters decode —
    RC4 then Flate must roundtrip."""
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1} {LONG2}) Tj ET".encode()
    data = zlib.compress(content)
    objs = basic_objs(b"", filt=b" /Filter /FlateDecode")
    objs[4] = (b"<< /Length " + str(len(data)).encode()
               + b" /Filter /FlateDecode >>\nstream\n" + data + b"\nendstream")
    pdf = encrypt_pdf(objs, r=3)
    assert _extract_texts(pdf) == [LONG1, LONG2]


# ---------------------------------------------------------------------------------
# /Rotate with non-zero MediaBox origin (r4 ADVICE)
# ---------------------------------------------------------------------------------


def test_rotate_90_with_offset_mediabox_origin():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    objs = basic_objs(content, page_extra=b"")
    objs[2] = (b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
               b"/MediaBox [50 50 662 842] >>")
    objs[3] = (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Rotate 90 "
               b"/Resources << /Font << /F1 5 0 R >> >> >>")
    (payload, n_ev, _n_img, _imgs), = pdf_to_page_records(build_pdf(objs))
    lines = payload.split("\n")
    assert lines[0] == "PAGE\t792\t612"  # swapped display dims (extents)
    first = lines[1].split("\t")
    # media (72, 720..732) -> box-relative (22, 670..682) -> display
    # (x, y) -> (y, w - x) with w = 612: x0 = 670, y1 = 612 - 22 = 590
    assert abs(float(first[1]) - 670.0) < 1e-6
    assert abs(float(first[4]) - 590.0) < 1e-6
    # every display coordinate must be inside the page, never negative
    for ln in lines[1:]:
        _c, x0, y0, x1, y1 = ln.split("\t")
        assert 0 <= float(x0) <= float(x1) <= 792
        assert 0 <= float(y0) <= float(y1) <= 612


def test_unrotated_offset_origin_keeps_absolute_convention():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    objs = basic_objs(content)
    objs[2] = (b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
               b"/MediaBox [50 50 662 842] >>")
    (payload, _n, _i, _im), = pdf_to_page_records(build_pdf(objs))
    first = payload.split("\n")[1].split("\t")
    assert abs(float(first[1]) - 72.0) < 1e-6  # absolute media x, unrebase


# ---------------------------------------------------------------------------------
# /DecodeParms indirect refs in array form (r4 ADVICE)
# ---------------------------------------------------------------------------------


def _png_up_encode(data: bytes, columns: int) -> bytes:
    out = bytearray()
    prev = bytes(columns)
    for i in range(0, len(data), columns):
        row = data[i : i + columns].ljust(columns, b"\x00")
        out.append(2)
        out += bytes((row[j] - prev[j]) & 0xFF for j in range(columns))
        prev = row
    return bytes(out)


def test_decode_parms_array_indirect_ref():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1} {LONG2}) Tj ET".encode()
    cols = 16
    padded = content.ljust((len(content) + cols - 1) // cols * cols, b" ")
    data = zlib.compress(_png_up_encode(padded, cols))
    objs = basic_objs(b"")
    objs[4] = (
        b"<< /Length " + str(len(data)).encode()
        + b" /Filter [/FlateDecode] /DecodeParms [6 0 R] >>\nstream\n"
        + data + b"\nendstream"
    )
    objs[6] = b"<< /Predictor 12 /Columns 16 >>"
    assert _extract_texts(build_pdf(objs)) == [LONG1, LONG2]


def test_decode_parms_unrecognized_entry_errors_not_garbage():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    data = zlib.compress(content)
    objs = basic_objs(b"")
    objs[4] = (
        b"<< /Length " + str(len(data)).encode()
        + b" /Filter [/FlateDecode] /DecodeParms [/Bogus] >>\nstream\n"
        + data + b"\nendstream"
    )
    # page-scoped error (discovery fine, the page's stream dict is malformed)
    assert pdf_to_pdf_chars_payloads(build_pdf(objs)) == [None]


# ---------------------------------------------------------------------------------
# inline-image EI false positives (r4 ADVICE)
# ---------------------------------------------------------------------------------


def test_inline_image_data_containing_fake_ei():
    """Unfiltered sample data containing a whitespace+EI+delimiter run must
    NOT end the skip early — the computed sample length bounds the scan."""
    # 4x2 gray 8bpc = 8 bytes; bytes 2..5 spell ' EI ' (the false positive)
    img = b"\x10 EI \xff\x00\x7f"
    assert len(img) == 8
    content = (
        b"BT /F1 12 Tf 72 720 Td (" + LONG1.encode() + b") Tj ET\n"
        b"BI /W 4 /H 2 /BPC 8 /CS /G ID " + img + b"\nEI\n"
        b"BT /F1 12 Tf 72 700 Td (" + LONG2.encode() + b" " + PAD2.encode()
        + b") Tj ET"
    )
    texts = _extract_texts(make_pdf([content]))
    assert texts[0] == LONG1 and texts[1].startswith(LONG2)


def test_filtered_inline_image_fake_ei_followed_by_binary_rejected():
    """For FILTERED (unknown-length) data, an EI candidate followed by more
    binary is rejected; the real EI — followed by content-stream text — is
    accepted."""
    blob = b"\x89\x50\x4e EI \xff\xfe\x90\x80\x81\x82 more \x9a\x9b"
    content = (
        b"BT /F1 12 Tf 72 720 Td (" + LONG1.encode() + b") Tj ET\n"
        b"BI /W 2 /H 2 /BPC 8 /F /DCT ID " + blob + b"\nEI\n"
        b"BT /F1 12 Tf 72 700 Td (" + LONG2.encode() + b" " + PAD2.encode()
        + b") Tj ET"
    )
    texts = _extract_texts(make_pdf([content]))
    assert texts[0] == LONG1 and texts[1].startswith(LONG2)


# ---------------------------------------------------------------------------------
# Oracle serializer: every deterministic variant must extract identically
# (r4 VERDICT #6 — the driver's q_extract_pdf_bytes certifies the full
# interpreter surface only if each variant really round-trips)
# ---------------------------------------------------------------------------------


def test_all_serializer_variants_extract_identically():
    from pdf_extract_sys_spark.queries import N_PDF_VARIANTS, _serialize_variant_pdf

    expected = _extract_texts(_serialize_variant_pdf(0, LONG1))
    assert expected == [LONG1]
    for v in range(1, N_PDF_VARIANTS):
        pdf = _serialize_variant_pdf(v, LONG1)
        assert _extract_texts(pdf) == expected, f"variant {v} diverged"


def test_variant_6_is_really_rc4_encrypted():
    """The ciphertext must not contain the plaintext (i.e. encryption actually
    happened) and must carry the /Encrypt machinery."""
    import zlib

    from pdf_extract_sys_spark.queries import _serialize_variant_pdf

    pdf = _serialize_variant_pdf(6, LONG1)
    assert b"/Encrypt" in pdf and b"/Standard" in pdf
    assert LONG1.encode() not in pdf
    ct = zlib.compress(b"BT /F1 12 Tf 10 760 Td (" + LONG1.encode() + b") Tj ET")
    assert ct not in pdf
    pdf7 = _serialize_variant_pdf(7, LONG1)
    assert b"/AESV2" in pdf7 and LONG1.encode() not in pdf7 and ct not in pdf7


# ---------------------------------------------------------------------------------
# AES empty-password decryption (round 5): V4/AESV2 and V5 R5/R6 AES-256
# writers mirroring the reader's public-spec algorithms
# ---------------------------------------------------------------------------------


def _patch_length(body: bytes, new_len: int) -> bytes:
    import re as _re

    return _re.sub(rb"/Length\s+\d+", b"/Length %d" % new_len, body, count=1)


def _encrypt_streams_with(objs: dict[int, bytes], enc_payload) -> dict[int, bytes]:
    """Replace every stream payload with enc_payload(objnum, raw), patching
    /Length (AES changes length)."""
    out = dict(objs)
    for num, body in objs.items():
        m = body.find(b"stream\n")
        if m < 0:
            continue
        s = m + len(b"stream\n")
        e = body.rfind(b"\nendstream")
        ct = enc_payload(num, body[s:e])
        out[num] = _patch_length(body[:s], len(ct)) + ct + body[e:]
    return out


def encrypt_pdf_aesv2(objs: dict[int, bytes]) -> bytes:
    """V4/R4 writer with /CFM /AESV2: same MD5-family key as R3, per-object
    key salted with 'sAlT', AES-128-CBC with a deterministic IV prefix."""
    from pdf_extract_sys_spark.sources._aes import cbc_encrypt

    r, n = 4, 16
    id0 = bytes(range(16))
    p = -44
    okey = hashlib.md5(_PW_PAD).digest()
    for _ in range(50):
        okey = hashlib.md5(okey[:n]).digest()
    okey = okey[:n]
    o = _rc4(okey, _PW_PAD)
    for i in range(1, 20):
        o = _rc4(bytes(b ^ i for b in okey), o)
    key = _derive_file_key(o, p, id0, r, n)
    u = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    u = u + b"\x00" * 16

    def enc_payload(num: int, raw: bytes) -> bytes:
        ok = hashlib.md5(
            key + num.to_bytes(3, "little") + (0).to_bytes(2, "little")
            + b"sAlT"
        ).digest()[: min(n + 5, 16)]
        iv = hashlib.md5(b"iv%d" % num).digest()
        return cbc_encrypt(ok, iv, raw)

    enc_objs = _encrypt_streams_with(objs, enc_payload)
    encnum = max(objs) + 1
    enc_objs[encnum] = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
        b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> "
        b"/StmF /StdCF /StrF /StdCF /O <" + o[:32].hex().encode()
        + b"> /U <" + u[:32].hex().encode() + b"> /P " + str(p).encode()
        + b" >>"
    )
    return build_pdf(
        enc_objs,
        trailer_extra=(
            b" /Encrypt " + str(encnum).encode() + b" 0 R /ID [<"
            + id0.hex().encode() + b"> <" + id0.hex().encode() + b">]"
        ),
    )


def encrypt_pdf_aes256(objs: dict[int, bytes], *, r: int = 6,
                       user_pw_matches: bool = True) -> bytes:
    """V5 writer (ISO 32000-2): AES-256-CBC streams under a random-ish (but
    deterministic) file key unwrapped from /UE; R6 uses the hardened 2.B
    hash, R5 the deprecated single SHA-256."""
    from pdf_extract_sys_spark.sources._aes import cbc_encrypt, cbc_encrypt_nopad
    from pdf_extract_sys_spark.sources.pdf_bytes import _hash_2b

    fkey = hashlib.sha256(b"round5-file-key").digest()
    vsalt = b"VALSALT!"
    ksalt = b"KEYSALT!"

    def h(pw: bytes, salt: bytes, ud: bytes = b"") -> bytes:
        return _hash_2b(pw, salt, ud) if r == 6 else hashlib.sha256(
            pw + salt + ud
        ).digest()

    u = h(b"", vsalt) + vsalt + ksalt
    ue = cbc_encrypt_nopad(h(b"", ksalt), bytes(16), fkey)
    ovsalt, oksalt = b"OVALSLT!", b"OKEYSLT!"
    o = h(b"", ovsalt, u[:48]) + ovsalt + oksalt
    oe = cbc_encrypt_nopad(h(b"", oksalt, u[:48]), bytes(16), fkey)
    if not user_pw_matches:
        u = bytes(255 - b for b in u[:32]) + u[32:]

    def enc_payload(num: int, raw: bytes) -> bytes:
        iv = hashlib.md5(b"iv%d" % num).digest()
        return cbc_encrypt(fkey, iv, raw)

    enc_objs = _encrypt_streams_with(objs, enc_payload)
    encnum = max(objs) + 1
    enc_objs[encnum] = (
        b"<< /Filter /Standard /V 5 /R " + str(r).encode() + b" /Length 256 "
        b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
        b"/StmF /StdCF /StrF /StdCF /U <" + u.hex().encode()
        + b"> /UE <" + ue.hex().encode() + b"> /O <" + o.hex().encode()
        + b"> /OE <" + oe.hex().encode() + b"> /P -44 /Perms <"
        + (b"00" * 16) + b"> >>"
    )
    return build_pdf(
        enc_objs,
        trailer_extra=b" /Encrypt " + str(encnum).encode() + b" 0 R",
    )


def test_aesv2_empty_password_roundtrip():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    objs = basic_objs(content)
    assert _extract_texts(encrypt_pdf_aesv2(objs)) == [LONG1]


def test_aesv2_flate_combo():
    """AES applies to the RAW stream bytes BEFORE filters — AES then Flate
    must roundtrip, including the /Length rewrite (CBC shrinks the payload)."""
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1} {LONG2}) Tj ET".encode()
    data = zlib.compress(content)
    objs = basic_objs(b"", filt=b" /Filter /FlateDecode")
    objs[4] = (b"<< /Length " + str(len(data)).encode()
               + b" /Filter /FlateDecode >>\nstream\n" + data + b"\nendstream")
    assert _extract_texts(encrypt_pdf_aesv2(objs)) == [LONG1, LONG2]


def test_aes256_r6_empty_password_roundtrip():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    objs = basic_objs(content)
    assert _extract_texts(encrypt_pdf_aes256(objs, r=6)) == [LONG1]


def test_aes256_r5_empty_password_roundtrip():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    objs = basic_objs(content)
    assert _extract_texts(encrypt_pdf_aes256(objs, r=5)) == [LONG1]


def test_aes256_wrong_password_sentinels():
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    objs = basic_objs(content)
    pdf = encrypt_pdf_aes256(objs, r=6, user_pw_matches=False)
    with pytest.raises(PdfParseError, match="password required"):
        pdf_to_pdf_chars_payloads(pdf)


# ---------------------------------------------------------------------------------
# Fuzz: sentinel totality over the round-5 surface — every serializer variant
# (xref streams, ObjStm+type-2, Type0, Rotate, RC4, AESV2) plus the hybrid
# /XRefStm shape must, under byte mutation, either parse or raise exactly
# PdfParseError/zlib.error (the Spark wrapper maps those to the error
# sentinel); anything else escapes the per-PAGE PdfParseError handler and
# escalates a one-page failure to a whole-doc sentinel (the per-doc blanket
# handler still catches it — coarser isolation, not a task crash).
# ---------------------------------------------------------------------------------


def test_fuzz_round5_variants_sentinel_totality():
    import random

    from pdf_extract_sys_spark.queries import (
        N_PDF_VARIANTS,
        _serialize_variant_pdf,
        _serialize_worklist_pdf,
    )

    rng = random.Random(20260818)
    bases = [_serialize_variant_pdf(v, LONG1) for v in range(N_PDF_VARIANTS)]
    bases.append(_serialize_worklist_pdf(3, LONG1))  # needs-OCR image page
    for trial in range(45 * len(bases)):
        b = bytearray(bases[trial % len(bases)])
        for _ in range(rng.randrange(1, 12)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            pdf_to_pdf_chars_payloads(bytes(b))
        except (PdfParseError, zlib.error):
            pass  # expected failure modes; anything else propagates and fails


def test_malformed_w_array_sentinels_not_valueerror():
    """Fuzz finding: a bracket token where /W expects a number must raise
    PdfParseError (→ page-scoped error span), not ValueError (which skips
    per-page isolation and sentinels the whole doc)."""
    from pdf_extract_sys_spark.sources.pdf_bytes import _parse_cid_widths

    for s in (b"[1 [ [ ]]", b"[1 2 ]", b"[1 [2] 3 ["):
        try:
            _parse_cid_widths(s)
        except PdfParseError:
            pass


def test_odd_digit_id_pads_per_spec():
    """Spec 7.3.4.3: hex strings with an odd digit count behave as if a
    trailing 0 were appended — an odd-digit /ID must not ValueError out of
    the decryptor (fuzz finding); with the padded ID the empty-password
    check simply fails -> ordinary encrypted-PDF sentinel."""
    content = f"BT /F1 12 Tf 72 720 Td ({LONG1}) Tj ET".encode()
    pdf = encrypt_pdf(basic_objs(content))
    m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>", pdf)
    assert m and len(m.group(1)) % 2 == 0
    odd = pdf[: m.start(1)] + m.group(1)[:-1] + pdf[m.end(1):]
    with pytest.raises(PdfParseError):
        pdf_to_pdf_chars_payloads(odd)


# ---------------------------------------------------------------------------------
# MacRomanEncoding + Type3 /FontMatrix (round-5 session-4 surface)
# ---------------------------------------------------------------------------------


def test_macroman_encoding_decodes_high_bytes():
    """/MacRomanEncoding bytes >=0x80 decode via the Annex-D table, not
    Latin-1 (0x8E is e-acute in MacRoman, a control char in Latin-1)."""
    content = b"BT /F1 12 Tf 72 720 Td (caf\x8e " + PAD2.encode() + b") Tj ET"
    pdf = make_pdf([content]).replace(
        b"/BaseFont /Courier >>", b"/BaseFont /Courier /Encoding /MacRomanEncoding >>")
    texts = _extract_texts(pdf)
    assert texts[0].startswith("café ")


def test_macroman_via_encoding_dict_with_differences_override():
    """/BaseEncoding /MacRomanEncoding inside an /Encoding dict binds, and
    /Differences still take precedence over the base table."""
    content = b"BT /F1 12 Tf 72 720 Td (caf\x8e \x80" + PAD2.encode() + b") Tj ET"
    pdf = make_pdf([content]).replace(
        b"/BaseFont /Courier >>",
        b"/BaseFont /Courier /Encoding << /BaseEncoding /MacRomanEncoding"
        b" /Differences [128 /Z] >> >>")
    texts = _extract_texts(pdf)
    # 0x8E -> e-acute from the base table; 0x80 -> Z from /Differences
    assert texts[0].startswith("café Z")


def test_macroman_currency_not_euro_at_0xdb():
    """PDF Annex D keeps 0xDB as CURRENCY SIGN; the post-OS-8.5 codec table
    (euro) must not leak through."""
    content = b"BT /F1 12 Tf 72 720 Td (\xdb " + PAD2.encode() + b") Tj ET"
    pdf = make_pdf([content]).replace(
        b"/BaseFont /Courier >>", b"/BaseFont /Courier /Encoding /MacRomanEncoding >>")
    assert _extract_texts(pdf)[0].startswith("¤ ")


def test_type3_fontmatrix_scales_glyph_space_widths():
    """Type3 /Widths are in glyph space (spec 9.6.5): with /FontMatrix
    [0.01 ...] a width of 30 spans the same text-space advance as a standard
    font's 300 — OCR postprocessors emit exactly this bitmap-font shape."""
    pdf = make_pdf([b"BT /F1 10 Tf 0 700 Td (AB) Tj ET"])
    pdf = pdf.replace(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
        b"<< /Type /Font /Subtype /Type3 /FontMatrix [0.01 0 0 0.01 0 0]"
        b" /FontBBox [0 0 100 100]"
        b" /Encoding << /Differences [65 /A 66 /B] >>"
        b" /FirstChar 65 /Widths [30 70] >>")
    payload = pdf_to_pdf_chars_payloads(pdf)[0]
    lines = [ln.split("\t") for ln in payload.split("\n")[1:]]
    assert [int(ln[0], 16) for ln in lines[:2]] == [ord("A"), ord("B")]
    assert float(lines[0][3]) == 3.0 and float(lines[1][3]) == 10.0


# ---------------------------------------------------------------------------------
# ToUnicode UTF-16BE destinations: ligature expansion, surrogate pairs,
# multi-unit bfrange increment, map-to-nothing; embedded CMap /Encoding
# sentinels (round-5 self-audit — pdfium decodes all of these via its own
# CMap machinery, main.py:161)
# ---------------------------------------------------------------------------------


def _tounicode_objs(content: bytes, cmap_body: bytes) -> dict[int, bytes]:
    objs = basic_objs(content)
    objs[5] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /GHIJKL+Subset "
               b"/ToUnicode 6 0 R >>")
    objs[6] = (b"<< /Length " + str(len(cmap_body)).encode() + b" >>\nstream\n"
               + cmap_body + b"\nendstream")
    return objs


def test_tounicode_ligature_expands_to_all_chars():
    """A multi-unit bfchar destination — the fi/ffi ligature glyphs every
    pdftex document carries — must contribute EVERY character, not just the
    first UTF-16 unit (which silently turned 'office' into 'ofce')."""
    cmap = b"1 beginbfchar\n<01> <006600660069>\nendbfchar"  # 01 -> 'ffi'
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"(The o\x01ce requires a su\x01ciently long sentence for the gate.)"
               b" Tj ET")
    text = _extract_texts(build_pdf(_tounicode_objs(content, cmap)))[0]
    assert "office" in text and "sufficiently" in text


def test_tounicode_ligature_boxes_split_the_glyph_advance():
    cmap = b"1 beginbfchar\n<01> <00660069>\nendbfchar"  # 01 -> 'fi'
    content = b"BT /F1 12 Tf 72 720 Td (\x01) Tj ET"
    objs = _tounicode_objs(content, cmap)
    objs[5] = objs[5].replace(
        b"/ToUnicode", b"/FirstChar 1 /Widths [600] /ToUnicode")
    payload = pdf_to_pdf_chars_payloads(build_pdf(objs))[0]
    lines = [ln.split("\t") for ln in payload.split("\n")[1:]]
    assert [int(ln[0], 16) for ln in lines] == [ord("f"), ord("i")]
    # ligature glyph: 600/1000 em at 12pt = 7.2pt, split 3.6 + 3.6, contiguous
    (f_x0, f_x1), (i_x0, i_x1) = [(float(ln[1]), float(ln[3])) for ln in lines]
    assert abs((f_x1 - f_x0) - 3.6) < 1e-6 and abs((i_x1 - i_x0) - 3.6) < 1e-6
    assert abs(i_x0 - f_x1) < 1e-6


def test_tounicode_surrogate_pair_yields_supplementary_char():
    """<D83DDE00> is U+1F600 via UTF-16BE surrogates — one event with the real
    codepoint, never a lone surrogate (which would be invalid UTF-8 at the
    Arrow boundary)."""
    cmap = b"1 beginbfchar\n<02> <D83DDE00>\nendbfchar"
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"(A sentence long enough to clear the searchable gate \x02 here.)"
               b" Tj ET")
    text = _extract_texts(build_pdf(_tounicode_objs(content, cmap)))[0]
    assert chr(0x1F600) in text and "\ud83d" not in text


def test_tounicode_bfrange_increments_last_code_unit():
    """Increment-form bfrange with a multi-unit destination advances the LAST
    UTF-16 code unit: <10>..<12> -> 'ff' 'fg' 'fh'."""
    cmap = b"1 beginbfrange\n<10> <12> <00660066>\nendbfrange"
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"(Gate padding words before the probe codes \x10\x11\x12 end.)"
               b" Tj ET")
    text = _extract_texts(build_pdf(_tounicode_objs(content, cmap)))[0]
    assert "fffgfh" in text


def test_tounicode_empty_target_maps_to_nothing():
    """<03> <> is a map-to-nothing (soft hyphen glyphs): no char event, but
    the glyph still advances — neighbours keep their positions."""
    cmap = b"1 beginbfchar\n<03> <>\nendbfchar"
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"(A suitably long sentence about hy\x03phen suppression gates.)"
               b" Tj ET")
    text = _extract_texts(build_pdf(_tounicode_objs(content, cmap)))[0]
    assert "hyphen" in text and "\x03" not in text


def test_tounicode_malformed_utf16_never_emits_lone_surrogate():
    """A destination that is a LONE surrogate must degrade to U+FFFD (pdfium
    tolerance), not crash and not leak invalid UTF-8 downstream."""
    cmap = b"1 beginbfchar\n<04> <D83D>\nendbfchar"
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"(Another sentence long enough for the gate mark \x04 done.)"
               b" Tj ET")
    text = _extract_texts(build_pdf(_tounicode_objs(content, cmap)))[0]
    assert "�" in text and "\ud83d" not in text
    text.encode("utf-8")  # must be valid UTF-8 end-to-end


def test_type0_embedded_cmap_encoding_sentinels_not_mojibake():
    """A Type0 font whose /Encoding is an indirect ref to an EMBEDDED CMap
    stream must sentinel the page — decoding its codes as Identity-H would be
    silent mojibake (wrong code widths, wrong CIDs)."""
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <00> <ff> endcodespacerange\n"
            b"1 begincidrange <00> <ff> 100 endcidrange\nend")
    content = b"BT /F1 12 Tf 72 720 Td <0001> Tj ET"
    objs = basic_objs(content)
    objs[5] = (b"<< /Type /Font /Subtype /Type0 /BaseFont /Emb "
               b"/Encoding 7 0 R /DescendantFonts [6 0 R] >>")
    objs[6] = b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Emb /DW 600 >>"
    objs[7] = (b"<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
               + cmap + b"\nendstream")
    (payload, n_ev, _n_img, _imgs), = pdf_to_page_records(build_pdf(objs))
    assert payload is None and n_ev == 0  # page-scoped sentinel, not garbage


def test_bfrange_array_form_does_not_leak_increment_mappings():
    """Review regression: the destination list of an array-form bfrange
    (<d0> <d1> <d2>) must not ALSO match the <lo> <hi> <dst> increment
    pattern — that installed spurious mappings for charcodes the CMap never
    defined (0x41 -> 'C')."""
    from pdf_extract_sys_spark.sources.pdf_bytes import _parse_tounicode

    out = _parse_tounicode(
        b"1 beginbfrange\n<01> <03> [<0041> <0042> <0043>]\nendbfrange"
    )
    assert out == {1: "A", 2: "B", 3: "C"}
    # adjacent array-form entries must not fuse into a false triple either
    out2 = _parse_tounicode(
        b"2 beginbfrange\n<01> <02> [<0041> <0042>]\n"
        b"<05> <06> [<0058> <0059>]\nendbfrange"
    )
    assert out2 == {1: "A", 2: "B", 5: "X", 6: "Y"}


def test_differences_surrogate_glyph_name_is_dropped_not_crash():
    """Review regression: /Differences [65 /uniD800] must not push a lone
    surrogate into char events (utf-32 span decode would raise outside the
    sentinel machinery) — the mapping is dropped, the byte decodes as itself."""
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"(A sentence long enough to pass the searchable gate fine.) Tj ET")
    objs = basic_objs(content)
    objs[5] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier "
               b"/Encoding << /Differences [65 /uniD800] >> >>")
    text = _extract_texts(build_pdf(objs))[0]
    assert text.startswith("A sentence") and "\ud800" not in text
    text.encode("utf-8")


# ---------------------------------------------------------------------------------
# media payload extraction (round-5 session 5): pdfimages semantics
# ---------------------------------------------------------------------------------


def test_media_payload_roundtrips_jpeg_through_pdf():
    """The worklist PDF's /DCTDecode image extracts as its exact JPEG
    bitstream (trailing codec filter stripped, not decoded), and that
    bitstream decodes back to the flat source image."""
    import numpy as np

    from pdf_extract_sys_spark.functions.jpeg import decode_baseline_jpeg
    from pdf_extract_sys_spark.queries import _serialize_worklist_pdf, _worklist_jpeg

    pdf = _serialize_worklist_pdf(9, LONG1)  # %9==0: two image pages
    recs = pdf_to_page_records(pdf, media_payloads=True)
    assert [r[3] for r in recs][0] == ()  # text page paints nothing
    for _p, _n, _i, images in recs[1:]:
        assert len(images) == 1
        nm, pay, codec = images[0]
        assert nm == "Im1" and codec == "DCTDecode"
        assert pay == _worklist_jpeg()
        img = decode_baseline_jpeg(pay)
        assert img is not None and img.shape[:2] == (8, 8)
        assert int(img.min()) == int(img.max()) == 127


def test_media_payload_strips_only_trailing_codec():
    """A Flate-wrapped DCT image ( /Filter [/FlateDecode /DCTDecode] ) must
    apply the transport filter and strip the codec: payload = the inner JPEG
    bytes, codec = 'DCTDecode'."""
    import zlib

    from pdf_extract_sys_spark.queries import _worklist_jpeg
    from pdf_extract_sys_spark.sources.pdf_bytes import _media_payload

    jp = _worklist_jpeg()
    wrapped = zlib.compress(jp)
    body = (
        b"<< /Subtype /Image /Width 8 /Height 8"
        b" /Filter [/FlateDecode /DCTDecode] /Length %d >>\nstream\n"
        % len(wrapped) + wrapped + b"\nendstream"
    )
    pay, codec = _media_payload(body, {})
    assert pay == jp and codec == "DCTDecode"


def test_fuzz_media_payload_resolution_total():
    """Payload resolution (media_payloads=True) under mutation must stay
    TOTAL: any failure inside filter decoding degrades to payload None (or a
    page/doc-scoped PdfParseError) — never an unexpected exception type."""
    import random
    import zlib as _zlib

    from pdf_extract_sys_spark.queries import _serialize_worklist_pdf

    rng = random.Random(20260819)
    base = _serialize_worklist_pdf(9, LONG1)  # two /DCTDecode image pages
    for _ in range(120):
        b = bytearray(base)
        for _m in range(rng.randrange(1, 12)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            pdf_to_page_records(bytes(b), media_payloads=True)
        except (PdfParseError, _zlib.error):
            pass  # expected failure modes; anything else propagates and fails
