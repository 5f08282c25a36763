"""Real-PDF-bytes front-end: PDF files → `pdf_chars` char-event spans.

The reference opens raw PDF bytes with pdfium and walks per-char text + charbox
(``backend/app/main.py:157-164`` parse/validate, ``main.py:404-422`` char scan).
The engine's kernels consume the FIXTURES.md `pdf_chars` encoding instead (one
span per page, records ``hex8\\tx0\\ty0\\tx1\\ty1`` in PDF points, header
``PAGE\\tw\\th``); this module closes the gap for users holding actual PDF bytes
by implementing the decode step from the PUBLIC PDF 1.x spec — no pdfium, no
external libraries (FlateDecode is stdlib zlib).

Supported surface (documented, honest):
  * object scanning without xref (tolerant of linearized/append-updated files);
  * /Type /Page objects, /MediaBox inherited from /Pages when absent;
  * /Contents streams, direct or via reference, plain or /FlateDecode;
  * text operators: BT/ET, Tf, Td, TD, TL, T*, Tm, Tj, TJ (with kerning
    adjustments), ' (next-line-show); () strings with escapes and <> hex strings;
  * char advance from a built-in width table: the 14 standard fonts' metrics are
    public (Courier fixed 600/1000; Helvetica/Times default via average width).
    Embedded-font /Widths arrays are honored when present on the font dict.

Out of scope (the marked seam, mirroring the multimodal codec stub): CID/Type0
composite fonts, encodings beyond Latin-1/WinAnsi byte strings, rotation
matrices with shear (only translation + uniform scale of Tm are applied to
positions). A PDF outside this surface degrades per doc to the standard error
sentinel — the job never aborts (sentinel contract, main.py:361-372).

Spark integration: ``pdf_binary_to_corpus`` maps a (doc_id, pdf binary) frame to
the corpus schema via mapInPandas (Arrow-batched; per-blob parsing is inherent
to binary decode, exactly like the media featureizer) — downstream extraction is
the unchanged shuffle-free kernel path.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------------
# low-level object model
# ---------------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\s*endstream", re.S)
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[([^\]]*)\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_WIDTHS_RE = re.compile(rb"/Widths\s*\[([^\]]*)\]")
_FIRSTCHAR_RE = re.compile(rb"/FirstChar\s+(\d+)")
_BASEFONT_RE = re.compile(rb"/BaseFont\s*/([A-Za-z0-9+#._-]+)")
_FONTREF_RE = re.compile(rb"/(F[\w]*|TT[\w]*)\s+(\d+)\s+\d+\s+R")

# public Courier metric: every glyph 600/1000 em. Other standard-14 faces get a
# flat average (spacing fidelity is only needed for x-ordering, which a constant
# width preserves; exact AFM tables are the documented refinement seam).
_FIXED_WIDTHS = {b"Courier": 600}
_DEFAULT_WIDTH = 500


class PdfParseError(ValueError):
    pass


def _box_floats(m: re.Match) -> tuple[float, float, float, float]:
    try:
        return tuple(float(m.group(i)) for i in range(1, 5))
    except ValueError as e:  # the loose char class admits e.g. '+-+'
        raise PdfParseError("malformed /MediaBox") from e


def _objects(data: bytes) -> dict[int, bytes]:
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(2)
    if not objs:
        raise PdfParseError("no PDF objects found")
    return objs


def _stream_data(body: bytes) -> bytes:
    m = re.search(rb"stream\r?\n", body)
    if not m:
        raise PdfParseError("object has no stream")
    # slice by direct /Length when present (binary stream data may contain
    # bytes that look like the endstream sentinel or trailing whitespace).
    # (?![0-9]) pins the FULL number before the indirect-ref lookahead runs —
    # otherwise backtracking shrinks (\d+) until the lookahead passes and an
    # indirect '/Length 10 0 R' is misread as length 1
    lm = re.search(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)", body)
    if lm:
        raw = body[m.end() : m.end() + int(lm.group(1))]
    else:
        sm = _STREAM_RE.search(body)
        if not sm:
            raise PdfParseError("unterminated stream")
        raw = sm.group(1)
    if b"/FlateDecode" in body:
        try:
            raw = zlib.decompress(raw)
        except zlib.error as e:
            raise PdfParseError("corrupt FlateDecode stream") from e
    elif b"/Filter" in body:
        raise PdfParseError("unsupported stream filter")
    return raw


def _font_widths(objs: dict[int, bytes], page_body: bytes) -> dict[bytes, tuple[int, dict[int, int]]]:
    """font resource name → (default_width, per-charcode widths) in 1/1000 em."""
    out: dict[bytes, tuple[int, dict[int, int]]] = {}
    for m in _FONTREF_RE.finditer(page_body):
        name, ref = m.group(1), int(m.group(2))
        body = objs.get(ref, b"")
        default = _DEFAULT_WIDTH
        bf = _BASEFONT_RE.search(body)
        if bf:
            base = bf.group(1).split(b"+")[-1].split(b"-")[0]
            default = _FIXED_WIDTHS.get(base, _DEFAULT_WIDTH)
        table: dict[int, int] = {}
        wm = _WIDTHS_RE.search(body)
        if wm:
            first = int(_FIRSTCHAR_RE.search(body).group(1)) if _FIRSTCHAR_RE.search(body) else 0
            try:
                vals = [int(float(v)) for v in wm.group(1).split()]
            except ValueError as e:
                raise PdfParseError("non-numeric /Widths entry") from e
            table = {first + i: v for i, v in enumerate(vals)}
        out[b"/" + name] = (default, table)
    return out


# ---------------------------------------------------------------------------------
# content-stream tokenizer
# ---------------------------------------------------------------------------------

_STR_ESCAPES = {
    ord("n"): ord("\n"), ord("r"): ord("\r"), ord("t"): ord("\t"),
    ord("b"): ord("\b"), ord("f"): ord("\f"),
    ord("("): ord("("), ord(")"): ord(")"), ord("\\"): ord("\\"),
}


def _parse_literal_string(s: bytes, i: int) -> tuple[bytes, int]:
    """Parse a (...) string starting at the '('; returns (bytes, index past ')')."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(s)
    while i < n and depth:
        c = s[i]
        if c == ord("\\"):
            i += 1
            if i >= n:
                break
            e = s[i]
            if e in _STR_ESCAPES:
                out.append(_STR_ESCAPES[e])
                i += 1
            elif ord("0") <= e <= ord("7"):
                oct_digits = bytearray()
                while i < n and len(oct_digits) < 3 and ord("0") <= s[i] <= ord("7"):
                    oct_digits.append(s[i])
                    i += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in (ord("\n"), ord("\r")):
                i += 1  # line continuation
            else:
                out.append(e)
                i += 1
        elif c == ord("("):
            depth += 1
            out.append(c)
            i += 1
        elif c == ord(")"):
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


_TOKEN_RE = re.compile(
    rb"/[A-Za-z0-9#._-]+|[+-]?(?:\d+\.\d*|\.\d+|\d+)|\[|\]|<[0-9A-Fa-f\s]*>|[A-Za-z'\"*]+"
)


def _tokenize(stream: bytes):
    """Yield content-stream tokens: floats, names (bytes, leading /), operator
    bytes, literal/hex strings as ('str', bytes), and '[' / ']'."""
    i, n = 0, len(stream)
    while i < n:
        c = stream[i : i + 1]
        if c.isspace():
            i += 1
            continue
        if c == b"(":
            s, i = _parse_literal_string(stream, i)
            yield ("str", s)
            continue
        if c == b"%":  # comment to EOL
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        m = _TOKEN_RE.match(stream, i)
        if not m:
            i += 1
            continue
        t = m.group(0)
        i = m.end()
        if t.startswith(b"<"):
            hx = re.sub(rb"\s", b"", t[1:-1])
            if len(hx) % 2:
                hx += b"0"
            yield ("str", bytes.fromhex(hx.decode("ascii")))
        elif t in (b"[", b"]"):
            yield t.decode()
        elif re.fullmatch(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)", t):
            yield float(t)
        else:
            yield t  # name or operator, as bytes


def _page_char_events(content: bytes, fonts: dict[bytes, tuple[int, dict[int, int]]]):
    """Execute the text-positioning subset of the content stream; yield
    (codepoint, x0, y0, x1, y1) per shown char, in show order (PDF points,
    bottom-left origin — the FIXTURES.md pdf_chars contract)."""
    size = 12.0
    default_w, widths = _DEFAULT_WIDTH, {}
    leading = 0.0
    # text matrix: only translation (e, f) and uniform scale (a) are applied
    tm_a = 1.0
    tm_e = tm_f = 0.0
    lm_e = lm_f = 0.0
    x = y = 0.0
    stack: list = []
    events: list[tuple[int, float, float, float, float]] = []
    in_array = False
    array_items: list = []

    def show(sb: bytes) -> None:
        nonlocal x
        for code in sb:
            w = widths.get(code, default_w) / 1000.0 * size * tm_a
            events.append((code, x, y, x + w, y + size * tm_a))
            x += w

    def newline() -> None:
        nonlocal lm_e, lm_f, x, y
        lm_f -= leading * tm_a
        x, y = lm_e, lm_f

    for tok in _tokenize(content):
        if tok == "[":
            in_array, array_items = True, []
            continue
        if tok == "]":
            in_array = False
            stack.append(array_items)
            continue
        if in_array:
            array_items.append(tok)
            continue
        if isinstance(tok, (float, tuple, list)):
            stack.append(tok)
            continue
        if isinstance(tok, bytes) and tok.startswith(b"/"):
            stack.append(tok)
            continue
        op = tok
        try:
            if op == b"Tf":
                size = float(stack[-1])
                fname = stack[-2]
                default_w, widths = fonts.get(fname, (_DEFAULT_WIDTH, {}))
                stack.clear()
            elif op == b"Td":
                ty, tx = float(stack[-1]), float(stack[-2])
                lm_e += tx * tm_a
                lm_f += ty * tm_a
                x, y = lm_e, lm_f
                stack.clear()
            elif op == b"TD":
                ty, tx = float(stack[-1]), float(stack[-2])
                leading = -ty
                lm_e += tx * tm_a
                lm_f += ty * tm_a
                x, y = lm_e, lm_f
                stack.clear()
            elif op == b"TL":
                leading = float(stack[-1])
                stack.clear()
            elif op == b"Tm":
                f_, e_, _d, _c, _b, a_ = (float(stack[-i]) for i in range(1, 7))
                tm_a = a_ if a_ else 1.0
                tm_e, tm_f = e_, f_
                lm_e, lm_f = tm_e, tm_f
                x, y = lm_e, lm_f
                stack.clear()
            elif op == b"T*":
                newline()
                stack.clear()
            elif op == b"BT":
                tm_a, tm_e, tm_f = 1.0, 0.0, 0.0
                lm_e = lm_f = x = y = 0.0
                stack.clear()
            elif op == b"ET":
                stack.clear()
            elif op == b"Tj":
                kind, sb = stack[-1]
                show(sb)
                stack.clear()
            elif op == b"'":
                newline()
                kind, sb = stack[-1]
                show(sb)
                stack.clear()
            elif op == b"TJ":
                arr = stack[-1]
                for item in arr:
                    if isinstance(item, tuple):
                        show(item[1])
                    else:  # kerning adjustment, thousandths of em
                        x -= float(item) / 1000.0 * size * tm_a
                stack.clear()
            else:
                stack.clear()  # untracked operator consumes its operands
        except (IndexError, TypeError, ValueError) as e:
            raise PdfParseError(f"malformed content stream at {op!r}") from e
    return events


# ---------------------------------------------------------------------------------
# document-level API
# ---------------------------------------------------------------------------------


def pdf_to_pdf_chars_payloads(data: bytes) -> list[str]:
    """PDF bytes → one FIXTURES.md `pdf_chars` payload string per page, in
    document page order. Raises PdfParseError on anything outside the supported
    surface (callers map that to the error sentinel)."""
    if not data.startswith(b"%PDF-"):
        raise PdfParseError("missing %PDF header")
    objs = _objects(data)

    default_box = (0.0, 0.0, 612.0, 792.0)
    for body in objs.values():
        if b"/Type" in body and b"/Pages" in body and b"/Kids" in body:
            m = _MEDIABOX_RE.search(body)
            if m:
                default_box = _box_floats(m)
            break

    pages = []
    for num in sorted(objs):
        body = objs[num]
        if re.search(rb"/Type\s*/Page\b", body) and b"/Kids" not in body:
            pages.append((num, body))
    if not pages:
        raise PdfParseError("no /Type /Page objects")

    payloads = []
    for _num, body in pages:
        m = _MEDIABOX_RE.search(body)
        box = _box_floats(m) if m else default_box
        w, h = box[2] - box[0], box[3] - box[1]
        # /Contents: bare ref, or the common array form [N 0 R M 0 R ...]
        # (streams concatenate). A /Contents key we cannot resolve is an ERROR,
        # never a silent empty page — the contract is sentinel, not data loss.
        am = _CONTENTS_ARR_RE.search(body)
        if am:
            refs = [int(r.group(1)) for r in _REF_RE.finditer(am.group(1))]
            if not refs:
                raise PdfParseError("empty /Contents array")
            content = b"\n".join(_stream_data(objs.get(r, b"")) for r in refs)
        else:
            cm = _CONTENTS_RE.search(body)
            if not cm:
                if b"/Contents" in body:
                    raise PdfParseError("unresolvable /Contents entry")
                payloads.append(f"PAGE\t{w:g}\t{h:g}")
                continue
            content = _stream_data(objs.get(int(cm.group(1)), b""))
        fonts = _font_widths(objs, body)
        events = _page_char_events(content, fonts)
        recs = [f"PAGE\t{w:g}\t{h:g}"]
        for code, x0, y0, x1, y1 in events:
            recs.append(f"{code:08x}\t{x0:g}\t{y0:g}\t{x1:g}\t{y1:g}")
        payloads.append("\n".join(recs))
    return payloads


def pdf_binary_to_corpus(df):
    """Spark front-end: (doc_id string, pdf binary) → corpus (doc_id, spans)
    with kind='pdf_chars' spans, offset = page index. Unparseable docs emit one
    invalid span (text NULL) which the extraction pipeline turns into the
    standard error sentinel. Arrow-batched mapInPandas; zero shuffles."""
    from collections.abc import Iterator

    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            spans_col = []
            for blob in pdf["pdf"]:
                try:
                    payloads = pdf_to_pdf_chars_payloads(bytes(blob))
                    spans_col.append(
                        [
                            {"kind": "pdf_chars", "text": p, "media_ref": None, "offset": i}
                            for i, p in enumerate(payloads)
                        ]
                    )
                except Exception:
                    # untrusted-bytes boundary: ANY decode failure degrades to
                    # the per-doc sentinel (main.py:361-372 catches broadly per
                    # page for the same reason); the job never aborts
                    spans_col.append(
                        [{"kind": "pdf_chars", "text": None, "media_ref": None, "offset": 0}]
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(), "spans": spans_col})

    return df.mapInPandas(
        decode,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
