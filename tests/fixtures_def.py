"""Deterministic fixture corpus — one doc per FIXTURES.md case F01-F18 (+extras).

Each case pins one reference rule (citations in FIXTURES.md). Docs that exercise the
native-text path carry a >50-char filler page (offset 99) because the searchable
classifier (main.py:57-66) is doc-level: ANY page with stripped text length > 50
routes the whole doc to native-text rules.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pdf_extract_sys_spark import corpus as C

FILLER = "This filler sentence makes the document searchable indeed."
assert len(FILLER) > 50


def _pdf_doc(doc_id: str, text: str, *, nobbox_every: int = 0, filler: bool = True,
             extra_spans: list | None = None) -> dict:
    chars, boxes = C.layout_text(text, nobbox_every=nobbox_every)
    spans = [C.span("pdf_chars", C.encode_pdf_page(chars, boxes), None, 0)]
    if extra_spans:
        spans.extend(extra_spans)
    if filler:
        spans.append(C.span("pdf_chars", C.encode_pdf_text(FILLER), None, 99))
    return {"doc_id": doc_id, "spans": spans}


def fixture_docs() -> list[dict]:
    docs = [
        # F01 basic segmentation on . ! ?          (main.py:378, 451)
        _pdf_doc("F01", "Hello world. Bye!"),
        # F02 decimal '.' does not break           (main.py:436-437)
        _pdf_doc("F02", "Pi is 3.14 exactly."),
        # F03 ellipsis runs do not break           (main.py:439-441)
        _pdf_doc("F03", "Wait... done. Also . . spaced"),
        # F04 '.' before com/org/edu does not break (main.py:379, 444)
        _pdf_doc("F04", "mail me at a.b@x.com today."),
        # F05 '.' after www. does not break        (main.py:447)
        _pdf_doc("F05", "visit www.example.org now."),
        # F06 \n and ￾ are hard breaks        (main.py:451)
        _pdf_doc("F06", "Line one\nLine two￾Line three"),
        # F07 ws-trim of envelope; ws-only spans dropped (main.py:452-457, 467, 476-480)
        _pdf_doc("F07", "\r\n Hi. \n"),
        # F08 normalization with y-flip + envelope (main.py:425-430, 459-464)
        _pdf_doc("F08", "Box test sentence."),
        # F09 bbox-less char mid-sentence: skipped from text+envelope, still indexes
        #     full_text lookahead                  (main.py:415-422)
        _pdf_doc("F09", "The rate is 3.14 today. Next one.", nobbox_every=5),
        # F10 unterminated tail flush              (main.py:476-488)
        _pdf_doc("F10", "Ends mid sentence and then"),
        # F11 two pages: page order, offsets strictly increasing (main.py:288, 382)
        {
            "doc_id": "F11",
            "spans": [
                C.span("pdf_chars", C.encode_pdf_text("Page zero text first. More here to exceed the threshold."), None, 0),
                C.span("pdf_chars", C.encode_pdf_text("Page one text second. Tail"), None, 1),
            ],
        },
        # F12 OCR conf<30 dropped; single-space join (main.py:673, 694-705)
        {
            "doc_id": "F12",
            "spans": [
                C.span(
                    "ocr_words",
                    C.encode_ocr_page(
                        [
                            ("Hello", 95, 10, 20, 50, 12, 1, 1),
                            ("zz", 25, 70, 20, 20, 12, 1, 1),
                            ("world.", 60, 100, 20, 55, 12, 1, 1),
                        ]
                    ),
                    None,
                    0,
                )
            ],
        },
        # F13 OCR breaks: ender word / conf<50 / line_num change; trailing flush
        #     (main.py:708, 719-724)
        {
            "doc_id": "F13",
            "spans": [
                C.span(
                    "ocr_words",
                    C.encode_ocr_page(
                        [
                            ("one", 95, 10, 20, 30, 12, 1, 1),
                            ("two.", 95, 45, 20, 35, 12, 1, 1),
                            ("three", 45, 85, 20, 40, 12, 1, 1),
                            ("four", 95, 10, 40, 30, 12, 1, 2),
                            ("five", 95, 45, 40, 30, 12, 1, 2),
                        ]
                    ),
                    None,
                    0,
                )
            ],
        },
        # F14 OCR normalization without y-flip; envelope expansion (main.py:687-703)
        {
            "doc_id": "F14",
            "spans": [
                C.span(
                    "ocr_words",
                    C.encode_ocr_page(
                        [("wide", 90, 100, 140, 300, 28, 1, 1), ("words", 90, 420, 140, 200, 28, 1, 1)],
                        img_w=2000.0,
                        img_h=1400.0,
                    ),
                    None,
                    0,
                )
            ],
        },
        # F15 blank page (empty event list) → zero spans (main.py:649-650)
        {
            "doc_id": "F15",
            "spans": [C.span("ocr_words", C.encode_ocr_page([]), None, 0)],
        },
        # F16 html boilerplate strip + media interleave (north_star; pinned here)
        {
            "doc_id": "F16",
            "spans": [
                C.span(
                    "html",
                    '<html><head><style>a{color:red}</style></head><body>'
                    '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>'
                    "<p>This paragraph is long and dense enough to be kept as main content.</p>"
                    '<img src="m1">'
                    "<p>The second paragraph also carries plenty of real sentence text.</p>"
                    '<footer><a href="/tos">Terms of Service</a></footer>'
                    "</body></html>",
                    None,
                    0,
                )
            ],
        },
        # F17 media span re-emitted at its offset position (input_hint interleaving)
        {
            "doc_id": "F17",
            "spans": [
                C.span("pdf_chars", C.encode_pdf_text("First page sentence. Enough text to clear fifty chars."), None, 0),
                C.span("media", "figure one", "fig-1", 1),
                C.span("pdf_chars", C.encode_pdf_text("Second page sentence. Tail"), None, 2),
            ],
        },
        # F18 garbage → single error sentinel (main.py:361-372, 731-735)
        {"doc_id": "F18", "spans": [C.span("pdf_chars", "NOT A VALID STREAM", None, 0)]},
        # extras: unknown kind, null media_ref, empty doc, ocr-routed doc with
        # sparse text layer (classifier routes to OCR)
        {"doc_id": "X01", "spans": [C.span("blob", "\x00\x01", None, 0)]},
        {"doc_id": "X02", "spans": [C.span("media", None, None, 0)]},
        {"doc_id": "X03", "spans": []},
        {
            "doc_id": "X04",
            "spans": [
                C.span("pdf_chars", C.encode_pdf_text("scan"), None, 0),
                C.span(
                    "ocr_words",
                    C.encode_ocr_page([("Scanned", 80, 10, 20, 60, 12, 1, 1), ("text.", 80, 75, 20, 40, 12, 1, 1)]),
                    None,
                    1,
                ),
            ],
        },
    ]
    return docs
