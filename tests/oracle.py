"""Pure-Python oracle: a direct transcription of the reference extractor's loops.

Transcribes ``/root/reference/backend/app/main.py`` (untrusted public content,
studied for behavior only):

  * ``extract_page_text``  (main.py:404-490)  — per-char sentence segmentation
  * ``is_searchable_pdf``  (main.py:57-66)    — the text-vs-OCR classifier
  * ``process_page_with_optimized_ocr`` grouping loop (main.py:666-724)

plus the FIXTURES.md payload decodings, the html text-density heuristic (no
reference code exists; this is an independent per-doc re-implementation of the
pinned rules in kernels/html.py), media passthrough, the garbage sentinel
(main.py:361-372, 731-735), and final reading-order offsets.

Deliberately slow, row-at-a-time Python — clarity over speed. Golden outputs for
the pytest fixtures are computed from THIS module; the Spark pipeline is then
asserted equal to the goldens (span-sequence equality on (kind, text, media_ref,
order) — the north-rule invariant).

Divergence from the reference (documented in SURVEY.md §2.2 quirks): the decimal
lookahead ``full_text[index + 1]`` at main.py:436 is unguarded and would raise
IndexError at end-of-text; here out-of-range lookahead means "not a digit".
"""

from __future__ import annotations

import re

SENTENCE_ENDERS = {".", "!", "?"}
EMAIL_DOMAINS = {"com", "org", "edu"}


# ----------------------------------------------------------------------------
# payload decoding (FIXTURES.md encodings)
# ----------------------------------------------------------------------------

def decode_pdf_payload(payload: str):
    """→ (page_w, page_h, chars: list[str], boxes: list[tuple|None]). Raises on
    malformed payloads (callers convert to the sentinel)."""
    lines = payload.split("\n")
    m = re.match(r"^PAGE\t(\d+(?:\.\d+)?)\t(\d+(?:\.\d+)?)$", lines[0])
    if not m:
        raise ValueError("bad header")
    page_w, page_h = float(m.group(1)), float(m.group(2))
    chars, boxes = [], []
    for ln in lines[1:]:
        if ln == "":
            continue
        parts = ln.split("\t")
        if len(parts) == 2 and parts[1] == "-":
            if not re.fullmatch(r"[0-9a-fA-F]{1,8}", parts[0]):
                raise ValueError("bad record")
            chars.append(chr(int(parts[0], 16)))
            boxes.append(None)
        elif len(parts) == 5:
            if not re.fullmatch(r"[0-9a-fA-F]{1,8}", parts[0]):
                raise ValueError("bad record")
            chars.append(chr(int(parts[0], 16)))
            boxes.append(tuple(float(p) for p in parts[1:]))
        else:
            raise ValueError("bad record")
    return page_w, page_h, chars, boxes


def decode_ocr_payload(payload: str):
    """→ (img_w, img_h, events: list[dict]) mirroring Tesseract image_to_data."""
    lines = payload.split("\n")
    m = re.match(r"^PAGE\t(\d+(?:\.\d+)?)\t(\d+(?:\.\d+)?)$", lines[0])
    if not m:
        raise ValueError("bad header")
    img_w, img_h = float(m.group(1)), float(m.group(2))
    events = []
    for ln in lines[1:]:
        if ln == "":
            continue
        parts = ln.split("\t")
        if len(parts) != 8:
            raise ValueError("bad record")
        events.append(
            {
                "text": parts[0],
                "conf": float(parts[1]),
                "left": float(parts[2]),
                "top": float(parts[3]),
                "width": float(parts[4]),
                "height": float(parts[5]),
                "block_num": int(parts[6]),
                "line_num": int(parts[7]),
            }
        )
    return img_w, img_h, events


# ----------------------------------------------------------------------------
# native-text path — transcription of extract_page_text (main.py:404-490)
# ----------------------------------------------------------------------------

def extract_page_text_oracle(page_w, page_h, chars, boxes):
    page_results = []
    full_text = "".join(chars)
    sentence_chars = []
    current_sentence = ""

    for index, char in enumerate(full_text):
        bbox = boxes[index]
        if not bbox:  # main.py:418-422 — skipped from text AND envelope
            continue

        bbox_normalized = [  # main.py:425-430 (y-flip)
            (bbox[0] / page_w) * 100,
            ((page_h - bbox[3]) / page_h) * 100,
            (bbox[2] / page_w) * 100,
            ((page_h - bbox[1]) / page_h) * 100,
        ]

        sentence_chars.append((char, bbox_normalized))
        current_sentence += char

        # main.py:436 — decimal (guarded lookahead; see module docstring)
        if (
            char == "."
            and len(current_sentence) >= 2
            and current_sentence[-2].isdigit()
            and index + 1 < len(full_text)
            and full_text[index + 1].isdigit()
        ):
            continue
        # main.py:439 — ellipsis neighbors
        if char == "." and (
            (index + 1 < len(full_text) and full_text[index + 1] == ".")
            or (index > 0 and full_text[index - 1] == ".")
        ):
            continue
        # main.py:441 — spaced ellipsis
        if char == "." and (
            (index + 3 < len(full_text) and full_text[index + 1 : index + 3] == " .")
            or (index > 1 and full_text[index - 2 : index] == ". ")
        ):
            continue
        # main.py:444 — email TLD
        if char == "." and (full_text[index + 1 : index + 4] in EMAIL_DOMAINS):
            continue
        # main.py:447 — url
        if char == "." and index > 3 and current_sentence[-4:].lower() == "www.":
            continue

        if char in SENTENCE_ENDERS or char == "\n" or char == "￾":  # main.py:451
            if current_sentence.strip():
                while sentence_chars and sentence_chars[0][0] in {"\r", "\n", " "}:
                    sentence_chars.pop(0)
                while sentence_chars and sentence_chars[-1][0] in {"\r", "\n", " "}:
                    sentence_chars.pop()
                sentence_bbox = [
                    min(b[0] for _, b in sentence_chars),
                    min(b[1] for _, b in sentence_chars),
                    max(b[2] for _, b in sentence_chars),
                    max(b[3] for _, b in sentence_chars),
                ]
                page_results.append(
                    {"text": current_sentence.strip(), "bbox": sentence_bbox}
                )
                current_sentence = ""
                sentence_chars = []

    if current_sentence.strip():  # main.py:476-488 — tail flush
        while sentence_chars and sentence_chars[0][0] in {"\r", "\n", " "}:
            sentence_chars.pop(0)
        while sentence_chars and sentence_chars[-1][0] in {"\r", "\n", " "}:
            sentence_chars.pop()
        sentence_bbox = [
            min(b[0] for _, b in sentence_chars),
            min(b[1] for _, b in sentence_chars),
            max(b[2] for _, b in sentence_chars),
            max(b[3] for _, b in sentence_chars),
        ]
        page_results.append({"text": current_sentence.strip(), "bbox": sentence_bbox})

    return page_results


# ----------------------------------------------------------------------------
# OCR path — transcription of the grouping loop (main.py:666-724)
# ----------------------------------------------------------------------------

def ocr_group_oracle(img_w, img_h, events):
    lines = []
    current_line = ""
    current_line_bbox = [100, 100, 0, 0]
    n = len(events)

    for i in range(n):
        if events[i]["conf"] < 30 or not events[i]["text"].strip():  # main.py:673
            continue

        word = events[i]["text"]
        x, y = events[i]["left"], events[i]["top"]
        w, h = events[i]["width"], events[i]["height"]

        x_norm = (x / img_w) * 100  # main.py:687-691 (no y-flip)
        y_norm = (y / img_h) * 100
        right_norm = ((x + w) / img_w) * 100
        bottom_norm = ((y + h) / img_h) * 100

        if current_line:  # main.py:694-703
            current_line += " "
            current_line_bbox[0] = min(current_line_bbox[0], x_norm)
            current_line_bbox[1] = min(current_line_bbox[1], y_norm)
            current_line_bbox[2] = max(current_line_bbox[2], right_norm)
            current_line_bbox[3] = max(current_line_bbox[3], bottom_norm)
        else:
            current_line_bbox = [x_norm, y_norm, right_norm, bottom_norm]

        current_line += word

        # main.py:708 — raw-array lookahead, self-clamped at the last index
        next_line_num = events[i + 1]["line_num"] if i + 1 < n else events[i]["line_num"]
        if (
            word.endswith(tuple(SENTENCE_ENDERS))
            or events[i]["conf"] < 50
            or events[i]["line_num"] != next_line_num
        ):
            if current_line.strip():
                lines.append({"text": current_line.strip(), "bbox": current_line_bbox})
                current_line = ""
                current_line_bbox = [100, 100, 0, 0]

    if current_line.strip():  # main.py:719-724
        lines.append({"text": current_line.strip(), "bbox": current_line_bbox})

    return lines


# ----------------------------------------------------------------------------
# html path — independent per-doc implementation of the pinned heuristic
# ----------------------------------------------------------------------------

MIN_TEXT_LEN = 25
MAX_LINK_DENSITY = 0.34

_BLOCK_TAGS = (
    "p|div|li|ul|ol|h[1-6]|br|tr|td|th|table|section|article|aside|nav|footer|"
    "header|main|blockquote|pre|form|hr|figure|figcaption"
)


def extract_html_oracle(payload: str):
    s = re.sub(r"(?is)<script\b.*?</script\s*>", " ", payload)
    s = re.sub(r"(?is)<style\b.*?</style\s*>", " ", s)
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(
        r"""(?is)<img\b[^>]*?\bsrc\s*=\s*["']?([^"'\s>]+)["']?[^>]*>""",
        "\n\x00IMG\x1f\\1\n",
        s,
    )
    s = re.sub(r"(?is)<a\b[^>]*>", "\x01", s)
    s = re.sub(r"(?is)</a\s*>", "\x01", s)
    s = re.sub(rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*>", "\n", s)
    s = re.sub(r"(?s)<[^>]*>", "", s)
    for ent, rep in [
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),
    ]:
        s = s.replace(ent, rep)

    out = []
    for raw in s.split("\n"):
        line = raw.strip()
        if line.startswith("\x00IMG\x1f"):
            out.append(("media", None, line[len("\x00IMG\x1f"):]))
            continue
        visible = line.replace("\x01", "")
        vis_len = len(visible.strip())
        link_len = sum(len(m) for m in re.findall("\x01([^\x01]*)\x01", line))
        if vis_len >= MIN_TEXT_LEN and link_len <= MAX_LINK_DENSITY * max(vis_len, 1):
            out.append(("text", re.sub(r"\s+", " ", visible).strip(), None))
    return out


# ----------------------------------------------------------------------------
# whole-doc oracle: classifier + routing + ordering + sentinel
# ----------------------------------------------------------------------------

INPUT_KINDS = {"pdf_chars", "ocr_words", "html", "media"}
SEARCHABLE_THRESHOLD = 50  # main.py:64


def oracle_extract_doc(doc_id: str, spans: list[dict]) -> list[dict]:
    """→ output span dicts (kind, text, media_ref, offset) in reading order.
    Returns the single error sentinel on any decode failure (sentinel totality)."""
    try:
        ordered = sorted(spans, key=lambda s: s["offset"])
        for s in ordered:
            if s["kind"] not in INPUT_KINDS:
                raise ValueError("unknown kind")
            if s["kind"] in {"pdf_chars", "ocr_words", "html"} and s["text"] is None:
                raise ValueError("null payload")
            if s["kind"] == "media" and s["media_ref"] is None:
                raise ValueError("null media_ref")

        # decode pdf pages; classifier = ANY page stripped len > 50 (main.py:57-66)
        pdf_pages = {}
        for s in ordered:
            if s["kind"] == "pdf_chars":
                pdf_pages[s["offset"]] = decode_pdf_payload(s["text"])
        searchable = any(
            len("".join(chars).strip()) > SEARCHABLE_THRESHOLD
            for (_, _, chars, _) in pdf_pages.values()
        )

        out = []
        for s in ordered:
            if s["kind"] == "pdf_chars":
                if searchable:
                    pw, ph, chars, boxes = pdf_pages[s["offset"]]
                    for r in extract_page_text_oracle(pw, ph, chars, boxes):
                        out.append(("text", r["text"], None))
            elif s["kind"] == "ocr_words":
                if not searchable:
                    iw, ih, events = decode_ocr_payload(s["text"])
                    for r in ocr_group_oracle(iw, ih, events):
                        out.append(("text", r["text"], None))
            elif s["kind"] == "html":
                out.extend(extract_html_oracle(s["text"]))
            elif s["kind"] == "media":
                out.append(("media", s["text"], s["media_ref"]))

        return [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(out)
        ]
    except Exception:
        return [
            {
                "kind": "error",
                "text": f"[Error processing doc {doc_id}]",
                "media_ref": None,
                "offset": 0,
            }
        ]


def oracle_extract_corpus(corpus_rows) -> dict[str, list[dict]]:
    """corpus rows (dicts with doc_id, spans) → {doc_id: output spans}."""
    return {r["doc_id"]: oracle_extract_doc(r["doc_id"], r["spans"]) for r in corpus_rows}
