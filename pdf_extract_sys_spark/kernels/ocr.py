"""OCR-path extraction kernel: word-event streams → line/sentence spans, vectorized.

Reimplements the reference's OCR grouping loop
(``backend/app/main.py:634-735``, ``process_page_with_optimized_ocr``) over
pre-tokenized word events (FIXTURES.md encoding #2 — the north-rule invariant is on
span sequences, not pixels; rasterization/Tesseract are out of scope, SURVEY.md §2 O1).

Semantics reproduced exactly (SURVEY.md §2.2 rules 8-9):
  * words with conf < 30 or blank text are dropped          (main.py:673)
  * kept words joined with a single space                   (main.py:694-705)
  * group closes when the kept word endswith . ! ?, or its conf < 50, or the RAW
    next event's line_num differs (lookahead indexes the raw array INCLUDING
    dropped words; clamps to itself at the last index ⇒ never fires there)
                                                            (main.py:708)
  * trailing group flushed                                  (main.py:719-724)
  * bbox percent-normalized WITHOUT y-flip (origin already top-left); envelope is
    min/min/max/max expansion over member words             (main.py:687-703)
  * an empty event list models a blank page ⇒ zero spans    (main.py:649-650)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .util import group_codes, grouped_cumsum, grouped_shift, repeat_frame

_HEADER_RE = r"^PAGE\t(\d+(?:\.\d+)?)\t(\d+(?:\.\d+)?)$"
# word \t conf \t left \t top \t width \t height \t block \t line  (word: no tabs)
_EVENT_RE = (
    r"^[^\t]*\t-?\d+(?:\.\d+)?\t-?\d+(?:\.\d+)?\t-?\d+(?:\.\d+)?"
    r"\t-?\d+(?:\.\d+)?\t-?\d+(?:\.\d+)?\t-?\d+\t-?\d+$"
)

EMPTY_SPANS = pd.DataFrame(
    {
        "doc_id": pd.Series(dtype=object),
        "page": pd.Series(dtype=np.int64),
        "seq": pd.Series(dtype=np.int64),
        "text": pd.Series(dtype=object),
        "l": pd.Series(dtype=np.float64),
        "t": pd.Series(dtype=np.float64),
        "r": pd.Series(dtype=np.float64),
        "b": pd.Series(dtype=np.float64),
    }
)


def decode_ocr_word_events(pages: pd.DataFrame) -> tuple[pd.DataFrame, pd.Index]:
    """Decode `ocr_words` payloads into a word-event frame.

    pages: (doc_id, page, payload). Returns (events, bad_doc_ids); events columns:
    doc_id, page, idx (raw event index), word, conf, x, y, w, h, block, line,
    img_w, img_h. A header-only payload (blank page) yields zero events.
    """
    if not len(pages):
        return (
            pd.DataFrame(
                columns=[
                    "doc_id", "page", "idx", "word", "conf", "x", "y", "w", "h",
                    "block", "line", "img_w", "img_h",
                ]
            ),
            pd.Index([]),
        )

    pages = pages.reset_index(drop=True)
    lines = pages["payload"].str.split("\n")
    nlines = lines.str.len().to_numpy()
    flat = repeat_frame(pages[["doc_id", "page"]], nlines)
    flat["line_s"] = np.concatenate(lines.to_numpy())
    page_row = np.repeat(np.arange(len(pages)), nlines)
    flat["lineno"] = grouped_cumsum(np.ones(len(flat), np.int64), page_row) - 1

    is_header = flat["lineno"].to_numpy() == 0
    hdr = flat.loc[is_header, "line_s"].str.extract(_HEADER_RE)
    bad_header = hdr[0].isna().to_numpy()

    body_mask = ~is_header & (flat["line_s"].str.len().to_numpy() > 0)
    body = flat.loc[body_mask]
    ok = body["line_s"].str.match(_EVENT_RE).to_numpy() if len(body) else np.empty(0, bool)

    bad_docs = set(flat.loc[is_header, "doc_id"].to_numpy()[bad_header])
    bad_docs.update(body.loc[~ok, "doc_id"].unique())
    bad_idx = pd.Index(sorted(bad_docs))

    good = ~flat["doc_id"].isin(bad_idx).to_numpy()
    hdr_vals = hdr.astype(np.float64, errors="ignore")
    img_w = pd.to_numeric(hdr_vals[0], errors="coerce").to_numpy(np.float64)
    img_h = pd.to_numeric(hdr_vals[1], errors="coerce").to_numpy(np.float64)

    ev = flat.loc[body_mask & good].reset_index(drop=True)
    ev_page_row = page_row[body_mask & good]
    if not len(ev):
        return (
            pd.DataFrame(
                columns=[
                    "doc_id", "page", "idx", "word", "conf", "x", "y", "w", "h",
                    "block", "line", "img_w", "img_h",
                ]
            ),
            bad_idx,
        )

    cols = ev["line_s"].str.split("\t", expand=True)
    events = pd.DataFrame(
        {
            "doc_id": ev["doc_id"].to_numpy(),
            "page": ev["page"].to_numpy(),
            "idx": grouped_cumsum(np.ones(len(ev), np.int64), ev_page_row) - 1,
            "word": cols[0].to_numpy(),
            "conf": pd.to_numeric(cols[1]).to_numpy(np.float64),
            "x": pd.to_numeric(cols[2]).to_numpy(np.float64),
            "y": pd.to_numeric(cols[3]).to_numpy(np.float64),
            "w": pd.to_numeric(cols[4]).to_numpy(np.float64),
            "h": pd.to_numeric(cols[5]).to_numpy(np.float64),
            "block": pd.to_numeric(cols[6]).to_numpy(np.int64),
            "line": pd.to_numeric(cols[7]).to_numpy(np.int64),
            "img_w": img_w[ev_page_row],
            "img_h": img_h[ev_page_row],
        }
    )
    return events, bad_idx


def group_ocr_lines(events: pd.DataFrame) -> pd.DataFrame:
    """Word events → grouped line/sentence spans per (doc_id, page).

    Returns (doc_id, page, seq, text, l, t, r, b). Implements main.py:666-724.
    """
    if not len(events):
        return EMPTY_SPANS.copy()

    ev = events.sort_values(["doc_id", "page", "idx"], kind="stable").reset_index(drop=True)
    pg = group_codes(ev, ["doc_id", "page"])

    # RAW next line_num, self-clamped at the last raw index (main.py:708's
    # `i+1 if i+1 < len else i`) — computed BEFORE the conf/blank filter.
    line = ev["line"].to_numpy()
    next_line = grouped_shift(line, pg, -1, fill=np.int64(-(2**31)))
    at_end = next_line == -(2**31)
    next_line = np.where(at_end, line, next_line)

    conf = ev["conf"].to_numpy()
    word = ev["word"].astype(object)
    kept_mask = (conf >= 30) & (word.str.strip().str.len() > 0).to_numpy()

    k = ev.loc[kept_mask].reset_index(drop=True)
    if not len(k):
        return EMPTY_SPANS.copy()
    kpg = pg[kept_mask]
    kword = k["word"].astype(object)
    kconf = k["conf"].to_numpy()
    knext_line = next_line[kept_mask]
    kline = k["line"].to_numpy()

    ends_sentence = kword.str.endswith((".", "!", "?")).to_numpy()
    is_break = ends_sentence | (kconf < 50) | (kline != knext_line)

    brk_prev = grouped_shift(is_break, kpg, 1, fill=False)
    gid = grouped_cumsum(brk_prev.astype(np.int64), kpg)
    k = k.assign(gid=gid)

    iw = k["img_w"].to_numpy()
    ih = k["img_h"].to_numpy()
    k["nl"] = (k["x"].to_numpy() / iw) * 100.0
    k["nt"] = (k["y"].to_numpy() / ih) * 100.0
    k["nr"] = ((k["x"].to_numpy() + k["w"].to_numpy()) / iw) * 100.0
    k["nb"] = ((k["y"].to_numpy() + k["h"].to_numpy()) / ih) * 100.0

    g = k.groupby(["doc_id", "page", "gid"], sort=True)
    spans = g.agg(
        text=("word", " ".join),
        l=("nl", "min"),
        t=("nt", "min"),
        r=("nr", "max"),
        b=("nb", "max"),
        first_idx=("idx", "min"),
    ).reset_index()
    spans["text"] = spans["text"].str.strip()  # main.py:711 current_line.strip()
    spans = spans.loc[spans["text"].str.len() > 0]  # main.py:709/719 guards
    spans = spans.sort_values(["doc_id", "page", "first_idx"], kind="stable").reset_index(
        drop=True
    )
    spans["seq"] = (
        grouped_cumsum(np.ones(len(spans), np.int64), group_codes(spans, ["doc_id", "page"]))
        - 1
    )
    return spans[["doc_id", "page", "seq", "text", "l", "t", "r", "b"]]
