"""Native-text extraction kernel: char-event streams → sentence spans, fully vectorized.

Reimplements the reference's per-char extraction loop
(``backend/app/main.py:404-490``, ``extract_page_text``) as shifted-mask arithmetic
over pandas/numpy arrays — the "cumsum-of-break-flags" sessionization pattern
(SURVEY.md §2 P1-P6). Semantics reproduced bit-for-bit (SURVEY.md §2.2 rules 1-6, 11):

  * enders ``. ! ?`` plus hard breaks ``\\n`` / ``\\ufffe``      (main.py:378, 451)
  * ``.`` exceptions, first-match-wins:
      decimal   — prev accumulated char isdigit AND next raw char isdigit
                                                               (main.py:436-437)
      ellipsis  — raw neighbor is ``.``; raw ``" ."`` ahead / ``". "`` behind
                                                               (main.py:439-441)
      email     — next 3 raw chars ∈ {com, org, edu}           (main.py:379, 444)
      url       — accumulated tail ``www.`` (case-insens), raw index > 3
                                                               (main.py:447)
  * bbox-less chars skipped from BOTH text and envelope but still occupy a raw
    index for lookahead                                        (main.py:415-422)
  * whitespace-only accumulations are NOT emitted and NOT reset — they merge
    forward into the next non-whitespace sentence              (main.py:452)
  * emitted text is ``.strip()``-ed; envelope excludes leading/trailing
    ``\\r \\n `` chars, then min/min/max/max                   (main.py:454-467)
  * bbox normalized to percent with y-flip                     (main.py:425-430)
  * unterminated tail flushed                                  (main.py:476-488)

Key insight making exact vectorization possible: the two "stateful" lookbehinds
(decimal's ``current_sentence[-2]``, url's ``current_sentence[-4:]``) never straddle a
sentence boundary — digits and ``w`` are not enders, so the chars they inspect are
always in the same sentence as the ``.`` — hence plain grouped shifts over the
kept-char sequence reproduce them exactly (no fixpoint iteration needed).

One deliberate divergence: ``main.py:436`` indexes ``full_text[index+1]`` unguarded and
would raise IndexError on a digit+``.`` at end-of-page (killing the whole request).
Here (and in tests/oracle.py) end-of-page lookahead is treated as "not a digit";
fixtures avoid the case (SURVEY.md §2.2 quirks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .util import (
    group_codes,
    grouped_cummax_bool,
    grouped_cummax_bool_rev,
    grouped_cumsum,
    grouped_shift,
    hex_to_chars,
    repeat_frame,
)

_HEADER_RE = r"^PAGE\t(\d+(?:\.\d+)?)\t(\d+(?:\.\d+)?)$"
_EVENT_RE = (
    r"^[0-9a-fA-F]{1,8}\t(?:-|"
    r"-?\d+(?:\.\d+)?\t-?\d+(?:\.\d+)?\t-?\d+(?:\.\d+)?\t-?\d+(?:\.\d+)?)$"
)

EMPTY_EVENTS = pd.DataFrame(
    {
        "doc_id": pd.Series(dtype=object),
        "page": pd.Series(dtype=np.int64),
        "idx": pd.Series(dtype=np.int64),
        "char": pd.Series(dtype=object),
        "has_bbox": pd.Series(dtype=bool),
        "x0": pd.Series(dtype=np.float64),
        "y0": pd.Series(dtype=np.float64),
        "x1": pd.Series(dtype=np.float64),
        "y1": pd.Series(dtype=np.float64),
        "page_w": pd.Series(dtype=np.float64),
        "page_h": pd.Series(dtype=np.float64),
    }
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


def decode_pdf_char_events(pages: pd.DataFrame) -> tuple[pd.DataFrame, pd.Index]:
    """Decode `pdf_chars` payloads (FIXTURES.md encoding #1) into a char-event frame.

    pages: columns (doc_id, page, payload), one row per pdf_chars span.
    Returns (events, bad_doc_ids):
      events: doc_id, page, idx (raw char index), char, has_bbox, x0..y1 (PDF points,
              y0=bottom / y1=top, bottom-left origin), page_w, page_h.
      bad_doc_ids: docs with any malformed payload (missing/bad header or record) —
              the analogue of pdfium failing to open the document (main.py:157-164).
    """
    if not len(pages):
        return EMPTY_EVENTS.copy(), pd.Index([])

    pages = pages.reset_index(drop=True)
    lines = pages["payload"].str.split("\n")
    nlines = lines.str.len().to_numpy()

    flat = repeat_frame(pages[["doc_id", "page"]], nlines)
    flat["line"] = np.concatenate(lines.to_numpy()) if nlines.sum() else np.empty(0, object)
    flat["lineno"] = grouped_cumsum(
        np.ones(len(flat), dtype=np.int64), np.repeat(np.arange(len(pages)), nlines)
    ) - 1

    is_header = flat["lineno"].to_numpy() == 0
    hdr = flat.loc[is_header, "line"].str.extract(_HEADER_RE)
    bad_header = hdr[0].isna().to_numpy()

    body = flat.loc[~is_header].reset_index(drop=True)
    # blank trailing lines are tolerated (payloads generated with trailing \n)
    nonblank = body["line"].str.len().to_numpy() > 0
    body = body.loc[nonblank].reset_index(drop=True)
    ok = body["line"].str.match(_EVENT_RE).to_numpy() if len(body) else np.empty(0, bool)

    bad_docs = set(flat.loc[is_header, "doc_id"].to_numpy()[bad_header])
    bad_docs.update(body.loc[~ok, "doc_id"].unique())
    # a payload with no header line at all (empty payload) is malformed too
    bad_docs.update(pages.loc[nlines == 0, "doc_id"].unique())
    bad_idx = pd.Index(sorted(bad_docs))

    good_pages = pages.loc[~pages["doc_id"].isin(bad_idx)].reset_index(drop=True)
    if not len(good_pages):
        return EMPTY_EVENTS.copy(), bad_idx

    # re-split only the good pages (cheap: split result reused via mask)
    keep_mask = ~pages["doc_id"].isin(bad_idx).to_numpy()
    lines = lines[keep_mask].reset_index(drop=True)
    nlines = lines.str.len().to_numpy()
    flat = repeat_frame(good_pages[["doc_id", "page"]], nlines)
    flat["line"] = np.concatenate(lines.to_numpy())
    page_row = np.repeat(np.arange(len(good_pages)), nlines)
    flat["lineno"] = grouped_cumsum(np.ones(len(flat), np.int64), page_row) - 1

    hdr_rows = flat["lineno"].to_numpy() == 0
    hdr = flat.loc[hdr_rows, "line"].str.extract(_HEADER_RE).astype(np.float64)
    page_w = hdr[0].to_numpy()
    page_h = hdr[1].to_numpy()

    ev = flat.loc[~hdr_rows].reset_index(drop=True)
    ev_page_row = page_row[~hdr_rows]
    blank = ev["line"].str.len().to_numpy() == 0
    ev = ev.loc[~blank].reset_index(drop=True)
    ev_page_row = ev_page_row[~blank]
    if not len(ev):
        return EMPTY_EVENTS.copy(), bad_idx

    cols = ev["line"].str.split("\t", expand=True)
    if cols.shape[1] < 5:
        for i in range(cols.shape[1], 5):
            cols[i] = None
    has_bbox = (cols[1] != "-").to_numpy()

    events = pd.DataFrame(
        {
            "doc_id": ev["doc_id"].to_numpy(),
            "page": ev["page"].to_numpy(),
            "idx": grouped_cumsum(np.ones(len(ev), np.int64), ev_page_row) - 1,
            "char": hex_to_chars(cols[0].str.zfill(8)),
            "has_bbox": has_bbox,
            "x0": pd.to_numeric(cols[1].where(has_bbox)).to_numpy(np.float64),
            "y0": pd.to_numeric(cols[2].where(has_bbox)).to_numpy(np.float64),
            "x1": pd.to_numeric(cols[3].where(has_bbox)).to_numpy(np.float64),
            "y1": pd.to_numeric(cols[4].where(has_bbox)).to_numpy(np.float64),
            "page_w": page_w[ev_page_row],
            "page_h": page_h[ev_page_row],
        }
    )
    return events, bad_idx


def payload_stripped_lengths(payloads: pd.Series) -> pd.Series:
    """Per-payload ``len(full_text.strip())`` (the searchable-classifier input,
    main.py:62-64); -1 for malformed payloads. Used by the salted mega-doc path to
    pre-compute doc routing. Vectorized over the whole Arrow batch."""
    idx = pd.RangeIndex(len(payloads))
    frame = pd.DataFrame({"doc_id": idx.astype(np.int64), "page": 0, "payload": payloads.to_numpy(dtype=object)})
    events, bad = decode_pdf_char_events(frame)
    out = pd.Series(np.zeros(len(payloads), dtype=np.int64), index=idx)
    if len(events):
        lens = page_text_lengths(events).set_index("doc_id")["stripped_len"]
        out.loc[lens.index] = lens.to_numpy()
    if len(bad):
        out.loc[list(bad)] = -1
    return out


def page_text_lengths(events: pd.DataFrame) -> pd.DataFrame:
    """len(full_text.strip()) per (doc_id, page) — feeds the searchable classifier
    (main.py:57-66: ANY page with stripped text length > 50 ⇒ searchable).
    full_text includes bbox-less chars (it is the raw get_text_range string)."""
    if not len(events):
        return pd.DataFrame({"doc_id": [], "page": [], "stripped_len": []})
    g = events.groupby(["doc_id", "page"], sort=False)["char"]
    txt = g.agg("".join)
    out = txt.str.strip().str.len().rename("stripped_len").reset_index()
    return out


def segment_sentences(events: pd.DataFrame) -> pd.DataFrame:
    """Char events → sentence spans per (doc_id, page). Returns EMPTY_SPANS-shaped
    frame: (doc_id, page, seq, text, l, t, r, b), seq = within-page emit order.

    Implements main.py:413-488 exactly — see module docstring for the rule map.
    """
    if not len(events):
        return EMPTY_SPANS.copy()

    ev = events.sort_values(["doc_id", "page", "idx"], kind="stable").reset_index(drop=True)
    pg = group_codes(ev, ["doc_id", "page"])
    ch = ev["char"].to_numpy(dtype="<U1")
    idx = ev["idx"].to_numpy()

    # --- raw-sequence lookarounds (full_text indexing: main.py:436-444) ---
    nxt1 = grouped_shift(ch, pg, -1, fill="")
    nxt2 = grouped_shift(ch, pg, -2, fill="")
    nxt3 = grouped_shift(ch, pg, -3, fill="")
    prv1 = grouped_shift(ch, pg, 1, fill="")
    prv2 = grouped_shift(ch, pg, 2, fill="")
    raw_digit = pd.Series(ch).str.isdigit().to_numpy()  # str.isdigit, as the reference
    nxt1_digit = grouped_shift(raw_digit, pg, -1, fill=False)

    # --- kept-char (bbox-having) subsequence: main.py:421-422 skip rule ---
    kept = ev["has_bbox"].to_numpy()
    k = ev.loc[kept].reset_index(drop=True)
    if not len(k):
        return EMPTY_SPANS.copy()
    kpg = pg[kept]
    kch = ch[kept]
    kdigit = raw_digit[kept]
    prev_kept1 = grouped_shift(kch, kpg, 1, fill="")
    prev_kept1_digit = grouped_shift(kdigit, kpg, 1, fill=False)
    prev_kept2 = grouped_shift(kch, kpg, 2, fill="")
    prev_kept3 = grouped_shift(kch, kpg, 3, fill="")

    is_dot = kch == "."
    # decimal (main.py:436): current_sentence[-2].isdigit() and full_text[index+1].isdigit()
    # — current_sentence[-2] ≡ prev kept char (digits are never enders, so it cannot
    # belong to a previous sentence; len>=2 guard implied by prev existing).
    exc_decimal = is_dot & prev_kept1_digit & nxt1_digit[kept]
    # ellipsis neighbors (main.py:439)
    exc_ell1 = is_dot & ((nxt1[kept] == ".") | (prv1[kept] == "."))
    # spaced ellipsis (main.py:441): (index+3<len and raw[i+1:i+3]==" .") or raw[i-2:i]==". "
    exc_ell2 = is_dot & (
        ((nxt3[kept] != "") & (nxt1[kept] == " ") & (nxt2[kept] == "."))
        | ((prv2[kept] == ".") & (prv1[kept] == " "))
    )
    # email TLD (main.py:444): raw[i+1:i+4] in {com,org,edu}
    tri = pd.Series(nxt1[kept]).str.cat([pd.Series(nxt2[kept]), pd.Series(nxt3[kept])])
    exc_email = is_dot & tri.isin(["com", "org", "edu"]).to_numpy()
    # url (main.py:447): index>3 and current_sentence[-4:].lower()=="www."
    low1 = pd.Series(prev_kept1).str.lower().to_numpy()
    low2 = pd.Series(prev_kept2).str.lower().to_numpy()
    low3 = pd.Series(prev_kept3).str.lower().to_numpy()
    exc_url = is_dot & (idx[kept] > 3) & (low1 == "w") & (low2 == "w") & (low3 == "w")

    exception = exc_decimal | exc_ell1 | exc_ell2 | exc_email | exc_url
    is_ender = np.isin(kch, np.array([".", "!", "?", "\n", "￾"], dtype="<U1"))
    is_break = is_ender & ~exception

    # --- sessionize: group = cumsum of breaks shifted by one (break char closes
    # its own group) --- (SURVEY.md §2 P3)
    brk_prev = grouped_shift(is_break, kpg, 1, fill=False)
    gid = grouped_cumsum(brk_prev.astype(np.int64), kpg)

    k = k.assign(gid=gid, char=kch)
    # tentative-group text; whitespace-only groups merge FORWARD (main.py:452:
    # the `if current_sentence.strip()` guard neither emits nor resets).
    grp = (
        k.groupby(["doc_id", "page", "gid"], sort=True)["char"]
        .agg("".join)
        .rename("gtext")
        .reset_index()
    )
    grp["is_ws"] = grp["gtext"].str.strip().str.len() == 0
    grp["target"] = grp["gid"].where(~grp["is_ws"])
    grp["target"] = grp.groupby(["doc_id", "page"], sort=False)["target"].bfill()
    grp = grp.dropna(subset=["target"])  # trailing ws-only groups are dropped (main.py:476 guard)

    k = k.merge(
        grp[["doc_id", "page", "gid", "target"]], on=["doc_id", "page", "gid"], how="inner"
    )
    if not len(k):
        return EMPTY_SPANS.copy()
    k = k.sort_values(["doc_id", "page", "idx"], kind="stable").reset_index(drop=True)
    fg = group_codes(k, ["doc_id", "page", "target"])

    # --- envelope: trim leading/trailing {\r,\n,' '} chars (main.py:454-457),
    # then min/min/max/max over normalized boxes (main.py:459-464) ---
    kc = k["char"].to_numpy(dtype="<U1")
    not_trim = ~np.isin(kc, np.array(["\r", "\n", " "], dtype="<U1"))
    env_keep = grouped_cummax_bool(not_trim, fg) & grouped_cummax_bool_rev(not_trim, fg)

    w = k["page_w"].to_numpy()
    h = k["page_h"].to_numpy()
    k["nl"] = (k["x0"].to_numpy() / w) * 100.0
    k["nt"] = ((h - k["y1"].to_numpy()) / h) * 100.0
    k["nr"] = (k["x1"].to_numpy() / w) * 100.0
    k["nb"] = ((h - k["y0"].to_numpy()) / h) * 100.0

    text = (
        k.groupby(["doc_id", "page", "target"], sort=True)["char"]
        .agg("".join)
        .str.strip()
        .rename("text")
    )
    env = (
        k.loc[env_keep]
        .groupby(["doc_id", "page", "target"], sort=True)
        .agg(l=("nl", "min"), t=("nt", "min"), r=("nr", "max"), b=("nb", "max"))
    )
    first_idx = (
        k.groupby(["doc_id", "page", "target"], sort=True)["idx"].min().rename("first_idx")
    )
    spans = pd.concat([text, env, first_idx], axis=1).reset_index()
    spans = spans.sort_values(["doc_id", "page", "first_idx"], kind="stable").reset_index(
        drop=True
    )
    spans["seq"] = grouped_cumsum(
        np.ones(len(spans), np.int64), group_codes(spans, ["doc_id", "page"])
    ) - 1
    return spans[["doc_id", "page", "seq", "text", "l", "t", "r", "b"]]
