"""HTML main-content extraction: text-density boilerplate stripping, vectorized.

The reference has no HTML path; BASELINE.json's north_star mandates "DOM text-density
boilerplate stripping" for interleaved HTML docs. The heuristic below is a
deterministic line-density rule in the spirit of Kohlschütter et al., "Boilerplate
Detection using Shallow Text Features" (WSDM 2010) — pinned by fixture F16
(FIXTURES.md: there is no reference implementation; the fixture freezes THIS behavior):

  1. drop <script>/<style> elements and <!-- comments -->
  2. each <img ... src=S ...> becomes a standalone MEDIA line carrying S
  3. block-level tags (p, div, li, h1-h6, br, tr, td, section, article, nav, header,
     footer, main, aside, blockquote, pre, table, ul, ol, form, hr) break lines
  4. anchor text is marked so per-line link density can be computed
  5. remaining tags are stripped; basic entities decoded
  6. a text line is MAIN CONTENT iff stripped visible length >= 25 chars AND
     link_density <= 0.34 (link chars / visible chars)
  7. media lines are always emitted (images survive boilerplate stripping), in
     document order, interleaved with kept text lines

All steps are pandas .str regex chains over the document Series — vectorized, no
per-row Python (north-rule hot-path constraint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .util import group_codes, grouped_cumsum, repeat_frame

MIN_TEXT_LEN = 25
MAX_LINK_DENSITY = 0.34

_IMG_MARK = "\x00IMG\x1f"
_A_MARK = "\x01"

_BLOCK_TAGS = (
    "p|div|li|ul|ol|h[1-6]|br|tr|td|th|table|section|article|aside|nav|footer|"
    "header|main|blockquote|pre|form|hr|figure|figcaption"
)

EMPTY_SPANS = pd.DataFrame(
    {
        "doc_id": pd.Series(dtype=object),
        "page": pd.Series(dtype=np.int64),
        "seq": pd.Series(dtype=np.int64),
        "kind": pd.Series(dtype=object),
        "text": pd.Series(dtype=object),
        "media_ref": pd.Series(dtype=object),
    }
)


def extract_html_spans(docs: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, page, payload) — `page` is the input span's offset (a doc may carry
    several html spans) — → (doc_id, page, seq, kind, text, media_ref) with
    kind ∈ {text, media}, seq = order within the payload."""
    if not len(docs):
        return EMPTY_SPANS.copy()

    docs = docs.reset_index(drop=True)
    s = docs["payload"].astype(object)
    # 1. scripts/styles/comments out
    s = s.str.replace(r"(?is)<script\b.*?</script\s*>", " ", regex=True)
    s = s.str.replace(r"(?is)<style\b.*?</style\s*>", " ", regex=True)
    s = s.str.replace(r"(?s)<!--.*?-->", " ", regex=True)
    # 2. img → sentinel line
    s = s.str.replace(
        r"""(?is)<img\b[^>]*?\bsrc\s*=\s*["']?([^"'\s>]+)["']?[^>]*>""",
        "\n" + _IMG_MARK + r"\1\n",
        regex=True,
    )
    # 4. mark anchor spans for link density (before block-splitting so that the
    #    markers stay inside the anchor's line)
    s = s.str.replace(r"(?is)<a\b[^>]*>", _A_MARK, regex=True)
    s = s.str.replace(r"(?is)</a\s*>", _A_MARK, regex=True)
    # 3. block tags → newlines
    s = s.str.replace(rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*>", "\n", regex=True)
    # 5. strip remaining tags; decode a fixed entity set (deterministic)
    s = s.str.replace(r"(?s)<[^>]*>", "", regex=True)
    for ent, rep in [
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),
    ]:
        s = s.str.replace(ent, rep, regex=False)

    lines = s.str.split("\n")
    n = lines.str.len().to_numpy()
    flat = repeat_frame(docs[["doc_id", "page"]], n)
    flat["line"] = np.concatenate(lines.to_numpy()) if n.sum() else np.empty(0, object)
    doc_row = np.repeat(np.arange(len(docs)), n)
    flat["lineno"] = grouped_cumsum(np.ones(len(flat), np.int64), doc_row) - 1

    line = flat["line"].str.strip()
    is_img = line.str.startswith(_IMG_MARK)

    visible = line.str.replace(_A_MARK, "", regex=False)
    vis_len = visible.str.strip().str.len().to_numpy()
    # link chars = chars between marker pairs
    link_len = (
        line.str.extractall(rf"{_A_MARK}([^{_A_MARK}]*){_A_MARK}")[0]
        .str.len()
        .groupby(level=0)
        .sum()
        .reindex(range(len(flat)), fill_value=0)
        .to_numpy()
    )
    density_ok = link_len <= MAX_LINK_DENSITY * np.maximum(vis_len, 1)
    keep_text = (~is_img.to_numpy()) & (vis_len >= MIN_TEXT_LEN) & density_ok

    out = flat.loc[keep_text | is_img.to_numpy()].reset_index(drop=True)
    if not len(out):
        return EMPTY_SPANS.copy()
    oline = out["line"].str.strip()
    o_img = oline.str.startswith(_IMG_MARK).to_numpy()
    out["kind"] = np.where(o_img, "media", "text")
    out["media_ref"] = oline.str.slice(len(_IMG_MARK)).where(o_img)
    out["text"] = (
        oline.str.replace(_A_MARK, "", regex=False)
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
        .where(~o_img)
    )
    out = out.sort_values(["doc_id", "page", "lineno"], kind="stable").reset_index(drop=True)
    out["seq"] = (
        grouped_cumsum(np.ones(len(out), np.int64), group_codes(out, ["doc_id", "page"])) - 1
    )
    return out[["doc_id", "page", "seq", "kind", "text", "media_ref"]]
