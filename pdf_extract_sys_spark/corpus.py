"""Deterministic synthetic corpus generator + payload encoders.

Implements the FIXTURES.md payload encodings for the fixed input schema
(BASELINE.json `input_hint`):

  corpus(doc_id STRING, spans ARRAY<STRUCT<kind, text, media_ref, offset>>)

  * pdf_chars — ``PAGE\\t<w>\\t<h>`` header, then one ``hex\\tx0\\ty0\\tx1\\ty1``
    record per char (PDF points, bottom-left origin; ``hex\\t-`` = bbox-less char,
    exercising the skip rule at main.py:418-422)
  * ocr_words — ``PAGE\\t<w>\\t<h>`` header, then
    ``word\\tconf\\tleft\\ttop\\twidth\\theight\\tblock\\tline`` records
  * html — raw html text
  * media — passthrough media_ref (+ optional caption)
  * garbage — malformed payload under a known kind, or an unknown kind

Everything is seeded numpy — same seed ⇒ byte-identical corpus (no Date.now /
wall-clock anywhere). Generation is vectorized enough to build 10^4-10^5-doc bench
slices quickly; it is NOT the measured hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB = np.array(
    """the quick brown fox jumps over lazy dog a report shows that results were
significant analysis of data reveals trends in measurements we observe values
grow with scale model performance improves under training corpus size tokens
per document vary widely extraction quality depends on layout and encoding
figures tables captions references appendix section chapter introduction
methods conclusion pipeline spark arrow vectorized partition shuffle""".split()
)

SENTENCE_ENDERS = np.array([".", ".", ".", "!", "?"])  # weighted toward '.'


# -------------------------------------------------------------------------------
# Encoders
# -------------------------------------------------------------------------------

def encode_pdf_page(
    chars: list[str],
    boxes: list[tuple[float, float, float, float] | None],
    page_w: float = 612.0,
    page_h: float = 792.0,
) -> str:
    """Encode a char-event stream; boxes[i] is (x0, y0, x1, y1) in PDF points
    (y0=bottom, y1=top) or None for a bbox-less char."""
    lines = [f"PAGE\t{page_w:g}\t{page_h:g}"]
    for ch, box in zip(chars, boxes):
        hx = format(ord(ch), "x")
        if box is None:
            lines.append(f"{hx}\t-")
        else:
            lines.append(f"{hx}\t{box[0]:g}\t{box[1]:g}\t{box[2]:g}\t{box[3]:g}")
    return "\n".join(lines)


def layout_text(text: str, page_w: float = 612.0, page_h: float = 792.0,
                char_w: float = 6.0, line_h: float = 14.0,
                nobbox_every: int = 0) -> tuple[list[str], list]:
    """Simple typewriter layout: x advances per char, y drops per '\\n'. Returns
    (chars, boxes); every `nobbox_every`-th char (if > 0) gets no bbox."""
    chars, boxes = [], []
    x, line = 10.0, 0
    for i, ch in enumerate(text):
        if nobbox_every and (i % nobbox_every == nobbox_every - 1):
            chars.append(ch)
            boxes.append(None)
            continue
        top = page_h - 20.0 - line * line_h
        boxes.append((x, top - 10.0, x + char_w, top))
        chars.append(ch)
        if ch == "\n":
            line += 1
            x = 10.0
        else:
            x += char_w
    return chars, boxes


def encode_pdf_text(text: str, **kw) -> str:
    chars, boxes = layout_text(text, **kw)
    return encode_pdf_page(chars, boxes)


def encode_ocr_page(
    words: list[tuple],  # (word, conf, left, top, width, height, block, line)
    img_w: float = 1000.0,
    img_h: float = 1400.0,
) -> str:
    lines = [f"PAGE\t{img_w:g}\t{img_h:g}"]
    for w in words:
        lines.append("\t".join(str(v) for v in w))
    return "\n".join(lines)


def span(kind: str, text: str | None, media_ref: str | None, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


# -------------------------------------------------------------------------------
# Random-document generation
# -------------------------------------------------------------------------------

def _random_sentence(rng: np.random.Generator) -> str:
    n = int(rng.integers(3, 12))
    words = rng.choice(VOCAB, size=n)
    s = " ".join(words.tolist()).capitalize()
    roll = rng.random()
    if roll < 0.06:
        s += f" about {rng.integers(1, 99)}.{rng.integers(0, 99)} units"  # decimal
    elif roll < 0.10:
        s += " see www.example.org for details"  # url dots
    elif roll < 0.14:
        s += f" contact {rng.choice(['a', 'b', 'c'])}@mail.com now"  # email dot
    elif roll < 0.17:
        s += " wait for it..."  # ellipsis
    return s + str(rng.choice(SENTENCE_ENDERS))


def _random_page_text(rng: np.random.Generator, n_sentences: int) -> str:
    parts = []
    for _ in range(n_sentences):
        parts.append(_random_sentence(rng))
        parts.append("\n" if rng.random() < 0.3 else " ")
    return "".join(parts)


def _random_ocr_words(rng: np.random.Generator, n_words: int) -> list[tuple]:
    words = rng.choice(VOCAB, size=n_words)
    out = []
    x, y, line_num = 10, 20, 1
    for i, w in enumerate(words):
        wtxt = str(w)
        if rng.random() < 0.1:
            wtxt += str(rng.choice(SENTENCE_ENDERS))
        conf = int(rng.integers(20, 100))
        width = 8 * len(wtxt)
        out.append((wtxt, conf, x, y, width, 12, 1, line_num))
        x += width + 5
        if x > 900:
            x, y, line_num = 10, y + 18, line_num + 1
    return out


def _random_html(rng: np.random.Generator) -> str:
    nav = '<nav><a href="/">Home</a> <a href="/x">X</a> <a href="/y">Y</a></nav>'
    paras = []
    for _ in range(int(rng.integers(2, 6))):
        paras.append(f"<p>{_random_page_text(rng, int(rng.integers(2, 5)))}</p>")
        if rng.random() < 0.4:
            paras.append(f'<img src="img-{rng.integers(0, 999)}.png" alt="f">')
    footer = '<footer><a href="/tos">Terms</a> <a href="/p">Privacy</a></footer>'
    return f"<html><head><title>t</title><style>a{{}}</style></head><body>{nav}" + "".join(paras) + f"{footer}</body></html>"


def generate_doc(rng: np.random.Generator, doc_id: str,
                 pages_override: int | None = None) -> dict:
    """One synthetic doc mixing span kinds per a seeded draw."""
    spans = []
    style = rng.random()
    n_pages = pages_override if pages_override is not None else int(rng.integers(1, 5))
    off = 0
    if style < 0.45:  # native-text pdf (searchable)
        for _ in range(n_pages):
            txt = _random_page_text(rng, int(rng.integers(3, 9)))
            nb = 7 if rng.random() < 0.3 else 0
            chars, boxes = layout_text(txt, nobbox_every=nb)
            spans.append(span("pdf_chars", encode_pdf_page(chars, boxes), None, off))
            off += 1
            if rng.random() < 0.15:
                spans.append(span("media", None, f"fig-{doc_id}-{off}", off))
                off += 1
    elif style < 0.70:  # scanned pdf (ocr route; pdf pages nearly empty)
        for _ in range(n_pages):
            if rng.random() < 0.5:  # a sparse text layer that fails the classifier
                chars, boxes = layout_text("scan")
                spans.append(span("pdf_chars", encode_pdf_page(chars, boxes), None, off))
                off += 1
            words = [] if rng.random() < 0.1 else _random_ocr_words(rng, int(rng.integers(8, 40)))
            spans.append(span("ocr_words", encode_ocr_page(words), None, off))
            off += 1
    elif style < 0.92:  # html
        spans.append(span("html", _random_html(rng), None, off))
        off += 1
        if rng.random() < 0.2:
            spans.append(span("media", "caption", f"vid-{doc_id}", off))
            off += 1
    else:  # garbage (sentinel path)
        if rng.random() < 0.5:
            spans.append(span("pdf_chars", "THIS IS NOT A VALID STREAM", None, 0))
        else:
            spans.append(span("blob", "\x00\x01\x02", None, 0))
        off = 1
    if not spans:
        spans.append(span("media", None, f"m-{doc_id}", 0))
    return {"doc_id": doc_id, "spans": spans}


def generate_corpus(
    n_docs: int,
    seed: int = 42,
    mega_doc_every: int = 0,
    mega_doc_pages: int = 64,
) -> pd.DataFrame:
    """Deterministic corpus: pandas frame (doc_id, spans:list[dict]). With
    mega_doc_every > 0, every k-th doc is a long-tail mega-doc (skew realism,
    FIXTURES.md F19)."""
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n_docs):
        is_mega = mega_doc_every and (i % mega_doc_every == mega_doc_every - 1)
        docs.append(
            generate_doc(rng, f"doc-{seed}-{i:08d}",
                         pages_override=mega_doc_pages if is_mega else None)
        )
    return pd.DataFrame(docs)


def corpus_to_spark(spark, pdf: pd.DataFrame):
    """pandas corpus → Spark DataFrame with the fixed corpus schema."""
    from .schema import CORPUS_SCHEMA

    return spark.createDataFrame(pdf.to_dict("records"), schema=CORPUS_SCHEMA)


def write_corpus_parquet(pdf: pd.DataFrame, path: str, n_files: int = 64,
                         row_group_size: int = 64) -> None:
    """Write a pandas corpus straight to a multi-file parquet directory — no
    JVM involved (generation-side utility).

    Alongside the fixed (doc_id, spans) columns an ``n_spans`` STATS COLUMN is
    written (span count per doc): a plain int the engine's normal/mega routing
    predicate can push down to the parquet reader, so row-group min/max stats
    prune the skew-tail scans instead of re-decoding every span array (see
    extract_corpus ``size_col``). Small row groups keep the stats selective —
    at 100 TB the ingest writer does exactly this."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from .schema import CORPUS_ARROW

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    n = len(pdf)
    n_files = max(1, min(n_files, n))
    bounds = np.linspace(0, n, n_files + 1, dtype=int)
    for i in range(n_files):
        chunk = pdf.iloc[bounds[i] : bounds[i + 1]]
        tbl = pa.Table.from_pydict(
            {
                "doc_id": pa.array(chunk["doc_id"].tolist(), type=pa.string()),
                "spans": pa.array(chunk["spans"].tolist(), type=CORPUS_ARROW.field("spans").type),
                "n_spans": pa.array(
                    [len(s) for s in chunk["spans"]], type=pa.int32()
                ),
            },
        )
        pq.write_table(tbl, f"{path}/part-{i:05d}.parquet",
                       row_group_size=row_group_size)
    open(f"{path}/_SUCCESS", "w").close()
