"""Freeze golden outputs for the fixture corpus (FIXTURES.md: goldens are computed
once by the pure-Python oracle and committed; tests never call the oracle for these).

Run from the repo root:  python tests/make_goldens.py
Writes tests/fixtures/goldens.json with {doc_id: [[kind, text, media_ref, offset],…]}.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parents[0]))
sys.path.insert(0, str(HERE))

from fixtures_def import fixture_docs  # noqa: E402
from oracle import oracle_extract_doc  # noqa: E402

from pdf_extract_sys_spark import corpus as C  # noqa: E402


def main() -> None:
    goldens = {}
    for doc in fixture_docs():
        out = oracle_extract_doc(doc["doc_id"], doc["spans"])
        goldens[doc["doc_id"]] = [[s["kind"], s["text"], s["media_ref"], s["offset"]] for s in out]

    # frozen random-corpus golden (seed 42, includes mega-docs) — FIXTURES.md F20
    corpus = C.generate_corpus(120, seed=42, mega_doc_every=40, mega_doc_pages=24)
    rand = {}
    for row in corpus.to_dict("records"):
        out = oracle_extract_doc(row["doc_id"], row["spans"])
        rand[row["doc_id"]] = [[s["kind"], s["text"], s["media_ref"], s["offset"]] for s in out]

    outdir = HERE / "fixtures"
    outdir.mkdir(exist_ok=True)
    (outdir / "goldens.json").write_text(json.dumps(goldens, ensure_ascii=False, indent=1))
    (outdir / "goldens_seed42.json").write_text(json.dumps(rand, ensure_ascii=False))
    print(f"wrote {len(goldens)} fixture goldens, {len(rand)} corpus goldens")


if __name__ == "__main__":
    main()
