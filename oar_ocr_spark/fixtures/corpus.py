"""Deterministic interleaved-document corpus generator.

Two sources of documents, both with the BASELINE.json `input_hint`
shape (doc_id:string, spans:array<struct<kind,text,media_ref,offset>>):

- ``generate_documents(n, seed)``: fully synthetic corpus (FIXTURES.md
  §1): per-doc span count 1–64, ~70/30 text/media mix, ~1% heavy docs
  with hundreds of media spans (skew knob exercising salting/AQE).
- ``interleaved_docs_from_plain(...)``: SQL-expressible derivation from
  the driver's plain /root/testdata documents table (doc_id, text) —
  sentences become text spans, with a media span injected after every
  K-th span; used by __spark_entry__ so the DuckDB oracle can derive
  the identical table.

media_refs are unique per (doc, offset) so decode work is embarrassing
parallel; at production scale a `distinct media_ref` pre-pass would
dedup shared media before the decode stage.
"""

from __future__ import annotations

import numpy as np

__all__ = ["generate_documents", "interleaved_docs_from_plain"]

HEAVY_FRACTION = 0.01
HEAVY_MEDIA_SPANS = 200


def generate_documents(n_docs: int, seed: int = 42) -> list[dict]:
    """[{doc_id, spans:[{kind,text,media_ref,offset}]}] — deterministic."""
    rng = np.random.default_rng(seed)
    docs: list[dict] = []
    for d in range(n_docs):
        doc_id = f"doc{seed}_{d:06d}"
        heavy = bool(rng.random() < HEAVY_FRACTION)
        n_spans = HEAVY_MEDIA_SPANS if heavy else int(rng.integers(1, 65))
        spans: list[dict] = []
        for off in range(n_spans):
            is_media = heavy or bool(rng.random() < 0.3)
            if is_media:
                spans.append(
                    {
                        "kind": "media",
                        "text": None,
                        "media_ref": f"{doc_id}_m{off}",
                        "offset": off,
                    }
                )
            else:
                n_words = int(rng.integers(1, 9))
                words = [
                    "w" + "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 4))
                    for _ in range(n_words)
                ]
                spans.append(
                    {
                        "kind": "text",
                        "text": " ".join(words),
                        "media_ref": None,
                        "offset": off,
                    }
                )
        docs.append({"doc_id": doc_id, "spans": spans})
    return docs


# SQL-expressible derivation parameters (mirrored in __spark_entry__'s
# oracle SQL): split plain text on single spaces into word-chunks of
# CHUNK words; after every MEDIA_EVERY-th chunk insert a media span.
CHUNK_WORDS = 8
MEDIA_EVERY = 3


def interleaved_docs_from_plain(doc_id: str, text: str) -> list[dict]:
    """Derive interleaved spans from a plain (doc_id, text) row.

    Deterministic and cheap enough to express in SQL for the oracle:
    words = split(text, ' '); chunk i = words[i*8:(i+1)*8] joined;
    span list = chunks with a media span (ref = '{doc_id}_m{i}')
    inserted after every 3rd chunk.
    """
    words = text.split(" ")
    chunks = [
        " ".join(words[i : i + CHUNK_WORDS]) for i in range(0, len(words), CHUNK_WORDS)
    ]
    spans: list[dict] = []
    off = 0
    for i, chunk in enumerate(chunks):
        spans.append({"kind": "text", "text": chunk, "media_ref": None, "offset": off})
        off += 1
        if (i + 1) % MEDIA_EVERY == 0:
            spans.append(
                {"kind": "media", "text": None, "media_ref": f"{doc_id}_m{i}", "offset": off}
            )
            off += 1
    return spans
