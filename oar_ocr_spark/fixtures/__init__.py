"""Deterministic synthetic corpus: page renderer + document generator.

Everything is a pure function of (seed, media_ref/doc_id) — no external
data, no wall clock — so the Spark pipeline, the single-process golden
generator, and the DuckDB oracle all see identical inputs.
"""

from .render import page_truth, render_page  # noqa: F401
from .corpus import generate_documents, interleaved_docs_from_plain  # noqa: F401
