"""Layout element type system (string-keyed).

Port of the LayoutElementType enum and its classification helpers
(/root/reference/oar-ocr-core/src/domain/structure.rs:1983-2300):
- LABEL_TO_TYPE      — from_label model-string normalization (2103-2168)
- SEMANTIC_CATEGORY  — semantic_category coarsening (2171-2240)
- SHOULD_OCR         — should_ocr gate (2274-2300)
- ORDER_LABEL        — OrderLabel mapping for xycut_enhanced
  (processors/layout_sorting.rs:38-80)

In the Spark engine the element type is a plain string column; these
dicts are broadcast lookup maps (SURVEY.md §2.3 "Label fixes").
"""

from __future__ import annotations

CANONICAL_TYPES = [
    "doc_title", "paragraph_title", "text", "content", "abstract",
    "image", "table", "chart", "formula",
    "figure_title", "table_title", "chart_title", "figure_table_chart_title",
    "header", "header_image", "footer", "footer_image", "footnote",
    "seal", "number", "reference", "reference_content", "algorithm",
    "formula_number", "aside_text", "list", "region", "other",
]

# from_label (structure.rs:2103-2168) — model label → canonical type
LABEL_TO_TYPE: dict[str, str] = {
    **{t: t for t in CANONICAL_TYPES},
    "title": "paragraph_title",
    "paragraph": "text",
    "figure": "image",
    "flowchart": "chart",
    "equation": "formula",
    "display_formula": "formula",
    "inline_formula": "formula",
    "caption": "figure_table_chart_title",
    "vision_footnote": "footnote",
    "vertical_text": "text",
}


def from_label(label: str) -> str:
    return LABEL_TO_TYPE.get(label.lower(), "other")


# semantic_category (structure.rs:2171-2240)
SEMANTIC_CATEGORY: dict[str, str] = {
    "doc_title": "title", "paragraph_title": "title",
    "text": "text", "content": "text", "abstract": "text",
    "image": "visual", "chart": "visual",
    "table": "table",
    "figure_title": "caption", "table_title": "caption",
    "chart_title": "caption", "figure_table_chart_title": "caption",
    "header": "header", "header_image": "header",
    "footer": "footer", "footer_image": "footer", "footnote": "footer",
    "formula": "formula", "formula_number": "formula",
    "seal": "special", "number": "special", "reference": "special",
    "reference_content": "special", "algorithm": "special", "aside_text": "special",
    "list": "list", "region": "region", "other": "other",
}

# should_ocr (structure.rs:2274-2300)
SHOULD_OCR: frozenset[str] = frozenset(
    [
        "text", "content", "abstract", "doc_title", "paragraph_title",
        "figure_title", "table_title", "chart_title", "figure_table_chart_title",
        "header", "header_image", "footer", "footer_image", "footnote",
        "reference", "reference_content", "algorithm", "aside_text",
        "list", "number",
    ]
)

# OrderLabel::from_element_type (layout_sorting.rs:38-80)
ORDER_LABEL: dict[str, str] = {
    "header": "header", "header_image": "header",
    "footer": "footer", "footer_image": "footer", "footnote": "footer",
    "doc_title": "doc_title",
    "paragraph_title": "paragraph_title", "content": "paragraph_title",
    "reference": "reference",
    "image": "vision", "table": "vision", "chart": "vision", "algorithm": "vision",
    "figure_title": "vision_title", "table_title": "vision_title",
    "chart_title": "vision_title", "figure_table_chart_title": "vision_title",
    "aside_text": "unordered", "seal": "unordered", "number": "unordered",
    "formula_number": "unordered",
    "text": "normal_text", "list": "normal_text", "abstract": "normal_text",
    "reference_content": "normal_text", "formula": "normal_text",
}


def order_label(element_type: str) -> str:
    return ORDER_LABEL.get(element_type, "normal_text")
