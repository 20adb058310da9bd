"""Deterministic structure-page renderer (PP-StructureV3 track).

Extends the plain OCR page with *layout elements*. Each element is
marked by a 2-pixel border whose intensity encodes its class:

    border intensity = LAYOUT_BORDER_BASE + class_id   (200, 201, …)

All layout intensities are ≥ 200, i.e. ABOVE the DB text-detection
threshold cutoff ((255-v)/255 > 0.3 ⇔ v < 178.5), so layout borders и
image fills are invisible to the text detector, while the synthetic
layout model reads them exactly. Text lines inside text-bearing
elements use the standard glyph-strip encoding from render.py.

Page anatomy (upright):
- optional header line (top) and footer line (bottom)
- a doc_title element, then per "block": paragraph_title / text
  (1-3 glyph lines) / image (flat fill at IMAGE_FILL) with an optional
  figure_title caption under it
- single- or two-column body templates
- the whole page rotated by its orientation class, as in render.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..models.synthetic import ANCHOR, ANCHOR_SIZE, BG
from .render import _render_region_block, _rng_for, region_width, REGION_H

LAYOUT_BORDER_BASE = 200
IMAGE_FILL = 235  # flat fill for image elements (invisible to text det)

# class ids for the synthetic layout model (subset of the 28-type system)
LAYOUT_CLASSES = [
    "doc_title",       # 0
    "paragraph_title", # 1
    "text",            # 2
    "image",           # 3
    "figure_title",    # 4
    "header",          # 5
    "footer",          # 6
    "table",           # 7
    "formula",         # 8
    "seal",            # 9
    "region",          # 10 (PP-DocBlockLayout grouping blocks)
]
CLASS_ID = {c: i for i, c in enumerate(LAYOUT_CLASSES)}


@dataclass
class ElementTruth:
    x1: int
    y1: int
    x2: int  # exclusive
    y2: int  # exclusive
    element_type: str
    lines: list[str]  # glyph-line texts (empty for image)
    num_lines: int
    # tables only: cell texts row-major + grid shape
    cell_texts: list[str] | None = None
    n_rows: int = 0
    n_cols: int = 0
    wired: bool = True  # tables: vertical grid lines present
    # text: render only the middle 2 pixel rows of the glyph block —
    # invisible to detection (min_size), readable by whole-block
    # recognition (the fallback-block-OCR fixture)
    thin: bool = False
    # formulas only: ("plain", text) | ("sup"/"sub", base, script) |
    # ("frac", num, den) | ("mix", b1, s1, b2, s2) |
    # ("nest", base, s1, s2) | ("sqrt", operand) — drives the
    # structured layout the geometry-aware recognizer must decode
    # back into latex
    formula_spec: tuple | None = None


@dataclass
class StructurePageTruth:
    width: int
    height: int
    orientation_class: int
    elements: list[ElementTruth]


def _text_for(rng: np.random.Generator, n: int) -> str:
    from .render import ALPHABET

    return "".join(ALPHABET[int(i)] for i in rng.integers(0, len(ALPHABET), n))


def structure_page_truth(media_ref: str) -> StructurePageTruth:
    rng = _rng_for("structure:" + media_ref)
    orientation_class = int(rng.integers(0, 4))
    elements: list[ElementTruth] = []
    margin, pad = 18, 6
    y = 26

    def add_element(x1: int, y1: int, etype: str, lines: list[str], width_px: int) -> ElementTruth:
        n = max(len(lines), 1)
        h = n * REGION_H + (n - 1) * 8 + 2 * pad
        el = ElementTruth(x1, y1, x1 + width_px, y1 + h, etype, lines, n)
        elements.append(el)
        return el

    page_w = 460
    body_w = page_w - 2 * margin

    if rng.random() < 0.5:  # header
        el = add_element(margin, y, "header", [_text_for(rng, 6)], body_w)
        y = el.y2 + 14
    # doc title
    el = add_element(margin, y, "doc_title", [_text_for(rng, 8)], body_w)
    y = el.y2 + 14

    two_col = bool(rng.random() < 0.4)
    n_blocks = int(rng.integers(2, 5))
    if two_col:
        col_w = (body_w - 24) // 2
        col_y = [y, y]
        col_top = y
        for b in range(n_blocks * 2):
            col = b % 2
            x1 = margin + col * (col_w + 24)
            kind = rng.random()
            if kind < 0.2:
                el = add_element(x1, col_y[col], "image", [], col_w)
                col_y[col] = el.y2 + 10
                if rng.random() < 0.7:
                    cap = add_element(x1, col_y[col], "figure_title", [_text_for(rng, 5)], col_w)
                    col_y[col] = cap.y2 + 12
            elif kind < 0.45:
                el = add_element(x1, col_y[col], "paragraph_title", [_text_for(rng, 5)], col_w)
                col_y[col] = el.y2 + 10
            else:
                n_lines = int(rng.integers(1, 4))
                el = add_element(
                    x1, col_y[col], "text", [_text_for(rng, int(rng.integers(4, 10))) for _ in range(n_lines)], col_w
                )
                col_y[col] = el.y2 + 12
        y = max(col_y)
        # PP-DocBlockLayout-style region blocks: one grouping box per
        # column, enclosing its members with 4px clearance
        for col in range(2):
            if col_y[col] > col_top:
                x1 = margin + col * (col_w + 24)
                elements.append(
                    ElementTruth(
                        x1 - 4, col_top - 4, x1 + col_w + 4, col_y[col] - 12 + 4,
                        "region", [], 1,
                    )
                )
    else:
        for _b in range(n_blocks):
            kind = rng.random()
            if kind < 0.18:
                el = add_element(margin, y, "image", [], body_w)
                y = el.y2 + 10
                if rng.random() < 0.7:
                    cap = add_element(margin, y, "figure_title", [_text_for(rng, 5)], body_w)
                    y = cap.y2 + 12
            elif kind < 0.36:
                # table block: grid of cells, each with a short text;
                # ~35% render wireless (row separators only — exercises
                # the classify + cell-detection/column-inference path)
                n_rows = int(rng.integers(2, 4))
                n_cols = int(rng.integers(2, 4))
                cell_texts = [_text_for(rng, int(rng.integers(3, 6))) for _ in range(n_rows * n_cols)]
                wired = bool(rng.random() < 0.65)
                cell_h = REGION_H + 14
                grid_h = n_rows * cell_h + 2
                el = ElementTruth(
                    margin, y, margin + body_w, y + grid_h + 2 * pad + 4,
                    "table", [], n_rows, cell_texts, n_rows, n_cols, wired,
                )
                elements.append(el)
                y = el.y2 + 12
            elif kind < 0.41:
                # thin text block: detection sees nothing (2px strip
                # < min_size) — only the fallback block OCR recovers it
                el = add_element(margin, y, "text", [_text_for(rng, int(rng.integers(4, 7)))], body_w)
                el.thin = True
                y = el.y2 + 12
            elif kind < 0.45:
                # structured formula: the layout (raised/lowered script
                # strip or a fraction bar) IS the content — the
                # recognizer derives ^{}/_{}/\frac from glyph geometry
                p = rng.random()
                if p < 0.18:
                    spec = (
                        "sup",
                        _text_for(rng, int(rng.integers(2, 5))),
                        _text_for(rng, int(rng.integers(1, 3))),
                    )
                    fh = REGION_H + FORMULA_SCRIPT_DY + 2 * FORMULA_INNER_PAD
                elif p < 0.36:
                    spec = (
                        "sub",
                        _text_for(rng, int(rng.integers(2, 5))),
                        _text_for(rng, int(rng.integers(1, 3))),
                    )
                    fh = REGION_H + FORMULA_SCRIPT_DY + 2 * FORMULA_INNER_PAD
                elif p < 0.54:
                    spec = (
                        "frac",
                        _text_for(rng, int(rng.integers(2, 5))),
                        _text_for(rng, int(rng.integers(2, 5))),
                    )
                    fh = (
                        2 * REGION_H
                        + 2 * FORMULA_FRAC_GAP
                        + FORMULA_BAR_H
                        + 2 * FORMULA_INNER_PAD
                    )
                elif p < 0.70:
                    # mixed sequence: base^{s} base_{s} — the recognizer
                    # must attach each script to ITS preceding base, not
                    # pattern-match a single-template layout
                    spec = (
                        "mix",
                        _text_for(rng, int(rng.integers(2, 4))),
                        _text_for(rng, int(rng.integers(1, 3))),
                        _text_for(rng, int(rng.integers(2, 4))),
                        _text_for(rng, int(rng.integers(1, 3))),
                    )
                    fh = REGION_H + 2 * FORMULA_SCRIPT_DY + 2 * FORMULA_INNER_PAD
                elif p < 0.84:
                    # nested scripts x^{y^{z}}: three strips climbing one
                    # FORMULA_SCRIPT_DY per level — the recognizer must
                    # nest the deeper script inside the shallower one
                    spec = (
                        "nest",
                        _text_for(rng, int(rng.integers(2, 4))),
                        _text_for(rng, int(rng.integers(1, 3))),
                        _text_for(rng, int(rng.integers(1, 3))),
                    )
                    fh = REGION_H + 2 * FORMULA_SCRIPT_DY + 2 * FORMULA_INNER_PAD
                elif p < 0.94:
                    # radical: a vinculum bar with the operand ONLY below
                    # it (a fraction bar has glyphs on both sides)
                    spec = ("sqrt", _text_for(rng, int(rng.integers(2, 5))))
                    fh = (
                        REGION_H
                        + FORMULA_FRAC_GAP
                        + FORMULA_BAR_H
                        + 2 * FORMULA_INNER_PAD
                    )
                else:
                    spec = ("plain", _text_for(rng, int(rng.integers(3, 7))))
                    fh = REGION_H + 2 * pad
                el = ElementTruth(
                    margin, y, margin + body_w, y + fh, "formula",
                    list(spec[1:]), 1, formula_spec=spec,
                )
                elements.append(el)
                y = el.y2 + 10
            elif kind < 0.56:
                el = add_element(margin, y, "paragraph_title", [_text_for(rng, 5)], body_w)
                y = el.y2 + 10
            else:
                n_lines = int(rng.integers(1, 4))
                el = add_element(
                    margin, y, "text", [_text_for(rng, int(rng.integers(4, 10))) for _ in range(n_lines)], body_w
                )
                y = el.y2 + 12

    if rng.random() < 0.25:  # seal: stacked short lines, poly-sorted
        n_lines = int(rng.integers(2, 4))
        el = add_element(
            margin, y + 6, "seal", [_text_for(rng, 4) for _ in range(n_lines)], 160
        )
        y = el.y2 + 8

    if rng.random() < 0.5:  # footer
        el = add_element(margin, y + 8, "footer", [_text_for(rng, 5)], body_w)
        y = el.y2

    return StructurePageTruth(page_w, y + 26, orientation_class, elements)


TABLE_GRID = 190  # grid-line intensity (invisible to text detection)

# structured-formula layout constants (shared with the recognizer's
# geometry thresholds in structure.py — change together). Gaps must
# exceed twice the DB unclip expansion (delta = area·1.5/perimeter ≈
# 10px for a glyph strip), or one box's recognition slice captures the
# neighboring strip's glyphs.
FORMULA_SCRIPT_DY = 8  # vertical offset of a sup/sub strip vs its base
FORMULA_SCRIPT_GAP = 28  # horizontal gap between base and script strips
FORMULA_BAR_H = 6  # fraction-bar height (survives the min_size filter)
FORMULA_FRAC_GAP = 12  # gap between bar and numerator/denominator
FORMULA_BAR_INK = 64  # dark enough for DB detection (< 178.5 cutoff)
# vertical headroom inside the element: detected boxes grow by the
# unclip delta (~10px); without headroom they CLIP at the crop border,
# which compresses the very center offsets the classifier reads
FORMULA_INNER_PAD = 12


def _render_formula(img: np.ndarray, el: ElementTruth, pad: int) -> None:
    """Structured formula layouts per el.formula_spec (upright)."""
    kind = el.formula_spec[0]
    x0 = el.x1 + pad
    max_w = el.x2 - el.x1 - 2 * pad

    def put(text: str, x: int, yy: int) -> int:
        block = _render_region_block(text)
        w = min(region_width(len(text)), max(el.x2 - pad - x, 0))
        if w > 0:
            img[yy : yy + REGION_H, x : x + w] = block[:, :w]
        return w

    if kind == "plain":
        put(el.formula_spec[1], x0, el.y1 + pad)
    elif kind == "mix":
        # base^{sup} base2_{sub}: two base strips on the middle line
        # with a raised strip after the first and a lowered one after
        # the second — exercises per-script attachment (full ±DY
        # separation keeps centers clear of the classifier tolerance)
        b1, s1, b2, s2 = el.formula_spec[1:]
        top = el.y1 + FORMULA_INNER_PAD
        by = top + FORMULA_SCRIPT_DY  # base line between the two levels
        x = x0
        x += put(b1, x, by) + FORMULA_SCRIPT_GAP
        x += put(s1, x, top) + FORMULA_SCRIPT_GAP  # raised: superscript
        x += put(b2, x, by) + FORMULA_SCRIPT_GAP
        put(s2, x, top + 2 * FORMULA_SCRIPT_DY)  # lowered: subscript
    elif kind == "nest":
        # base^{s1^{s2}}: strips climbing one DY per nesting level
        base, s1, s2 = el.formula_spec[1:]
        top = el.y1 + FORMULA_INNER_PAD
        x = x0
        x += put(base, x, top + 2 * FORMULA_SCRIPT_DY) + FORMULA_SCRIPT_GAP
        x += put(s1, x, top + FORMULA_SCRIPT_DY) + FORMULA_SCRIPT_GAP
        put(s2, x, top)
    elif kind == "sqrt":
        # vinculum bar with the operand ONLY below it
        operand = el.formula_spec[1]
        bar_y = el.y1 + FORMULA_INNER_PAD
        oy = bar_y + FORMULA_BAR_H + FORMULA_FRAC_GAP
        ow = put(operand, x0 + 8, oy)
        bar_w = min(max(ow + 16, 56), max_w)
        img[bar_y : bar_y + FORMULA_BAR_H, x0 : x0 + bar_w] = FORMULA_BAR_INK
    elif kind in ("sup", "sub"):
        base, script = el.formula_spec[1], el.formula_spec[2]
        top = el.y1 + FORMULA_INNER_PAD
        if kind == "sup":
            by, sy = top + FORMULA_SCRIPT_DY, top
        else:
            by, sy = top, top + FORMULA_SCRIPT_DY
        bw = put(base, x0, by)
        put(script, x0 + bw + FORMULA_SCRIPT_GAP, sy)
    else:  # frac
        num, den = el.formula_spec[1], el.formula_spec[2]
        ny = el.y1 + FORMULA_INNER_PAD
        bar_y = ny + REGION_H + FORMULA_FRAC_GAP
        dy_ = bar_y + FORMULA_BAR_H + FORMULA_FRAC_GAP
        nw = put(num, x0 + 8, ny)
        dw = put(den, x0 + 8, dy_)
        # min width 56 keeps the bar's 3×-wider-than-tall signature
        # after unclip even when both operands are short
        bar_w = min(max(max(nw, dw) + 16, 56), max_w)
        img[bar_y : bar_y + FORMULA_BAR_H, x0 : x0 + bar_w] = FORMULA_BAR_INK


def _render_table(img: np.ndarray, el, pad: int) -> None:
    """Grid lines at TABLE_GRID + glyph text per cell. Wireless tables
    (el.wired False) draw row separators only — the column structure
    must be inferred from text positions."""
    gx1, gy1 = el.x1 + pad, el.y1 + pad
    gx2, gy2 = el.x2 - pad, el.y1 + pad + el.n_rows * (REGION_H + 14) + 2
    col_w = (gx2 - gx1) // el.n_cols
    gx2 = gx1 + col_w * el.n_cols  # snap to integer cell widths
    row_h = REGION_H + 14
    for r in range(el.n_rows + 1):
        yy = gy1 + r * row_h
        img[yy : yy + 2, gx1:gx2] = TABLE_GRID
    if el.wired:
        for c in range(el.n_cols + 1):
            xx = gx1 + c * col_w
            img[gy1 : gy1 + el.n_rows * row_h + 2, xx : xx + 2] = TABLE_GRID
    for r in range(el.n_rows):
        for c in range(el.n_cols):
            text = el.cell_texts[r * el.n_cols + c]
            block = _render_region_block(text)
            w = min(region_width(len(text)), col_w - 8)
            ty = gy1 + r * row_h + 7
            tx = gx1 + c * col_w + 5
            img[ty : ty + REGION_H, tx : tx + w] = block[:, :w]


def render_structure_page(media_ref: str) -> np.ndarray:
    truth = structure_page_truth(media_ref)
    img = np.full((truth.height, truth.width), BG, dtype=np.uint8)
    img[4 : 4 + ANCHOR_SIZE, 4 : 4 + ANCHOR_SIZE] = ANCHOR
    pad = 6
    for el in truth.elements:
        border = LAYOUT_BORDER_BASE + CLASS_ID[el.element_type]
        img[el.y1 : el.y2, el.x1 : el.x1 + 2] = border
        img[el.y1 : el.y2, el.x2 - 2 : el.x2] = border
        img[el.y1 : el.y1 + 2, el.x1 : el.x2] = border
        img[el.y2 - 2 : el.y2, el.x1 : el.x2] = border
        if el.element_type == "image":
            img[el.y1 + 2 : el.y2 - 2, el.x1 + 2 : el.x2 - 2] = IMAGE_FILL
            continue
        if el.element_type == "table":
            _render_table(img, el, pad)
            continue
        if el.element_type == "formula" and el.formula_spec is not None:
            _render_formula(img, el, pad)
            continue
        if el.thin:
            # 2-px strip of the glyph block placed on the crop row the
            # recognizer samples: int((24+0.5)·h/48) of the element crop
            line = el.lines[0]
            block = _render_region_block(line)
            w = min(region_width(len(line)), el.x2 - el.x1 - 2 * pad)
            eh = el.y2 - el.y1
            r = int((24 + 0.5) * eh / 48)
            img[el.y1 + r : el.y1 + r + 2, el.x1 + pad : el.x1 + pad + w] = block[9:11, :w]
            continue
        ty = el.y1 + pad
        for line in el.lines:
            block = _render_region_block(line)
            w = min(region_width(len(line)), el.x2 - el.x1 - 2 * pad)
            img[ty : ty + REGION_H, el.x1 + pad : el.x1 + pad + w] = block[:, :w]
            ty += REGION_H + 8
    k = truth.orientation_class % 4
    if k:
        img = np.rot90(img, k=-k)
    return np.ascontiguousarray(img)
