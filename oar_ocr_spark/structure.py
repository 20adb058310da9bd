"""PP-StructureV3-style structure extraction.

Single-process core shared by the Spark structure pipeline and the
golden generator (mirrors OARStructure::predict_images,
/root/reference/src/oarocr/structure.rs:3249-3490 with the classic
stage graph: layout detect → postprocess → overall OCR → OCR↔element
matching → per-element text join → enhanced reading order → markdown).

The synthetic layout model reads the class-coded element borders of
``fixtures.render_structure`` pages (stand-in for PicoDet/RT-DETR —
models/detection/picodet.rs, rtdetr.rs; adapter
domain/adapters/layout_detection_adapter.rs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .fixtures.render_structure import CLASS_ID, LAYOUT_BORDER_BASE, LAYOUT_CLASSES
from .local_ref import ExtractConfig, detect_page, preprocess_page, recognize_crop
from .operators.db_postprocess import connected_components_boxes
from .operators.layout_postprocess import (
    filter_by_class_thresholds,
    nms_keep_indices,
    overlap_removal_indices,
)
from .operators.layout_sorting import sort_layout_enhanced
from .operators.layout_types import SHOULD_OCR
from .operators.stitching import StitchConfig, sort_and_join_texts
from .operators.table import (
    match_cells_and_ocr,
    table_structure_from_crop,
    wrap_table_html_with_content,
)

__all__ = [
    "StructureElement",
    "detect_layout",
    "extract_structure_page",
    "elements_to_markdown",
    "elements_to_html",
    "calculate_continuation_flags",
    "concatenate_markdown_pages",
    "simplify_table_html",
]

# stitching.rs:40-41 — regions with specialized content skip OCR matching
EXCLUDED_FROM_OCR_LABELS = ("table", "seal")
OCR_MATCH_MIN_PIXELS = 3.0  # structure.rs:1440-1459 intersection w,h > 3px


@dataclass
class StructureElement:
    bbox: np.ndarray
    element_type: str
    score: float
    text: str = ""
    num_lines: int = 1
    order_index: int = 0
    region_index: int = -1  # PP-DocBlockLayout membership (-1 = none)
    html: str = ""  # tables: assembled HTML (structure.rs TableResult)
    ocr_boxes: list = field(default_factory=list)
    ocr_texts: list = field(default_factory=list)


def detect_layout(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Synthetic layout forward: class-coded borders → (boxes (N,4),
    class_ids (N,), scores (N,)). Scores are a deterministic function of
    geometry so threshold filtering is exercised end-to-end."""
    boxes, classes, scores = [], [], []
    for cid in range(len(LAYOUT_CLASSES)):
        mask = img == (LAYOUT_BORDER_BASE + cid)
        for (x1, y1, x2, y2) in connected_components_boxes(mask):
            boxes.append([x1, y1, x2 + 1, y2 + 1])
            classes.append(cid)
            scores.append(0.35 + ((x1 * 7 + y1 * 13 + cid * 29) % 60) / 100.0)
    if not boxes:
        return (
            np.empty((0, 4), dtype=np.float32),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.float32),
        )
    return (
        np.asarray(boxes, dtype=np.float32),
        np.asarray(classes, dtype=np.int64),
        np.asarray(scores, dtype=np.float32),
    )


def _formula_latex(fcrop: np.ndarray, boxes: np.ndarray, cfg: ExtractConfig) -> str:
    """Detected glyph/bar boxes inside a formula crop → latex string.

    Geometry-aware PP-FormulaNet stand-in (twin of the fixture layout,
    fixtures/render_structure._render_formula — the two sides share
    FORMULA_* constants):
    - a box ≥3× wider than tall AND shorter than 60% of the tallest
      box is a BAR: glyphs on both sides → ``\\frac{num}{den}``;
      glyphs ONLY below it → the bar is a vinculum, ``\\sqrt{…}``
    - otherwise glyph boxes sort by x; script LEVELS are quantized
      from each box's center offset vs the leading base box (step =
      the smallest above-tolerance offset), and a run of non-zero
      levels nests right-to-left onto its base token — one level deep
      gives ``^{}`` / ``_{}``, deeper runs nest (``x^{y^{z}}``)
    - a flat single-level sequence keeps the legacy ``\\mathrm{…}``
      wrapper (plain formulas, and any foreign layout the rules above
      don't recognize, degrade to that instead of guessing)."""
    items = []
    ch, cw = fcrop.shape[:2]
    for ob in boxes:
        x1, y1 = max(int(ob[0]), 0), max(int(ob[1]), 0)
        x2, y2 = min(int(ob[2]), cw), min(int(ob[3]), ch)
        if x2 > x1 and y2 > y1:
            items.append((x1, y1, x2, y2))
    if not items:
        return ""
    hmax = max(y2 - y1 for _x1, y1, _x2, y2 in items)
    bars = {
        it
        for it in items
        if (it[3] - it[1]) < 0.6 * hmax and (it[2] - it[0]) >= 3 * (it[3] - it[1])
    }
    glyphs = [it for it in items if it not in bars]

    def rec(it: tuple) -> str:
        t, _c = recognize_crop(fcrop[it[1] : it[3], it[0] : it[2]], cfg)
        return t

    def cy(it: tuple) -> float:
        return (it[1] + it[3]) / 2.0

    if bars and glyphs:
        bar = max(bars, key=lambda it: it[2] - it[0])
        num = sorted((g for g in glyphs if cy(g) < cy(bar)), key=lambda it: it[0])
        den = sorted((g for g in glyphs if cy(g) >= cy(bar)), key=lambda it: it[0])
        ntxt = " ".join(filter(None, (rec(g) for g in num)))
        dtxt = " ".join(filter(None, (rec(g) for g in den)))
        if ntxt and dtxt:
            return "\\frac{%s}{%s}" % (ntxt, dtxt)
        if dtxt and not ntxt:  # operand only below the bar: a vinculum
            return "\\sqrt{%s}" % dtxt
        return "\\mathrm{" + ntxt + "}" if ntxt else ""

    glyphs.sort(key=lambda it: it[0])
    base_cy = cy(glyphs[0])
    tol = 4.0
    texts = [(g, rec(g)) for g in glyphs]
    texts = [(g, t) for g, t in texts if t]
    if not texts:
        return ""
    # quantize vertical offsets into script LEVELS: step = the
    # smallest above-tolerance offset (one FORMULA_SCRIPT_DY in the
    # fixture geometry), negative = raised
    dys = [cy(g) - base_cy for g, _t in texts]
    offs = [abs(d) for d in dys if abs(d) > tol]
    step = min(offs) if offs else 1.0
    levels = [0 if abs(d) <= tol else int(round(d / step)) for d in dys]
    parts: list[str] = []
    structured = False
    i = 0
    while i < len(texts):
        if levels[i] == 0:
            parts.append(texts[i][1])
            i += 1
            continue
        if not parts:  # leading script with no base: foreign layout
            return "\\mathrm{" + " ".join(t for _g, t in texts) + "}"
        # consume the maximal run of script glyphs after this base;
        # equal consecutive levels join into one script group
        chain: list[tuple[int, str]] = []
        while i < len(texts) and levels[i] != 0:
            if chain and levels[i] == chain[-1][0]:
                chain[-1] = (chain[-1][0], chain[-1][1] + " " + texts[i][1])
            else:
                chain.append((levels[i], texts[i][1]))
            i += 1
        # nest right-to-left: each group is a script OF the previous
        # (shallower) group — raised relative to it ⇒ ^, lowered ⇒ _
        s = chain[-1][1]
        for k in range(len(chain) - 2, -1, -1):
            op = "^" if chain[k + 1][0] < chain[k][0] else "_"
            s = "%s%s{%s}" % (chain[k][1], op, s)
        parts[-1] += "%s{%s}" % ("^" if chain[0][0] < 0 else "_", s)
        structured = True
    if structured:
        return " ".join(parts)
    return "\\mathrm{" + " ".join(parts) + "}"


def extract_structure_page(
    img: np.ndarray, cfg: ExtractConfig | None = None
) -> list[StructureElement]:
    """Full single-page structure analysis → ordered elements.

    Mirrors complete_page (structure.rs:2568-2805): preprocess → layout
    (thresholds → NMS → overlap dedupe) → overall OCR → cross matching
    (intersection w,h > 3px) → orphan text elements → per-element text
    join → sort_layout_enhanced → 1-based order indices
    (stitching.rs:365-380)."""
    cfg = cfg or ExtractConfig()
    upright, _cls = preprocess_page(img, cfg)
    h, w = upright.shape

    boxes, classes, scores = detect_layout(upright)
    labels = [LAYOUT_CLASSES[int(c)] for c in classes]
    # PP-DocBlockLayout region blocks live beside the element list
    # (domain/structure.rs RegionBlock) — they never enter the element
    # threshold/NMS/dedupe chain
    region_boxes = np.stack(
        [boxes[i] for i in range(len(boxes)) if labels[i] == "region"]
    ) if any(lb == "region" for lb in labels) else np.empty((0, 4), dtype=np.float32)
    keep = [i for i in range(len(boxes)) if labels[i] != "region"]
    boxes, classes, scores = boxes[keep], classes[keep], scores[keep]
    labels = [LAYOUT_CLASSES[int(c)] for c in classes]

    keep = filter_by_class_thresholds(labels, scores)
    boxes, classes, scores = boxes[keep], classes[keep], scores[keep]
    labels = [LAYOUT_CLASSES[int(c)] for c in classes]
    if len(boxes):
        kept = nms_keep_indices(boxes, classes, scores)
        boxes, classes, scores = boxes[kept], classes[kept], scores[kept]
        labels = [LAYOUT_CLASSES[int(c)] for c in classes]
    dropped = overlap_removal_indices(boxes, labels) if len(boxes) else set()
    elements = [
        StructureElement(boxes[i], labels[i], float(scores[i]))
        for i in range(len(boxes))
        if i not in dropped
    ]

    # region membership: best IoA ≥ 0.1 (REGION_MEMBERSHIP_IOA_THRESHOLD,
    # structure.rs:44, assign logic :2109-2168)
    if len(region_boxes) and elements:
        from .operators.geometry import overlap_ratio

        el_boxes = np.stack([el.bbox for el in elements])
        ratios = overlap_ratio(el_boxes, region_boxes)  # (N_el, N_rg)
        best = ratios.argmax(axis=1)
        best_val = ratios[np.arange(len(elements)), best]
        for i, el in enumerate(elements):
            el.region_index = int(best[i]) if best_val[i] >= 0.1 else -1

    # formula recognition (structure.rs:1914-2007; geometry-aware
    # PP-FormulaNet stand-in: the reference decodes crop → latex token
    # sequence, pp_formulanet.rs:391 — here the sequence derives from
    # the rendered glyph GEOMETRY: raised/lowered strips → ^{}/_{},
    # a wide short bar with ink above and below → \frac{}{})
    for el in elements:
        if el.element_type == "formula":
            fx1, fy1 = max(int(el.bbox[0]), 0), max(int(el.bbox[1]), 0)
            fx2, fy2 = min(int(el.bbox[2]), w), min(int(el.bbox[3]), h)
            fcrop = upright[fy1:fy2, fx1:fx2]
            if fcrop.size:
                fb, _fs = detect_page(fcrop, cfg)
                latex = _formula_latex(fcrop, fb, cfg)
                if latex:
                    el.text = latex
                    el.score = 1.0  # injected with conf 1.0 (structure.rs:2765-2775)

    # formula-region masking before text detection
    # (structure.rs:2189-2203): white-out formula boxes so the overall
    # OCR doesn't double-recognize their content
    ocr_input = upright
    formula_els = [el for el in elements if el.element_type == "formula"]
    if formula_els:
        ocr_input = upright.copy()
        for el in formula_els:
            ocr_input[
                max(int(el.bbox[1]), 0) : min(int(el.bbox[3]), h),
                max(int(el.bbox[0]), 0) : min(int(el.bbox[2]), w),
            ] = 255

    # overall OCR over the full (masked) page, with cross-layout box
    # splitting: detection boxes spanning ≥2 text-bearing containers
    # are split at container boundaries before recognition
    # (structure.rs:2230-2322 / 3008-3052), and each re-recognition
    # crop suppresses other OCR boxes it covers with IoU > 0.8
    # (covered-OCR suppression, structure.rs:1485-1493)
    from .operators.text_refine import (
        CROSS_SPLIT_CONTAINER_TYPES,
        split_cross_layout_boxes_with_origins,
        suppress_covered_boxes,
    )

    ocr_boxes, _s = detect_page(ocr_input, cfg)
    containers = [
        el.bbox for el in elements if el.element_type in CROSS_SPLIT_CONTAINER_TYPES
    ]
    if len(ocr_boxes) and containers:
        ocr_boxes, origins, is_split = split_cross_layout_boxes_with_origins(
            ocr_boxes, np.stack(containers)
        )
        keep_idx = suppress_covered_boxes(ocr_boxes, origins, is_split)
        ocr_boxes = ocr_boxes[keep_idx]
    matched = [False] * len(ocr_boxes)
    for k, ob in enumerate(ocr_boxes):
        for el in elements:
            if el.element_type in EXCLUDED_FROM_OCR_LABELS or not (
                el.element_type in SHOULD_OCR
            ):
                continue
            iw = min(ob[2], el.bbox[2]) - max(ob[0], el.bbox[0])
            ih = min(ob[3], el.bbox[3]) - max(ob[1], el.bbox[1])
            if iw > OCR_MATCH_MIN_PIXELS and ih > OCR_MATCH_MIN_PIXELS:
                crop = upright[
                    max(int(ob[1]), 0) : min(int(ob[3]), h),
                    max(int(ob[0]), 0) : min(int(ob[2]), w),
                ]
                if crop.size == 0:
                    continue
                text, _conf = recognize_crop(crop, cfg)
                if text:
                    el.ocr_boxes.append(np.asarray(ob, dtype=np.float32))
                    el.ocr_texts.append(text)
                matched[k] = True

    # fallback block OCR (structure.rs:1551-1607): a text-bearing
    # layout block with NO matched text gets one whole-block
    # recognition pass — a block whose inner detections all failed
    # would otherwise yield silent empty text. Excluded: the
    # specialized types (formula/table/seal, is_excluded_layout
    # structure.rs:1430-1438) and vision blocks (image/chart).
    for el in elements:
        t = el.element_type
        if (
            t in SHOULD_OCR
            and t not in EXCLUDED_FROM_OCR_LABELS
            and t not in ("formula", "image", "chart")
            and not el.ocr_texts
        ):
            crop = upright[
                max(int(el.bbox[1]), 0) : min(int(el.bbox[3]), h),
                max(int(el.bbox[0]), 0) : min(int(el.bbox[2]), w),
            ]
            if crop.size == 0:
                continue
            text, _conf = recognize_crop(crop, cfg)
            if text:
                el.ocr_boxes.append(np.asarray(el.bbox, dtype=np.float32))
                el.ocr_texts.append(text)

    # orphan OCR regions → new text elements (stitching.rs:165-293),
    # unless covered by an image element (ioa > 0.5) or a table
    # (ioa > 0.3 — text-in-table suppression, stitching.rs:229-247;
    # cell text is recognized by the table analyzer instead)
    for k, ob in enumerate(ocr_boxes):
        if matched[k]:
            continue
        area = max((ob[2] - ob[0]) * (ob[3] - ob[1]), 1.0)
        covered = False
        for el in elements:
            # tables/seals recognize their own content (text-in-table
            # suppression stitching.rs:229-247; seal-overlap marking
            # stitching.rs:155-163); image-covered text is dropped
            if el.element_type not in ("image", "table", "seal"):
                continue
            iw = max(min(ob[2], el.bbox[2]) - max(ob[0], el.bbox[0]), 0.0)
            ih = max(min(ob[3], el.bbox[3]) - max(ob[1], el.bbox[1]), 0.0)
            cutoff = 0.5 if el.element_type == "image" else 0.3
            if iw * ih / area > cutoff:
                covered = True
                break
        if covered:
            continue
        crop = upright[
            max(int(ob[1]), 0) : min(int(ob[3]), h),
            max(int(ob[0]), 0) : min(int(ob[2]), w),
        ]
        if crop.size == 0:
            continue
        text, _conf = recognize_crop(crop, cfg)
        if text:
            el = StructureElement(np.asarray(ob, dtype=np.float32), "text", 1.0)
            el.ocr_boxes.append(np.asarray(ob, dtype=np.float32))
            el.ocr_texts.append(text)
            elements.append(el)

    # table analysis (table_analyzer.rs:285-470): crop → grid structure
    # → in-crop OCR → cell matching → HTML
    for el in elements:
        if el.element_type == "table":
            el.html = _analyze_table(upright, el, cfg)

    # seal analysis (structure.rs:2009-2075): crop the seal region, run
    # poly-mode detection (sort_poly_boxes — y_min only,
    # sorting.rs:100-118), recognize, translate boxes back by the crop
    # offset, join texts
    for el in elements:
        if el.element_type == "seal":
            el.text = _analyze_seal(upright, el, cfg)

    # per-element text join (stitching.rs:1814-2000); seals keep their
    # poly-ordered join from _analyze_seal (EXCLUDED_FROM_OCR semantics)
    scfg = StitchConfig()
    for el in elements:
        el.num_lines = max(len(el.ocr_texts), 1)
        if el.ocr_texts and el.element_type not in EXCLUDED_FROM_OCR_LABELS:
            el.text = sort_and_join_texts(
                np.stack(el.ocr_boxes), el.ocr_texts, container_bbox=el.bbox, cfg=scfg
            )

    # enhanced reading order + 1-based order indices
    order = sort_layout_enhanced(
        [(el.bbox, el.element_type, el.num_lines) for el in elements], float(w), float(h)
    )
    ordered = [elements[i] for i in order]
    for rank, el in enumerate(ordered):
        el.order_index = rank + 1
    return ordered


def _analyze_table(upright: np.ndarray, el: StructureElement, cfg: ExtractConfig) -> str:
    """Table subtree — analyze_single_table
    (src/oarocr/table_analyzer.rs:285-760): crop → wired/wireless
    classification → mode selection (E2E structure vs cell detection,
    cells→html override) → structure tokens + cells → in-crop OCR →
    cross-cell box splitting + re-recognition
    (split_ocr_bboxes_by_table_cells, structure.rs:1630-1851) →
    cell↔OCR matching (stitching.rs:640-830) → per-cell x-sorted text
    join → HTML (table_structure_decode.rs:37-166)."""
    from .operators.table import (
        classify_table_type,
        detect_table_cells,
        get_overlapping_cells,
        split_box_by_cells,
        table_cells_to_html_structure,
    )
    from .operators.table import TableCell

    h, w = upright.shape
    x1 = max(int(el.bbox[0]), 0)
    y1 = max(int(el.bbox[1]), 0)
    x2 = min(int(el.bbox[2]), w)
    y2 = min(int(el.bbox[3]), h)
    crop = upright[y1:y2, x1:x2]
    if crop.size == 0:
        return ""

    # table orientation (table_analyzer.rs:353-384): classify the crop
    # and rotate it upright before structure analysis; detected cell
    # geometry maps back through rotate_back_to_original. The synthetic
    # orientation cue is the page anchor, which a table crop never
    # carries, so class 0 (no-op) is the fixture norm — the plumbing is
    # exercised by the rotated-crop unit test.
    from .models.synthetic import classify_orientation, correct_orientation

    table_rotation = classify_orientation(crop)
    if table_rotation:
        crop = correct_orientation(crop, table_rotation)

    # wired/wireless classification drives the mode flags
    # (table_analyzer.rs:386-417)
    ttype, _tconf = classify_table_type(crop)
    if ttype == "wired":
        use_e2e = cfg.use_e2e_wired_table_rec
        use_cells_trans = cfg.use_wired_table_cells_trans_to_html
    elif ttype == "wireless":
        use_e2e = cfg.use_e2e_wireless_table_rec
        use_cells_trans = cfg.use_wireless_table_cells_trans_to_html
    else:
        use_e2e = cfg.use_e2e_wireless_table_rec
        use_cells_trans = False

    # E2E structure recognition (SLANet stand-in)
    tokens: list[str] | None
    tokens, cells = table_structure_from_crop(crop)
    if not tokens:
        tokens = None

    # cell detection runs only when its boxes can be used — the
    # cells→html override (table_analyzer.rs:440-479). When use_e2e is
    # off and cells_trans is off, detected boxes would be discarded
    # (e2e_like is already False), so the second structure parse is
    # skipped; the already-computed cells are reused as the geometry.
    detected: list[np.ndarray] = []
    if use_cells_trans:
        detected, _dscores = detect_table_cells(crop, precomputed_cells=cells)
    if use_cells_trans and detected:
        # detected cells replace structure cells; tokens regenerate
        # from cell positions (table_analyzer.rs:610-625)
        cells = [TableCell(b, 0, 0) for b in detected]
        tokens = None
    if cells and tokens is None:
        gen = table_cells_to_html_structure([c.bbox for c in cells], 5.0)
        if gen is not None:
            gen_tokens, cell_order = gen
            reordered = []
            for src_idx, info in cell_order:
                c = cells[src_idx]
                c.row, c.col = info.row, info.col
                reordered.append(c)
            cells = reordered
            tokens = gen_tokens
    if not cells or tokens is None:
        return ""
    # E2E-like iff E2E structure recognition ran and no cell-detection
    # override replaced its cells (table_analyzer.rs:626-640); it gates
    # the matching strategy and the cross-cell split below
    e2e_like = use_e2e and not detected

    boxes, _scores = detect_page(crop, cfg)
    ch, cw = crop.shape

    def rec_box(ob) -> tuple[str, float] | None:
        bx1, by1 = max(int(np.floor(ob[0])), 0), max(int(np.floor(ob[1])), 0)
        bx2, by2 = min(int(np.ceil(ob[2])), cw), min(int(np.ceil(ob[3])), ch)
        if bx2 - bx1 <= 1 or by2 - by1 <= 1:
            return None
        sub = crop[by1:by2, bx1:bx2]
        if sub.size == 0:
            return None
        return recognize_crop(sub, cfg)

    # cross-cell OCR splitting + re-recognition: a box covering >= 2
    # cells (inter/cell_area > 0.5) is split at cell x-edges and each
    # segment recognized separately (structure.rs:1630-1851); E2E-like
    # tables skip the split (stitching.rs:434-438 enable gate)
    cell_boxes = [c.bbox for c in cells]
    ocr_boxes: list[np.ndarray] = []
    ocr_texts: list[str] = []
    for ob in boxes:
        pieces = [ob]
        if not e2e_like:
            overl = get_overlapping_cells(ob, cell_boxes)
            if len(overl) >= 2:
                pieces = split_box_by_cells(ob, overl, cell_boxes)
        for piece in pieces:
            rec = rec_box(piece)
            if rec is None:
                continue
            text, _conf = rec
            if text:
                ocr_boxes.append(np.asarray(piece, dtype=np.float32))
                ocr_texts.append(text)

    # matching strategy per mode (stitching.rs:536-546): E2E-like uses
    # the PaddleX distance + positive-IoU requirement; cell-detection
    # mode allows nearest-cell assignment at IoU=0 with L1 distance
    assign = match_cells_and_ocr(
        cells,
        ocr_boxes,
        require_positive_iou=e2e_like,
        use_paddlex_distance=e2e_like,
    )
    scfg = StitchConfig()
    cell_texts: list[str | None] = []
    for ci, cell in enumerate(cells):  # row-major / token order
        ks = assign.get(ci, [])
        if ks:
            cell_texts.append(
                sort_and_join_texts(
                    np.stack([ocr_boxes[k] for k in ks]),
                    [ocr_texts[k] for k in ks],
                    container_bbox=cell.bbox,
                    cfg=scfg,
                )
            )
        else:
            cell_texts.append(None)
    return wrap_table_html_with_content(tokens, cell_texts)


def _analyze_seal(upright: np.ndarray, el: StructureElement, cfg: ExtractConfig) -> str:
    """Seal subtree (structure.rs:2009-2075): crop → seal-config Poly
    text detection (thresh .2 / box .6 / unclip 0.5 / side 736 min,
    ocr.rs:332-350; BoxType::Poly, text_detection_adapter.rs:152-160)
    → sort_poly_boxes order → recognize → boxes translated back by the
    crop offset (geometry.rs:109) → space-joined text."""
    from .local_ref import ExtractConfig as _Cfg
    from .local_ref import detect_page_polys
    from .operators.geometry import translate_boxes
    from .operators.sorting import sort_poly_boxes

    h, w = upright.shape
    x1 = max(int(el.bbox[0]), 0)
    y1 = max(int(el.bbox[1]), 0)
    x2 = min(int(el.bbox[2]), w)
    y2 = min(int(el.bbox[3]), h)
    crop = upright[y1:y2, x1:x2]
    if crop.size == 0:
        return ""
    seal_cfg = _Cfg.for_text_type("seal")
    polys, _s = detect_page_polys(crop, seal_cfg)
    if len(polys) == 0:
        return ""
    boxes = np.stack(
        [
            [p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max()]
            for p in polys
        ]
    ).astype(np.float32)
    order = sort_poly_boxes(boxes)
    texts: list[str] = []
    page_boxes = translate_boxes(boxes, x1, y1)  # back to page coords
    for i in order:
        bx1, by1, bx2, by2 = (int(v) for v in boxes[i])
        sub = crop[max(by1, 0) : min(by2, crop.shape[0]), max(bx1, 0) : min(bx2, crop.shape[1])]
        if sub.size == 0:
            continue
        t, _c = recognize_crop(sub, cfg)
        if t:
            texts.append(t)
    el.ocr_boxes = [page_boxes[i] for i in order]
    el.ocr_texts = list(texts)
    return " ".join(texts)


CONTINUATION_TEXT_TYPES = ("text", "doc_title", "paragraph_title", "abstract", "reference")


def calculate_continuation_flags(
    elements: list[StructureElement], page_width: float | None = None
) -> tuple[bool, bool]:
    """(paragraph_start, paragraph_end) for multi-page concatenation.

    Port of StructureResult::calculate_continuation_flags
    (domain/structure.rs:851-898): over the text-like elements only,
    paragraph_start = first element begins at the left margin
    (x_min <= 5% of page width — is_new_paragraph_start, :1188-1192);
    paragraph_end = last element stops before the right margin
    (x_max <= 90% of page width — is_paragraph_complete, :1198-1209).
    """
    if not elements:
        return True, True
    if page_width is None:
        page_width = max(float(el.bbox[2]) for el in elements)
    text_els = [el for el in elements if el.element_type in CONTINUATION_TEXT_TYPES]
    if not text_els:
        return True, True
    start_threshold = page_width * 0.05 if page_width else 50.0
    paragraph_start = float(text_els[0].bbox[0]) <= start_threshold
    if page_width:
        paragraph_end = float(text_els[-1].bbox[2]) <= page_width * 0.9
    else:
        paragraph_end = True
    return paragraph_start, paragraph_end


_CJK_RANGES = (
    # is_chinese_char, domain/structure.rs:1403-1415: Unified Ideographs
    # + Extensions A-F
    (0x4E00, 0x9FFF),
    (0x3400, 0x4DBF),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F),
    (0x2B740, 0x2B81F),
    (0x2B820, 0x2CEAF),
    (0x2CEB0, 0x2EBEF),
)


def _is_chinese_char(c: str) -> bool:
    if len(c) != 1:
        return False
    cp = ord(c)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def concatenate_markdown_pages(pages: list[tuple[str, tuple[bool, bool]]]) -> str:
    """Multi-page markdown concat honoring PageContinuationFlags.

    Port of concatenate_markdown_pages (domain/structure.rs:1223-1283):
    pages = [(markdown, (paragraph_start, paragraph_end))] in page
    order. A page whose first paragraph continues the previous page's
    unfinished paragraph is joined with a single space (direct concat
    when either side is Chinese); otherwise pages join with a blank
    line. Empty pages only forward their end flag.

    Deliberate deviation: the reference's single-page early return
    (structure.rs:1228-1230) emits the page UNstripped while the
    multi-page path trims; this port strips in both branches so the
    Python twin stays value-identical with the Catalyst fold in
    pipeline_structure.document_markdown (which applies its final trim
    unconditionally)."""
    if not pages:
        return ""
    if len(pages) == 1:
        return pages[0][0].strip()
    markdown = ""
    prev_end = True
    for page_md, (p_start, p_end) in pages:
        if not page_md.strip():
            prev_end = p_end
            continue
        if (not p_start) and (not prev_end):
            last = markdown[-1] if markdown else ""
            first = page_md[0] if page_md else ""
            if not (_is_chinese_char(last) or _is_chinese_char(first)):
                markdown += " " + page_md.lstrip()
            else:
                markdown += page_md.lstrip()
        else:
            if markdown:
                markdown += "\n\n"
            markdown += page_md
        prev_end = p_end
    return markdown.strip()


def _escape_html(text: str) -> str:
    """StructureResult::escape_html (domain/structure.rs:1043-1049)."""
    return (
        text.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&#39;")
    )


def simplify_table_html(html: str) -> str:
    """Strip <html>/<body> wrappers (domain/structure.rs:1550-1555)."""
    return (
        html.replace("<html>", "")
        .replace("</html>", "")
        .replace("<body>", "")
        .replace("</body>", "")
    )


def elements_to_html(elements: list[StructureElement]) -> str:
    """Reading-order HTML fold — StructureResult::to_html
    (domain/structure.rs:903-1041): doc_title→h1, paragraph_title→h2,
    table→simplified bordered HTML, formula→$$ in a .formula p,
    image→figure, seal→figure.seal, figure_title→figcaption,
    header/footer→semantic tags, default→p; text HTML-escaped."""
    parts = ['<!DOCTYPE html>\n<html>\n<head>\n<meta charset="UTF-8">\n</head>\n<body>\n']
    for el in elements:
        t = el.element_type
        text = el.text or ""
        if t == "doc_title":
            parts.append(f"<h1>{_escape_html(text)}</h1>\n")
        elif t == "paragraph_title":
            parts.append(f"<h2>{_escape_html(text)}</h2>\n")
        elif t == "table":
            if el.html:
                styled = simplify_table_html(el.html).replace(
                    "<table>",
                    '<table border="1" style="border-collapse: collapse;">',
                    1,
                )
                parts.append(styled + "\n")
            else:
                parts.append("<p>[Table]</p>\n")
        elif t in ("formula", "formula_number"):
            parts.append(f'<p class="formula">$${_escape_html(text)}$$</p>\n')
        elif t in ("image", "chart"):
            cap = f"<figcaption>{_escape_html(text)}</figcaption>\n" if text else ""
            parts.append(f'<figure>\n<img alt="Figure" />\n{cap}</figure>\n')
        elif t == "seal":
            cap = f"<figcaption>{_escape_html(text)}</figcaption>\n" if text else ""
            parts.append(f'<figure class="seal">\n<img alt="Seal" />\n{cap}</figure>\n')
        elif t == "figure_title":
            if text:
                parts.append(f"<figcaption>{_escape_html(text)}</figcaption>\n")
        elif t in ("header", "header_image"):
            parts.append(f"<header>{_escape_html(text)}</header>\n")
        elif t in ("footer", "footer_image"):
            parts.append(f"<footer>{_escape_html(text)}</footer>\n")
        elif text:
            parts.append(f"<p>{_escape_html(text)}</p>\n")
    parts.append("</body>\n</html>")
    return "".join(parts)


def elements_to_markdown(elements: list[StructureElement]) -> str:
    """Reading-order markdown fold — to_markdown
    (domain/structure.rs:471-850): doc_title → '# ', paragraph_title →
    voted heading level (semantic numbering + line-height/indent
    k-means, structure.rs:118-297), figure_title → italic caption,
    image → figure placeholder, tables → HTML, formulas → $$…$$,
    header/footer excluded."""
    from .operators.text_refine import infer_paragraph_title_levels

    title_inputs = [
        (i, el.bbox, el.num_lines, el.text)
        for i, el in enumerate(elements)
        if el.element_type == "paragraph_title"
    ]
    title_levels = infer_paragraph_title_levels(title_inputs)
    parts: list[str] = []
    for i, el in enumerate(elements):
        t = el.element_type
        if t in ("header", "footer", "header_image", "footer_image"):
            continue
        if t == "doc_title":
            parts.append(f"# {el.text}")
        elif t == "paragraph_title":
            level = title_levels.get(i, 2)
            parts.append(f"{'#' * level} {el.text}")
        elif t == "table":
            if el.html:
                parts.append(el.html)
        elif t == "formula":
            if el.text:
                parts.append(f"$${el.text}$$")
        elif t == "image":
            parts.append("![figure]")
        elif t == "figure_title":
            parts.append(f"*{el.text}*")
        elif el.text:
            parts.append(el.text)
    return "\n\n".join(parts)


def structure_page_record(
    media_ref: str, cfg
) -> tuple[list[StructureElement], str, str, bool, bool]:
    """Full per-page structure record for one media_ref: (elements,
    markdown, html, para_start, para_end).

    The ONE per-page implementation both the Spark structure UDF
    (pipeline_structure.extract_structure) and the golden generator
    (tools/make_goldens.py) call — the structure-track analog of
    local_ref.detect_and_crop (CLAUDE.md determinism invariant).

    Page width for the continuation heuristics prefers the actual image
    width over the max-element fallback (structure.rs:858-868);
    elements live in upright coords, so the orientation swap is undone.
    """
    from .fixtures.render_structure import render_structure_page
    from .models.synthetic import classify_orientation

    img = render_structure_page(media_ref)
    els = extract_structure_page(img, cfg)
    k = classify_orientation(img)
    upright_w = img.shape[1] if k % 2 == 0 else img.shape[0]
    p_start, p_end = calculate_continuation_flags(els, page_width=float(upright_w))
    return els, elements_to_markdown(els), elements_to_html(els), p_start, p_end
