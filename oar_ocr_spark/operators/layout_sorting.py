"""Enhanced layout sorting — the `xycut_enhanced` reading order.

Faithful port of /root/reference/oar-ocr-core/src/processors/layout_sorting.rs
(itself a port of PaddleX's xycut_enhanced):

1. header/footer separation (y-sorted, placed first/last) — :175-199
2. cross-layout detection (column-spanning blocks) — :309-488
3. direction-aware XY-cut (single-column ⇒ X-first, multi ⇒ Y-first)
   with overlap shrinking before projection — :275-307, :530-660
4. weighted-distance insertion of DocTitle/Vision/VisionTitle/Cross
   blocks (EDGE_WEIGHT 1e4, UP 1, LEFT 2, 50px edge quantization,
   2px tolerance) — :760-860
5. manhattan insertion of unordered blocks — :744-758
6. child-block association (vision titles moved next to their vision
   parent when nearest edge distance < 3·line height) — :664-742

This is the single most semantics-critical operator for span `order`
equality in the structure track (SURVEY.md §2.5). It runs per document
inside the order UDF — element counts are ~10², so plain python with
numpy helpers is the right tool.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .layout_types import order_label
from .sorting import sort_by_xycut

__all__ = ["SortableBlock", "sort_layout_enhanced"]

EDGE_DISTANCE_COMPARE_TOLERANCE_LEN = 2.0
EDGE_WEIGHT = 10000.0
UP_EDGE_WEIGHT = 1.0
LEFT_EDGE_WEIGHT = 2.0
CROSS_LAYOUT_REF_TEXT_BLOCK_WORDS_NUM_THRESHOLD = 10.0

MASK_LABELS = ("doc_title", "cross_layout", "cross_reference")


@dataclass
class SortableBlock:
    """layout_sorting.rs:86-150."""

    bbox: np.ndarray  # [x1, y1, x2, y2] float32
    original_index: int
    element_type: str
    num_lines: int = 1
    order_label: str = field(init=False)
    direction: str = field(init=False)  # "horizontal" | "vertical"
    text_line_height: float = field(init=False)

    def __post_init__(self) -> None:
        self.bbox = np.asarray(self.bbox, dtype=np.float32).reshape(4).copy()
        self.order_label = order_label(self.element_type)
        w, h = self.width(), self.height()
        self.direction = "horizontal" if w >= h else "vertical"
        self.num_lines = max(int(self.num_lines or 1), 1)
        self.text_line_height = h / self.num_lines if self.num_lines > 0 else h

    def width(self) -> float:
        return float(self.bbox[2] - self.bbox[0])

    def height(self) -> float:
        return float(self.bbox[3] - self.bbox[1])

    def area(self) -> float:
        return self.width() * self.height()

    def center(self) -> tuple[float, float]:
        return (
            float(self.bbox[0] + self.bbox[2]) / 2.0,
            float(self.bbox[1] + self.bbox[3]) / 2.0,
        )

    def long_side(self) -> float:
        return max(self.width(), self.height())


def _proj_overlap_ratio(b1: np.ndarray, b2: np.ndarray, direction: str) -> float:
    """1-D projection IoU along an axis (layout_sorting.rs:920-943)."""
    if direction == "horizontal":
        min1, max1, min2, max2 = b1[0], b1[2], b2[0], b2[2]
    else:
        min1, max1, min2, max2 = b1[1], b1[3], b2[1], b2[3]
    inter = max(min(max1, max2) - max(min1, min2), 0.0)
    union = max(max1, max2) - min(min1, min2)
    return float(inter / union) if union > 0 else 0.0


def _overlap_ratio(a: np.ndarray, b: np.ndarray) -> float:
    """IoA: intersection / area(a) (sorting.rs:548-565)."""
    iw = max(min(a[2], b[2]) - max(a[0], b[0]), 0.0)
    ih = max(min(a[3], b[3]) - max(a[1], b[1]), 0.0)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    return float(iw * ih / area_a) if area_a > 0 else 0.0


def sort_layout_enhanced(
    elements: list[tuple[np.ndarray, str, int | None]], page_width: float, page_height: float
) -> list[int]:
    """elements: [(bbox, element_type, num_lines)] → original indices in
    reading order (layout_sorting.rs:160-199)."""
    if not elements:
        return []
    blocks = [
        SortableBlock(bbox, i, etype, num_lines or 1)
        for i, (bbox, etype, num_lines) in enumerate(elements)
    ]
    headers = [b for b in blocks if b.order_label == "header"]
    footers = [b for b in blocks if b.order_label == "footer"]
    main = [b for b in blocks if b.order_label not in ("header", "footer")]
    headers.sort(key=lambda b: float(b.bbox[1]))
    footers.sort(key=lambda b: float(b.bbox[1]))
    sorted_main = _sort_main_blocks(main, page_width)
    return (
        [b.original_index for b in headers]
        + [b.original_index for b in sorted_main]
        + [b.original_index for b in footers]
    )


def _sort_main_blocks(blocks: list[SortableBlock], page_width: float) -> list[SortableBlock]:
    """layout_sorting.rs:210-273."""
    if not blocks:
        return blocks
    _detect_cross_layout(blocks, page_width)

    xy_cut_blocks: list[SortableBlock] = []
    doc_titles: list[SortableBlock] = []
    weighted: list[SortableBlock] = []
    unordered: list[SortableBlock] = []
    for b in blocks:
        if b.order_label in ("cross_layout", "cross_reference", "vision", "vision_title"):
            weighted.append(b)
        elif b.order_label == "doc_title":
            doc_titles.append(b)
        elif b.order_label == "unordered":
            unordered.append(b)
        else:
            xy_cut_blocks.append(b)

    sorted_blocks = _direction_aware_xycut(xy_cut_blocks) if xy_cut_blocks else []

    doc_titles.sort(key=lambda b: float(b.bbox[1]))
    for i, b in enumerate(doc_titles):
        if i == 0 and not sorted_blocks:
            sorted_blocks.append(b)
        elif i == 0:
            sorted_blocks.insert(0, b)
        else:
            _weighted_distance_insert(b, sorted_blocks, "horizontal")

    weighted.sort(key=lambda b: float(b.bbox[1]))
    for b in weighted:
        _weighted_distance_insert(b, sorted_blocks, "horizontal")

    unordered.sort(key=lambda b: float(b.bbox[1]))
    for b in unordered:
        _manhattan_insert(b, sorted_blocks)

    _associate_child_blocks(sorted_blocks)
    return sorted_blocks


def _direction_aware_xycut(blocks: list[SortableBlock]) -> list[SortableBlock]:
    """layout_sorting.rs:275-307."""
    bboxes = np.stack([b.bbox for b in blocks])
    max_text_lines = max(b.num_lines for b in blocks)
    discontinuous = _discontinuous_projection(bboxes, "horizontal")
    _shrink_overlapping_boxes(blocks, "vertical")
    shrunk = np.stack([b.bbox for b in blocks])
    if len(discontinuous) == 1 or max_text_lines == 1:
        idx = sort_by_xycut(shrunk, "horizontal", 1)
    else:
        idx = sort_by_xycut(shrunk, "vertical", 1)
    return [blocks[i] for i in idx]


def _discontinuous_projection(bboxes: np.ndarray, direction: str) -> list[tuple[int, int]]:
    """Merged projection intervals (layout_sorting.rs:494-527)."""
    if len(bboxes) == 0:
        return []
    if direction == "horizontal":
        iv = [(int(b[0]), int(b[2])) for b in bboxes]
    else:
        iv = [(int(b[1]), int(b[3])) for b in bboxes]
    iv.sort(key=lambda t: t[0])
    merged = []
    cs, ce = iv[0]
    for s, e in iv[1:]:
        if s <= ce:
            ce = max(ce, e)
        else:
            merged.append((cs, ce))
            cs, ce = s, e
    merged.append((cs, ce))
    return merged


def _shrink_overlapping_boxes(blocks: list[SortableBlock], direction: str) -> None:
    """Split slightly-overlapping consecutive boxes at the overlap
    midpoint (layout_sorting.rs:529-660)."""
    if len(blocks) < 2:
        return
    if direction == "vertical":
        blocks.sort(key=lambda b: float(b.bbox[3]))
    else:
        blocks.sort(key=lambda b: float(b.bbox[2]))
    perp = "horizontal" if direction == "vertical" else "vertical"
    for i in range(len(blocks) - 1):
        a, c = blocks[i], blocks[i + 1]
        cut_iou = _proj_overlap_ratio(a.bbox, c.bbox, direction)
        match_iou = _proj_overlap_ratio(a.bbox, c.bbox, perp)
        if direction == "vertical":
            y2, y1p = float(a.bbox[3]), float(c.bbox[1])
            if (match_iou > 0.0 and 0.0 < cut_iou < 0.1) or y2 == y1p or abs(y2 - y1p) <= 3.0:
                omin = max(float(a.bbox[1]), float(c.bbox[1]))
                omax = min(float(a.bbox[3]), float(c.bbox[3]))
                split = np.floor((omin + omax) / 2.0)
                if float(a.bbox[1]) < float(c.bbox[1]):
                    a.bbox[3] = split - 1.0
                    c.bbox[1] = split + 1.0
                else:
                    a.bbox[1] = split - 1.0
                    c.bbox[3] = split + 1.0
        else:
            x2, x1p = float(a.bbox[2]), float(c.bbox[0])
            if (match_iou > 0.0 and 0.0 < cut_iou < 0.1) or x2 == x1p or abs(x2 - x1p) <= 3.0:
                omin = max(float(a.bbox[0]), float(c.bbox[0]))
                omax = min(float(a.bbox[2]), float(c.bbox[2]))
                split = np.floor((omin + omax) / 2.0)
                if float(a.bbox[0]) < float(c.bbox[0]):
                    a.bbox[2] = split - 1.0
                    c.bbox[0] = split + 1.0
                else:
                    a.bbox[0] = split - 1.0
                    c.bbox[2] = split + 1.0


def _detect_cross_layout(blocks: list[SortableBlock], page_width: float) -> None:
    """Mark column-spanning blocks cross_layout / cross_reference
    (layout_sorting.rs:309-488, PaddleX get_layout_structure)."""
    if len(blocks) < 2:
        return
    blocks.sort(key=lambda b: (float(b.bbox[0]), b.width()))
    n = len(blocks)
    data = [(b.bbox.copy(), b.order_label, b.area(), b.long_side()) for b in blocks]
    line_heights = [b.text_line_height for b in blocks]
    h_proj = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for j in range(n):
            h_proj[i, j] = _proj_overlap_ratio(data[i][0], data[j][0], "horizontal")
    h_neighbors = [
        [j for j in range(n) if j != i and h_proj[i, j] > 0.0] for i in range(n)
    ]

    for bi in range(n):
        if data[bi][1] in MASK_LABELS:
            continue
        mark = False
        for ri in h_neighbors[bi]:
            if data[ri][1] in MASK_LABELS:
                continue
            if blocks[ri].order_label == "cross_layout":
                continue
            if blocks[bi].order_label == "cross_layout":
                break
            bbox_overlap = _overlap_ratio(data[bi][0], data[ri][0])
            if bbox_overlap > 0.0:
                if data[ri][1] == "vision":
                    blocks[ri].order_label = "cross_layout"
                    continue
                if bbox_overlap > 0.1 and data[bi][2] < data[ri][2]:
                    mark = True
                    break
            for si in h_neighbors[bi]:
                if si == ri or data[si][1] in MASK_LABELS:
                    continue
                if blocks[si].order_label == "cross_layout":
                    continue
                bbox_overlap2 = _overlap_ratio(data[bi][0], data[si][0])
                if bbox_overlap2 > 0.1:
                    if data[si][1] == "vision":
                        blocks[si].order_label = "cross_layout"
                        continue
                    if data[bi][1] == "vision" or data[bi][2] < data[si][2]:
                        mark = True
                        break
                ref_match_proj = h_proj[ri, si]
                secondary_ref_match = _proj_overlap_ratio(data[ri][0], data[si][0], "vertical")
                if ref_match_proj == 0.0 and secondary_ref_match > 0.0:
                    if data[bi][1] == "vision":
                        mark = True
                        break
                    if (
                        data[ri][1] == "normal_text"
                        and data[si][1] == "normal_text"
                        and data[ri][3]
                        > line_heights[ri] * CROSS_LAYOUT_REF_TEXT_BLOCK_WORDS_NUM_THRESHOLD
                        and data[si][3]
                        > line_heights[si] * CROSS_LAYOUT_REF_TEXT_BLOCK_WORDS_NUM_THRESHOLD
                    ):
                        mark = True
                        break
            if mark:
                break
        if mark:
            blocks[bi].order_label = (
                "cross_reference" if data[bi][1] == "reference" else "cross_layout"
            )


def _get_weights(label: str, direction: str) -> list[float]:
    """layout_sorting.rs:862-878."""
    if label == "doc_title":
        return [1.0, 0.1, 0.1, 1.0] if direction == "horizontal" else [0.2, 0.1, 1.0, 1.0]
    if label in ("paragraph_title", "vision", "vision_title", "cross_layout"):
        return [1.0, 1.0, 0.1, 1.0]
    return [1.0, 1.0, 1.0, 0.1]


def _nearest_edge_distance(b1: np.ndarray, b2: np.ndarray, weights: list[float]) -> float:
    """layout_sorting.rs:881-917."""
    h = _proj_overlap_ratio(b1, b2, "horizontal")
    v = _proj_overlap_ratio(b1, b2, "vertical")
    if h > 0.0 and v > 0.0:
        return 0.0
    min_x = min_y = 0.0
    if h == 0.0:
        d1 = abs(float(b1[0]) - float(b2[2]))
        d2 = abs(float(b1[2]) - float(b2[0]))
        w = weights[0] if float(b1[2]) < float(b2[0]) else weights[1]
        min_x = min(d1, d2) * w
    if v == 0.0:
        d1 = abs(float(b1[1]) - float(b2[3]))
        d2 = abs(float(b1[3]) - float(b2[1]))
        w = weights[2] if float(b1[3]) < float(b2[1]) else weights[3]
        min_y = min(d1, d2) * w
    return min_x + min_y


def _manhattan_insert(block: SortableBlock, sorted_blocks: list[SortableBlock]) -> None:
    """layout_sorting.rs:744-758."""
    if not sorted_blocks:
        sorted_blocks.append(block)
        return
    best = min(
        range(len(sorted_blocks)),
        key=lambda i: abs(float(block.bbox[0]) - float(sorted_blocks[i].bbox[0]))
        + abs(float(block.bbox[1]) - float(sorted_blocks[i].bbox[1])),
    )
    sorted_blocks.insert(best + 1, block)


def _weighted_distance_insert(
    block: SortableBlock, sorted_blocks: list[SortableBlock], region_direction: str
) -> None:
    """layout_sorting.rs:760-860 (PaddleX weighted_distance_insert)."""
    if not sorted_blocks:
        sorted_blocks.append(block)
        return
    tol = EDGE_DISTANCE_COMPARE_TOLERANCE_LEN
    x1, y1, x2 = float(block.bbox[0]), float(block.bbox[1]), float(block.bbox[2])
    min_weighted = np.inf
    min_up_edge = np.inf
    nearest = 0
    for idx, sb in enumerate(sorted_blocks):
        x1p, y1p, x2p, y2p = (float(v) for v in sb.bbox)
        weights = _get_weights(block.order_label, block.direction)
        raw_edge = _nearest_edge_distance(block.bbox, sb.bbox, weights)
        edge = np.floor(raw_edge / 50.0) * 50.0  # 50px quantization
        if region_direction == "horizontal":
            up_dist, left_dist = y1p, x1p
            is_below = y2p < y1
        else:
            up_dist, left_dist = -x2p, y1p
            is_below = x1p > x2
        is_special = block.order_label != "unordered"
        if is_special and is_below:
            up_dist = -up_dist
            left_dist = -left_dist
        if abs(min_up_edge - up_dist) <= tol:
            up_dist = min_up_edge
        weighted = edge * EDGE_WEIGHT + up_dist * UP_EDGE_WEIGHT + left_dist * LEFT_EDGE_WEIGHT
        min_up_edge = min(min_up_edge, up_dist)
        if weighted < min_weighted:
            min_weighted = weighted
            y1_i = int(np.floor(y1)) // 2
            y1p_i = int(np.floor(y1p)) // 2
            if abs(y1_i - y1p_i) > 0:
                sorted_val, block_val = y1p, y1
            elif region_direction == "horizontal":
                x1_i = int(np.floor(x1)) // 2
                x2_i = int(np.floor(x2)) // 2
                if abs(x1_i - x2_i) > 0:
                    sorted_val, block_val = x1p, x1
                else:
                    cx, cy = block.center()
                    scx, scy = sb.center()
                    sorted_val, block_val = scx * scx + scy * scy, cx * cx + cy * cy
            else:
                sorted_val, block_val = x1p, x1
            nearest = idx + 1 if block_val > sorted_val else idx
    nearest = min(nearest, len(sorted_blocks))
    sorted_blocks.insert(nearest, block)


def _associate_child_blocks(sorted_blocks: list[SortableBlock]) -> None:
    """Move vision titles next to their nearest vision parent
    (layout_sorting.rs:664-742)."""
    if len(sorted_blocks) < 2:
        return
    moves: list[tuple[int, int]] = []
    for i, b in enumerate(sorted_blocks):
        if b.order_label != "vision_title":
            continue
        best_j, best_d = None, np.inf
        for j, other in enumerate(sorted_blocks):
            if other.order_label != "vision":
                continue
            d = _nearest_edge_distance(b.bbox, other.bbox, [1.0, 1.0, 1.0, 1.0])
            if d < best_d:
                best_d, best_j = d, j
        if best_j is not None and best_d < sorted_blocks[best_j].text_line_height * 3.0:
            if float(b.bbox[1]) < float(sorted_blocks[best_j].bbox[1]):
                moves.append((i, best_j))
            else:
                moves.append((i, best_j + 1))
    for from_idx, target in reversed(moves):
        if from_idx == target or from_idx + 1 == target:
            continue
        blk = sorted_blocks.pop(from_idx)
        adjusted = target - 1 if from_idx < target else target
        sorted_blocks.insert(min(adjusted, len(sorted_blocks)), blk)
