"""Table analysis: grid clustering, cell↔OCR matching, HTML assembly.

Parity targets (reference = GreatV/oar-ocr at /root/reference):
- cluster_positions (1-D tolerance clustering → cluster means) and
  nearest_index: src/oarocr/table_analyzer.rs:79-119.
- cell↔OCR matching (center-in-cell + IoA > 0.7 fast path, then cost
  (1 − IoU, distance) with 1e-4 epsilon tiebreaks and lowest-index
  preference; PaddleX distance = L1 of corners + min(L1 of top-left,
  L1 of bottom-right)): src/oarocr/stitching.rs:640-760, 1465-1490.
- structure tokens + HTML assembly (<tr>/<td></td> stream, td_index
  fill): oar-ocr-core/src/processors/table_structure_decode.rs:37-166.

The synthetic SLANet stand-in parses the grid-line intensity channel
of rendered table crops (table_structure_from_crop).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "TableCell",
    "cluster_positions",
    "nearest_index",
    "paddlex_distance",
    "l1_distance",
    "match_cells_and_ocr",
    "structure_tokens",
    "wrap_table_html_with_content",
    "table_structure_from_crop",
    "classify_table_type",
    "detect_table_cells",
    "table_cells_to_html_structure",
    "get_overlapping_cells",
    "split_box_by_cells",
    "combine_rectangles_kmeans",
    "reprocess_table_cells_with_ocr",
]

TABLE_GRID = 190  # grid-line intensity in synthetic table renders


@dataclass
class TableCell:
    bbox: np.ndarray
    row: int
    col: int
    texts: list[str] = field(default_factory=list)


def cluster_positions(positions: list[float], tolerance: float) -> list[float]:
    """Chain-cluster sorted positions within `tolerance` of the last
    member; emit cluster means (table_analyzer.rs:79-105)."""
    if not positions:
        return []
    pos = sorted(positions)
    out: list[float] = []
    cluster = [pos[0]]
    for p in pos[1:]:
        if abs(p - cluster[-1]) <= tolerance:
            cluster.append(p)
        else:
            out.append(sum(cluster) / len(cluster))
            cluster = [p]
    out.append(sum(cluster) / len(cluster))
    return out


def nearest_index(positions: list[float], value: float) -> int:
    """table_analyzer.rs:107-118."""
    if not positions:
        return 0
    return min(range(len(positions)), key=lambda i: abs(positions[i] - value))


def l1_distance(b1: np.ndarray, b2: np.ndarray) -> float:
    """stitching.rs:1465-1473."""
    return float(sum(abs(float(b2[i]) - float(b1[i])) for i in range(4)))


def paddlex_distance(table_box: np.ndarray, ocr_box: np.ndarray) -> float:
    """stitching.rs:1476-1490."""
    x1, y1, x2, y2 = (float(v) for v in table_box)
    x3, y3, x4, y4 = (float(v) for v in ocr_box)
    dis = abs(x3 - x1) + abs(y3 - y1) + abs(x4 - x2) + abs(y4 - y2)
    dis2 = abs(x3 - x1) + abs(y3 - y1)
    dis3 = abs(x4 - x2) + abs(y4 - y2)
    return dis + min(dis2, dis3)


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(x2 - x1, 0.0), max(y2 - y1, 0.0)
    inter = iw * ih
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return float(inter / ua) if ua > 0 else 0.0


def _ioa(a: np.ndarray, b: np.ndarray) -> float:
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
    area = (a[2] - a[0]) * (a[3] - a[1])
    return float(inter / area) if area > 0 else 0.0


COST_EPS = 1e-4  # stitching.rs:733


def _is_better_cost(
    cand: tuple[float, float], cur: tuple[float, float], cand_idx: int, cur_idx: int | None
) -> bool:
    """stitching.rs:727-760."""
    if not (np.isfinite(cand[0]) and np.isfinite(cand[1])):
        return False
    if cur_idx is None or not (np.isfinite(cur[0]) and np.isfinite(cur[1])):
        return True
    if cand[0] + COST_EPS < cur[0]:
        return True
    if abs(cand[0] - cur[0]) <= COST_EPS:
        if cand[1] + COST_EPS < cur[1]:
            return True
        if abs(cand[1] - cur[1]) <= COST_EPS and cur_idx is not None:
            return cand_idx < cur_idx
    return False


def match_cells_and_ocr(
    cells: list[TableCell],
    ocr_boxes: list[np.ndarray],
    require_positive_iou: bool = True,
    use_paddlex_distance: bool = True,
) -> dict[int, list[int]]:
    """OCR candidate → cell assignment (stitching.rs:640-724).

    Strategy 1: box center inside a cell AND IoA(ocr, cell) > 0.7.
    Strategy 2: min (1 − IoU, distance) cost with epsilon tiebreaks.
    Returns {cell_idx: [candidate_idx…]} in candidate order.
    """
    out: dict[int, list[int]] = {}
    if not cells or not ocr_boxes:
        return out
    for k, ob in enumerate(ocr_boxes):
        cx = (float(ob[0]) + float(ob[2])) / 2.0
        cy = (float(ob[1]) + float(ob[3])) / 2.0
        center_cell = None
        for ci, cell in enumerate(cells):
            b = cell.bbox
            if (
                b[0] <= cx <= b[2]
                and b[1] <= cy <= b[3]
                and _ioa(ob, b) > 0.7
            ):
                center_cell = ci
                break
        if center_cell is not None:
            out.setdefault(center_cell, []).append(k)
            continue
        best_idx: int | None = None
        best_cost = (np.inf, np.inf)
        for ci, cell in enumerate(cells):
            iou = _iou(ob, cell.bbox)
            if require_positive_iou and iou <= 0.0:
                continue
            dist = (
                paddlex_distance(cell.bbox, ob)
                if use_paddlex_distance
                else l1_distance(ob, cell.bbox)
            )
            cost = (1.0 - iou, dist)
            if _is_better_cost(cost, best_cost, ci, best_idx):
                best_cost = cost
                best_idx = ci
        if best_idx is not None:
            out.setdefault(best_idx, []).append(k)
    return out


def structure_tokens(n_rows: int, n_cols: int) -> list[str]:
    """Plain-grid structure-token stream (the SLANet output shape,
    table_structure_decode.rs:407-540 for the simple no-span case)."""
    tokens: list[str] = []
    for _ in range(n_rows):
        tokens.append("<tr>")
        tokens.extend("<td></td>" for _ in range(n_cols))
        tokens.append("</tr>")
    return tokens


def wrap_table_html_with_content(
    tokens: list[str], cell_texts: list[str | None]
) -> str:
    """Token stream + ordered cell texts → HTML
    (table_structure_decode.rs:66-166, simple-token subset)."""
    parts = ["<html><body>"]
    has_table_tag = bool(tokens and "<table" in tokens[0])
    if not has_table_tag:
        parts.append("<table>")
    td_index = 0
    for tag in tokens:
        # fillable cell tokens include span-attributed ones,
        # e.g. '<td rowspan="2"></td>' (table_structure_decode.rs:66-166)
        if tag.startswith("<td") and tag.endswith("></td>"):
            parts.append(tag[: -len("</td>")])
            if td_index < len(cell_texts) and cell_texts[td_index]:
                parts.append(cell_texts[td_index])  # type: ignore[arg-type]
            parts.append("</td>")
            td_index += 1
        else:
            parts.append(tag)
    if not has_table_tag:
        parts.append("</table>")
    parts.append("</body></html>")
    return "".join(parts)


def _grid_lines(crop: np.ndarray) -> tuple[list[float], list[float]]:
    """Clustered (row_line_positions, col_line_positions) of the
    TABLE_GRID intensity channel; a full line spans most of the crop."""
    gy, gx = np.where(crop == TABLE_GRID)
    if gy.size == 0:
        return [], []
    h, w = crop.shape
    row_counts = np.bincount(gy, minlength=h)
    col_counts = np.bincount(gx, minlength=w)
    row_lines = np.flatnonzero(row_counts > 0.6 * w)
    col_lines = np.flatnonzero(col_counts > 0.6 * h)
    return (
        cluster_positions([float(v) for v in row_lines], 3.0),
        cluster_positions([float(v) for v in col_lines], 3.0),
    )


def classify_table_type(crop: np.ndarray) -> tuple[str, float]:
    """Wired vs wireless table classification (PP-LCNet stand-in —
    src/oarocr/table_analyzer.rs:386-404): wired tables carry full
    vertical grid lines, wireless ones only row separators. Confidence
    is the fraction of expected grid evidence present (deterministic
    function of pixels, per the synthetic-model contract)."""
    row_pos, col_pos = _grid_lines(crop)
    if len(col_pos) >= 2 and len(row_pos) >= 2:
        return "wired", 0.99
    if len(row_pos) >= 2:
        return "wireless", 0.95
    return "unknown", 0.5


def _text_column_ranges(crop: np.ndarray, y0: int, y1: int, min_gap: int = 5) -> list[tuple[int, int]]:
    """x-ranges of glyph columns inside rows [y0, y1): projection of
    the text mask (detection-foreground, non-grid) onto x, split at
    gaps >= min_gap (intra-cell separators are 3px; inter-column gaps
    are >= 8px in the synthetic corpus)."""
    band = crop[y0:y1]
    textish = (band < 178.5) & (band != TABLE_GRID)
    proj = textish.any(axis=0)
    xs = np.flatnonzero(proj)
    if xs.size == 0:
        return []
    ranges: list[tuple[int, int]] = []
    start = prev = int(xs[0])
    for x in xs[1:]:
        x = int(x)
        if x - prev >= min_gap:
            ranges.append((start, prev + 1))
            start = x
        prev = x
    ranges.append((start, prev + 1))
    return ranges


def table_structure_from_crop(crop: np.ndarray) -> tuple[list[str], list[TableCell]]:
    """Synthetic SLANet: parse grid-line intensities into
    (structure_tokens, cells). Wired tables (row+column lines) give the
    full grid directly. Wireless tables (row separators only — the
    SLANet-wireless case) infer column boundaries by clustering the
    text-column x-ranges across all rows (table_analyzer.rs
    cluster_positions approach, tolerance 3px). Returns ([], []) when
    no table structure is recognizable."""
    row_pos, col_pos = _grid_lines(crop)
    if len(row_pos) < 2:
        return [], []
    if len(col_pos) >= 2:
        n_rows, n_cols = len(row_pos) - 1, len(col_pos) - 1
        cells = [
            TableCell(
                np.asarray(
                    [col_pos[c], row_pos[r], col_pos[c + 1], row_pos[r + 1]], dtype=np.float32
                ),
                r,
                c,
            )
            for r in range(n_rows)
            for c in range(n_cols)
        ]
        return structure_tokens(n_rows, n_cols), cells
    # wireless: column starts clustered across rows; boundaries at the
    # midpoints between consecutive column ranges
    n_rows = len(row_pos) - 1
    starts: list[float] = []
    ends: list[float] = []
    per_row: list[list[tuple[int, int]]] = []
    for r in range(n_rows):
        rr = _text_column_ranges(crop, int(row_pos[r]) + 2, int(row_pos[r + 1]))
        per_row.append(rr)
        starts.extend(float(a) for a, _ in rr)
        ends.extend(float(b) for _, b in rr)
    col_starts = cluster_positions(starts, 6.0)
    if not col_starts:
        return [], []
    n_cols = len(col_starts)
    right = max(ends) if ends else float(crop.shape[1])
    bounds = [col_starts[0] - 2.0]
    for i in range(1, n_cols):
        bounds.append((col_starts[i - 1] + col_starts[i]) / 2.0)
    bounds.append(right + 2.0)
    cells = [
        TableCell(
            np.asarray([bounds[c], row_pos[r], bounds[c + 1], row_pos[r + 1]], dtype=np.float32),
            r,
            c,
        )
        for r in range(n_rows)
        for c in range(n_cols)
    ]
    return structure_tokens(n_rows, n_cols), cells


def detect_table_cells(
    crop: np.ndarray, precomputed_cells: list["TableCell"] | None = None
) -> tuple[list[np.ndarray], list[float]]:
    """Table cell detection (RT-DETR-L stand-in —
    domain/adapters/table_cell_detection_adapter.rs): emits one box per
    cell interior. Wired: interiors between grid lines. Wireless: row
    bands × clustered text columns. Scores are deterministic (0.9+).
    Returns (cell boxes in crop coords, scores).

    precomputed_cells lets a caller that already ran
    table_structure_from_crop on the same crop skip the second
    structure parse (the hot structure UDF does)."""
    if precomputed_cells is not None:
        cells = precomputed_cells
    else:
        _tokens, cells = table_structure_from_crop(crop)
    if not cells:
        return [], []
    boxes: list[np.ndarray] = []
    scores: list[float] = []
    for cell in cells:
        b = cell.bbox
        # interior: inset by the 2px grid-line thickness
        boxes.append(
            np.asarray([b[0] + 2.0, b[1] + 2.0, b[2], b[3]], dtype=np.float32)
        )
        scores.append(0.9 + ((cell.row * 7 + cell.col * 3) % 10) / 100.0)
    return boxes, scores


def table_cells_to_html_structure(
    cell_bboxes: list[np.ndarray], tolerance: float = 5.0
) -> tuple[list[str], list[tuple[int, "CellGridInfo"]]] | None:
    """Detected cell boxes → PaddleX-like structure tokens + row-major
    cell ordering with row/col spans. Port of
    table_cells_to_html_structure (src/oarocr/table_analyzer.rs:149-265):
    cluster x/y edges, snap each box to nearest grid indices, derive
    spans, walk the grid row-major emitting <td> tokens."""
    if not cell_bboxes:
        return None
    x_coords: list[float] = []
    y_coords: list[float] = []
    for b in cell_bboxes:
        x_coords.extend([float(b[0]), float(b[2])])
        y_coords.extend([float(b[1]), float(b[3])])
    x_positions = cluster_positions(x_coords, tolerance)
    y_positions = cluster_positions(y_coords, tolerance)
    if len(x_positions) < 2 or len(y_positions) < 2:
        return None
    num_rows = len(y_positions) - 1
    num_cols = len(x_positions) - 1
    entries: list[tuple[int, int, int, int, int]] = []  # (src, r0, c0, rs, cs)
    cell_map: dict[tuple[int, int], int] = {}
    for source_idx, b in enumerate(cell_bboxes):
        x1i = nearest_index(x_positions, float(b[0]))
        x2i = nearest_index(x_positions, float(b[2]))
        y1i = nearest_index(y_positions, float(b[1]))
        y2i = nearest_index(y_positions, float(b[3]))
        col_start = min(min(x1i, x2i), max(num_cols - 1, 0))
        col_end = min(max(x1i, x2i), num_cols)
        row_start = min(min(y1i, y2i), max(num_rows - 1, 0))
        row_end = min(max(y1i, y2i), num_rows)
        row_span = max(row_end - row_start, 1)
        col_span = max(col_end - col_start, 1)
        entry_idx = len(entries)
        entries.append((source_idx, row_start, col_start, row_span, col_span))
        for r in range(row_start, min(row_start + row_span, num_rows)):
            for c in range(col_start, min(col_start + col_span, num_cols)):
                cell_map.setdefault((r, c), entry_idx)
    tokens = ["<table>", "<tbody>"]
    cell_order: list[tuple[int, CellGridInfo]] = []
    for r in range(num_rows):
        tokens.append("<tr>")
        c = 0
        while c < num_cols:
            entry_idx = cell_map.get((r, c))
            if entry_idx is not None:
                src, r0, c0, rs, cs = entries[entry_idx]
                if r0 == r and c0 == c:
                    attrs = ""
                    if rs > 1:
                        attrs += f' rowspan="{rs}"'
                    if cs > 1:
                        attrs += f' colspan="{cs}"'
                    tokens.append(f"<td{attrs}></td>" if attrs else "<td></td>")
                    cell_order.append((src, CellGridInfo(r0, c0, rs, cs)))
                c += max(cs, 1)
            else:
                c += 1
        tokens.append("</tr>")
    tokens.append("</tbody>")
    tokens.append("</table>")
    return (tokens, cell_order) if cell_order else None


@dataclass
class CellGridInfo:
    row: int
    col: int
    row_span: int = 1
    col_span: int = 1


# --------------------------------------------------------------------------
# cross-cell OCR box splitting (split_ocr_bboxes_by_table_cells,
# src/oarocr/structure.rs:1630-1851; PaddleX-compatible)
# --------------------------------------------------------------------------

CELL_OVERLAP_IOU_THRESHOLD = 0.5  # structure.rs:40


def _overlap_ratio_box_over_cell(box: np.ndarray, cell: np.ndarray) -> float:
    """intersection / cell_area (structure.rs:1657-1676)."""
    x_left = max(float(box[0]), float(cell[0]))
    y_top = max(float(box[1]), float(cell[1]))
    x_right = min(float(box[2]), float(cell[2]))
    y_bottom = min(float(box[3]), float(cell[3]))
    if x_right <= x_left or y_bottom <= y_top:
        return 0.0
    inter = (x_right - x_left) * (y_bottom - y_top)
    cell_area = (float(cell[2]) - float(cell[0])) * (float(cell[3]) - float(cell[1]))
    return inter / cell_area if cell_area > 0 else 0.0


def get_overlapping_cells(
    ocr_box: np.ndarray,
    cells: list[np.ndarray],
    threshold: float = CELL_OVERLAP_IOU_THRESHOLD,
) -> list[int]:
    """Cells whose area is covered by the OCR box beyond `threshold`,
    sorted left-to-right by cell x1 (structure.rs:1678-1697)."""
    overlapping = [
        i for i, c in enumerate(cells) if _overlap_ratio_box_over_cell(ocr_box, c) > threshold
    ]
    overlapping.sort(key=lambda i: float(cells[i][0]))
    return overlapping


def split_box_by_cells(
    ocr_box: np.ndarray, cell_indices: list[int], cells: list[np.ndarray]
) -> list[np.ndarray]:
    """Split an OCR box vertically at its overlapped cells' x-edges:
    leading segment, per-cell overlap segments, inter-cell gaps,
    trailing segment; deduplicated (structure.rs:1699-1755)."""
    if not cell_indices:
        return [np.asarray(ocr_box, dtype=np.float32)]
    parts: list[tuple[float, float, float, float]] = []
    sel = [cells[i] for i in cell_indices]
    ox1, oy1, ox2, oy2 = (float(v) for v in ocr_box)
    if ox1 < float(sel[0][0]):
        parts.append((ox1, oy1, float(sel[0][0]), oy2))
    for i, cur in enumerate(sel):
        parts.append((max(ox1, float(cur[0])), oy1, min(ox2, float(cur[2])), oy2))
        if i + 1 < len(sel):
            nxt = sel[i + 1]
            if float(cur[2]) < float(nxt[0]):
                parts.append((float(cur[2]), oy1, float(nxt[0]), oy2))
    last = sel[-1]
    if float(last[2]) < ox2:
        parts.append((float(last[2]), oy1, ox2, oy2))
    seen: set[tuple[float, float, float, float]] = set()
    out: list[np.ndarray] = []
    for p in parts:
        if p not in seen:
            seen.add(p)
            out.append(np.asarray(p, dtype=np.float32))
    return out


# --------------------------------------------------------------------------
# cell-count reconciliation (reprocess_table_cells_with_ocr +
# combine_rectangles_kmeans, oar-ocr-core/src/processors/layout_utils.rs:
# 341-560; deterministic max-distance k-means init :572-640)
# --------------------------------------------------------------------------


def _kmeans_maxdist_init(points: np.ndarray, k: int) -> np.ndarray:
    """Deterministic k-means seeding (layout_utils.rs:572-640): first
    center = median-x point; each next = the point farthest from its
    nearest existing center."""
    n = len(points)
    if n == 0 or k == 0:
        return points[:0]
    if k >= n:
        return points.copy()
    order = np.argsort(points[:, 0], kind="stable")
    centers = [points[order[n // 2]]]
    for _ in range(1, k):
        c = np.asarray(centers)
        d = ((points[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).min(axis=1)
        total = float(d.sum())
        if total <= 0.0:
            fresh = next(
                (p for p in points if not any((p == cc).all() for cc in centers)), None
            )
            if fresh is None:
                break
            centers.append(fresh)
            continue
        centers.append(points[int(np.argmax(d))])
    return np.asarray(centers)


def combine_rectangles_kmeans(rectangles: list[np.ndarray], target_n: int) -> list[np.ndarray]:
    """Merge rectangles into <= target_n by k-means over box centers
    (10 Lloyd iterations, deterministic seeding); each cluster emits
    the union AABB of its members (layout_utils.rs:447-555)."""
    n = len(rectangles)
    if n == 0 or target_n == 0:
        return []
    if target_n >= n:
        return [np.asarray(r, dtype=np.float32) for r in rectangles]
    rects = np.stack([np.asarray(r, dtype=np.float64).reshape(4) for r in rectangles])
    points = np.stack(
        [(rects[:, 0] + rects[:, 2]) * 0.5, (rects[:, 1] + rects[:, 3]) * 0.5], axis=1
    )
    centers = _kmeans_maxdist_init(points, target_n)
    labels = np.zeros(n, dtype=np.int64)
    for _ in range(10):
        d = ((points[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        new_labels = d.argmin(axis=1)
        changed = bool((new_labels != labels).any())
        labels = new_labels
        for c in range(len(centers)):
            sel = labels == c
            if sel.any():
                centers[c] = points[sel].mean(axis=0)
        if not changed:
            break
    out: list[np.ndarray] = []
    for c in range(target_n):
        sel = labels == c
        if sel.any():
            grp = rects[sel]
            out.append(
                np.asarray(
                    [grp[:, 0].min(), grp[:, 1].min(), grp[:, 2].max(), grp[:, 3].max()],
                    dtype=np.float32,
                )
            )
    return out if out else [r.astype(np.float32) for r in rects]


def reprocess_table_cells_with_ocr(
    detected_cells: list[np.ndarray],
    detected_scores: list[float],
    ocr_boxes: list[np.ndarray],
    target_n: int,
) -> list[np.ndarray]:
    """Reconcile detected cell boxes with the structure model's expected
    cell count (layout_utils.rs:341-445): top-N by score when too many;
    OCR boxes not covered by any cell (cumulative IoA >= 0.6) are
    clustered in as supplements; falls back to clustering the OCR boxes
    when the result stays below 0.6 * target_n."""
    if target_n == 0:
        return []
    if not detected_cells:
        return combine_rectangles_kmeans(ocr_boxes, target_n)
    scores = (
        list(detected_scores)
        if len(detected_scores) == len(detected_cells)
        else [1.0] * len(detected_cells)
    )
    cells = [np.asarray(c, dtype=np.float32) for c in detected_cells]
    more_cells_flag = False
    if len(cells) == target_n:
        return cells
    if len(cells) > target_n:
        more_cells_flag = True
        idxs = sorted(range(len(cells)), key=lambda i: -scores[i])[:target_n]
        cells = [cells[i] for i in idxs]

    def ioa_ocr_in_cell(ocr: np.ndarray, cell: np.ndarray) -> float:
        ix1, iy1 = max(ocr[0], cell[0]), max(ocr[1], cell[1])
        ix2, iy2 = min(ocr[2], cell[2]), min(ocr[3], cell[3])
        inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
        if inter <= 0.0:
            return 0.0
        area = (ocr[2] - ocr[0]) * (ocr[3] - ocr[1])
        return float(inter / area) if area > 0 else 0.0

    miss: list[np.ndarray] = []
    for ob in ocr_boxes:
        covered = False
        ioa_sum = 0.0
        for cb in cells:
            ioa = ioa_ocr_in_cell(np.asarray(ob, dtype=np.float64), cb)
            if ioa > 0.0:
                ioa_sum += ioa
            if ioa >= 0.6 or ioa_sum >= 0.6:
                covered = True
                break
        if not covered:
            miss.append(np.asarray(ob, dtype=np.float32))
    if not miss:
        final = cells
    elif more_cells_flag:
        final = combine_rectangles_kmeans(cells + miss, target_n)
    else:
        need = max(target_n - len(cells), 0)
        final = cells + combine_rectangles_kmeans(miss, need)
    if len(final) <= 0.6 * target_n:
        final = combine_rectangles_kmeans(
            [np.asarray(b, dtype=np.float32) for b in ocr_boxes], target_n
        )
    return final
