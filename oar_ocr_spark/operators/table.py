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
    if not (tokens and "<table" in tokens[0]):
        parts.append("<table>")
    td_index = 0
    for tag in tokens:
        if tag == "<td></td>":
            parts.append("<td>")
            if td_index < len(cell_texts) and cell_texts[td_index]:
                parts.append(cell_texts[td_index])  # type: ignore[arg-type]
            parts.append("</td>")
            td_index += 1
        else:
            parts.append(tag)
    parts.append("</table>")
    parts.append("</body></html>")
    return "".join(parts)


def table_structure_from_crop(crop: np.ndarray) -> tuple[list[str], list[TableCell]]:
    """Synthetic SLANet: parse grid-line intensities into
    (structure_tokens, cells). Grid rows/cols are pixel rows/columns
    dominated by TABLE_GRID; boundaries are clustered with the
    reference's cluster_positions (tolerance 3px)."""
    gy, gx = np.where(crop == TABLE_GRID)
    if gy.size == 0:
        return [], []
    h, w = crop.shape
    row_counts = np.bincount(gy, minlength=h)
    col_counts = np.bincount(gx, minlength=w)
    # a full grid line spans most of the table extent
    row_lines = np.flatnonzero(row_counts > 0.6 * w)
    col_lines = np.flatnonzero(col_counts > 0.6 * h)
    row_pos = cluster_positions([float(v) for v in row_lines], 3.0)
    col_pos = cluster_positions([float(v) for v in col_lines], 3.0)
    if len(row_pos) < 2 or len(col_pos) < 2:
        return [], []
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
