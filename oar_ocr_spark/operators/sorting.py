"""Reading-order sorting: simple quad/poly sort + recursive XY-cut.

Parity targets (reference = GreatV/oar-ocr at /root/reference):
- sort_quad_boxes:  oar-ocr-core/src/processors/sorting.rs:35-84
  ((y_min, x_min) sort, then a bubble pass swapping adjacent boxes on
  the same visual line — |Δy| < 10 px — that are out of x order; this
  defines OCR span emission order).
- sort_poly_boxes:  sorting.rs:100-118 (stable sort by y_min only).
- projection_by_bboxes / split_projection_profile / recursive_yx_cut /
  recursive_xy_cut / sort_by_xycut: sorting.rs:161-485
  (PP-StructureV3-compatible projection-profile cut).
- assign_elements_to_regions / sort_elements_with_regions /
  sort_with_region_hierarchy: sorting.rs:567-734.

All functions return **indices** into the input so callers can reorder
parallel payloads (texts, scores, crops). Inputs are (N,4) float arrays
[x_min, y_min, x_max, y_max]; float32 semantics match the reference's
f32 `partial_cmp` with stable ordering on ties (numpy stable sorts).
"""

from __future__ import annotations

import numpy as np

from .geometry import overlap_ratio

__all__ = [
    "sort_quad_boxes",
    "sort_poly_boxes",
    "projection_by_bboxes",
    "split_projection_profile",
    "sort_by_xycut",
    "sort_with_region_hierarchy",
]

SAME_LINE_Y_TOLERANCE = 10.0  # sorting.rs:75


def sort_quad_boxes(boxes: np.ndarray) -> np.ndarray:
    """Reading order for quad boxes (sorting.rs:35-84). Returns indices.

    1. Stable sort by (y_min, x_min).
    2. Bubble pass: for each adjacent pair on the same horizontal line
       (|y_next - y_curr| < 10) with x_next < x_curr, swap; stop the
       inner backward scan at the first non-swap (exact port of the
       reference's early-`break` inner loop).
    """
    b = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
    n = len(b)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((b[:, 0], b[:, 1]))  # stable: y_min primary, x_min secondary
    order = list(order)
    y = b[:, 1]
    x = b[:, 0]
    for i in range(n - 1):
        for j in range(i, -1, -1):
            if j + 1 >= n:
                break
            cj, cn = order[j], order[j + 1]
            if abs(float(y[cn]) - float(y[cj])) < SAME_LINE_Y_TOLERANCE and float(
                x[cn]
            ) < float(x[cj]):
                order[j], order[j + 1] = order[j + 1], order[j]
            else:
                break
    return np.asarray(order, dtype=np.int64)


def sort_poly_boxes(boxes: np.ndarray) -> np.ndarray:
    """Seal/poly reading order: stable sort by y_min (sorting.rs:100-118)."""
    b = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
    if len(b) == 0:
        return np.empty(0, dtype=np.int64)
    return np.argsort(b[:, 1], kind="stable").astype(np.int64)


def projection_by_bboxes(int_boxes: np.ndarray, axis: int) -> np.ndarray:
    """1-D projection histogram over [min, max) intervals (sorting.rs:219-254).

    int_boxes: (N,4) int array; axis 0 = X projection, 1 = Y projection.
    Histogram length = max(|coord_max|) + 1; each box increments the
    half-open interval [coord_min, coord_max).
    """
    if axis not in (0, 1):
        raise ValueError("axis must be 0 or 1")
    ib = np.asarray(int_boxes, dtype=np.int64).reshape(-1, 4)
    if len(ib) == 0:
        return np.empty(0, dtype=np.int64)
    max_length = int(np.abs(ib[:, axis + 2]).max())
    if max_length == 0:
        return np.empty(0, dtype=np.int64)
    proj = np.zeros(max_length + 1, dtype=np.int64)
    starts = np.abs(ib[:, axis])
    ends = np.abs(ib[:, axis + 2])
    lo = np.minimum(starts, ends)
    hi = np.minimum(np.maximum(starts, ends), len(proj))
    # difference-array trick: +1 at lo, -1 at hi, cumsum == per-cell count
    np.add.at(proj, lo[lo < len(proj)], 1)
    dec = hi[hi < len(proj)]
    np.add.at(proj, dec, -1)
    proj = np.cumsum(proj)
    # cells at index >= hi for boxes whose hi == len(proj) are already 0-capped
    return proj


def split_projection_profile(
    arr_values: np.ndarray, min_value: int, min_gap: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Split a projection profile into segments at gaps (sorting.rs:267-301).

    Returns (starts, ends) as half-open [start, end) index arrays, or
    None when nothing exceeds `min_value`.
    """
    arr = np.asarray(arr_values)
    sig = np.flatnonzero(arr > min_value)
    if sig.size == 0:
        return None
    gaps = np.diff(sig)
    cut = np.flatnonzero(gaps > min_gap)
    starts = np.concatenate([[sig[0]], sig[cut + 1]])
    ends = np.concatenate([sig[cut] + 1, [sig[-1] + 1]])
    return starts, ends


def _recursive_cut(
    boxes: np.ndarray, indices: np.ndarray, result: list[int], min_gap: int, y_first: bool
) -> None:
    """Shared body of recursive_yx_cut / recursive_xy_cut (sorting.rs:306-485).

    y_first=True  → YX-cut (Vertical reading direction, sorting.rs:306)
    y_first=False → XY-cut (Horizontal, sorting.rs:398)
    The primary axis is projected with min_gap=1; the secondary axis
    uses the caller's min_gap; recursion happens only when the secondary
    axis splits into >1 segment (exact reference control flow).
    """
    if len(boxes) == 0:
        return
    ax1 = 1 if y_first else 0  # primary projection axis
    ax2 = 0 if y_first else 1
    # sort by primary-axis min for the primary projection
    o1 = np.argsort(boxes[:, ax1], kind="stable")
    b1 = boxes[o1]
    i1 = indices[o1]
    proj1 = projection_by_bboxes(b1, ax1)
    iv1 = split_projection_profile(proj1, 0, 1)
    if iv1 is None:
        return
    starts1, ends1 = iv1
    mins1 = b1[:, ax1].astype(np.int64)
    for s1, e1 in zip(starts1, ends1):
        sel1 = (mins1 >= s1) & (mins1 < e1)
        if not sel1.any():
            continue
        bc = b1[sel1]
        ic = i1[sel1]
        # sort by secondary-axis min for the secondary projection
        o2 = np.argsort(bc[:, ax2], kind="stable")
        b2 = bc[o2]
        i2 = ic[o2]
        proj2 = projection_by_bboxes(b2, ax2)
        iv2 = split_projection_profile(proj2, 0, min_gap)
        if iv2 is None:
            continue
        starts2, ends2 = iv2
        if len(starts2) == 1:
            result.extend(int(v) for v in i2)
            continue
        mins2 = np.abs(b2[:, ax2]).astype(np.int64)
        for s2, e2 in zip(starts2, ends2):
            sel2 = (mins2 >= s2) & (mins2 < e2)
            if sel2.any():
                _recursive_cut(b2[sel2], i2[sel2], result, min_gap, y_first)


def sort_by_xycut(
    boxes: np.ndarray, direction: str = "vertical", min_gap: int = 1
) -> np.ndarray:
    """Recursive XY-cut reading order (sorting.rs:161-192). Returns indices.

    direction "vertical" = Y-first (YX-cut, top-to-bottom reading),
    "horizontal" = X-first. Boxes are truncated to int (as i32 casts in
    the reference) before projection.
    """
    b = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
    if len(b) == 0:
        return np.empty(0, dtype=np.int64)
    ib = b.astype(np.int64)  # trunc toward zero, same as Rust `as i32`
    result: list[int] = []
    _recursive_cut(
        ib, np.arange(len(ib), dtype=np.int64), result, int(min_gap), direction == "vertical"
    )
    return np.asarray(result, dtype=np.int64)


def sort_with_region_hierarchy(
    elements: np.ndarray, region_bboxes: np.ndarray, overlap_threshold: float
) -> np.ndarray:
    """Hierarchical reading order (sorting.rs:567-734). Returns indices.

    1. assign each element to the region with the highest overlap ratio
       strictly above `overlap_threshold` (sorting.rs:579-602);
    2. XY-cut-sort the regions (sorting.rs:607-614);
    3. XY-cut within each region; unassigned elements sorted and
       appended last (sorting.rs:633-699).
    """
    el = np.asarray(elements, dtype=np.float32).reshape(-1, 4)
    if len(el) == 0:
        return np.empty(0, dtype=np.int64)
    rg = np.asarray(region_bboxes, dtype=np.float32).reshape(-1, 4)
    if len(rg) == 0:
        return sort_by_xycut(el, "vertical", 1)
    ratios = overlap_ratio(el, rg)  # (N_el, N_rg)
    best = ratios.argmax(axis=1)
    best_val = ratios[np.arange(len(el)), best]
    assigned = np.where(best_val > overlap_threshold, best, -1)
    region_order = sort_by_xycut(rg, "vertical", 1)
    out: list[int] = []
    for r in region_order:
        members = np.flatnonzero(assigned == r)
        if members.size == 0:
            continue
        inner = sort_by_xycut(el[members], "vertical", 1)
        out.extend(int(members[k]) for k in inner)
    un = np.flatnonzero(assigned == -1)
    if un.size:
        inner = sort_by_xycut(el[un], "vertical", 1)
        out.extend(int(un[k]) for k in inner)
    return np.asarray(out, dtype=np.int64)
