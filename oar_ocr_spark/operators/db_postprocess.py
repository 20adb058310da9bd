"""DB (Differentiable Binarization) detection postprocess — numpy port.

Parity targets (reference = GreatV/oar-ocr at /root/reference):
- Config + defaults (thresh .3, box_thresh .6, max_candidates 1000,
  unclip 1.5, min_size 3.0): oar-ocr-core/src/processors/db_postprocess.rs:46-88.
- Pipeline per image (binarize → contours → mini box → min_size filter
  → box_score_fast → box_thresh filter → unclip → sside < min_size+2
  filter → scale/round/clamp to source dims):
  db_postprocess.rs:100-221 + db_bitmap.rs:84-149.
- box_score_fast (floor/ceil inclusive AABB region mean of pred):
  db_score.rs:33-53.
- unclip offset delta = area * unclip_ratio / perimeter (Vatti/Clipper
  round-join inflate): db_bitmap.rs:279-345. For the axis-aligned
  components this engine detects, the inflated polygon's min-area rect
  is exactly the AABB expanded by `delta` per side.

Box convention note: the AABB fast path measures components by their
PIXEL FOOTPRINT (inclusive extent + 1 — a 3-px-wide component has
min_side 3), a deliberate choice for the synthetic glyph geometry.
The quad/poly paths measure coordinate SPREAD like the reference's
contour math (the same component has min_side 2, matching the
db_bitmap.rs unit vectors). Each flavor is self-consistent with its
own goldens; they intentionally differ by one pixel of convention.

Connected components replace imageproc::find_contours: a run-based
union-find over foreground rows, emitting components in first-pixel
scan order (the same discovery order contours are yielded in, which is
what `.take(max_candidates)` depends on).

Everything here is pure numpy and runs inside the detection pandas UDF
— per-image work is independent, so Spark task parallelism replaces
the reference's rayon loops (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["DBPostProcess", "connected_components_boxes", "connected_components_points"]


def _extract_runs(m: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All foreground runs of a bool mask in one vectorized pass.

    Pads a False column so runs never span row boundaries, diffs the
    flattened mask, and decodes (row, x0, x1_exclusive) per run —
    naturally in row-major order."""
    h, w = m.shape
    padded = np.zeros((h, w + 1), dtype=bool)
    padded[:, :w] = m
    flat = padded.ravel()
    d = np.diff(flat.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if flat[0]:
        starts = np.concatenate([[0], starts])
    rows = starts // (w + 1)
    x0 = starts % (w + 1)
    x1 = ends - rows * (w + 1)
    return rows, x0, x1


def connected_components_boxes(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """8-connected components of a boolean mask → inclusive pixel AABBs.

    Returns [(x_min, y_min, x_max, y_max)] ordered by first foreground
    pixel in row-major scan order (matches contour discovery order in
    db_bitmap.rs:100). Derived from connected_components_runs so the
    subtle union-find lives in exactly one place."""
    out: list[tuple[int, int, int, int]] = []
    for runs in connected_components_runs(mask):
        out.append(
            (
                int(runs[:, 1].min()),
                int(runs[:, 0].min()),
                int((runs[:, 2] - 1).max()),
                int(runs[:, 0].max()),
            )
        )
    return out


def _run_endpoints(runs: np.ndarray) -> np.ndarray:
    """(R,3) [y, x0, x1) runs → (K,2) endpoint pixel coords (x, y):
    (x0, y) plus (x1-1, y) when distinct. The endpoints contain every
    vertex of the convex hull of the component's pixel centers, and
    that hull equals the hull of the reference's boundary-contour
    points (db_bitmap.rs:100) — the single definition the AABB-,
    quad- and poly-path consumers all share."""
    pts: list[tuple[int, int]] = []
    for (y, x0, x1) in runs:
        pts.append((int(x0), int(y)))
        if x1 - 1 != x0:
            pts.append((int(x1 - 1), int(y)))
    return np.asarray(pts, dtype=np.float64)


def connected_components_points(mask: np.ndarray) -> list[np.ndarray]:
    """8-connected components of a boolean mask → per-component (K,2)
    arrays of run-endpoint pixel coordinates (x, y), components in
    first-pixel scan order (see _run_endpoints for the hull-equivalence
    argument)."""
    return [_run_endpoints(runs) for runs in connected_components_runs(mask)]


def connected_components_runs(mask: np.ndarray) -> list[np.ndarray]:
    """8-connected components as per-component (R,3) arrays of
    foreground runs [y, x0, x1_exclusive], components in first-pixel
    scan order (same union-find as connected_components_boxes)."""
    m = np.asarray(mask, dtype=bool)
    if m.size == 0 or not m.any():
        return []
    rows, xs0, xs1 = _extract_runs(m)
    n_runs = len(rows)
    parent: list[int] = []

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    runs_by_label: list[list[tuple[int, int, int]]] = []
    order: list[int] = []
    labels = np.empty(n_runs, dtype=np.int64)
    prev_lo = prev_hi = 0
    cur_row = -2
    cur_start = 0
    p_lo = 0  # two-pointer front into the previous row's runs
    for k in range(n_runs):
        y = int(rows[k])
        if y != cur_row:
            if y == cur_row + 1:
                prev_lo, prev_hi = cur_start, k
            else:
                prev_lo = prev_hi = k
            p_lo = prev_lo
            cur_row = y
            cur_start = k
        x0 = int(xs0[k])
        x1 = int(xs1[k])
        # 8-connectivity neighbor predicate: xs0[p] < x1+1 AND x0 < xs1[p]+1.
        # Runs within a row are maximal → disjoint and sorted, so both
        # xs0 and xs1 are strictly increasing: runs that fell behind the
        # current x0 can never match a later run either — advance the
        # shared front pointer once (O(R) per row pair instead of
        # O(R_prev·R_cur))
        while p_lo < prev_hi and int(xs1[p_lo]) + 1 <= x0:
            p_lo += 1
        label = -1
        p = p_lo
        while p < prev_hi and int(xs0[p]) < x1 + 1:
            plab = int(labels[p])
            if label == -1:
                label = find(plab)
            else:
                union(label, plab)
                label = find(label)
            p += 1
        if label == -1:
            label = len(parent)
            parent.append(label)
            runs_by_label.append([(y, x0, x1)])
            order.append(label)
        else:
            runs_by_label[label].append((y, x0, x1))
        labels[k] = label

    merged: dict[int, list[tuple[int, int, int]]] = {}
    root_order: list[int] = []
    for lab in order:
        r = find(lab)
        if r not in merged:
            merged[r] = list(runs_by_label[lab])
            root_order.append(r)
        else:
            merged[r].extend(runs_by_label[lab])
    return [np.asarray(merged[r], dtype=np.int64) for r in root_order]


@dataclass
class DBPostProcess:
    """DB heatmap → boxes. Defaults match db_postprocess.rs:67-88."""

    thresh: float = 0.3
    box_thresh: float = 0.6
    max_candidates: int = 1000
    unclip_ratio: float = 1.5
    min_size: float = 3.0
    # "fast" = mean over the box's AABB (box_score_fast, db_score.rs:33-53);
    # "slow" = mean over the contour polygon (box_score_slow) — for the
    # run-based components here the polygon fill IS the component's own
    # pixels, so slow mode means over the component runs exactly.
    # Rotated (quad) detection needs slow: a skewed line's AABB is
    # mostly background and fast-scores below box_thresh.
    score_mode: str = "fast"
    # dilate the binarized mask (Chebyshev radius 1) before component
    # extraction (db_mask.rs:8-12; DBPostprocessConfig.use_dilation)
    use_dilation: bool = False

    @staticmethod
    def dilate_mask(mask: np.ndarray) -> np.ndarray:
        """Binary dilation with Chebyshev radius 1 (3×3 max filter) —
        morphology::dilate(Norm::LInf, 1), db_mask.rs:8-12."""
        m = np.asarray(mask, dtype=bool)
        v = m.copy()
        v[1:, :] |= m[:-1, :]
        v[:-1, :] |= m[1:, :]
        out = v.copy()
        out[:, 1:] |= v[:, :-1]
        out[:, :-1] |= v[:, 1:]
        return out

    def _maybe_dilate(self, mask: np.ndarray) -> np.ndarray:
        return self.dilate_mask(mask) if self.use_dilation else mask

    def box_score_fast(self, pred: np.ndarray, box: np.ndarray) -> float:
        """Mean of pred over the box's floor/ceil-clamped inclusive AABB
        (db_score.rs:33-53; polygon fill == AABB for axis-aligned boxes)."""
        h, w = pred.shape
        x1, y1, x2, y2 = (float(v) for v in np.asarray(box).reshape(4))
        min_x = int(np.clip(np.floor(x1), 0, w - 1))
        max_x = int(np.clip(np.ceil(x2), 0, w - 1))
        min_y = int(np.clip(np.floor(y1), 0, h - 1))
        max_y = int(np.clip(np.ceil(y2), 0, h - 1))
        region = pred[min_y : max_y + 1, min_x : max_x + 1]
        return float(region.mean()) if region.size else 0.0

    def unclip_aabb(self, box: np.ndarray, unclip_ratio: float) -> np.ndarray | None:
        """Closed-form AABB unclip: delta = area * ratio / perimeter
        (db_bitmap.rs:279-345); each side expands by delta."""
        x1, y1, x2, y2 = (float(v) for v in np.asarray(box).reshape(4))
        bw, bh = x2 - x1, y2 - y1
        area = abs(bw * bh)
        perimeter = 2.0 * (bw + bh)
        if area <= np.finfo(np.float64).eps or perimeter <= np.finfo(np.float64).eps:
            return None
        delta = area * float(unclip_ratio) / perimeter
        if abs(delta) <= np.finfo(np.float64).eps:
            return None
        return np.asarray([x1 - delta, y1 - delta, x2 + delta, y2 + delta], dtype=np.float32)

    def apply_uint8_inverted(
        self, img: np.ndarray, src_w: int, src_h: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Fast path for the synthetic detector whose probability map is
        (255 - pixel)/255: thresholds and region means are computed on
        the uint8 image directly (mask: pixel < 255·(1−thresh); score:
        (255 − mean(region))/255), skipping the 4-bytes-per-pixel float
        heatmap — the detect stage's main memory-bandwidth cost at
        corpus scale. Bit-equivalent decision path: comparisons happen
        on exact integer pixels, and the score transform is an affine
        map of the region mean computed in float64 either way."""
        img = np.asarray(img)
        # 256-entry LUT reproduces the float32 comparison
        # (255−v)/255 > thresh exactly, with no float image copy
        lut = (np.float32(255) - np.arange(256, dtype=np.float32)) / np.float32(255)
        mask = (lut > np.float32(self.thresh))[img]
        inv = img  # score regions read the uint8 directly

        def score_fn(box: np.ndarray) -> float:
            h, w = inv.shape
            x1, y1, x2, y2 = (float(v) for v in np.asarray(box).reshape(4))
            min_x = int(np.clip(np.floor(x1), 0, w - 1))
            max_x = int(np.clip(np.ceil(x2), 0, w - 1))
            min_y = int(np.clip(np.floor(y1), 0, h - 1))
            max_y = int(np.clip(np.ceil(y2), 0, h - 1))
            region = inv[min_y : max_y + 1, min_x : max_x + 1]
            if not region.size:
                return 0.0
            return float((255.0 - float(region.mean())) / 255.0)

        return self._boxes_from_mask(mask, score_fn, src_w, src_h)

    def __call__(
        self, pred: np.ndarray, src_w: int, src_h: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """One heatmap → (boxes (N,4) in source coords, scores (N,)).

        pred: (H, W) float probability map (model-output dims, possibly
        a resized multiple-of-32 grid); src_w/src_h: original image dims
        for the scale-back (db_bitmap.rs:95-97,140-141).
        """
        pred = np.asarray(pred, dtype=np.float32)
        mask = pred > self.thresh  # db_postprocess.rs:196-208
        return self._boxes_from_mask(
            mask, lambda box: self.box_score_fast(pred, box), src_w, src_h
        )

    def apply_quad_uint8_inverted(
        self, img: np.ndarray, src_w: int, src_h: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Quad (rotated min-area rect) flavor of apply_uint8_inverted:
        same inverted-uint8 threshold fast path, boxes from the full
        boxes_from_bitmap chain (db_bitmap.rs:84-149): component points
        → min-area rect (rotating calipers) → min_size → score
        (fast=AABB mean / slow=component-pixel mean, per score_mode) →
        round-join unclip → sside filter → scale/round/clamp.
        Returns (quads (N,4,2) [tl,tr,br,bl] source coords, scores)."""
        img = np.asarray(img)
        lut = (np.float32(255) - np.arange(256, dtype=np.float32)) / np.float32(255)
        mask = self._maybe_dilate((lut > np.float32(self.thresh))[img])
        return self._quads_from_mask(mask, img, src_w, src_h)

    def _quads_from_mask(
        self, mask: np.ndarray, img: np.ndarray, src_w: int, src_h: int
    ) -> tuple[np.ndarray, np.ndarray]:
        from .rotated_geometry import min_area_rect, order_quad_points, rect_corners, unclip_rect

        h, w = mask.shape
        comps = connected_components_runs(mask)[: self.max_candidates]
        width_scale = np.float32(src_w) / np.float32(w)
        height_scale = np.float32(src_h) / np.float32(h)
        quads: list[np.ndarray] = []
        scores: list[float] = []
        for runs in comps:
            pts = _run_endpoints(runs)
            if len(pts) < 3:
                continue
            rect = min_area_rect(pts)
            min_side = min(rect[2], rect[3])
            if not np.isfinite(min_side) or min_side <= 0.0:
                continue
            if min_side < self.min_size:  # db_bitmap.rs:110
                continue
            mini = order_quad_points(rect_corners(rect))
            score = self._score_quad(img, mini, runs)
            if score < self.box_thresh:  # db_bitmap.rs:120
                continue
            urect = unclip_rect(rect, self.unclip_ratio)
            if urect is None:
                continue
            sside = min(urect[2], urect[3])
            if sside < self.min_size + 2.0:  # db_bitmap.rs:133
                continue
            quad = order_quad_points(rect_corners(urect))
            # half-away-from-zero like Rust f32::round (db_bitmap.rs:140)
            qx = np.clip(np.floor(quad[:, 0] * width_scale + 0.5), 0, src_w)
            qy = np.clip(np.floor(quad[:, 1] * height_scale + 0.5), 0, src_h)
            quads.append(np.stack([qx, qy], axis=1).astype(np.float32))
            scores.append(score)
        if not quads:
            return np.empty((0, 4, 2), dtype=np.float32), np.empty(0, dtype=np.float32)
        return np.stack(quads), np.asarray(scores, dtype=np.float32)

    def _score_quad(
        self, img: np.ndarray, mini: np.ndarray, runs: np.ndarray, force_fast: bool = False
    ) -> float:
        """Inverted-uint8 score of a quad: score_mode 'slow' averages the
        component's own pixels (box_score_slow's polygon fill == the
        component for run-based components); 'fast' averages the quad's
        AABB region (box_score_fast, db_score.rs:33-53)."""
        if self.score_mode == "slow" and not force_fast:
            total = 0.0
            count = 0
            for (y, x0, x1) in runs:
                total += float(img[int(y), int(x0) : int(x1)].sum(dtype=np.float64))
                count += int(x1 - x0)
            if count == 0:
                return 0.0
            return float((255.0 - total / count) / 255.0)
        h, w = img.shape
        min_x = int(np.clip(np.floor(mini[:, 0].min()), 0, w - 1))
        max_x = int(np.clip(np.ceil(mini[:, 0].max()), 0, w - 1))
        min_y = int(np.clip(np.floor(mini[:, 1].min()), 0, h - 1))
        max_y = int(np.clip(np.ceil(mini[:, 1].max()), 0, h - 1))
        region = img[min_y : max_y + 1, min_x : max_x + 1]
        if not region.size:
            return 0.0
        return float((255.0 - float(region.mean())) / 255.0)

    def apply_poly_uint8_inverted(
        self, img: np.ndarray, src_w: int, src_h: int
    ) -> tuple[list[np.ndarray], np.ndarray]:
        """Poly (curved-text / seal) flavor — polygons_from_bitmap
        (db_bitmap.rs:16-82): component polygon (convex hull of the
        run endpoints — exact for the engine's convex components) →
        approx_poly_dp(ε = 0.002·perimeter) → score → round-join
        polygon unclip (offset_convex_polygon) → mini-box sside filter
        → scale/round/clamp. Returns (list of (K,2) polygons in source
        coords, scores)."""
        from .rotated_geometry import (
            approx_poly_dp,
            convex_hull,
            min_area_rect,
            offset_convex_polygon,
        )

        img = np.asarray(img)
        lut = (np.float32(255) - np.arange(256, dtype=np.float32)) / np.float32(255)
        mask = self._maybe_dilate((lut > np.float32(self.thresh))[img])
        h, w = mask.shape
        comps = connected_components_runs(mask)[: self.max_candidates]
        width_scale = np.float32(src_w) / np.float32(w)
        height_scale = np.float32(src_h) / np.float32(h)
        polys: list[np.ndarray] = []
        scores: list[float] = []
        for runs in comps:
            pts = _run_endpoints(runs)
            if len(pts) < 4:  # db_bitmap.rs:38 contour length guard
                continue
            hull = convex_hull(pts)
            if len(hull) < 3:
                continue
            closed = np.vstack([hull, hull[:1]])
            perimeter = float(np.hypot(*(np.diff(closed, axis=0).T)).sum())
            approx = approx_poly_dp(closed, 0.002 * perimeter)
            # drop the duplicated closing point kept by DP endpoints
            if len(approx) >= 2 and (approx[0] == approx[-1]).all():
                approx = approx[:-1]
            if len(approx) < 4:
                continue
            aabb = np.asarray(
                [approx[:, 0].min(), approx[:, 1].min(), approx[:, 0].max(), approx[:, 1].max()]
            )
            mini4 = np.stack(
                [aabb[[0, 1]], aabb[[2, 1]], aabb[[2, 3]], aabb[[0, 3]]]
            )
            # the reference's poly flavor always fast-scores the approx
            # polygon's AABB regardless of score_mode (db_bitmap.rs:50)
            score = self._score_quad(img, mini4, runs, force_fast=True)
            if score < self.box_thresh:
                continue
            x, y = approx[:, 0], approx[:, 1]
            area = abs(float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))) / 2.0
            closed_a = np.vstack([approx, approx[:1]])
            perim_a = float(np.hypot(*(np.diff(closed_a, axis=0).T)).sum())
            if area <= np.finfo(np.float64).eps or perim_a <= np.finfo(np.float64).eps:
                continue
            delta = area * float(self.unclip_ratio) / perim_a
            if abs(delta) <= np.finfo(np.float64).eps:
                continue
            unclipped = offset_convex_polygon(approx, delta)
            if len(unclipped) < 3:
                continue
            rect = min_area_rect(unclipped)
            sside = min(rect[2], rect[3])
            if sside < self.min_size + 2.0:  # db_bitmap.rs:63
                continue
            # half-away-from-zero like Rust f32::round (db_bitmap.rs:72)
            px = np.clip(np.floor(unclipped[:, 0] * width_scale + 0.5), 0, src_w)
            py = np.clip(np.floor(unclipped[:, 1] * height_scale + 0.5), 0, src_h)
            polys.append(np.stack([px, py], axis=1).astype(np.float32))
            scores.append(score)
        return polys, np.asarray(scores, dtype=np.float32)

    def _boxes_from_mask(
        self, mask: np.ndarray, score_fn, src_w: int, src_h: int
    ) -> tuple[np.ndarray, np.ndarray]:
        mask = self._maybe_dilate(mask)
        h, w = mask.shape
        comps = connected_components_boxes(mask)[: self.max_candidates]
        width_scale = np.float32(src_w) / np.float32(w)
        height_scale = np.float32(src_h) / np.float32(h)
        boxes: list[np.ndarray] = []
        scores: list[float] = []
        for (cx1, cy1, cx2, cy2) in comps:
            # inclusive pixel extents → box spanning the pixel footprint;
            # min-area rect of an axis-aligned component == its AABB
            mini = np.asarray([cx1, cy1, cx2 + 1, cy2 + 1], dtype=np.float32)
            min_side = float(min(mini[2] - mini[0], mini[3] - mini[1]))
            if min_side < self.min_size:  # db_bitmap.rs:110
                continue
            score = score_fn(mini)
            if score < self.box_thresh:  # db_bitmap.rs:120
                continue
            unclipped = self.unclip_aabb(mini, self.unclip_ratio)
            if unclipped is None:
                continue
            sside = float(min(unclipped[2] - unclipped[0], unclipped[3] - unclipped[1]))
            if sside < self.min_size + 2.0:  # db_bitmap.rs:133
                continue
            # half-away-from-zero like Rust f32::round (np.round is
            # half-to-even); negatives clamp to 0 anyway
            x1 = np.clip(np.floor(unclipped[0] * width_scale + 0.5), 0, src_w)
            y1 = np.clip(np.floor(unclipped[1] * height_scale + 0.5), 0, src_h)
            x2 = np.clip(np.floor(unclipped[2] * width_scale + 0.5), 0, src_w)
            y2 = np.clip(np.floor(unclipped[3] * height_scale + 0.5), 0, src_h)
            boxes.append(np.asarray([x1, y1, x2, y2], dtype=np.float32))
            scores.append(score)
        if not boxes:
            return np.empty((0, 4), dtype=np.float32), np.empty(0, dtype=np.float32)
        return np.stack(boxes), np.asarray(scores, dtype=np.float32)
