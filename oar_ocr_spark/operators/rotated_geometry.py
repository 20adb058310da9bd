"""Rotated-box geometry: convex hull, min-area rect (rotating
calipers), mini-box ordering, rect unclip, and the 4-point perspective
crop. Pure numpy — everything here runs inside the detection pandas
UDF (and the single-process golden generator, same functions).

Parity targets (reference = GreatV/oar-ocr at /root/reference):
- convex hull (Graham scan, lowest-y start, polar-angle sort,
  clockwise-turn pop): oar-ocr-core/src/processors/geometry.rs:226-274
- min-area rect via rotating calipers over hull edges (project points
  on edge + perpendicular, track min area): geometry.rs:301-440;
  MinAreaRect {center, width, height, angle_deg} geometry.rs:891-899,
  min_side geometry.rs:1045-1047
- rect corners (box_points_without_reorder) + PaddleX mini-box point
  ordering [tl, tr, br, bl]: db_bitmap.rs:186-203, 252-275
- get_mini_boxes_from_points (min rect → ordered corners + min side):
  db_bitmap.rs:168-184
- unclip (delta = |area|·ratio / perimeter, Clipper2 round-join
  inflate): db_bitmap.rs:279-345. The unclip input is always a mini
  box — a rotated RECTANGLE — and the round-join Minkowski sum of a
  rectangle with a radius-delta disk has support function
  support(rect)+delta, whose min-area enclosing rect is exactly the
  input rect grown by delta per side at the same angle; the closed
  form below is therefore equivalent (up to Clipper2's precision=2
  internal rounding, ≤0.005 px, below the final round-to-int).
- get_rotate_crop_image (AABB pre-crop, point reorder, max-opposite-
  edge target dims, perspective warp, rotate if h ≥ 1.5·w):
  oar-ocr-core/src/utils/transform.rs:50-166; used via
  TextCroppingProcessor, src/oarocr/processors.rs:80-125
- get_perspective_transform (8×8 linear system): transform.rs:188-257
- warp_perspective inverse mapping with border replication:
  transform.rs:260-340. Deviation: the reference samples bicubic; this
  engine samples NEAREST-NEIGHBOR — the determinism contract
  (models/synthetic.py) requires intensities to stay exact integers,
  and the synthetic glyph strips (≥3 px features) decode identically
  under either sampling.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "convex_hull",
    "min_area_rect",
    "rect_corners",
    "order_quad_points",
    "get_mini_boxes",
    "unclip_rect",
    "approx_poly_dp",
    "offset_convex_polygon",
    "perspective_transform",
    "warp_perspective_nn",
    "get_rotate_crop_image",
]


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Convex hull (Graham scan) of (N,2) points → (H,2), starting at
    the lowest-y (then leftmost) point, counter-clockwise in image
    coords with y down (clockwise turns popped: cross ≤ 0).
    Port of convex_hull_from_points (geometry.rs:226-274)."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return pts.copy()
    start_idx = np.lexsort((pts[:, 0], pts[:, 1]))[0]
    start = pts[start_idx]
    rest = np.delete(pts, start_idx, axis=0)
    ang = np.arctan2(rest[:, 1] - start[1], rest[:, 0] - start[0])
    dist = (rest[:, 0] - start[0]) ** 2 + (rest[:, 1] - start[1]) ** 2
    rest = rest[np.lexsort((dist, ang))]
    hull: list[np.ndarray] = [start]
    for p in rest:
        while len(hull) > 1:
            a, b = hull[-2], hull[-1]
            cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
            if cross <= 0.0:
                hull.pop()
            else:
                break
        hull.append(p)
    return np.asarray(hull, dtype=np.float64)


def min_area_rect(points: np.ndarray) -> tuple[float, float, float, float, float]:
    """Minimum-area enclosing rectangle of (N,2) points via rotating
    calipers on the convex hull. Returns (cx, cy, width, height,
    angle_deg). Port of get_min_area_rect_from_points
    (geometry.rs:301-440), including the degenerate (<3 hull points)
    axis-aligned fallback."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return (0.0, 0.0, 0.0, 0.0, 0.0)
    hull = convex_hull(pts)
    if len(hull) < 3:
        mn = pts.min(axis=0)
        mx = pts.max(axis=0)
        c = (mn + mx) * 0.5
        return (float(c[0]), float(c[1]), float(mx[0] - mn[0]), float(mx[1] - mn[1]), 0.0)
    n = len(hull)
    best_area = np.inf
    best = (0.0, 0.0, 0.0, 0.0, 0.0)
    for i in range(n):
        j = (i + 1) % n
        ex = hull[j, 0] - hull[i, 0]
        ey = hull[j, 1] - hull[i, 1]
        elen_sq = ex * ex + ey * ey
        if elen_sq < np.finfo(np.float32).eps:
            continue
        inv = 1.0 / np.sqrt(elen_sq)
        nx, ny = ex * inv, ey * inv
        px, py = -ny, nx
        dx = hull[:, 0] - hull[i, 0]
        dy = hull[:, 1] - hull[i, 1]
        proj_n = nx * dx + ny * dy
        proj_p = px * dx + py * dy
        min_n, max_n = proj_n.min(), proj_n.max()
        min_p, max_p = proj_p.min(), proj_p.max()
        width = max_n - min_n
        height = max_p - min_p
        area = width * height
        if area < best_area:
            best_area = area
            cn = (min_n + max_n) * 0.5
            cp = (min_p + max_p) * 0.5
            cx = hull[i, 0] + cn * nx + cp * px
            cy = hull[i, 1] + cn * ny + cp * py
            angle = float(np.degrees(np.arctan2(ny, nx)))
            best = (float(cx), float(cy), float(width), float(height), angle)
    return best


def rect_corners(rect: tuple[float, float, float, float, float]) -> np.ndarray:
    """(cx, cy, w, h, angle_deg) → (4,2) corners in local order
    [(-w/2,-h/2), (w/2,-h/2), (w/2,h/2), (-w/2,h/2)] rotated+shifted
    (box_points_without_reorder, db_bitmap.rs:186-203)."""
    cx, cy, w, h, angle = rect
    rad = np.radians(angle)
    ca, sa = np.cos(rad), np.sin(rad)
    w2, h2 = w / 2.0, h / 2.0
    local = np.asarray([(-w2, -h2), (w2, -h2), (w2, h2), (-w2, h2)], dtype=np.float64)
    out = np.empty((4, 2), dtype=np.float64)
    out[:, 0] = local[:, 0] * ca - local[:, 1] * sa + cx
    out[:, 1] = local[:, 0] * sa + local[:, 1] * ca + cy
    return out


def order_quad_points(points: np.ndarray) -> np.ndarray:
    """PaddleX mini-box ordering: sort by x, pick [top-left, top-right,
    bottom-right, bottom-left] (db_bitmap.rs:252-275)."""
    pts = np.asarray(points, dtype=np.float64).reshape(4, 2)
    pts = pts[np.argsort(pts[:, 0], kind="stable")]
    i1, i4 = (0, 1) if pts[1, 1] > pts[0, 1] else (1, 0)
    i2, i3 = (2, 3) if pts[3, 1] > pts[2, 1] else (3, 2)
    return pts[[i1, i2, i3, i4]]


def get_mini_boxes(points: np.ndarray) -> tuple[np.ndarray, float] | None:
    """(N,2) points → (ordered (4,2) corners [tl,tr,br,bl], min_side),
    or None for degenerate input (get_mini_boxes_from_points,
    db_bitmap.rs:168-184)."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return None
    rect = min_area_rect(pts)
    min_side = min(rect[2], rect[3])
    if not np.isfinite(min_side) or min_side <= 0.0:
        return None
    return order_quad_points(rect_corners(rect)), float(min_side)


def unclip_rect(
    rect: tuple[float, float, float, float, float], unclip_ratio: float
) -> tuple[float, float, float, float, float] | None:
    """Inflate a rotated rect by delta = area·ratio / perimeter per
    side — the closed form of the reference's Clipper2 round-join
    unclip applied to a rectangle (db_bitmap.rs:279-345; see module
    docstring for the equivalence argument). None mirrors the
    reference's empty-result guards."""
    cx, cy, w, h, angle = rect
    area = abs(w * h)
    perimeter = 2.0 * (w + h)
    if area <= np.finfo(np.float64).eps or perimeter <= np.finfo(np.float64).eps:
        return None
    delta = area * float(unclip_ratio) / perimeter
    if abs(delta) <= np.finfo(np.float64).eps:
        return None
    return (cx, cy, w + 2.0 * delta, h + 2.0 * delta, angle)


def _point_to_segment_distance(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> float:
    """Perpendicular distance from p to segment a-b (geometry.rs
    point_to_line_distance)."""
    ab = b - a
    denom = float(ab[0] ** 2 + ab[1] ** 2)
    if denom <= 0.0:
        return float(np.hypot(*(p - a)))
    t = float(np.dot(p - a, ab)) / denom
    t = min(max(t, 0.0), 1.0)
    proj = a + t * ab
    return float(np.hypot(*(p - proj)))


def approx_poly_dp(points: np.ndarray, epsilon: float) -> np.ndarray:
    """Douglas-Peucker polygon simplification — iterative stack port
    of BoundingBox::approx_poly_dp / douglas_peucker
    (geometry.rs:453-536). Keeps endpoints; splits at the farthest
    point while its distance exceeds epsilon."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    n = len(pts)
    if n <= 2:
        return pts.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        start, end = stack.pop()
        if end - start <= 1:
            continue
        dists = [
            _point_to_segment_distance(pts[i], pts[start], pts[end])
            for i in range(start + 1, end)
        ]
        max_off = int(np.argmax(dists))
        max_dist = dists[max_off]
        max_index = start + 1 + max_off
        if max_dist > epsilon:
            keep[max_index] = True
            if max_index - start > 1:
                stack.append((start, max_index))
            if end - max_index > 1:
                stack.append((max_index, end))
    return pts[keep]


def offset_convex_polygon(
    points: np.ndarray, delta: float, arc_steps: int = 8
) -> np.ndarray:
    """Round-join outward offset of a CONVEX polygon by `delta` — the
    Minkowski sum with a radius-delta disk, arcs sampled with
    `arc_steps` points per vertex. This is the closed form of the
    reference's Clipper2 inflate_paths_d(JoinType::Round) restricted
    to convex input (db_bitmap.rs:279-345); the engine's synthetic
    components are convex, where the restriction is exact up to arc
    sampling (the downstream min-area-rect/scale-back consumers are
    insensitive to arc density).

    Points must be in a consistent winding; output keeps it.
    """
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    n = len(pts)
    if n < 3 or delta <= 0.0:
        return pts.copy()
    # signed area decides which perpendicular points outward
    x, y = pts[:, 0], pts[:, 1]
    area2 = float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    sign = 1.0 if area2 > 0 else -1.0
    out: list[np.ndarray] = []
    for i in range(n):
        p_prev = pts[(i - 1) % n]
        p = pts[i]
        p_next = pts[(i + 1) % n]
        # offset endpoints of the two incident edges + arc between them
        e1 = p - p_prev
        e2 = p_next - p
        l1, l2 = float(np.hypot(*e1)), float(np.hypot(*e2))
        if l1 <= 0.0 or l2 <= 0.0:
            continue
        n1 = sign * np.asarray([e1[1], -e1[0]]) / l1
        n2 = sign * np.asarray([e2[1], -e2[0]]) / l2
        a1 = float(np.arctan2(n1[1], n1[0]))
        a2 = float(np.arctan2(n2[1], n2[0]))
        # sweep from n1 to n2 the short way matching the winding
        sweep = a2 - a1
        if sign > 0:
            while sweep < 0:
                sweep += 2 * np.pi
        else:
            while sweep > 0:
                sweep -= 2 * np.pi
        steps = max(int(arc_steps * abs(sweep) / (np.pi / 2)), 1)
        for s in range(steps + 1):
            ang = a1 + sweep * s / steps
            out.append(p + delta * np.asarray([np.cos(ang), np.sin(ang)]))
    return np.asarray(out, dtype=np.float64)


def perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3×3 perspective matrix mapping 4 src points to 4 dst points by
    solving the standard 8×8 system (transform.rs:188-257)."""
    src = np.asarray(src, dtype=np.float64).reshape(4, 2)
    dst = np.asarray(dst, dtype=np.float64).reshape(4, 2)
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        sx, sy = src[i]
        dx, dy = dst[i]
        a[i * 2] = [sx, sy, 1.0, 0.0, 0.0, 0.0, -sx * dx, -sy * dx]
        b[i * 2] = dx
        a[i * 2 + 1] = [0.0, 0.0, 0.0, sx, sy, 1.0, -sx * dy, -sy * dy]
        b[i * 2 + 1] = dy
    sol = np.linalg.solve(a, b)
    return np.asarray(
        [[sol[0], sol[1], sol[2]], [sol[3], sol[4], sol[5]], [sol[6], sol[7], 1.0]],
        dtype=np.float64,
    )


def _cubic_weights(f: np.ndarray) -> np.ndarray:
    """Keys bicubic kernel weights (a = -0.5) for fractional offsets
    f ∈ [0,1): rows are the taps at floor-1 … floor+2. Exactly
    reproduces polynomials up to degree 2 (Keys 1981, third-order
    accuracy) and sums to 1 for every f."""
    a = -0.5
    # tap distances: 1+f, f, 1-f, 2-f
    t0 = 1.0 + f
    w = np.empty((4,) + f.shape, dtype=np.float64)
    w[0] = a * t0**3 - 5.0 * a * t0**2 + 8.0 * a * t0 - 4.0 * a
    w[1] = (a + 2.0) * f**3 - (a + 3.0) * f**2 + 1.0
    t2 = 1.0 - f
    w[2] = (a + 2.0) * t2**3 - (a + 3.0) * t2**2 + 1.0
    t3 = 2.0 - f
    w[3] = a * t3**3 - 5.0 * a * t3**2 + 8.0 * a * t3 - 4.0 * a
    return w


def warp_perspective(
    img: np.ndarray,
    matrix: np.ndarray,
    dst_w: int,
    dst_h: int,
    interpolation: str = "nearest",
) -> np.ndarray:
    """Inverse-mapped perspective warp with border replication
    (transform.rs:260-340). interpolation="nearest" (default) is the
    determinism-contract path every golden is computed through;
    "bilinear" and "bicubic" are the opt-in real-scan fidelity ladder —
    bicubic is the reference's sampling (Keys a=-0.5 kernel, the
    OpenCV/image-crate convention; reproduces quadratic patches
    exactly on interior pixels). Fully vectorized: one 3×(W·H)
    mat-vec for the whole destination grid, 4/16 gathers per pixel."""
    inv = np.linalg.inv(matrix)
    xs, ys = np.meshgrid(
        np.arange(dst_w, dtype=np.float64), np.arange(dst_h, dtype=np.float64)
    )
    ones = np.ones_like(xs)
    grid = np.stack([xs.ravel(), ys.ravel(), ones.ravel()])  # (3, W·H)
    src = inv @ grid
    z = src[2]
    safe = np.abs(z) > np.finfo(np.float32).eps
    sx = np.where(safe, src[0] / np.where(safe, z, 1.0), 0.0)
    sy = np.where(safe, src[1] / np.where(safe, z, 1.0), 0.0)
    h, w = img.shape[:2]
    if interpolation == "nearest":
        xi = np.clip(np.rint(sx), 0, w - 1).astype(np.int64)
        yi = np.clip(np.rint(sy), 0, h - 1).astype(np.int64)
        # preserve trailing channel axes (the engine is grayscale today;
        # RGB inputs must not crash the reshape)
        return img[yi, xi].reshape(dst_h, dst_w, *img.shape[2:])
    if interpolation == "bicubic":
        xf = np.floor(sx)
        yf = np.floor(sy)
        fx = sx - xf
        fy = sy - yf
        wx = _cubic_weights(fx)  # (4, n)
        wy = _cubic_weights(fy)
        p = img.astype(np.float64)
        val = np.zeros(
            (sx.size,) + img.shape[2:], dtype=np.float64
        )
        for i in range(4):
            yi = np.clip(yf + (i - 1), 0, h - 1).astype(np.int64)
            rowv = np.zeros_like(val)
            for j in range(4):
                xj = np.clip(xf + (j - 1), 0, w - 1).astype(np.int64)
                wj = wx[j].reshape(-1, *([1] * (img.ndim - 2)))
                rowv += p[yi, xj] * wj
            val += rowv * wy[i].reshape(-1, *([1] * (img.ndim - 2)))
        if np.issubdtype(img.dtype, np.integer):
            info = np.iinfo(img.dtype)
            val = np.clip(np.rint(val), info.min, info.max)
        return val.astype(img.dtype).reshape(dst_h, dst_w, *img.shape[2:])
    if interpolation != "bilinear":
        raise ValueError(f"unknown interpolation {interpolation!r}")
    x0 = np.clip(np.floor(sx), 0, w - 1).astype(np.int64)
    y0 = np.clip(np.floor(sy), 0, h - 1).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(sx - x0, 0.0, 1.0)
    fy = np.clip(sy - y0, 0.0, 1.0)
    if img.ndim > 2:  # broadcast weights over trailing channel axes
        fx = fx.reshape(-1, *([1] * (img.ndim - 2)))
        fy = fy.reshape(-1, *([1] * (img.ndim - 2)))
    p = img.astype(np.float64)
    val = (
        p[y0, x0] * (1 - fx) * (1 - fy)
        + p[y0, x1] * fx * (1 - fy)
        + p[y1, x0] * (1 - fx) * fy
        + p[y1, x1] * fx * fy
    )
    if np.issubdtype(img.dtype, np.integer):
        val = np.rint(val)
    return val.astype(img.dtype).reshape(dst_h, dst_w, *img.shape[2:])


def warp_perspective_nn(
    img: np.ndarray, matrix: np.ndarray, dst_w: int, dst_h: int
) -> np.ndarray:
    """Nearest-neighbor flavor (the historical name — golden path)."""
    return warp_perspective(img, matrix, dst_w, dst_h, interpolation="nearest")


def get_rotate_crop_image(
    img: np.ndarray, box_points: np.ndarray, interpolation: str = "nearest"
) -> np.ndarray | None:
    """4-point perspective crop: AABB pre-crop → reorder points →
    target dims from max opposite-edge lengths → perspective warp →
    rotate 90° CCW when h ≥ 1.5·w (vertical text). Returns None for
    invalid regions (the reference returns Err; the caller skips).
    Port of get_rotate_crop_image (transform.rs:50-166).
    interpolation="bilinear"/"bicubic" opt into sub-pixel sampling for
    real scans (bicubic = the reference's kernel); "nearest" (default)
    is the golden/determinism path."""
    pts = np.asarray(box_points, dtype=np.float64).reshape(4, 2)
    ih, iw = img.shape[:2]
    min_x, min_y = pts.min(axis=0)
    max_x, max_y = pts.max(axis=0)
    left = int(max(min_x, 0.0))
    top = int(max(min_y, 0.0))
    right = int(min(max_x, float(iw)))
    bottom = int(min(max_y, float(ih)))
    if right <= left or bottom <= top:
        return None
    crop = img[top:bottom, left:right]
    shifted = pts - np.asarray([left, top], dtype=np.float64)
    # reorder to [tl, tr, br, bl] (transform.rs:158-176 sorting policy)
    s = shifted[np.argsort(shifted[:, 0], kind="stable")]
    ia, id_ = (1, 0) if s[1, 1] < s[0, 1] else (0, 1)
    ib, ic = (3, 2) if s[3, 1] < s[2, 1] else (2, 3)
    ordered = s[[ia, ib, ic, id_]]
    width1 = float(np.hypot(*(ordered[0] - ordered[1])))
    width2 = float(np.hypot(*(ordered[2] - ordered[3])))
    tw = int(round(max(width1, width2)))
    height1 = float(np.hypot(*(ordered[0] - ordered[3])))
    height2 = float(np.hypot(*(ordered[1] - ordered[2])))
    th = int(round(max(height1, height2)))
    if tw == 0 or th == 0:
        return None
    pts_std = np.asarray([(0.0, 0.0), (tw, 0.0), (tw, th), (0.0, th)], dtype=np.float64)
    try:
        m = perspective_transform(ordered, pts_std)
    except np.linalg.LinAlgError:
        # degenerate (collinear) quad: singular system — invalid region
        return None
    dst = warp_perspective(crop, m, tw, th, interpolation=interpolation)
    if dst.shape[0] >= dst.shape[1] * 1.5:
        # vertical text: rotate270 (90° CCW), transform.rs:155-163
        dst = np.ascontiguousarray(np.rot90(dst, k=1))
    return dst
