"""Rotated-geometry operators: convex hull, min-area rect (rotating
calipers), PaddleX mini-box ordering, rect unclip, perspective crop.
Vectors ported from the reference test modules where they exist
(db_bitmap.rs:370-423); the rest are analytically-known rotated
rectangles."""

import numpy as np
import pytest

from oar_ocr_spark.operators.db_postprocess import (
    DBPostProcess,
    connected_components_points,
    connected_components_runs,
)
from oar_ocr_spark.operators.rotated_geometry import (
    convex_hull,
    get_mini_boxes,
    get_rotate_crop_image,
    min_area_rect,
    order_quad_points,
    perspective_transform,
    rect_corners,
    unclip_rect,
    warp_perspective_nn,
)


def rot(points, angle_deg, center=(0.0, 0.0)):
    rad = np.radians(angle_deg)
    ca, sa = np.cos(rad), np.sin(rad)
    p = np.asarray(points, dtype=np.float64) - center
    out = np.stack([p[:, 0] * ca - p[:, 1] * sa, p[:, 0] * sa + p[:, 1] * ca], axis=1)
    return out + center


def test_order_quad_points_reference_vector():
    # db_bitmap.rs:376-389 test_paddlex_order_mini_box_points
    pts = np.asarray([(20.0, 20.0), (10.0, 10.0), (20.0, 10.0), (10.0, 20.0)])
    ordered = order_quad_points(pts)
    np.testing.assert_allclose(
        ordered, [(10.0, 10.0), (20.0, 10.0), (20.0, 20.0), (10.0, 20.0)], atol=1e-6
    )


def test_get_mini_boxes_min_side_reference_vector():
    # db_bitmap.rs:392-405 test_get_mini_boxes_from_points_returns_min_side
    pts = np.asarray([(0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (0.0, 5.0)])
    box, min_side = get_mini_boxes(pts)
    assert abs(min_side - 5.0) < 1e-3
    np.testing.assert_allclose(box, [(0, 0), (10, 0), (10, 5), (0, 5)], atol=1e-6)


def test_convex_hull_drops_interior_and_collinear():
    pts = np.asarray(
        [(0, 0), (4, 0), (2, 0), (4, 4), (0, 4), (2, 2), (1, 1), (0, 2)], dtype=float
    )
    hull = convex_hull(pts)
    assert {tuple(p) for p in hull} == {(0, 0), (4, 0), (4, 4), (0, 4)}


def test_min_area_rect_recovers_rotated_rectangle():
    for angle in (0.0, 12.5, -30.0, 45.0):
        corners = rot(
            [(-20, -5), (20, -5), (20, 5), (-20, 5)], angle, center=(50.0, 40.0)
        ) + (50.0, 40.0) - (50.0, 40.0)
        corners = rot([(30, 35), (70, 35), (70, 45), (30, 45)], angle, center=(50.0, 40.0))
        cx, cy, w, h, got_angle = min_area_rect(corners)
        assert abs(cx - 50.0) < 1e-6 and abs(cy - 40.0) < 1e-6
        assert abs(min(w, h) - 10.0) < 1e-6 and abs(max(w, h) - 40.0) < 1e-6
        # the rect's own edge direction must match the rotation mod 90°
        assert abs(((got_angle - angle) + 45.0) % 90.0 - 45.0) < 1e-4


def test_min_area_rect_degenerate_collinear_points():
    cx, cy, w, h, angle = min_area_rect(np.asarray([(0, 0), (5, 0), (10, 0)], dtype=float))
    assert (w, h) == (10.0, 0.0) or (w, h) == (0.0, 10.0) or h == 0.0


def test_rect_corners_roundtrip():
    rect = (50.0, 40.0, 40.0, 10.0, 12.5)
    corners = rect_corners(rect)
    cx, cy, w, h, angle = min_area_rect(corners)
    assert abs(cx - 50) < 1e-6 and abs(cy - 40) < 1e-6
    assert abs(min(w, h) - 10) < 1e-6 and abs(max(w, h) - 40) < 1e-6


def test_unclip_rect_delta_matches_reference_formula():
    # delta = area * ratio / perimeter (db_bitmap.rs:279-345)
    rect = (0.0, 0.0, 40.0, 10.0, 30.0)
    out = unclip_rect(rect, 2.0)
    delta = (40.0 * 10.0) * 2.0 / (2 * (40.0 + 10.0))
    assert abs(out[2] - (40.0 + 2 * delta)) < 1e-9
    assert abs(out[3] - (10.0 + 2 * delta)) < 1e-9
    assert out[4] == 30.0
    assert unclip_rect((0, 0, 0.0, 10.0, 0.0), 2.0) is None  # zero area


def test_perspective_transform_maps_corners():
    src = np.asarray([(10, 10), (60, 20), (55, 50), (5, 40)], dtype=float)
    dst = np.asarray([(0, 0), (50, 0), (50, 30), (0, 30)], dtype=float)
    m = perspective_transform(src, dst)
    for s, d in zip(src, dst):
        v = m @ np.asarray([s[0], s[1], 1.0])
        np.testing.assert_allclose(v[:2] / v[2], d, atol=1e-6)


def test_warp_identity_is_exact():
    img = (np.arange(48, dtype=np.uint8).reshape(6, 8) * 5).astype(np.uint8)
    m = np.eye(3)
    out = warp_perspective_nn(img, m, 8, 6)
    # identity inverse mapping hits integer coordinates exactly
    np.testing.assert_array_equal(out, img)


def test_warp_bilinear_exact_on_affine_ramp():
    # bilinear interpolation reproduces any affine intensity ramp
    # EXACTLY, so a fractional translation of f(x,y)=a+bx+cy has the
    # closed form f(x+tx, y+ty) — a sharp correctness oracle NN fails
    from oar_ocr_spark.operators.rotated_geometry import warp_perspective

    a, b, c = 10.0, 3.0, 7.0
    xs, ys = np.meshgrid(np.arange(12, dtype=np.float64), np.arange(9, dtype=np.float64))
    img = a + b * xs + c * ys
    tx, ty = 0.5, 0.25
    m = np.array([[1.0, 0.0, -tx], [0.0, 1.0, -ty], [0.0, 0.0, 1.0]])  # src→dst
    out = warp_perspective(img, m, 12, 9, interpolation="bilinear")
    want = a + b * (xs + tx) + c * (ys + ty)
    # interior only: border replication clamps the last row/col
    np.testing.assert_allclose(out[:-1, :-1], want[:-1, :-1], atol=1e-9)
    # NN at the same shift snaps to integers — provably different
    nn = warp_perspective_nn(img, m, 12, 9)
    assert not np.allclose(nn[:-1, :-1], want[:-1, :-1])


def test_warp_bilinear_uint8_rounds_and_identity_exact():
    from oar_ocr_spark.operators.rotated_geometry import warp_perspective

    img = (np.arange(48).reshape(6, 8) * 5 % 256).astype(np.uint8)
    out = warp_perspective(img, np.eye(3), 8, 6, interpolation="bilinear")
    np.testing.assert_array_equal(out, img)  # integer grid → exact
    assert out.dtype == np.uint8
    # half-pixel shift on a 2-pixel checker = rounded midpoint
    chk = np.array([[0, 100], [0, 100]], dtype=np.uint8)
    m = np.array([[1.0, 0.0, -0.5], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    mid = warp_perspective(chk, m, 2, 2, interpolation="bilinear")
    assert mid[0, 0] == 50


def test_get_rotate_crop_image_bilinear_flag():
    # the flag must reach the warp: a quad at fractional coordinates
    # yields blended values under bilinear, pure source values under NN
    img = np.zeros((20, 20), dtype=np.uint8)
    img[:, 10:] = 200
    quad = np.asarray([(4.5, 4.0), (15.5, 4.0), (15.5, 12.0), (4.5, 12.0)], dtype=float)
    nn = get_rotate_crop_image(img, quad)
    bl = get_rotate_crop_image(img, quad, interpolation="bilinear")
    assert nn.shape == bl.shape
    assert set(np.unique(nn)) <= {0, 200}  # NN: source values only
    assert ((bl > 0) & (bl < 200)).any()  # bilinear: blended seam


def test_warp_bicubic_exact_on_quadratic_patch():
    # the Keys a=-0.5 kernel reproduces polynomials up to degree 2
    # EXACTLY (Keys 1981) — a closed-form oracle bilinear provably
    # fails (it is only affine-exact): a fractional translation of
    # f(x,y)=a+bx+cy+dx²+exy+gy² must equal f at the shifted points
    from oar_ocr_spark.operators.rotated_geometry import (
        warp_perspective,
        warp_perspective_nn,
    )

    a, b, c, d, e, g = 40.0, 1.5, -2.0, 0.25, 0.1, 0.2

    def f(x, y):
        return a + b * x + c * y + d * x * x + e * x * y + g * y * y

    xs, ys = np.meshgrid(
        np.arange(14, dtype=np.float64), np.arange(11, dtype=np.float64)
    )
    img = f(xs, ys)
    tx, ty = 0.375, 0.625
    m = np.array([[1.0, 0.0, -tx], [0.0, 1.0, -ty], [0.0, 0.0, 1.0]])
    out = warp_perspective(img, m, 14, 11, interpolation="bicubic")
    want = f(xs + tx, ys + ty)
    # interior only: the 4×4 stencil needs 1 real pixel left/up and 2
    # right/down before border replication bends the patch
    np.testing.assert_allclose(out[1:-3, 1:-3], want[1:-3, 1:-3], atol=1e-9)
    # bilinear at the same shift is NOT quadratic-exact
    bl = warp_perspective(img, m, 14, 11, interpolation="bilinear")
    assert not np.allclose(bl[1:-3, 1:-3], want[1:-3, 1:-3], atol=1e-6)
    nn = warp_perspective_nn(img, m, 14, 11)
    assert not np.allclose(nn[1:-3, 1:-3], want[1:-3, 1:-3], atol=1e-6)


def test_warp_bicubic_identity_partition_of_unity_and_clip():
    from oar_ocr_spark.operators.rotated_geometry import warp_perspective

    img = (np.arange(48).reshape(6, 8) * 5 % 256).astype(np.uint8)
    out = warp_perspective(img, np.eye(3), 8, 6, interpolation="bicubic")
    np.testing.assert_array_equal(out, img)  # integer grid → exact taps
    assert out.dtype == np.uint8
    # constant image stays constant at any sub-pixel shift (weights sum 1)
    const = np.full((7, 9), 113.0)
    m = np.array([[1.0, 0.0, -0.3], [0.0, 1.0, -0.7], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(
        warp_perspective(const, m, 9, 7, interpolation="bicubic"), 113.0, atol=1e-9
    )
    # cubic kernels OVERSHOOT at hard edges: uint8 must clip, not wrap
    step = np.zeros((8, 12), dtype=np.uint8)
    step[:, 6:] = 255
    shifted = warp_perspective(step, m, 12, 8, interpolation="bicubic")
    assert shifted.min() >= 0 and shifted.max() <= 255
    f64 = warp_perspective(step.astype(np.float64), m, 12, 8, interpolation="bicubic")
    assert f64.max() > 255.0 or f64.min() < 0.0  # the overshoot is real


def test_get_rotate_crop_image_bicubic_flag():
    img = np.zeros((20, 20), dtype=np.uint8)
    img[:, 10:] = 200
    quad = np.asarray(
        [(4.5, 4.0), (15.5, 4.0), (15.5, 12.0), (4.5, 12.0)], dtype=float
    )
    bc = get_rotate_crop_image(img, quad, interpolation="bicubic")
    nn = get_rotate_crop_image(img, quad)
    assert bc.shape == nn.shape
    assert ((bc > 0) & (bc < 200)).any()  # blended seam reaches the crop


def test_get_rotate_crop_image_axis_aligned():
    img = np.full((40, 60), 255, dtype=np.uint8)
    img[10:20, 5:45] = 7
    quad = np.asarray([(5, 10), (45, 10), (45, 20), (5, 20)], dtype=float)
    crop = get_rotate_crop_image(img, quad)
    assert crop.shape == (10, 40)
    assert (crop == 7).all()


def test_get_rotate_crop_image_rotates_vertical_text():
    # h >= 1.5*w → rotate270 (90° CCW), transform.rs:155-163
    img = np.zeros((100, 100), dtype=np.uint8)
    img[10:70, 40:50] = np.arange(10, dtype=np.uint8)[None, :]
    quad = np.asarray([(40, 10), (50, 10), (50, 70), (40, 70)], dtype=float)
    crop = get_rotate_crop_image(img, quad)
    assert crop.shape == (10, 60)  # rotated to horizontal


def test_get_rotate_crop_image_recovers_rotated_block():
    # paste a coded block rotated 15° into a page, crop by its exact
    # corner quad — every interior pixel must carry a block intensity
    from oar_ocr_spark.fixtures.render import _paste_rotated

    block = np.full((20, 60), 99, dtype=np.uint8)
    page = np.full((120, 140), 255, dtype=np.uint8)
    _paste_rotated(page, block, 70.0, 60.0, 15.0)
    quad = rot([(40, 50), (100, 50), (100, 70), (40, 70)], 15.0, center=(70.0, 60.0))
    crop = get_rotate_crop_image(page, quad)
    assert crop is not None
    assert crop.shape[0] in (19, 20, 21) and crop.shape[1] in (59, 60, 61)
    inner = crop[2:-2, 2:-2]
    assert (inner == 99).mean() > 0.99


def test_quad_postprocess_detects_rotated_component():
    from oar_ocr_spark.fixtures.render import _paste_rotated

    page = np.full((150, 200), 255, dtype=np.uint8)
    block = np.full((20, 80), 40, dtype=np.uint8)
    _paste_rotated(page, block, 100.0, 75.0, -18.0)
    post = DBPostProcess(unclip_ratio=2.0, score_mode="slow")
    quads, scores = post.apply_quad_uint8_inverted(page, src_w=200, src_h=150)
    assert quads.shape == (1, 4, 2)
    assert scores[0] > 0.6
    cx, cy, w, h, angle = min_area_rect(quads[0])
    assert abs(cx - 100) < 2 and abs(cy - 75) < 2
    delta = (80 * 20) * 2.0 / (2 * (80 + 20))  # unclip growth
    assert abs(max(w, h) - (80 + 2 * delta)) < 3
    assert abs(min(h, w) - (20 + 2 * delta)) < 3
    assert abs(((angle + 18.0) + 45.0) % 90.0 - 45.0) < 2.0


def test_components_runs_and_points_agree_with_boxes():
    rng = np.random.default_rng(7)
    mask = rng.random((40, 60)) > 0.8
    from oar_ocr_spark.operators.db_postprocess import connected_components_boxes

    boxes = connected_components_boxes(mask)
    runs = connected_components_runs(mask)
    pts = connected_components_points(mask)
    assert len(boxes) == len(runs) == len(pts)
    for (x1, y1, x2, y2), r, p in zip(boxes, runs, pts):
        assert r[:, 1].min() == x1 and (r[:, 2] - 1).max() == x2
        assert r[:, 0].min() == y1 and r[:, 0].max() == y2
        assert p[:, 0].min() == x1 and p[:, 0].max() == x2
        # total run pixels equals the mask's component pixel count union
    total = sum(int((r[:, 2] - r[:, 1]).sum()) for r in runs)
    assert total == int(mask.sum())


@pytest.mark.parametrize("i", range(8))
def test_rotated_page_roundtrip_truth(i):
    # e2e single-process: skewed lines (± angle, flips, orientations)
    # decode to exactly the drawn text in top-to-bottom order
    from oar_ocr_spark.fixtures.render import render_page, rotated_page_truth
    from oar_ocr_spark.local_ref import ExtractConfig, extract_page

    ref = f"rot:v{i}"
    truth = rotated_page_truth(ref)
    got = [t for t, _ in extract_page(render_page(ref), ExtractConfig(text_type="rotated"))]
    assert got == [r.text for r in truth.regions]


# ---------------------------------------------------------------------------
# Poly box mode, polygon simplification/offset, dilation, det configs
# ---------------------------------------------------------------------------


def test_approx_poly_dp_reference_semantics():
    from oar_ocr_spark.operators.rotated_geometry import approx_poly_dp

    # collinear midpoints are dropped; corners survive
    pts = np.asarray(
        [(0, 0), (5, 0), (10, 0), (10, 5), (10, 10), (5, 10), (0, 10), (0, 5), (0, 0)],
        dtype=float,
    )
    out = approx_poly_dp(pts, 0.5)
    assert {tuple(p) for p in out} == {(0, 0), (10, 0), (10, 10), (0, 10)}
    # epsilon larger than the bulge flattens it
    bulge = np.asarray([(0, 0), (5, 1), (10, 0)], dtype=float)
    assert len(approx_poly_dp(bulge, 2.0)) == 2
    assert len(approx_poly_dp(bulge, 0.5)) == 3


def test_offset_convex_polygon_round_join():
    from oar_ocr_spark.operators.rotated_geometry import (
        min_area_rect,
        offset_convex_polygon,
    )

    square = np.asarray([(10, 10), (30, 10), (30, 20), (10, 20)], dtype=float)
    out = offset_convex_polygon(square, 5.0)
    # support in every direction grows by exactly delta
    assert abs(out[:, 0].min() - 5.0) < 1e-6 and abs(out[:, 0].max() - 35.0) < 1e-6
    assert abs(out[:, 1].min() - 5.0) < 1e-6 and abs(out[:, 1].max() - 25.0) < 1e-6
    # min-area rect of the offset equals the rect grown by delta per side
    cx, cy, w, h, _ = min_area_rect(out)
    assert abs(max(w, h) - 30.0) < 0.1 and abs(min(w, h) - 20.0) < 0.1
    # corner arc points stay within radius delta of the corners
    d = np.hypot(out[:, 0] - 30, out[:, 1] - 10)
    assert (np.hypot(out[:, 0, None] - square[None, :, 0],
                     out[:, 1, None] - square[None, :, 1]).min(axis=1) <= 5.0 + 1e-6).any()


def test_dilate_mask_chebyshev_radius_1():
    from oar_ocr_spark.operators.db_postprocess import DBPostProcess

    m = np.zeros((5, 5), dtype=bool)
    m[2, 2] = True
    out = DBPostProcess.dilate_mask(m)
    assert out.sum() == 9 and out[1:4, 1:4].all()  # full 3x3 block
    # dilation merges two 1-px-gap components into one
    from oar_ocr_spark.operators.db_postprocess import connected_components_boxes

    m2 = np.zeros((5, 9), dtype=bool)
    m2[2, 1:3] = True
    m2[2, 6:8] = True
    assert len(connected_components_boxes(m2)) == 2
    post = DBPostProcess(use_dilation=True, min_size=1.0, box_thresh=0.0)
    img = np.where(m2, 0, 255).astype(np.uint8)
    boxes, _ = post.apply_uint8_inverted(img, 9, 5)
    assert len(boxes) <= 2  # gap-3 still separate; radius-1 touches at gap<=2


def test_poly_detection_on_seal_like_crop():
    from oar_ocr_spark.local_ref import ExtractConfig, detect_page_polys
    from oar_ocr_spark.fixtures.render import _render_region_block, region_width

    cfg = ExtractConfig.for_text_type("seal")
    assert (cfg.det_thresh, cfg.det_box_thresh, cfg.det_unclip_ratio) == (0.2, 0.6, 0.5)
    assert (cfg.det_limit_side_len, cfg.det_limit_type) == (736, "min")
    img = np.full((90, 140), 255, dtype=np.uint8)
    for i, text in enumerate(["ab1", "cd2"]):
        block = _render_region_block(text)
        w = region_width(len(text))
        img[10 + i * 34 : 30 + i * 34, 12 : 12 + w] = block
    polys, scores = detect_page_polys(img, cfg)
    assert len(polys) == 2
    for p, y_expect in zip(sorted(polys, key=lambda p: p[:, 1].min()), (10, 44)):
        assert p.shape[1] == 2 and len(p) >= 4
        # unclip 0.5 margin is small: the poly hugs the strip
        assert abs(p[:, 1].min() - y_expect) <= 4


def test_for_text_type_presets():
    from oar_ocr_spark.local_ref import ExtractConfig

    table = ExtractConfig.for_text_type("table")
    assert table.det_box_thresh == 0.4 and table.det_thresh == 0.3
    general = ExtractConfig.for_text_type("general")
    assert general.det_box_thresh == 0.6 and general.det_limit_type == "max"
    rotated = ExtractConfig.for_text_type("rotated")
    assert rotated.text_type == "rotated" and rotated.postprocess.score_mode == "slow"


def test_get_rotate_crop_image_degenerate_quad_returns_none():
    img = np.full((30, 30), 100, dtype=np.uint8)
    collinear = np.asarray([(0, 0), (5, 5), (10, 10), (5, 5)], dtype=float)
    assert get_rotate_crop_image(img, collinear) is None


def test_warp_preserves_channel_axis():
    from oar_ocr_spark.operators.rotated_geometry import warp_perspective_nn

    rgb = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    out = warp_perspective_nn(rgb, np.eye(3), 8, 6)
    np.testing.assert_array_equal(out, rgb)
