"""Deterministic page renderer.

``render_page(media_ref)`` procedurally renders a synthetic grayscale
page from the SHA-256 of the media_ref — the engine's stand-in for
"fetch + decode media bytes" (reference: utils/image.rs:65-88
load_image/load_image_from_memory). A real deployment would replace
this with a pandas UDF decoding a binary column; the Spark-side
plumbing (schema, batching, partitioning) is identical.

Page anatomy (upright, before orientation rotation):
- an 8×8 ANCHOR block at (4,4) (orientation cue; masked pre-detection)
- 1..MAX_LINES text lines; each line holds 1–2 regions (single-column,
  two-column and same-line templates — FIXTURES.md §2) of 2..12 chars
- region layout: [MARKER 3px][char strip 8px][SEP 3px]...[char strip],
  region height 20px; a region may be rendered 180°-flipped
  (line_flipped) to exercise the text-line orientation stage
- geometry chosen so regions are separate 8-connected components and
  unclipped detection boxes (δ ≤ ~10px) never reach a neighbor's
  glyphs on the crop's center row
- finally the page is rotated by the ground-truth orientation class.

``page_truth`` returns the same rng draw as structured ground truth
(used only by tests/golden tooling, never by the engine).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from ..models.synthetic import ANCHOR, ANCHOR_SIZE, BG, CHAR_BASE, CHAR_TO_INDEX, MARKER, SEP

CHAR_W = 8
SEP_W = 3
MARKER_W = 3
REGION_H = 20
LINE_GAP = 26
MARGIN_X = 16
MARGIN_TOP = 30
SAME_LINE_GAP = 32
MAX_LINES = 6
MAX_CHARS = 12
# alphabet for region text: digits + lowercase (vocab indices 1..36)
ALPHABET = "0123456789abcdefghijklmnopqrstuvwxyz"


@dataclass
class RegionTruth:
    x1: int
    y1: int
    x2: int  # exclusive
    y2: int  # exclusive
    text: str
    line_flipped: bool


@dataclass
class PageTruth:
    width: int
    height: int
    orientation_class: int
    regions: list[RegionTruth]  # upright coordinates


def _rng_for(media_ref: str) -> np.random.Generator:
    digest = hashlib.sha256(media_ref.encode("utf-8")).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "little"))


def region_width(n_chars: int) -> int:
    return MARKER_W + n_chars * CHAR_W + (n_chars - 1) * SEP_W


def _render_region_block(text: str) -> np.ndarray:
    """(REGION_H, region_width) block for one upright text line."""
    w = region_width(len(text))
    block = np.full((REGION_H, w), SEP, dtype=np.uint8)
    block[:, :MARKER_W] = MARKER
    x = MARKER_W
    for ch in text:
        block[:, x : x + CHAR_W] = CHAR_BASE + CHAR_TO_INDEX[ch]
        x += CHAR_W + SEP_W
    return block


def page_truth(media_ref: str) -> PageTruth:
    """Deterministic layout + content for a media_ref (upright coords)."""
    rng = _rng_for(media_ref)
    n_lines = int(rng.integers(1, MAX_LINES + 1))
    orientation_class = int(rng.integers(0, 4))
    regions: list[RegionTruth] = []
    y = MARGIN_TOP
    max_right = 0
    for _ in range(n_lines):
        two_on_line = bool(rng.random() < 0.3)
        x = MARGIN_X
        for _col in range(2 if two_on_line else 1):
            n_chars = int(rng.integers(2, MAX_CHARS + 1))
            text = "".join(ALPHABET[int(i)] for i in rng.integers(0, len(ALPHABET), n_chars))
            flipped = bool(rng.random() < 0.25)
            w = region_width(n_chars)
            regions.append(RegionTruth(x, y, x + w, y + REGION_H, text, flipped))
            x += w + SAME_LINE_GAP
            max_right = max(max_right, x - SAME_LINE_GAP)
        y += REGION_H + LINE_GAP
    width = max_right + MARGIN_X
    height = y - LINE_GAP + MARGIN_TOP
    return PageTruth(width, height, orientation_class, regions)


ROT_PREFIX = "rot:"
WARP_PREFIX = "warp:"
WARP_CUE = 3  # cue-row intensity (unique: ANCHOR=0, MARKER=15, …)
WARP_FREE_LEFT = 24  # columns left of this stay unwarped (anchor cue)


def render_warped_page(media_ref: str) -> np.ndarray:
    """'warp:'-prefixed media_ref → vertically warped page: column x
    sags by dy(x) = A + round(A·sin(2πx/P + φ)) for x ≥ WARP_FREE_LEFT
    (A ∈ 12..16 > half the 20-px line height, so an UNrectified
    center-row decode demonstrably loses characters) — the UVDoc
    distorted-page fixture. A 2-px cue row at base y=0..1 sags with
    each column, so the rectifier recovers dy(x) from pixels alone
    (models/rectification/uvdoc.rs + processors/uvdoc_postprocess.rs
    analog; integer shifts keep the warp exact under the determinism
    contract)."""
    truth = page_truth(media_ref)
    rng = _rng_for(media_ref + "#warp")
    amp = int(rng.integers(12, 17))
    period = float(rng.uniform(120.0, 260.0))
    phase = float(rng.uniform(0.0, 2.0 * np.pi))
    base = np.full((truth.height, truth.width), BG, dtype=np.uint8)
    base[:2, :] = WARP_CUE
    base[4 : 4 + ANCHOR_SIZE, 4 : 4 + ANCHOR_SIZE] = ANCHOR
    for r in truth.regions:
        block = _render_region_block(r.text)
        if r.line_flipped:
            block = block[::-1, ::-1]
        base[r.y1 : r.y2, r.x1 : r.x2] = block
    xs = np.arange(truth.width)
    dy = np.where(
        xs >= WARP_FREE_LEFT,
        amp + np.round(amp * np.sin(2.0 * np.pi * xs / period + phase)).astype(np.int64),
        0,
    )
    img = np.full((truth.height + 2 * amp + 2, truth.width), BG, dtype=np.uint8)
    for d in np.unique(dy):
        cols = dy == d
        img[d : d + truth.height, cols] = base[:, cols]
    k = truth.orientation_class % 4
    if k:
        img = np.rot90(img, k=-k)
    return np.ascontiguousarray(img)


@dataclass
class RotatedRegionTruth:
    cx: float
    cy: float
    text: str
    angle_deg: float
    line_flipped: bool

    def quad(self) -> np.ndarray:
        """(4,2) corner coordinates of the rotated glyph block."""
        w = float(region_width(len(self.text)))
        h = float(REGION_H)
        rad = np.radians(self.angle_deg)
        ca, sa = np.cos(rad), np.sin(rad)
        local = np.asarray(
            [(-w / 2, -h / 2), (w / 2, -h / 2), (w / 2, h / 2), (-w / 2, h / 2)]
        )
        out = np.empty((4, 2))
        out[:, 0] = local[:, 0] * ca - local[:, 1] * sa + self.cx
        out[:, 1] = local[:, 0] * sa + local[:, 1] * ca + self.cy
        return out


@dataclass
class RotatedPageTruth:
    width: int
    height: int
    orientation_class: int
    regions: list[RotatedRegionTruth]  # upright coordinates, top→bottom


def rotated_page_truth(media_ref: str) -> RotatedPageTruth:
    """Deterministic rotated-text layout for refs with the 'rot:'
    prefix: one region per line, each skewed by ±(5°..25°); vertical
    pitch leaves room for the rotated extent plus the detection unclip
    margin so regions stay separate components."""
    rng = _rng_for(media_ref)
    n_lines = int(rng.integers(1, 5))
    orientation_class = int(rng.integers(0, 4))
    regions: list[RotatedRegionTruth] = []
    y = float(MARGIN_TOP + 30)
    max_right = 0.0
    for _ in range(n_lines):
        n_chars = int(rng.integers(2, 11))
        text = "".join(ALPHABET[int(i)] for i in rng.integers(0, len(ALPHABET), n_chars))
        angle = float(rng.uniform(5.0, 25.0)) * (1.0 if rng.random() < 0.5 else -1.0)
        flipped = bool(rng.random() < 0.25)
        bw = float(region_width(n_chars))
        bh = float(REGION_H)
        rad = np.radians(angle)
        hw = (bw * abs(np.cos(rad)) + bh * abs(np.sin(rad))) / 2.0
        hh = (bw * abs(np.sin(rad)) + bh * abs(np.cos(rad))) / 2.0
        cy = y + hh
        cx = MARGIN_X + 30 + hw
        regions.append(RotatedRegionTruth(cx, cy, text, angle, flipped))
        max_right = max(max_right, cx + hw)
        # pitch: rotated extent + unclip margin (δ ≤ ~18px per side,
        # rotated ⇒ ×(|cos|+|sin|) ≤ ×1.42) + separation slack
        y = cy + hh + 56.0
    width = int(np.ceil(max_right)) + MARGIN_X + 30
    height = int(np.ceil(y))
    return RotatedPageTruth(width, height, orientation_class, regions)


def _paste_rotated(img: np.ndarray, block: np.ndarray, cx: float, cy: float, angle_deg: float) -> None:
    """NN inverse-mapped paste of `block` rotated by angle_deg about
    (cx, cy) — intensities stay exact integers (determinism contract)."""
    bh, bw = block.shape
    rad = np.radians(angle_deg)
    ca, sa = float(np.cos(rad)), float(np.sin(rad))
    hw = (bw * abs(ca) + bh * abs(sa)) / 2.0
    hh = (bw * abs(sa) + bh * abs(ca)) / 2.0
    h, w = img.shape
    x0 = max(int(np.floor(cx - hw)) - 1, 0)
    x1 = min(int(np.ceil(cx + hw)) + 2, w)
    y0 = max(int(np.floor(cy - hh)) - 1, 0)
    y1 = min(int(np.ceil(cy + hh)) + 2, h)
    ys, xs = np.mgrid[y0:y1, x0:x1]
    dx = xs + 0.5 - cx
    dy = ys + 0.5 - cy
    u = ca * dx + sa * dy + bw / 2.0
    v = -sa * dx + ca * dy + bh / 2.0
    ui = np.floor(u).astype(np.int64)
    vi = np.floor(v).astype(np.int64)
    inside = (ui >= 0) & (ui < bw) & (vi >= 0) & (vi < bh)
    win = img[y0:y1, x0:x1]
    win[inside] = block[vi[inside], ui[inside]]


def render_rotated_page(media_ref: str) -> np.ndarray:
    """'rot:'-prefixed media_ref → page with skewed text lines (then
    rotated per its ground-truth orientation class, like render_page)."""
    truth = rotated_page_truth(media_ref)
    img = np.full((truth.height, truth.width), BG, dtype=np.uint8)
    img[4 : 4 + ANCHOR_SIZE, 4 : 4 + ANCHOR_SIZE] = ANCHOR
    for r in truth.regions:
        block = _render_region_block(r.text)
        if r.line_flipped:
            block = block[::-1, ::-1]
        _paste_rotated(img, block, r.cx, r.cy, r.angle_deg)
    k = truth.orientation_class % 4
    if k:
        img = np.rot90(img, k=-k)
    return np.ascontiguousarray(img)


def render_page(media_ref: str) -> np.ndarray:
    """media_ref → (H, W) uint8 grayscale page (rotated per its
    ground-truth orientation class). Refs prefixed 'rot:' render the
    skewed-text flavor (render_rotated_page); 'warp:' renders the
    distorted-page flavor (render_warped_page, rectification input)."""
    if media_ref.startswith(ROT_PREFIX):
        return render_rotated_page(media_ref)
    if media_ref.startswith(WARP_PREFIX):
        return render_warped_page(media_ref)
    truth = page_truth(media_ref)
    img = np.full((truth.height, truth.width), BG, dtype=np.uint8)
    img[4 : 4 + ANCHOR_SIZE, 4 : 4 + ANCHOR_SIZE] = ANCHOR
    for r in truth.regions:
        block = _render_region_block(r.text)
        if r.line_flipped:
            block = block[::-1, ::-1]  # 180°
        img[r.y1 : r.y2, r.x1 : r.x2] = block
    # rotate the upright page so the engine must *detect* class k and
    # correct with np.rot90(img, k): render applies the inverse (CW k·90°)
    k = truth.orientation_class % 4
    if k:
        img = np.rot90(img, k=-k)
    return np.ascontiguousarray(img)
