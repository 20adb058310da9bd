"""Property test: the vectorized run-based connected components must
agree with a brute-force flood fill on random masks (labels, extents,
and discovery order)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from oar_ocr_spark.operators.db_postprocess import connected_components_boxes


def flood_components(m: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Brute-force 8-connected components in first-pixel scan order."""
    h, w = m.shape
    seen = np.zeros_like(m, dtype=bool)
    out = []
    for y in range(h):
        for x in range(w):
            if not m[y, x] or seen[y, x]:
                continue
            stack = [(y, x)]
            seen[y, x] = True
            x0 = x1 = x
            y0 = y1 = y
            while stack:
                cy, cx = stack.pop()
                x0, x1 = min(x0, cx), max(x1, cx)
                y0, y1 = min(y0, cy), max(y1, cy)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = cy + dy, cx + dx
                        if 0 <= ny < h and 0 <= nx < w and m[ny, nx] and not seen[ny, nx]:
                            seen[ny, nx] = True
                            stack.append((ny, nx))
            out.append((x0, y0, x1, y1))
    return out


@settings(max_examples=120, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(0, 10_000),
    st.floats(0.05, 0.8),
)
def test_components_match_flood_fill(h, w, seed, density):
    rng = np.random.default_rng(seed)
    m = rng.random((h, w)) < density
    got = connected_components_boxes(m)
    exp = flood_components(m)
    assert sorted(got) == sorted(exp)
    # same extents set AND same count; discovery order: both are
    # first-pixel orders, compare directly
    assert got == exp


def test_components_empty_and_full():
    assert connected_components_boxes(np.zeros((5, 5), dtype=bool)) == []
    assert connected_components_boxes(np.ones((3, 4), dtype=bool)) == [(0, 0, 3, 2)]
