"""Property tests for reading-order invariants on random boxes."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from oar_ocr_spark.operators.sorting import (
    sort_by_xycut,
    sort_poly_boxes,
    sort_quad_boxes,
)


def boxes_strategy(n):
    rng = np.random.default_rng(n)
    m = rng.integers(1, 12)
    xy = rng.uniform(0, 500, size=(m, 2))
    wh = rng.uniform(5, 120, size=(m, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 10_000))
def test_sort_quad_boxes_is_permutation(seed):
    b = boxes_strategy(seed)
    order = sort_quad_boxes(b)
    assert sorted(order) == list(range(len(b)))


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 10_000))
def test_sort_quad_boxes_weak_monotone_y(seed):
    # across a >10px y-gap, order must follow y (the bubble pass only
    # reorders within the 10px same-line tolerance)
    b = boxes_strategy(seed)
    order = sort_quad_boxes(b)
    ys = b[order][:, 1]
    for i in range(len(ys) - 1):
        assert ys[i + 1] - ys[i] > -10.0 - 1e-4


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 10_000))
def test_sort_poly_boxes_monotone_y(seed):
    b = boxes_strategy(seed)
    ys = b[sort_poly_boxes(b)][:, 1]
    assert (np.diff(ys) >= -1e-6).all()


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 10_000))
def test_xycut_is_permutation(seed):
    b = boxes_strategy(seed)
    order = sort_by_xycut(b, "vertical", 1)
    # xycut visits every box exactly once (no drops, no dups)
    assert sorted(order) == list(range(len(b)))
