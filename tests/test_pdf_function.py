"""Unit tests for the type-4 PostScript calculator interpreter
(functions/pdf_function.py) — PDF 32000 §7.10.5 semantics, evaluated
vectorized over numpy arrays."""

import numpy as np
import pytest

from oar_ocr_spark.functions.pdf_function import (
    eval_calculator,
    parse_calculator,
)


def run(src: bytes, *cols):
    X = np.stack([np.asarray(c, dtype=np.float64) for c in cols], axis=1)
    return eval_calculator(parse_calculator(src), X)


def top(src: bytes, *cols):
    return run(src, *cols)[-1]


class TestParse:
    def test_nested_procedures(self):
        prog = parse_calculator(b"{ 1 2 { add } { sub } ifelse }")
        assert prog[0] == 1.0 and isinstance(prog[2], list)

    def test_comments_stripped(self):
        prog = parse_calculator(b"{ 1 % a comment with } brace\n 2 add }")
        assert prog == [1.0, 2.0, "add"]

    def test_errors(self):
        for bad in (b"1 2 add", b"{ 1 2 add", b"{ } }", b"{ 1 2 @ }"):
            with pytest.raises(ValueError):
                parse_calculator(bad)


class TestArithmetic:
    def test_basics(self):
        assert top(b"{ 3 add }", [1, 2]).tolist() == [4, 5]
        assert top(b"{ 2 sub }", [5, 1]).tolist() == [3, -1]
        assert top(b"{ 3 mul }", [2, -1]).tolist() == [6, -3]
        assert top(b"{ 4 div }", [2, 6]).tolist() == [0.5, 1.5]
        assert top(b"{ neg abs }", [3, -4]).tolist() == [3, 4]

    def test_integer_ops(self):
        # idiv/mod truncate toward zero with the dividend's sign
        assert top(b"{ 3 idiv }", [7, -7]).tolist() == [2, -2]
        assert top(b"{ 3 mod }", [7, -7]).tolist() == [1, -1]

    def test_rounding_family(self):
        vals = [1.2, 1.5, -1.5, -1.2]
        assert top(b"{ floor }", vals).tolist() == [1, 1, -2, -2]
        assert top(b"{ ceiling }", vals).tolist() == [2, 2, -1, -1]
        # PLRM round: ties go to the GREATER value
        assert top(b"{ round }", vals).tolist() == [1, 2, -1, -1]
        assert top(b"{ truncate }", vals).tolist() == [1, 1, -1, -1]
        assert top(b"{ cvi }", vals).tolist() == [1, 1, -1, -1]

    def test_trig_degrees(self):
        np.testing.assert_allclose(
            top(b"{ sin }", [0, 90, 180]), [0, 1, 0], atol=1e-12
        )
        np.testing.assert_allclose(
            top(b"{ cos }", [0, 90, 180]), [1, 0, -1], atol=1e-12
        )
        # atan: num den → 0..360 degrees
        np.testing.assert_allclose(
            top(b"{ 1 atan }", [1, -1]), [45, 315], atol=1e-12
        )

    def test_exp_ln_log_sqrt(self):
        np.testing.assert_allclose(top(b"{ 2 exp }", [3, 4]), [9, 16])
        np.testing.assert_allclose(top(b"{ ln }", [np.e]), [1])
        np.testing.assert_allclose(top(b"{ log }", [100]), [2])
        np.testing.assert_allclose(top(b"{ sqrt }", [9]), [3])


class TestBoolean:
    def test_comparisons(self):
        assert top(b"{ 2 lt }", [1, 2, 3]).tolist() == [True, False, False]
        assert top(b"{ 2 ge }", [1, 2, 3]).tolist() == [False, True, True]
        assert top(b"{ 2 eq }", [1, 2, 3]).tolist() == [False, True, False]

    def test_logical_vs_bitwise(self):
        assert top(b"{ true and }", [1]).dtype != bool  # 1 and true? no —
        # numeric & bool mixes are bitwise per our int fallback; pure
        # boolean pairs stay logical:
        assert top(b"{ 1 gt true and }", [0, 2]).tolist() == [False, True]
        assert top(b"{ 12 and }", [10]).tolist() == [8]
        assert top(b"{ 10 xor }", [12]).tolist() == [6]
        assert top(b"{ not }", [0]).tolist() == [-1]  # bitwise ~0
        assert top(b"{ 0 gt not }", [1]).tolist() == [False]

    def test_bitshift(self):
        assert top(b"{ 2 bitshift }", [1, 3]).tolist() == [4, 12]
        assert top(b"{ -1 bitshift }", [4, 5]).tolist() == [2, 2]


class TestStackOps:
    def test_exch_dup_pop(self):
        st = run(b"{ dup 1 add exch }", [5])
        assert st[-1].tolist() == [5] and st[-2].tolist() == [6]
        assert top(b"{ 9 pop }", [3]).tolist() == [3]

    def test_copy_index_roll(self):
        st = run(b"{ 2 copy }", [1], [2])
        assert [a.tolist() for a in st] == [[1], [2], [1], [2]]
        assert top(b"{ 1 index }", [7, 8], [0, 0]).tolist() == [7, 8]
        st = run(b"{ 3 1 roll }", [1], [2], [3])
        assert [a.tolist() for a in st] == [[3], [1], [2]]
        st = run(b"{ 3 -1 roll }", [1], [2], [3])
        assert [a.tolist() for a in st] == [[2], [3], [1]]

    def test_varying_count_rejected(self):
        with pytest.raises(ValueError, match="varies"):
            run(b"{ copy }", [1, 2])


class TestConditionals:
    def test_if_uniform(self):
        assert top(b"{ true { 1 add } if }", [1, 2]).tolist() == [2, 3]
        assert top(b"{ false { 1 add } if }", [1, 2]).tolist() == [1, 2]

    def test_ifelse_mixed(self):
        out = top(b"{ dup 1 gt { 10 mul } { 100 mul } ifelse }", [1, 2])
        assert out.tolist() == [100, 20]

    def test_depth_change_uniform_cond_ok(self):
        # depth-changing branch is fine when the condition is uniform
        assert [a.tolist() for a in run(b"{ true { dup } if }", [4])] == [
            [4],
            [4],
        ]

    def test_depth_change_mixed_cond_rejected(self):
        with pytest.raises(ValueError, match="stack depth"):
            run(b"{ 1 gt { 0 } if }", [0, 2])

    def test_non_boolean_condition_rejected(self):
        with pytest.raises(ValueError, match="not boolean"):
            run(b"{ 1 { 2 } if }", [0])


class TestErrors:
    def test_underflow_and_unknown(self):
        with pytest.raises(ValueError, match="underflow"):
            run(b"{ add }", [1])
        with pytest.raises(ValueError, match="not defined"):
            run(b"{ 1 foo }", [1])
