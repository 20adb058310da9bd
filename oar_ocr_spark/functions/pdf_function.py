"""PDF type-4 (PostScript calculator) functions — PDF 32000-1 §7.10.5.

Tint transforms emitted by print workflows (Separation / DeviceN spot
colors) are very often type-4 programs rather than the sampled or
exponential forms; this module evaluates them VECTORIZED over numpy
arrays so a whole image LUT (or the unique pixel tuples of a DeviceN
image) is one interpreter pass, never per-pixel python.

Scope (declared, fails loudly outside it): the full §7.10.5.2 operator
set — arithmetic (abs add atan ceiling cos cvi cvr div exp floor idiv
ln log mod mul neg round sin sqrt sub truncate), comparison/boolean
(and bitshift eq false ge gt le lt ne not or true xor) and stack
(copy dup exch index pop roll) operators plus if/ifelse. Conditionals
evaluate both branches on forked stacks and merge elementwise with
np.where; branches that change the stack depth under a value-dependent
condition cannot describe a fixed-arity function and raise ValueError
(an all-true / all-false condition short-circuits to the taken branch,
so depth-changing branches still work when the condition is uniform).

Angles are in degrees (atan yields 0..360), `exp` is x^y, `log` is
base 10 and `round` breaks ties away from... upward (PLRM: "if equally
close, the greater") — all per the PostScript semantics the PDF spec
imports. Reference handles these inside `hayro`'s function evaluator
(oar-ocr Cargo.toml:20); this is the from-scratch numpy equivalent.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["parse_calculator", "eval_calculator"]

_TOKEN = re.compile(rb"\{|\}|[^\s{}]+")


def parse_calculator(src: bytes) -> list:
    """Program stream bytes ``{ ... }`` → nested list of floats,
    operator name strings, and sub-procedure lists. PostScript
    comments (% to end of line) are stripped first."""
    src = re.sub(rb"%[^\r\n]*", b"", src)
    toks = _TOKEN.findall(src)
    if not toks or toks[0] != b"{":
        raise ValueError("type-4 function program must start with '{'")
    stack: list[list] = [[]]
    for tok in toks:
        if tok == b"{":
            stack.append([])
        elif tok == b"}":
            done = stack.pop()
            if not stack:
                raise ValueError("type-4 program has unbalanced '}'")
            stack[-1].append(done)
        else:
            t = tok.decode("ascii", "replace")
            try:
                stack[-1].append(float(int(t)))
            except ValueError:
                try:
                    stack[-1].append(float(t))
                except ValueError:
                    if not t.isalpha():
                        raise ValueError(f"type-4 program has bad token {t!r}")
                    stack[-1].append(t)
    if len(stack) != 1:
        raise ValueError("type-4 program has unbalanced '{'")
    outer = stack[0]
    if len(outer) != 1 or not isinstance(outer[0], list):
        raise ValueError("type-4 program must be one outer procedure")
    return outer[0]


def eval_calculator(prog: list, X: np.ndarray) -> list[np.ndarray]:
    """Run a parsed program on inputs X of shape (npts, nin) — the
    domain values are pushed in order (X[:, 0] first) — and return the
    final stack bottom-to-top as float64/bool arrays of length npts.
    The caller takes the top `nout` entries as the outputs."""
    n, nin = X.shape
    st: list = [X[:, i].astype(np.float64) for i in range(nin)]
    _exec(prog, st, n)
    return st


def _num(st: list, op: str) -> np.ndarray:
    if not st:
        raise ValueError(f"type-4 stack underflow at '{op}'")
    a = st.pop()
    if isinstance(a, list):
        raise ValueError(f"type-4 '{op}' applied to a procedure")
    return a.astype(np.float64) if a.dtype == bool else a


def _any(st: list, op: str) -> np.ndarray:
    if not st:
        raise ValueError(f"type-4 stack underflow at '{op}'")
    a = st.pop()
    if isinstance(a, list):
        raise ValueError(f"type-4 '{op}' applied to a procedure")
    return a


def _uniform_int(st: list, op: str) -> int:
    """Pop an operand that must be the same integer for every sample
    (stack-shape operands: copy/index/roll counts)."""
    a = _num(st, op)
    lo, hi = a.min(), a.max()
    if lo != hi:
        raise ValueError(f"type-4 '{op}' count varies across samples")
    return int(lo)


def _merge(cond: np.ndarray, taken: list, other: list, op: str) -> list:
    if len(taken) != len(other):
        raise ValueError(
            f"type-4 '{op}' branches change the stack depth under a "
            "value-dependent condition"
        )
    out = []
    for a, b in zip(taken, other):
        if isinstance(a, list) or isinstance(b, list):
            if a is b:
                out.append(a)
                continue
            raise ValueError(f"type-4 '{op}' cannot merge procedure operands")
        out.append(np.where(cond, a, b))
    return out


def _exec(prog: list, st: list, n: int) -> None:
    for tok in prog:
        if isinstance(tok, float):
            st.append(np.full(n, tok))
            continue
        if isinstance(tok, list):
            st.append(tok)
            continue
        op = tok
        if op == "if" or op == "ifelse":
            if op == "ifelse":
                p2 = st.pop() if st else None
            p1 = st.pop() if st else None
            cond = _any(st, op)
            if cond.dtype != bool:
                raise ValueError(f"type-4 '{op}' condition is not boolean")
            if not isinstance(p1, list) or (op == "ifelse" and not isinstance(p2, list)):
                raise ValueError(f"type-4 '{op}' operand is not a procedure")
            if cond.all():
                _exec(p1, st, n)
            elif not cond.any():
                if op == "ifelse":
                    _exec(p2, st, n)
            else:
                base = list(st)
                taken = list(st)
                _exec(p1, taken, n)
                other = list(base)
                if op == "ifelse":
                    _exec(p2, other, n)
                st[:] = _merge(cond, taken, other, op)
            continue
        fn = _OPS.get(op)
        if fn is None:
            raise ValueError(f"type-4 operator '{op}' is not defined")
        fn(st, n)


def _binary(f):
    def run(st, n):
        b = _num(st, "binary")
        a = _num(st, "binary")
        with np.errstate(divide="ignore", invalid="ignore"):
            st.append(f(a, b))

    return run


def _unary(f):
    def run(st, n):
        a = _num(st, "unary")
        with np.errstate(divide="ignore", invalid="ignore"):
            st.append(f(a))

    return run


def _cmp(f):
    def run(st, n):
        b = _any(st, "compare")
        a = _any(st, "compare")
        st.append(f(a, b))

    return run


def _bitwise(logical, intop):
    """and/or/xor: logical on booleans, bitwise on integers."""

    def run(st, n):
        b = _any(st, "bool/bitwise")
        a = _any(st, "bool/bitwise")
        if a.dtype == bool and b.dtype == bool:
            st.append(logical(a, b))
        else:
            ai = a.astype(np.int64)
            bi = b.astype(np.int64)
            st.append(intop(ai, bi).astype(np.float64))

    return run


def _not(st, n):
    a = _any(st, "not")
    if a.dtype == bool:
        st.append(~a)
    else:
        st.append((~a.astype(np.int64)).astype(np.float64))


def _bitshift(st, n):
    s = _num(st, "bitshift").astype(np.int64)
    a = _num(st, "bitshift").astype(np.int64)
    left = a << np.clip(s, 0, 63)
    right = a >> np.clip(-s, 0, 63)
    st.append(np.where(s >= 0, left, right).astype(np.float64))


def _pop(st, n):
    _any(st, "pop")


def _exch(st, n):
    if len(st) < 2:
        raise ValueError("type-4 stack underflow at 'exch'")
    st[-1], st[-2] = st[-2], st[-1]


def _dup(st, n):
    if not st:
        raise ValueError("type-4 stack underflow at 'dup'")
    st.append(st[-1])


def _copy(st, n):
    k = _uniform_int(st, "copy")
    if k < 0 or (k and k > len(st)):
        raise ValueError("type-4 'copy' count out of range")
    if k:
        st.extend(st[-k:])


def _index(st, n):
    k = _uniform_int(st, "index")
    if k < 0 or k >= len(st):
        raise ValueError("type-4 'index' out of range")
    st.append(st[-1 - k])


def _roll(st, n):
    j = _uniform_int(st, "roll")
    k = _uniform_int(st, "roll")
    if k < 0 or k > len(st):
        raise ValueError("type-4 'roll' count out of range")
    if k:
        j %= k
        if j:
            seg = st[len(st) - k :]
            st[len(st) - k :] = seg[-j:] + seg[:-j]


_OPS = {
    "add": _binary(lambda a, b: a + b),
    "sub": _binary(lambda a, b: a - b),
    "mul": _binary(lambda a, b: a * b),
    "div": _binary(lambda a, b: a / b),
    "idiv": _binary(lambda a, b: np.trunc(a / b)),
    "mod": _binary(np.fmod),
    "neg": _unary(np.negative),
    "abs": _unary(np.abs),
    "sqrt": _unary(np.sqrt),
    "sin": _unary(lambda a: np.sin(np.radians(a))),
    "cos": _unary(lambda a: np.cos(np.radians(a))),
    "atan": _binary(lambda a, b: np.degrees(np.arctan2(a, b)) % 360.0),
    "exp": _binary(lambda a, b: a**b),
    "ln": _unary(np.log),
    "log": _unary(np.log10),
    "cvi": _unary(np.trunc),
    "cvr": _unary(lambda a: a),
    "ceiling": _unary(np.ceil),
    "floor": _unary(np.floor),
    # PLRM round: nearest, ties toward the greater value
    "round": _unary(lambda a: np.floor(a + 0.5)),
    "truncate": _unary(np.trunc),
    "eq": _cmp(lambda a, b: a == b),
    "ne": _cmp(lambda a, b: a != b),
    "gt": _cmp(lambda a, b: a > b),
    "ge": _cmp(lambda a, b: a >= b),
    "lt": _cmp(lambda a, b: a < b),
    "le": _cmp(lambda a, b: a <= b),
    "and": _bitwise(np.logical_and, lambda a, b: a & b),
    "or": _bitwise(np.logical_or, lambda a, b: a | b),
    "xor": _bitwise(np.logical_xor, lambda a, b: a ^ b),
    "not": _not,
    "bitshift": _bitshift,
    "true": lambda st, n: st.append(np.ones(n, dtype=bool)),
    "false": lambda st, n: st.append(np.zeros(n, dtype=bool)),
    "pop": _pop,
    "exch": _exch,
    "dup": _dup,
    "copy": _copy,
    "index": _index,
    "roll": _roll,
}
