"""Loud-failure boundary for the codec seams.

The media seam's contract (functions/multimodal.py) is that every
decoder fails with ValueError on corrupt input or NotImplementedError
on declared out-of-scope features — never a raw IndexError /
struct.error / KeyError from deep inside a parser, which a Spark task
would surface as an opaque mid-partition crash. Foreign and truncated
byte streams can hit any short-slice or bad-offset path in a parser;
rather than chase every site (the per-site fixes keep trickling in —
bmp RLE, tiff IFD, pdf string escapes), every PUBLIC decode entry is
wrapped once here.

`loud_decode(fmt)` converts the low-level exception families that only
corrupt input produces into ValueError, chaining the original
exception (``raise ... from e``) so the triggering site stays in the
traceback for diagnosis. ValueError and NotImplementedError pass
through untouched, so declared failures and existing message-matched
tests are unaffected — and implementation-bug roundtrip tests still
fail (as ValueError instead of IndexError), so nothing is masked from
the test suite.
"""

from __future__ import annotations

import functools
import struct
import zlib

# exception families malformed input produces at a decode boundary.
# TypeError/AttributeError are included deliberately: corrupt container
# graphs (e.g. a PDF object of the wrong type where a dict is
# expected) surface as type confusion inside the parser, and the
# chained traceback keeps the real site visible if one ever turns out
# to be a programming bug instead. MemoryError is included because a
# corrupt header's implausible dimensions hit the allocator before any
# bounds check can (the parsers also cap plausible dims where
# observed).
_CORRUPTION_ERRORS = (
    IndexError,
    KeyError,
    OverflowError,
    UnicodeDecodeError,
    TypeError,
    AttributeError,
    MemoryError,
    struct.error,
    zlib.error,
)


def loud_decode(fmt: str):
    """Decorator: re-raise low-level parse crashes as the seam's
    declared ValueError, naming the format and the original error."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except _CORRUPTION_ERRORS as e:
                raise ValueError(
                    f"corrupt {fmt} stream: {type(e).__name__}: {e}"
                ) from e

        return wrapper

    return deco
