"""Pure-python JBIG2 codec (ITU-T T.88), embedded-stream profile.

JBIG2 is the dominant bilevel codec of born-scanned PDFs — the
/JBIG2Decode filter (PDF 32000 7.4.7) wraps an EMBEDDED T.88 stream
(no file header, segment headers + data). Reference handles these
through its PDF crate stack (hayro, Cargo.toml:20); here the format
is written directly against the public ITU-T T.88 (02/2000) text.

Implemented (encode AND decode, the repo-wide twin contract):
- segment headers (7.2): number / type / referred-to list / page
  association / data length;
- page information (7.4.8) and the end-of-page / end-of-stripe /
  end-of-file bookkeeping segments; extensions (62) are skipped;
- GENERIC REGION segments (7.4.6, immediate + immediate lossless):
  the arithmetic generic decoding procedure (6.2.5.7) with ALL FOUR
  templates (GB 0-3), custom adaptive (AT) pixels, and TPGDON typical
  prediction — driven by the SAME MQ coder as JPEG 2000
  (functions/jp2: T.88 Annex E == 15444-1 Annex C), with per-template
  context spaces and the spec's SLTP pseudo-contexts;
- MMR-coded generic regions delegate to the engine's T.6 codec
  (functions/ccitt.ccitt_decode, k < 0);
- region composition onto the page bitmap (OR/AND/XOR/XNOR/REPLACE).

Decoder model mirrors functions/ccitt: the page is a (rows, columns)
uint8 bit matrix with **1 = black** (T.88 codes foreground = 1); the
PDF adapter maps polarity exactly like CCITTFaxDecode.

Scope (fails loudly): symbol dictionaries / text regions, halftone,
refinement, huffman-tabled regions, striped pages with unknown
length, and intermediate generic regions raise NotImplementedError;
damaged streams raise ValueError.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec_guard import loud_decode
from .jp2 import _MQDecoder, _MQEncoder

__all__ = ["encode_jbig2", "decode_jbig2", "JBIG2_MAGIC"]

# standalone .jb2 file header ID string (T.88 Annex D.4.1)
JBIG2_MAGIC = b"\x97JB2\r\n\x1a\n"

# fixed context pixels per generic template (T.88 figures 4-7), as
# (x, y) offsets; AT pixel counts and nominal positions; the context
# is the template + AT pixels sorted by (y, x), MSB first — the
# ordering the SLTP pseudo-context constants below are defined for
_TEMPLATES = {
    0: [(-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
    1: [(-1, -2), (0, -2), (1, -2), (2, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-3, 0), (-2, 0), (-1, 0)],
    2: [(-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-2, 0), (-1, 0)],
    3: [(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
}
_NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}
# SLTP (typical prediction) pseudo-contexts per template (6.2.5.7)
_SLTP_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _sorted_template(template: int, at: list) -> list:
    if template not in _TEMPLATES:
        raise ValueError(f"JBIG2 generic template {template} is illegal")
    if len(at) != len(_NOMINAL_AT[template]):
        raise ValueError(
            f"JBIG2 template {template} needs {len(_NOMINAL_AT[template])} "
            f"AT pixels, got {len(at)}"
        )
    pix = list(_TEMPLATES[template]) + [(int(x), int(y)) for x, y in at]
    pix.sort(key=lambda p: (p[1], p[0]))
    return pix


def _shifted(row: np.ndarray, dx: int, w: int) -> np.ndarray:
    """row value at column x+dx (0 outside [0, w)) as a length-w
    vector."""
    out = np.zeros(w, dtype=np.int64)
    if dx >= 0:
        if dx < w:
            out[: w - dx] = row[dx:]
    else:
        if -dx < w:
            out[-dx:] = row[: w + dx]
    return out


class _GenericCtx:
    """Per-row context machinery shared by the generic encoder and
    decoder: the above-rows contribution is vectorized per row; the
    current-row pixels feed a shift register when they form the
    contiguous run x-n..x-1 (every standard template), else a slow
    per-pixel gather."""

    def __init__(self, template: int, at: list, w: int):
        pix = _sorted_template(template, at)
        self.nbits = len(pix)
        self.w = w
        self.above = []  # (weight, dx, dy) for y < 0 pixels
        row0 = []
        for k, (dx, dy) in enumerate(pix):
            weight = self.nbits - 1 - k
            if dy < 0:
                self.above.append((weight, dx, dy))
            else:
                if dy != 0 or dx >= 0:
                    raise ValueError(
                        f"JBIG2 AT pixel {(dx, dy)} is not causal"
                    )
                row0.append((weight, dx))
        # fast path iff row-0 pixels are the low bits and contiguous
        # in x (true for every fixed template and nominal AT layout)
        n0 = len(row0)
        self.fast = sorted(w_ for w_, _ in row0) == list(range(n0)) and sorted(
            dx for _, dx in row0
        ) == list(range(-n0, 0))
        self.row0 = row0
        self.n0 = n0
        self.mask0 = (1 << n0) - 1

    def above_vector(self, rows: list, y: int) -> np.ndarray:
        """Context contribution of the rows above y, per column."""
        w = self.w
        out = np.zeros(w, dtype=np.int64)
        for weight, dx, dy in self.above:
            if y + dy < 0:
                continue
            out += _shifted(rows[y + dy], dx, w) << weight
        return out


def _generic_region(
    coder,
    bits: np.ndarray | None,
    h: int,
    w: int,
    template: int,
    at: list,
    tpgdon: bool,
) -> np.ndarray:
    """The 6.2.5.7 generic procedure, one body for both directions:
    with `bits` it ENCODES into `coder` (an _MQEncoder) and returns
    `bits`; with bits=None it DECODES from `coder` (an _MQDecoder)."""
    ctx = _GenericCtx(template, at, w)
    encode = bits is not None
    rows: list = []
    ltp = 0
    for y in range(h):
        prev = rows[y - 1] if y else np.zeros(w, dtype=np.uint8)
        if tpgdon:
            if encode:
                typical = int(np.array_equal(bits[y], prev))
                coder.encode(_SLTP_CTX[template], typical ^ ltp)
                ltp = typical
            else:
                ltp ^= coder.decode(_SLTP_CTX[template])
            if ltp:
                rows.append(prev.copy() if not encode else bits[y])
                continue
        above = ctx.above_vector(rows if not encode else list(bits[:y]), y)
        cur = bits[y] if encode else np.zeros(w, dtype=np.uint8)
        if ctx.fast:
            reg = 0
            mask0, n0 = ctx.mask0, ctx.n0
            if encode:
                enc = coder.encode
                row = cur
                for x in range(w):
                    b = int(row[x])
                    enc(int(above[x]) | reg, b)
                    reg = ((reg << 1) | b) & mask0
            else:
                dec = coder.decode
                for x in range(w):
                    b = dec(int(above[x]) | reg)
                    cur[x] = b
                    reg = ((reg << 1) | b) & mask0
        else:
            # slow gather: AT pixels on the current row at custom
            # offsets — correct over any causal layout
            for x in range(w):
                c = int(above[x])
                for weight, dx in ctx.row0:
                    xx = x + dx
                    if 0 <= xx < w and cur[xx]:
                        c |= 1 << weight
                if encode:
                    coder.encode(c, int(cur[x]))
                else:
                    cur[x] = coder.decode(c)
        rows.append(cur)
    return bits if encode else np.stack(rows) if rows else np.zeros(
        (0, w), dtype=np.uint8
    )


def _fresh_jbig2_ctx(nbits: int) -> tuple[list, list]:
    """JBIG2 initializes every context to state 0 / MPS 0 (E.3.5)."""
    n = 1 << nbits
    return [0] * n, [0] * n


# ---------------------------------------------------------------------------
# segment layer (7.2): embedded stream, no file header
# ---------------------------------------------------------------------------


def _seg_header(
    number: int, stype: int, page: int, length: int, referred: list[int] = ()
) -> bytes:
    out = struct.pack(">IB", number, stype & 0x3F)
    if len(referred) > 4:
        raise ValueError("JBIG2 encoder emits at most 4 referred segments")
    out += bytes([len(referred) << 5])
    size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    for rn in referred:
        out += rn.to_bytes(size, "big")
    out += bytes([page])  # 1-byte page association (flags bit 6 clear)
    out += struct.pack(">I", length)
    return out


def encode_jbig2(
    bits: np.ndarray,
    template: int = 0,
    tpgdon: bool = False,
    mmr: bool = False,
    at: list | None = None,
    file_header: bool = False,
) -> bytes:
    """(rows, columns) {0,1} bit matrix (1 = black) → embedded JBIG2
    stream (page info + one immediate lossless generic region +
    end-of-page), the layout /JBIG2Decode carries. `template`/`at`/
    `tpgdon` select the arithmetic generic coding flavor; `mmr=True`
    writes the region MMR-coded via the T.6 encoder instead.
    `file_header=True` prepends the standalone .jb2 file header
    (Annex D: ID string + sequential-organization flags + page
    count), the layout loose JBIG2 files ship in."""
    if bits.ndim != 2 or bits.dtype != np.uint8 or int(bits.max(initial=0)) > 1:
        raise ValueError("encode_jbig2 expects a (rows, cols) uint8 {0,1} matrix")
    h, w = bits.shape
    if h == 0 or w == 0:
        raise ValueError("empty bitmap")
    if at is None:
        at = _NOMINAL_AT[template] if template in _NOMINAL_AT else None
    if mmr:
        from .ccitt import ccitt_encode_g4

        payload = ccitt_encode_g4(bits)
        flags = 0x01
        at_bytes = b""
    else:
        ctxbits = len(_sorted_template(template, at))
        enc = _MQEncoder(ctx=_fresh_jbig2_ctx(ctxbits))
        _generic_region(enc, bits, h, w, template, at, tpgdon)
        payload = enc.flush()
        flags = (template << 1) | (0x08 if tpgdon else 0)
        at_bytes = b"".join(
            struct.pack(">bb", dx, dy) for dx, dy in at
        )
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)  # at (0,0), OR
    region = region_info + bytes([flags]) + at_bytes + payload
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    out = _seg_header(1, 48, 1, len(page_info)) + page_info
    out += _seg_header(2, 39, 1, len(region)) + region
    out += _seg_header(3, 49, 1, 0)
    if file_header:
        # sequential organization (bit 0), known page count of 1
        out = JBIG2_MAGIC + bytes([0x01]) + struct.pack(">I", 1) + out
    return out


def _parse_seg_header(data: bytes, pos: int) -> tuple[dict, int]:
    if pos + 11 > len(data):
        raise ValueError("JBIG2 segment header truncated")
    number, flags = struct.unpack(">IB", data[pos : pos + 5])
    stype = flags & 0x3F
    page4 = bool(flags & 0x40)
    pos += 5
    b = data[pos]
    if (b >> 5) == 7:
        (count,) = struct.unpack(">I", data[pos : pos + 4])
        count &= 0x1FFFFFFF
        pos += 4 + -(-(count + 1) // 8)  # + retain bits
    else:
        count = b >> 5
        pos += 1
    size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    if pos + count * size > len(data):
        raise ValueError("JBIG2 referred-to list truncated")
    referred = [
        int.from_bytes(data[pos + k * size : pos + (k + 1) * size], "big")
        for k in range(count)
    ]
    pos += count * size
    if page4:
        (page,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
    else:
        page = data[pos]
        pos += 1
    (length,) = struct.unpack(">I", data[pos : pos + 4])
    pos += 4
    if length == 0xFFFFFFFF:
        raise NotImplementedError(
            "JBIG2 segment with unknown data length not supported"
        )
    if pos + length > len(data):
        raise ValueError("JBIG2 segment data truncated")
    return {
        "number": number, "type": stype, "page": page,
        "referred": referred, "length": length,
    }, pos


_COMBINE = {
    0: lambda a, b: a | b,
    1: lambda a, b: a & b,
    2: lambda a, b: a ^ b,
    3: lambda a, b: 1 - (a ^ b),
    4: lambda a, b: b,
}


def _decode_generic_segment(body: bytes) -> tuple[np.ndarray, int, int, int]:
    """Generic region segment data → (bitmap, x, y, combine op)."""
    if len(body) < 18:
        raise ValueError("JBIG2 generic region data truncated")
    w, h, x, y, rflags = struct.unpack(">IIIIB", body[:17])
    if int(w) * int(h) > 1 << 28:  # sanity cap, mirrors the SIZ guard
        raise ValueError(f"implausible JBIG2 region dimensions {w}x{h}")
    op = rflags & 0x07
    if op not in _COMBINE:
        raise ValueError(f"JBIG2 region combination operator {op} is illegal")
    gflags = body[17]
    mmr = gflags & 0x01
    template = (gflags >> 1) & 0x03
    tpgdon = bool(gflags & 0x08)
    pos = 18
    if mmr:
        from .ccitt import ccitt_decode

        bm = ccitt_decode(body[pos:], int(w), int(h), k=-1)
        return bm, int(x), int(y), op
    n_at = 4 if template == 0 else 1
    if pos + 2 * n_at > len(body):
        raise ValueError("JBIG2 AT pixel list truncated")
    at = [
        struct.unpack(">bb", body[pos + 2 * k : pos + 2 * k + 2])
        for k in range(n_at)
    ]
    pos += 2 * n_at
    ctxbits = len(_sorted_template(template, at))
    dec = _MQDecoder(body[pos:], ctx=_fresh_jbig2_ctx(ctxbits))
    bm = _generic_region(dec, None, int(h), int(w), template, at, tpgdon)
    return bm, int(x), int(y), op


@loud_decode("JBIG2")
def decode_jbig2(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Embedded JBIG2 stream (+ optional /JBIG2Globals bytes,
    prepended per PDF 32000 7.4.7) → (rows, columns) uint8 bit matrix
    with 1 = black, the functions/ccitt convention. Supports page
    info + generic region streams (arithmetic all four templates,
    TPGDON, custom AT; or MMR); symbol/text/halftone/refinement
    segments fail loudly. A standalone .jb2 file header (Annex D) is
    recognized and stripped; random-access organization is out of
    scope."""
    data = bytes(data)
    if data[:8] == JBIG2_MAGIC:
        if len(data) < 9:
            raise ValueError("JBIG2 file header truncated")
        flags = data[8]
        if not flags & 0x01:
            raise NotImplementedError(
                "JBIG2 random-access file organization not supported"
            )
        data = data[9 if flags & 0x02 else 13:]  # page count if known
    data = bytes(globals_data) + data
    pos = 0
    page: np.ndarray | None = None
    page_h_unknown = False
    regions = 0
    while pos < len(data):
        seg, pos = _parse_seg_header(data, pos)
        body = data[pos : pos + seg["length"]]
        pos += seg["length"]
        t = seg["type"]
        if t == 48:  # page information
            if len(body) < 19:
                raise ValueError("JBIG2 page info truncated")
            w, h = struct.unpack(">II", body[:8])
            defpix = (body[16] >> 2) & 1
            if int(w) * int(h if h != 0xFFFFFFFF else 1) > 1 << 28:
                raise ValueError(f"implausible JBIG2 page dimensions {w}x{h}")
            page_h_unknown = h == 0xFFFFFFFF
            page = np.full(
                (0 if page_h_unknown else int(h), int(w)),
                defpix,
                dtype=np.uint8,
            )
        elif t in (38, 39):  # immediate (lossless) generic region
            if page is None:
                raise ValueError("JBIG2 region before page information")
            bm, x, y, op = _decode_generic_segment(body)
            bh, bw = bm.shape
            if y + bh > page.shape[0]:
                if not page_h_unknown and op != 4:
                    raise ValueError("JBIG2 region exceeds the page height")
                grown = np.zeros((y + bh, page.shape[1]), dtype=np.uint8)
                grown[: page.shape[0]] = page
                page = grown
            if x + bw > page.shape[1]:
                raise ValueError("JBIG2 region exceeds the page width")
            window = page[y : y + bh, x : x + bw]
            page[y : y + bh, x : x + bw] = _COMBINE[op](window, bm)
            regions += 1
        elif t == 36:
            raise NotImplementedError(
                "JBIG2 intermediate generic regions not supported"
            )
        elif t in (0, 4, 6, 7):
            raise NotImplementedError(
                "JBIG2 symbol-dictionary / text-region segments not supported"
            )
        elif t in (16, 20, 22, 23):
            raise NotImplementedError("JBIG2 halftone segments not supported")
        elif t in (40, 42, 43):
            raise NotImplementedError("JBIG2 refinement segments not supported")
        elif t == 53:
            raise NotImplementedError("JBIG2 custom huffman tables not supported")
        elif t in (49, 50, 51, 52, 62):
            continue  # end-of-page/stripe/file, profiles, extension
        else:
            raise ValueError(f"JBIG2 segment type {t} is illegal")
    if page is None or not regions:
        raise ValueError("JBIG2 stream carries no decodable page region")
    return page
