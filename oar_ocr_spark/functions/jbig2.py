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
- SYMBOL DICTIONARIES (6.5) and TEXT REGIONS (6.4) — the layout
  born-scanned PDFs actually carry (jbig2enc's default): arithmetic
  integer decoding (Annex A: the IADH/IADW/IAEX/IADT/IAFS/IADS/IAIT
  procedures with 512-state PREV tracking, and the IAID tree code),
  height-class symbol decode with shared generic contexts, export
  runs, strip-based instance placement with all four reference
  corners and per-instance combination ops; plus a SYMBOL-MODE
  ENCODER twin (connected components -> deduplicated dictionary ->
  text region);
- region composition onto the page bitmap (OR/AND/XOR/XNOR/REPLACE);
- the standalone .jb2 file header (Annex D, sequential organization).

Decoder model mirrors functions/ccitt: the page is a (rows, columns)
uint8 bit matrix with **1 = black** (T.88 codes foreground = 1); the
PDF adapter maps polarity exactly like CCITTFaxDecode.

Text regions decode in all four reference corners, multi-row strips,
and TRANSPOSED orientation (6.4.5 3c — the vertical-text layout).
Immediate REFINEMENT regions (6.3: both templates, TPGRON typical
prediction, nominal GRAT) decode against the page content and an
encoder twin writes the lossy-then-lossless two-pass layout.
PATTERN DICTIONARIES (6.7) + immediate HALFTONE regions (6.6: Annex-C
gray-coded bitplanes through one shared context, skewed 8.8
fixed-point grids) decode — in ARITHMETIC and MMR modes (C.5: all
bitplanes through one continuous T.6 stream) and with HENABLESKIP
skip bitmaps (out-of-region grid cells uncoded, USESKIP through the
generic procedure) — with an encoder twin writing the
dithered-photograph layout (square density-ramp patterns, mmr/skip
flavors). REFINED
SYMBOL dictionaries (SDREFAGG=1, 6.5.8.2: each symbol a displaced
single-instance refinement of an earlier one) decode, with an
encoder twin coding repeated-shape glyphs against their exemplars.

HUFFMAN MODE (the fax-profile entropy layer): Annex B code tables —
standard tables B.1-B.5 and CUSTOM type-53 table segments (B.2.4)
with the B.3 canonical code assignment — drive huffman symbol
dictionaries (SDHUFF=1: DH/DW deltas through B.4/B.2 or custom
tables, height classes carried as COLLECTIVE bitmaps, uncompressed
or MMR, exports as B.1 runlengths) and huffman text regions
(SBHUFF=1: custom FS/DS/DT tables, CURT as raw bits, symbol IDs
assigned through the 7.4.3.1.7 runcode mechanism including the
repeat runcodes 32/33/34), with an encoder twin
(encode_jbig2_symbols_huffman).

REFINED TEXT REGIONS (6.4.11, SBREFINE=1) decode in arithmetic mode:
a per-instance IARI flag selects refinement, IARDW/IARDH size deltas
and IARDX/IARDY displacements feed the generic refinement procedure
against the symbol bitmap — with an encoder twin
(encode_jbig2_text_refined: exemplar-per-height dictionary, varying
glyph impressions refined per instance).

AGGREGATE SYMBOL CODING (6.5.8.2.1, REFAGGNINST > 1) decodes: the
symbol runs the shared text-region placement procedure over the
available symbols with the dictionary's own contexts (SBREFINE=1,
one-row strips, TL corner, OR), with an encoder twin
(encode_jbig2_symbols_aggregate: two refined instances per symbol).

Scope (fails loudly):
huffman+refinement symbol dictionaries (SDHUFF=1 with REFAGG=1),
huffman refined text regions (SBHUFF=1 with SBREFINE=1), custom
refinement GRAT/SBRAT pixels, the standard TEXT-REGION tables
B.6-B.15 (custom type-53 tables only), segments of unknown length,
and intermediate regions raise NotImplementedError; damaged streams
raise ValueError.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec_guard import loud_decode
from .jp2 import _MQDecoder, _MQEncoder

__all__ = [
    "encode_jbig2",
    "encode_jbig2_symbols",
    "encode_jbig2_symbols_refined",
    "encode_jbig2_refinement",
    "encode_jbig2_halftone",
    "decode_jbig2",
    "JBIG2_MAGIC",
]

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
    skip: np.ndarray | None = None,
) -> np.ndarray:
    """The 6.2.5.7 generic procedure, one body for both directions:
    with `bits` it ENCODES into `coder` (an _MQEncoder) and returns
    `bits`; with bits=None it DECODES from `coder` (an _MQDecoder).
    `skip` (USESKIP, 6.2.5.7 step 3c iii) marks pixels that are NOT
    coded and take value 0 — the halftone out-of-region cells."""
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
        srow = skip[y] if skip is not None else None
        if ctx.fast:
            reg = 0
            mask0, n0 = ctx.mask0, ctx.n0
            if srow is not None:
                # skip-aware path (halftone HSKIP): skipped pixels
                # stay 0 and are never coded
                if encode:
                    enc = coder.encode
                    for x in range(w):
                        if srow[x]:
                            reg = (reg << 1) & mask0
                            continue
                        b = int(cur[x])
                        enc(int(above[x]) | reg, b)
                        reg = ((reg << 1) | b) & mask0
                else:
                    dec = coder.decode
                    for x in range(w):
                        if srow[x]:
                            reg = (reg << 1) & mask0
                            continue
                        b = dec(int(above[x]) | reg)
                        cur[x] = b
                        reg = ((reg << 1) | b) & mask0
            elif encode:
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
                if srow is not None and srow[x]:
                    continue  # skipped pixels stay 0, uncoded
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


# generic REFINEMENT templates (6.3.5.3, figures 12/13): per context
# bit (source, dx, dy) with source 0 = the bitmap being refined and
# source 1 = the reference bitmap; the bit's weight is its list
# position (LSB first, the published layout). The adaptive pixels A1
# (current) and A2 (reference) of template 0 are fixed at their
# nominal (-1, -1) locations — a segment signalling custom GRAT fails
# loudly (real encoders emit nominal).
_REFINE_TEMPLATES = {
    0: [(0, -1, 0), (0, 1, -1), (0, 0, -1), (0, -1, -1),
        (1, 1, 1), (1, 0, 1), (1, -1, 1), (1, -1, -1),
        (1, 1, 0), (1, 0, 0), (1, -1, 0), (1, 1, -1), (1, 0, -1)],
    1: [(0, -1, 0), (0, 1, -1), (0, 0, -1), (0, -1, -1),
        (1, 1, 1), (1, 0, 1), (1, 1, 0), (1, 0, 0), (1, -1, 0),
        (1, 0, -1)],
}
# the TPGRON typical-prediction pseudo-contexts (6.3.5.6)
_SLTP_REFINE_CTX = {0: 0x0100, 1: 0x0080}


def _refine_region(
    coder,
    bits: np.ndarray | None,
    ref: np.ndarray,
    h: int,
    w: int,
    template: int,
    tpgron: bool,
    refdx: int = 0,
    refdy: int = 0,
) -> np.ndarray:
    """The 6.3 generic refinement procedure, one body for both
    directions: with `bits` it ENCODES into `coder` (an _MQEncoder),
    else it DECODES. `refdx`/`refdy` are GRREFERENCEDX/DY — the
    reference displacement refined-symbol coding uses (0 for region
    segments): reference pixel (x - refdx + dx, y - refdy + dy) feeds
    the context. With TPGRON, rows under an active LTP flag take the
    reference value wherever the 3x3 reference neighborhood is
    uniform (those pixels are never coded; they still feed the
    one-bit current-row register)."""
    if template not in _REFINE_TEMPLATES:
        raise ValueError(f"JBIG2 refinement template {template} is illegal")
    encode = bits is not None
    pix = _REFINE_TEMPLATES[template]

    def ref_vec(yy: int, dx: int) -> np.ndarray:
        yy -= refdy
        dx -= refdx
        out = np.zeros(w, dtype=np.int64)
        if 0 <= yy < ref.shape[0]:
            row = ref[yy]
            lo, hi = max(0, -dx), min(w, len(row) - dx)
            if hi > lo:
                out[lo:hi] = row[lo + dx : hi + dx]
        return out

    rows: list = []
    ltp = 0
    for y in range(h):
        cur_rows = bits if encode else rows
        above = np.zeros(w, dtype=np.int64)
        for k, (src, dx, dy) in enumerate(pix):
            if k == 0:
                continue  # the current row's x-1 pixel: the register
            if src == 0:
                if y + dy >= 0:
                    above += _shifted(
                        np.asarray(cur_rows[y + dy], dtype=np.int64), dx, w
                    ) << k
            else:
                above += ref_vec(y + dy, dx) << k
        skip = None
        typ = None
        if tpgron:
            s9 = np.zeros(w, dtype=np.int64)
            for ddy in (-1, 0, 1):
                for ddx in (-1, 0, 1):
                    s9 += ref_vec(y + ddy, ddx)
            uni = (s9 == 0) | (s9 == 9)
            typ = ref_vec(y, 0).astype(np.uint8)
            if encode:
                can = bool((bits[y][uni] == typ[uni]).all())
                coder.encode(_SLTP_REFINE_CTX[template], can ^ ltp)
                ltp = int(can)
            else:
                ltp ^= coder.decode(_SLTP_REFINE_CTX[template])
            if ltp:
                skip = uni
        cur = bits[y] if encode else np.zeros(w, dtype=np.uint8)
        if not encode and skip is not None:
            cur[skip] = typ[skip]
        reg = 0
        if encode:
            enc = coder.encode
            for x in range(w):
                b = int(cur[x])
                if skip is None or not skip[x]:
                    enc(int(above[x]) | reg, b)
                reg = b
        else:
            dec = coder.decode
            for x in range(w):
                if skip is not None and skip[x]:
                    reg = int(cur[x])
                    continue
                b = dec(int(above[x]) | reg)
                cur[x] = b
                reg = b
        rows.append(cur)
    return bits if encode else (
        np.stack(rows) if rows else np.zeros((0, w), dtype=np.uint8)
    )


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


def _decode_pattern_dict(body: bytes) -> list:
    """7.4.4 pattern dictionary segment → [HDPW x HDPH patterns]: one
    collective generic-region bitmap of width (GRAYMAX+1) x HDPW,
    coded with the 6.7.5 AT layout (A1 = (-HDPW, 0)), split into the
    GRAYMAX+1 patterns."""
    if len(body) < 7:
        raise ValueError("JBIG2 pattern dictionary truncated")
    flags, hdpw, hdph = body[0], body[1], body[2]
    mmr = flags & 0x01
    template = (flags >> 1) & 0x03
    (graymax,) = struct.unpack(">I", body[3:7])
    if hdpw == 0 or hdph == 0 or graymax > 1 << 16:
        raise ValueError("implausible JBIG2 pattern dictionary geometry")
    if mmr:
        from .ccitt import ccitt_decode

        wide = ccitt_decode(
            body[7:], (int(graymax) + 1) * int(hdpw), int(hdph), k=-1
        )
    else:
        at = [(-int(hdpw), 0), (-3, -1), (2, -2), (-2, -2)][
            : 4 if template == 0 else 1
        ]
        ctxbits = len(_sorted_template(template, at))
        dec = _MQDecoder(body[7:], ctx=_fresh_jbig2_ctx(ctxbits))
        wide = _generic_region(
            dec, None, int(hdph), (int(graymax) + 1) * int(hdpw), template,
            at, False,
        )
    return [
        wide[:, k * hdpw : (k + 1) * hdpw].copy() for k in range(graymax + 1)
    ]


def _gray_planes(
    coder, values: np.ndarray | None, h: int, w: int, nbits: int,
    template: int, skip: np.ndarray | None = None,
) -> np.ndarray:
    """Annex C gray-scale image: `nbits` bitplanes coded most
    significant first through ONE shared generic context, gray-coded
    (each decoded plane XORs the plane above it). One body for both
    directions, like _generic_region."""
    at = _NOMINAL_AT[template]
    encode = values is not None
    if encode:
        planes = np.zeros((nbits, h, w), dtype=np.uint8)
        prev = np.zeros((h, w), dtype=np.uint8)
        for j in range(nbits - 1, -1, -1):
            bit = (values >> j) & 1
            planes[j] = bit.astype(np.uint8) ^ prev
            prev = bit.astype(np.uint8)
        for j in range(nbits - 1, -1, -1):
            _generic_region(
                coder, planes[j], h, w, template, at, False, skip
            )
        return values
    prev = np.zeros((h, w), dtype=np.uint8)
    out = np.zeros((h, w), dtype=np.int64)
    for j in range(nbits - 1, -1, -1):
        plane = _generic_region(coder, None, h, w, template, at, False, skip)
        bit = plane ^ prev
        out |= bit.astype(np.int64) << j
        prev = bit
    return out


def _decode_halftone_region(
    body: bytes, patterns: list
) -> tuple[np.ndarray, int, int, int]:
    """7.4.5 halftone region segment → (bitmap, x, y, combine op):
    a gray-scale image over the halftone grid, each cell stamping its
    pattern at the (possibly skewed) 8.8 fixed-point grid position."""
    if len(body) < 38:
        raise ValueError("JBIG2 halftone region data truncated")
    w, h, x, y, rflags = struct.unpack(">IIIIB", body[:17])
    if int(w) * int(h) > 1 << 28:
        raise ValueError(f"implausible JBIG2 region dimensions {w}x{h}")
    op = rflags & 0x07
    hflags = body[17]
    mmr = hflags & 0x01
    template = (hflags >> 1) & 0x03
    enable_skip = hflags & 0x08
    hcombop = (hflags >> 4) & 0x07
    defpix = (hflags >> 7) & 0x01
    hgw, hgh, hgx, hgy = struct.unpack(">IIii", body[18:34])
    hrx, hry = struct.unpack(">HH", body[34:38])
    if not patterns:
        raise ValueError("JBIG2 halftone region with no pattern dictionary")
    if int(hgw) * int(hgh) > 1 << 26:
        raise ValueError("implausible JBIG2 halftone grid")
    nbits = max((len(patterns) - 1).bit_length(), 1)
    hph_, hpw_ = patterns[0].shape
    skip = None
    if enable_skip and not mmr:
        # 6.6.5.1 HSKIP: grid cells whose pattern lands entirely
        # outside the region are never coded
        m_idx = np.arange(int(hgh))[:, None]
        n_idx = np.arange(int(hgw))[None, :]
        px_g = (hgx + m_idx * hry + n_idx * hrx) >> 8
        py_g = (hgy + m_idx * hrx - n_idx * hry) >> 8
        skip = (
            (px_g + hpw_ <= 0) | (px_g >= int(w))
            | (py_g + hph_ <= 0) | (py_g >= int(h))
        ).astype(np.uint8)
    if mmr:
        # C.5: ALL bitplanes through ONE continuous MMR stream (the
        # first row of each next plane references the previous
        # plane's last row), one EOFB at the end
        from .ccitt import ccitt_decode

        stacked = ccitt_decode(
            body[38:], int(hgw), int(hgh) * nbits, k=-1
        )
        prev = np.zeros((int(hgh), int(hgw)), dtype=np.uint8)
        gi = np.zeros((int(hgh), int(hgw)), dtype=np.int64)
        for k, j in enumerate(range(nbits - 1, -1, -1)):
            plane = stacked[k * int(hgh) : (k + 1) * int(hgh)]
            bit = plane ^ prev
            gi |= bit.astype(np.int64) << j
            prev = bit
    else:
        dec = _MQDecoder(
            body[38:],
            ctx=_fresh_jbig2_ctx(
                len(_sorted_template(template, _NOMINAL_AT[template]))
            ),
        )
        gi = _gray_planes(
            dec, None, int(hgh), int(hgw), nbits, template, skip
        )
    if int(gi.max(initial=0)) >= len(patterns):
        raise ValueError("JBIG2 halftone gray value exceeds the dictionary")
    hph, hpw = patterns[0].shape
    region = np.full((int(h), int(w)), defpix, dtype=np.uint8)
    if hcombop not in _COMBINE:
        raise ValueError(f"JBIG2 halftone combine op {hcombop} is illegal")
    comb = _COMBINE[hcombop]
    for m in range(int(hgh)):
        for n in range(int(hgw)):
            px = (hgx + m * hry + n * hrx) >> 8
            py = (hgy + m * hrx - n * hry) >> 8
            pat = patterns[int(gi[m, n])]
            x0, y0 = max(0, -px), max(0, -py)
            x1 = min(hpw, int(w) - px)
            y1 = min(hph, int(h) - py)
            if x1 <= x0 or y1 <= y0:
                continue
            win = region[py + y0 : py + y1, px + x0 : px + x1]
            region[py + y0 : py + y1, px + x0 : px + x1] = comb(
                win, pat[y0:y1, x0:x1]
            )
    return region, int(x), int(y), op


def encode_jbig2_halftone(
    grey: np.ndarray,
    hp: int = 4,
    levels: int | None = None,
    template: int = 0,
    file_header: bool = False,
    mmr: bool = False,
    skip: bool = False,
) -> bytes:
    """(H,W) uint8 greyscale → embedded JBIG2 stream in HALFTONE MODE
    (6.6: pattern dictionary + immediate lossless halftone region) —
    the dithered-photograph layout. Each hp x hp cell quantizes its
    mean DARKNESS to one of `levels` density patterns (a deterministic
    raster-fill ramp; default hp*hp+1 levels); the gray-scale image
    is coded as gray-coded bitplanes through one shared context
    (Annex C). Patterns are SQUARE because the 6.6.5.1 grid is a
    single rotation vector (HRX, HRY) — the pitch is the same on both
    axes. The decode twin reproduces the halftoned bitmap exactly —
    halftoning itself is lossy by construction, like any screening
    pass. `mmr=True` codes the pattern dictionary and the gray
    bitplanes through the T.6 coder (one continuous stream per C.5);
    `skip=True` shifts the grid one full pattern column left so the
    first grid column lands entirely outside the region and is
    HSKIP-coded (HENABLESKIP, arithmetic only)."""
    if mmr and skip:
        raise ValueError("skip bitmaps apply to arithmetic halftones only")
    if grey.ndim != 2 or grey.dtype != np.uint8:
        raise ValueError("encode_jbig2_halftone expects a (H,W) uint8 image")
    h, w = grey.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if not 1 <= hp <= 255:
        raise ValueError("pattern side must be 1..255")
    hpw = hph = hp
    if levels is None:
        levels = hpw * hph + 1
    if not 2 <= levels <= 256:
        raise ValueError("levels must be 2..256")
    # density ramp patterns: pattern k fills the first round(k/(L-1)
    # * hpw*hph) cells of a fixed raster order with ink
    area = hpw * hph
    pats = np.zeros((levels, hph, hpw), dtype=np.uint8)
    for k in range(levels):
        fill = int(round(k * area / (levels - 1)))
        pats[k].reshape(-1)[:fill] = 1
    # gray image: per-cell mean darkness quantized to a level
    hgw, hgh = -(-w // hpw), -(-h // hph)
    padded = np.zeros((hgh * hph, hgw * hpw), dtype=np.float64)
    padded[:h, :w] = 255.0 - grey
    cells = padded.reshape(hgh, hph, hgw, hpw).mean(axis=(1, 3))
    # edge cells average their covered part only
    cover = np.zeros((hgh * hph, hgw * hpw), dtype=np.float64)
    cover[:h, :w] = 1.0
    frac = cover.reshape(hgh, hph, hgw, hpw).mean(axis=(1, 3))
    cells = np.where(frac > 0, cells / np.maximum(frac, 1e-9), 0.0)
    gi = np.clip(
        np.round(cells / 255.0 * (levels - 1)), 0, levels - 1
    ).astype(np.int64)

    hgx = 0
    skip_arr = None
    if skip:
        # prepend one entirely-out-of-region grid column
        hgw += 1
        hgx = -(hpw << 8)
        gi = np.concatenate(
            [np.zeros((hgh, 1), dtype=np.int64), gi], axis=1
        )
        skip_arr = np.zeros((hgh, hgw), dtype=np.uint8)
        skip_arr[:, 0] = 1
    # pattern dictionary segment (7.4.4): one collective bitmap
    wide = np.concatenate(list(pats), axis=1)
    if mmr:
        from .ccitt import ccitt_encode_g4

        dict_payload = ccitt_encode_g4(wide)
    else:
        at = [(-hpw, 0), (-3, -1), (2, -2), (-2, -2)][
            : 4 if template == 0 else 1
        ]
        enc = _MQEncoder(
            ctx=_fresh_jbig2_ctx(len(_sorted_template(template, at)))
        )
        _generic_region(enc, wide, hph, levels * hpw, template, at, False)
        dict_payload = enc.flush()
    dict_body = (
        bytes([(1 if mmr else 0) | template << 1, hpw, hph])
        + struct.pack(">I", levels - 1)
        + dict_payload
    )
    # halftone region segment (7.4.5): axis-aligned grid
    nbits = max((levels - 1).bit_length(), 1)
    if mmr:
        from .ccitt import ccitt_encode_g4

        planes = np.zeros((nbits, hgh, hgw), dtype=np.uint8)
        prev = np.zeros((hgh, hgw), dtype=np.uint8)
        for j in range(nbits - 1, -1, -1):
            bit = ((gi >> j) & 1).astype(np.uint8)
            planes[j] = bit ^ prev
            prev = bit
        stacked = np.concatenate(
            [planes[j] for j in range(nbits - 1, -1, -1)], axis=0
        )
        gray_payload = ccitt_encode_g4(stacked)
    else:
        enc = _MQEncoder(
            ctx=_fresh_jbig2_ctx(
                len(_sorted_template(template, _NOMINAL_AT[template]))
            )
        )
        _gray_planes(enc, gi, hgh, hgw, nbits, template, skip_arr)
        gray_payload = enc.flush()
    region_body = (
        struct.pack(">IIIIB", w, h, 0, 0, 0)
        + bytes([(1 if mmr else 0) | template << 1 | (8 if skip else 0)])
        + struct.pack(">IIii", hgw, hgh, hgx, 0)
        + struct.pack(">HH", hpw << 8, 0)
        + gray_payload
    )
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    out = _seg_header(1, 48, 1, len(page_info)) + page_info
    out += _seg_header(2, 16, 1, len(dict_body)) + dict_body
    out += _seg_header(3, 23, 1, len(region_body), referred=[2]) + region_body
    out += _seg_header(4, 49, 1, 0)
    if file_header:
        out = JBIG2_MAGIC + bytes([0x01]) + struct.pack(">I", 1) + out
    return out


def encode_jbig2_refinement(
    bits: np.ndarray,
    base: np.ndarray,
    template: int = 0,
    tpgron: bool = False,
    base_template: int = 0,
    file_header: bool = False,
) -> bytes:
    """(rows, cols) {0,1} target + same-shape coarse `base` → embedded
    JBIG2 stream in REFINEMENT MODE — the lossy-then-lossless layout
    scanners emit: the page first receives `base` as an immediate
    generic region, then an immediate lossless REFINEMENT region
    (6.3) codes `bits` against the page content and REPLACES it.
    `template` picks the 13-bit (0) or 10-bit (1) refinement context;
    `tpgron` enables typical prediction (uniform-reference pixels are
    never coded). Lossless end-to-end by construction."""
    if (
        bits.ndim != 2 or bits.dtype != np.uint8
        or int(bits.max(initial=0)) > 1
    ):
        raise ValueError(
            "encode_jbig2_refinement expects a (rows, cols) uint8 {0,1} matrix"
        )
    if base.shape != bits.shape or base.dtype != np.uint8:
        raise ValueError("base must be a same-shape uint8 {0,1} matrix")
    if template not in _REFINE_TEMPLATES:
        raise ValueError(f"refinement template must be 0 or 1, got {template}")
    h, w = bits.shape
    if h == 0 or w == 0:
        raise ValueError("empty bitmap")
    at = _NOMINAL_AT[base_template]
    enc = _MQEncoder(ctx=_fresh_jbig2_ctx(len(_sorted_template(base_template, at))))
    _generic_region(enc, base, h, w, base_template, at, False)
    base_region = (
        struct.pack(">IIIIB", w, h, 0, 0, 0)
        + bytes([base_template << 1])
        + b"".join(struct.pack(">bb", dx, dy) for dx, dy in at)
        + enc.flush()
    )
    enc = _MQEncoder(ctx=_fresh_jbig2_ctx(13 if template == 0 else 10))
    _refine_region(enc, bits, base, h, w, template, tpgron)
    refine_region = (
        struct.pack(">IIIIB", w, h, 0, 0, 4)  # REPLACE onto the page
        + bytes([template | (0x02 if tpgron else 0)])
        + (struct.pack(">bbbb", -1, -1, -1, -1) if template == 0 else b"")
        + enc.flush()
    )
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    out = _seg_header(1, 48, 1, len(page_info)) + page_info
    out += _seg_header(2, 39, 1, len(base_region)) + base_region
    out += _seg_header(3, 43, 1, len(refine_region)) + refine_region
    out += _seg_header(4, 49, 1, 0)
    if file_header:
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
    TPGDON, custom AT; or MMR), symbol-dictionary + text-region
    streams (the born-scanned layout), immediate refinement
    regions (the lossy-then-lossless two-pass layout), and pattern
    dictionaries + halftone regions (the dithered-photograph
    layout); huffman-tabled segments fail loudly. A standalone .jb2
    file header (Annex D) is
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
    sym_exports: dict[int, list] = {}
    pat_exports: dict[int, list] = {}
    table_exports: dict[int, "_HuffTable"] = {}
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
        elif t == 0:  # symbol dictionary
            inputs = []
            tabs = []
            for rn in seg["referred"]:
                inputs.extend(sym_exports.get(rn, []))
                if rn in table_exports:
                    tabs.append(table_exports[rn])
            sym_exports[seg["number"]] = _decode_symbol_dict(
                body, inputs, tabs
            )
        elif t in (6, 7):  # immediate (lossless) text region
            if page is None:
                raise ValueError("JBIG2 region before page information")
            syms = []
            tabs = []
            for rn in seg["referred"]:
                syms.extend(sym_exports.get(rn, []))
                if rn in table_exports:
                    tabs.append(table_exports[rn])
            bm, x, y, op = _decode_text_region(body, syms, tabs)
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
        elif t in (4, 36):
            raise NotImplementedError(
                "JBIG2 intermediate regions not supported"
            )
        elif t == 16:  # pattern dictionary
            pat_exports[seg["number"]] = _decode_pattern_dict(body)
        elif t == 20:
            raise NotImplementedError(
                "JBIG2 intermediate halftone regions not supported"
            )
        elif t in (22, 23):  # immediate (lossless) halftone region
            if page is None:
                raise ValueError("JBIG2 region before page information")
            patterns: list = []
            for rn in seg["referred"]:
                patterns.extend(pat_exports.get(rn, []))
            bm, x, y, op = _decode_halftone_region(body, patterns)
            bh, bw = bm.shape
            if y + bh > page.shape[0] or x + bw > page.shape[1]:
                raise ValueError("JBIG2 halftone region exceeds the page")
            window = page[y : y + bh, x : x + bw]
            page[y : y + bh, x : x + bw] = _COMBINE[op](window, bm)
            regions += 1
        elif t == 40:
            raise NotImplementedError(
                "JBIG2 intermediate refinement regions not supported"
            )
        elif t in (42, 43):  # immediate refinement region (7.4.7)
            if page is None:
                raise ValueError("JBIG2 region before page information")
            if len(body) < 18:
                raise ValueError("JBIG2 refinement region data truncated")
            w, h, x, y, rflags = struct.unpack(">IIIIB", body[:17])
            if int(w) * int(h) > 1 << 28:
                raise ValueError(
                    f"implausible JBIG2 region dimensions {w}x{h}"
                )
            op = rflags & 0x07
            rfl = body[17]
            template = rfl & 0x01
            tpgron = bool(rfl & 0x02)
            bpos = 18
            if template == 0:
                if bpos + 4 > len(body):
                    raise ValueError("JBIG2 refinement AT pixels truncated")
                grat = [
                    struct.unpack(">bb", body[bpos + 2 * k : bpos + 2 * k + 2])
                    for k in range(2)
                ]
                bpos += 4
                if grat != [(-1, -1), (-1, -1)]:
                    raise NotImplementedError(
                        "JBIG2 refinement with custom GRAT pixels "
                        "not supported (nominal (-1,-1) only)"
                    )
            if y + int(h) > page.shape[0] or x + int(w) > page.shape[1]:
                raise ValueError("JBIG2 refinement region exceeds the page")
            # with no referred intermediate region, the reference is
            # the page's current content under the region (6.3.2)
            reference = page[y : y + int(h), x : x + int(w)].copy()
            dec = _MQDecoder(
                body[bpos:], ctx=_fresh_jbig2_ctx(13 if template == 0 else 10)
            )
            bm = _refine_region(
                dec, None, reference, int(h), int(w), template, tpgron
            )
            if op not in _COMBINE:
                raise ValueError(
                    f"JBIG2 region combination operator {op} is illegal"
                )
            window = page[y : y + int(h), x : x + int(w)]
            page[y : y + int(h), x : x + int(w)] = _COMBINE[op](window, bm)
            regions += 1
        elif t == 53:  # custom code table (Annex B.2.4)
            table_exports[seg["number"]] = _parse_table_segment(body)
        elif t in (49, 50, 51, 52, 62):
            continue  # end-of-page/stripe/file, profiles, extension
        else:
            raise ValueError(f"JBIG2 segment type {t} is illegal")
    if page is None or not regions:
        raise ValueError("JBIG2 stream carries no decodable page region")
    return page


# ---------------------------------------------------------------------------
# arithmetic integer / symbol-ID decoding (Annex A) — the entropy layer
# symbol dictionaries and text regions share one MQ decoder with
# per-procedure context spaces, swapped onto the coder per decision
# ---------------------------------------------------------------------------


class _CtxSet:
    __slots__ = ("idx", "mps")

    def __init__(self, nbits: int):
        self.idx = [0] * (1 << nbits)
        self.mps = [0] * (1 << nbits)

    def bind(self, coder) -> None:
        coder.ctx_idx, coder.ctx_mps = self.idx, self.mps


def _int_arith(coder, ctx: _CtxSet, value: int | None, encode: bool):
    """A.2 arithmetic integer procedure, one body for both directions:
    encode `value` (None = OOB) into `coder`, or decode and return the
    value (None on OOB). The 512-state PREV tracking and the 2/4/6/8/
    12/32-bit ladder per Table A.1."""
    ctx.bind(coder)
    prev = 1

    def bit(b: int | None = None) -> int:
        nonlocal prev
        if encode:
            coder.encode(prev, b)
        else:
            b = coder.decode(prev)
        prev = ((prev << 1) | b) if prev < 256 else ((((prev << 1) | b) & 511) | 256)
        return b

    ladder = ((2, 0), (4, 4), (6, 20), (8, 84), (12, 340), (32, 4436))
    if encode:
        if value is None:  # OOB: negative zero
            s, v = 1, 0
        else:
            s, v = (1, -value) if value < 0 else (0, value)
        bit(s)
        for k, (nbits, lo) in enumerate(ladder):
            hi = lo + (1 << nbits) - 1
            last = k == len(ladder) - 1
            if v <= hi or last:
                for _ in range(k):
                    pass  # selector bits emitted below
                break
        # selector: k ones then (a zero unless the 32-bit bucket)
        for _ in range(k):
            bit(1)
        if k < len(ladder) - 1:
            bit(0)
        nbits, lo = ladder[k]
        rem = v - lo
        if rem < 0 or rem >= (1 << nbits):
            raise ValueError(f"arithmetic integer {value} out of range")
        for sh in range(nbits - 1, -1, -1):
            bit((rem >> sh) & 1)
        return value
    s = bit()
    k = 0
    while k < len(ladder) - 1 and bit():
        k += 1
    nbits, lo = ladder[k]
    v = 0
    for _ in range(nbits):
        v = (v << 1) | bit()
    v += lo
    if s and v == 0:
        return None  # OOB
    return -v if s else v


def _iaid_arith(coder, ctx: _CtxSet, codelen: int, value: int | None, encode: bool):
    """A.3 symbol-ID procedure: `codelen` tree-coded bits."""
    ctx.bind(coder)
    prev = 1
    if encode:
        code = value + (1 << codelen)
        for sh in range(codelen - 1, -1, -1):
            b = (code >> sh) & 1
            coder.encode(prev, b)
            prev = (prev << 1) | b
        return value
    for _ in range(codelen):
        prev = (prev << 1) | coder.decode(prev)
    return prev - (1 << codelen)


def _generic_with_ctx(coder, gbctx: _CtxSet, bits, h, w, template, at):
    """Run the generic procedure with an explicit GB context space
    (symbol bitmaps share contexts across a whole dictionary)."""
    gbctx.bind(coder)
    return _generic_region(coder, bits, h, w, template, at, False)


# ---------------------------------------------------------------------------
# symbol dictionary (6.5 / 7.4.3) + text region (6.4 / 7.4.4)
# ---------------------------------------------------------------------------


def _connected_components(bits: np.ndarray) -> list:
    """8-connected black components → [(top, left, bitmap)] in raster
    order of their top-left corners (plain BFS; pages are small and the
    encoder is a fixture/test twin, not the hot path)."""
    h, w = bits.shape
    seen = np.zeros_like(bits)
    comps = []
    for y0 in range(h):
        row = bits[y0]
        for x0 in range(w):
            if not row[x0] or seen[y0, x0]:
                continue
            stack = [(y0, x0)]
            seen[y0, x0] = 1
            pix = []
            while stack:
                y, x = stack.pop()
                pix.append((y, x))
                for dy in (-1, 0, 1):
                    yy = y + dy
                    if not 0 <= yy < h:
                        continue
                    for dx in (-1, 0, 1):
                        xx = x + dx
                        if 0 <= xx < w and bits[yy, xx] and not seen[yy, xx]:
                            seen[yy, xx] = 1
                            stack.append((yy, xx))
            ys = [p[0] for p in pix]
            xs = [p[1] for p in pix]
            t, b_, l, r = min(ys), max(ys), min(xs), max(xs)
            bm = np.zeros((b_ - t + 1, r - l + 1), dtype=np.uint8)
            for y, x in pix:
                bm[y - t, x - l] = 1
            comps.append((t, l, bm))
    comps.sort(key=lambda c: (c[0], c[1]))
    return comps


def encode_jbig2_symbols(
    bits: np.ndarray,
    template: int = 0,
    file_header: bool = False,
    refcorner: str = "tl",
    strips: int = 1,
    transposed: bool = False,
) -> bytes:
    """(rows, columns) {0,1} bit matrix → embedded JBIG2 stream in
    SYMBOL MODE — the layout born-scanned PDFs actually carry
    (jbig2enc's default): the page's 8-connected components are
    deduplicated into a SYMBOL DICTIONARY (6.5: height classes, IADH/
    IADW deltas, generic-coded symbol bitmaps with shared contexts,
    IAEX export runs) and placed by an immediate TEXT REGION (6.4:
    one-row strips, IADT/IAFS/IADS deltas, IAID tree-coded symbol
    IDs). `refcorner` picks the reference corner ('tl'/'bl'/'tr'/
    'br' — bottom corners strip-group by the glyph BASELINE, the
    typographic layout); `strips` (1/2/4/8) emits multi-row strips
    with per-instance IAIT offsets; `transposed=True` writes a
    TRANSPOSED region (6.4.5 3c: S runs down the page, strips are
    COLUMN bands — the vertical-text layout). Falls back to a generic-region
    stream when the page has no black pixels. Lossless: the
    components partition the ink exactly."""
    if bits.ndim != 2 or bits.dtype != np.uint8 or int(bits.max(initial=0)) > 1:
        raise ValueError("encode_jbig2_symbols expects a (rows, cols) uint8 {0,1} matrix")
    h, w = bits.shape
    if h == 0 or w == 0:
        raise ValueError("empty bitmap")
    comps = _connected_components(bits)
    if not comps:
        return encode_jbig2(bits, template=template, file_header=file_header)
    at = _NOMINAL_AT[template]

    # ---- dictionary: unique symbol bitmaps, height-class order
    uniq: dict[bytes, int] = {}
    symbols = []
    for _, _, bm in comps:
        key = bm.shape + (bm.tobytes(),)
        if key not in uniq:
            uniq[key] = len(symbols)
            symbols.append(bm)
    order = sorted(range(len(symbols)), key=lambda i: symbols[i].shape)
    symbols = [symbols[i] for i in order]
    remap = {old: new for new, old in enumerate(order)}
    uniq = {k: remap[v] for k, v in uniq.items()}

    enc = _MQEncoder(ctx=([0], [0]))  # ctx spaces bound per decision
    iadh, iadw, iaex = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    gb = _CtxSet(len(_sorted_template(template, at)))
    hcheight = 0
    i = 0
    while i < len(symbols):
        hh = symbols[i].shape[0]
        _int_arith(enc, iadh, hh - hcheight, True)
        hcheight = hh
        symwidth = 0
        while i < len(symbols) and symbols[i].shape[0] == hcheight:
            ww = symbols[i].shape[1]
            _int_arith(enc, iadw, ww - symwidth, True)
            symwidth = ww
            _generic_with_ctx(enc, gb, symbols[i], hcheight, ww, template, at)
            i += 1
        _int_arith(enc, iadw, None, True)  # OOB ends the height class
    # export all symbols: run of 0 unexported, then all exported
    _int_arith(enc, iaex, 0, True)
    _int_arith(enc, iaex, len(symbols), True)
    dict_payload = enc.flush()
    sdflags = template << 10
    dict_data = (
        struct.pack(">H", sdflags)
        + b"".join(struct.pack(">bb", dx, dy) for dx, dy in at)
        + struct.pack(">II", len(symbols), len(symbols))
        + dict_payload
    )

    # ---- text region: one instance per component
    corners = {"bl": 0, "tl": 1, "br": 2, "tr": 3}
    if refcorner not in corners:
        raise ValueError(f"refcorner must be one of {sorted(corners)}")
    if strips not in (1, 2, 4, 8):
        raise ValueError(f"strips must be 1/2/4/8, got {strips}")
    codelen = max((len(symbols) - 1).bit_length(), 0)
    enc = _MQEncoder(ctx=([0], [0]))
    iadt, iafs, iads, iait = (_CtxSet(9) for _ in range(4))
    iaid = _CtxSet(codelen + 1)
    _int_arith(enc, iadt, 0, True)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    bottom = refcorner in ("bl", "br")
    right = refcorner in ("tr", "br")
    by_strip: dict[int, list] = {}
    for t, l, bm in comps:
        if transposed:
            # strips are COLUMN bands; the coded T is the reference
            # corner's column, the coded S the instance's TOP row
            ti = l + bm.shape[1] - 1 if right else l
            si, adv = t, bm.shape[0] - 1
        else:
            # the coded T is the reference corner's row
            ti = t + bm.shape[0] - 1 if bottom else t
            si, adv = l, bm.shape[1] - 1
        base = (ti // strips) * strips
        by_strip.setdefault(base, []).append((si, ti - base, adv, bm))
    for base in sorted(by_strip):
        _int_arith(enc, iadt, (base - stript) // strips, True)
        stript = base
        curs = None
        for si, curt, adv, bm in sorted(by_strip[base], key=lambda e: (e[0], e[1])):
            if curs is None:
                _int_arith(enc, iafs, si - firsts, True)
                firsts = si
                curs = si
            else:
                _int_arith(enc, iads, si - curs, True)
                curs = si
            if strips > 1:
                _int_arith(enc, iait, curt, True)
            _iaid_arith(enc, iaid, codelen, uniq[bm.shape + (bm.tobytes(),)], True)
            curs += adv
        _int_arith(enc, iads, None, True)  # OOB ends the strip
    text_payload = enc.flush()
    # SBHUFF=0, LOGSBSTRIPS, REFCORNER, TRANSPOSED
    tflags = (
        (strips.bit_length() - 1) << 2
        | corners[refcorner] << 4
        | (0x40 if transposed else 0)
    )
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)
    text_data = (
        region_info
        + struct.pack(">H", tflags)
        + struct.pack(">I", len(comps))
        + text_payload
    )

    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    out = _seg_header(1, 48, 1, len(page_info)) + page_info
    out += _seg_header(2, 0, 1, len(dict_data)) + dict_data
    out += _seg_header(3, 6, 1, len(text_data), referred=[2]) + text_data
    out += _seg_header(4, 49, 1, 0)
    if file_header:
        out = JBIG2_MAGIC + bytes([0x01]) + struct.pack(">I", 1) + out
    return out


def encode_jbig2_symbols_huffman(
    bits: np.ndarray,
    collective: str = "raw",
    refcorner: str = "tl",
    strips: int = 1,
    transposed: bool = False,
    custom_bmsize: bool = False,
    file_header: bool = False,
) -> bytes:
    """(rows, columns) {0,1} bit matrix → embedded JBIG2 stream in
    HUFFMAN symbol mode (SDHUFF=1/SBHUFF=1) — the fax-profile entropy
    layer: the symbol dictionary codes height/width deltas through
    standard tables B.4/B.2 and carries each height class as a
    COLLECTIVE bitmap (`collective`='raw' → BMSIZE 0 uncompressed
    rows; 'mmr' → T.6-coded), BMSIZE through Table B.1 (or a referred
    custom type-53 table when `custom_bmsize`); the text region
    selects custom type-53 FS/DS/DT tables and assigns symbol ID
    codes through the 7.4.3.1.7 runcode mechanism (runcode 32
    repeats exercised). Decoder twin: _huffman_symbol_dict /
    _decode_text_region(SBHUFF=1). Lossless."""
    if bits.ndim != 2 or bits.dtype != np.uint8 or int(bits.max(initial=0)) > 1:
        raise ValueError(
            "encode_jbig2_symbols_huffman expects a (rows, cols) uint8 {0,1} matrix"
        )
    if collective not in ("raw", "mmr"):
        raise ValueError(f"collective must be 'raw' or 'mmr', got {collective!r}")
    h, w = bits.shape
    if h == 0 or w == 0:
        raise ValueError("empty bitmap")
    comps = _connected_components(bits)
    if not comps:
        return encode_jbig2(bits)

    # ---- dictionary: unique symbols in height-class order
    uniq: dict[tuple, int] = {}
    symbols = []
    for _, _, bm in comps:
        key = bm.shape + (bm.tobytes(),)
        if key not in uniq:
            uniq[key] = len(symbols)
            symbols.append(bm)
    order = sorted(range(len(symbols)), key=lambda i: symbols[i].shape)
    symbols = [symbols[i] for i in order]
    remap = {old: new for new, old in enumerate(order)}
    uniq = {k: remap[v] for k, v in uniq.items()}

    bw = _HuffWriter()
    t_dh, t_dw, t_b1 = _STD_TABLES[4], _STD_TABLES[2], _STD_TABLES[1]
    if custom_bmsize:
        # a wide-range single-line custom table: values 0..2^16-1
        # direct, beyond via the upper line
        bm_body, t_bm = _encode_table_segment(
            [(1, 16, 0)], lower_pl=2, upper_pl=2, oob_pl=None
        )
    else:
        t_bm = t_b1
    hcheight = 0
    i = 0
    while i < len(symbols):
        hh = symbols[i].shape[0]
        t_dh.encode(bw, hh - hcheight)
        hcheight = hh
        cls = []
        symwidth = 0
        while i < len(symbols) and symbols[i].shape[0] == hcheight:
            ww = symbols[i].shape[1]
            t_dw.encode(bw, ww - symwidth)
            symwidth = ww
            cls.append(symbols[i])
            i += 1
        t_dw.encode(bw, None)  # OOB ends the height class
        coll = np.concatenate(cls, axis=1)
        if collective == "raw":
            t_bm.encode(bw, 0)
            bw.align()
            bw.out += np.packbits(coll, axis=1).tobytes()
        else:
            from .ccitt import ccitt_encode_g4

            mmr = ccitt_encode_g4(coll)
            t_bm.encode(bw, len(mmr))
            bw.align()
            bw.out += mmr
    t_b1.encode(bw, 0)  # export runs: none unexported, then all
    t_b1.encode(bw, len(symbols))
    bw.align()
    sdflags = 0x01 | (0x40 if custom_bmsize else 0)  # SDHUFF; B.4/B.2 std
    dict_data = (
        struct.pack(">H", sdflags)
        + struct.pack(">II", len(symbols), len(symbols))
        + bw.getvalue()
    )

    # ---- custom FS/DS/DT tables (complete canonical codes)
    fs_body, t_fs = _encode_table_segment(
        [(2, 6, -64), (1, 6, 0), (3, 8, 64), (4, 10, 320)],
        lower_pl=5, upper_pl=5, oob_pl=None,
    )
    ds_body, t_ds = _encode_table_segment(
        [(2, 4, -16), (1, 4, 0), (3, 6, 16), (4, 8, 80)],
        lower_pl=5, upper_pl=6, oob_pl=6,
    )
    dt_body, t_dt = _encode_table_segment(
        [(1, 2, 0), (2, 4, 4), (3, 6, 20)],
        lower_pl=4, upper_pl=4, oob_pl=None,
    )

    # ---- text region
    corners = {"bl": 0, "tl": 1, "br": 2, "tr": 3}
    if refcorner not in corners:
        raise ValueError(f"refcorner must be one of {sorted(corners)}")
    if strips not in (1, 2, 4, 8):
        raise ValueError(f"strips must be 1/2/4/8, got {strips}")
    nsyms = len(symbols)
    idlen = max((nsyms - 1).bit_length(), 1)
    bw = _HuffWriter()
    # symbol ID code table (7.4.3.1.7): every symbol gets code length
    # idlen; the runcode table codes {idlen, 32} in 1 bit each
    runlens = [0] * 35
    runlens[idlen] = 1
    runlens[32] = 1
    for rl in runlens:
        bw.write(rl, 5)
    runtab = _HuffTable([(pl, 0, v, 1) for v, pl in enumerate(runlens)])
    runtab.encode(bw, idlen)
    remaining = nsyms - 1
    while remaining >= 3:
        rep = min(6, remaining)
        runtab.encode(bw, 32)
        bw.write(rep - 3, 2)
        remaining -= rep
    for _ in range(remaining):
        runtab.encode(bw, idlen)
    bw.align()
    symid = _HuffTable([(idlen, 0, v, 1) for v in range(nsyms)])

    logsb = strips.bit_length() - 1
    bottom = refcorner in ("bl", "br")
    right = refcorner in ("tr", "br")
    by_strip: dict[int, list] = {}
    for t, l, bm in comps:
        if transposed:
            ti = l + bm.shape[1] - 1 if right else l
            si, adv = t, bm.shape[0] - 1
        else:
            ti = t + bm.shape[0] - 1 if bottom else t
            si, adv = l, bm.shape[1] - 1
        base = (ti // strips) * strips
        by_strip.setdefault(base, []).append((si, ti - base, adv, bm))
    t_dt.encode(bw, 0)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    for base in sorted(by_strip):
        t_dt.encode(bw, (base - stript) // strips)
        stript = base
        curs = None
        for si, curt, adv, bm in sorted(
            by_strip[base], key=lambda e: (e[0], e[1])
        ):
            if curs is None:
                t_fs.encode(bw, si - firsts)
                firsts = si
                curs = si
            else:
                t_ds.encode(bw, si - curs)
                curs = si
            if strips > 1:
                bw.write(curt, logsb)
            symid.encode(bw, uniq[bm.shape + (bm.tobytes(),)])
            curs += adv
        t_ds.encode(bw, None)  # OOB ends the strip
    bw.align()
    tflags = (
        0x01  # SBHUFF
        | logsb << 2
        | corners[refcorner] << 4
        | (0x40 if transposed else 0)
    )
    hflags = 0x03 | 0x03 << 2 | 0x03 << 4  # custom FS/DS/DT
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)
    text_data = (
        region_info
        + struct.pack(">H", tflags)
        + struct.pack(">H", hflags)
        + struct.pack(">I", len(comps))
        + bw.getvalue()
    )

    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    out = _seg_header(1, 48, 1, len(page_info)) + page_info
    nxt = 2
    dict_ref = []
    if custom_bmsize:
        out += _seg_header(nxt, 53, 1, len(bm_body)) + bm_body
        dict_ref = [nxt]
        nxt += 1
    fs_n, ds_n, dt_n = nxt, nxt + 1, nxt + 2
    out += _seg_header(fs_n, 53, 1, len(fs_body)) + fs_body
    out += _seg_header(ds_n, 53, 1, len(ds_body)) + ds_body
    out += _seg_header(dt_n, 53, 1, len(dt_body)) + dt_body
    dict_n = nxt + 3
    out += _seg_header(dict_n, 0, 1, len(dict_data), referred=dict_ref) + dict_data
    out += _seg_header(
        dict_n + 1, 6, 1, len(text_data),
        referred=[dict_n, fs_n, ds_n, dt_n],
    ) + text_data
    out += _seg_header(dict_n + 2, 49, 1, 0)
    if file_header:
        out = JBIG2_MAGIC + bytes([0x01]) + struct.pack(">I", 1) + out
    return out


def encode_jbig2_text_refined(
    bits: np.ndarray,
    template: int = 0,
    rtemplate: int = 0,
    file_header: bool = False,
) -> bytes:
    """(rows, columns) {0,1} bit matrix → embedded JBIG2 stream with a
    REFINED TEXT REGION (6.4.11, SBREFINE=1): the dictionary keeps ONE
    exemplar per height class and every instance whose shape differs
    is coded as a per-instance refinement of that exemplar (IARI flag,
    IARDW/IARDH size deltas — nonzero when widths differ — IARDX/
    IARDY, generic refinement against the symbol bitmap). The layout
    scanners emit when glyph impressions vary around a shared shape.
    Decoder twin: _decode_text_region's dec_refine path. Lossless."""
    if bits.ndim != 2 or bits.dtype != np.uint8 or int(bits.max(initial=0)) > 1:
        raise ValueError(
            "encode_jbig2_text_refined expects a (rows, cols) uint8 {0,1} matrix"
        )
    h, w = bits.shape
    if h == 0 or w == 0:
        raise ValueError("empty bitmap")
    comps = _connected_components(bits)
    if not comps:
        return encode_jbig2(bits, template=template, file_header=file_header)
    at = _NOMINAL_AT[template]

    # ---- dictionary: one exemplar per component HEIGHT
    exemplar: dict[int, int] = {}
    symbols: list = []
    for _, _, bm in comps:
        hh = bm.shape[0]
        if hh not in exemplar:
            exemplar[hh] = len(symbols)
            symbols.append(bm)
    order = sorted(range(len(symbols)), key=lambda i: symbols[i].shape)
    symbols = [symbols[i] for i in order]
    remap = {old: new for new, old in enumerate(order)}
    exemplar = {k: remap[v] for k, v in exemplar.items()}

    enc = _MQEncoder(ctx=([0], [0]))
    iadh, iadw, iaex = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    gb = _CtxSet(len(_sorted_template(template, at)))
    hcheight = 0
    i = 0
    while i < len(symbols):
        hh = symbols[i].shape[0]
        _int_arith(enc, iadh, hh - hcheight, True)
        hcheight = hh
        symwidth = 0
        while i < len(symbols) and symbols[i].shape[0] == hcheight:
            ww = symbols[i].shape[1]
            _int_arith(enc, iadw, ww - symwidth, True)
            symwidth = ww
            _generic_with_ctx(enc, gb, symbols[i], hcheight, ww, template, at)
            i += 1
        _int_arith(enc, iadw, None, True)
    _int_arith(enc, iaex, 0, True)
    _int_arith(enc, iaex, len(symbols), True)
    dict_data = (
        struct.pack(">H", template << 10)
        + b"".join(struct.pack(">bb", dx, dy) for dx, dy in at)
        + struct.pack(">II", len(symbols), len(symbols))
        + enc.flush()
    )

    # ---- refined text region (one-row strips, TL corner)
    codelen = max((len(symbols) - 1).bit_length(), 0)
    enc = _MQEncoder(ctx=([0], [0]))
    iadt, iafs, iads = (_CtxSet(9) for _ in range(3))
    iaid = _CtxSet(codelen + 1)
    iari, iardw, iardh = (_CtxSet(9) for _ in range(3))
    iardx, iardy = _CtxSet(9), _CtxSet(9)
    gr = _CtxSet(13 if rtemplate == 0 else 10)
    _int_arith(enc, iadt, 0, True)
    stript = 0
    firsts = 0
    by_strip: dict[int, list] = {}
    for t, l, bm in comps:
        by_strip.setdefault(t, []).append((l, bm))
    for base in sorted(by_strip):
        _int_arith(enc, iadt, base - stript, True)
        stript = base
        curs = None
        for si, bm in sorted(by_strip[base], key=lambda e: e[0]):
            if curs is None:
                _int_arith(enc, iafs, si - firsts, True)
                firsts = si
                curs = si
            else:
                _int_arith(enc, iads, si - curs, True)
                curs = si
            sid = exemplar[bm.shape[0]]
            ex = symbols[sid]
            _iaid_arith(enc, iaid, codelen, sid, True)
            if bm.shape == ex.shape and bm.tobytes() == ex.tobytes():
                _int_arith(enc, iari, 0, True)
            else:
                rdw = bm.shape[1] - ex.shape[1]
                _int_arith(enc, iari, 1, True)
                _int_arith(enc, iardw, rdw, True)
                _int_arith(enc, iardh, 0, True)
                _int_arith(enc, iardx, 0, True)
                _int_arith(enc, iardy, 0, True)
                gr.bind(enc)
                _refine_region(
                    enc, bm, ex, bm.shape[0], bm.shape[1],
                    rtemplate, False, rdw >> 1, 0,
                )
            curs += bm.shape[1] - 1
        _int_arith(enc, iads, None, True)
    text_payload = enc.flush()
    tflags = 0x02 | (1 << 4) | (rtemplate << 15)  # SBREFINE, TL corner
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)
    text_data = (
        region_info
        + struct.pack(">H", tflags)
        + (
            struct.pack(">bbbb", -1, -1, -1, -1) if rtemplate == 0 else b""
        )
        + struct.pack(">I", len(comps))
        + text_payload
    )

    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    out = _seg_header(1, 48, 1, len(page_info)) + page_info
    out += _seg_header(2, 0, 1, len(dict_data)) + dict_data
    out += _seg_header(3, 6, 1, len(text_data), referred=[2]) + text_data
    out += _seg_header(4, 49, 1, 0)
    if file_header:
        out = JBIG2_MAGIC + bytes([0x01]) + struct.pack(">I", 1) + out
    return out


def encode_jbig2_symbols_refined(
    bits: np.ndarray,
    template: int = 0,
    rtemplate: int = 0,
    file_header: bool = False,
) -> bytes:
    """(rows, columns) {0,1} bit matrix → embedded JBIG2 stream in
    REFINED SYMBOL MODE (6.5.8.2): dictionary A carries one generic-
    coded EXEMPLAR per glyph shape class, dictionary B (SDREFAGG=1,
    referring A) codes every other unique glyph as a single-instance
    REFINEMENT of its shape-class exemplar, and a text region places
    instances from both — the layout refinement-capable encoders emit
    to share coding work across similar glyphs. Lossless: refinement
    coding is exact."""
    if bits.ndim != 2 or bits.dtype != np.uint8 or int(bits.max(initial=0)) > 1:
        raise ValueError(
            "encode_jbig2_symbols_refined expects a (rows, cols) uint8 {0,1} matrix"
        )
    h, w = bits.shape
    if h == 0 or w == 0:
        raise ValueError("empty bitmap")
    if rtemplate not in (0, 1):
        raise ValueError(f"rtemplate must be 0 or 1, got {rtemplate}")
    comps = _connected_components(bits)
    if not comps:
        return encode_jbig2(bits, template=template, file_header=file_header)
    at = _NOMINAL_AT[template]

    uniq: dict[tuple, int] = {}
    symbols = []
    for _, _, bm in comps:
        key = bm.shape + (bm.tobytes(),)
        if key not in uniq:
            uniq[key] = len(symbols)
            symbols.append(bm)
    order = sorted(range(len(symbols)), key=lambda i: symbols[i].shape)
    symbols = [symbols[i] for i in order]
    remap = {old: new for new, old in enumerate(order)}
    uniq = {k: remap[v] for k, v in uniq.items()}

    # exemplar per shape class → A; repeated-shape glyphs → B
    a_idx: list[int] = []
    b_idx: list[int] = []
    shape_to_a: dict[tuple, int] = {}
    for i, bm in enumerate(symbols):
        if bm.shape in shape_to_a:
            b_idx.append(i)
        else:
            shape_to_a[bm.shape] = len(a_idx)
            a_idx.append(i)
    identity_pad = not b_idx
    if identity_pad:
        # no repeated shapes: still exercise the layout by re-coding
        # the first exemplar as an identity refinement (unused by the
        # text region)
        b_idx = [a_idx[0]]
    a_syms = [symbols[i] for i in a_idx]
    b_syms = [symbols[i] for i in b_idx]
    b_ref = [shape_to_a[symbols[i].shape] for i in b_idx]
    pos_of = {i: j for j, i in enumerate(a_idx)}
    for j, i in enumerate(b_idx):
        if i not in pos_of:
            pos_of[i] = len(a_idx) + j
    uniq = {k: pos_of[v] for k, v in uniq.items()}

    # ---- dictionary A: generic-coded exemplars
    enc = _MQEncoder(ctx=([0], [0]))
    iadh, iadw, iaex = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    gb = _CtxSet(len(_sorted_template(template, at)))
    hcheight = 0
    i = 0
    while i < len(a_syms):
        hh = a_syms[i].shape[0]
        _int_arith(enc, iadh, hh - hcheight, True)
        hcheight = hh
        symwidth = 0
        while i < len(a_syms) and a_syms[i].shape[0] == hcheight:
            ww = a_syms[i].shape[1]
            _int_arith(enc, iadw, ww - symwidth, True)
            symwidth = ww
            _generic_with_ctx(enc, gb, a_syms[i], hcheight, ww, template, at)
            i += 1
        _int_arith(enc, iadw, None, True)
    _int_arith(enc, iaex, 0, True)
    _int_arith(enc, iaex, len(a_syms), True)
    dict_a = (
        struct.pack(">H", template << 10)
        + b"".join(struct.pack(">bb", dx, dy) for dx, dy in at)
        + struct.pack(">II", len(a_syms), len(a_syms))
        + enc.flush()
    )

    # ---- dictionary B: SDREFAGG=1, refining A's exemplars
    enc = _MQEncoder(ctx=([0], [0]))
    iadh, iadw, iaex = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    iaai, iardx, iardy = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    total = len(a_syms) + len(b_syms)
    codelen = max((total - 1).bit_length(), 0)
    iaid_ref = _CtxSet(codelen + 1)
    gr = _CtxSet(13 if rtemplate == 0 else 10)
    hcheight = 0
    i = 0
    while i < len(b_syms):
        hh = b_syms[i].shape[0]
        _int_arith(enc, iadh, hh - hcheight, True)
        hcheight = hh
        symwidth = 0
        while i < len(b_syms) and b_syms[i].shape[0] == hcheight:
            ww = b_syms[i].shape[1]
            _int_arith(enc, iadw, ww - symwidth, True)
            symwidth = ww
            _int_arith(enc, iaai, 1, True)  # REFAGGNINST
            _iaid_arith(enc, iaid_ref, codelen, b_ref[i], True)
            _int_arith(enc, iardx, 0, True)
            _int_arith(enc, iardy, 0, True)
            gr.bind(enc)
            _refine_region(
                enc, b_syms[i], a_syms[b_ref[i]], hcheight, ww,
                rtemplate, False, 0, 0,
            )
            i += 1
        _int_arith(enc, iadw, None, True)
    _int_arith(enc, iaex, len(a_syms), True)  # inputs stay unexported
    _int_arith(enc, iaex, len(b_syms), True)
    dict_b = (
        struct.pack(">H", 0x02 | (template << 10) | (rtemplate << 12))
        + b"".join(struct.pack(">bb", dx, dy) for dx, dy in at)
        + (struct.pack(">bbbb", -1, -1, -1, -1) if rtemplate == 0 else b"")
        + struct.pack(">II", len(b_syms), len(b_syms))
        + enc.flush()
    )

    # ---- text region over A + B exports (one-row strips, TL corner)
    syms = a_syms + b_syms
    codelen = max((len(syms) - 1).bit_length(), 0)
    enc = _MQEncoder(ctx=([0], [0]))
    iadt, iafs, iads = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    iaid = _CtxSet(codelen + 1)
    _int_arith(enc, iadt, 0, True)
    stript = 0
    firsts = 0
    by_strip: dict[int, list] = {}
    for t, l, bm in comps:
        by_strip.setdefault(t, []).append((l, bm))
    for base in sorted(by_strip):
        _int_arith(enc, iadt, base - stript, True)
        stript = base
        curs = None
        for l, bm in sorted(by_strip[base], key=lambda e: e[0]):
            if curs is None:
                _int_arith(enc, iafs, l - firsts, True)
                firsts = l
                curs = l
            else:
                _int_arith(enc, iads, l - curs, True)
                curs = l
            _iaid_arith(enc, iaid, codelen, uniq[bm.shape + (bm.tobytes(),)], True)
            curs += bm.shape[1] - 1
        _int_arith(enc, iads, None, True)
    text_data = (
        struct.pack(">IIIIB", w, h, 0, 0, 0)
        + struct.pack(">H", 1 << 4)  # SBHUFF=0, 1-row strips, TL corner
        + struct.pack(">I", len(comps))
        + enc.flush()
    )

    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    out = _seg_header(1, 48, 1, len(page_info)) + page_info
    out += _seg_header(2, 0, 1, len(dict_a)) + dict_a
    out += _seg_header(3, 0, 1, len(dict_b), referred=[2]) + dict_b
    out += _seg_header(4, 6, 1, len(text_data), referred=[2, 3]) + text_data
    out += _seg_header(5, 49, 1, 0)
    if file_header:
        out = JBIG2_MAGIC + bytes([0x01]) + struct.pack(">I", 1) + out
    return out


def encode_jbig2_symbols_aggregate(
    bits: np.ndarray,
    template: int = 0,
    rtemplate: int = 0,
    file_header: bool = False,
) -> bytes:
    """(rows, columns) {0,1} bit matrix → embedded JBIG2 stream whose
    refinement dictionary codes symbols by AGGREGATION (6.5.8.2.1,
    REFAGGNINST=2): dictionary A carries one exemplar per glyph shape
    class; dictionary B (SDREFAGG=1) codes every other unique glyph
    as an embedded TEXT REGION of two refined instances of its
    exemplar (both at the origin — OR-idempotent), driving the
    aggregate decode path with the dictionary's own IADT/IAFS/IADS/
    IARI/IARDW/IARDH contexts. Lossless."""
    if bits.ndim != 2 or bits.dtype != np.uint8 or int(bits.max(initial=0)) > 1:
        raise ValueError(
            "encode_jbig2_symbols_aggregate expects a (rows, cols) uint8 {0,1} matrix"
        )
    h, w = bits.shape
    if h == 0 or w == 0:
        raise ValueError("empty bitmap")
    if rtemplate not in (0, 1):
        raise ValueError(f"rtemplate must be 0 or 1, got {rtemplate}")
    comps = _connected_components(bits)
    if not comps:
        return encode_jbig2(bits, template=template, file_header=file_header)
    at = _NOMINAL_AT[template]

    uniq: dict[tuple, int] = {}
    symbols = []
    for _, _, bm in comps:
        key = bm.shape + (bm.tobytes(),)
        if key not in uniq:
            uniq[key] = len(symbols)
            symbols.append(bm)
    order = sorted(range(len(symbols)), key=lambda i: symbols[i].shape)
    symbols = [symbols[i] for i in order]
    remap = {old: new for new, old in enumerate(order)}
    uniq = {k: remap[v] for k, v in uniq.items()}

    a_idx: list[int] = []
    b_idx: list[int] = []
    shape_to_a: dict[tuple, int] = {}
    for i, bm in enumerate(symbols):
        if bm.shape in shape_to_a:
            b_idx.append(i)
        else:
            shape_to_a[bm.shape] = len(a_idx)
            a_idx.append(i)
    if not b_idx:
        # no repeated shapes: aggregate-code the first exemplar anyway
        b_idx = [a_idx[0]]
    a_syms = [symbols[i] for i in a_idx]
    b_syms = [symbols[i] for i in b_idx]
    b_ref = [shape_to_a[symbols[i].shape] for i in b_idx]
    pos_of = {i: j for j, i in enumerate(a_idx)}
    for j, i in enumerate(b_idx):
        if i not in pos_of:
            pos_of[i] = len(a_idx) + j
    uniq = {k: pos_of[v] for k, v in uniq.items()}

    # ---- dictionary A: generic-coded exemplars
    enc = _MQEncoder(ctx=([0], [0]))
    iadh, iadw, iaex = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    gb = _CtxSet(len(_sorted_template(template, at)))
    hcheight = 0
    i = 0
    while i < len(a_syms):
        hh = a_syms[i].shape[0]
        _int_arith(enc, iadh, hh - hcheight, True)
        hcheight = hh
        symwidth = 0
        while i < len(a_syms) and a_syms[i].shape[0] == hcheight:
            ww = a_syms[i].shape[1]
            _int_arith(enc, iadw, ww - symwidth, True)
            symwidth = ww
            _generic_with_ctx(enc, gb, a_syms[i], hcheight, ww, template, at)
            i += 1
        _int_arith(enc, iadw, None, True)
    _int_arith(enc, iaex, 0, True)
    _int_arith(enc, iaex, len(a_syms), True)
    dict_a = (
        struct.pack(">H", template << 10)
        + b"".join(struct.pack(">bb", dx, dy) for dx, dy in at)
        + struct.pack(">II", len(a_syms), len(a_syms))
        + enc.flush()
    )

    # ---- dictionary B: SDREFAGG=1 with REFAGGNINST=2 aggregates
    enc = _MQEncoder(ctx=([0], [0]))
    iadh, iadw, iaex = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    iaai, iardx, iardy = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    total = len(a_syms) + len(b_syms)
    codelen = max((total - 1).bit_length(), 0)
    iaid_ref = _CtxSet(codelen + 1)
    gr = _CtxSet(13 if rtemplate == 0 else 10)
    iadt_agg, iafs_agg, iads_agg = (_CtxSet(9) for _ in range(3))
    iari_agg, iardw_agg, iardh_agg = (_CtxSet(9) for _ in range(3))

    def emit_instance(bm, ex, ex_id):
        _iaid_arith(enc, iaid_ref, codelen, ex_id, True)
        _int_arith(enc, iari_agg, 1, True)
        rdw = bm.shape[1] - ex.shape[1]
        rdh = bm.shape[0] - ex.shape[0]
        _int_arith(enc, iardw_agg, rdw, True)
        _int_arith(enc, iardh_agg, rdh, True)
        _int_arith(enc, iardx, 0, True)
        _int_arith(enc, iardy, 0, True)
        gr.bind(enc)
        _refine_region(
            enc, bm, ex, bm.shape[0], bm.shape[1], rtemplate, False,
            rdw >> 1, rdh >> 1,
        )

    hcheight = 0
    i = 0
    while i < len(b_syms):
        hh = b_syms[i].shape[0]
        _int_arith(enc, iadh, hh - hcheight, True)
        hcheight = hh
        symwidth = 0
        while i < len(b_syms) and b_syms[i].shape[0] == hcheight:
            ww = b_syms[i].shape[1]
            _int_arith(enc, iadw, ww - symwidth, True)
            symwidth = ww
            bm, ex, ex_id = b_syms[i], a_syms[b_ref[i]], b_ref[i]
            _int_arith(enc, iaai, 2, True)  # REFAGGNINST
            # embedded text region: dt0, strip dt, first S, two
            # instances at the origin (OR-idempotent)
            _int_arith(enc, iadt_agg, 0, True)
            _int_arith(enc, iadt_agg, 0, True)
            _int_arith(enc, iafs_agg, 0, True)
            emit_instance(bm, ex, ex_id)
            _int_arith(enc, iads_agg, -(ww - 1), True)
            emit_instance(bm, ex, ex_id)
            i += 1
        _int_arith(enc, iadw, None, True)
    _int_arith(enc, iaex, len(a_syms), True)  # inputs stay unexported
    _int_arith(enc, iaex, len(b_syms), True)
    dict_b = (
        struct.pack(">H", 0x02 | (template << 10) | (rtemplate << 12))
        + b"".join(struct.pack(">bb", dx, dy) for dx, dy in at)
        + (struct.pack(">bbbb", -1, -1, -1, -1) if rtemplate == 0 else b"")
        + struct.pack(">II", len(b_syms), len(b_syms))
        + enc.flush()
    )

    # ---- text region over A + B exports (one-row strips, TL corner)
    syms = a_syms + b_syms
    codelen = max((len(syms) - 1).bit_length(), 0)
    enc = _MQEncoder(ctx=([0], [0]))
    iadt, iafs, iads = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    iaid = _CtxSet(codelen + 1)
    _int_arith(enc, iadt, 0, True)
    stript = 0
    firsts = 0
    by_strip: dict[int, list] = {}
    for t, l, bm in comps:
        by_strip.setdefault(t, []).append((l, bm))
    for base in sorted(by_strip):
        _int_arith(enc, iadt, base - stript, True)
        stript = base
        curs = None
        for l, bm in sorted(by_strip[base], key=lambda e: e[0]):
            if curs is None:
                _int_arith(enc, iafs, l - firsts, True)
                firsts = l
                curs = l
            else:
                _int_arith(enc, iads, l - curs, True)
                curs = l
            _iaid_arith(enc, iaid, codelen, uniq[bm.shape + (bm.tobytes(),)], True)
            curs += bm.shape[1] - 1
        _int_arith(enc, iads, None, True)
    text_data = (
        struct.pack(">IIIIB", w, h, 0, 0, 0)
        + struct.pack(">H", 1 << 4)  # SBHUFF=0, 1-row strips, TL corner
        + struct.pack(">I", len(comps))
        + enc.flush()
    )

    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    out = _seg_header(1, 48, 1, len(page_info)) + page_info
    out += _seg_header(2, 0, 1, len(dict_a)) + dict_a
    out += _seg_header(3, 0, 1, len(dict_b), referred=[2]) + dict_b
    out += _seg_header(4, 6, 1, len(text_data), referred=[2, 3]) + text_data
    out += _seg_header(5, 49, 1, 0)
    if file_header:
        out = JBIG2_MAGIC + bytes([0x01]) + struct.pack(">I", 1) + out
    return out


# ---------------------------------------------------------------------------
# huffman mode (Annex B) — the fax-profile entropy layer: MSB-first
# bit IO, Annex B code tables (standard B.1-B.5 + custom type-53
# segments), and the 7.4.3.1.7 runcoded symbol-ID code assignment
# ---------------------------------------------------------------------------


class _HuffReader:
    """MSB-first bit reader with the byte-align JBIG2 interleaves
    around collective bitmaps (7.4.3.1.1 note / 6.5.9)."""

    __slots__ = ("data", "byte", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("JBIG2 huffman bitstream truncated")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _HuffWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        while self.nbits:
            self.write(0, 1)

    def getvalue(self) -> bytes:
        if self.nbits:
            raise ValueError("unaligned huffman writer")
        return bytes(self.out)


class _HuffTable:
    """One Annex B code table: `lines` of (preflen, rangelen,
    rangelow, sign) — sign -1 marks the lower range line whose offset
    runs DOWNWARD from rangelow — plus an optional OOB prefix length.
    Prefix codes are assigned per B.3: canonical by length, in line
    order within a length; preflen-0 lines take no code."""

    def __init__(self, lines, oob_preflen: int | None = None):
        self.lines = [l for l in lines if l[0] > 0]
        self.oob_preflen = oob_preflen
        entries = [(l[0], ("line", i)) for i, l in enumerate(self.lines)]
        if oob_preflen:
            entries.append((oob_preflen, ("oob", None)))
        if not entries:
            raise ValueError("JBIG2 code table has no coded lines")
        maxlen = max(e[0] for e in entries)
        if maxlen > 32:
            raise ValueError("JBIG2 code table prefix length exceeds 32")
        count = [0] * (maxlen + 1)
        for plen, _ in entries:
            count[plen] += 1
        firstcode = [0] * (maxlen + 1)
        for ln in range(1, maxlen + 1):
            firstcode[ln] = (firstcode[ln - 1] + count[ln - 1]) << 1
        nxt = list(firstcode)
        self.codes: dict[tuple[int, int], tuple[str, int | None]] = {}
        self.enc: dict[tuple[str, int | None], tuple[int, int]] = {}
        for plen, tgt in entries:
            code = nxt[plen]
            nxt[plen] += 1
            if code >= 1 << plen:
                raise ValueError("JBIG2 code table overflows its lengths")
            self.codes[(code, plen)] = tgt
            self.enc[tgt] = (code, plen)

    def decode(self, br: _HuffReader) -> int | None:
        code = length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            if length > 32:
                raise ValueError("JBIG2 huffman code longer than 32 bits")
            tgt = self.codes.get((code, length))
            if tgt is None:
                continue
            if tgt[0] == "oob":
                return None
            preflen, rangelen, rangelow, sign = self.lines[tgt[1]]
            off = br.read(rangelen) if rangelen else 0
            return rangelow + sign * off

    def encode(self, bw: _HuffWriter, value: int | None) -> None:
        if value is None:
            if not self.oob_preflen:
                raise ValueError("JBIG2 code table has no OOB code")
            code, length = self.enc[("oob", None)]
            bw.write(code, length)
            return
        pick = None
        for i, (_pl, rangelen, rangelow, sign) in enumerate(self.lines):
            if sign > 0 and rangelen < 32:
                if rangelow <= value < rangelow + (1 << rangelen):
                    pick = (i, value - rangelow)
                    break
        if pick is None:
            for i, (_pl, rangelen, rangelow, sign) in enumerate(self.lines):
                if rangelen == 32:
                    if sign > 0 and value >= rangelow:
                        pick = (i, value - rangelow)
                        break
                    if sign < 0 and value <= rangelow:
                        pick = (i, rangelow - value)
                        break
        if pick is None:
            raise ValueError(f"value {value} not codable by this JBIG2 table")
        i, off = pick
        code, length = self.enc[("line", i)]
        bw.write(code, length)
        rangelen = self.lines[i][1]
        if rangelen:
            bw.write(off, rangelen)


# standard tables B.1-B.5 (Annex B.5) — the symbol-dictionary set:
# B.1 BMSIZE/AGGINST/EX, B.2-B.3 DW, B.4-B.5 DH. The text-region
# standard tables B.6-B.13 are not built in; text regions use custom
# type-53 tables (the layout our encoder twin emits).
_STD_TABLES = {
    1: _HuffTable(
        [(1, 4, 0, 1), (2, 8, 16, 1), (3, 16, 272, 1), (3, 32, 65808, 1)]
    ),
    2: _HuffTable(
        [(1, 0, 0, 1), (2, 0, 1, 1), (3, 0, 2, 1), (4, 3, 3, 1),
         (5, 6, 11, 1), (6, 32, 75, 1)],
        oob_preflen=6,
    ),
    3: _HuffTable(
        [(8, 8, -256, 1), (1, 0, 0, 1), (2, 0, 1, 1), (3, 0, 2, 1),
         (4, 3, 3, 1), (5, 6, 11, 1), (8, 32, -257, -1), (7, 32, 75, 1)],
        oob_preflen=6,
    ),
    4: _HuffTable(
        [(1, 0, 1, 1), (2, 0, 2, 1), (3, 0, 3, 1), (4, 3, 4, 1),
         (5, 6, 12, 1), (5, 32, 76, 1)]
    ),
    5: _HuffTable(
        [(7, 8, -255, 1), (1, 0, 1, 1), (2, 0, 2, 1), (3, 0, 3, 1),
         (4, 3, 4, 1), (5, 6, 12, 1), (7, 32, -256, -1), (6, 32, 76, 1)]
    ),
}


def _parse_table_segment(body: bytes) -> _HuffTable:
    """7.4.13 / B.2.4 custom code table segment → _HuffTable."""
    if len(body) < 9:
        raise ValueError("JBIG2 code table segment truncated")
    flags = body[0]
    htoob = flags & 0x01
    htps = ((flags >> 1) & 0x07) + 1
    htrs = ((flags >> 4) & 0x07) + 1
    htlow, hthigh = struct.unpack(">ii", body[1:9])
    if hthigh <= htlow:
        raise ValueError("JBIG2 code table has an empty value range")
    br = _HuffReader(body, 9)
    lines = []
    cur = htlow
    while cur < hthigh:
        preflen = br.read(htps)
        rangelen = br.read(htrs)
        if rangelen > 32:
            raise ValueError("JBIG2 code table range length exceeds 32")
        lines.append((preflen, rangelen, cur, 1))
        if rangelen >= 32:
            cur = hthigh
        else:
            cur += 1 << rangelen
    lower_pl = br.read(htps)
    upper_pl = br.read(htps)
    lines.append((lower_pl, 32, htlow - 1, -1))
    lines.append((upper_pl, 32, hthigh, 1))
    oob_pl = br.read(htps) if htoob else None
    return _HuffTable(lines, oob_preflen=oob_pl or None)


def _encode_table_segment(
    lines: list, lower_pl: int, upper_pl: int, oob_pl: int | None
) -> tuple[bytes, _HuffTable]:
    """(preflen, rangelen) custom-table lines spanning [low, high) →
    (type-53 segment body, the equivalent _HuffTable). `lines` are
    (preflen, rangelen, rangelow) with contiguous rangelows."""
    htlow = lines[0][2]
    hthigh = lines[-1][2] + (1 << lines[-1][1])
    htps = max(
        max(pl for pl, _rl, _lo in lines), lower_pl, upper_pl, oob_pl or 1
    ).bit_length()
    htrs = max(rl for _pl, rl, _lo in lines).bit_length()
    htps, htrs = max(htps, 1), max(htrs, 1)
    if htps > 8 or htrs > 8:
        raise ValueError("JBIG2 custom table widths exceed 8 bits")
    flags = (1 if oob_pl else 0) | (htps - 1) << 1 | (htrs - 1) << 4
    bw = _HuffWriter()
    for pl, rl, _lo in lines:
        bw.write(pl, htps)
        bw.write(rl, htrs)
    bw.write(lower_pl, htps)
    bw.write(upper_pl, htps)
    if oob_pl:
        bw.write(oob_pl, htps)
    bw.align()
    body = bytes([flags]) + struct.pack(">ii", htlow, hthigh) + bw.getvalue()
    return body, _parse_table_segment(body)


def _decode_symbol_id_codes(
    br: _HuffReader, nsyms: int
) -> _HuffTable:
    """7.4.3.1.7 symbol ID code assignment: 35 five-bit runcode
    lengths → runcode table → runcoded per-symbol code lengths →
    canonical symbol ID code. Ends byte-aligned (step 7)."""
    runlens = [br.read(5) for _ in range(35)]
    runtab = _HuffTable(
        [(pl, 0, v, 1) for v, pl in enumerate(runlens)]
    )
    lengths = [0] * nsyms
    prev = 0
    i = 0
    while i < nsyms:
        rc = runtab.decode(br)
        if rc is None or rc > 34:
            raise ValueError("JBIG2 symbol ID runcode out of range")
        if rc < 32:
            lengths[i] = prev = rc
            i += 1
        elif rc == 32:
            rep = br.read(2) + 3
            if i == 0:
                raise ValueError("JBIG2 runcode 32 with no previous length")
            for _ in range(rep):
                if i >= nsyms:
                    raise ValueError("JBIG2 runcode overruns the symbol count")
                lengths[i] = prev
                i += 1
        elif rc == 33:
            i += br.read(3) + 3
        else:
            i += br.read(7) + 11
        if i > nsyms:
            raise ValueError("JBIG2 runcode overruns the symbol count")
    br.align()
    return _HuffTable(
        [(pl, 0, v, 1) for v, pl in enumerate(lengths)]
    )


def _pick_table(sel: int, std: tuple[int, ...], tables: list, used: list):
    """Resolve a 2-bit table-selection field: standard table number
    from `std` or (sel == 3) the next referred custom table."""
    if sel == 3:
        idx = used[0]
        used[0] += 1
        if idx >= len(tables):
            raise ValueError(
                "JBIG2 segment selects more custom tables than referred"
            )
        return tables[idx]
    if sel >= len(std) or std[sel] == 0:
        raise ValueError(f"JBIG2 table selection {sel} is illegal here")
    return _STD_TABLES[std[sel]]


def _huffman_symbol_dict(
    body: bytes, flags: int, input_syms: list, tables: list
) -> list:
    """6.5 symbol dictionary with SDHUFF=1 (REFAGG=0): height-class
    DH/DW deltas through Annex B tables, symbols carried as
    COLLECTIVE bitmaps per height class (BMSIZE=0 → uncompressed
    rows, else MMR), exports as Table B.1 runlengths."""
    if flags & 0x02:
        raise NotImplementedError(
            "JBIG2 huffman symbol dictionaries with refinement/aggregate "
            "coding (SDHUFF=1, REFAGG=1) not supported"
        )
    used = [0]
    t_dh = _pick_table((flags >> 2) & 0x03, (4, 5), tables, used)
    t_dw = _pick_table((flags >> 4) & 0x03, (2, 3), tables, used)
    t_bm = _pick_table(3 if flags & 0x40 else 0, (1,), tables, used)
    # SDHUFFAGGINST (bit 7) is only consulted when REFAGG=1
    pos = 2
    numex, numnew = struct.unpack(">II", body[pos : pos + 8])
    pos += 8
    if numnew > 1 << 20 or numex > (len(input_syms) + numnew):
        raise ValueError("implausible JBIG2 symbol dictionary counts")
    br = _HuffReader(body, pos)
    new_syms: list = []
    hcheight = 0
    while len(new_syms) < numnew:
        dh = t_dh.decode(br)
        if dh is None:
            raise ValueError("JBIG2 symbol dictionary: OOB height delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 1 << 14:
            raise ValueError(f"JBIG2 symbol height {hcheight} out of range")
        widths: list[int] = []
        symwidth = totwidth = 0
        while True:
            dw = t_dw.decode(br)
            if dw is None:
                break
            symwidth += dw
            if symwidth <= 0 or symwidth > 1 << 14:
                raise ValueError(
                    f"JBIG2 symbol width {symwidth} out of range"
                )
            if len(new_syms) + len(widths) >= numnew:
                raise ValueError("JBIG2 symbol dictionary: too many symbols")
            widths.append(symwidth)
            totwidth += symwidth
        if not widths:
            continue
        bmsize = t_bm.decode(br)
        if bmsize is None or bmsize < 0:
            raise ValueError("JBIG2 symbol dictionary: bad BMSIZE")
        br.align()
        if bmsize == 0:
            # uncompressed collective bitmap: row-padded to bytes
            rowbytes = (totwidth + 7) // 8
            need = rowbytes * hcheight
            raw = body[br.byte : br.byte + need]
            if len(raw) < need:
                raise ValueError("JBIG2 collective bitmap truncated")
            rows = np.unpackbits(
                np.frombuffer(raw, dtype=np.uint8).reshape(
                    hcheight, rowbytes
                ),
                axis=1,
            )[:, :totwidth]
            coll = np.ascontiguousarray(rows)
            br.byte += need
        else:
            from .ccitt import ccitt_decode

            coll = ccitt_decode(
                body[br.byte : br.byte + bmsize], totwidth, hcheight, k=-1
            )
            br.byte += bmsize
        x0 = 0
        for wsym in widths:
            new_syms.append(
                np.ascontiguousarray(coll[:, x0 : x0 + wsym])
            )
            x0 += wsym
    # export runs: Table B.1 runlengths over input + new (6.5.10)
    all_syms = list(input_syms) + new_syms
    exported = []
    cur = 0
    i = 0
    while i < len(all_syms):
        run = _STD_TABLES[1].decode(br)
        if run is None or run < 0:
            raise ValueError("JBIG2 symbol dictionary: bad export run")
        if cur:
            exported.extend(all_syms[i : i + run])
        i += run
        cur ^= 1
    if len(exported) != numex:
        raise ValueError(
            f"JBIG2 symbol dictionary exports {len(exported)}, declared {numex}"
        )
    return exported


def _decode_symbol_dict(
    body: bytes, input_syms: list, tables: list = ()
) -> list:
    """7.4.3 symbol dictionary segment → exported symbol list."""
    if len(body) < 2:
        raise ValueError("JBIG2 symbol dictionary truncated")
    (flags,) = struct.unpack(">H", body[:2])
    if flags & 0x01:
        return _huffman_symbol_dict(body, flags, input_syms, list(tables))
    refagg = bool(flags & 0x02)
    template = (flags >> 10) & 0x03
    rtemplate = (flags >> 12) & 0x01
    pos = 2
    n_at = 4 if template == 0 else 1
    at = [
        struct.unpack(">bb", body[pos + 2 * k : pos + 2 * k + 2])
        for k in range(n_at)
    ]
    pos += 2 * n_at
    if refagg and rtemplate == 0:
        if pos + 4 > len(body):
            raise ValueError("JBIG2 symbol dictionary SDRAT truncated")
        rat = [
            struct.unpack(">bb", body[pos + 2 * k : pos + 2 * k + 2])
            for k in range(2)
        ]
        pos += 4
        if rat != [(-1, -1), (-1, -1)]:
            raise NotImplementedError(
                "JBIG2 refined symbols with custom GRAT pixels not "
                "supported (nominal (-1,-1) only)"
            )
    numex, numnew = struct.unpack(">II", body[pos : pos + 8])
    pos += 8
    if numnew > 1 << 20 or numex > (len(input_syms) + numnew):
        raise ValueError("implausible JBIG2 symbol dictionary counts")
    dec = _MQDecoder(body[pos:], ctx=([0], [0]))
    iadh, iadw, iaex = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    gb = _CtxSet(len(_sorted_template(template, at)))
    iaai, iardx, iardy = _CtxSet(9), _CtxSet(9), _CtxSet(9)
    iaid_ref = _CtxSet(
        max((len(input_syms) + numnew - 1).bit_length(), 0) + 1
    )
    gr = _CtxSet(13 if rtemplate == 0 else 10)
    # aggregate-path (6.5.8.2.1) text-region contexts, owned by the dict
    iadt_agg, iafs_agg, iads_agg = (_CtxSet(9) for _ in range(3))
    iari_agg, iardw_agg, iardh_agg = (_CtxSet(9) for _ in range(3))
    codelen = max((len(input_syms) + numnew - 1).bit_length(), 0)
    new_syms: list = []
    hcheight = 0
    while len(new_syms) < numnew:
        dh = _int_arith(dec, iadh, None, False)
        if dh is None:
            raise ValueError("JBIG2 symbol dictionary: OOB height delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 1 << 14:
            raise ValueError(f"JBIG2 symbol height {hcheight} out of range")
        symwidth = 0
        while True:
            dw = _int_arith(dec, iadw, None, False)
            if dw is None:
                break  # end of height class
            symwidth += dw
            if symwidth <= 0 or symwidth > 1 << 14:
                raise ValueError(f"JBIG2 symbol width {symwidth} out of range")
            if len(new_syms) >= numnew:
                raise ValueError("JBIG2 symbol dictionary: too many symbols")
            if refagg:
                # refined/aggregate symbol (6.5.8.2): REFAGGNINST=1 is
                # a single-instance refinement of an already-available
                # symbol displaced by (RDX, RDY); REFAGGNINST>1 runs
                # the TEXT REGION procedure (6.5.8.2.1) over the
                # available symbols with the dictionary's own contexts
                # (one-row strips, TL corner, OR, SBREFINE=1)
                nref = _int_arith(dec, iaai, None, False)
                if nref is None or nref < 1:
                    raise ValueError(
                        f"JBIG2 aggregate instance count {nref} is illegal"
                    )
                avail = input_syms + new_syms
                if nref > 1:
                    region = np.zeros((hcheight, symwidth), dtype=np.uint8)

                    def agg_int(ctx):
                        return lambda: _int_arith(dec, ctx, None, False)

                    def agg_id():
                        return _iaid_arith(dec, iaid_ref, codelen, None, False)

                    def agg_refine(bm):
                        ri = _int_arith(dec, iari_agg, None, False)
                        if ri is None:
                            raise ValueError(
                                "JBIG2 aggregate: OOB refinement flag"
                            )
                        if not ri:
                            return bm
                        rdw = _int_arith(dec, iardw_agg, None, False)
                        rdh = _int_arith(dec, iardh_agg, None, False)
                        rdx2 = _int_arith(dec, iardx, None, False)
                        rdy2 = _int_arith(dec, iardy, None, False)
                        if None in (rdw, rdh, rdx2, rdy2):
                            raise ValueError(
                                "JBIG2 aggregate: OOB refinement delta"
                            )
                        nh, nw = bm.shape[0] + rdh, bm.shape[1] + rdw
                        if nh <= 0 or nw <= 0 or nh > 1 << 14 or nw > 1 << 14:
                            raise ValueError(
                                f"JBIG2 aggregate instance size {nh}x{nw}"
                                " out of range"
                            )
                        gr.bind(dec)
                        return _refine_region(
                            dec, None, bm, nh, nw, rtemplate, False,
                            (rdw >> 1) + rdx2, (rdh >> 1) + rdy2,
                        )

                    _place_text_instances(
                        region, nref, 1, 1, False, 0, 0, avail,
                        agg_int(iadt_agg), agg_int(iafs_agg),
                        agg_int(iads_agg), lambda: 0, agg_id, agg_refine,
                    )
                    new_syms.append(region)
                    continue
                sid = _iaid_arith(dec, iaid_ref, codelen, None, False)
                rdx = _int_arith(dec, iardx, None, False)
                rdy = _int_arith(dec, iardy, None, False)
                if rdx is None or rdy is None:
                    raise ValueError("JBIG2 refined symbol: OOB displacement")
                if not 0 <= sid < len(avail):
                    raise ValueError(
                        f"JBIG2 refined symbol references id {sid} of "
                        f"{len(avail)}"
                    )
                gr.bind(dec)
                new_syms.append(
                    _refine_region(
                        dec, None, avail[sid], hcheight, symwidth,
                        rtemplate, False, rdx, rdy,
                    )
                )
            else:
                new_syms.append(
                    _generic_with_ctx(dec, gb, None, hcheight, symwidth, template, at)
                )
    # export flags over input + new symbols (6.5.10)
    all_syms = list(input_syms) + new_syms
    exported = []
    cur = 0
    i = 0
    while i < len(all_syms):
        run = _int_arith(dec, iaex, None, False)
        if run is None or run < 0:
            raise ValueError("JBIG2 symbol dictionary: bad export run")
        if cur:
            exported.extend(all_syms[i : i + run])
        i += run
        cur ^= 1
    if len(exported) != numex:
        raise ValueError(
            f"JBIG2 symbol dictionary exports {len(exported)}, declared {numex}"
        )
    return exported


def _pick_text_table(sel: int, name: str, tables: list, used: list):
    """Huffman text regions select FS/DS/DT tables: only the custom
    (sel == 3) form is built in; the standard text tables B.6-B.13
    fail loudly."""
    if sel == 3:
        idx = used[0]
        used[0] += 1
        if idx >= len(tables):
            raise ValueError(
                "JBIG2 text region selects more custom tables than referred"
            )
        return tables[idx]
    raise NotImplementedError(
        f"JBIG2 standard {name} text-region tables (B.6-B.13) not built"
        " in; custom type-53 tables only"
    )


def _decode_text_region(
    body: bytes, syms: list, tables: list = ()
) -> tuple[np.ndarray, int, int, int]:
    """7.4.4 text region segment → (bitmap, x, y, combine op).
    Arithmetic (SBHUFF=0) or huffman (SBHUFF=1: custom FS/DS/DT
    tables + the 7.4.3.1.7 runcoded symbol ID code, CURT as raw
    bits)."""
    if len(body) < 23:
        raise ValueError("JBIG2 text region truncated")
    w, h, x, y, rflags = struct.unpack(">IIIIB", body[:17])
    if int(w) * int(h) > 1 << 28:
        raise ValueError(f"implausible JBIG2 region dimensions {w}x{h}")
    op = rflags & 0x07
    if op not in _COMBINE:
        raise ValueError(f"JBIG2 region combination operator {op} is illegal")
    (tflags,) = struct.unpack(">H", body[17:19])
    huff = bool(tflags & 0x01)
    refine = bool(tflags & 0x02)
    rtemplate = (tflags >> 15) & 0x01
    if huff and refine:
        raise NotImplementedError(
            "JBIG2 huffman refined text regions (SBHUFF=1 with "
            "SBREFINE=1) not supported"
        )
    transposed = bool(tflags & 0x40)
    logsbstrips = (tflags >> 2) & 0x03
    sbstrips = 1 << logsbstrips
    refcorner = (tflags >> 4) & 0x03  # 0 BL, 1 TL, 2 BR, 3 TR
    sbcombop = (tflags >> 7) & 0x03
    defpixel = (tflags >> 9) & 0x01
    dsoffset = (tflags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32  # signed 5-bit
    if not syms:
        raise ValueError("JBIG2 text region with no referred symbols")
    if huff:
        if len(body) < 25:
            raise ValueError("JBIG2 huffman text region truncated")
        (hflags,) = struct.unpack(">H", body[19:21])
        (numinst,) = struct.unpack(">I", body[21:25])
        used = [0]
        tabs = list(tables)
        t_fs = _pick_text_table(hflags & 0x03, "FS", tabs, used)
        t_ds = _pick_text_table((hflags >> 2) & 0x03, "DS", tabs, used)
        t_dt = _pick_text_table((hflags >> 4) & 0x03, "DT", tabs, used)
        # RDW/RDH/RDX/RDY/RSIZE selections only apply when REFINE=1
        br = _HuffReader(body, 25)
        symid = _decode_symbol_id_codes(br, len(syms))

        def dec_dt():
            return t_dt.decode(br)

        def dec_fs():
            return t_fs.decode(br)

        def dec_ds():
            return t_ds.decode(br)

        def dec_t():
            return br.read(logsbstrips) if sbstrips > 1 else 0

        def dec_id():
            sid = symid.decode(br)
            if sid is None:
                raise ValueError("JBIG2 symbol ID decodes to OOB")
            return sid

        def dec_refine(bm):
            return bm
    else:
        pos = 19
        if refine and rtemplate == 0:
            if len(body) < pos + 4:
                raise ValueError("JBIG2 text region SBRAT truncated")
            sbrat = [
                struct.unpack(">bb", body[pos + 2 * k : pos + 2 * k + 2])
                for k in range(2)
            ]
            pos += 4
            if sbrat != [(-1, -1), (-1, -1)]:
                raise NotImplementedError(
                    "JBIG2 refined text regions with custom SBRAT pixels"
                    " not supported (nominal (-1,-1) only)"
                )
        (numinst,) = struct.unpack(">I", body[pos : pos + 4])
        codelen = max((len(syms) - 1).bit_length(), 0)
        dec = _MQDecoder(body[pos + 4 :], ctx=([0], [0]))
        iadt, iafs, iads, iait = (_CtxSet(9) for _ in range(4))
        iaid = _CtxSet(codelen + 1)
        iari, iardw, iardh = (_CtxSet(9) for _ in range(3))
        iardx, iardy = _CtxSet(9), _CtxSet(9)
        gr = _CtxSet(13 if rtemplate == 0 else 10)

        def dec_refine(bm):
            # 6.4.11: per-instance refinement — RI bit, then the
            # RDW/RDH size deltas and RDX/RDY displacement feed the
            # generic refinement procedure against the symbol bitmap
            if not refine:
                return bm
            ri = _int_arith(dec, iari, None, False)
            if ri is None:
                raise ValueError("JBIG2 text region: OOB refinement flag")
            if not ri:
                return bm
            rdw = _int_arith(dec, iardw, None, False)
            rdh = _int_arith(dec, iardh, None, False)
            rdx = _int_arith(dec, iardx, None, False)
            rdy = _int_arith(dec, iardy, None, False)
            if None in (rdw, rdh, rdx, rdy):
                raise ValueError("JBIG2 text region: OOB refinement delta")
            nh, nw = bm.shape[0] + rdh, bm.shape[1] + rdw
            if nh <= 0 or nw <= 0 or nh > 1 << 14 or nw > 1 << 14:
                raise ValueError(
                    f"JBIG2 refined instance size {nh}x{nw} out of range"
                )
            gr.bind(dec)
            return _refine_region(
                dec, None, bm, nh, nw, rtemplate, False,
                (rdw >> 1) + rdx, (rdh >> 1) + rdy,
            )

        def dec_dt():
            return _int_arith(dec, iadt, None, False)

        def dec_fs():
            return _int_arith(dec, iafs, None, False)

        def dec_ds():
            return _int_arith(dec, iads, None, False)

        def dec_t():
            v = _int_arith(dec, iait, None, False) if sbstrips > 1 else 0
            return v

        def dec_id():
            return _iaid_arith(dec, iaid, codelen, None, False)

    if numinst > 1 << 24:
        raise ValueError(f"implausible JBIG2 instance count {numinst}")
    region = np.full((int(h), int(w)), defpixel, dtype=np.uint8)
    _place_text_instances(
        region, numinst, sbstrips, refcorner, transposed, sbcombop,
        dsoffset, syms, dec_dt, dec_fs, dec_ds, dec_t, dec_id, dec_refine,
    )
    return region, int(x), int(y), op


def _place_text_instances(
    region: np.ndarray,
    numinst: int,
    sbstrips: int,
    refcorner: int,
    transposed: bool,
    sbcombop: int,
    dsoffset: int,
    syms: list,
    dec_dt,
    dec_fs,
    dec_ds,
    dec_t,
    dec_id,
    dec_refine,
) -> None:
    """The 6.4.5 strip/instance placement loop, decoupled from the
    entropy layer through decode closures — shared by arithmetic and
    huffman text regions AND the 6.5.8.2.1 aggregate symbol path
    (which runs it with the symbol dictionary's own contexts)."""
    h, w = region.shape
    dt0 = dec_dt()
    if dt0 is None:
        raise ValueError("JBIG2 text region: OOB initial strip delta")
    stript = -dt0 * sbstrips
    firsts = 0
    inst = 0
    while inst < numinst:
        dt = dec_dt()
        if dt is None:
            raise ValueError("JBIG2 text region: OOB strip delta")
        stript += dt * sbstrips
        curs = None
        while True:
            if curs is None:
                dfs = dec_fs()
                if dfs is None:
                    raise ValueError("JBIG2 text region: OOB first-symbol delta")
                firsts += dfs
                curs = firsts
            else:
                ids = dec_ds()
                if ids is None:
                    break  # end of strip
                curs += ids + dsoffset
            curt = dec_t()
            if curt is None:
                raise ValueError("JBIG2 text region: OOB T offset")
            ti = stript + curt
            sid = dec_id()
            if not 0 <= sid < len(syms):
                raise ValueError(f"JBIG2 symbol id {sid} out of range")
            bm = dec_refine(syms[sid])
            hs, ws = bm.shape
            if transposed:
                # S runs down the page, T across (6.4.5 3c: vertical
                # text): after each instance CURS sits on its BOTTOM
                # row; bottom corners pre-advance, top corners post
                if refcorner in (0, 2):  # bottom corners advance first
                    curs += hs - 1
                    py = curs - hs + 1
                else:
                    py = curs
                px = ti if refcorner in (0, 1) else ti - ws + 1  # L vs R
            else:
                if refcorner in (2, 3):  # right corners advance first
                    curs += ws - 1
                    px = curs - ws + 1
                else:
                    px = curs
                py = ti if refcorner in (1, 3) else ti - hs + 1  # T vs B
            if not (0 <= px and px + ws <= w and 0 <= py and py + hs <= h):
                raise ValueError("JBIG2 symbol instance outside its region")
            window = region[py : py + hs, px : px + ws]
            region[py : py + hs, px : px + ws] = _COMBINE[sbcombop](window, bm)
            if transposed:
                if refcorner in (1, 3):  # top corners advance after
                    curs += hs - 1
            elif refcorner in (0, 1):  # left corners advance after
                curs += ws - 1
            inst += 1
            if inst >= numinst:
                break
