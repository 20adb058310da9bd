"""Pure-python CCITT Group 3/4 fax codec (ITU-T T.4 / T.6).

CCITT fax is the dominant compression of archival bilevel scans: TIFF
compressions 2 (Modified Huffman), 3 (Group 3, 1D/2D per T4Options)
and 4 (Group 4 / MMR), and the PDF /CCITTFaxDecode filter.  Reference
handles these via the `image`/`hayro` crates (utils/image.rs,
Cargo.toml:20); here they are written directly against the public
ITU-T T.4 (03/93) code tables and the T.4/T.6 two-dimensional coding
procedure.

Decoder model: rows of {0,1} bits with **1 = black** (the fax coding
domain). Container adapters map polarity:
- TIFF: PhotometricInterpretation 0 (WhiteIsZero) means decoded 1-bits
  are black -> image 0; handled by the existing photometric logic once
  we emit MinIsWhite-convention bits.
- PDF: /BlackIs1 false (default) means 0 bits are black in the decoded
  stream, so the packed output is the complement of the coding domain.

An encoder for G4 (MMR), G3-1D (MH) and G3-2D rows ships alongside so
fixtures roundtrip without any external image library (the repo-wide
fixture contract). The code tables are validated by prefix-freeness +
Kraft-completeness tests and published spot vectors in test_ccitt.py.

Scope (fails loudly): the T.4 extension/uncompressed mode (code
0000001xxx) raises NotImplementedError; damaged streams raise
ValueError.
"""

from __future__ import annotations

import numpy as np

from .codec_guard import loud_decode

__all__ = [
    "ccitt_decode",
    "ccitt_encode_g4",
    "ccitt_encode_g3_1d",
    "ccitt_encode_g3_2d",
]

# ---------------------------------------------------------------------------
# ITU-T T.4 run-length code tables ((run, code-string) — MSB first)
# ---------------------------------------------------------------------------

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
# extended makeup codes are shared between colors (T.4 table 3)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOL = "000000000001"

# 2D mode codes (T.4 table 4 / T.6)
_MODE_PASS = "0001"
_MODE_HORIZ = "001"
_MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
           -1: "010", -2: "000010", -3: "0000010"}


def _decode_table(term: dict[int, str], makeup: dict[int, str]) -> dict:
    """(length, value) -> run lookup (makeup runs are >= 64 and mean
    'add this and read another code of the same color')."""
    out: dict[tuple[int, int], int] = {}
    for src in (term, makeup, _EXT_MAKEUP):
        for run, code in src.items():
            key = (len(code), int(code, 2))
            if key in out:
                raise AssertionError(f"duplicate CCITT code {code}")
            out[key] = run
    return out


_WHITE_DECODE = _decode_table(_WHITE_TERM, _WHITE_MAKEUP)
_BLACK_DECODE = _decode_table(_BLACK_TERM, _BLACK_MAKEUP)
_MAX_CODE_LEN = 13


class _BitReader:
    """MSB-first bit reader over a bytes buffer (O(1) windowed peek)."""

    __slots__ = ("data", "nbits", "pos")

    def __init__(self, data: bytes):
        self.data = data + b"\x00\x00\x00"  # zero tail pad for peeks
        self.nbits = 8 * len(data)
        self.pos = 0

    def remaining(self) -> int:
        return self.nbits - self.pos

    def peek(self, n: int) -> int:
        # n <= 13 < 25, so a 4-byte window always covers pos..pos+n
        i = self.pos >> 3
        window = int.from_bytes(self.data[i : i + 4], "big")
        return (window >> (32 - (self.pos & 7) - n)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(r: _BitReader, table: dict) -> int:
    """One complete run of one color: zero or more makeup codes plus a
    terminating code (< 64)."""
    total = 0
    while True:
        run = None
        for ln in range(2, _MAX_CODE_LEN + 1):
            if ln > r.remaining():
                raise ValueError("CCITT stream truncated inside a run code")
            cand = table.get((ln, r.peek(ln)))
            if cand is not None:
                r.skip(ln)
                run = cand
                break
        if run is None:
            raise ValueError("invalid CCITT run code")
        total += run
        if run < 64:
            return total


def _peek_is_eol(r: _BitReader) -> bool:
    return r.remaining() >= 12 and r.peek(12) == 1


def _decode_1d_row(r: _BitReader, columns: int) -> list[int]:
    """One MH-coded row -> changing-element positions (coding starts
    white)."""
    changes: list[int] = []
    pos = 0
    color = 0  # 0 white, 1 black
    while pos < columns:
        run = _read_run(r, _BLACK_DECODE if color else _WHITE_DECODE)
        pos += run
        if pos > columns:
            raise ValueError("CCITT 1D row overruns Columns")
        changes.append(pos)
        color ^= 1
    return changes


def _decode_2d_row(r: _BitReader, ref: list[int], columns: int) -> list[int]:
    """One 2D-coded row (T.4 2D == T.6) given the reference row's
    changing elements -> this row's changing elements."""
    cur: list[int] = []
    a0 = -1
    color = 0
    while a0 < columns:
        # b1: first ref change > a0 with opposite color to a0's run
        # (ref changes alternate white->black, black->white, starting
        # with a white->black transition).
        i = 0
        n = len(ref)
        while i < n and ref[i] <= a0:
            i += 1
        # parity: ref[even] are white->black flips. b1 must be a flip
        # to `color^1`, i.e. index parity == color parity.
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < n else columns
        b2 = ref[i + 1] if i + 1 < n else columns

        if r.remaining() <= 0:
            raise ValueError("CCITT stream truncated inside a 2D row")
        if r.peek(1) == 1:  # V0
            r.skip(1)
            a1 = b1
            cur.append(a1)
            a0 = a1
            color ^= 1
            continue
        p3 = r.peek(3)
        if p3 == 0b011:  # VR1
            r.skip(3); a1 = b1 + 1
        elif p3 == 0b010:  # VL1
            r.skip(3); a1 = b1 - 1
        elif p3 == 0b001:  # horizontal
            r.skip(3)
            base = max(a0, 0)
            r1 = _read_run(r, _BLACK_DECODE if color else _WHITE_DECODE)
            r2 = _read_run(r, _WHITE_DECODE if color else _BLACK_DECODE)
            a1 = base + r1
            a2 = a1 + r2
            if a2 > columns:
                raise ValueError("CCITT horizontal runs overrun Columns")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
            continue
        else:
            p4 = r.peek(4)
            if p4 == 0b0001:  # pass
                r.skip(4)
                a0 = b2
                continue
            p6 = r.peek(6)
            if p6 == 0b000011:  # VR2
                r.skip(6); a1 = b1 + 2
            elif p6 == 0b000010:  # VL2
                r.skip(6); a1 = b1 - 2
            else:
                p7 = r.peek(7)
                if p7 == 0b0000011:  # VR3
                    r.skip(7); a1 = b1 + 3
                elif p7 == 0b0000010:  # VL3
                    r.skip(7); a1 = b1 - 3
                elif p7 == 0b0000001:
                    raise NotImplementedError(
                        "CCITT extension/uncompressed mode not supported"
                    )
                else:
                    raise ValueError("invalid CCITT 2D mode code")
        if a1 < 0 or a1 > columns:
            raise ValueError("CCITT vertical mode out of row bounds")
        cur.append(a1)
        a0 = a1
        color ^= 1
    return cur


def _changes_to_bits(changes: list[int], columns: int) -> np.ndarray:
    """Changing elements -> row of {0,1} with 1 = black."""
    row = np.zeros(columns, dtype=np.uint8)
    it = iter(changes)
    for start in it:
        end = next(it, columns)
        row[start:end] = 1
    return row


@loud_decode("CCITT")
def ccitt_decode(
    data: bytes,
    columns: int,
    rows: int | None = None,
    k: int = -1,
    byte_align: bool = False,
) -> np.ndarray:
    """CCITT stream -> (rows, columns) uint8 bit matrix, 1 = black.

    k < 0: pure 2D / MMR (TIFF compression 4, PDF K<0). k == 0: pure
    1D MH (TIFF compression 2 with byte_align=True, PDF K=0); leading
    EOLs before rows are tolerated. k > 0: mixed G3 2D — every row is
    preceded by EOL + a 1/0 tag bit choosing 1D/2D for that row (TIFF
    compression 3 with the 2D T4Options bit, PDF K>0).

    If `rows` is None, decodes until EOFB / RTC / data exhaustion.
    """
    if columns <= 0:
        raise ValueError("CCITT Columns must be positive")
    r = _BitReader(data)
    out: list[np.ndarray] = []
    ref = [columns, columns]
    while rows is None or len(out) < rows:
        if byte_align:
            r.align()
        # consume EOL(s) / fill; detect EOFB (two EOLs back-to-back)
        seen_eol = 0
        while _peek_is_eol(r):
            r.skip(12)
            seen_eol += 1
            # fill bits between EOLs are zeros already absorbed by peek
        if rows is None and (seen_eol >= 2 or r.remaining() < 2):
            break
        if r.remaining() < 2:
            if rows is not None:
                raise ValueError(
                    f"CCITT stream ended after {len(out)} of {rows} rows"
                )
            break
        if k > 0:
            if seen_eol == 0:
                raise ValueError("CCITT G3-2D row without EOL")
            tag = r.peek(1)
            r.skip(1)
            changes = (
                _decode_1d_row(r, columns)
                if tag
                else _decode_2d_row(r, ref, columns)
            )
        elif k == 0:
            changes = _decode_1d_row(r, columns)
        else:
            changes = _decode_2d_row(r, ref, columns)
        out.append(_changes_to_bits(changes, columns))
        ref = changes if changes else [columns, columns]
        if not ref or ref[-1] != columns:
            ref = ref + [columns]
        ref = ref + [columns]
    if rows is not None and len(out) != rows:
        raise ValueError(f"CCITT decoded {len(out)} rows, expected {rows}")
    if not out:
        return np.zeros((0, columns), dtype=np.uint8)
    return np.stack(out)


# ---------------------------------------------------------------------------
# Encoders (fixture writers — G4 for TIFF comp 4 / PDF K<0, MH rows for
# TIFF comp 2 / PDF K=0, G3-2D for TIFF comp 3 / PDF K>0)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: str) -> None:
        for ch in code:
            self.acc = (self.acc << 1) | (ch == "1")
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nacc = 0

    def align(self) -> None:
        while self.nacc:
            self.write("0")

    def bytes(self) -> bytes:
        w = _BitWriter.__new__(_BitWriter)
        out = bytearray(self.out)
        if self.nacc:
            out.append(self.acc << (8 - self.nacc))
        return bytes(out)


def _emit_run(w: _BitWriter, run: int, color: int) -> None:
    """One run of `color` as zero or more makeup codes + a terminating
    code (standard makeups to 1728, shared extended makeups to 2560)."""
    term = _BLACK_TERM if color else _WHITE_TERM
    makeup = _BLACK_MAKEUP if color else _WHITE_MAKEUP
    while run >= 64:
        if run > 1728:
            best = max(m for m in _EXT_MAKEUP if m <= min(run, 2560))
            w.write(_EXT_MAKEUP[best])
        else:
            best = max(m for m in makeup if m <= run)
            w.write(makeup[best])
        run -= best
    w.write(term[run])


def _row_changes(row: np.ndarray) -> list[int]:
    flips = np.flatnonzero(np.diff(np.concatenate(([0], row.astype(np.int8))))).tolist()
    return [int(x) for x in flips]


def _encode_1d_row(w: _BitWriter, row: np.ndarray) -> None:
    columns = len(row)
    changes = _row_changes(row) + [columns]
    pos = 0
    color = 0
    for c in changes:
        _emit_run(w, c - pos, color)
        pos = c
        color ^= 1
    if pos < columns:
        _emit_run(w, columns - pos, color)


def _encode_2d_row(w: _BitWriter, row: np.ndarray, ref: list[int]) -> list[int]:
    columns = len(row)
    cur = _row_changes(row)
    a0 = -1
    color = 0
    ci = 0
    while a0 < columns:
        # a1: next change in cur > a0 (flip out of current color)
        while ci < len(cur) and (cur[ci] <= a0 or (ci & 1) != color):
            ci += 1
        a1 = cur[ci] if ci < len(cur) else columns
        a2 = cur[ci + 1] if ci + 1 < len(cur) else columns
        # b1/b2 from ref with the same parity rule as the decoder
        i = 0
        n = len(ref)
        while i < n and ref[i] <= a0:
            i += 1
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < n else columns
        b2 = ref[i + 1] if i + 1 < n else columns

        if b2 < a1:
            w.write(_MODE_PASS)
            a0 = b2
            continue
        d = a1 - b1
        if -3 <= d <= 3:
            w.write(_MODE_V[d])
            a0 = a1
            color ^= 1
        else:
            w.write(_MODE_HORIZ)
            base = max(a0, 0)
            _emit_run(w, a1 - base, color)
            _emit_run(w, a2 - a1, color ^ 1)
            a0 = a2
    return cur


def ccitt_encode_g4(bits: np.ndarray) -> bytes:
    """(rows, columns) {0,1} (1 = black) -> MMR stream + EOFB."""
    h, wcols = bits.shape
    w = _BitWriter()
    ref = [wcols, wcols]
    for y in range(h):
        cur = _encode_2d_row(w, bits[y], ref)
        ref = cur + [wcols, wcols]
    w.write(_EOL)
    w.write(_EOL)
    return w.bytes()


def ccitt_encode_g3_1d(bits: np.ndarray, byte_align: bool = True) -> bytes:
    """(rows, columns) -> MH rows (TIFF compression 2 when
    byte_align=True: every row starts on a byte boundary, no EOLs)."""
    w = _BitWriter()
    for y in range(bits.shape[0]):
        if byte_align:
            w.align()
        _encode_1d_row(w, bits[y])
    return w.bytes()


def ccitt_encode_g3_2d(bits: np.ndarray) -> bytes:
    """(rows, columns) -> G3 mixed-mode stream: EOL + tag bit per row;
    first row 1D, the rest 2D (K>0 with every-row-2D after the first),
    terminated by RTC (6 EOLs)."""
    h, wcols = bits.shape
    w = _BitWriter()
    ref: list[int] = []
    for y in range(h):
        w.write(_EOL)
        if y == 0:
            w.write("1")
            _encode_1d_row(w, bits[y])
            ref = _row_changes(bits[y]) + [wcols, wcols]
        else:
            w.write("0")
            cur = _encode_2d_row(w, bits[y], ref)
            ref = cur + [wcols, wcols]
    for _ in range(6):
        w.write(_EOL)
    return w.bytes()
