"""PDF embedded-text-layer extraction — ISO 32000-1 §9 text objects.

Born-digital PDFs carry their text as content-stream show operators
(Tj / TJ / ' / ") positioned by the text-matrix machinery, not as
pixels: a 100 TB document pipeline wants that text read DIRECTLY,
reserving the render→OCR path for scanned pages. This module is the
extractor twin of the text-page writer in functions/pdf.py
(`encode_pdf` with `str` pages): it runs the full §9.4 text state
machine over the content stream — q/Q/cm CTM stack, BT/ET, Tf, Td/TD/
Tm/T*/TL, Tc/Tw/Tz/Ts, Tj/TJ/'/" — decodes string bytes through the
font machinery (simple-font encodings, /Widths arrays, Identity-H
Type0 CID fonts with /ToUnicode CMaps, §9.10.3 bfchar + both bfrange
layouts), and reconstructs inter-word spacing GEOMETRICALLY from glyph
metrics (the pdftotext problem): a horizontal gap of ≥ 0.6 space
advances between runs on one line becomes round(gap/space) spaces, and
line breaks join with a single separator plus the indent relative to
the page's left text edge.

Rotated text is real data, not an edge: landscape pages are commonly
written under a rotated CTM (`0 1 -1 0 … cm`), and deskewed scans
carry small arbitrary-angle rotations. The machinery therefore
accepts ANY positive-determinant similarity text-rendering matrix
(pure rotation × uniform scale): each run is projected into its
reading frame — u along the text advance direction e_u=(a,b)/s, line
coordinate w along −e_v — so line grouping, ordering, and geometric
space reconstruction work identically at every angle (the horizontal
case reduces exactly to u=x, w=−y). Pages mixing orientations
(rotated marginalia beside a horizontal body) assemble each
orientation group separately, ordered by rotation angle in [0, 2π)
— horizontal body first — and joined by `line_sep`.

Scope (declared, fails loudly outside it — the codec-seam contract):
similarity (unskewed, unmirrored) text matrices only; simple fonts
with standard encodings (codes ≥ 128 via cp1252 for /WinAnsiEncoding
or mac_roman with the Annex D 0xDB=¤ patch for /MacRomanEncoding)
or /ToUnicode; /Encoding /Differences arrays resolve glyph names
through the AGL subset (functions/glyph_names.py), layered over the
base encoding; Type3 fonts extract via their /FontMatrix-scaled
/Widths plus /Differences names (or /ToUnicode) — glyph procedures
are never executed. Identity-V VERTICAL CID fonts extract with
/DW2-metric advances: text flows down e_u=(0,−1)·M, columns order
right-to-left through the same reading-frame machinery (per-glyph
/W2 vertical metrics stay a boundary). Type0 fonts without
/ToUnicode, glyph names outside the AGL subset, and skewed/mirrored
matrices (text or Type3 /FontMatrix) are NotImplementedError. Fonts WITHOUT /Widths use built-in standard-14
metrics: fixed-pitch Courier, plus the proportional Helvetica and
Times families (and their Arial/TimesNewRoman substitution aliases)
through the public Adobe Core14 AFM tables (functions/base14.py) —
ASCII-range glyphs plus NFD composites (accented Latin shares its
base letter's advance in the AFMs); showing a glyph outside that is
the declared loud boundary.
Reference handles PDF text through `hayro` (oar-ocr Cargo.toml:20);
this is the from-scratch vectorless twin.
"""

from __future__ import annotations

import math
import re
import unicodedata

from .codec_guard import loud_decode
from .glyph_names import glyph_to_unicode
from .pdf import (
    PdfDocument,
    _apply_stream_filters,
    _parse_value,
    _skip_ws,
    _Name,
)

__all__ = [
    "page_text",
    "decode_pdf_text",
    "page_annotations",
    "decode_pdf_annotations",
]

_OP_RE = re.compile(rb"[^\x00\t\n\x0c\r \[\]<>(){}/%]+")
_WSB = b"\x00\t\n\x0c\r "

_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mult(m1, m2):
    """Row-vector composition: apply m1, then m2."""
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _trans(tx, ty):
    return (1.0, 0.0, 0.0, 1.0, float(tx), float(ty))


# ---------------------------------------------------------------------------
# fonts
# ---------------------------------------------------------------------------

_FIXED_PITCH_BASE14 = re.compile(r"(?:^|\+)Courier")

# standard base encodings → python byte codecs (Annex D). PDF's
# MacRomanEncoding predates Mac OS 8.5: code 0xDB is /currency (¤),
# where python's mac_roman follows modern Apple and yields €.
_BASE_ENC_CODECS = {"WinAnsiEncoding": "cp1252", "MacRomanEncoding": "mac_roman"}


def _decode_high(code: int, codec: str, strict: bool) -> str | None:
    """One byte code ≥ 0 → unicode char under a standard base
    encoding codec; applies the Annex D 0xDB=¤ patch for mac_roman.
    strict=False returns None instead of raising on undefined codes
    (the width-lookup path, where the table miss is the loud error)."""
    if codec == "mac_roman" and code == 0xDB:
        return "¤"
    try:
        return bytes([code]).decode(codec, errors="strict")
    except UnicodeDecodeError:
        if strict:
            raise ValueError(
                f"code {code} undefined in the font's base encoding"
            ) from None
        return None


class _Font:
    """Resolved font attributes for extraction: code size, glyph
    widths (glyph units, /1000 em), and the code→unicode map.
    `diff_names` carries /Differences glyph names (code → name,
    resolved lazily through the AGL subset so only SHOWN codes must
    be mappable); `names_only` (Type3) forbids falling back to a
    byte encoding — every shown code needs a name or /ToUnicode."""

    def __init__(self, two_byte, widths, default_w, tounicode, codec,
                 diff_names=None, names_only=False, char_widths=None,
                 vertical=False, w1_default=-1000.0):
        self.two_byte = two_byte
        self.widths = widths  # dict[int, float] | None
        self.default_w = default_w
        self.tounicode = tounicode  # dict[int, str] | None
        # vertical writing mode (Identity-V): glyphs advance by the
        # vertical displacement w1 (/DW2[1], default -1000 = one em
        # down); /W2 per-glyph vertical metrics are a declared
        # boundary at load time
        self.vertical = vertical
        self.w1_default = w1_default
        # byte codec for codes >= 128 under a standard base encoding:
        # "cp1252" (/WinAnsiEncoding) or "mac_roman"
        # (/MacRomanEncoding, with the 0xDB currency patch applied by
        # _decode_high below), else None
        self.codec = codec
        self.diff_names = diff_names  # dict[int, str] | None
        self.names_only = names_only
        # built-in standard-14 AFM metrics (char → units), consulted
        # lazily so only SHOWN glyphs must be inside the table
        self.char_widths = char_widths  # dict[str, float] | None

    def width(self, code: int) -> float:
        if self.widths is not None and code in self.widths:
            return self.widths[code]
        if self.char_widths is not None:
            nm = self.diff_names.get(code) if self.diff_names else None
            if nm is not None:
                try:
                    ch = glyph_to_unicode(nm)
                except KeyError as e:
                    raise NotImplementedError(
                        f"/Differences glyph name /{nm} outside the"
                        " AGL subset"
                    ) from e
            elif 32 <= code <= 126:
                ch = chr(code)
            elif self.codec:
                ch = _decode_high(code, self.codec, strict=False)
            else:
                ch = None
            w = self.char_widths.get(ch) if ch is not None else None
            if w is None and ch is not None and len(ch) == 1:
                # Core14 composite glyphs (eacute, ntilde, ...) share
                # their base letter's advance in the AFMs — resolve
                # accented Latin through NFD decomposition instead of
                # recalling every accented width
                d = unicodedata.normalize("NFD", ch)
                if len(d) > 1 and all(
                    unicodedata.combining(c) for c in d[1:]
                ):
                    w = self.char_widths.get(d[0])
            if w is None:
                raise NotImplementedError(
                    f"standard-14 metric for code {code} not built in"
                    " (ASCII AFM range + NFD composites only)"
                )
            return w
        return self.default_w

    def space_advance_units(self) -> float:
        if self.vertical:
            return -self.w1_default
        return self.width(32) if not self.two_byte else self.default_w

    def vadvance(self, code: int) -> float:
        """Vertical displacement w1 for one CID, glyph units (negative
        = downward, §9.7.4.3). /DW2 only — /W2 is guarded at load."""
        return self.w1_default

    def codes(self, raw: bytes) -> list[int]:
        if not self.two_byte:
            return list(raw)
        if len(raw) % 2:
            raise ValueError("odd-length string for a 2-byte CID font")
        return [
            (raw[i] << 8) | raw[i + 1] for i in range(0, len(raw), 2)
        ]

    def text(self, codes: list[int]) -> str:
        if self.tounicode is not None:
            out = []
            for c in codes:
                u = self.tounicode.get(c)
                if u is None:
                    raise ValueError(
                        f"code {c} missing from the font's /ToUnicode CMap"
                    )
                out.append(u)
            return "".join(out)
        if self.two_byte:
            raise NotImplementedError(
                "Type0 font without /ToUnicode not supported"
            )
        out = []
        for c in codes:
            nm = self.diff_names.get(c) if self.diff_names else None
            if nm is not None:
                try:
                    out.append(glyph_to_unicode(nm))
                except KeyError as e:
                    raise NotImplementedError(
                        f"/Differences glyph name /{nm} outside the AGL"
                        " subset"
                    ) from e
            elif self.names_only:
                raise ValueError(
                    f"Type3 code {c} has no /Differences name or"
                    " /ToUnicode entry"
                )
            elif self.codec:
                out.append(_decode_high(c, self.codec, strict=True))
            elif c >= 128:
                raise NotImplementedError(
                    "simple-font codes >= 128 without /WinAnsiEncoding,"
                    " /MacRomanEncoding,"
                    " /Differences, or /ToUnicode not supported"
                )
            else:
                out.append(chr(c))
        return "".join(out)


def _u16_str(hexdigits: bytes) -> str:
    return bytes.fromhex(hexdigits.decode("ascii")).decode("utf-16-be")


def _parse_tounicode(raw: bytes) -> dict[int, str]:
    """ToUnicode CMap stream → code→unicode map. Handles §9.10.3
    bfchar sections and bfrange in both the increment-destination and
    bracketed-array forms."""
    out: dict[int, str] = {}
    for sect in re.finditer(rb"beginbfchar(.*?)endbfchar", raw, re.S):
        for m in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", sect.group(1)
        ):
            out[int(m.group(1), 16)] = _u16_str(m.group(2))
    pair = re.compile(rb"\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*")
    single = re.compile(rb"<([0-9A-Fa-f]+)>\s*")
    for sect in re.finditer(rb"beginbfrange(.*?)endbfrange", raw, re.S):
        body, pos = sect.group(1), 0
        while True:
            m = pair.match(body, pos)
            if not m:
                break
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            pos = m.end()
            if hi < lo:
                raise ValueError("bfrange high code below low code")
            if pos < len(body) and body[pos : pos + 1] == b"[":
                pos += 1
                dsts = []
                while True:
                    pos = _skip_ws(body, pos)
                    if pos < len(body) and body[pos : pos + 1] == b"]":
                        pos += 1
                        break
                    dm = single.match(body, pos)
                    if not dm:
                        raise ValueError("malformed bfrange array entry")
                    dsts.append(_u16_str(dm.group(1)))
                    pos = dm.end()
                if len(dsts) != hi - lo + 1:
                    raise ValueError(
                        "bfrange array length does not match code range"
                    )
                for i, d in enumerate(dsts):
                    out[lo + i] = d
            else:
                dm = single.match(body, pos)
                if not dm:
                    raise ValueError("malformed bfrange destination")
                pos = dm.end()
                base = _u16_str(dm.group(1))
                # increment applies to the LAST UTF-16 code unit (§9.10.3)
                head, last = base[:-1], ord(base[-1])
                for i in range(hi - lo + 1):
                    out[lo + i] = head + chr(last + i)
    return out


def _parse_differences(doc: PdfDocument, arr) -> dict[int, str]:
    """§9.6.6.3 /Differences array → code → glyph-name map: each
    number restarts the code counter, each name takes the next code."""
    arr = doc.resolve(arr)
    if not isinstance(arr, list):
        raise ValueError("/Differences is not an array")
    names: dict[int, str] = {}
    code = None
    for el in arr:
        el = doc.resolve(el)
        if isinstance(el, bool):
            raise ValueError("/Differences entry is not a number or name")
        if isinstance(el, (int, float)):
            code = int(el)
            if not 0 <= code <= 255:
                raise ValueError("/Differences code outside 0..255")
        elif isinstance(el, _Name):
            if code is None:
                raise ValueError("/Differences name before any code")
            if code > 255:
                raise ValueError("/Differences run past code 255")
            names[code] = str(el)
            code += 1
        else:
            raise ValueError("/Differences entry is not a number or name")
    return names


def _load_font(doc: PdfDocument, fdict) -> _Font:
    fdict = doc.resolve(fdict)
    if isinstance(fdict, tuple):
        fdict = fdict[0]
    sub = str(doc.resolve(fdict.get("Subtype", "")))
    tounicode = None
    if "ToUnicode" in fdict:
        obj = doc.resolve(fdict["ToUnicode"])
        if not (isinstance(obj, tuple) and len(obj) == 2):
            raise ValueError("/ToUnicode is not a stream")
        raw = _apply_stream_filters(doc._resolved_filter_dict(obj[0]), obj[1])
        tounicode = _parse_tounicode(raw)

    if sub == "Type0":
        enc = doc.resolve(fdict.get("Encoding"))
        if str(enc) not in ("Identity-H", "Identity-V"):
            raise NotImplementedError(
                f"Type0 /Encoding {enc} not supported"
                " (Identity-H/Identity-V only)"
            )
        vertical = str(enc) == "Identity-V"
        desc = doc.resolve(fdict.get("DescendantFonts"))
        if not desc:
            raise ValueError("Type0 font without /DescendantFonts")
        d0 = doc.resolve(desc[0])
        if isinstance(d0, tuple):
            d0 = d0[0]
        default_w = float(doc.resolve(d0.get("DW", 1000)))
        widths: dict[int, float] = {}
        warr = doc.resolve(d0.get("W"))
        if warr:
            i = 0
            warr = [doc.resolve(x) for x in warr]
            while i < len(warr):
                c = int(warr[i])
                nxt = doc.resolve(warr[i + 1])
                if isinstance(nxt, list):
                    for j, wv in enumerate(nxt):
                        widths[c + j] = float(doc.resolve(wv))
                    i += 2
                else:
                    c2, wv = int(nxt), float(doc.resolve(warr[i + 2]))
                    for code in range(c, c2 + 1):
                        widths[code] = wv
                    i += 3
        w1_default = -1000.0
        if vertical:
            if "W2" in d0:
                raise NotImplementedError(
                    "per-glyph /W2 vertical metrics not supported"
                    " (/DW2 only)"
                )
            dw2 = doc.resolve(d0.get("DW2", [880, -1000]))
            if not isinstance(dw2, list) or len(dw2) != 2:
                raise ValueError("/DW2 is not a 2-number array")
            w1_default = float(doc.resolve(dw2[1]))
            if w1_default >= 0:
                raise NotImplementedError(
                    "non-downward /DW2 vertical advance not supported"
                )
        return _Font(
            True, widths or None, default_w, tounicode, False,
            vertical=vertical, w1_default=w1_default,
        )

    if sub == "Type3":
        # §9.6.5: widths live in GLYPH space, carried to text space by
        # /FontMatrix — normalize into the /1000-em convention the
        # show machinery divides by. Glyph procedures are never run;
        # text comes from /ToUnicode or the /Encoding /Differences
        # names (required for Type3), so every shown code must have
        # one.
        fm = doc.resolve(fdict.get("FontMatrix"))
        if not isinstance(fm, list) or len(fm) != 6:
            raise ValueError("Type3 font without a valid /FontMatrix")
        fm = [float(doc.resolve(x)) for x in fm]
        if abs(fm[1]) > 1e-12 or abs(fm[2]) > 1e-12:
            raise NotImplementedError(
                "skewed/rotated Type3 /FontMatrix not supported"
            )
        if fm[0] <= 0:
            raise NotImplementedError(
                "mirrored/degenerate Type3 /FontMatrix not supported"
            )
        if "Widths" not in fdict or "FirstChar" not in fdict:
            raise ValueError("Type3 font missing /Widths or /FirstChar")
        scale = fm[0] * 1000.0
        first = int(doc.resolve(fdict["FirstChar"]))
        warr = doc.resolve(fdict["Widths"])
        widths = {
            first + i: float(doc.resolve(w)) * scale
            for i, w in enumerate(warr)
        }
        enc = doc.resolve(fdict.get("Encoding"))
        diff_names = None
        if isinstance(enc, dict) and "Differences" in enc:
            diff_names = _parse_differences(doc, enc["Differences"])
        if tounicode is None and not diff_names:
            raise ValueError(
                "Type3 font without /ToUnicode or /Differences names"
            )
        return _Font(
            False, widths, 0.0, tounicode, False,
            diff_names=diff_names, names_only=True,
        )

    # simple font (Type1 / TrueType)
    enc = fdict.get("Encoding")
    codec = None
    diff_names = None
    if enc is not None:
        enc = doc.resolve(enc)
        if isinstance(enc, dict):
            if "Differences" in enc:
                diff_names = _parse_differences(doc, enc["Differences"])
            enc = enc.get("BaseEncoding")
            if enc is not None:
                enc = doc.resolve(enc)
        if enc is not None and not isinstance(enc, _Name):
            raise ValueError("font /Encoding is not a name or dict")
        codec = _BASE_ENC_CODECS.get(str(enc))
    widths = None
    default_w = None
    if "Widths" in fdict:
        first = int(doc.resolve(fdict.get("FirstChar", 0)))
        warr = doc.resolve(fdict["Widths"])
        widths = {
            first + i: float(doc.resolve(w)) for i, w in enumerate(warr)
        }
        fd = doc.resolve(fdict.get("FontDescriptor", {}))
        if isinstance(fd, tuple):
            fd = fd[0]
        default_w = float(doc.resolve(fd.get("MissingWidth", 0)))
    else:
        base = str(doc.resolve(fdict.get("BaseFont", "")))
        if _FIXED_PITCH_BASE14.search(base):
            default_w = 600.0
        else:
            from .base14 import char_widths as _base14_widths

            cw = _base14_widths(base)
            if cw is None:
                raise NotImplementedError(
                    f"base-14 metrics for {base or '<unnamed>'} not"
                    " built in (Courier/Helvetica/Times families only"
                    " without /Widths)"
                )
            return _Font(
                False, None, None, tounicode, codec,
                diff_names=diff_names, char_widths=cw,
            )
    return _Font(
        False, widths, default_w, tounicode, codec, diff_names=diff_names
    )


# ---------------------------------------------------------------------------
# content-stream scanning
# ---------------------------------------------------------------------------

def _skip_inline_image(data: bytes, pos: int) -> int:
    """Position just past the EI of a BI..ID..EI inline image (binary
    data would derail the token scanner)."""
    j = data.find(b"ID", pos)
    if j < 0:
        raise ValueError("inline image missing ID")
    j += 3
    while True:
        j = data.find(b"EI", j)
        if j < 0:
            raise ValueError("inline image missing EI")
        if data[j - 1] in _WSB and (
            j + 2 >= len(data) or data[j + 2] in _WSB
        ):
            return j + 2
        j += 2


def _tokens(data: bytes):
    """Yield ("val", value) operands and ("op", name-bytes) operators
    over a content stream, skipping inline-image binary data."""
    pos = 0
    n = len(data)
    while True:
        pos = _skip_ws(data, pos)
        if pos >= n:
            return
        c = data[pos]
        if c in b"(<[/" or c in b"+-." or 0x30 <= c <= 0x39:
            v, pos = _parse_value(data, pos)
            yield ("val", v)
            continue
        m = _OP_RE.match(data, pos)
        if not m:
            raise ValueError(
                f"cannot scan content stream at offset {pos}:"
                f" {data[pos:pos+20]!r}"
            )
        op = m.group(0)
        pos = m.end()
        if op == b"BI":
            pos = _skip_inline_image(data, pos)
            continue
        yield ("op", op)


class _Run:
    """One show-operator run in its READING frame: `u0`/`u1` along the
    text advance direction e_u, `w` along −e_v (larger w = later
    line), `okey` the 9-dp-quantized e_u grouping orientation. For
    horizontal text u=x, w=−y — the classic pdftotext frame."""

    __slots__ = ("w", "u0", "u1", "text", "space_adv", "okey")

    def __init__(self, w, u0, u1, text, space_adv, okey):
        self.w, self.u0, self.u1 = w, u0, u1
        self.text, self.space_adv = text, space_adv
        self.okey = okey


def _page_runs(doc: PdfDocument, page: dict) -> list[_Run]:
    content = doc.resolve(page.get("Contents"))
    chunks = []
    for c in content if isinstance(content, list) else [content]:
        c = doc.resolve(c)
        if isinstance(c, tuple) and len(c) == 2:
            chunks.append(
                _apply_stream_filters(doc._resolved_filter_dict(c[0]), c[1])
            )
    if not chunks:
        return []
    data = b"\n".join(chunks)
    res = doc.resolve(page.get("Resources", {}))
    if not isinstance(res, dict):
        res = {}
    font_cache: dict[int, _Font] = {}

    ctm = _ID
    gstack: list = []
    tm = tlm = None
    font: _Font | None = None
    tfs = 0.0
    tc = tw = ts = 0.0
    tz = 100.0
    tl = 0.0
    runs: list[_Run] = []
    operands: list = []

    def num(v) -> float:
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise ValueError(f"numeric operand expected, got {v!r}")
        return float(v)

    def do_td(tx, ty):
        nonlocal tm, tlm
        if tlm is None:
            raise ValueError("Td outside BT/ET")
        tlm = _mult(_trans(tx, ty), tlm)
        tm = tlm

    def show(s):
        nonlocal tm
        if not isinstance(s, str):
            raise ValueError("show operand is not a string")
        if font is None:
            raise ValueError("text show without a Tf font selection")
        if tm is None:
            raise ValueError("text show outside BT/ET")
        raw = s.encode("latin-1")
        codes = font.codes(raw)
        if not codes:
            return
        rm = _mult(tm, ctm)
        a, b, c, d = rm[0], rm[1], rm[2], rm[3]
        # Accept any positive-determinant SIMILARITY (rotation ×
        # uniform scale): (a b; c d) = s·(cosθ sinθ; −sinθ cosθ).
        # Landscape pages and deskewed scans land here; shears /
        # anisotropic scales / mirrors stay declared boundaries.
        scale = math.hypot(a, b)
        if a * d - b * c <= 1e-12 or scale <= 1e-12:
            raise NotImplementedError("mirrored/degenerate text matrices")
        tol = 1e-9 * max(1.0, scale)
        if abs(a - d) > tol or abs(b + c) > tol:
            raise NotImplementedError(
                "skewed/anisotropic text matrices not supported"
            )
        if font.vertical:
            # vertical writing (Identity-V, §9.4.4): text flows DOWN —
            # reading direction e_u is text-space (0,−1) through rm;
            # e_v then points LEFT of the glyphs, so ascending w =
            # right-to-left column order (the CJK convention). Glyphs
            # advance by ty = w1/1000·Tfs + Tc (Th does not apply).
            ux, uy = -c / scale, -d / scale
        else:
            ux, uy = a / scale, b / scale  # e_u; e_v = (−uy, ux)
        text = font.text(codes)
        tx_total = 0.0  # advance along e_u, text-space units
        if font.vertical:
            ty_total = 0.0
            for code in codes:
                ty_total += font.vadvance(code) / 1000.0 * tfs + tc
            tx_total = -ty_total
        else:
            for code in codes:
                adv = font.width(code) / 1000.0 * tfs + tc
                if code == 32 and not font.two_byte:
                    adv += tw
                tx_total += adv * tz / 100.0
        px = rm[4] + ts * c  # rise moves along text-space up: (0,ts)·M
        py = rm[5] + ts * d
        u0 = px * ux + py * uy
        w = px * uy - py * ux  # −p·e_v: larger w = later line
        if font.vertical:
            space = (
                font.space_advance_units() / 1000.0 * tfs + tc
            ) * scale
        else:
            space = (
                font.space_advance_units() / 1000.0 * tfs + tc + tw
            ) * tz / 100.0 * scale
        okey = (round(ux, 9), round(uy, 9))
        runs.append(
            _Run(w, u0, u0 + tx_total * scale, text, space, okey)
        )
        if font.vertical:
            tm = _mult(_trans(0.0, ty_total), tm)
        else:
            tm = _mult(_trans(tx_total, 0.0), tm)

    def run(data: bytes, res: dict, parent_res: dict | None) -> None:
        """Execute one content stream against resource dict `res`
        (falling back to `parent_res` — the inherited-resources form
        layout). Recurses into /Form XObjects on Do with the §8.10.1
        implicit gstate save/restore and CTM = /Matrix × CTM."""
        nonlocal ctm, tm, tlm, font, tfs, tc, tw, tz, tl, ts

        def lookup(category: str, name: str):
            for r in (res, parent_res):
                if r is None:
                    continue
                cat = doc.resolve(r.get(category, {}))
                if isinstance(cat, dict) and name in cat:
                    return cat[name]
            raise ValueError(f"{category} {name} missing from /Resources")

        for kind, v in _tokens(data):
            if kind == "val":
                operands.append(v)
                continue
            op = v
            if op == b"q":
                gstack.append(ctm)
            elif op == b"Q":
                if gstack:
                    ctm = gstack.pop()
            elif op == b"cm":
                ctm = _mult(tuple(num(x) for x in operands[-6:]), ctm)
            elif op == b"BT":
                tm = tlm = _ID
            elif op == b"ET":
                tm = tlm = None
            elif op == b"Do":
                if not operands or not isinstance(operands[-1], _Name):
                    raise ValueError("Do needs an XObject name")
                obj = doc.resolve(lookup("XObject", str(operands[-1])))
                if isinstance(obj, tuple) and len(obj) == 2:
                    d, raw = obj
                    if str(doc.resolve(d.get("Subtype", ""))) == "Form":
                        body = _apply_stream_filters(
                            doc._resolved_filter_dict(d), raw
                        )
                        mat = doc.resolve(d.get("Matrix"))
                        saved = (ctm, font, tfs, tc, tw, tz, tl, ts,
                                 len(gstack))
                        if mat is not None:
                            ctm = _mult(
                                tuple(float(doc.resolve(x)) for x in mat),
                                ctm,
                            )
                        fres = doc.resolve(d.get("Resources"))
                        operands.clear()
                        run(
                            body,
                            fres if isinstance(fres, dict) else {},
                            res,
                        )
                        (ctm, font, tfs, tc, tw, tz, tl, ts, depth) = saved
                        del gstack[depth:]
                    # image XObjects carry no text: ignore
            elif op == b"Tf":
                if len(operands) < 2 or not isinstance(operands[-2], _Name):
                    raise ValueError("Tf needs a font name and a size")
                name = str(operands[-2])
                fobj = lookup("Font", name)
                key = id(doc.resolve(fobj))
                if key not in font_cache:
                    font_cache[key] = _load_font(doc, fobj)
                font = font_cache[key]
                tfs = num(operands[-1])
            elif op == b"Td":
                do_td(num(operands[-2]), num(operands[-1]))
            elif op == b"TD":
                tl = -num(operands[-1])
                do_td(num(operands[-2]), num(operands[-1]))
            elif op == b"Tm":
                if tlm is None:
                    raise ValueError("Tm outside BT/ET")
                tm = tlm = tuple(num(x) for x in operands[-6:])
            elif op == b"T*":
                do_td(0.0, -tl)
            elif op == b"TL":
                tl = num(operands[-1])
            elif op == b"Tc":
                tc = num(operands[-1])
            elif op == b"Tw":
                tw = num(operands[-1])
            elif op == b"Tz":
                tz = num(operands[-1])
            elif op == b"Ts":
                ts = num(operands[-1])
            elif op == b"Tj":
                show(operands[-1])
            elif op == b"'":
                do_td(0.0, -tl)
                show(operands[-1])
            elif op == b'"':
                tw = num(operands[-3])
                tc = num(operands[-2])
                do_td(0.0, -tl)
                show(operands[-1])
            elif op == b"TJ":
                arr = operands[-1]
                if not isinstance(arr, list):
                    raise ValueError("TJ operand is not an array")
                for el in arr:
                    if isinstance(el, str):
                        show(el)
                    elif isinstance(el, (int, float)):
                        if tm is None:
                            raise ValueError("TJ outside BT/ET")
                        if font is not None and font.vertical:
                            # §9.4.3: vertical kerns displace ty
                            # (horizontal scaling Th does not apply)
                            tm = _mult(
                                _trans(0.0, -float(el) / 1000.0 * tfs),
                                tm,
                            )
                        else:
                            tm = _mult(
                                _trans(
                                    -float(el) / 1000.0 * tfs * tz / 100.0,
                                    0.0,
                                ),
                                tm,
                            )
                    else:
                        raise ValueError(f"TJ element {el!r} not string/number")
            # every other operator (paths, color, XObjects, marked
            # content) carries no text; its operands just clear below
            operands.clear()
    run(data, res, None)
    return runs


# ---------------------------------------------------------------------------
# line assembly
# ---------------------------------------------------------------------------

def _spaces(gap: float, space_adv: float) -> int:
    if space_adv <= 0 or gap < 0.6 * space_adv:
        return 0
    return int(gap / space_adv + 0.5)


def _assemble_runs(runs: list[_Run], line_sep: str) -> str:
    """Line assembly for one orientation group, in its reading frame:
    runs sort into lines by ascending w (tolerance 1 pt — for
    horizontal text w=−y, i.e. descending device y); within a line,
    gaps of >= 0.6 space advances along e_u become round(gap/space)
    spaces; a line break contributes `line_sep` plus the indent
    relative to the group's leftmost line start (the wrap convention
    of the writer twin: one consumed space, extra spacing kept as
    indent)."""
    runs.sort(key=lambda r: (r.w, r.u0))
    lines: list[list[_Run]] = []
    for r in runs:
        if lines and abs(lines[-1][0].w - r.w) <= 1.0:
            lines[-1].append(r)
        else:
            lines.append([r])
    for line in lines:
        line.sort(key=lambda r: r.u0)  # rise (Ts) can break u order
    margin = min(line[0].u0 for line in lines)
    parts: list[str] = []
    for li, line in enumerate(lines):
        if li:
            parts.append(line_sep)
        first = line[0]
        parts.append(" " * _spaces(first.u0 - margin, first.space_adv))
        parts.append(first.text)
        prev_end = first.u1
        for r in line[1:]:
            parts.append(" " * _spaces(r.u0 - prev_end, r.space_adv))
            parts.append(r.text)
            prev_end = max(prev_end, r.u1)
    return "".join(parts)


@loud_decode("PDF text layer")
def page_text(
    doc: PdfDocument, page: dict, line_sep: str = " "
) -> str | None:
    """Text of one page dict (from doc.pages()), or None when the page
    draws no text (an image-only page). Runs group by orientation
    (9-dp-quantized text advance direction); groups assemble
    independently in their own reading frames (`_assemble_runs`) and
    join in ascending rotation-angle order in [0, 2π) — the horizontal
    body first, then rotated marginalia — separated by `line_sep`."""
    runs = _page_runs(doc, page)
    if not runs:
        return None
    groups: dict[tuple, list[_Run]] = {}
    for r in runs:
        groups.setdefault(r.okey, []).append(r)

    def angle(okey: tuple) -> float:
        return math.atan2(okey[1], okey[0]) % (2.0 * math.pi)

    return line_sep.join(
        _assemble_runs(groups[k], line_sep)
        for k in sorted(groups, key=angle)
    )


@loud_decode("PDF text layer")
def decode_pdf_text(data: bytes, line_sep: str = " ") -> list[str | None]:
    """PDF bytes → per-page extracted text (None for image-only
    pages), document page order."""
    doc = PdfDocument(data)
    return [page_text(doc, p, line_sep) for p in doc.pages()]


# ---------------------------------------------------------------------------
# annotations — text living OUTSIDE content streams (the forms layout)
# ---------------------------------------------------------------------------

@loud_decode("PDF annotations")
def page_annotations(doc: PdfDocument, page: dict) -> list[dict]:
    """Extract the text carried by a page's /Annots (12.5): FreeText
    notes (/Contents) and Widget text fields (/FT /Tx — AcroForm
    entries with their /T name and /V value). Other subtypes (links,
    popups, highlights without text payloads) are ignored. Text
    strings decode per 7.9.2.2 (UTF-16BE/UTF-8 BOM or
    PDFDocEncoding); encrypted documents arrive decrypted by the
    object loader."""
    from .pdf import _decode_text_string

    out: list[dict] = []
    annots = doc.resolve(page.get("Annots"))
    if not annots:
        return out
    for ref in annots:
        a = doc.resolve(ref)
        if isinstance(a, tuple):
            a = a[0]
        if not isinstance(a, dict):
            raise ValueError("PDF /Annots entry is not a dictionary")
        sub = str(doc.resolve(a.get("Subtype", "")))
        rect = [
            float(doc.resolve(v)) for v in doc.resolve(a.get("Rect", []))
        ]
        if sub == "FreeText":
            t = doc.resolve(a.get("Contents"))
            if isinstance(t, str):
                out.append(
                    {
                        "subtype": "FreeText",
                        "text": _decode_text_string(t),
                        "rect": rect,
                    }
                )
        elif sub == "Widget":
            if str(doc.resolve(a.get("FT", ""))) != "Tx":
                continue  # non-text fields carry no extractable text
            v = doc.resolve(a.get("V"))
            if isinstance(v, str):
                name = doc.resolve(a.get("T"))
                out.append(
                    {
                        "subtype": "Widget",
                        "name": _decode_text_string(name)
                        if isinstance(name, str) else None,
                        "text": _decode_text_string(v),
                        "rect": rect,
                    }
                )
    return out


@loud_decode("PDF annotations")
def decode_pdf_annotations(data: bytes) -> list[list[dict]]:
    """PDF bytes → per-page annotation text entries, document page
    order."""
    doc = PdfDocument(data)
    return [page_annotations(doc, p) for p in doc.pages()]
