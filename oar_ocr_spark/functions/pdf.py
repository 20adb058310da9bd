"""Pure-python PDF container codec + Spark page-unpack operators.

The reference ships PDF input via the `hayro` rasterizer dependency
(/root/reference/Cargo.toml:20, examples only): a PDF's pages become
images that feed the OCR pipeline. The north-rule names "PDF/layout
parse" as part of main-content extraction, so this module implements a
real (minimal, declared-subset) PDF 1.4 writer and parser — no PDF
library exists in this environment — plus the distributed unpack shape:

  container table (pdf_ref, payload:binary)
    → one Arrow-batched mapInPandas parse          (pdf_media_store_df)
    → page store (media_ref, payload:PNG bytes)
    → the existing extract_spans(media_store=...) byte path.

Unpack-once-then-columnar is the lakehouse shape for 100 TB: the PDF
parse runs exactly once per container, pages land in an Iceberg-style
side table keyed by media_ref, and every downstream read is a plain
hash join + PNG decode. (A fused variant — parsing the PDF inside the
detect UDF — would save the intermediate write but re-parse the whole
container for every page-level retry; at corpus scale the materialized
page store wins.)

Writer scope: 8-bit greyscale pages (the engine's page type) embedded
as /DeviceGray image XObjects — FlateDecode (lossless, default),
DCTDecode baseline JPEG (the scanned-PDF layout), CCITTFaxDecode
Group 4 or JBIG2Decode (the born-scanned bilevel layouts) — one per
page, plus an
/Info dict whose /Title carries the newline-joined page media_refs so
the container is self-describing. Everything is real PDF syntax: object
table, xref, trailer, startxref.

Parser scope (declared, fails loudly outside it): classic xref tables
(incl. /Prev chains and 'f' deletion masking), PDF 1.5+ cross-
reference STREAMS (/Type /XRef, any /W widths, /Index subsections,
FlateDecode with PNG predictors 10–15 via the shared png.py
unfilter), compressed object streams (/Type /ObjStm), hybrid-
reference files (/XRefStm in a classic trailer), indirect /Length,
nested /Pages trees, literal + hex strings, comments, /DeviceGray and
/DeviceRGB FlateDecode or uncompressed image XObjects, and JPXDecode
(JPEG 2000) images via the in-house lossless J2K codec
(functions/jp2.py — JP2 container or raw codestream); PNG (10-15) and TIFF
(2) predictors both decode;
DCTDecode images — the layout real scanned PDFs use — decode through
the engine's own baseline JPEG codec (functions/jpeg.py, including
4:2:0-subsampled camera JPEGs); CCITTFaxDecode images (K<0/0/>0,
Columns/Rows/BlackIs1/EncodedByteAlign) through the T.4/T.6 codec in
functions/ccitt.py; JBIG2Decode images (embedded T.88 generic-region
streams incl. /JBIG2Globals) through functions/jbig2.py.

Encrypted PDFs (standard security handler, §7.6): files encrypted
with an EMPTY user (or owner) password — the overwhelmingly common
"encrypted but not password-protected" case — decrypt transparently
for RC4 (40–128 bit, /V 1/2/4), AES-128-CBC (/V 4 /AESV2) and
AES-256-CBC (/V 5 /AESV3, revisions 5 and 6 — the PDF 2.0 handler,
ISO 32000-2 §7.6.4, including the iterated hash 2.B and the /Perms
integrity check), primitives in functions/pdf_crypt.py.
Password-protected files and non-/Standard handlers raise
NotImplementedError at parse time, BEFORE any stream decode, so the
failure is the declared loud kind. The writer's ``encrypt=`` flag
produces all four supported layouts for roundtrip tests.

The writer emits classic xref by default; ``xref_format="stream"``
writes the PDF 1.5 layout real tools produce — non-stream objects
packed in an /ObjStm, a /Type /XRef stream with /W [1 4 2] rows
Up-predicted (Predictor 12) — so the parser's modern path is
roundtrip-tested against self-produced files as well as hand-built
foreign fixtures.

Determinism: FlateDecode is lossless and the writer emits exact-integer
pages, so container → pages → spans preserves the CLAUDE.md contract
bit-for-bit; the pdf_extract driver query oracles against the same
golden span fixtures as the renderer path.
"""

from __future__ import annotations

import re
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec_guard import loud_decode

__all__ = [
    "encode_pdf",
    "decode_pdf",
    "decode_pdf_refs",
    "pdf_store_df",
    "pdf_media_store_df",
    "pdf_text_store_df",
    "pdf_text_spans_df",
    "pdf_hybrid_store_df",
    "pdf_hybrid_unpack_df",
]


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _pdf_string(s: str) -> bytes:
    """Literal PDF string with ()\\ and newline escaped."""
    out = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    out = out.replace("\n", "\\n").replace("\r", "\\r")
    return b"(" + out.encode("latin-1") + b")"


# --- text-layer page content (born-digital pages) ----------------------

def _pdf_string_raw(b: bytes) -> bytes:
    """Literal PDF string around already-encoded bytes."""
    out = b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    out = out.replace(b"\n", b"\\n").replace(b"\r", b"\\r")
    return b"(" + out + b")"


def _enc_simple(s: str) -> bytes:
    """Text → simple-font code bytes. The writer's simple-font pages
    declare /WinAnsiEncoding whenever a high code appears, so the
    byte encoding is cp1252 (ISO 32000-1 annex D.2); characters
    outside it need the 'cid' text_format."""
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError as e:
        raise ValueError(
            f"text {s!r} has characters outside WinAnsi; use"
            " text_format='cid'"
        ) from e


# All text pages use 12 pt Courier (base-14 fixed pitch: every glyph
# 600/1000 em), so advances are exact decimal arithmetic the extractor
# (functions/pdf_text.py) can reproduce: 7.2 pt per glyph, US-letter
# page, 72 pt margins, 14.4 pt leading.
_TXT_SIZE = 12.0
_TXT_ADV = 7.2
_TXT_X0, _TXT_Y0, _TXT_X1 = 72.0, 720.0, 540.0
_TXT_LEAD = 14.4


def _fmt_num(x: float) -> bytes:
    s = ("%.4f" % x).rstrip("0").rstrip(".")
    return (s or "0").encode("ascii")


def _lcg(state: int) -> int:
    return (state * 1103515245 + 12345) & 0x7FFFFFFF


def _tj_content(text: str) -> bytes:
    """One [ ... ] TJ array: the text split at crc32-seeded points into
    literal- and hex-string chunks separated by small kern numbers
    (|kern| <= 80 milli-em = 0.96 pt at 12 pt — far below the 4.32 pt
    space advance, so the extractor's gap test sees zero spaces)."""
    state = zlib.crc32(b"pdf-tj:" + text.encode("utf-8"))
    chunks, i = [], 0
    while i < len(text):
        state = _lcg(state)
        n = state % 5 + 1
        chunks.append(text[i : i + n])
        i += n
    parts: list[bytes] = []
    for j, c in enumerate(chunks):
        if j:
            state = _lcg(state)
            parts.append(b"%d" % (state % 161 - 80))
        if j % 2:
            parts.append(b"<" + _enc_simple(c).hex().encode("ascii") + b">")
        else:
            parts.append(_pdf_string_raw(_enc_simple(c)))
    return (
        b"BT /F0 12 Tf %s %s Td [" % (_fmt_num(_TXT_X0), _fmt_num(_TXT_Y0))
        + b" ".join(parts)
        + b"] TJ ET"
    )


def _words_content(text: str) -> bytes:
    """Positioned-words layout: spaces are NOT encoded — each word is
    its own show op placed by exact Courier metrics (Tm absolute for
    even words, Td relative for odd), wrapping at the right margin
    (the wrap consumes exactly one inter-word space). The extractor
    reconstructs spacing purely from geometry, the way real text
    extractors (pdftotext) recover born-digital layout."""
    if text != text.strip(" ") or "\n" in text or "\r" in text:
        raise ValueError(
            "text_format='words' needs space-trimmed single-line text"
        )
    ops = [b"BT /F0 12 Tf"]
    x = y = None
    origin = (0.0, 0.0)  # current line-matrix origin (last Td/Tm target)
    widx = 0
    for m in re.finditer(r"( *)([^ ]+)", text):
        k, word = len(m.group(1)), m.group(2)
        if x is None:
            nx, ny = _TXT_X0, _TXT_Y0
        else:
            nx, ny = x + k * _TXT_ADV, y
            if nx + len(word) * _TXT_ADV > _TXT_X1:
                ny -= _TXT_LEAD  # wrap consumes one space
                nx = _TXT_X0 + (k - 1) * _TXT_ADV
        if widx % 2 == 0 or ny != origin[1]:
            ops.append(
                b"1 0 0 1 %s %s Tm" % (_fmt_num(nx), _fmt_num(ny))
            )
        else:
            ops.append(
                b"%s %s Td" % (_fmt_num(nx - origin[0]), _fmt_num(ny - origin[1]))
            )
        origin = (nx, ny)
        ops.append(_pdf_string_raw(_enc_simple(word)) + b" Tj")
        x, y = nx + len(word) * _TXT_ADV, ny
        widx += 1
    ops.append(b"ET")
    return b" ".join(ops)


def _para_content(text: str) -> bytes:
    """Paragraph layout: '\\n'-separated lines drawn with the leading
    machinery real writers emit — TL once, then T* line moves and the
    ' (next-line show) operator on alternating lines. Lines are
    preserved verbatim (no wrapping); the extractor twin reconstructs
    them exactly with line_sep='\\n'. Empty lines draw no glyphs and
    cannot be reconstructed (the pdftotext ambiguity), so they fail
    loudly here."""
    lines = text.split("\n")
    if any(ln == "" for ln in lines):
        raise ValueError(
            "text_format='para' cannot represent empty lines"
        )
    ops = [
        b"BT /F0 12 Tf %s TL %s %s Td"
        % (_fmt_num(_TXT_LEAD), _fmt_num(_TXT_X0), _fmt_num(_TXT_Y0))
    ]
    for i, ln in enumerate(lines):
        s = _pdf_string_raw(_enc_simple(ln))
        if i == 0:
            ops.append(s + b" Tj")
        elif i % 2:
            ops.append(s + b" '")
        else:
            ops.append(b"T* " + s + b" Tj")
    ops.append(b"ET")
    return b" ".join(ops)


def _cid_page(
    text: str, vertical: bool = False
) -> tuple[bytes, bytes, bytes]:
    """(cmap stream raw bytes, /W (+/DW2) entry, content ops) for an
    Identity-H CID text page: unique chars get sequential 2-byte codes,
    the ToUnicode CMap maps them back (bfchar entries for the first
    half, an array-form bfrange for the rest — both §9.10.3 layouts),
    and shows are 2-byte-code hex strings (split into a kerned TJ when
    the crc32 bit says so). `vertical=True` emits the Identity-V
    twin: top-down columns ordered right-to-left, /DW2 metric
    flavors, vertical-sign TJ kerns, and a two-column split variant.
    Extractor twin: pdf_text's vertical reading frame."""
    uniq = sorted(set(text))
    if not uniq or len(uniq) > 0xFFFF:
        raise ValueError("cid text page needs 1..65535 unique characters")
    code_of = {c: i + 1 for i, c in enumerate(uniq)}

    def u16(c: str) -> bytes:
        return b"<" + c.encode("utf-16-be").hex().encode("ascii") + b">"

    n_char = (len(uniq) + 1) // 2
    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS)"
        b" /Supplement 0 >> def",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <ffff>",
        b"endcodespacerange",
        b"%d beginbfchar" % n_char,
    ]
    for i in range(n_char):
        lines.append(b"<%04x> %s" % (i + 1, u16(uniq[i])))
    lines.append(b"endbfchar")
    if n_char < len(uniq):
        lines.append(b"1 beginbfrange")
        dsts = b" ".join(u16(c) for c in uniq[n_char:])
        lines.append(b"<%04x> <%04x> [%s]" % (n_char + 1, len(uniq), dsts))
        lines.append(b"endbfrange")
    lines += [
        b"endcmap",
        b"CMap currentdict /CMap defineresource pop",
        b"end",
        b"end",
    ]
    cmap = b"\n".join(lines)

    h = zlib.crc32(b"pdf-cid:" + text.encode("utf-8"))
    if h & 1:
        wents = b" ".join(b"600" for _ in uniq)
        w_entry = b"/W [1 [%s]]" % wents
    else:
        w_entry = b"/DW 600"

    def hex_of(s: str) -> bytes:
        return (
            b"".join(struct.pack(">H", code_of[c]) for c in s)
            .hex().encode("ascii")
        )

    if vertical:
        # Identity-V vertical layout: columns flow DOWN, ordered
        # right-to-left (the CJK convention the extractor's
        # reading-frame assembly reconstructs). Three /DW2 dict
        # flavors; a crc bit splits two-word pages into two columns
        # (split consumes one space, like the horizontal wrap).
        w_entry += (b"", b" /DW2 [880 -1000]", b" /DW2 [880 -500]")[
            (h >> 2) % 3
        ]
        x0 = 540.0
        if (h >> 4) & 1 and " " in text and "  " not in text \
                and text == text.strip(" "):
            words = text.split(" ")
            k = 1 + (h >> 5) % (len(words) - 1)
            col1, col2 = " ".join(words[:k]), " ".join(words[k:])
            content = (
                b"BT /F0 12 Tf %s 720 Td <%s> Tj"
                b" 1 0 0 1 %s 720 Tm <%s> Tj ET"
                % (_fmt_num(x0), hex_of(col1),
                   _fmt_num(x0 - 40.0), hex_of(col2))
            )
        elif (h >> 6) & 1 and len(text) >= 2:
            # vertical kerned TJ: POSITIVE numbers move DOWN in
            # vertical mode (§9.4.3 "subtracted from the vertical
            # coordinate"), small |kern| stays under the space gate
            cut = (len(text) // 2) * 4
            hexs = hex_of(text)
            content = (
                b"BT /F0 12 Tf %s 720 Td [<%s> 44 <%s>] TJ ET"
                % (_fmt_num(x0), hexs[:cut], hexs[cut:])
            )
        else:
            content = (
                b"BT /F0 12 Tf %s 720 Td <%s> Tj ET"
                % (_fmt_num(x0), hex_of(text))
            )
        return cmap, w_entry, content

    hexs = hex_of(text)
    if h & 2 and len(text) >= 4:
        cut = (len(text) // 2) * 4  # hex digits; 2-byte-code boundary
        show = b"[<%s> -44 <%s>] TJ" % (hexs[:cut], hexs[cut:])
    else:
        show = b"<%s> Tj" % hexs
    content = (
        b"BT /F0 12 Tf %s %s Td " % (_fmt_num(_TXT_X0), _fmt_num(_TXT_Y0))
        + show
        + b" ET"
    )
    return cmap, w_entry, content


def _hex_show(codes: list[int]) -> bytes:
    return (
        b"BT /F0 12 Tf %s %s Td <" % (_fmt_num(_TXT_X0), _fmt_num(_TXT_Y0))
        + bytes(codes).hex().encode("ascii")
        + b"> Tj ET"
    )


def _diff_page(text: str) -> tuple[bytes, bytes]:
    """(font dict body, content ops) for a /Encoding /Differences
    simple-font page — the layout subsetted real fonts emit. A
    crc32-chosen subset of the text's unique characters (sometimes
    all of them, always at least one; always every character cp1252
    cannot encode) is remapped to free byte codes addressed by AGL
    glyph names (algorithmic uniXXXX/uXXXXXX fallback), layered over
    the base encoding; unmapped characters keep their cp1252 bytes.
    The show is one hex string. Extractor twin:
    pdf_text._parse_differences + glyph_names.glyph_to_unicode."""
    from .glyph_names import unicode_to_glyph

    uniq = sorted(set(text))
    if not uniq:
        raise ValueError("diff text page needs at least one character")
    h = zlib.crc32(b"pdf-diff:" + text.encode("utf-8"))
    full = bool(h & 1)
    keep_bytes: dict[str, int] = {}
    remap: list[str] = []
    used: set[int] = set()
    for i, c in enumerate(uniq):
        try:
            b = c.encode("cp1252")[0]
        except UnicodeEncodeError:
            b = None
        if b is not None and not full and not ((h >> (i % 24 + 2)) & 1):
            keep_bytes[c] = b
            used.add(b)
        else:
            remap.append(c)
    if not remap:  # the flavor must exercise at least one /Differences hit
        c = uniq[h % len(uniq)]
        remap.append(c)
        used.discard(keep_bytes.pop(c))
    code_of = dict(keep_bytes)
    diffs: list[bytes] = []
    nxt = 255
    for c in remap:
        while nxt >= 1 and nxt in used:
            nxt -= 1
        if nxt < 1:
            raise ValueError(
                "diff text page ran out of byte codes (too many unique"
                " characters)"
            )
        code_of[c] = nxt
        used.add(nxt)
        diffs.append(b"%d /%s" % (nxt, unicode_to_glyph(c).encode("ascii")))
        nxt -= 1
    base_win = any(b >= 0x80 for b in keep_bytes.values()) or bool(h & 2)
    encdict = b"<< /Type /Encoding"
    if base_win:
        encdict += b" /BaseEncoding /WinAnsiEncoding"
    encdict += b" /Differences [" + b" ".join(diffs) + b"] >>"
    fbody = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier /Encoding "
        + encdict
        + b" >>"
    )
    return fbody, _hex_show([code_of[c] for c in text])


def _type3_page(
    text: str,
) -> tuple[bytes, float, int, list[str], bytes | None, bytes]:
    """(FontMatrix scale as bytes, glyph-space width, FirstChar, glyph
    names in code order, 1-byte ToUnicode CMap raw bytes or None,
    content ops) for a Type3 font page. Unique characters get
    sequential codes from a crc32-chosen FirstChar; widths live in
    GLYPH space under a crc32-chosen /FontMatrix scale (the §9.6.5
    machinery — effective advance is always the 600/1000-em Courier
    metric). Half the pages map codes to text via AGL /Differences
    names, half via a 1-byte /ToUnicode CMap (with opaque gN glyph
    names, proving the extractor never needs the procedures).
    Extractor twin: pdf_text._load_font's Type3 branch."""
    from .glyph_names import unicode_to_glyph

    uniq = sorted(set(text))
    if not uniq:
        raise ValueError("type3 text page needs at least one character")
    h = zlib.crc32(b"pdf-type3:" + text.encode("utf-8"))
    first = (1, 33, 65)[h % 3]
    if first + len(uniq) - 1 > 255:
        first = 1
    if len(uniq) > 255:
        raise ValueError(
            "type3 text page needs <= 255 unique characters"
        )
    scale, width = ((b"0.001", 600.0), (b"0.01", 60.0), (b"0.05", 12.0))[
        (h >> 2) % 3
    ]
    code_of = {c: first + i for i, c in enumerate(uniq)}
    use_tounicode = bool((h >> 4) & 1)
    if use_tounicode:
        names = ["g%d" % i for i in range(len(uniq))]
        lines = [
            b"/CIDInit /ProcSet findresource begin",
            b"12 dict begin",
            b"begincmap",
            b"1 begincodespacerange",
            b"<00> <ff>",
            b"endcodespacerange",
            b"%d beginbfchar" % len(uniq),
        ]
        for i, c in enumerate(uniq):
            lines.append(
                b"<%02x> <%s>"
                % (first + i, c.encode("utf-16-be").hex().encode("ascii"))
            )
        lines += [b"endbfchar", b"endcmap", b"end", b"end"]
        cmap = b"\n".join(lines)
    else:
        names = [unicode_to_glyph(c) for c in uniq]
        cmap = None
    return scale, width, first, names, cmap, _hex_show(
        [code_of[c] for c in text]
    )


def encode_pdf(
    pages: list[np.ndarray | str],
    page_refs: list[str] | None = None,
    image_format: str = "flate",
    quality: int = 100,
    xref_format: str = "classic",
    encrypt: str | None = None,
    text_format: str = "literal",
    annotations: dict[int, list[dict]] | None = None,
) -> bytes:
    """Greyscale (H,W) uint8 pages and/or `str` text pages → real PDF.

    A `str` page becomes a BORN-DIGITAL text page: the string drawn
    with real content-stream text operators on a US-letter page in
    12 pt Courier. `text_format` picks the layout real writers emit:
    "literal" one (escaped) Tj show; "hex" one hex-string show; "tj"
    a TJ array of literal+hex chunks with small kern numbers; "para"
    '\n'-separated lines through the TL / T* / ' leading machinery
    (exact with the extractor's line_sep='\n'); "words"
    spaces dropped entirely — each word its own show op positioned by
    exact Courier metrics with margin wrapping (spacing must be
    reconstructed from geometry, the pdftotext problem); "cid" an
    Identity-H Type0 font with sequential 2-byte codes and a
    /ToUnicode CMap (bfchar + bfrange); "diff" a simple font whose
    /Encoding /Differences array remaps a subset (or all) of the
    shown characters to free byte codes addressed by AGL glyph names
    (the subsetted-font layout); "type3" a /Subtype /Type3 font with
    /FontMatrix-scaled glyph-space /Widths, trivial d0 /CharProcs,
    and either AGL /Differences names or a 1-byte /ToUnicode CMap;
    "cidv" an Identity-V VERTICAL CID page — top-down columns ordered
    right-to-left with /DW2 metric flavors, vertical-sign TJ kerns,
    and a two-column split variant;
    "rot" a ROTATED page — an inner crc32-chosen layout (any of the
    others, incl. vertical) drawn under a rotated CTM: 90° CCW / 270° landscape
    (MediaBox swapped), 180°, or a small deskew-style arbitrary angle,
    and for multi-word literal/hex pages sometimes SPLIT into two
    orientation groups (horizontal body + rotated remainder) on one
    page; "mix" crc32-chooses per page.
    The extractor twin is functions/pdf_text.py; every flavor
    roundtrips the exact string (words: for space-trimmed single-line
    text).

    Each page is a /DeviceGray 8-bit image XObject drawn full-bleed on
    a page whose MediaBox matches the pixel dims. image_format="flate"
    (default) stores zlib-compressed raw samples — lossless, the oracle
    path; image_format="jpeg" stores baseline-JPEG bytes under
    /DCTDecode (the layout real scanned PDFs use; lossy per
    functions/jpeg.py's contract); image_format="ccitt" stores 0/255
    bilevel pages as 1-bit Group 4 fax under /CCITTFaxDecode (the
    archival-scan layout; lossless); image_format="jpx" stores a
    lossless JPEG 2000 JP2 container under /JPXDecode (the PDF/A
    archival layout; functions/jp2.py) and "jpx97" its lossy 9/7
    flavor (the profile real scanners emit; near-lossless per jp2.py's
    default step). `page_refs` (one per page) lands
    newline-joined in the /Info /Title string so the container names
    its own pages. xref_format="classic" writes a PDF 1.4 xref table;
    "stream" writes the PDF 1.5 layout (cross-reference stream with
    Up-predicted rows + /ObjStm holding the non-stream objects).
    `encrypt` ("rc4-40" | "rc4-128" | "aes-128" | "aes-256") writes
    the standard security handler with EMPTY user/owner passwords
    (§7.6.3; "aes-256" is the PDF 2.0 /V 5 /R 6 layout with /UE /OE
    /Perms, ISO 32000-2 §7.6.4) —
    streams encrypted per object, the /Title string individually in
    the classic layout, and inside the (whole-stream-encrypted)
    /ObjStm in the 1.5 layout, per §7.5.7."""
    if page_refs is not None and len(page_refs) != len(pages):
        raise ValueError("page_refs length must match pages")
    if image_format not in (
        "flate", "jpeg", "ccitt", "jbig2", "jpx", "jpx97", "sep", "devn", "mix",
    ):
        raise ValueError(
            "image_format must be 'flate'/'jpeg'/'ccitt'/'jbig2'/'jpx'/"
            f"'jpx97'/'sep'/'devn'/'mix', got {image_format!r}"
        )
    if xref_format not in ("classic", "stream"):
        raise ValueError(f"xref_format must be 'classic' or 'stream', got {xref_format!r}")
    if text_format not in (
        "literal", "hex", "tj", "words", "para", "cid", "diff", "type3",
        "rot", "cidv", "mix",
    ):
        raise ValueError(
            "text_format must be 'literal'/'hex'/'tj'/'words'/'para'/"
            f"'cid'/'diff'/'type3'/'rot'/'cidv'/'mix', got {text_format!r}"
        )
    for p in pages:
        if isinstance(p, str):
            continue
        if p.dtype != np.uint8 or p.ndim != 2:
            raise ValueError(f"encode_pdf expects (H,W) uint8 pages, got {p.dtype} {p.shape}")

    crypt = None  # (file key, method, /Encrypt body, id0)
    if encrypt is not None:
        import hashlib

        from . import pdf_crypt

        variants = {
            "rc4-40": (1, 2, 40, "rc4"),
            "rc4-128": (2, 3, 128, "rc4"),
            "aes-128": (4, 4, 128, "aes"),
            "aes-256": (5, 6, 256, "aes256"),
        }
        if encrypt not in variants:
            raise ValueError(f"encrypt must be one of {sorted(variants)}, got {encrypt!r}")
        v, r, bits, method = variants[encrypt]
        # deterministic /ID: content-derived, no randomness (fixture contract)
        id0 = hashlib.md5(
            b"oar-ocr-spark-pdf-id" + str((len(pages), page_refs, encrypt)).encode()
        ).digest()
        p_perm = -44  # typical permission bits (print+extract denied-ish)

        def hexs(b: bytes) -> bytes:
            return b"<" + b.hex().encode("ascii") + b">"

        if v == 5:
            # AES-256 handler (ISO 32000-2 §7.6.4): the file key is an
            # arbitrary 32-byte value; deterministic from the /ID seed
            file_key = hashlib.sha256(b"oar-ocr-spark-v5-key" + id0).digest()
            u_val, ue_val, o_val, oe_val, perms = pdf_crypt.make_v5_entries(
                file_key, p_perm, r=r, seed=id0
            )
            enc_body = (
                b"<< /Filter /Standard /V 5 /R %d /Length 256 /P %d"
                b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                b" /StmF /StdCF /StrF /StdCF"
                b" /O %s /U %s /OE %s /UE %s /Perms %s >>"
            ) % (
                r, p_perm, hexs(o_val), hexs(u_val),
                hexs(oe_val), hexs(ue_val), hexs(perms),
            )
        else:
            o_val = pdf_crypt.compute_o_value(b"", b"", r, bits)
            file_key = pdf_crypt.compute_encryption_key(
                b"", o_val, p_perm, id0, r, bits
            )
            u_val = pdf_crypt.compute_u_value(file_key, id0, r)
            enc_body = (
                b"<< /Filter /Standard /V %d /R %d /Length %d /P %d /O %s /U %s"
            ) % (
                v, r, bits, p_perm, hexs(o_val), hexs(u_val.ljust(32, b"\x00")[:32]),
            )
            if v == 4:
                enc_body += (
                    b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                    b" /StmF /StdCF /StrF /StdCF"
                )
            enc_body += b" >>"
        crypt = (file_key, method, enc_body, id0)

    def enc_bytes(num: int, data: bytes) -> bytes:
        """Encrypt stream/string bytes for object `num` (identity when
        the file is plaintext)."""
        if crypt is None:
            return data
        from . import pdf_crypt

        if crypt[1] == "aes256":
            import hashlib

            # V5: the file key encrypts every object directly (no
            # per-object salting, algorithm 1.A); deterministic IV
            iv = hashlib.md5(b"oar-ocr-spark-iv%d" % num).digest()
            return pdf_crypt.aes_cbc_encrypt(crypt[0], iv, data)
        key = pdf_crypt.object_key(crypt[0], num, 0, aes=crypt[1] == "aes")
        if crypt[1] == "aes":
            import hashlib

            iv = hashlib.md5(b"oar-ocr-spark-iv%d" % num).digest()
            return pdf_crypt.aes_cbc_encrypt(key, iv, data)
        return pdf_crypt.rc4(key, data)

    objs: list[bytes] = []  # objs[i] is object number i+1
    is_stream: list[bool] = []  # must-be-direct objects (streams can't
    # live inside an /ObjStm; neither can the /Encrypt dict, §7.5.7)

    def add(body: bytes, stream: bool = False) -> int:
        objs.append(body)
        is_stream.append(stream)
        return len(objs)

    def enc_text_str(s: str, objnum: int) -> bytes:
        """A 7.9.2.2 text string value: UTF-16BE+BOM when non-latin1,
        individually encrypted (hex form) in the classic layout."""
        try:
            raw = s.encode("latin-1")
        except UnicodeEncodeError:
            raw = b"\xfe\xff" + s.encode("utf-16-be")
        if crypt is None or xref_format != "classic":
            return _pdf_string_raw(raw)
        return b"<" + enc_bytes(objnum, raw).hex().encode("ascii") + b">"

    def page_annots(page_i: int) -> bytes:
        """/Annots entry for one page: FreeText notes (/Contents) and
        Widget text fields (/FT /Tx with /T name and /V value) — the
        forms layout. Returns b"" when the page has none."""
        if not annotations or page_i not in annotations:
            return b""
        anums = []
        for a in annotations[page_i]:
            num = len(objs) + 1
            rect = a.get("rect", (36, 36, 200, 72))
            rect_b = b"[%s %s %s %s]" % tuple(
                _fmt_num(float(v)) for v in rect
            )
            if a["subtype"] == "freetext":
                body = (
                    b"<< /Type /Annot /Subtype /FreeText /Rect " + rect_b
                    + b" /Contents " + enc_text_str(a["text"], num)
                    + b" /DA " + enc_text_str("/Helv 12 Tf 0 g", num)
                    + b" >>"
                )
            elif a["subtype"] == "widget":
                body = (
                    b"<< /Type /Annot /Subtype /Widget /FT /Tx /Rect "
                    + rect_b
                    + b" /T " + enc_text_str(a.get("name", "field"), num)
                    + b" /V " + enc_text_str(a["text"], num)
                    + b" >>"
                )
            else:
                raise ValueError(
                    f"annotation subtype {a['subtype']!r} not supported"
                    " ('freetext'/'widget')"
                )
            anums.append(add(body))
        return (
            b" /Annots ["
            + b" ".join(b"%d 0 R" % n for n in anums)
            + b"]"
        )

    catalog_num = add(b"")  # placeholder, patched after pages tree exists
    pages_num = add(b"")
    kid_nums = []
    for page_i, page in enumerate(pages):
        if isinstance(page, str):
            tfmt = text_format

            def _fits_simple(s: str) -> bool:
                try:
                    s.encode("cp1252")
                    return True
                except UnicodeEncodeError:
                    return False

            if tfmt == "mix":
                ref = page_refs[page_i] if page_refs else str(page_i)
                tfmt = (
                    "literal", "hex", "tj", "words", "para", "cid",
                    "diff", "type3", "rot", "cidv",
                )[zlib.crc32(b"pdf-text-flavor:" + ref.encode()) % 10]
                if tfmt in (
                    "literal", "hex", "tj", "words", "para"
                ) and not _fits_simple(page):
                    # byte-encoded simple-font layouts cannot carry
                    # beyond-cp1252 text — the chooser re-deals to a
                    # unicode-capable flavor (explicit text_format
                    # keeps the loud ValueError)
                    tfmt = ("cid", "cidv", "diff", "type3")[
                        zlib.crc32(b"pdf-text-refit:" + ref.encode()) % 4
                    ]
            # rotated-page flavor: an inner layout drawn under a
            # rotated CTM (landscape 90/270 with swapped MediaBox,
            # 180, or a deskew-style arbitrary angle); extractor twin
            # assembles in the reading frame (pdf_text._assemble_runs)
            rot = None  # (cm operands, MediaBox)
            rot_split = None  # (horizontal part, rotated part)
            if tfmt == "rot":
                rh = zlib.crc32(b"pdf-rot-flavor:" + page.encode("utf-8"))
                tfmt = (
                    "literal", "hex", "tj", "words", "para", "cid",
                    "diff", "type3", "cidv",
                )[rh % 9]
                if tfmt in (
                    "literal", "hex", "tj", "words", "para"
                ) and not _fits_simple(page):
                    tfmt = ("cid", "cidv", "diff", "type3")[
                        (rh >> 7) % 4
                    ]
                land, port = b"[0 0 792 612]", b"[0 0 612 792]"
                rot = (
                    (b"0 1 -1 0 792 0", land),
                    (b"0 -1 1 0 0 612", land),
                    (b"-1 0 0 -1 612 792", port),
                    (b"0.976296 0.21644 -0.21644 0.976296 40 18", port),
                )[(rh >> 3) % 4]
                # mixed-orientation page: a horizontal body plus
                # rotated remainder, joined by the extractor's group
                # assembly (horizontal first, then by angle)
                if (
                    tfmt in ("literal", "hex")
                    and (rh >> 5) & 1
                    and " " in page
                    and "  " not in page
                    and page == page.strip(" ")
                ):
                    words = page.split(" ")
                    k = 1 + (rh >> 6) % (len(words) - 1)
                    rot_split = (
                        " ".join(words[:k]), " ".join(words[k:])
                    )
            if tfmt in ("cid", "cidv"):
                cmap_raw, w_entry, ops = _cid_page(
                    page, vertical=(tfmt == "cidv")
                )
                cdata = enc_bytes(len(objs) + 1, zlib.compress(cmap_raw, 6))
                cmap_num = add(
                    b"<< /Filter /FlateDecode /Length %d >>\nstream\n"
                    % len(cdata) + cdata + b"\nendstream",
                    stream=True,
                )
                # classic layout: strings are encrypted individually
                # (hex form); in the 1.5 layout the whole /ObjStm is
                def enc_str(s: str) -> bytes:
                    if crypt is None or xref_format != "classic":
                        return _pdf_string(s)
                    return (
                        b"<"
                        + enc_bytes(len(objs) + 1, s.encode("latin-1"))
                        .hex().encode("ascii")
                        + b">"
                    )

                desc_num = add(
                    b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont"
                    b" /OarCID /CIDSystemInfo << /Registry " + enc_str("Adobe")
                    + b" /Ordering " + enc_str("Identity")
                    + b" /Supplement 0 >> " + w_entry + b" >>"
                )
                font_num = add(
                    b"<< /Type /Font /Subtype /Type0 /BaseFont /OarCID"
                    b" /Encoding /Identity-%s /DescendantFonts [%d 0 R]"
                    b" /ToUnicode %d 0 R >>"
                    % (b"V" if tfmt == "cidv" else b"H", desc_num, cmap_num)
                )
            elif tfmt == "diff":
                fbody, ops = _diff_page(page)
                font_num = add(fbody)
            elif tfmt == "type3":
                scale, gwidth, first, names, cmap_raw, ops = _type3_page(
                    page
                )
                proc = b"%s 0 d0" % _fmt_num(gwidth)
                proc_nums = []
                for _ in names:
                    pdata = enc_bytes(len(objs) + 1, proc)
                    proc_nums.append(
                        add(
                            b"<< /Length %d >>\nstream\n" % len(pdata)
                            + pdata + b"\nendstream",
                            stream=True,
                        )
                    )
                charprocs = b" ".join(
                    b"/%s %d 0 R" % (nm.encode("ascii"), pn)
                    for nm, pn in zip(names, proc_nums)
                )
                fbody = (
                    b"<< /Type /Font /Subtype /Type3"
                    b" /FontBBox [0 0 %s %s]"
                    b" /FontMatrix [%s 0 0 %s 0 0]"
                    b" /FirstChar %d /LastChar %d /Widths [%s]"
                    b" /CharProcs << %s >>"
                    b" /Encoding << /Type /Encoding /Differences [%d %s] >>"
                ) % (
                    _fmt_num(gwidth), _fmt_num(gwidth * 1.2),
                    scale, scale,
                    first, first + len(names) - 1,
                    b" ".join(_fmt_num(gwidth) for _ in names),
                    charprocs,
                    first,
                    b" ".join(b"/" + nm.encode("ascii") for nm in names),
                )
                if cmap_raw is not None:
                    cdata = enc_bytes(
                        len(objs) + 1, zlib.compress(cmap_raw, 6)
                    )
                    cmap_num = add(
                        b"<< /Filter /FlateDecode /Length %d >>\nstream\n"
                        % len(cdata) + cdata + b"\nendstream",
                        stream=True,
                    )
                    fbody += b" /ToUnicode %d 0 R" % cmap_num
                font_num = add(fbody + b" >>")
            else:
                if tfmt == "literal":
                    ops = (
                        b"BT /F0 12 Tf %s %s Td "
                        % (_fmt_num(_TXT_X0), _fmt_num(_TXT_Y0))
                        + _pdf_string_raw(_enc_simple(page))
                        + b" Tj ET"
                    )
                elif tfmt == "hex":
                    ops = (
                        b"BT /F0 12 Tf %s %s Td <"
                        % (_fmt_num(_TXT_X0), _fmt_num(_TXT_Y0))
                        + _enc_simple(page).hex().encode("ascii")
                        + b"> Tj ET"
                    )
                elif tfmt == "tj":
                    ops = _tj_content(page)
                elif tfmt == "para":
                    ops = _para_content(page)
                else:
                    ops = _words_content(page)
                # the real simple-font dict layouts: explicit WinAnsi,
                # default (Standard) encoding or explicit MacRoman, a
                # /Widths array the extractor must honor, and a
                # PROPORTIONAL standard-14 face with NO /Widths
                # (viewer-metrics reliance, §9.6.2.2 — extractor
                # resolves through the Core14 AFM tables in
                # functions/base14.py)
                fhash = zlib.crc32(b"pdf-font-flavor:" + page.encode("utf-8"))
                fh = fhash % 4
                if any(b >= 0x80 for b in _enc_simple(page)):
                    # high codes decode via cp1252 ONLY under an
                    # explicit /WinAnsiEncoding entry (and the AFM
                    # tables are ASCII-range)
                    fh = 0
                elif tfmt == "words" and fh == 3:
                    # the words layout positions by fixed Courier
                    # advances — keep its metrics fixed-pitch
                    fh = 0
                if fh == 3:
                    face = (
                        b"Helvetica", b"Helvetica-Bold",
                        b"Helvetica-Oblique", b"Helvetica-BoldOblique",
                        b"Times-Roman", b"Times-Bold", b"Times-Italic",
                        b"Times-BoldItalic", b"Arial", b"Arial-BoldMT",
                        b"TimesNewRomanPSMT", b"OARSUB+Helvetica",
                    )[
                        zlib.crc32(
                            b"pdf-face-flavor:" + page.encode("utf-8")
                        ) % 12
                    ]
                    fbody = (
                        b"<< /Type /Font /Subtype /Type1 /BaseFont /"
                        + face
                    )
                else:
                    fbody = (
                        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
                    )
                if fh == 0:
                    fbody += b" /Encoding /WinAnsiEncoding"
                elif fh == 1 and (fhash >> 8) & 1:
                    # the OTHER Annex D standard base encoding; ASCII
                    # codes are identical, so any flavor-1 page (high
                    # bytes force fh=0 above) roundtrips under it
                    fbody += b" /Encoding /MacRomanEncoding"
                elif fh == 2:
                    fbody += (
                        b" /FirstChar 32 /LastChar 126 /Widths ["
                        + b" ".join(b"600" for _ in range(95))
                        + b"]"
                    )
                font_num = add(fbody + b" >>")
            mbox = b"[0 0 612 792]"
            if rot is not None:
                if rot_split is not None:
                    def _one_show(txt: str) -> bytes:
                        lead = b"BT /F0 12 Tf %s %s Td " % (
                            _fmt_num(_TXT_X0), _fmt_num(_TXT_Y0)
                        )
                        if tfmt == "hex":
                            return (
                                lead + b"<"
                                + _enc_simple(txt).hex().encode("ascii")
                                + b"> Tj ET"
                            )
                        return (
                            lead + _pdf_string_raw(_enc_simple(txt))
                            + b" Tj ET"
                        )

                    ops = (
                        _one_show(rot_split[0])
                        + b" q %s cm " % rot[0]
                        + _one_show(rot_split[1])
                        + b" Q"
                    )
                else:
                    ops = b"q %s cm " % rot[0] + ops + b" Q"
                mbox = rot[1]
            # structural flavors real writers emit, crc32-chosen: a
            # quarter of pages route their text through a Form
            # XObject (/Matrix translation undone by the invoking cm;
            # own /Resources or inherited from the page — both
            # layouts), and content/form streams are Flate-compressed
            # half the time
            wrap_h = zlib.crc32(b"pdf-textwrap-flavor:" + page.encode("utf-8"))
            if wrap_h & 3 == 3:
                own_res = bool(wrap_h & 16)
                fdict = (
                    b"<< /Type /XObject /Subtype /Form"
                    b" /BBox " + mbox + b" /Matrix [1 0 0 1 -30 -40]"
                )
                if own_res:
                    fdict += b" /Resources << /Font << /F0 %d 0 R >> >>" % font_num
                if wrap_h & 4:
                    fbytes = zlib.compress(ops, 6)
                    fdict += b" /Filter /FlateDecode"
                else:
                    fbytes = ops
                fbytes = enc_bytes(len(objs) + 1, fbytes)
                form_num = add(
                    fdict + b" /Length %d >>\nstream\n" % len(fbytes)
                    + fbytes + b"\nendstream",
                    stream=True,
                )
                ops = b"q 1 0 0 1 30 40 cm /Fm0 Do Q"
                resources = b"<< /XObject << /Fm0 %d 0 R >> >>" % form_num
                if not own_res:
                    resources = (
                        b"<< /Font << /F0 %d 0 R >>"
                        b" /XObject << /Fm0 %d 0 R >> >>"
                        % (font_num, form_num)
                    )
            else:
                resources = b"<< /Font << /F0 %d 0 R >> >>" % font_num
            cfilt = b""
            if wrap_h & 8:
                ops = zlib.compress(ops, 6)
                cfilt = b" /Filter /FlateDecode"
            content = enc_bytes(len(objs) + 1, ops)
            content_num = add(
                b"<< /Length %d%s >>\nstream\n" % (len(content), cfilt)
                + content + b"\nendstream",
                stream=True,
            )
            kid_nums.append(
                add(
                    b"<< /Type /Page /Parent %d 0 R /MediaBox " % pages_num
                    + mbox
                    + b" /Resources " + resources
                    + b" /Contents %d 0 R" % content_num
                    + page_annots(page_i)
                    + b" >>"
                )
            )
            continue
        h, w = page.shape
        bpc, parms = 8, b""
        colorspace = b"/DeviceGray"
        fmt = image_format
        if fmt == "mix":
            # lossless spot-color flavors mixed per page: half plain
            # flate, a quarter Separation + type-4 calculator tint, a
            # quarter 2-colorant DeviceN + 2-D sampled tint — all
            # exact roundtrips, so container goldens are unchanged
            ref = page_refs[page_i] if page_refs else str(page_i)
            fmt = ("flate", "flate", "sep", "devn")[
                zlib.crc32(b"pdf-img-flavor:" + ref.encode()) % 4
            ]
        if fmt == "jpeg":
            from .jpeg import encode_jpeg

            data = encode_jpeg(page, quality)
            filter_name = b"DCTDecode"
        elif fmt in ("jpx", "jpx97"):
            from .jp2 import encode_jp2

            # jpx = lossless 5/3 (archival); jpx97 = the lossy 9/7
            # profile real-world scanners emit
            data = encode_jp2(page, irreversible=fmt == "jpx97")
            filter_name = b"JPXDecode"
        elif fmt == "ccitt":
            from .ccitt import ccitt_encode_g4

            if not np.isin(page, (0, 255)).all():
                raise ValueError("image_format='ccitt' needs a 0/255 bilevel page")
            data = ccitt_encode_g4((page == 0).astype(np.uint8))  # 1 = black
            filter_name = b"CCITTFaxDecode"
            bpc = 1
            parms = (
                b" /DecodeParms << /K -1 /Columns %d /Rows %d /BlackIs1 false >>"
                % (w, h)
            )
        elif fmt == "jbig2":
            from .jbig2 import encode_jbig2, encode_jbig2_symbols

            if not np.isin(page, (0, 255)).all():
                raise ValueError("image_format='jbig2' needs a 0/255 bilevel page")
            # embedded T.88 stream (1 = black) — SYMBOL MODE (the
            # layout born-scanned PDFs actually carry: dictionary +
            # text region) on even pages, TPGDON generic region on odd
            bilevel_bits = (page == 0).astype(np.uint8)
            if len(kid_nums) % 2 == 0:
                data = encode_jbig2_symbols(bilevel_bits)
            else:
                data = encode_jbig2(bilevel_bits, tpgdon=True)
            filter_name = b"JBIG2Decode"
            bpc = 1
        elif fmt == "sep":
            # Separation spot color with a type-4 calculator tint
            # transform t -> 1-t into /DeviceGray: stored samples are
            # 255-G, so the decode roundtrip is exact. The program
            # exercises dup/gt/ifelse/neg/add/exch/sub with a value-
            # dependent mask (both branches compute 1-t).
            prog = b"{ dup 0.5 gt { 1 exch sub } { neg 1 add } ifelse }"
            pdata = enc_bytes(len(objs) + 1, prog)
            fn_num = add(
                b"<< /FunctionType 4 /Domain [0 1] /Range [0 1]"
                b" /Length %d >>\nstream\n" % len(pdata)
                + pdata + b"\nendstream",
                stream=True,
            )
            colorspace = b"[/Separation /Ink /DeviceGray %d 0 R]" % fn_num
            data = zlib.compress((255 - page).tobytes(), 6)
            filter_name = b"FlateDecode"
        elif fmt == "devn":
            # 2-colorant DeviceN with a 2-D type-0 sampled tint
            # transform f(a,b) = b (corner samples 0,0,255,255):
            # bilinear interpolation reproduces it exactly, so the
            # roundtrip through the multilinear path is exact; the
            # first colorant carries 255-G as a decoy channel
            sdata = enc_bytes(len(objs) + 1, bytes([0, 0, 255, 255]))
            fn_num = add(
                b"<< /FunctionType 0 /Domain [0 1 0 1] /Range [0 1]"
                b" /Size [2 2] /BitsPerSample 8 /Length %d >>\nstream\n"
                % len(sdata) + sdata + b"\nendstream",
                stream=True,
            )
            colorspace = b"[/DeviceN [/Decoy /Ink] /DeviceGray %d 0 R]" % fn_num
            data = zlib.compress(
                np.stack([255 - page, page], axis=-1).tobytes(), 6
            )
            filter_name = b"FlateDecode"
        else:
            data = zlib.compress(page.tobytes(), 6)
            filter_name = b"FlateDecode"
        data = enc_bytes(len(objs) + 1, data)
        img_num = add(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
            b" /ColorSpace %s /BitsPerComponent %d"
            b" /Filter /%s%s /Length %d >>\nstream\n"
            % (w, h, colorspace, bpc, filter_name, parms, len(data))
            + data
            + b"\nendstream",
            stream=True,
        )
        content = enc_bytes(len(objs) + 1, b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h))
        content_num = add(
            b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
            stream=True,
        )
        kid_nums.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d]"
                b" /Resources << /XObject << /Im0 %d 0 R >> >>"
                b" /Contents %d 0 R"
                % (pages_num, w, h, img_num, content_num)
                + page_annots(page_i)
                + b" >>"
            )
        )
    objs[catalog_num - 1] = b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num
    kids = b" ".join(b"%d 0 R" % n for n in kid_nums)
    objs[pages_num - 1] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        kids,
        len(kid_nums),
    )
    info_num = None
    if page_refs is not None:
        info_num = add(b"<< /Title " + _pdf_string("\n".join(page_refs)) + b" >>")
    encrypt_num = None
    if crypt is not None:
        # must be a direct object: the /Encrypt dict may not live in an
        # /ObjStm (§7.5.7) and is itself never encrypted
        encrypt_num = add(crypt[2], stream=True)

    def trailer_extras() -> bytes:
        if crypt is None:
            return b""
        idhex = b"<" + crypt[3].hex().encode("ascii") + b">"
        return b" /Encrypt %d 0 R /ID [%s %s]" % (encrypt_num, idhex, idhex)

    if xref_format == "classic":
        if crypt is not None and info_num is not None:
            # strings are encrypted individually in the classic layout;
            # hex form avoids escaping arbitrary ciphertext bytes
            title = "\n".join(page_refs).encode("latin-1")
            enc_title = enc_bytes(info_num, title)
            objs[info_num - 1] = (
                b"<< /Title <" + enc_title.hex().encode("ascii") + b"> >>"
            )
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]  # object 0 is the free head
        for num, body in enumerate(objs, start=1):
            offsets.append(len(out))
            out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
        xref_pos = len(out)
        out += b"xref\n0 %d\n" % (len(objs) + 1)
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += b"%010d 00000 n \n" % off
        trailer = b"<< /Size %d /Root %d 0 R" % (len(objs) + 1, catalog_num)
        if info_num is not None:
            trailer += b" /Info %d 0 R" % info_num
        trailer += trailer_extras()
        trailer += b" >>"
        out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_pos
        return bytes(out)

    # --- PDF 1.5 layout: /ObjStm for non-stream objects + xref stream ----
    members = [n for n in range(1, len(objs) + 1) if not is_stream[n - 1]]
    objstm_num = len(objs) + 1
    xref_num = len(objs) + 2
    header = b" ".join(b"%d %d" % (n, off) for n, off in _running_offsets(objs, members))
    first = len(header) + 1
    stm_body = header + b"\n" + b"\n".join(objs[n - 1] for n in members)
    # encryption wraps the FILTERED bytes (decode order: decrypt, then
    # inflate); member strings are covered by this, not individually
    packed = enc_bytes(objstm_num, zlib.compress(stm_body, 6))
    objstm_obj = (
        b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode /Length %d >>"
        b"\nstream\n" % (len(members), first, len(packed)) + packed + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    entry: dict[int, tuple[int, int, int]] = {0: (0, 0, 65535)}  # free head
    for idx, n in enumerate(members):
        entry[n] = (2, objstm_num, idx)
    for num, body in enumerate(objs, start=1):
        if not is_stream[num - 1]:
            continue  # lives in the ObjStm
        entry[num] = (1, len(out), 0)
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    entry[objstm_num] = (1, len(out), 0)
    out += b"%d 0 obj\n" % objstm_num + objstm_obj + b"\nendobj\n"
    xref_pos = len(out)
    entry[xref_num] = (1, xref_pos, 0)

    size = xref_num + 1
    rows = np.zeros((size, 7), dtype=np.uint8)  # /W [1 4 2]
    for n in range(size):
        t, f2, f3 = entry.get(n, (0, 0, 0))
        rows[n, 0] = t
        rows[n, 1:5] = list(struct.pack(">I", f2))
        rows[n, 5:7] = list(struct.pack(">H", f3))
    # Up predictor (Predictor 12): the wild layout — rows delta'd
    # against the previous row, each prefixed by PNG filter byte 2
    pred = np.zeros((size, 8), dtype=np.uint8)
    pred[:, 0] = 2
    pred[0, 1:] = rows[0]
    pred[1:, 1:] = rows[1:] - rows[:-1]  # uint8 wraparound == mod-256 delta
    xref_data = zlib.compress(pred.tobytes(), 6)
    xref_dict = (
        b"<< /Type /XRef /Size %d /W [1 4 2] /Root %d 0 R" % (size, catalog_num)
        + (b" /Info %d 0 R" % info_num if info_num is not None else b"")
        + trailer_extras()  # xref stream itself stays unencrypted (§7.5.8.2)
        + b" /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >>"
        + b" /Length %d >>" % len(xref_data)
    )
    out += (
        b"%d 0 obj\n" % xref_num
        + xref_dict
        + b"\nstream\n"
        + xref_data
        + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


def _running_offsets(objs: list[bytes], members: list[int]) -> list[tuple[int, int]]:
    """(object number, byte offset within the ObjStm body) pairs —
    offsets are relative to /First and members are newline-joined."""
    pairs = []
    off = 0
    for n in members:
        pairs.append((n, off))
        off += len(objs[n - 1]) + 1  # +1 for the joining newline
    return pairs


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} R"


class _Name(str):
    """PDF /Name (distinct from strings so dict keys are unambiguous)."""


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # '%' comment to end of line
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def _parse_value(data: bytes, pos: int):
    """Recursive-descent parse of one PDF object at `pos` → (value, pos)."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise ValueError("unexpected end of PDF data")
    c = data[pos]
    if data.startswith(b"<<", pos):
        pos += 2
        d: dict[str, object] = {}
        while True:
            pos = _skip_ws(data, pos)
            if data.startswith(b">>", pos):
                return d, pos + 2
            key, pos = _parse_value(data, pos)
            if not isinstance(key, _Name):
                raise ValueError(f"PDF dict key is not a name at offset {pos}")
            val, pos = _parse_value(data, pos)
            d[str(key)] = val
    if c == 0x5B:  # '['
        pos += 1
        arr: list[object] = []
        while True:
            pos = _skip_ws(data, pos)
            if data[pos] == 0x5D:
                return arr, pos + 1
            v, pos = _parse_value(data, pos)
            arr.append(v)
    if c == 0x2F:  # '/'
        pos += 1
        start = pos
        while pos < len(data) and data[pos] not in _WS and data[pos] not in _DELIM:
            pos += 1
        return _Name(data[start:pos].decode("latin-1")), pos
    if c == 0x28:  # '(' literal string
        pos += 1
        depth = 1
        out = bytearray()
        while depth:
            ch = data[pos]
            if ch == 0x5C:  # backslash escape
                nxt = data[pos + 1]
                if 0x30 <= nxt <= 0x37:  # \ddd octal, 1-3 digits (spec 7.3.4.2)
                    j = pos + 1
                    val = 0
                    while j < pos + 4 and j < len(data) and 0x30 <= data[j] <= 0x37:
                        val = val * 8 + (data[j] - 0x30)
                        j += 1
                    out.append(val & 0xFF)
                    pos = j
                elif nxt in (0x0D, 0x0A):  # backslash-EOL: line continuation
                    pos += 2
                    if nxt == 0x0D and pos < len(data) and data[pos] == 0x0A:
                        pos += 1
                else:
                    esc = {
                        0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b", 0x66: b"\f",
                    }
                    out += esc.get(nxt, bytes([nxt]))
                    pos += 2
            elif ch == 0x28:
                depth += 1
                out.append(ch)
                pos += 1
            elif ch == 0x29:
                depth -= 1
                if depth:
                    out.append(ch)
                pos += 1
            else:
                out.append(ch)
                pos += 1
        return bytes(out).decode("latin-1"), pos
    if c == 0x3C:  # '<' hex string (not '<<', handled above)
        end = data.index(b">", pos)
        hexdigits = re.sub(rb"\s", b"", data[pos + 1 : end])
        if len(hexdigits) % 2:
            hexdigits += b"0"
        return bytes.fromhex(hexdigits.decode("ascii")).decode("latin-1"), end + 1
    if data.startswith(b"true", pos):
        return True, pos + 4
    if data.startswith(b"false", pos):
        return False, pos + 5
    if data.startswith(b"null", pos):
        return None, pos + 4
    m = _NUM_RE.match(data, pos)
    if m:
        tok = m.group(0)
        pos = m.end()
        if b"." in tok:
            return float(tok), pos
        # int — maybe the start of an "N G R" indirect reference
        la = _skip_ws(data, pos)
        m2 = _NUM_RE.match(data, la)
        if m2 and b"." not in m2.group(0):
            la2 = _skip_ws(data, m2.end())
            if data.startswith(b"R", la2) and (
                la2 + 1 >= len(data)
                or data[la2 + 1] in _WS
                or data[la2 + 1] in _DELIM
            ):
                return _Ref(int(tok), int(m2.group(0))), la2 + 1
        return int(tok), pos
    raise ValueError(f"cannot parse PDF object at offset {pos}: {data[pos:pos+20]!r}")


def _ascii_hex_decode(data: bytes) -> bytes:
    """/ASCIIHexDecode (spec 7.4.2): hex pairs, whitespace ignored,
    '>' EOD, odd trailing digit padded with 0."""
    end = data.find(b">")
    hexdigits = re.sub(rb"\s", b"", data if end < 0 else data[:end])
    if len(hexdigits) % 2:
        hexdigits += b"0"
    return bytes.fromhex(hexdigits.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    """/ASCII85Decode (spec 7.4.3): base-85 groups, 'z' = four zero
    bytes, '~>' EOD, partial final group."""
    end = data.find(b"~>")
    body = re.sub(rb"\s", b"", data if end < 0 else data[:end])
    out = bytearray()
    group: list[int] = []
    for ch in body:
        if ch == 0x7A:  # 'z'
            if group:
                raise ValueError("ASCII85 'z' inside a group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= ch <= 0x75:  # '!'..'u'
            raise ValueError(f"invalid ASCII85 character {ch:#x}")
        group.append(ch - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            out += v.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise ValueError("ASCII85 partial group of 1 digit")
        n = len(group)
        v = 0
        for g in group + [84] * (5 - n):  # pad with 'u'
            v = v * 85 + g
        out += v.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def _rle_decode(data: bytes) -> bytes:
    """/RunLengthDecode (spec 7.4.5): PackBits-style runs, 128 EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        if n == 128:  # EOD
            break
        if n < 128:
            out += data[i + 1 : i + 2 + n]
            i += 2 + n
        else:
            out += bytes([data[i + 1]]) * (257 - n)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """/LZWDecode (spec 7.4.4): 9→12-bit variable codes MSB-first,
    256 = clear table, 257 = EOD; /EarlyChange (default 1) widens the
    code one entry before the table fills — the layout every PDF
    writer uses."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            acc &= (1 << nbits) - 1
            if code == 256:
                reset()
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"LZW code {code} beyond table")
            out += entry
            prev = entry
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _apply_one_filter(name: str, data: bytes, pm) -> bytes:
    """One /Filter stage + its /DecodeParms (predictors apply to the
    LZW/Flate stages per spec 7.4.4.4)."""
    if name == "FlateDecode":
        data = zlib.decompress(data)
    elif name == "LZWDecode":
        early = int(pm.get("EarlyChange", 1)) if isinstance(pm, dict) else 1
        data = _lzw_decode(data, early)
    elif name == "ASCIIHexDecode":
        return _ascii_hex_decode(data)
    elif name == "ASCII85Decode":
        return _ascii85_decode(data)
    elif name == "RunLengthDecode":
        return _rle_decode(data)
    else:
        raise NotImplementedError(f"PDF stream filter {name} not supported")
    if isinstance(pm, dict):
        data = _apply_predictor(data, pm)
    return data


def _filter_chain(d: dict):
    """(filter names, per-filter DecodeParms) from a stream dict
    (both may be single values or arrays)."""
    filt = d.get("Filter")
    filts = filt if isinstance(filt, list) else ([] if filt is None else [filt])
    parms = d.get("DecodeParms")
    if isinstance(parms, list):
        parms_list = list(parms)
    elif parms is None or len(filts) <= 1:
        parms_list = [parms] * len(filts)
    else:
        # Malformed per spec 7.4.4.4 (array /Filter with a scalar
        # /DecodeParms): attach the dict to the LAST predictor-capable
        # stage only — replicating it would re-apply a predictor after
        # every Flate/LZW stage and silently corrupt the data.
        parms_list = [None] * len(filts)
        for i in range(len(filts) - 1, -1, -1):
            if str(filts[i]) in ("FlateDecode", "LZWDecode"):
                parms_list[i] = parms
                break
        else:
            raise ValueError(
                "scalar /DecodeParms with an array /Filter containing no "
                "predictor-capable (Flate/LZW) stage"
            )
    return [str(f) for f in filts], list(parms_list) + [None] * (
        len(filts) - len(parms_list)
    )


def _apply_stream_filters(d: dict, raw: bytes) -> bytes:
    """Decode a stream's full /Filter chain honoring /DecodeParms.
    Direct objects only — also used for xref/object streams, where the
    spec requires direct values (the xref doesn't exist yet to resolve
    refs). Flate/LZW (with PNG predictors 10–15), ASCIIHex, ASCII85
    and RunLength; anything else fails loudly."""
    out = raw
    for f, pm in zip(*_filter_chain(d)):
        out = _apply_one_filter(f, out, pm)
    return out


def _apply_predictor(data: bytes, pm: dict) -> bytes:
    """Reverse a /Predictor on FlateDecode output. PNG predictors
    (10–15) share the per-row filter-byte format with PNG itself, so
    the unfilter loop is png.py's (one implementation, two formats)."""
    pred = int(pm.get("Predictor", 1))
    if pred == 1:
        return data
    colors = int(pm.get("Colors", 1))
    bpc = int(pm.get("BitsPerComponent", 8))
    if bpc not in (1, 2, 4, 8, 16):
        raise ValueError(f"illegal predictor BitsPerComponent {bpc}")
    columns = int(pm.get("Columns", 1))
    spr = columns * colors  # samples per row
    stride = (spr * bpc + 7) // 8  # row bytes (rows are byte-aligned)
    if pred == 2:  # TIFF horizontal differencing (spec 7.4.4.4)
        if stride <= 0 or len(data) % stride:
            raise ValueError("TIFF-predicted stream length not a whole row count")
        h = len(data) // stride
        # per-channel prefix sum along the row; deferred modulo equals
        # per-step wraparound
        if bpc == 8:
            rows = (
                np.frombuffer(data, dtype=np.uint8)
                .reshape(h, columns, colors)
                .astype(np.int64)
            )
            return (np.cumsum(rows, axis=1) & 0xFF).astype(np.uint8).tobytes()
        if bpc == 16:
            rows = (
                np.frombuffer(data, dtype=">u2")
                .reshape(h, columns, colors)
                .astype(np.int64)
            )
            return (np.cumsum(rows, axis=1) & 0xFFFF).astype(">u2").tobytes()
        # sub-byte samples: unpack big-endian within each byte,
        # difference per channel mod 2^bpc, repack row-aligned
        rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)
        bits = np.unpackbits(rows, axis=1)
        weights = 1 << np.arange(bpc - 1, -1, -1)
        vals = (bits.reshape(h, -1, bpc) * weights).sum(axis=2)[:, :spr]
        acc = (
            np.cumsum(vals.reshape(h, columns, colors).astype(np.int64), axis=1)
            & ((1 << bpc) - 1)
        ).reshape(h, spr)
        slots = stride * 8 // bpc  # sample slots per row incl. pad bits
        padded = np.zeros((h, slots), dtype=np.int64)
        padded[:, :spr] = acc
        outbits = (
            (padded[:, :, None] >> np.arange(bpc - 1, -1, -1)) & 1
        ).astype(np.uint8).reshape(h, -1)
        return np.packbits(outbits, axis=1).tobytes()
    if not 10 <= pred <= 15:
        raise ValueError(f"unknown stream predictor {pred}")
    if stride <= 0 or len(data) % (stride + 1):
        raise ValueError("predicted stream length not a whole number of rows")
    from .png import _unfilter_bytes

    # PNG filters predict at byte distance bpp regardless of bit depth
    # (PNG spec 6.2; sub-byte depths use bpp=1)
    bpp = max(1, (colors * bpc) // 8)
    h = len(data) // (stride + 1)
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, stride + 1)
    return _unfilter_bytes(arr, h, stride, bpp).tobytes()


def _unpack_bits_flat(raw: bytes, count: int, bps: int) -> np.ndarray:
    """`count` big-endian samples of `bps` bits packed contiguously
    (no row padding — the 7.10.2 sampled-function stream layout) →
    float64 array of raw sample values."""
    need = (count * bps + 7) // 8
    if len(raw) < need:
        raise ValueError("PDF sampled function stream truncated")
    if bps == 8:
        return np.frombuffer(raw, np.uint8, count).astype(np.float64)
    if bps == 16:
        return np.frombuffer(raw, ">u2", count).astype(np.float64)
    if bps == 32:
        return np.frombuffer(raw, ">u4", count).astype(np.float64)
    bits = np.unpackbits(np.frombuffer(raw[:need], np.uint8))[: count * bps]
    weights = (2.0 ** np.arange(bps - 1, -1, -1))
    return bits.reshape(count, bps).astype(np.float64) @ weights


def _unpack_samples(raw: bytes, w: int, h: int, bpc: int, ncomp: int) -> np.ndarray:
    """Packed image samples → (h, w, ncomp) int64 array of RAW sample
    values (unscaled). Rows are padded to a byte boundary (8.9.3);
    1/2/4-bit samples pack big-endian within each byte, 16-bit
    samples are big-endian words."""
    spr = w * ncomp  # samples per row
    if bpc == 16:
        stride = spr * 2
        if len(raw) < stride * h:
            raise ValueError("PDF image data truncated")
        a = np.frombuffer(raw[: stride * h], dtype=">u2").reshape(h, spr)
        return a.astype(np.int64).reshape(h, w, ncomp)
    if bpc == 8:
        if len(raw) < spr * h:
            raise ValueError("PDF image data truncated")
        a = np.frombuffer(raw[: spr * h], dtype=np.uint8).reshape(h, spr)
        return a.astype(np.int64).reshape(h, w, ncomp)
    if bpc in (1, 2, 4):
        stride = (spr * bpc + 7) // 8
        if len(raw) < stride * h:
            raise ValueError("PDF image data truncated")
        rows = np.frombuffer(raw[: stride * h], dtype=np.uint8).reshape(h, stride)
        bits = np.unpackbits(rows, axis=1)
        if bpc == 1:
            vals = bits[:, :spr]
        else:
            weights = 1 << np.arange(bpc - 1, -1, -1)
            vals = (bits.reshape(h, -1, bpc) * weights).sum(axis=2)[:, :spr]
        return vals.astype(np.int64).reshape(h, w, ncomp)
    raise NotImplementedError(f"PDF image depth {bpc} not supported")


class PdfDocument:
    """Parsed PDF (classic xref tables OR 1.5+ xref streams with
    /ObjStm compressed objects). Objects load lazily by number."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF- header)")
        self._data = data
        self._cache: dict[int, object] = {}
        # num → byte offset | None (freed) | ("objstm", stream num, idx)
        self._offsets: dict[int, int | None | tuple] = {}
        self._objstm_cache: dict[int, tuple[list[tuple[int, int]], bytes, int]] = {}
        self._objstm_loading: set[int] = set()  # circular-reference guard
        # (file key, stream method, string method) when /Encrypt is
        # present and supported; None for plaintext files
        self._crypt: tuple[bytes, str, str] | None = None
        self._encrypt_num: int | None = None
        self.trailer = self._read_xref_chain()
        if "Encrypt" in self.trailer:
            self._setup_encryption()

    # -- encryption (standard security handler, §7.6) -----------------------
    def _setup_encryption(self) -> None:
        """Detect /Encrypt BEFORE any stream decode and either set up
        the standard-handler decryption state (empty user/owner
        password; RC4, AES-128 or AES-256) or raise the declared loud
        NotImplementedError — never an opaque zlib error mid-stream.
        Reference reads encrypted PDFs via hayro (oar-ocr
        Cargo.toml:20)."""
        from . import pdf_crypt

        ref = self.trailer["Encrypt"]
        if isinstance(ref, _Ref):
            self._encrypt_num = ref.num
        enc = self.resolve(ref)  # loads undecrypted: _crypt is still None
        if not isinstance(enc, dict):
            raise ValueError("/Encrypt entry is not a dictionary")
        filt = str(enc.get("Filter", ""))
        if filt != "Standard":
            raise NotImplementedError(
                f"encrypted PDF: security handler /{filt} not supported"
            )
        v = int(self.resolve(enc.get("V", 0)))
        r = int(self.resolve(enc.get("R", 0)))
        v5 = v == 5 and r in (5, 6)
        if not v5 and (v not in (1, 2, 4) or r not in (2, 3, 4)):
            raise NotImplementedError(
                f"encrypted PDF: /V {v} /R {r} not supported "
                "(RC4/AES-128/AES-256 standard handler only)"
            )
        stm_m = str_m = "rc4"
        if v in (4, 5):
            cf = self.resolve(enc.get("CF", {})) or {}
            stdcf = self.resolve(cf.get("StdCF", {})) or {}
            cfm = str(self.resolve(stdcf.get("CFM", "None")))
            # AESV3 is only legal under /V 5 (32-byte key), AESV2/V2
            # only under /V 4 — a mismatch is a malformed dictionary
            methods = (
                {"AESV3": "aes256", "None": "identity"}
                if v5
                else {"V2": "rc4", "AESV2": "aes", "None": "identity"}
            )
            if cfm not in methods:
                raise NotImplementedError(
                    f"encrypted PDF: crypt filter method /{cfm} not supported"
                    f" under /V {v}"
                )

            def cls_method(key: str) -> str:
                name = str(self.resolve(enc.get(key, "Identity")))
                if name == "Identity":
                    return "identity"
                if name == "StdCF":
                    return methods[cfm]
                raise NotImplementedError(
                    f"encrypted PDF: named crypt filter /{name} not supported"
                )

            stm_m, str_m = cls_method("StmF"), cls_method("StrF")
        o_val = self.resolve(enc["O"]).encode("latin-1")
        u_val = self.resolve(enc["U"]).encode("latin-1")
        if v5:
            # AES-256 (ISO 32000-2 §7.6.4): authenticate the EMPTY
            # password as user then owner; /UE//OE hold the file key
            ue_val = self.resolve(enc.get("UE", "")).encode("latin-1")
            oe_val = self.resolve(enc.get("OE", "")).encode("latin-1")
            if len(u_val) < 48 or len(ue_val) < 32:
                raise ValueError("encrypted PDF: /V 5 requires 48-byte /U and /UE")
            key = pdf_crypt.authenticate_v5(b"", r, u_val, ue_val, o_val, oe_val)
            if key is None:
                raise NotImplementedError(
                    "encrypted PDF: non-empty user password (password-protected)"
                )
            perms_s = self.resolve(enc.get("Perms", ""))
            if perms_s:
                dec = pdf_crypt.aes_ecb_decrypt_block(
                    key, perms_s.encode("latin-1")[:16]
                )
                if dec[9:12] != b"adb":
                    raise ValueError(
                        "encrypted PDF: /Perms check failed (corrupt "
                        "encryption dictionary or wrong file key)"
                    )
            self._crypt = (key, stm_m, str_m)
            return
        length = int(self.resolve(enc.get("Length", 40)))
        p = int(self.resolve(enc["P"]))
        enc_meta = bool(self.resolve(enc.get("EncryptMetadata", True)))
        ids = self.resolve(self.trailer.get("ID"))
        id0 = ids[0].encode("latin-1") if isinstance(ids, list) and ids else b""
        key = pdf_crypt.compute_encryption_key(
            b"", o_val, p, id0, r, length, enc_meta
        )
        expect_u = pdf_crypt.compute_u_value(key, id0, r)
        ok = expect_u == u_val[:32] if r == 2 else expect_u[:16] == u_val[:16]
        if not ok:
            raise NotImplementedError(
                "encrypted PDF: non-empty user password (password-protected)"
            )
        self._crypt = (key, stm_m, str_m)

    def _decrypt_bytes(self, raw: bytes, num: int, gen: int, method: str) -> bytes:
        from . import pdf_crypt

        if method == "identity" or not raw:
            return raw
        if method == "aes256":
            # V5: file key directly, no per-object derivation (§7.6.4)
            return pdf_crypt.aes_cbc_decrypt(self._crypt[0], raw)
        key = pdf_crypt.object_key(self._crypt[0], num, gen, aes=method == "aes")
        if method == "aes":
            return pdf_crypt.aes_cbc_decrypt(key, raw)
        return pdf_crypt.rc4(key, raw)

    def _decrypt_strings(self, val, num: int, gen: int):
        """Recursively decrypt literal strings in a direct object
        (names are str subclasses and stay untouched; strings inside
        /ObjStm members are NOT individually encrypted, §7.5.7)."""
        if isinstance(val, _Name):
            return val
        if isinstance(val, str):
            return self._decrypt_bytes(
                val.encode("latin-1"), num, gen, self._crypt[2]
            ).decode("latin-1")
        if isinstance(val, list):
            return [self._decrypt_strings(x, num, gen) for x in val]
        if isinstance(val, dict):
            return {k: self._decrypt_strings(x, num, gen) for k, x in val.items()}
        return val

    # -- xref / trailer ----------------------------------------------------
    def _read_xref_chain(self) -> dict:
        data = self._data
        tail = data[-256:]
        # the LAST startxref wins: an incrementally-updated PDF appends
        # a new xref + trailer + startxref after the old %%EOF, and a
        # small update can leave both markers inside the tail window
        matches = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not matches:
            raise ValueError("PDF missing startxref")
        pos = int(matches[-1].group(1))
        trailer: dict = {}
        seen: set[int] = set()
        while pos not in seen:
            seen.add(pos)
            pos0 = _skip_ws(data, pos)
            if data.startswith(b"xref", pos0):
                t, entries = self._read_classic_xref(pos0)
                if "XRefStm" in t:
                    # hybrid-reference file (7.5.8.4): the stream's
                    # entries take precedence over the SAME revision's
                    # table — the table marks hidden objects FREE so
                    # legacy readers skip them, while the XRefStm holds
                    # their real (often type-2 ObjStm) locations
                    self._read_xref_stream(_skip_ws(data, int(t["XRefStm"])))
                for num, val in entries:
                    self._offsets.setdefault(num, val)
            else:
                t = self._read_xref_stream(pos0)
            if not trailer:
                trailer = t  # first (newest) trailer wins
            if "Prev" in t:
                pos = int(t["Prev"])  # earlier section: fills only missing objs
            else:
                break
        return trailer

    def _read_classic_xref(self, pos0: int) -> tuple[dict, list[tuple]]:
        """→ (trailer, entries) with entries DEFERRED so the caller can
        order them against a hybrid file's /XRefStm."""
        data = self._data
        entries: list[tuple] = []
        p = _skip_ws(data, pos0 + 4)
        while not data.startswith(b"trailer", p):
            m2 = re.match(rb"(\d+)\s+(\d+)", data[p : p + 40])
            if m2 is None:
                raise ValueError(f"bad xref subsection header at {p}")
            start, count = int(m2.group(1)), int(m2.group(2))
            p = _skip_ws(data, p + m2.end())
            for i in range(count):
                entry = data[p : p + 20]
                off, _gen, kind = entry[:10], entry[11:16], entry[17:18]
                if kind == b"n":
                    entries.append((start + i, int(off)))
                elif kind == b"f":
                    # a newer free entry must MASK an older in-use
                    # entry (incremental-update deletion); None means
                    # "absent" to _load, and setdefault keeps the
                    # newest revision's verdict
                    entries.append((start + i, None))
                p += 20
            p = _skip_ws(data, p)
        t, _ = _parse_value(data, p + len(b"trailer"))
        return t, entries

    def _read_xref_stream(self, pos0: int) -> dict:
        """PDF 1.5+ cross-reference stream (/Type /XRef): the stream's
        dict doubles as the trailer; rows are [type, field2, field3]
        big-endian records of /W widths over the /Index subsections."""
        data = self._data
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", data[pos0 : pos0 + 40])
        if m is None:
            raise ValueError(
                f"startxref offset {pos0} is neither an xref table nor an object"
            )
        d, p = _parse_value(data, pos0 + m.end())
        if not isinstance(d, dict) or d.get("Type") != "XRef":
            raise ValueError("startxref object is not a /Type /XRef stream")
        p = _skip_ws(data, p)
        if not data.startswith(b"stream", p):
            raise ValueError("xref stream object has no stream data")
        p += len(b"stream")
        if data.startswith(b"\r\n", p):
            p += 2
        elif data.startswith(b"\n", p):
            p += 1
        # /Length must be direct here (we can't resolve refs before the
        # xref exists); fall back to scanning for endstream if it isn't
        length = d.get("Length")
        if isinstance(length, int):
            raw = data[p : p + length]
        else:
            end = data.index(b"endstream", p)
            raw = data[p:end]
            # strip at most ONE EOL before 'endstream' — a Flate
            # payload may legitimately END in 0x0A/0x0D bytes
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
        content = _apply_stream_filters(d, raw)
        widths = [int(x) for x in d["W"]]
        if len(widths) != 3:
            raise ValueError(f"xref stream /W must have 3 entries, got {widths}")
        size = int(d["Size"])
        index = [int(x) for x in d.get("Index", [0, size])]
        rowlen = sum(widths)
        nrows = sum(index[1::2])
        if len(content) < nrows * rowlen:
            raise ValueError("xref stream data shorter than /Index claims")
        rows = np.frombuffer(content[: nrows * rowlen], dtype=np.uint8).reshape(
            nrows, rowlen
        )
        # big-endian multi-byte fields; a zero-width type field means
        # "type 1" (7.5.8.3)
        fields = []
        at = 0
        for wi in widths:
            f = np.zeros(nrows, dtype=np.int64)
            for b in range(wi):
                f = (f << 8) | rows[:, at + b]
            at += wi
            fields.append(f)
        types = fields[0] if widths[0] else np.ones(nrows, dtype=np.int64)
        r = 0
        for start, count in zip(index[0::2], index[1::2]):
            for i in range(count):
                num = start + i
                t, f2, f3 = int(types[r]), int(fields[1][r]), int(fields[2][r])
                r += 1
                if t == 0:
                    self._offsets.setdefault(num, None)
                elif t == 1:
                    self._offsets.setdefault(num, f2)
                elif t == 2:
                    self._offsets.setdefault(num, ("objstm", f2, f3))
                # types > 2: reserved — treated as absent (spec 7.5.8.3)
        return d

    # -- objects -----------------------------------------------------------
    def resolve(self, v):
        while isinstance(v, _Ref):
            v = self._load(v.num)
        return v

    def _load(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self._offsets.get(num)
        if off is None:
            return None
        if isinstance(off, tuple):  # ("objstm", stream number, index)
            val = self._load_from_objstm(off[1], off[2], num)
            self._cache[num] = val
            return val
        data = self._data
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", data[off : off + 40])
        if m is None or int(m.group(1)) != num:
            raise ValueError(f"object {num} not at xref offset {off}")
        val, pos = _parse_value(data, off + m.end())
        pos = _skip_ws(data, pos)
        if data.startswith(b"stream", pos):
            pos += len(b"stream")
            if data.startswith(b"\r\n", pos):
                pos += 2
            elif data.startswith(b"\n", pos):
                pos += 1
            length = self.resolve(val["Length"])  # /Length may be indirect
            val = (val, data[pos : pos + int(length)])  # (dict, raw stream)
        if self._crypt is not None and num != self._encrypt_num:
            gen = int(m.group(2))
            if isinstance(val, tuple):
                d, raw = val
                # xref streams are never encrypted (§7.5.8.2); they are
                # normally parsed before _crypt exists, but guard the
                # referenced-object path too
                if d.get("Type") != "XRef":
                    raw = self._decrypt_bytes(raw, num, gen, self._crypt[1])
                val = (self._decrypt_strings(d, num, gen), raw)
            else:
                val = self._decrypt_strings(val, num, gen)
        self._cache[num] = val
        return val

    def _resolved_filter_dict(self, d: dict) -> dict:
        """Copy of a stream dict with /Filter and /DecodeParms deep-
        resolved one level (values may legally be indirect everywhere
        except the xref stream itself)."""
        out = dict(d)
        for key in ("Filter", "DecodeParms"):
            v = self.resolve(out.get(key))
            if isinstance(v, list):
                v = [self.resolve(x) for x in v]
            if v is not None:
                out[key] = v
            else:
                out.pop(key, None)
        return out

    def _load_from_objstm(self, stm_num: int, idx: int, want_num: int):
        """Load one object from a /Type /ObjStm compressed object
        stream. Decoded content + header pairs are cached per stream so
        N sibling objects cost one inflate."""
        cached = self._objstm_cache.get(stm_num)
        if cached is None:
            if stm_num in self._objstm_loading:
                # e.g. an ObjStm whose /DecodeParms ref points INTO the
                # same stream — fail loudly instead of recursing forever
                raise ValueError(f"circular object stream reference {stm_num}")
            self._objstm_loading.add(stm_num)
            try:
                cached = self._objstm_decode(stm_num)
            finally:
                self._objstm_loading.discard(stm_num)
            if len(self._objstm_cache) < 256:  # bound pathological files
                self._objstm_cache[stm_num] = cached
        pairs, content, first = cached
        if idx >= len(pairs):
            raise ValueError(
                f"object stream {stm_num} has no entry {idx} (N={len(pairs)})"
            )
        onum, ooff = pairs[idx]
        if onum != want_num:
            raise ValueError(
                f"object stream {stm_num} entry {idx} is object {onum}, "
                f"xref said {want_num}"
            )
        val, _ = _parse_value(content, first + ooff)
        return val

    def _objstm_decode(self, stm_num: int) -> tuple[list[tuple[int, int]], bytes, int]:
        obj = self._load(stm_num)
        if not (isinstance(obj, tuple) and len(obj) == 2):
            raise ValueError(f"object stream {stm_num} is not a stream")
        d, raw = obj
        if d.get("Type") != "ObjStm":
            raise ValueError(f"object {stm_num} is not /Type /ObjStm")
        content = _apply_stream_filters(self._resolved_filter_dict(d), raw)
        n = int(self.resolve(d["N"]))
        first = int(self.resolve(d["First"]))
        ints = [int(x) for x in content[:first].split()]
        pairs = list(zip(ints[0::2], ints[1::2]))[:n]
        return pairs, content, first

    # -- pages -------------------------------------------------------------
    def pages(self) -> list[dict]:
        """Page dicts in document order (walks nested /Pages trees).
        The inheritable /Rotate attribute (7.7.3.4) flows down from
        /Pages nodes into each page dict unless the page overrides
        it."""
        root = self.resolve(self.trailer["Root"])
        out: list[dict] = []

        def walk(node_ref, rotate):
            node = self.resolve(node_ref)
            if "Rotate" in node:
                rotate = self.resolve(node["Rotate"])
            if node.get("Type") == "Pages" or "Kids" in node:
                for kid in self.resolve(node["Kids"]):
                    walk(kid, rotate)
            else:
                if rotate is not None and "Rotate" not in node:
                    node = dict(node, Rotate=rotate)
                out.append(node)

        walk(root["Pages"], None)
        return out

    def page_image(self, page: dict) -> np.ndarray:
        """First image of a page → ndarray ((H,W) grey or (H,W,3)):
        the first image XObject, else the first INLINE image (BI..ID
        ..EI in the content stream — the layout small born-digital
        writers emit). The page's /Rotate attribute (90-degree
        multiples, clockwise on display; the scanned-sideways layout)
        is applied, so the array is the page AS DISPLAYED."""
        img = None
        res = self.resolve(page.get("Resources", {}))
        xobjects = self.resolve(res.get("XObject", {}))
        for _name, ref in xobjects.items():
            obj = self.resolve(ref)
            if not (isinstance(obj, tuple) and len(obj) == 2):
                continue
            d, raw = obj
            if d.get("Subtype") != "Image":
                continue
            img = self._image_from_dict(d, raw)
            break
        if img is None:
            img = self._inline_image(page)
        if img is None:
            raise ValueError("PDF page has no image XObject")
        rot = self.resolve(page.get("Rotate", 0)) or 0
        if rot % 90:
            raise ValueError(f"PDF /Rotate {rot} is not a multiple of 90")
        if rot % 360:
            img = np.ascontiguousarray(np.rot90(img, k=-(rot // 90)))
        return img

    def _image_from_dict(self, d: dict, raw: bytes) -> np.ndarray:
        """Image dict + encoded stream bytes → ndarray (shared by
        image XObjects and inline images)."""
        if True:
            filts, parms = _filter_chain(self._resolved_filter_dict(d))
            for f, pm in zip(filts, parms):
                if f == "DCTDecode":
                    # JPEG-compressed image XObject — the common layout
                    # for scanned PDFs; decoded by the engine's own
                    # codec (functions/jpeg.py: baseline incl. 4:2:0
                    # subsampling, restart intervals, progressive)
                    from .jpeg import decode_jpeg

                    return decode_jpeg(raw)
                if f == "JPXDecode":
                    # JPEG 2000 image XObject (PDF/A archival scans) —
                    # decoded by the engine's own lossless J2K codec
                    # (functions/jp2.py; JP2 box or raw codestream)
                    from .jp2 import decode_jp2

                    return decode_jp2(raw)
                if f == "JBIG2Decode":
                    # JBIG2 image XObject — the born-scanned-PDF
                    # bilevel layout (functions/jbig2.py: arithmetic
                    # generic regions, all templates + TPGDON, or
                    # MMR). /JBIG2Globals carries shared segments,
                    # prepended per PDF 32000 7.4.7. Decoded 1-bits
                    # are black, like CCITT with BlackIs1.
                    from .jbig2 import decode_jbig2

                    g = b""
                    if isinstance(pm, dict) and pm.get("JBIG2Globals") is not None:
                        gobj = self.resolve(pm["JBIG2Globals"])
                        if not (isinstance(gobj, tuple) and len(gobj) == 2):
                            raise ValueError("JBIG2Globals is not a stream")
                        gd, graw = gobj
                        g = _apply_stream_filters(gd, graw)
                    bits = decode_jbig2(raw, g)
                    return ((1 - bits) * 255).astype(np.uint8)
                if f == "CCITTFaxDecode":
                    # Group 3/4 fax image XObject — the archival-scan
                    # layout (functions/ccitt.py). BlackIs1 picks the
                    # sample polarity of the decoded stream; with the
                    # default Decode array, sample 0 renders black.
                    from .ccitt import ccitt_decode

                    pmr = {
                        str(k): self.resolve(v) for k, v in pm.items()
                    } if isinstance(pm, dict) else {}
                    cols = int(pmr.get("Columns", 1728))
                    nrows = int(pmr.get("Rows", 0)) or int(
                        self.resolve(d["Height"])
                    )
                    fax = ccitt_decode(
                        raw,
                        cols,
                        nrows,
                        k=int(pmr.get("K", 0)),
                        byte_align=bool(pmr.get("EncodedByteAlign", False)),
                    )
                    samples = fax if pmr.get("BlackIs1") else 1 - fax
                    return (samples * 255).astype(np.uint8)
                raw = _apply_one_filter(f, raw, pm)
            w, h = int(self.resolve(d["Width"])), int(self.resolve(d["Height"]))
            decode = self.resolve(d.get("Decode"))
            if decode is not None:
                decode = [float(self.resolve(x)) for x in decode]
            if self.resolve(d.get("ImageMask")):
                # stencil mask (8.9.6.7): 1-bit, default Decode [0 1]
                # paints where the sample is 0 → black on the page
                vals = _unpack_samples(raw, w, h, 1, 1)[..., 0]
                if decode == [1, 0]:
                    vals = 1 - vals
                return (vals * 255).astype(np.uint8)
            bpc = int(self.resolve(d.get("BitsPerComponent", 8)))
            spec = self._image_colorspace(d.get("ColorSpace", _Name("DeviceGray")))
            if spec[0] == "indexed":
                _, base, hival, lookup = spec
                idx = _unpack_samples(raw, w, h, bpc, 1)[..., 0]
                if decode is not None and decode != [0, (1 << bpc) - 1]:
                    raise NotImplementedError(
                        "PDF /Decode remap on an /Indexed image not supported"
                    )
                if isinstance(base, tuple):
                    # /Indexed over /Separation|/DeviceN: palette entries
                    # are 8-bit tint codes fed through the transform
                    _, alt, nin, fnobj = base
                    if len(lookup) < (hival + 1) * nin:
                        raise ValueError("PDF /Indexed lookup table truncated")
                    codes = np.frombuffer(
                        lookup[: (hival + 1) * nin], dtype=np.uint8
                    ).reshape(hival + 1, nin)
                    pal = self._tint_lut(
                        fnobj, codes.astype(np.float64) / 255.0, alt
                    )
                    base = alt
                else:
                    nc = {"gray": 1, "rgb": 3, "cmyk": 4}[base]
                    if len(lookup) < (hival + 1) * nc:
                        raise ValueError("PDF /Indexed lookup table truncated")
                    pal = np.frombuffer(
                        lookup[: (hival + 1) * nc], dtype=np.uint8
                    ).reshape(hival + 1, nc).astype(np.float64)
                # out-of-range indices clamp to the nearest valid value
                # (8.9.6.3), the spec-sanctioned reading
                comps = pal[np.clip(idx, 0, hival)]
            elif spec[0] == "tint":
                # Separation / DeviceN (8.6.6): tint samples feed the
                # transform function into the alternate device space —
                # evaluated once per possible sample code (1-colorant
                # LUT) or once per UNIQUE colorant tuple (DeviceN),
                # never per pixel
                _, base, nin, fnobj = spec
                vals = _unpack_samples(raw, w, h, bpc, nin)
                maxv = (1 << bpc) - 1
                if decode is not None and decode != [0.0, 1.0] * nin:
                    raise NotImplementedError(
                        "PDF /Decode remap on a tint image not supported"
                    )
                if nin == 1:
                    lut = self._tint_lut(
                        fnobj,
                        (np.arange(maxv + 1, dtype=np.float64) / maxv)[:, None],
                        base,
                    )
                    comps = lut[vals[..., 0]]
                else:
                    codes = vals.reshape(-1, nin)
                    uniq, inv = np.unique(codes, axis=0, return_inverse=True)
                    lut = self._tint_lut(
                        fnobj, uniq.astype(np.float64) / maxv, base
                    )
                    comps = lut[inv].reshape(h, w, lut.shape[1])
            else:
                nc = {"gray": 1, "rgb": 3, "cmyk": 4}[spec[0]]
                vals = _unpack_samples(raw, w, h, bpc, nc)
                maxv = (1 << bpc) - 1
                if decode is None:
                    decode = [0.0, 1.0] * nc
                if len(decode) != 2 * nc:
                    raise ValueError("PDF /Decode length mismatches the color space")
                comps = np.empty((h, w, nc), dtype=np.float64)
                for c in range(nc):
                    dmin, dmax = decode[2 * c], decode[2 * c + 1]
                    comps[..., c] = (
                        dmin + vals[..., c] * ((dmax - dmin) / maxv)
                    ) * 255.0
                base = spec[0]
            comps = np.clip(np.round(comps), 0, 255).astype(np.uint8)
            if base == "gray":
                return comps[..., 0]
            if base == "rgb":
                return comps
            from .jpeg import _cmyk_to_rgb  # true (non-inverted) CMYK

            return _cmyk_to_rgb(comps, adobe=None)

    _INLINE_KEYS = {
        "W": "Width", "H": "Height", "BPC": "BitsPerComponent",
        "CS": "ColorSpace", "F": "Filter", "D": "Decode",
        "DP": "DecodeParms", "IM": "ImageMask", "I": "Interpolate",
    }
    _INLINE_NAMES = {
        "G": "DeviceGray", "RGB": "DeviceRGB", "CMYK": "DeviceCMYK",
        "I": "Indexed",
        "AHx": "ASCIIHexDecode", "A85": "ASCII85Decode",
        "LZW": "LZWDecode", "Fl": "FlateDecode", "RL": "RunLengthDecode",
        "CCF": "CCITTFaxDecode", "DCT": "DCTDecode",
    }

    def _inline_expand(self, v):
        """Expand the 8.9.7 inline-image abbreviations inside a parsed
        value (names in color spaces and filter lists)."""
        if isinstance(v, _Name):
            return _Name(self._INLINE_NAMES.get(str(v), str(v)))
        if isinstance(v, list):
            return [self._inline_expand(x) for x in v]
        if isinstance(v, dict):
            return {k: self._inline_expand(x) for k, x in v.items()}
        return v

    def _inline_image(self, page: dict) -> np.ndarray | None:
        """First inline image (BI .. ID <data> EI, 8.9.7) of the
        page's content stream(s) → ndarray, or None if there is none.
        Abbreviated keys and names expand to their long twins and the
        image decodes through the same dict seam as an XObject.
        Unfiltered data length is computed from the image dict; for
        filtered data every whitespace-delimited EI candidate is tried
        until one decodes."""
        content = self.resolve(page.get("Contents"))
        chunks = []
        for c in content if isinstance(content, list) else [content]:
            c = self.resolve(c)
            if isinstance(c, tuple) and len(c) == 2:
                chunks.append(
                    _apply_stream_filters(self._resolved_filter_dict(c[0]), c[1])
                )
        if not chunks:
            return None
        data = b"\n".join(chunks)
        ws = b"\x00\t\n\x0c\r "
        start = 0
        while True:
            i = data.find(b"BI", start)
            if i < 0:
                return None
            start = i + 2
            if i and data[i - 1 : i] not in (
                b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" ", b">", b"]",
            ):
                continue
            try:
                d: dict = {}
                pos = i + 2
                while True:
                    pos = _skip_ws(data, pos)
                    if data[pos : pos + 2] == b"ID" and (
                        pos + 2 >= len(data) or data[pos + 2] in ws
                    ):
                        pos += 3  # ID + the single whitespace byte
                        break
                    key, pos = _parse_value(data, pos)
                    if not isinstance(key, _Name):
                        raise ValueError("inline image dict key is not a name")
                    val, pos = _parse_value(data, pos)
                    d[self._INLINE_KEYS.get(str(key), str(key))] = (
                        self._inline_expand(val)
                    )
                if "Width" not in d or "Height" not in d:
                    raise ValueError("inline image missing W/H")
                if not d.get("Filter"):
                    # raw samples: exact byte length from the dict
                    if d.get("ImageMask"):
                        nc, bpc = 1, 1
                    else:
                        spec = self._image_colorspace(
                            d.get("ColorSpace", _Name("DeviceGray"))
                        )
                        if spec[0] == "indexed":
                            nc = 1
                        elif spec[0] == "tint":
                            nc = spec[2]
                        else:
                            nc = {"gray": 1, "rgb": 3, "cmyk": 4}[spec[0]]
                        bpc = int(d.get("BitsPerComponent", 8))
                    rowbytes = (int(d["Width"]) * nc * bpc + 7) // 8
                    end = pos + rowbytes * int(d["Height"])
                    return self._image_from_dict(d, data[pos:end])
                j = pos
                while True:  # filtered: try each plausible EI
                    j = data.find(b"EI", j)
                    if j < 0:
                        raise ValueError("inline image data missing EI")
                    if (
                        data[j - 1] in ws
                        and (j + 2 >= len(data) or data[j + 2] in ws)
                    ):
                        try:
                            return self._image_from_dict(d, data[pos : j - 1])
                        except Exception:
                            pass
                    j += 2
            except ValueError:
                continue

    def _eval_tint(self, fn, t: np.ndarray) -> np.ndarray:
        """One-input convenience wrapper over _eval_function."""
        return self._eval_function(fn, t.astype(np.float64)[:, None])

    def _tint_lut(self, fnobj, X: np.ndarray, base: str) -> np.ndarray:
        """Tint tuples X (npts, nin) → (npts, nc) device components
        scaled to 0..255, validating the transform's output arity
        against the alternate space."""
        nc = {"gray": 1, "rgb": 3, "cmyk": 4}[base]
        out = self._eval_function(fnobj, X)
        if out.shape[1] != nc:
            raise ValueError(
                f"PDF tint transform yields {out.shape[1]} values "
                f"for a {nc}-component alternate space"
            )
        return np.clip(out, 0.0, 1.0) * 255.0

    def _eval_function(self, fn, X: np.ndarray) -> np.ndarray:
        """Evaluate a PDF function (7.10) on X of shape (npts, nin) →
        (npts, n_out) float outputs. Types: 2 (exponential
        interpolation — the common tint transform), 0 (m-D sampled
        streams at 1–32 bits with multilinear interpolation), 3
        (stitching over the others) and 4 (PostScript calculator,
        vectorized — functions/pdf_function.py). Types 2/3 are
        one-input by definition (7.10.3–4)."""
        fn = self.resolve(fn)
        raw = None
        if isinstance(fn, tuple) and len(fn) == 2:
            d, raw = fn
            raw = _apply_stream_filters(self._resolved_filter_dict(d), raw)
        elif isinstance(fn, dict):
            d = fn
        else:
            raise ValueError("PDF tint transform is not a function")
        ftype = int(self.resolve(d.get("FunctionType", -1)))
        domain = [
            float(self.resolve(x))
            for x in self.resolve(d.get("Domain", [0, 1]))
        ]
        nin = X.shape[1]
        if len(domain) != 2 * nin:
            raise ValueError(
                f"PDF function /Domain has {len(domain)} numbers for "
                f"{nin} inputs"
            )
        X = X.astype(np.float64)
        for i in range(nin):
            X[:, i] = np.clip(X[:, i], domain[2 * i], domain[2 * i + 1])
        if ftype in (2, 3) and nin != 1:
            raise ValueError(
                f"PDF type-{ftype} functions take exactly one input"
            )
        t = X[:, 0]
        if ftype == 2:
            c0 = np.array(
                [float(self.resolve(x)) for x in self.resolve(d.get("C0", [0.0]))]
            )
            c1 = np.array(
                [float(self.resolve(x)) for x in self.resolve(d.get("C1", [1.0]))]
            )
            n = float(self.resolve(d.get("N", 1)))
            out = c0 + (t**n)[:, None] * (c1 - c0)
            return self._clip_to_range(out, d)
        if ftype == 0:
            if raw is None:
                raise ValueError("PDF sampled function without a stream")
            size = [int(self.resolve(x)) for x in self.resolve(d["Size"])]
            if len(size) != nin:
                raise ValueError(
                    "PDF sampled function /Size rank mismatches its /Domain"
                )
            if nin > 6:
                raise NotImplementedError(
                    f"PDF sampled function with {nin} inputs not supported "
                    "(max 6 — 64 interpolation corners)"
                )
            bps = int(self.resolve(d["BitsPerSample"]))
            if bps not in (1, 2, 4, 8, 12, 16, 24, 32):
                raise ValueError(
                    f"PDF sampled function BitsPerSample {bps} is illegal"
                )
            rng = [float(self.resolve(x)) for x in self.resolve(d["Range"])]
            nout = len(rng) // 2
            count = nout
            for s in size:
                if s < 1:
                    raise ValueError("PDF sampled function /Size entry < 1")
                count *= s
            flat = _unpack_bits_flat(raw, count, bps) / float((1 << bps) - 1)
            # first input varies fastest (7.10.2) → it is the LAST
            # grid axis after this reshape
            arr = flat.reshape(list(reversed(size)) + [nout])
            enc = [float(self.resolve(x)) for x in self.resolve(
                d.get("Encode", [v for s in size for v in (0, s - 1)])
            )]
            if len(enc) != 2 * nin:
                raise ValueError("PDF sampled function /Encode length mismatch")
            base = np.zeros((len(t), nin), dtype=np.int64)
            frac = np.zeros((len(t), nin))
            for i in range(nin):
                lo, hi = domain[2 * i], domain[2 * i + 1]
                e = enc[2 * i] + (X[:, i] - lo) * (
                    (enc[2 * i + 1] - enc[2 * i]) / max(hi - lo, 1e-12)
                )
                e = np.clip(e, 0, size[i] - 1)
                f = np.minimum(np.floor(e), max(size[i] - 2, 0))
                base[:, i] = f.astype(np.int64)
                frac[:, i] = e - f
            out = np.zeros((len(t), nout))
            for corner in range(1 << nin):
                w = np.ones(len(t))
                idx = []
                for i in range(nin):
                    bit = (corner >> i) & 1
                    w = w * (frac[:, i] if bit else 1.0 - frac[:, i])
                    idx.append(np.minimum(base[:, i] + bit, size[i] - 1))
                out += w[:, None] * arr[tuple(reversed(idx))]
            # /Decode maps samples into the output range (default =
            # /Range); linear, so applying it after the (linear)
            # interpolation is identical
            dec = self.resolve(d.get("Decode"))
            dec = rng if dec is None else [float(self.resolve(x)) for x in dec]
            if len(dec) != 2 * nout:
                raise ValueError("PDF sampled function /Decode length mismatch")
            res = np.empty_like(out)
            for c in range(nout):
                dmin, dmax = dec[2 * c], dec[2 * c + 1]
                res[:, c] = np.clip(
                    dmin + out[:, c] * (dmax - dmin),
                    min(rng[2 * c], rng[2 * c + 1]),
                    max(rng[2 * c], rng[2 * c + 1]),
                )
            return res
        if ftype == 3:
            fns = self.resolve(d["Functions"])
            bounds = [float(self.resolve(x)) for x in self.resolve(d.get("Bounds", []))]
            enc = [float(self.resolve(x)) for x in self.resolve(
                d.get("Encode", [0, 1] * len(fns))
            )]
            edges = [domain[0]] + bounds + [domain[1]]
            idx = np.searchsorted(np.array(bounds), t, side="right")
            out = None
            for k in range(len(fns)):
                mask = idx == k
                if not mask.any():
                    continue
                lo, hi = edges[k], edges[k + 1]
                tk = enc[2 * k] + (t[mask] - lo) * (
                    (enc[2 * k + 1] - enc[2 * k]) / max(hi - lo, 1e-12)
                )
                sub = self._eval_tint(fns[k], tk)
                if out is None:
                    out = np.zeros((len(t), sub.shape[1]))
                out[mask] = sub
            if out is None:
                raise ValueError("PDF stitching function with no subfunctions")
            return self._clip_to_range(out, d)
        if ftype == 4:
            if raw is None:
                raise ValueError("PDF calculator function without a stream")
            from .pdf_function import eval_calculator, parse_calculator

            rng = [float(self.resolve(x)) for x in self.resolve(d["Range"])]
            nout = len(rng) // 2
            st = eval_calculator(parse_calculator(raw), X)
            if len(st) < nout:
                raise ValueError(
                    "PDF type-4 function leaves fewer stack values than "
                    "its /Range declares"
                )
            out = np.empty((len(X), nout))
            for c in range(nout):
                a = st[len(st) - nout + c]
                if isinstance(a, list):
                    raise ValueError("PDF type-4 function returned a procedure")
                out[:, c] = np.clip(
                    a.astype(np.float64),
                    min(rng[2 * c], rng[2 * c + 1]),
                    max(rng[2 * c], rng[2 * c + 1]),
                )
            return out
        raise ValueError(f"PDF function type {ftype} is illegal")

    def _clip_to_range(self, out: np.ndarray, d: dict) -> np.ndarray:
        """Clip function outputs to /Range when present (7.10.1; types
        2 and 3, where /Range is optional)."""
        rng = self.resolve(d.get("Range"))
        if rng is None:
            return out
        rng = [float(self.resolve(x)) for x in rng]
        if len(rng) != 2 * out.shape[1]:
            raise ValueError("PDF function /Range length mismatch")
        for c in range(out.shape[1]):
            lo = min(rng[2 * c], rng[2 * c + 1])
            hi = max(rng[2 * c], rng[2 * c + 1])
            out[:, c] = np.clip(out[:, c], lo, hi)
        return out

    def _image_colorspace(self, v):
        """Image /ColorSpace entry → ("gray"|"rgb"|"cmyk",) or
        ("indexed", base, hival, lookup bytes). Names resolve by
        family; [/ICCBased stream] resolves by the stream's /N
        component count (the profile itself is advisory — the
        device-space reading every lightweight renderer uses);
        /CalGray and /CalRGB map to their device twins (samples
        taken as device values, the same approximation)."""
        v = self.resolve(v)
        if isinstance(v, str):
            fam = {
                "DeviceGray": "gray", "CalGray": "gray", "G": "gray",
                "DeviceRGB": "rgb", "CalRGB": "rgb", "RGB": "rgb",
                "DeviceCMYK": "cmyk", "CMYK": "cmyk",
            }.get(str(v))
            if fam is None:
                raise NotImplementedError(f"PDF color space /{v} not supported")
            return (fam,)
        if isinstance(v, list) and v:
            kind = str(self.resolve(v[0]))
            if kind in ("CalGray", "CalRGB"):
                return ("gray" if kind == "CalGray" else "rgb",)
            if kind == "ICCBased":
                strm = self.resolve(v[1]) if len(v) > 1 else None
                if not (isinstance(strm, tuple) and len(strm) == 2):
                    raise ValueError("PDF /ICCBased color space is not a stream")
                n = int(self.resolve(strm[0].get("N", 0)))
                fam = {1: "gray", 3: "rgb", 4: "cmyk"}.get(n)
                if fam is None:
                    raise NotImplementedError(
                        f"PDF /ICCBased color space with N={n} not supported"
                    )
                return (fam,)
            if kind in ("Separation", "DeviceN") and len(v) >= 4:
                names = self.resolve(v[1])
                nin = 1 if isinstance(names, str) else len(names)
                if not 1 <= nin <= 32:
                    raise ValueError(
                        f"PDF /DeviceN with {nin} colorants is illegal"
                    )
                base = self._image_colorspace(v[2])
                if base[0] not in ("gray", "rgb", "cmyk"):
                    raise NotImplementedError(
                        "PDF tint alternate space must be a device family"
                    )
                return ("tint", base[0], nin, self.resolve(v[3]))
            if kind in ("Indexed", "I") and len(v) == 4:
                base = self._image_colorspace(v[1])
                if base[0] == "indexed":
                    raise ValueError("PDF /Indexed base cannot be /Indexed")
                hival = int(self.resolve(v[2]))
                lut = self.resolve(v[3])
                if isinstance(lut, tuple) and len(lut) == 2:
                    lut = _apply_stream_filters(
                        self._resolved_filter_dict(lut[0]), lut[1]
                    )
                elif isinstance(lut, str):
                    lut = lut.encode("latin-1")
                if not isinstance(lut, (bytes, bytearray)):
                    raise ValueError("PDF /Indexed lookup is not string or stream")
                # tint bases keep their full spec tuple (the palette
                # holds tint codes the decode path maps through the
                # transform); device bases keep the family string
                return (
                    "indexed",
                    base if base[0] == "tint" else base[0],
                    hival,
                    bytes(lut),
                )
            raise NotImplementedError(
                f"PDF color space family /{kind} not supported"
            )
        raise ValueError(f"PDF /ColorSpace entry {type(v).__name__} is malformed")

    def info_title(self) -> str | None:
        info = self.resolve(self.trailer.get("Info"))
        if isinstance(info, dict) and isinstance(info.get("Title"), str):
            return _decode_text_string(info["Title"])
        return None


def _decode_text_string(t: str) -> str:
    """PDF text string (7.9.2.2) → unicode: UTF-16BE with BOM (the
    standard non-ASCII layout) or UTF-8 with BOM; else PDFDocEncoding
    (parsed as latin-1 bytes)."""
    if t[:2] == "\xfe\xff":
        return t.encode("latin-1").decode("utf-16-be")[1:]
    if t[:3] == "\xef\xbb\xbf":
        return t.encode("latin-1").decode("utf-8")[1:]
    return t


@loud_decode("PDF")
def decode_pdf(data: bytes) -> list[np.ndarray]:
    """PDF bytes → list of page images in document order."""
    doc = PdfDocument(data)
    return [doc.page_image(p) for p in doc.pages()]


def _split_refs(title: str | None) -> list[str] | None:
    """/Info /Title → ref list. An empty Title is an empty list (the
    zero-page container), absent Title is None (no embedded refs)."""
    if title is None:
        return None
    return title.split("\n") if title else []


@loud_decode("PDF")
def decode_pdf_refs(data: bytes) -> list[str] | None:
    """Embedded page media_refs (newline-joined /Info /Title), if any."""
    return _split_refs(PdfDocument(data).info_title())


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

_PDF_STORE_SCHEMA = T.StructType(
    [
        T.StructField("pdf_ref", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_pages", T.IntegerType(), False),
    ]
)

_PAGE_STORE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def pdf_store_df(
    docs: DataFrame,
    parallelism: int | None = None,
    encrypt: str | None = None,
    mix: bool = False,
) -> DataFrame:
    """input_hint documents → (pdf_ref, payload, n_pages): ONE real PDF
    per document packing its media spans' rendered pages in span order.

    The media-ref list per doc is computed JVM-side (filter/transform
    HOFs — no Python touches docs without media); only the render +
    encode runs in the Arrow-batched UDF. Docs with no media spans are
    pruned before the Python boundary. `parallelism` hash-spreads a
    single-partition docs scan across workers before the UDF (the
    multimodal.png_store_df discipline). `encrypt` forwards to
    encode_pdf (e.g. "aes-256") so the downstream parser's transparent
    empty-password decryption is exercised through the same seam.
    `mix=True` crc32-chooses LOSSLESS writer flavors per document —
    xref table vs 1.5 xref stream + /ObjStm, plain vs rc4-128/aes-128
    encrypted (1/4 of docs), and the per-page flate|Separation|DeviceN
    image mix — so a gate query drives the parser's whole structural
    surface while keeping span goldens byte-identical."""
    if parallelism:
        from ..partitioning import spread

        docs = spread(docs, parallelism, "doc_id")
    refs = (
        docs.select(
            "doc_id",
            F.expr(
                "transform(filter(spans, s -> s.kind = 'media' and s.media_ref is not null),"
                " s -> s.media_ref)"
            ).alias("refs"),
        )
        .where(F.size("refs") > 0)
    )

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..fixtures.render import render_page

        for pdf in batches:
            rows = []
            for doc_id, media_refs in zip(pdf["doc_id"], pdf["refs"]):
                media_refs = list(media_refs)
                pages = [render_page(r) for r in media_refs]
                fmt, xref, enc = "flate", "classic", encrypt
                if mix:
                    hsh = zlib.crc32(b"pdf-doc-flavor:" + str(doc_id).encode())
                    fmt = "mix"
                    xref = "stream" if (hsh >> 4) & 1 else "classic"
                    enc = (None, None, None, None, None, None,
                           "rc4-128", "aes-128")[hsh % 8]
                rows.append(
                    (
                        doc_id,
                        encode_pdf(
                            pages,
                            media_refs,
                            image_format=fmt,
                            xref_format=xref,
                            encrypt=enc,
                        ),
                        len(pages),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _PDF_STORE_SCHEMA.fields])

    return refs.mapInPandas(it, schema=_PDF_STORE_SCHEMA)


def pdf_media_store_df(pdfs: DataFrame) -> DataFrame:
    """(pdf_ref, payload) → (media_ref, payload:PNG bytes) page store.

    The container-unpack operator: parse each PDF once, re-encode each
    page as lossless PNG keyed by its embedded media_ref (fallback:
    '<pdf_ref>#page<i>'). Output feeds extract_spans(media_store=...)
    / image_features_from_bytes_df unchanged — containers and loose
    images meet in the same page-store shape."""
    from .png import encode_png

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pdf_ref, payload in zip(pdf["pdf_ref"], pdf["payload"]):
                doc = PdfDocument(bytes(payload))
                refs = _split_refs(doc.info_title())
                pages = [doc.page_image(p) for p in doc.pages()]
                if refs is None or len(refs) != len(pages):
                    refs = [f"{pdf_ref}#page{i}" for i in range(len(pages))]
                for ref, page in zip(refs, pages):
                    if page.ndim == 3:  # grey pipeline: luma-free mean keeps ints exact
                        page = page[:, :, 0]
                    rows.append((ref, encode_png(page)))
            yield pd.DataFrame(rows, columns=[f.name for f in _PAGE_STORE_SCHEMA.fields])

    return pdfs.select("pdf_ref", "payload").mapInPandas(it, schema=_PAGE_STORE_SCHEMA)


_PDF_TEXT_SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_offset", T.IntegerType(), False),
        T.StructField("span_text", T.StringType(), False),
    ]
)


def pdf_text_store_df(
    docs: DataFrame, parallelism: int | None = None, mix: bool = True
) -> DataFrame:
    """input_hint documents → (pdf_ref, payload, n_pages): ONE
    born-digital PDF per document, each TEXT span a real text page
    (content-stream show operators, functions/pdf.py writer) whose
    page ref carries the span offset. `mix=True` crc32-chooses the
    text layout per page (literal/hex/TJ/positioned-words/CID/
    Differences-remapped/Type3/rotated-CTM) plus
    the xref layout and an encryption quarter per document — the
    whole §9 text surface behind one operator. Span selection runs
    JVM-side (filter/transform HOFs); only the writer runs in the
    Arrow-batched UDF."""
    if parallelism:
        from ..partitioning import spread

        docs = spread(docs, parallelism, "doc_id")
    refs = (
        docs.select(
            "doc_id",
            F.expr(
                "transform(filter(spans, s -> s.kind = 'text' and s.text is not null),"
                " s -> struct(s.offset as offset, s.text as text))"
            ).alias("tspans"),
        )
        .where(F.size("tspans") > 0)
    )

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, tspans in zip(pdf["doc_id"], pdf["tspans"]):
                texts = [s["text"] for s in tspans]
                prefs = [str(s["offset"]) for s in tspans]
                tfmt, xref, enc = "literal", "classic", None
                if mix:
                    hsh = zlib.crc32(
                        b"pdf-textdoc-flavor:" + str(doc_id).encode()
                    )
                    tfmt = "mix"
                    xref = "stream" if (hsh >> 4) & 1 else "classic"
                    enc = (None, None, None, None, None, None,
                           "rc4-128", "aes-128")[hsh % 8]
                rows.append(
                    (
                        doc_id,
                        encode_pdf(
                            texts,
                            prefs,
                            text_format=tfmt,
                            xref_format=xref,
                            encrypt=enc,
                        ),
                        len(texts),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _PDF_STORE_SCHEMA.fields])

    return refs.mapInPandas(it, schema=_PDF_STORE_SCHEMA)


def pdf_text_spans_df(pdfs: DataFrame) -> DataFrame:
    """(pdf_ref, payload) → (doc_id, span_offset, span_text): extract
    the embedded text layer of born-digital PDFs WITHOUT rendering or
    OCR (functions/pdf_text.py state machine). Page refs carry the
    span offsets (the pdf_text_store_df convention); a page with no
    text layer fails loudly — this operator is the text side of the
    hybrid split, image pages belong to pdf_media_store_df."""
    from .pdf_text import page_text

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pdf_ref, payload in zip(pdf["pdf_ref"], pdf["payload"]):
                doc = PdfDocument(bytes(payload))
                refs = _split_refs(doc.info_title())
                pages = doc.pages()
                if refs is None or len(refs) != len(pages):
                    raise ValueError(
                        f"text-store PDF {pdf_ref} lacks page-offset refs"
                    )
                for ref, page in zip(refs, pages):
                    text = page_text(doc, page)
                    if text is None:
                        raise ValueError(
                            f"page {ref} of {pdf_ref} has no text layer"
                        )
                    rows.append((pdf_ref, int(ref), text))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _PDF_TEXT_SPANS_SCHEMA.fields]
            )

    return pdfs.select("pdf_ref", "payload").mapInPandas(
        it, schema=_PDF_TEXT_SPANS_SCHEMA
    )


_HYBRID_UNPACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def pdf_hybrid_store_df(
    docs: DataFrame, parallelism: int | None = None
) -> DataFrame:
    """input_hint documents → (pdf_ref, payload, n_pages): ONE PDF per
    document packing EVERY span as a page — text spans as born-digital
    text pages (text_format='mix'), media spans as rendered image
    pages (lossless image_format='mix') — in span order, page refs
    '<offset>:' / '<offset>:<media_ref>'. With the unpack twin
    (pdf_hybrid_unpack_df) this closes the real-world loop: a document
    exists ONLY as its PDF, and the engine recovers text pages from
    the embedded layer (no OCR) while scanned pages flow the full
    extraction DAG."""
    if parallelism:
        from ..partitioning import spread

        docs = spread(docs, parallelism, "doc_id")
    refs = (
        docs.select(
            "doc_id",
            F.expr(
                "transform(filter(spans, s -> (s.kind = 'text' and s.text is not null)"
                " or (s.kind = 'media' and s.media_ref is not null)),"
                " s -> struct(s.offset as offset, s.kind as kind,"
                " s.text as text, s.media_ref as media_ref))"
            ).alias("pspans"),
        )
        .where(F.size("pspans") > 0)
    )

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..fixtures.render import render_page

        for pdf in batches:
            rows = []
            for doc_id, pspans in zip(pdf["doc_id"], pdf["pspans"]):
                pages: list = []
                prefs: list[str] = []
                for s in pspans:
                    if s["kind"] == "text":
                        pages.append(s["text"])
                        prefs.append(f"{s['offset']}:")
                    else:
                        pages.append(render_page(s["media_ref"]))
                        prefs.append(f"{s['offset']}:{s['media_ref']}")
                hsh = zlib.crc32(b"pdf-hybrid-flavor:" + str(doc_id).encode())
                rows.append(
                    (
                        doc_id,
                        encode_pdf(
                            pages,
                            prefs,
                            image_format="mix",
                            text_format="mix",
                            xref_format="stream" if (hsh >> 4) & 1 else "classic",
                            encrypt=(None, None, None, None, None, None,
                                     "rc4-128", "aes-128")[hsh % 8],
                        ),
                        len(pages),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _PDF_STORE_SCHEMA.fields])

    return refs.mapInPandas(it, schema=_PDF_STORE_SCHEMA)


def pdf_hybrid_unpack_df(pdfs: DataFrame) -> DataFrame:
    """(pdf_ref, payload) → (doc_id, offset, kind, text, media_ref,
    payload): ONE parse per PDF splitting pages by what they carry —
    text pages yield their extracted embedded text (functions/
    pdf_text.py, NO rendering), image pages their lossless PNG
    re-encode for the page store. Downstream, group text+media rows
    into the input_hint docs shape and filter the media rows into
    extract_spans(media_store=...); repartition this frame first so
    both consumers share one shuffle (ReusedExchange) instead of
    recomputing the parse."""
    from .png import encode_png
    from .pdf_text import page_text

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pdf_ref, payload in zip(pdf["pdf_ref"], pdf["payload"]):
                doc = PdfDocument(bytes(payload))
                refs = _split_refs(doc.info_title())
                pages = doc.pages()
                if refs is None or len(refs) != len(pages):
                    raise ValueError(
                        f"hybrid PDF {pdf_ref} lacks page refs"
                    )
                for ref, page in zip(refs, pages):
                    off_s, _, mref = ref.partition(":")
                    if mref:
                        img = doc.page_image(page)
                        if img.ndim == 3:
                            img = img[:, :, 0]
                        rows.append(
                            (pdf_ref, int(off_s), "media", None, mref,
                             encode_png(img))
                        )
                    else:
                        text = page_text(doc, page)
                        if text is None:
                            raise ValueError(
                                f"text page {ref} of {pdf_ref} has no text"
                            )
                        rows.append(
                            (pdf_ref, int(off_s), "text", text, None, None)
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _HYBRID_UNPACK_SCHEMA.fields]
            )

    return pdfs.select("pdf_ref", "payload").mapInPandas(
        it, schema=_HYBRID_UNPACK_SCHEMA
    )
