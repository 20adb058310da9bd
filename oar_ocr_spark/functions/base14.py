"""Built-in metrics for the proportional standard-14 PDF fonts.

A simple font without /Widths relies on the viewer's built-in
standard-14 metrics (ISO 32000-1 §9.6.2.2) — real born-digital PDFs
do this constantly with Helvetica/Arial and Times. The tables below
are the Adobe Core14 AFM character widths (public data, /1000-em
glyph units) for the ASCII range (codes 32–126, identical under
StandardEncoding and WinAnsiEncoding); the oblique/italic faces of
Helvetica share their upright widths per the AFMs. Characters outside
the table (cp1252 high range, symbol fonts) stay a declared loud
boundary — the extractor raises NotImplementedError when such a glyph
is actually shown.

Reference handles standard-font metrics inside `hayro`'s bundled font
data (oar-ocr Cargo.toml:20); this is the from-scratch public-AFM
twin for the extraction seam in functions/pdf_text.py.
"""

from __future__ import annotations

import re

_ASCII = "".join(chr(c) for c in range(32, 127))


def _table(widths: str) -> dict[str, float]:
    vals = widths.split()
    if len(vals) != 95:
        raise AssertionError(
            f"base-14 width table needs 95 entries, got {len(vals)}"
        )
    return {ch: float(v) for ch, v in zip(_ASCII, vals)}


# Adobe Core14 AFM widths, codes 32..126 in order (space .. asciitilde)
_HELVETICA = _table(
    "278 278 355 556 556 889 667 191 333 333 389 584 278 333 278 278"
    " 556 556 556 556 556 556 556 556 556 556 278 278 584 584 584 556"
    " 1015 667 667 722 722 667 611 778 722 278 500 667 556 833 722 778"
    " 667 778 722 667 611 722 667 944 667 667 611 278 278 278 469 556"
    " 333 556 556 500 556 556 278 556 556 222 222 500 222 833 556 556"
    " 556 556 333 500 278 556 500 722 500 500 500 334 260 334 584"
)

_HELVETICA_BOLD = _table(
    "278 333 474 556 556 889 722 238 333 333 389 584 278 333 278 278"
    " 556 556 556 556 556 556 556 556 556 556 333 333 584 584 584 611"
    " 975 722 722 722 722 667 611 778 722 278 556 722 611 833 722 778"
    " 667 778 722 667 611 722 667 944 667 667 611 333 278 333 584 556"
    " 333 556 611 556 611 556 333 611 611 278 278 556 278 889 611 611"
    " 611 611 389 556 333 611 556 778 556 556 500 389 280 389 584"
)

_TIMES_ROMAN = _table(
    "250 333 408 500 500 833 778 180 333 333 500 564 250 333 250 278"
    " 500 500 500 500 500 500 500 500 500 500 278 278 564 564 564 444"
    " 921 722 667 667 722 611 556 722 722 333 389 722 611 889 722 722"
    " 556 722 667 556 611 722 722 944 722 722 611 333 278 333 469 500"
    " 333 444 500 444 500 444 333 500 500 278 278 500 278 778 500 500"
    " 500 500 333 389 278 500 500 722 500 500 444 480 200 480 541"
)

_TIMES_BOLD = _table(
    "250 333 555 500 500 1000 833 278 333 333 500 570 250 333 250 278"
    " 500 500 500 500 500 500 500 500 500 500 333 333 570 570 570 500"
    " 930 722 667 722 722 667 611 778 778 389 500 778 667 944 722 778"
    " 611 778 722 556 667 722 722 1000 722 722 667 333 278 333 581 500"
    " 333 500 556 444 556 444 333 500 556 278 333 556 278 833 556 500"
    " 556 556 444 389 333 556 500 722 500 500 444 394 220 394 520"
)

_TIMES_ITALIC = _table(
    "250 333 420 500 500 833 778 214 333 333 500 675 250 333 250 278"
    " 500 500 500 500 500 500 500 500 500 500 333 333 675 675 675 500"
    " 920 611 611 667 722 611 611 722 722 333 444 667 556 833 667 722"
    " 611 722 611 500 556 722 611 833 611 556 556 389 278 389 422 500"
    " 333 500 500 444 500 444 278 500 500 278 278 444 278 722 500 500"
    " 500 500 389 389 278 500 444 667 444 444 389 400 275 400 541"
)

_TIMES_BOLD_ITALIC = _table(
    "250 389 555 500 500 833 778 278 333 333 500 570 250 333 250 278"
    " 500 500 500 500 500 500 500 500 500 500 333 333 570 570 570 500"
    " 832 667 667 667 722 667 667 722 778 389 500 667 611 889 722 722"
    " 611 722 667 556 611 722 667 889 667 611 611 333 278 333 570 500"
    " 333 500 500 444 500 444 333 500 556 278 278 500 278 778 556 500"
    " 500 500 389 389 278 556 444 667 500 444 389 348 220 348 570"
)

_FACES: dict[tuple[str, bool, bool], dict[str, float]] = {
    # (family, bold, italic) → widths; Helvetica obliques share
    # upright widths per the Core14 AFMs
    ("helvetica", False, False): _HELVETICA,
    ("helvetica", True, False): _HELVETICA_BOLD,
    ("helvetica", False, True): _HELVETICA,
    ("helvetica", True, True): _HELVETICA_BOLD,
    ("times", False, False): _TIMES_ROMAN,
    ("times", True, False): _TIMES_BOLD,
    ("times", False, True): _TIMES_ITALIC,
    ("times", True, True): _TIMES_BOLD_ITALIC,
}

# subset prefix ("ABCDEF+") then the substitution aliases real writers
# emit for the standard families (§9.6.2.2 note + common TrueType names)
_SUBSET_RE = re.compile(r"^[A-Z]{6}\+")
_FAMILY_RE = re.compile(
    r"^(helvetica|arial|times(?:newroman)?)", re.IGNORECASE
)


def char_widths(basefont: str) -> dict[str, float] | None:
    """AFM width table (unicode char → /1000-em units) for a
    proportional standard-14 /BaseFont name, or None when the name is
    not one of them (Courier is handled by the fixed-pitch fast path;
    Symbol/ZapfDingbats use non-standard encodings and stay out).
    Accepts subset prefixes (ABCDEF+Helvetica), the Arial/
    TimesNewRoman substitution aliases with ',Bold'-style or
    '-BoldItalic'-style suffixes, and the PS 'PS'/'MT' decorations
    (TimesNewRomanPS-BoldItalicMT)."""
    name = _SUBSET_RE.sub("", basefont.strip())
    m = _FAMILY_RE.match(name)
    if not m:
        return None
    fam = m.group(1).lower()
    family = "times" if fam.startswith("times") else "helvetica"
    style = name[m.end():].lower()
    bold = "bold" in style
    italic = "italic" in style or "oblique" in style
    return _FACES[(family, bold, italic)]
