"""PostScript glyph name → unicode (Adobe Glyph List subset).

Simple-font `/Encoding /Differences` arrays and Type3 fonts address
glyphs by NAME (ISO 32000-1 §9.6.6); mapping those names to text is
specified by Adobe's public Glyph List specification (AGL / AGLFN):
a fixed name table plus the algorithmic `uniXXXX` / `uXXXX[XX]` forms
and the period-suffix / underscore-ligature decomposition rules.

This module carries the table subset a document pipeline actually
meets — the full Standard/WinAnsi/PDFDoc Latin repertoire, the f-
ligatures, and the Symbol-font Greek names (with AGL's deliberate
quirks kept: `Delta`→U+2206 INCREMENT, `Omega`→U+2126 OHM SIGN,
`mu`→U+00B5 MICRO) — and fails loudly (KeyError surfaced as the
caller's declared NotImplementedError) on names outside it, per the
codec-seam contract. Reference reads PDF text via `hayro`
(oar-ocr Cargo.toml:20); this is the from-scratch twin's name table.
"""

from __future__ import annotations

import re

__all__ = ["glyph_to_unicode", "unicode_to_glyph", "AGL"]

# fmt: off
_ASCII = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22, "numbersign": 0x23,
    "dollar": 0x24, "percent": 0x25, "ampersand": 0x26, "quotesingle": 0x27,
    "parenleft": 0x28, "parenright": 0x29, "asterisk": 0x2A, "plus": 0x2B,
    "comma": 0x2C, "hyphen": 0x2D, "period": 0x2E, "slash": 0x2F,
    "zero": 0x30, "one": 0x31, "two": 0x32, "three": 0x33, "four": 0x34,
    "five": 0x35, "six": 0x36, "seven": 0x37, "eight": 0x38, "nine": 0x39,
    "colon": 0x3A, "semicolon": 0x3B, "less": 0x3C, "equal": 0x3D,
    "greater": 0x3E, "question": 0x3F, "at": 0x40,
    "bracketleft": 0x5B, "backslash": 0x5C, "bracketright": 0x5D,
    "asciicircum": 0x5E, "underscore": 0x5F, "grave": 0x60,
    "braceleft": 0x7B, "bar": 0x7C, "braceright": 0x7D, "asciitilde": 0x7E,
}

_LATIN1 = {
    "exclamdown": 0xA1, "cent": 0xA2, "sterling": 0xA3, "currency": 0xA4,
    "yen": 0xA5, "brokenbar": 0xA6, "section": 0xA7, "dieresis": 0xA8,
    "copyright": 0xA9, "ordfeminine": 0xAA, "guillemotleft": 0xAB,
    "logicalnot": 0xAC, "registered": 0xAE, "macron": 0xAF,
    "degree": 0xB0, "plusminus": 0xB1, "twosuperior": 0xB2,
    "threesuperior": 0xB3, "acute": 0xB4, "mu": 0xB5, "paragraph": 0xB6,
    "periodcentered": 0xB7, "cedilla": 0xB8, "onesuperior": 0xB9,
    "ordmasculine": 0xBA, "guillemotright": 0xBB, "onequarter": 0xBC,
    "onehalf": 0xBD, "threequarters": 0xBE, "questiondown": 0xBF,
    "Agrave": 0xC0, "Aacute": 0xC1, "Acircumflex": 0xC2, "Atilde": 0xC3,
    "Adieresis": 0xC4, "Aring": 0xC5, "AE": 0xC6, "Ccedilla": 0xC7,
    "Egrave": 0xC8, "Eacute": 0xC9, "Ecircumflex": 0xCA, "Edieresis": 0xCB,
    "Igrave": 0xCC, "Iacute": 0xCD, "Icircumflex": 0xCE, "Idieresis": 0xCF,
    "Eth": 0xD0, "Ntilde": 0xD1, "Ograve": 0xD2, "Oacute": 0xD3,
    "Ocircumflex": 0xD4, "Otilde": 0xD5, "Odieresis": 0xD6,
    "multiply": 0xD7, "Oslash": 0xD8, "Ugrave": 0xD9, "Uacute": 0xDA,
    "Ucircumflex": 0xDB, "Udieresis": 0xDC, "Yacute": 0xDD, "Thorn": 0xDE,
    "germandbls": 0xDF,
    "agrave": 0xE0, "aacute": 0xE1, "acircumflex": 0xE2, "atilde": 0xE3,
    "adieresis": 0xE4, "aring": 0xE5, "ae": 0xE6, "ccedilla": 0xE7,
    "egrave": 0xE8, "eacute": 0xE9, "ecircumflex": 0xEA, "edieresis": 0xEB,
    "igrave": 0xEC, "iacute": 0xED, "icircumflex": 0xEE, "idieresis": 0xEF,
    "eth": 0xF0, "ntilde": 0xF1, "ograve": 0xF2, "oacute": 0xF3,
    "ocircumflex": 0xF4, "otilde": 0xF5, "odieresis": 0xF6, "divide": 0xF7,
    "oslash": 0xF8, "ugrave": 0xF9, "uacute": 0xFA, "ucircumflex": 0xFB,
    "udieresis": 0xFC, "yacute": 0xFD, "thorn": 0xFE, "ydieresis": 0xFF,
}

# WinAnsi / PDFDoc names above Latin-1, Standard-encoding accents and
# ligatures, and the odd symbols Differences arrays reach for.
_EXTENDED = {
    "Euro": 0x20AC, "quotesinglbase": 0x201A, "florin": 0x0192,
    "quotedblbase": 0x201E, "ellipsis": 0x2026, "dagger": 0x2020,
    "daggerdbl": 0x2021, "circumflex": 0x02C6, "perthousand": 0x2030,
    "Scaron": 0x0160, "guilsinglleft": 0x2039, "OE": 0x0152,
    "Zcaron": 0x017D, "quoteleft": 0x2018, "quoteright": 0x2019,
    "quotedblleft": 0x201C, "quotedblright": 0x201D, "bullet": 0x2022,
    "endash": 0x2013, "emdash": 0x2014, "tilde": 0x02DC,
    "trademark": 0x2122, "scaron": 0x0161, "guilsinglright": 0x203A,
    "oe": 0x0153, "zcaron": 0x017E, "Ydieresis": 0x0178,
    "fraction": 0x2044, "fi": 0xFB01, "fl": 0xFB02, "ff": 0xFB00,
    "ffi": 0xFB03, "ffl": 0xFB04, "dotlessi": 0x0131,
    "Lslash": 0x0141, "lslash": 0x0142, "minus": 0x2212,
    "breve": 0x02D8, "dotaccent": 0x02D9, "ring": 0x02DA,
    "ogonek": 0x02DB, "caron": 0x02C7, "hungarumlaut": 0x02DD,
    "nbspace": 0x00A0, "sfthyphen": 0x00AD, "middot": 0x00B7,
}

# Symbol-font Greek per AGL, quirks included (Delta/Omega/mu map to
# the math/technical codepoints, not the Greek block).
_GREEK = {
    "Alpha": 0x0391, "Beta": 0x0392, "Gamma": 0x0393, "Delta": 0x2206,
    "Epsilon": 0x0395, "Zeta": 0x0396, "Eta": 0x0397, "Theta": 0x0398,
    "Iota": 0x0399, "Kappa": 0x039A, "Lambda": 0x039B, "Mu": 0x039C,
    "Nu": 0x039D, "Xi": 0x039E, "Omicron": 0x039F, "Pi": 0x03A0,
    "Rho": 0x03A1, "Sigma": 0x03A3, "Tau": 0x03A4, "Upsilon": 0x03A5,
    "Phi": 0x03A6, "Chi": 0x03A7, "Psi": 0x03A8, "Omega": 0x2126,
    "alpha": 0x03B1, "beta": 0x03B2, "gamma": 0x03B3, "delta": 0x03B4,
    "epsilon": 0x03B5, "zeta": 0x03B6, "eta": 0x03B7, "theta": 0x03B8,
    "iota": 0x03B9, "kappa": 0x03BA, "lambda": 0x03BB, "nu": 0x03BD,
    "xi": 0x03BE, "omicron": 0x03BF, "pi": 0x03C0, "rho": 0x03C1,
    "sigma": 0x03C3, "sigma1": 0x03C2, "tau": 0x03C4, "upsilon": 0x03C5,
    "phi": 0x03C6, "chi": 0x03C7, "psi": 0x03C8, "omega": 0x03C9,
}
# fmt: on

AGL: dict[str, str] = {
    **{n: chr(c) for n, c in _ASCII.items()},
    **{c: c for c in "0123456789"},  # digits never appear bare, but
    # single letters do: A-Z a-z map to themselves per AGL
    **{chr(c): chr(c) for c in range(0x41, 0x5B)},
    **{chr(c): chr(c) for c in range(0x61, 0x7B)},
    **{n: chr(c) for n, c in _LATIN1.items()},
    **{n: chr(c) for n, c in _EXTENDED.items()},
    **{n: chr(c) for n, c in _GREEK.items()},
}

_UNI_RE = re.compile(r"^uni((?:[0-9A-F]{4})+)$")
_U_RE = re.compile(r"^u([0-9A-F]{4,6})$")


def _component(name: str) -> str:
    if name in AGL:
        return AGL[name]
    m = _UNI_RE.match(name)
    if m:
        hexes = m.group(1)
        cps = [int(hexes[i : i + 4], 16) for i in range(0, len(hexes), 4)]
        if any(0xD800 <= c <= 0xDFFF for c in cps):
            raise KeyError(f"glyph name {name!r} encodes a surrogate")
        return "".join(chr(c) for c in cps)
    m = _U_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
            raise KeyError(f"glyph name {name!r} is not a scalar value")
        return chr(cp)
    raise KeyError(f"glyph name {name!r} not in the AGL subset")


def glyph_to_unicode(name: str) -> str:
    """AGL algorithm: strip the first period suffix (`f.alt` → `f`),
    split `_` ligature components, map each via the table or the
    uniXXXX / uXXXXXX forms. Raises KeyError on unknown names (the
    caller surfaces it as its declared loud error)."""
    if not name or name == ".notdef":
        raise KeyError("glyph name .notdef has no unicode")
    base = name.split(".", 1)[0]
    if not base:
        raise KeyError(f"glyph name {name!r} has an empty base")
    return "".join(_component(c) for c in base.split("_") if c)


# writer-side reverse map: for each character the table covers, the
# lexicographically-first AGL name (deterministic under table growth
# only by accident of sort — pinned by the roundtrip tests); everything
# else falls back to the algorithmic uniXXXX / uXXXXXX forms, which
# glyph_to_unicode maps straight back.
_REVERSE: dict[str, str] = {}
for _n in sorted(AGL):
    _REVERSE.setdefault(AGL[_n], _n)


def unicode_to_glyph(ch: str) -> str:
    """One character → a glyph name that glyph_to_unicode maps back to
    exactly that character (the PDF-writer side of the AGL seam)."""
    if len(ch) != 1:
        raise ValueError(f"unicode_to_glyph expects one character, got {ch!r}")
    nm = _REVERSE.get(ch)
    if nm is not None:
        return nm
    cp = ord(ch)
    if 0xD800 <= cp <= 0xDFFF:
        raise ValueError(f"character {ch!r} is a surrogate")
    return ("uni%04X" % cp) if cp <= 0xFFFF else ("u%06X" % cp)
