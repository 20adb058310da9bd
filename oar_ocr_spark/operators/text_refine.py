"""Text refinement operators: cross-layout box splitting, tiny-symbol
and checkbox normalization, paragraph-title level inference.

Parity targets (reference = GreatV/oar-ocr at /root/reference):
- split_cross_layout_boxes: src/oarocr/structure.rs:2230-2322 —
  a detection box intersecting ≥2 container boxes (each intersection
  with w,h > 2px and IoA ≥ 0.3 of the box) is replaced by its
  intersections (then re-recognized); TEXT_BOX_SPLIT_IOA_THRESHOLD=0.3
  (structure.rs:48). Containers = region blocks or text-bearing layout
  element types (the SHOULD_OCR-like list at structure.rs:2238-2266).
- normalize_tiny_symbol: src/oarocr/stitching.rs:831-859 — low-conf
  single-char '='/'0' misreads remapped by box size.
- normalize_checkbox_symbols: stitching.rs:861-905 — per-table safe и
  ambiguous checkbox glyph normalization.
- semantic_title_level / infer_levels_by_kmeans_feature /
  infer_paragraph_title_levels: oar-ocr-core/src/domain/structure.rs:18-297
  — numbering-regex level + 1-D k-means over line height (descending)
  and indent (ascending), 2/1/1-weighted vote.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "split_cross_layout_boxes",
    "split_cross_layout_boxes_with_origins",
    "suppress_covered_boxes",
    "clean_ocr_text",
    "dehyphenate",
    "fix_merged_words",
    "postprocess_text",
    "postprocess_markdown",
    "filter_empty_formulas",
    "format_text_block",
    "format_first_line",
    "deduplicate_sections",
    "normalize_tiny_symbol",
    "normalize_checkbox_symbols",
    "semantic_title_level",
    "infer_levels_by_kmeans_feature",
    "infer_paragraph_title_levels",
    "CROSS_SPLIT_CONTAINER_TYPES",
]

TEXT_BOX_SPLIT_IOA_THRESHOLD = 0.3  # structure.rs:48

# structure.rs:2238-2266 — layout element types usable as split containers
CROSS_SPLIT_CONTAINER_TYPES = frozenset(
    [
        "doc_title", "paragraph_title", "text", "content", "abstract",
        "header", "footer", "footnote", "number", "reference",
        "reference_content", "algorithm", "aside_text", "list",
        "figure_title", "table_title", "chart_title",
        "figure_table_chart_title",
    ]
)


def split_cross_layout_boxes(
    det_boxes: np.ndarray,
    container_boxes: np.ndarray,
    ioa_threshold: float = TEXT_BOX_SPLIT_IOA_THRESHOLD,
) -> np.ndarray:
    """Replace detection boxes spanning ≥2 containers by their
    per-container intersections (structure.rs:2268-2316). Preserves
    input order; a box with <2 qualifying intersections passes through.
    """
    boxes, _origins, _is_split = split_cross_layout_boxes_with_origins(
        det_boxes, container_boxes, ioa_threshold
    )
    return boxes


def split_cross_layout_boxes_with_origins(
    det_boxes: np.ndarray,
    container_boxes: np.ndarray,
    ioa_threshold: float = TEXT_BOX_SPLIT_IOA_THRESHOLD,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """split_cross_layout_boxes plus provenance: returns
    (boxes, origins, is_split) where origins[i] is the input index the
    output box came from and is_split[i] marks intersection pieces —
    the covered-OCR suppression pass (structure.rs:1485-1493) needs to
    know which boxes are re-recognition crops."""
    db = np.asarray(det_boxes, dtype=np.float32).reshape(-1, 4)
    cb = np.asarray(container_boxes, dtype=np.float32).reshape(-1, 4)
    if len(db) == 0 or len(cb) == 0:
        return db.copy(), np.arange(len(db)), np.zeros(len(db), dtype=bool)
    out: list[np.ndarray] = []
    origins: list[int] = []
    is_split: list[bool] = []
    for bi, box in enumerate(db):
        self_area = float((box[2] - box[0]) * (box[3] - box[1]))
        if self_area <= 0.0:
            out.append(box)
            origins.append(bi)
            is_split.append(False)
            continue
        inters: list[np.ndarray] = []
        for c in cb:
            ix1, iy1 = max(box[0], c[0]), max(box[1], c[1])
            ix2, iy2 = min(box[2], c[2]), min(box[3], c[3])
            if ix2 - ix1 <= 2.0 or iy2 - iy1 <= 2.0:
                continue
            inter_area = float((ix2 - ix1) * (iy2 - iy1))
            if inter_area <= 0.0:
                continue
            if inter_area / self_area >= ioa_threshold:
                inters.append(np.asarray([ix1, iy1, ix2, iy2], dtype=np.float32))
        if len(inters) >= 2:
            out.extend(inters)
            origins.extend([bi] * len(inters))
            is_split.extend([True] * len(inters))
        else:
            out.append(box)
            origins.append(bi)
            is_split.append(False)
    if not out:
        return (
            np.empty((0, 4), dtype=np.float32),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=bool),
        )
    return np.stack(out), np.asarray(origins, dtype=np.int64), np.asarray(is_split, dtype=bool)


def suppress_covered_boxes(
    boxes: np.ndarray, origins: np.ndarray, is_split: np.ndarray, iou_threshold: float = 0.8
) -> np.ndarray:
    """Indices of boxes surviving covered-OCR suppression: a cross-
    layout re-recognition crop suppresses any OTHER OCR box it covers
    with IoU > 0.8 (structure.rs:1485-1493 — the reference nulls the
    covered region's text; dropping the box pre-recognition is the
    same observable outcome since empty texts are dropped anyway)."""
    from .geometry import iou as iou_matrix

    b = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
    n = len(b)
    if n == 0 or not is_split.any():
        return np.arange(n)
    ious = iou_matrix(b, b)
    dead = np.zeros(n, dtype=bool)
    for i in np.flatnonzero(is_split):
        for j in range(n):
            if j == i or origins[j] == origins[i]:
                continue
            if ious[i, j] > iou_threshold:
                dead[j] = True
    return np.flatnonzero(~dead)


def clean_ocr_text(text: str) -> str:
    """Remove PDF line-break hyphens, newlines → spaces
    (clean_ocr_text, domain/structure.rs:1294-1297)."""
    return text.replace("-\n", "").replace("\n", " ")


def _is_url_context(chars: list[str], pos: int) -> bool:
    start = max(pos - 10, 0)
    end = min(pos + 5, len(chars))
    window = "".join(chars[start:end])
    return "http" in window or "www" in window or "://" in window


def dehyphenate(text: str) -> str:
    """Remove line-break hyphenation ('word-\\nletter' → 'wordletter'
    when the next line starts lowercase; URLs untouched) — dehyphenate,
    domain/structure.rs:1438-1491."""
    chars = list(text)
    n = len(chars)
    out: list[str] = []
    i = 0
    while i < n:
        c = chars[i]
        if c == "-":
            if _is_url_context(chars, i):
                out.append("-")
                i += 1
                continue
            is_artifact = (
                i + 1 < n
                and chars[i + 1] == "\n"
                and i + 2 < n
                and chars[i + 2].isascii()
                and chars[i + 2].islower()
            )
            if is_artifact:
                i += 1  # skip the newline too (incremented again below)
            else:
                out.append("-")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def fix_merged_words(text: str) -> str:
    """Insert missing spaces at merged-word boundaries (apostrophe
    runs, lowercase→Uppercase word starts, digit/percent→Uppercase,
    letter-digit-letter) — fix_merged_words,
    domain/structure.rs:1493-1540. ASCII classes, as the reference."""

    def lo(c: str) -> bool:
        return c.isascii() and c.islower() and c.isalpha()

    def up(c: str) -> bool:
        return c.isascii() and c.isupper() and c.isalpha()

    def dig(c: str) -> bool:
        return c.isascii() and c.isdigit()

    chars = list(text)
    out: list[str] = []
    for i, cur in enumerate(chars):
        if i > 0:
            prev = chars[i - 1]
            if lo(prev) and lo(cur):
                if i > 1 and chars[i - 2] == "'":
                    out.append(" ")
            elif lo(prev) and up(cur):
                if i + 1 < len(chars) and lo(chars[i + 1]):
                    out.append(" ")
            elif ((dig(prev) or prev == "%") and up(cur)) or (
                (lo(prev) or up(prev))
                and dig(cur)
                and i + 1 < len(chars)
                and (lo(chars[i + 1]) or up(chars[i + 1]))
            ):
                out.append(" ")
        out.append(cur)
    return "".join(out)


def postprocess_text(text: str) -> str:
    """Full text-cleanup chain: dehyphenate → fix merged words →
    whitespace normalization with punctuation spacing fixes
    (postprocess_text, domain/structure.rs:1563-1600; bug-compatible
    port, including the '.'-after-alnum in_space behavior)."""

    def letter_or_digit(c: str) -> bool:
        return c.isascii() and (c.isalpha() or c.isdigit())

    text = dehyphenate(text)
    text = fix_merged_words(text)
    out: list[str] = []
    in_space = False
    for c in text:
        if c.isspace():
            if not in_space and out:
                out.append(" ")
                in_space = True
        else:
            if c == "." and out and letter_or_digit(out[-1]):
                out.append(".")
                in_space = True
                continue
            if in_space and c in ".,!?;:)]}":
                out.pop()
                out.append(c)
                continue
            out.append(c)
            in_space = False
    return "".join(out)


def format_text_block(text: str) -> str:
    """Text-block formatting: dehyphenate at line ends, then OCR line
    breaks → paragraph breaks (format_text_block,
    domain/structure.rs:1346-1353)."""
    return text.replace("-\n", "").replace("\n\n", "\n").replace("\n", "\n\n")


def format_first_line(
    text: str, spliter: str, templates: list[str], heading_prefix: str
) -> str:
    """Heading-ify the first non-empty token when it matches a template
    (case-insensitive) — format_first_line,
    domain/structure.rs:1300-1341."""
    parts = text.split(spliter)
    out: list[str] = []
    found_first = False
    lowered = [t.lower() for t in templates]
    for part in parts:
        if not found_first:
            trimmed = part.strip()
            if not trimmed:
                out.append(part)
                continue
            found_first = True
            if trimmed.lower() in lowered:
                out.append(f"{heading_prefix}{trimmed}\n")
            else:
                out.append(part)
        else:
            out.append(part)
    return spliter.join(out)


def deduplicate_sections(markdown: str) -> str:
    """Drop repeated '**Section**' headers keeping the first occurrence
    (deduplicate_sections, domain/structure.rs:1604-1641)."""
    out: list[str] = []
    seen: set[str] = set()
    for line in markdown.splitlines():
        trimmed = line.strip()
        is_header = trimmed.startswith("**") and trimmed.endswith("**") and len(trimmed) > 4
        if is_header:
            name = trimmed[2:-2]
            if name in seen:
                continue
            seen.add(name)
        out.append(line)
    return "\n".join(out)


def normalize_tiny_symbol(
    text: str | None, score: float | None, width: float, height: float
) -> str | None:
    """Remap low-confidence single-char misreads (stitching.rs:831-859).
    Returns the replacement text or None (no change)."""
    if text is None or score is None or len(text) != 1:
        return None
    width = max(width, 0.0)
    height = max(height, 0.0)
    if text == "=" and score < 0.45 and width <= 9.5 and height <= 7.5:
        return ","
    if text == "=" and score < 0.45 and width <= 12.5 and 7.5 < height <= 10.5:
        return "-"
    if text == "0" and score < 0.20 and width <= 14.5 and height <= 14.5:
        return ";"
    return None


_POSITIVE = {"✓", "ü", "Ü", "L", "√", "☑"}
_NEGATIVE = {"✗", "X", "x", "✕", "✖", "☒"}


def normalize_checkbox_symbols(cell_texts: list[str | None]) -> list[str | None]:
    """Per-table checkbox glyph normalization (stitching.rs:861-905).
    Safe glyphs always normalize; ambiguous L/X/x only when the table
    contains both positive and negative candidates."""
    has_pos = has_neg = False
    for t in cell_texts:
        if t is None:
            continue
        s = t.strip()
        if len(s) != 1:
            continue
        if s in _POSITIVE:
            has_pos = True
        if s in _NEGATIVE:
            has_neg = True
    out: list[str | None] = []
    for t in cell_texts:
        if t is None:
            out.append(None)
            continue
        s = t.strip()
        if len(s) != 1:
            out.append(t)
            continue
        if s in {"ü", "Ü", "√", "☑"}:
            out.append("✓")
        elif s == "L" and has_pos and has_neg:
            out.append("✓")
        elif s in {"✕", "✖", "☒"}:
            out.append("✗")
        elif s in {"X", "x"} and has_pos and has_neg:
            out.append("✗")
        else:
            out.append(t)
    return out


_TITLE_NUMBERING_RE = re.compile(
    r"""^\s*
    (
        [1-9][0-9]*(?:\.[1-9][0-9]*)*[\.、]?
        |
        [(（][1-9][0-9]*(?:\.[1-9][0-9]*)*[)）]
        |
        [一二三四五六七八九十百千万亿零壹贰叁肆伍陆柒捌玖拾][、.]?
        |
        [(（][一二三四五六七八九十百千万亿零壹贰叁肆伍陆柒捌玖拾]+[)）]
        |
        (?:I|II|III|IV|V|VI|VII|VIII|IX|X)(?:\.|\b)
    )
    (\s+)
    (.*)
    $""",
    re.VERBOSE,
)


def semantic_title_level(text: str) -> int | None:
    """Numbering-based heading level (structure.rs:62-99): top-level
    keywords → 2; numbered titles → dot-count + 2, clamped [2, 6]."""
    cleaned = text.replace("-\n", "").replace("\n", " ").strip()
    keyword = cleaned.rstrip(":").upper()
    if keyword in ("ABSTRACT", "INTRODUCTION", "REFERENCES", "REFERENCE"):
        return 2
    m = _TITLE_NUMBERING_RE.match(cleaned)
    if m:
        numbering = (m.group(1) or "").strip()
        dot_count = numbering.count(".")
        return min(max(dot_count + 2, 2), 6)
    return None


def infer_levels_by_kmeans_feature(
    samples: list[tuple[int, float]], descending: bool
) -> dict[int, int]:
    """1-D k-means heading-level clustering (structure.rs:212-297):
    k = min(#distinct-by-1e-3, 4); quantile init; 16 Lloyd iterations;
    cluster rank (+2, clamped [2,6]) is the level."""
    clean = [(i, v) for i, v in samples if np.isfinite(v)]
    if len(clean) < 2:
        return {}
    values = sorted(v for _, v in clean)
    unique_count = 1 + sum(
        1 for a, b in zip(values, values[1:]) if abs(b - a) > 1e-3
    )
    k = min(max(unique_count, 1), 4, len(clean))
    if k <= 1:
        return {}
    centroids = [
        values[min(int(np.floor((i + 0.5) / k * len(values))), len(values) - 1)]
        for i in range(k)
    ]
    for _ in range(16):
        sums = [0.0] * k
        counts = [0] * k
        for _, v in clean:
            best = min(range(k), key=lambda c: abs(v - centroids[c]))
            sums[best] += v
            counts[best] += 1
        for c in range(k):
            if counts[c] > 0:
                centroids[c] = sums[c] / counts[c]
    order = sorted(range(k), key=lambda c: -centroids[c] if descending else centroids[c])
    rank_of = {c: r for r, c in enumerate(order)}
    out: dict[int, int] = {}
    for i, v in clean:
        best = min(range(k), key=lambda c: abs(v - centroids[c]))
        out[i] = min(max(rank_of[best] + 2, 2), 6)
    return out


def infer_paragraph_title_levels(
    titles: list[tuple[int, np.ndarray, int, str]]
) -> dict[int, int]:
    """Voted heading levels for paragraph titles (structure.rs:118-205).

    titles: [(element_idx, bbox, num_lines, text)].
    Vote: semantic (weight 2), line-height k-means (1, descending),
    indent k-means (1, ascending); ties prefer the semantic level, then
    the smaller level; fallback order semantic → font → indent → 2.
    """
    if not titles:
        return {}
    height_samples = []
    indent_samples = []
    semantic: dict[int, int] = {}
    for idx, bbox, num_lines, text in titles:
        h = max(float(bbox[3] - bbox[1]), 1.0)
        line_h = max(h / max(int(num_lines or 1), 1), 1.0)
        if np.isfinite(line_h):
            height_samples.append((idx, line_h))
        x = float(bbox[0])
        if np.isfinite(x):
            indent_samples.append((idx, x))
        lvl = semantic_title_level(text)
        if lvl is not None:
            semantic[idx] = lvl
    font_levels = infer_levels_by_kmeans_feature(height_samples, True)
    relative_levels = infer_levels_by_kmeans_feature(indent_samples, False)
    voted: dict[int, int] = {}
    for idx, _bbox, _nl, _t in titles:
        sem = semantic.get(idx)
        font = font_levels.get(idx)
        rel = relative_levels.get(idx)
        score = [0] * 7
        if sem is not None:
            score[min(max(sem, 1), 6)] += 2
        if font is not None:
            score[min(max(font, 1), 6)] += 1
        if rel is not None:
            score[min(max(rel, 1), 6)] += 1
        best_level = sem if sem is not None else 2
        best_score = 0
        for level in range(1, 7):
            s = score[level]
            if s > best_score:
                best_score = s
                best_level = level
            elif s == best_score and s > 0:
                is_sem = sem == level
                best_is_sem = sem == best_level
                if (is_sem and not best_is_sem) or (
                    is_sem == best_is_sem and level < best_level
                ):
                    best_level = level
        if best_score == 0:
            best_level = next(
                (v for v in (sem, font, rel) if v is not None), 2
            )
        voted[idx] = min(max(best_level, 1), 6)
    return voted


def filter_empty_formulas(markdown: str) -> str:
    """Drop empty $$...$$ blocks (filter_empty_formulas,
    domain/structure.rs:1667-1726; bug-compatible port, including the
    only-blank-lines branch that skips just the opening marker)."""
    lines = markdown.splitlines()
    out: list[str] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if line.strip() == "$$":
            if i + 1 < n and lines[i + 1].strip() == "$$":
                i += 2
                if i < n and not lines[i].strip():
                    i += 1
                continue
            j = i + 1
            has_content = False
            while j < n:
                if lines[j].strip() == "$$":
                    break
                if lines[j].strip():
                    has_content = True
                    break
                j += 1
            if not has_content:
                while i < n and lines[i].strip() != "$$":
                    i += 1
                if i < n:
                    i += 1
                continue
        out.append(line)
        i += 1
    return "\n".join(out)


def postprocess_markdown(markdown: str) -> str:
    """Markdown-level cleanup chain (postprocess_markdown,
    domain/structure.rs:1731-1804): drop empty formulas, deduplicate
    section headers, then per line — code blocks passed through,
    $$-blocks get bare dollars escaped for KaTeX, markdown-syntax
    lines (#, *, >, |, -, +) passed through, plain text lines run
    through postprocess_text."""
    markdown = filter_empty_formulas(markdown)
    markdown = deduplicate_sections(markdown)
    out: list[str] = []
    in_code = False
    in_formula = False
    for line in markdown.splitlines():
        trimmed = line.strip()
        if trimmed.startswith("```"):
            in_code = not in_code
            out.append(line)
            continue
        if trimmed == "$$":
            in_formula = not in_formula
            out.append(line)
            continue
        if in_code:
            out.append(line)
            continue
        if in_formula:
            out.append(line.replace("$", "\\$") if "$" in line else line)
            continue
        if trimmed[:1] in ("#", "*", ">", "|", "-", "+"):
            out.append(line)
        else:
            out.append(postprocess_text(line))
    return "\n".join(out) + ("\n" if out else "")
