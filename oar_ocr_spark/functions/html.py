"""HTML main-content extraction (boilerplate strip via DOM heuristics).

The north rule names "HTML boilerplate strip, PDF/layout parse, DOM
heuristics" as the main-content extraction surface; PDF lives in
functions/pdf.py, and this module covers the HTML side with the
standard public heuristics family (Readability / trafilatura /
boilerpipe style — density-based block scoring, no ML):

1. parse the document into a lightweight DOM (stdlib html.parser —
   no external deps), dropping script/style/noscript/template
   subtrees outright;
2. collect text blocks (p, h1–h6, li, td, pre, blockquote — plus
   bare-text div/article/section leaves) with their ancestor chain
   and per-block link-character count;
3. score each block: text length × (1 − link_density)², zeroed for
   blocks whose ancestor chain crosses nav/header/footer/aside or a
   class/id matching the boilerplate lexicon (nav, menu, sidebar,
   footer, comment, ad, promo, share, related);
4. pick the container (deepest common ancestor bucket) with the
   highest summed score and emit its blocks, in document order, as
   the main text.

Spark side: one Arrow-batched mapInPandas over (doc_id, html) — the
same per-row transform shape as every codec in this engine; at corpus
scale the HTML column arrives from the crawl table and the operator
is embarrassingly parallel.

The driver query's oracle is fully SQL-expressible: the deterministic
HTML fixture (fixtures/htmlgen.render_html) wraps each document's
text in one of three boilerplate templates keyed by md5(doc_id), and
a correct extractor must recover EXACTLY the article text — so the
DuckDB twin just re-derives the expected text (and per-template
boilerplate block count) from the documents table.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["extract_main_content", "html_main_content_df"]

_DROP_SUBTREES = {"script", "style", "noscript", "template", "svg", "head"}
_BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "pre",
    "blockquote", "figcaption", "dd", "dt",
}
_CONTAINER_TAGS = {"div", "article", "section", "main", "body", "ul", "ol", "table"}
_NEGATIVE_TAGS = {"nav", "header", "footer", "aside", "form", "button", "select"}
_NEGATIVE_RE = re.compile(
    # short/ambiguous tokens are word-anchored so 'threads', 'downloads',
    # 'navigate', 'sharing' etc. do not mark real content as boilerplate
    r"menu|sidebar|footer|header|banner|comment|advert|\bad\b|\bads\b|"
    r"\bnav\b|\bpromo\b|\bshare\b|\bsocial\b|related|breadcrumb|"
    r"cookie|popup|masthead",
    re.IGNORECASE,
)
# ASCII whitespace only — the DuckDB oracle's RE2 '\s' is ASCII, and
# the fixture splits the same way, so non-ASCII whitespace (U+00A0 …)
# passes through all three paths verbatim instead of diverging
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")


class _Block:
    __slots__ = ("text_len", "link_len", "container", "texts", "negative")

    def __init__(self, container: int, negative: bool):
        self.container = container  # id of the nearest container ancestor
        self.negative = negative  # ancestor chain crosses boilerplate markers
        self.text_len = 0
        self.link_len = 0
        self.texts: list[str] = []


class _Extractor(HTMLParser):
    """Single-pass DOM walk: no tree is materialized — the open-element
    stack carries (tag, container_id, negative) flags and text lands in
    the innermost open block (or an anonymous block for bare container
    text). Every bookkeeping counter (drop/link depth, open blocks) is
    reconciled through the one stack-unwind in handle_endtag, so
    unclosed tags — endemic in real HTML — cannot leak state."""

    def __init__(self, pending_closers: dict[str, int] | None = None) -> None:
        super().__init__(convert_charrefs=True)
        # (tag, container_id, negative, in_drop) — in_drop entries exist
        # only so end tags inside dropped subtrees unwind their own
        # element instead of matching an ancestor outside the subtree
        self.stack: list[tuple[str, int, bool, bool]] = [("#root", 0, False, False)]
        # remaining </template>/</svg>/… occurrences in the document:
        # an end tag may implicitly close an OPEN drop subtree only when
        # its own closer is NOT coming later (recovery for truly
        # unclosed subtrees, without leaking ones that do close)
        self.pending_closers = dict(pending_closers or {})
        self.drop_depth = 0
        self.link_depth = 0
        self.blocks: list[_Block] = []
        self.open_blocks: list[_Block] = []
        self.n_containers = 1
        self.bare_block: _Block | None = None  # anonymous run of container text

    @staticmethod
    def _is_negative(tag: str, attrs) -> bool:
        if tag in _NEGATIVE_TAGS:
            return True
        for name, val in attrs:
            if name in ("class", "id", "role") and val and _NEGATIVE_RE.search(val):
                return True
        return False

    def handle_starttag(self, tag, attrs):
        self.bare_block = None  # any tag ends a bare-text run
        if tag in _DROP_SUBTREES:
            # dropped subtrees ride the SAME stack so an unclosed
            # <template>/<script> is reconciled when an ancestor closes
            self.drop_depth += 1
            self.stack.append((tag, self.stack[-1][1], True, True))
            return
        if self.drop_depth:
            # still push (flagged in_drop) so an end tag INSIDE the
            # dropped subtree unwinds its own element rather than
            # falsely matching an ancestor outside the subtree
            self.stack.append((tag, self.stack[-1][1], True, True))
            return
        if tag == "a":
            self.link_depth += 1
        _, container, negative, _ = self.stack[-1]
        negative = negative or self._is_negative(tag, attrs)
        if tag in _CONTAINER_TAGS:
            container = self.n_containers
            self.n_containers += 1
        self.stack.append((tag, container, negative, False))
        if tag in _BLOCK_TAGS:
            blk = _Block(container, negative)
            self.blocks.append(blk)
            self.open_blocks.append(blk)

    def handle_endtag(self, tag):
        self.bare_block = None
        if tag in self.pending_closers:
            self.pending_closers[tag] -= 1
        # no blanket drop_depth early-exit: an ancestor's end tag must be
        # able to implicitly close an UNCLOSED <template>/<svg>/… so the
        # rest of the document is not silently dropped (a tag not on the
        # stack is a no-op — the scan simply finds no match)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i][0] == tag:
                if tag not in _DROP_SUBTREES:
                    # would this unwind cross a drop root whose own end
                    # tag is still coming? Then it's a STRAY end tag
                    # inside the subtree (wild unbalanced markup) — keep
                    # dropping rather than leak the subtree's remainder
                    for t, _c, _n, _d in self.stack[i:]:
                        if t in _DROP_SUBTREES and self.pending_closers.get(t, 0) > 0:
                            return
                closed = self.stack[i:]
                del self.stack[i:]
                # reconcile every counter for implicitly closed elements
                n_blocks = 0
                for t, _, _, in_drop in closed:
                    if t in _DROP_SUBTREES:
                        self.drop_depth -= 1
                    elif in_drop:
                        continue  # never counted toward blocks/links
                    elif t in _BLOCK_TAGS:
                        n_blocks += 1
                    elif t == "a":
                        self.link_depth -= 1
                if n_blocks:
                    del self.open_blocks[-n_blocks:]
                break

    def handle_startendtag(self, tag, attrs):
        if tag in _DROP_SUBTREES:
            # a self-closing <svg/>/<template/> is an EMPTY subtree:
            # nothing to drop — and it must not touch pending_closers
            # (the counter pre-pass skips it identically)
            self.bare_block = None
            return
        super().handle_startendtag(tag, attrs)

    def handle_data(self, data):
        if self.drop_depth:
            return
        text = data.strip()
        if not text:
            return
        if self.open_blocks:
            blk = self.open_blocks[-1]
        else:
            # bare text directly inside a container (div/article/…):
            # an anonymous block per contiguous run, so pages without
            # <p> markup still extract (docstring step 2)
            if self.bare_block is None:
                _, container, negative, _ = self.stack[-1]
                self.bare_block = _Block(container, negative)
                self.blocks.append(self.bare_block)
            blk = self.bare_block
        blk.texts.append(text)
        blk.text_len += len(text)
        if self.link_depth:
            blk.link_len += len(text)


class _CloserCounter(HTMLParser):
    """Pre-pass counting drop-subtree END-TAG EVENTS (not raw text):
    a '</template>' inside a comment or a self-closing <svg/> must not
    skew the count, or the extractor's stray-end-tag heuristic desyncs
    — the counter and _Extractor see the exact same event stream."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.counts: dict[str, int] = {}

    def handle_endtag(self, tag):
        if tag in _DROP_SUBTREES:
            self.counts[tag] = self.counts.get(tag, 0) + 1

    def handle_startendtag(self, tag, attrs):
        pass  # mirror _Extractor: self-closing tags fire no end event


def extract_main_content(html: str) -> tuple[str, int, int]:
    """→ (main_text, n_blocks_kept, n_blocks_dropped).

    Container scoring: each text block scores
    ``text_len · (1 − link_density)²`` (0 if its ancestor chain is
    boilerplate-marked); the container with the highest summed score
    wins and its non-negative blocks are emitted in document order,
    whitespace-normalized and joined with single spaces."""
    counter = _CloserCounter()
    counter.feed(html)
    counter.close()
    p = _Extractor(counter.counts)
    p.feed(html)
    p.close()
    scores: dict[int, float] = {}
    for blk in p.blocks:
        if blk.negative or blk.text_len == 0:
            continue
        link_density = blk.link_len / blk.text_len
        score = blk.text_len * (1.0 - link_density) ** 2
        scores[blk.container] = scores.get(blk.container, 0.0) + score
    if not scores:
        return "", 0, len(p.blocks)
    best = max(scores, key=lambda c: (scores[c], -c))
    kept = [
        _WS_RE.sub(" ", " ".join(blk.texts))
        for blk in p.blocks
        if blk.container == best and not blk.negative and blk.text_len
    ]
    return " ".join(kept), len(kept), len(p.blocks) - len(kept)


_MAIN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("main_text", T.StringType(), False),
        T.StructField("n_blocks_kept", T.IntegerType(), False),
        T.StructField("n_blocks_dropped", T.IntegerType(), False),
    ]
)


def html_main_content_df(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(doc_id, html) → (doc_id, main_text, n_blocks_kept,
    n_blocks_dropped) via one Arrow-batched mapInPandas."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                text, kept, dropped = extract_main_content(html)
                rows.append((str(doc_id), text, kept, dropped))
            yield pd.DataFrame(rows, columns=[f.name for f in _MAIN_SCHEMA.fields])

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(html_col).alias("html")
    ).mapInPandas(it, schema=_MAIN_SCHEMA)
