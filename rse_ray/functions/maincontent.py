"""Main-content extraction (boilerplate removal) for web pages.

The reference extracts the FULL DOM text (crawler.go:262-292 — every
text node, no separators); real webtext training pipelines then strip
navigation/sidebar/footer boilerplate before the text enters a corpus
(the CCNet / jusText / trafilatura step). This is the deterministic
jusText-lite form of that step, built on stdlib html.parser:

1. **Block segmentation** — DOM text splits into blocks at block-level
   tag boundaries (p, div, li, h1-h6, nav, footer, td, ...); inline
   tags (a, b, span, ...) do not split. ``<script>/<style>/<head>``
   subtrees contribute no text. Whitespace inside a block collapses to
   single spaces (empty blocks vanish).
2. **Classification** — a block is CONTENT iff it has at least
   ``min_words`` words AND its link density (fraction of its
   characters under an ``<a>`` ancestor) is at most
   ``max_link_density``. Everything else is boilerplate: nav bars and
   link farms die on density no matter how wordy, footers/headings die
   on length. (jusText additionally promotes short headings adjacent
   to content and uses stopword density; both need language tables —
   this operator stays language-agnostic and deterministic.)
3. **Output** — content blocks joined with ``\\n``, in document order.

The rules are exact functions of the markup, so the fixture generator
can plant pages with KNOWN content + boilerplate and write the golden
main text by construction — no circular reference to this code.
"""

from __future__ import annotations

from html.parser import HTMLParser

BLOCK_TAGS = frozenset("""
    address article aside blockquote br caption dd div dl dt fieldset
    figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr li main
    nav ol p pre section table tbody td tfoot th thead tr ul
""".split())

SKIP_TAGS = frozenset(
    ["script", "style", "noscript", "template", "head", "title"])

# Skip tags whose content model cannot legally contain block-level
# elements: a block start tag seen while one of these is open means the
# close tag was MISSING (malformed crawl HTML), so the frame is closed
# implicitly — browsers auto-close <head>/<title> the same way. NOT
# applied to noscript/template (block children are valid there, the
# region really is boilerplate) nor to script/style (html.parser's
# CDATA mode never fires handle_starttag inside them; an unterminated
# <script> therefore swallows the document remainder, which matches
# browser behavior for that malformation). Round-4 ADVICE.
_AUTO_CLOSE_SKIP = frozenset(["head", "title"])


class _BlockParser(HTMLParser):
    """Collects (normalized_text, link_chars, total_chars) blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self._segs: list[tuple[str, bool]] = []
        self._a_depth = 0
        self._skip_stack: list[str] = []

    @property
    def _skip_depth(self) -> int:
        return len(self._skip_stack)

    def _flush(self) -> None:
        if not self._segs:
            return
        text = " ".join("".join(s for s, _ in self._segs).split())
        if text:
            total = 0
            linked = 0
            for s, in_a in self._segs:
                n = len(" ".join(s.split()))
                total += n
                if in_a:
                    linked += n
            self.blocks.append((text, linked, max(total, 1)))
        self._segs = []

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip_stack.append(tag)
            return
        if tag in BLOCK_TAGS:
            while self._skip_stack \
                    and self._skip_stack[-1] in _AUTO_CLOSE_SKIP:
                self._skip_stack.pop()  # unterminated <head>/<title>
            self._flush()
        elif tag == "a":
            self._a_depth += 1

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            if tag in self._skip_stack:
                # pop through any unterminated inner skip frames too
                while self._skip_stack.pop() != tag:
                    pass
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self._segs.append((data, self._a_depth > 0))

    def close(self):
        super().close()
        self._flush()


def content_blocks(html: str | bytes) -> list[tuple[str, int, int]]:
    """html -> [(normalized_text, link_chars, total_chars)] blocks in
    document order."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.blocks


def extract_main(html: str | bytes, *, min_words: int = 10,
                 max_link_density: float = 0.4) -> tuple[str, int, int]:
    """html -> (main_text, n_blocks_kept, n_blocks_total)."""
    blocks = content_blocks(html)
    kept = [t for t, linked, total in blocks
            if len(t.split()) >= min_words
            and linked / total <= max_link_density]
    return "\n".join(kept), len(kept), len(blocks)
