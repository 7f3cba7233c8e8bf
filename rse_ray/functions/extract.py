"""HTML -> (title, description, body, text, links) extraction.

Pinned to the reference crawler's DOM-walk semantics
(reference: crawler/src/crawler/crawler/crawler.go):

  * title       — text content of the FIRST <title> element; a later
                  <title> only wins if every earlier one was empty
                  (the ``title == ""`` guard, crawler.go:256-258).
                  <title> is RCDATA per HTML5 (Go's x/net/html): markup
                  inside it is literal text; character references are
                  decoded.
  * description — ``content`` attribute of the LAST
                  <meta name="description"> in document order; the name
                  value is compared case-insensitively and there is no
                  emptiness guard (crawler.go:259-270). A matching meta
                  without a content attribute resets it to "".
  * body        — depth-first concatenation of text under each <p>
                  element with NO separators inside a paragraph
                  (getTextContent, crawler.go:281-292), paragraphs
                  joined by a single space (FIXTURES.md §1.3).
  * text        — ``title + "\\n" + description + "\\n" + body``: the
                  byte-identical per-row invariant (BASELINE input_hint).
  * links       — for each <a>, the FIRST href attribute only
                  (crawler.go:313), resolved against the page URL
                  (RFC 3986, crawler.go:326-332 -> urllib.parse.urljoin),
                  kept only if scheme in {http, https}, no fragment and
                  a non-empty host (isValidURL, crawler.go:334-349).

Implementation is event-driven (html.parser) rather than tree-building:
the same traversal order as a DFS over the parsed tree, without
materializing a DOM per document — the per-batch hot path allocates a
parser per document and nothing else.
"""

from __future__ import annotations

import html as _htmlmod
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit


class _Extractor(HTMLParser):
    # Treat <title> as raw-text (RCDATA) like HTML5 parsers do: markup
    # inside it is literal text. html.parser only special-cases
    # script/style by default; adding title here makes its content
    # arrive as plain data until the matching close tag.
    CDATA_CONTENT_ELEMENTS = ("script", "style", "title")

    def __init__(self) -> None:
        # convert_charrefs=False: entity handling must be uniform between
        # normal and CDATA content, so we decode captured text ourselves.
        super().__init__(convert_charrefs=False)
        self.title = ""
        self.description = ""
        self.paragraphs: list[str] = []
        self.hrefs: list[str] = []
        # (href, text content) per href-bearing <a>, aligned with hrefs
        self.anchors: list[tuple[str, str]] = []
        self._in_title = False
        self._title_buf: list[str] = []
        self._p_depth = 0
        self._p_buf: list[str] = []
        self._in_a = False
        self._a_href: str | None = None
        self._a_buf: list[str] = []

    # -- tag handlers -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "title":
            self._in_title = True
            self._title_buf = []
        elif tag == "p":
            if self._p_depth == 0:
                self._p_buf = []
            self._p_depth += 1
        elif tag == "meta":
            self._handle_meta(attrs)
        elif tag == "a":
            # a new <a> implicitly closes an open one (HTML5 behavior)
            self._close_anchor()
            self._in_a = True
            self._a_href = None
            self._a_buf = []
            for k, v in attrs:
                if k == "href":  # first href attr only (crawler.go:313)
                    self.hrefs.append(v or "")
                    self._a_href = v or ""
                    break

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "meta":
            self._handle_meta(attrs)
        elif tag == "a":
            # HTML5 ignores the trailing slash on non-void elements:
            # <a/> IS an open tag — route through handle_starttag so
            # anchors stay aligned with hrefs and following text
            # attributes to this anchor
            self.handle_starttag(tag, attrs)

    def _close_anchor(self) -> None:
        if self._in_a:
            if self._a_href is not None:
                self.anchors.append(
                    (self._a_href,
                     _htmlmod.unescape("".join(self._a_buf))))
            self._in_a = False

    def _handle_meta(self, attrs) -> None:
        name = None
        content = None
        saw_content = False
        for k, v in attrs:
            if k == "name" and name is None:
                name = v
            elif k == "content" and not saw_content:
                content = v
                saw_content = True
        if name is not None and name.lower() == "description":
            # last one wins; no emptiness guard (crawler.go:259-270)
            self.description = _htmlmod.unescape(content or "")

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            if self._in_title and self.title == "":
                self.title = _htmlmod.unescape("".join(self._title_buf))
            self._in_title = False
        elif tag == "p" and self._p_depth > 0:
            self._p_depth -= 1
            if self._p_depth == 0:
                self.paragraphs.append("".join(self._p_buf))
        elif tag == "a":
            self._close_anchor()

    # -- text handlers ------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title_buf.append(data)
        elif self._p_depth > 0:
            self._p_buf.append(data)
        if self._in_a and not self._in_title:
            self._a_buf.append(data)

    def handle_entityref(self, name: str) -> None:
        self.handle_data(f"&{name};")

    def handle_charref(self, name: str) -> None:
        self.handle_data(f"&#{name};")


def extract(html: bytes | str) -> dict:
    """Extract one page. Returns dict with title, description, body,
    text and raw hrefs (unresolved)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    # close any unterminated <p> / <a>
    if p._p_depth > 0:
        p.paragraphs.append("".join(p._p_buf))
    p._close_anchor()
    body = " ".join(_htmlmod.unescape(s) for s in p.paragraphs)
    text = f"{p.title}\n{p.description}\n{body}"
    return {
        "title": p.title,
        "description": p.description,
        "body": body,
        "text": text,
        "hrefs": p.hrefs,
        "anchors": p.anchors,
    }


def resolve_one(base_url: str, href: str) -> str | None:
    """Resolve + validate ONE href per the reference's
    isValidURL/resolveURL (crawler.go:326-349): RFC 3986 resolution,
    scheme must be http(s), fragment must be empty, host non-empty.
    None = dropped."""
    try:
        absu = urljoin(base_url, href)
        parts = urlsplit(absu)
    except ValueError:
        return None
    if parts.scheme not in ("http", "https"):
        return None
    if parts.fragment != "":
        return None
    if parts.netloc == "":
        return None
    return absu


def resolve_links(base_url: str, hrefs: list[str]) -> list[str]:
    """Resolve + validate hrefs (resolve_one per href).
    Order-preserving; duplicates kept (the reference pushes each onto
    the frontier; dedup happens at the visited-set / D1 stage)."""
    out = []
    for href in hrefs:
        absu = resolve_one(base_url, href)
        if absu is not None:
            out.append(absu)
    return out
