"""HTML → text extraction for web-archive ingestion — stdlib
html.parser only (the image has no bs4/lxml/trafilatura; the curation
semantics are what matter, and they are whitespace-collapsed visible
text, the baseline every real extractor refines).

Rules: script/style/template/noscript contents are dropped; character
references are resolved (convert_charrefs); block-level boundaries
are rendered as separators so words never glue across tags; all runs
of whitespace collapse to single spaces. Malformed HTML never raises
— html.parser is a forgiving state machine by design.

Shipped by value into executor closures (see operators/multimodal) —
pure stdlib, no compiled-object globals.
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP = {"script", "style", "template", "noscript"}


class _TextExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0
        self.title: str = ""
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True

    def handle_endtag(self, tag):
        if tag in _SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title += data
            return
        if data.strip():
            self._chunks.append(data)

    def text(self) -> str:
        return " ".join(" ".join(self._chunks).split())


def html_to_text(html: str) -> str:
    """Visible text of an HTML document, whitespace-collapsed."""
    p = _TextExtractor()
    p.feed(html or "")
    return p.text()


def html_title(html: str) -> str:
    p = _TextExtractor()
    p.feed(html or "")
    return " ".join(p.title.split())
