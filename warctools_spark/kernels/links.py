"""HTML link extraction kernel.

Clean-room reimplementation of the reference's fallback LinkParser
(/root/reference/hanzo/warclinks.py:110-199): per-tag attribute table,
<base href> override, <meta ... content="...;url=..."> extraction, and
relative-URL absolutization with the exact '../'/'./' squash loop.
The lxml path (warclinks.py:79-95) is not available in this container;
the fallback table is the semantic contract.

Per-link control-character strip ('\\n\\r\\t') mirrors
warclinks.py:66.
"""

from __future__ import annotations

import posixpath
from functools import lru_cache
from html.parser import HTMLParser
from urllib.parse import urlparse, urlunparse

# urlparse is pure and ParseResult immutable; link graphs repeat
# targets heavily, so caching across documents is a large win
_urlparse = lru_cache(maxsize=1 << 16)(urlparse)

# warclinks.py:133-157
_TAG_ATTRS = {
    "a": ("href",),
    "applet": ("code",),
    "area": ("href",),
    "bgsound": ("src",),
    "body": ("background",),
    "embed": ("href", "src"),
    "fig": ("src",),
    "form": ("action",),
    "frame": ("src",),
    "iframe": ("src",),
    "img": ("href", "src", "lowsrc"),
    "input": ("src",),
    "link": ("href",),
    "layer": ("src",),
    "object": ("data",),
    "overlay": ("src",),
    "script": ("src",),
    "table": ("background",),
    "td": ("background",),
    "th": ("background",),
}


def _meta_urls(attrs):
    """meta content="0;url=..." extraction (warclinks.py:116-124)."""
    urls = []
    for key, value in attrs:
        if key == "content" and value:
            for pair in value.split(";"):
                bits = pair.split("=", 2)
                if len(bits) > 1 and bits[0].lower() == "url":
                    urls.append(bits[1].strip())
    return urls


class _LinkCollector(HTMLParser):
    def __init__(self, base: str):
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []
        self.base = base

    def handle_starttag(self, tag, attrs):
        if tag == "base":
            # warclinks.py:159-163 — last href wins
            hrefs = [v for k, v in attrs if k == "href" and v]
            if hrefs:
                self.base = hrefs[-1]
            return
        if tag == "meta":
            self.links.extend(_meta_urls(attrs))
            return
        names = _TAG_ATTRS.get(tag)
        if names:
            self.links.extend(v for k, v in attrs if k in names and v)

    def abs_links(self):
        """get_abs_links (warclinks.py:170-199)."""
        full = []
        root = _urlparse(self.base)
        root_dir = posixpath.split(root.path)[0]
        for link in self.links:
            parsed = _urlparse(link)
            if not parsed.netloc:  # relative (no host)
                if parsed.path.startswith("/"):
                    parsed = root[0:2] + parsed[2:5] + ("",)
                else:
                    d = root_dir
                    path = parsed.path
                    while True:
                        if path.startswith("../"):
                            path = path[3:]
                            d = posixpath.split(d)[0]
                        elif path.startswith("./"):
                            path = path[2:]
                        else:
                            break
                    parsed = (
                        root[0:2]
                        + (posixpath.join(d, path),)
                        + parsed[3:5]
                        + ("",)
                    )
                link = urlunparse(parsed)
            full.append(link)
        return full


def extract_links(base_url: str, body: bytes | str) -> list[str]:
    """Absolutized outlinks of one HTML document, with '\\n\\r\\t'
    stripped from each link (warclinks.py:66). Parse errors swallow the
    document (warclinks.py:69-75, 106-107) and return []."""
    if isinstance(body, (bytes, bytearray)):
        try:
            body = bytes(body).decode("utf-8")
        except UnicodeDecodeError:
            body = bytes(body).decode("latin-1")
    try:
        collector = _LinkCollector(base_url)
        collector.feed(body)
        collector.close()
        links = collector.abs_links()
    except Exception:
        return []
    # C-speed equivalent of "".join(c for c in link if c not in '\n\r\t')
    return [link.translate(_CTL_STRIP) for link in links]


_CTL_STRIP = {ord("\n"): None, ord("\r"): None, ord("\t"): None}
