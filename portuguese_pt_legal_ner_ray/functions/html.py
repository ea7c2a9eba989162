"""HTML <-> text for the web-pages table (stateless, byte-exact).

The corpus renderer wraps each ``"\\n"``-separated segment of ``text`` in
``<p>...</p>`` inside a fixed shell and escapes ``& < >``; extraction is the
exact inverse, so extracted text is byte-identical to the ``text`` column per
url — the per-row invariant from BASELINE.json ``input_hint``.

Two implementations share the contract:

* ``html_to_text`` — scalar Python, used by the single-process oracle.
* ``html_to_text_arrow`` — vectorized ``pyarrow.compute`` kernel chain
  (zero-copy in/out), used by the Ray ``map_batches`` stage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_PREFIX = "<html><body>"
_SUFFIX = "</body></html>"


def escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def unescape(text: str) -> str:
    return text.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def render_html(text: str) -> bytes:
    """Deterministic page renderer used by the corpus synthesizer."""
    body = "".join(f"<p>{escape(seg)}</p>" for seg in text.split("\n"))
    return (_PREFIX + body + _SUFFIX).encode("utf-8")


def html_to_text(html: bytes) -> str:
    """Scalar inverse of :func:`render_html` (oracle path)."""
    s = html.decode("utf-8")
    if s.startswith(_PREFIX) and s.endswith(_SUFFIX):
        s = s[len(_PREFIX) : -len(_SUFFIX)]
    if s.startswith("<p>") and s.endswith("</p>"):
        s = s[3:-4]
    return unescape(s.replace("</p><p>", "\n"))


def html_to_text_arrow(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized inverse of :func:`render_html` over an Arrow binary column.

    Pure ``pyarrow.compute`` kernel chain — no Python-per-row work in the
    Ray hot path (SURVEY.md §7 step 2).
    """
    s = pc.cast(html, pa.large_string())
    s = pc.replace_substring_regex(s, pattern=r"^<html><body><p>", replacement="")
    s = pc.replace_substring_regex(s, pattern=r"</p></body></html>$", replacement="")
    s = pc.replace_substring(s, pattern="</p><p>", replacement="\n")
    # unescape in the inverse order of escape(): entities first, ampersand last
    s = pc.replace_substring(s, pattern="&lt;", replacement="<")
    s = pc.replace_substring(s, pattern="&gt;", replacement=">")
    s = pc.replace_substring(s, pattern="&amp;", replacement="&")
    return pc.cast(s, pa.string())
