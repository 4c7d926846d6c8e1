"""HTML → text main-content extraction (VERDICT r13 "What's missing"
#2): the step between a WARC `response` record and the engine's
`documents` table. `boilerplate_prune` (C4-style line dedup) assumes
text is ALREADY extracted; this module does the extraction with the
stdlib only:

- `extract_main_text(html)` — pure Python: a tolerant
  `html.parser.HTMLParser` walk that drops non-content subtrees
  (script/style/noscript/template/head/nav/header/footer/aside/form/
  iframe/svg/button/select), flushes text into LINES at block-element
  boundaries, and then applies the classic main-content heuristics
  per line: minimum visible length and maximum LINK DENSITY (anchor
  chars / total chars — navigation, related-links and footer cruft are
  link-dense, body prose is not; the boilerplate-removal literature's
  single strongest signal). Entities decode via convert_charrefs;
  malformed HTML never raises (HTMLParser is recovery-by-design).
- `html_main_text(col)` — the Arrow-batched column wrapper
  (pandas_udf). HTML parsing is genuinely imperative, so this is one
  of the repo's few justified Python kernels: a linear per-row pass,
  no shuffle, batch size governed by Arrow; compose downstream with
  the JVM-side `unicode_clean` → `corpus_clean`.

Determinism: pure function of the input string (no locale, no
randomness) — the catalog entry over it is golden-pinnable, and the
WARC → HTML → documents composition is tested end-to-end in
tests/test_warc.py.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["extract_main_text", "html_main_text"]

# subtrees that never contribute main content
_DROP = frozenset(
    "script style noscript template head nav header footer aside form "
    "iframe svg button select option".split()
)
# tags that end a text line (block-level boundaries)
_BLOCK = frozenset(
    "p div br li ul ol h1 h2 h3 h4 h5 h6 tr table td th blockquote pre "
    "article section figure figcaption dl dt dd hr main body".split()
)
# void tags never get close events — do not track them on the stack
_VOID = frozenset(
    "br hr img meta link input area base col embed source track wbr".split()
)


class _MainTextParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_depth = 0
        self._anchor_depth = 0
        self._buf: List[str] = []
        self._buf_link_chars = 0
        self.lines: List[Tuple[str, int]] = []  # (text, link_chars)

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            self.lines.append((text, self._buf_link_chars))
        self._buf = []
        self._buf_link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP and tag not in _VOID:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP and tag not in _VOID:
            # tolerant of stray closes in malformed HTML
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth or not data:
            return
        self._buf.append(data)
        if self._anchor_depth:
            self._buf_link_chars += len("".join(data.split()))


def extract_main_text(
    html: str,
    min_line_chars: int = 20,
    max_link_density: float = 0.5,
) -> str:
    """Main-content text of an HTML document, newline-joined lines.

    A line survives when its whitespace-normalized length is at least
    `min_line_chars` AND its link density (anchor-text chars / non-
    space chars) is at most `max_link_density`. Defaults follow the
    boilerplate-removal heuristics (jusText/C4 neighborhoods): short
    and link-dense lines are chrome, long low-link lines are prose.
    Pass min_line_chars=0, max_link_density=1.0 for a raw full-text
    extraction (everything outside dropped subtrees)."""
    if html is None:
        return None  # type: ignore[return-value]
    p = _MainTextParser()
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001 — extraction is best-effort
        pass  # keep whatever lines were already flushed
    p._flush()
    kept = []
    for text, link_chars in p.lines:
        n = len("".join(text.split()))
        if n == 0 or len(text) < min_line_chars:
            continue
        if n and link_chars / n > max_link_density:
            continue
        kept.append(text)
    return "\n".join(kept)


def html_main_text(
    c,
    min_line_chars: int = 20,
    max_link_density: float = 0.5,
) -> Column:
    """Column form of `extract_main_text` (Arrow-batched pandas_udf —
    the justified-Python seam; see module docstring)."""
    import pandas as pd  # noqa: F401 — anchors the Arrow path
    from pyspark.sql.functions import pandas_udf

    def kernel(col):
        return col.map(
            lambda h: extract_main_text(
                h,
                min_line_chars=min_line_chars,
                max_link_density=max_link_density,
            )
            if h is not None
            else None
        )

    col = F.col(c) if isinstance(c, str) else c
    return pandas_udf(kernel, "string")(col)
