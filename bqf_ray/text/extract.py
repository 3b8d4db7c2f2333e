"""Deterministic HTML → text extraction.

The engine's per-row invariant (BASELINE.json ``input_hint``) is that the
extracted text for a url is byte-identical across runs, versions and
partitionings.  To guarantee that, the extractor is a frozen pure function
over the html bytes: stdlib-only (``re`` + an explicit entity table — no
version-floating dependency), no locale, no randomness.  Golden outputs for
a fixed seed are frozen in tests/test_extract.py.

Pipeline (applied in order):
1. decode UTF-8 (errors="replace")
2. drop <script>/<style>/<template>/<noscript> elements and <!-- comments -->
3. replace every remaining tag with a single space
4. decode a fixed table of HTML entities (incl. numeric &#NNN; / &#xHH;)
5. collapse all unicode whitespace runs to single spaces; strip
"""

from __future__ import annotations

import re

_DROP_RE = re.compile(
    r"<(script|style|template|noscript)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_NUM_ENT_RE = re.compile(r"&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});")

# frozen entity table (deliberately NOT html.unescape: that table can move
# between python versions; this one is part of the engine's contract)
_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
    "&apos;": "'", "&#39;": "'", "&nbsp;": " ", "&copy;": "©",
    "&mdash;": "—", "&ndash;": "–", "&hellip;": "…",
}
_ENT_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))


def _num_entity(m: re.Match) -> str:
    body = m.group(1)
    try:
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
    except ValueError:
        pass
    return m.group(0)


def extract_text(html: bytes | str) -> str:
    """Deterministically extract visible text from html bytes."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _COMMENT_RE.sub(" ", s)
    s = _DROP_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _ENT_RE.sub(lambda m: _ENTITIES[m.group(0)], s)
    s = _NUM_ENT_RE.sub(_num_entity, s)
    return " ".join(s.split())


class ExtractText:
    """Actor-pool ``map_batches`` stage: pages(html) → +text column.

    Stateful-stage form (regexes live module-level, but the class shape keeps
    per-actor setup amortized and is the pattern every model-loading stage
    follows).  Use with ``batch_format="pyarrow"``.
    """

    def __init__(self, html_col: str = "html", out_col: str = "text"):
        self.html_col = html_col
        self.out_col = out_col

    def __call__(self, batch):
        import pyarrow as pa

        html = batch.column(self.html_col)
        texts = [extract_text(v) if v is not None else ""
                 for v in html.to_pylist()]
        return batch.append_column(self.out_col, pa.array(texts, type=pa.string()))
