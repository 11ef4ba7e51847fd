"""The per-row invariant (BASELINE.json input_hint): byte-identical extracted
text per url."""

import pyarrow as pa

from rdflib_r2r_ray.fixtures import pages_table
from rdflib_r2r_ray.stages.extract import ExtractText, extract_text, make_html


def test_extract_inverts_make_html_bytes_identical():
    pages = pages_table(n=100, seed=7)
    for url, html, text in zip(
        pages["url"].to_pylist(), pages["html"].to_pylist(), pages["text"].to_pylist()
    ):
        assert extract_text(html) == text, url


def test_extract_strips_noise():
    html = (
        b"<html><head><title>T</title><style>p{}</style>"
        b"<script>var x='<p>hi</p>';</script></head>"
        b"<body><!-- nav --><p>a &amp; b</p>\n<p>c</p></body></html>"
    )
    assert extract_text(html) == "a & b c"


def test_extract_stage_drops_html_column():
    pages = pages_table(n=20, seed=3)
    stage = ExtractText()
    out = stage(pages.drop_columns(["text"]))
    assert "html" not in out.column_names
    assert out["text"].to_pylist() == pages["text"].to_pylist()


def test_empty_text_roundtrip():
    assert extract_text(make_html("", "http://x/")) == ""


def test_vectorized_extract_equals_scalar_reference():
    """extract_text_array must be byte-identical to the pinned scalar
    extractor over make_html corpora (the per-url invariant)."""
    import pyarrow as pa

    from rdflib_r2r_ray.stages.extract import (
        extract_text, extract_text_array, make_html)

    texts = [
        "", "one", "a b c " * 40, "x & y < z > w", 'quotes " and \' inside',
        "ampersand soup &amp; &lt; raw", "unicode-free plain words here",
    ]
    htmls = [make_html(t, f"http://e/{i}") for i, t in enumerate(texts)]
    arr = pa.array(htmls, pa.binary())
    vec = extract_text_array(arr).to_pylist()
    ref = [extract_text(h) for h in htmls]
    assert vec == ref
