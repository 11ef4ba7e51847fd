"""Property-based tests (hypothesis) for the deterministic core kernels —
the invariants the rest of the engine builds on.  Mirrors the reference's
test strategy of hammering template/term codecs with generated inputs
(SURVEY.md §5) and extends it to the round-4 numeric kernels.

No Ray session needed: every kernel under test is a pure function.
"""

import math
import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rdflib_r2r_ray.stages.sketch import quantile_summary_partial
from rdflib_r2r_ray.stages.text import levenshtein_batch
from rdflib_r2r_ray.template import format_template_array, parse_with_template
from rdflib_r2r_ray.terms import decode, encode_literal, iri_safe, iri_unsafe

# iri_safe leaves RFC 3986 unreserved + sub-delims alone; values built from
# anything (incl. '{', '}', '/', unicode) must round-trip through unsafe
_any_text = st.text(min_size=0, max_size=40)
_slot_text = st.text(
    alphabet=st.characters(blacklist_characters="{}", blacklist_categories=("Cs",)),
    min_size=1, max_size=20)


@settings(max_examples=200, deadline=None)
@given(_any_text)
def test_iri_escape_roundtrip(v):
    assert iri_unsafe(iri_safe(v)) == v


@settings(max_examples=150, deadline=None)
@given(_slot_text, _slot_text)
def test_template_format_parse_roundtrip(a, b):
    """format(template, row) then parse_with_template recovers the ENCODED
    slot values exactly (the reference compares encoded forms,
    conversion_utils.py:517-531) — for any slot content, as long as the
    template's literal separators cannot occur inside an encoded slot
    ('/' is percent-encoded by iri_safe)."""
    t = "http://ex.org/r/{a}/{b}"
    batch = pa.table({"a": pa.array([a]), "b": pa.array([b])})
    s = format_template_array(t, batch, encode=True)[0].as_py()
    got = parse_with_template(s, t)
    assert got is not None
    assert got["a"] == iri_safe(a)
    assert got["b"] == iri_safe(b)
    assert iri_unsafe(got["a"]) == a and iri_unsafe(got["b"]) == b


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters='"',
                                      blacklist_categories=("Cs",)),
               max_size=30),
       st.sampled_from([None, "http://www.w3.org/2001/XMLSchema#integer",
                        "http://www.w3.org/2001/XMLSchema#date"]),
       st.sampled_from([None, "en", "de-AT"]))
def test_term_literal_roundtrip(lex, dt, lang):
    if dt is not None and lang is not None:
        lang = None  # RDF literals carry a datatype OR a language tag
    enc = encode_literal(lex, datatype=dt, lang=lang)
    term = decode(enc)
    assert term.lex == lex
    if lang:
        assert term.kind == "literal" and term.lang == lang
    elif dt:
        assert term.kind == "literal" and term.datatype == dt


def _lev_ref(a: str, b: str) -> int:
    """Textbook O(len(a)·len(b)) DP — the independent oracle."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.text(max_size=8), st.text(max_size=8)),
                min_size=1, max_size=20))
def test_levenshtein_matches_reference(pairs):
    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    got = levenshtein_batch(a, b)
    want = np.array([_lev_ref(x, y) for x, y in pairs], dtype=np.int64)
    assert (got == want).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          width=32),
                min_size=1, max_size=3000),
       st.integers(min_value=8, max_value=256))
def test_quantile_summary_contract(values, k):
    """Weights sum to n; every point's cumulative weight is within
    ceil(n/2k) of its true rank (the MRL rank-error contract)."""
    v = np.asarray(values, dtype=np.float64)
    vals, w = quantile_summary_partial(v, k)
    n = len(v)
    assert int(w.sum()) == n
    assert len(vals) <= k
    sv = np.sort(v)
    cum = np.cumsum(w)
    eps = math.ceil(n / (2 * k))
    for x, c in zip(vals, cum):
        lo = int(np.searchsorted(sv, x, side="left"))
        hi = int(np.searchsorted(sv, x, side="right"))
        # true rank of x is anywhere in [lo+1, hi]; the summary's cumulative
        # weight at x must be within eps of that interval
        assert lo + 1 - eps <= c <= hi + eps, (x, c, lo, hi, eps)


# N-Quads line codec: serialize → parse must be identity on the storage
# form, for every mix of plain literals (with quotes/newlines/tabs/angle
# brackets/backslashes), decorated literals, IRIs, and NULL/named graphs.
_lit = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"),
    min_size=0, max_size=30)  # newlines/tabs/quotes included deliberately
_iri = st.from_regex(r"<[a-z]{1,8}:[A-Za-z0-9/._-]{0,20}>", fullmatch=True)
_obj = st.one_of(
    _lit,                                                   # bare plain literal
    _iri,                                                   # IRI object
    st.builds(lambda l, d: f'"{l}"^^{d}',
              st.from_regex(r"[A-Za-z0-9 ._-]{0,20}", fullmatch=True), _iri),
    st.builds(lambda l: f'"{l}"@en',
              st.from_regex(r"[A-Za-z0-9 ._-]{0,20}", fullmatch=True)),
)


@given(st.lists(st.tuples(_iri, _iri, _obj, st.one_of(st.none(), _iri)),
                min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_nquads_line_codec_roundtrip(rows):
    import io

    import pyarrow.compute as pc

    from rdflib_r2r_ray.sources.tables import _decode_nt_objects
    from rdflib_r2r_ray.state.checkpoint import _nq_lines

    tbl = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj": pa.array([r[2] for r in rows]),
        "graph": pa.array([r[3] for r in rows], pa.string()),
    })
    data = _nq_lines(tbl).decode()
    lines = pa.array([l for l in data.split("\n") if l])
    m4 = pc.extract_regex(
        lines,
        r"^\s*(?P<s>\S+)\s+(?P<p>\S+)\s+(?P<o>.*\S)\s+(?P<g><[^<>\s]+>)\s*\.\s*$")
    m3 = pc.extract_regex(
        lines, r"^\s*(?P<s>\S+)\s+(?P<p>\S+)\s+(?P<o>.*?)\s*\.\s*$")
    ok4 = pc.is_valid(m4)
    got = []
    for i in range(len(lines)):
        m = m4[i].as_py() if ok4[i].as_py() else m3[i].as_py()
        o = _decode_nt_objects(pa.array([m["o"]]))[0].as_py()
        got.append((m["s"], m["p"], o, m.get("g") if ok4[i].as_py() else None))
    want = [tuple(r) for r in rows]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.integers(-10**9, 10**9), st.integers(1, 10**6), st.integers(1, 256))
def test_sqldb_fragment_bounds_partition(lo, span, k):
    """Key-range fragmentation is a PARTITION of [lo, hi): disjoint,
    contiguous, exhaustive, at most k ranges, each non-empty."""
    from rdflib_r2r_ray.sources.sqldb import fragment_bounds

    hi = lo + span
    b = fragment_bounds(lo, hi, k)
    assert 1 <= len(b) <= k
    assert b[0][0] == lo and b[-1][1] == hi
    for (a0, a1), (b0, _) in zip(b, b[1:]):
        assert a1 == b0
    assert all(x0 < x1 for x0, x1 in b)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 17), st.integers(1, 13), st.integers(0, 2**31 - 1))
def test_codec_random_image_roundtrips(w, h, seed):
    """PNG and BMP encode→decode are bit-exact on random RGB images of
    arbitrary (non-multiple-of-anything) sizes; GIF round-trips random
    palette index frames."""
    import numpy as np

    from rdflib_r2r_ray.stages import codecs as C

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(C.decode_png(C.encode_png(img)), img)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)

    palette = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (h, w), dtype=np.uint8)
    out = C.decode_gif(C.encode_gif(idx, palette))
    assert np.array_equal(out, palette[idx])


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 2000), st.integers(1, 2), st.integers(0, 2**31 - 1))
def test_codec_random_wav_roundtrip(n, ch, seed):
    """PCM16 WAV encode→decode is bit-exact for random sample buffers,
    mono and stereo, any length."""
    import numpy as np

    from rdflib_r2r_ray.stages import codecs as C

    rng = np.random.default_rng(seed)
    samples = rng.integers(-2**15, 2**15, (n, ch), dtype=np.int16)
    if ch == 1:
        samples = samples[:, 0]
    out, rate, channels = C.decode_wav(C.encode_wav(samples, rate=8000))
    assert rate == 8000 and channels == ch
    assert np.array_equal(out.reshape(samples.shape), samples)
