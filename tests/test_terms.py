"""Unit tests for the term kernel — parity with the reference's encoding
(`rdflib_r2r/r2r_store.py:125-148`, `r2r_mapping.py:20-21`)."""

import urllib.parse

import pyarrow as pa
import pytest

from rdflib_r2r_ray import terms


def test_iri_safe_matches_urllib_quote():
    for v in ["a b/c(d),e:f", "plain", "ü€", "x%y", "a.b-c_d~e"]:
        assert terms.iri_safe(v) == urllib.parse.quote(v, safe="")


def test_iri_safe_array_fast_path_and_slow_path():
    arr = pa.array(["plain", "a.b-c_d~e"])  # all unreserved
    out = terms.iri_safe_array(arr)
    assert out.to_pylist() == ["plain", "a.b-c_d~e"]

    arr = pa.array(["a b/c(d),e:f", "plain", None])
    out = terms.iri_safe_array(arr)
    assert out.to_pylist() == ["a%20b%2Fc%28d%29%2Ce%3Af", "plain", None]


def test_encode_decode_roundtrip():
    cases = [
        ("<http://ex.org/a>", terms.Term("iri", "http://ex.org/a")),
        ("_:b0", terms.Term("bnode", "b0")),
        ("plain literal", terms.Term("literal", "plain literal")),
        ('"10"^^<http://www.w3.org/2001/XMLSchema#integer>',
         terms.Term("literal", "10", datatype="http://www.w3.org/2001/XMLSchema#integer")),
        ('"Ireland"@en', terms.Term("literal", "Ireland", lang="en")),
    ]
    for encoded, want in cases:
        assert terms.decode(encoded) == want


def test_encode_literal_forms():
    XSD = terms.XSD
    assert terms.encode_literal("10", datatype=XSD + "integer") == f'"10"^^<{XSD}integer>'
    assert terms.encode_literal("hi", lang="en") == '"hi"@en'
    assert terms.encode_literal("hi") == "hi"  # plain travels raw (make_node)


def test_lexical_array_types():
    import datetime as dt

    assert terms.lexical_array(pa.array([1, None, -3])).to_pylist() == ["1", None, "-3"]
    assert terms.lexical_array(pa.array([True, False])).to_pylist() == ["true", "false"]
    assert terms.lexical_array(pa.array([1.5])).to_pylist() == ["1.5"]
    assert terms.lexical_array(pa.array([b"\x00\xff"], pa.binary())).to_pylist() == ["00FF"]
    assert terms.lexical_array(
        pa.array([dt.date(2020, 1, 2)], pa.date32())
    ).to_pylist() == ["2020-01-02"]
    assert terms.lexical_array(
        pa.array([dt.datetime(2020, 1, 2, 3, 4, 5)], pa.timestamp("us"))
    ).to_pylist() == ["2020-01-02T03:04:05"]


def test_decorate_literal_array_null_propagation():
    arr = pa.array(["a", None])
    out = terms.decorate_literal_array(arr, terms.XSD + "string", None)
    assert out.to_pylist() == [f'"a"^^<{terms.XSD}string>', None]
    out = terms.decorate_literal_array(arr, None, "en")
    assert out.to_pylist() == ['"a"@en', None]
