"""Template format/parse tests — semantics cloned from the reference's
`tests/test_conversion_utils.py:27-102` (match, mismatch, multi-column)."""

import pyarrow as pa
import pytest

from rdflib_r2r_ray.template import (
    format_template_array,
    is_absolute_iri,
    parse_with_template,
    split_template,
    template_columns,
)


def test_split_template():
    assert split_template("http://ex/{A}/x{B}") == [
        ("http://ex/", "A"),
        ("/x", "B"),
    ]
    # direct mapping writes quoted column names: Table/pk={"pk"}
    assert split_template('T/pk={"pk"}') == [("T/pk=", "pk")]
    assert template_columns("http://ex/{A}/x{B}") == ["A", "B"]


def test_format_basic():
    batch = pa.table({"A": [1, 2], "B": ["x y", "z"]})
    out = format_template_array("http://ex/{A}/{B}", batch, encode=True)
    assert out.to_pylist() == ["http://ex/1/x%20y", "http://ex/2/z"]


def test_format_null_slot_yields_null():
    batch = pa.table({"A": [1, None]})
    out = format_template_array("http://ex/{A}", batch, encode=True)
    assert out.to_pylist() == ["http://ex/1", None]


def test_format_relative_resolved_against_base():
    batch = pa.table({"pk": ["v 1"]})
    out = format_template_array('EMP/pk={"pk"}', batch, encode=True,
                                base="http://example.com/base/")
    assert out.to_pylist() == ["http://example.com/base/EMP/pk=v%201"]
    assert is_absolute_iri("http://x/")
    assert not is_absolute_iri("EMP/pk={pk}")


def test_format_no_encode_for_literal_templates():
    batch = pa.table({"A": ["x y"]})
    out = format_template_array("hello {A}", batch, encode=False)
    assert out.to_pylist() == ["hello x y"]


def test_parse_with_template_roundtrip():
    # reference parse_with_template: (.*) per slot, fullmatch
    assert parse_with_template("http://ex/1/z", "http://ex/{A}/{B}") == {"A": "1", "B": "z"}
    assert parse_with_template("http://other/1", "http://ex/{A}") is None
    assert parse_with_template("EMP/empno=7369", "EMP/empno={empno}") == {"empno": "7369"}
    # multi-column composite
    got = parse_with_template("order_details/5/7", "order_details/{OrderID}/{ProductID}")
    assert got == {"OrderID": "5", "ProductID": "7"}


def test_constant_template_array():
    batch = pa.table({"A": [1, 2, 3]})
    out = format_template_array("http://ex/const", batch, encode=True)
    assert out.to_pylist() == ["http://ex/const"] * 3
