"""SPARQL front end: parser, algebra lowering, filters, modifiers,
initBindings, transitive paths."""

import pyarrow as pa
import pytest

from rdflib_r2r_ray.sparql import SparqlParser, execute

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _graph():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>", "<c>", "<a>", "<b>", "<c>", "<a>", "<b>"],
        "pred": ["<knows>", "<knows>", "<knows>", "<age>", "<age>", "<age>",
                 "<name>", "<name>"],
        "obj": ["<b>", "<c>", "<a>", f'"30"^^<{XSD_INT}>', f'"25"^^<{XSD_INT}>',
                f'"40"^^<{XSD_INT}>', "Alice", "Bob"],
    }))


def test_parser_shapes():
    q = SparqlParser("""
      PREFIX ex: <http://ex.org/>
      SELECT DISTINCT ?x ?y WHERE {
        ?x ex:knows ?y .
        ?y ex:age ?a .
        FILTER(?a > 18 && ?a <= 65)
      } ORDER BY DESC(?x) ?y LIMIT 7 OFFSET 2
    """).parse()
    assert q.distinct and q.variables == ("x", "y")
    assert len(q.patterns) == 2
    assert q.patterns[0][1] == "<http://ex.org/knows>"
    assert q.filters[0].kind == "and"
    assert q.order_by == (("x", True), ("y", False))
    assert q.limit == 7 and q.offset == 2


def test_parser_rejects_unsupported():
    with pytest.raises(ValueError):
        SparqlParser("SELECT ?x WHERE { ?x ex:p ?y }").parse()  # unknown prefix


def test_bgp_join_and_numeric_filter(ray_session):
    out = execute(_graph(), """
      SELECT ?x ?n WHERE { ?x <knows> ?y . ?x <age> ?n . FILTER(?n > 26) }
    """)
    got = sorted((r["x"], r["n"]) for r in out.take_all())
    assert got == [("<a>", f'"30"^^<{XSD_INT}>'), ("<c>", f'"40"^^<{XSD_INT}>')]


def test_string_filter_disjunction(ray_session):
    out = execute(_graph(), """
      SELECT ?x WHERE { ?x <name> ?nm . FILTER(?nm = "Alice" || ?nm = "Bob") }
      ORDER BY DESC(?x) LIMIT 5
    """)
    assert [r["x"] for r in out.take_all()] == ["<b>", "<a>"]


def test_seq_path_and_modifiers(ray_session):
    out = execute(_graph(), """
      SELECT DISTINCT ?x WHERE { ?x <knows>/<knows> ?z . } ORDER BY ?x LIMIT 2
    """)
    assert [r["x"] for r in out.take_all()] == ["<a>", "<b>"]


def test_init_bindings(ray_session):
    out = execute(_graph(), "SELECT ?y WHERE { ?x <knows> ?y . }",
                  init_bindings={"x": "<a>"})
    assert [r["y"] for r in out.take_all()] == ["<b>"]


def test_transitive_path_in_query(ray_session):
    out = execute(_graph(), """
      SELECT ?x ?z WHERE { ?x <knows>+ ?z . FILTER(?x = <a>) }
    """)
    got = sorted((r["x"], r["z"]) for r in out.take_all())
    # cycle a->b->c->a: closure from a reaches everything incl. itself
    assert got == [("<a>", "<a>"), ("<a>", "<b>"), ("<a>", "<c>")]


def test_optional_left_join(ray_session):
    """OPTIONAL keeps unmatched required rows with nulls (left join)."""
    out = execute(_graph(), """
      SELECT ?x ?y ?nm WHERE { ?x <knows> ?y . OPTIONAL { ?x <name> ?nm } }
    """)
    rows = {(r["x"], r["y"], r["nm"]) for r in out.take_all()}
    assert rows == {
        ("<a>", "<b>", "Alice"),
        ("<b>", "<c>", "Bob"),
        ("<c>", "<a>", None),   # <c> has no <name> — preserved with null
    }


def test_union_branches(ray_session):
    out = execute(_graph(), """
      SELECT ?x ?v WHERE {
        { ?x <name> ?v . FILTER(?v = "Alice") }
        UNION
        { ?x <age> ?v . FILTER(?v > 35) }
      }
    """)
    rows = {(r["x"], r["v"]) for r in out.take_all()}
    assert rows == {
        ("<a>", "Alice"),
        ("<c>", '"40"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    }


def test_minus_anti_join(ray_session):
    """MINUS removes solutions matching the minus group on shared vars."""
    out = execute(_graph(), """
      SELECT ?x ?y WHERE { ?x <knows> ?y . MINUS { ?x <name> ?nm } }
    """)
    rows = {(r["x"], r["y"]) for r in out.take_all()}
    assert rows == {("<c>", "<a>")}  # <a>, <b> have names -> removed


def test_group_by_aggregates(ray_session):
    import ray.data as rd

    triples = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>", "<c>"],
        "pred": ["<in>", "<in>", "<in>"],
        "obj": ["<g1>", "<g1>", "<g2>"],
    }))
    out = execute(triples, """
      SELECT ?g (COUNT(?x) AS ?n) WHERE { ?x <in> ?g . } GROUP BY ?g
    """)
    rows = sorted((r["g"], r["n"]) for r in out.take_all())
    assert rows == [("<g1>", 2), ("<g2>", 1)]
