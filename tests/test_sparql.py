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


def test_minus_matching_nothing_keeps_all(ray_session):
    """A MINUS group with zero solutions removes nothing — regression for
    the empty-build-side anti join (Ray can't infer the schema of a
    zero-row Dataset; planned_join must synthesize the key columns)."""
    out = execute(_graph(), """
      SELECT ?x ?y WHERE { ?x <knows> ?y . MINUS { ?x <nosuchpred> ?z } }
    """)
    rows = {(r["x"], r["y"]) for r in out.take_all()}
    assert rows == {("<a>", "<b>"), ("<b>", "<c>"), ("<c>", "<a>")}


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


# ---------------------------------------------------------------------------
# round 3: full expression surface (BIND/REGEX/IF/casts, EXISTS, VALUES,
# HAVING, AVG/GROUP_CONCAT/global/multiple aggregates, numeric ordering)
# ---------------------------------------------------------------------------

def test_filter_regex(ray_session):
    out = execute(_graph(), """
      SELECT ?x WHERE { ?x <name> ?nm . FILTER(REGEX(?nm, "^ali", "i")) }
    """)
    assert [r["x"] for r in out.take_all()] == ["<a>"]


def test_filter_arith_and_cast(ray_session):
    out = execute(_graph(), """
      SELECT ?x WHERE { ?x <age> ?a . FILTER(?a * 2 >= 60 && ?a / 2 < 20) }
    """)
    assert sorted(r["x"] for r in out.take_all()) == ["<a>"]


def test_bind_arith_and_if(ray_session):
    out = execute(_graph(), """
      SELECT ?x ?dbl ?cls WHERE {
        ?x <age> ?a .
        BIND(?a * 2 AS ?dbl)
        BIND(IF(?a >= 30, "old", "young") AS ?cls)
      }
    """)
    rows = {(r["x"], r["dbl"], r["cls"]) for r in out.take_all()}
    assert rows == {("<a>", 60.0, "old"), ("<b>", 50.0, "young"), ("<c>", 80.0, "old")}


def test_filter_on_bound_alias(ray_session):
    out = execute(_graph(), """
      SELECT ?x WHERE { ?x <age> ?a . BIND(?a + 1 AS ?b) FILTER(?b > 31) }
    """)
    assert sorted(r["x"] for r in out.take_all()) == ["<c>"]


def test_exists_and_not_exists(ray_session):
    out = execute(_graph(), """
      SELECT ?x ?y WHERE { ?x <knows> ?y . FILTER EXISTS { ?x <name> ?nm } }
    """)
    assert {(r["x"], r["y"]) for r in out.take_all()} == {("<a>", "<b>"), ("<b>", "<c>")}
    out2 = execute(_graph(), """
      SELECT ?x ?y WHERE { ?x <knows> ?y . FILTER NOT EXISTS { ?x <name> ?nm } }
    """)
    assert {(r["x"], r["y"]) for r in out2.take_all()} == {("<c>", "<a>")}


def test_values_join(ray_session):
    out = execute(_graph(), """
      SELECT ?x ?y WHERE { ?x <knows> ?y . VALUES ?x { <a> <c> } }
    """)
    assert {(r["x"], r["y"]) for r in out.take_all()} == {("<a>", "<b>"), ("<c>", "<a>")}


def test_having_and_multiple_counts(ray_session):
    import ray.data as rd

    triples = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>", "<c>", "<d>"],
        "pred": ["<in>", "<in>", "<in>", "<in>"],
        "obj": ["<g1>", "<g1>", "<g2>", "<g1>"],
    }))
    out = execute(triples, """
      SELECT ?g (COUNT(?x) AS ?n) (COUNT(*) AS ?m) WHERE { ?x <in> ?g . }
      GROUP BY ?g HAVING(?n >= 2)
    """)
    rows = [(r["g"], r["n"], r["m"]) for r in out.take_all()]
    assert rows == [("<g1>", 3, 3)]


def test_count_skips_unbound(ray_session):
    """COUNT(?v) counts bound values only (ADVICE round-2 divergence)."""
    out = execute(_graph(), """
      SELECT ?y (COUNT(?nm) AS ?n) (COUNT(*) AS ?m) WHERE {
        ?x <knows> ?y . OPTIONAL { ?y <name> ?nm }
      } GROUP BY ?y
    """)
    rows = sorted((r["y"], r["n"], r["m"]) for r in out.take_all())
    # <a> knows <b> (named Bob), <b> knows <c> (unnamed), <c> knows <a> (Alice)
    assert rows == [("<a>", 1, 1), ("<b>", 1, 1), ("<c>", 0, 1)]


def test_avg_sum_numeric_minmax(ray_session):
    out = execute(_graph(), """
      SELECT (AVG(?a) AS ?avg) (SUM(?a) AS ?sum) (MIN(?a) AS ?lo) (MAX(?a) AS ?hi)
      WHERE { ?x <age> ?a . }
    """)
    rows = out.take_all()
    assert len(rows) == 1
    r = rows[0]
    # numeric MIN over {"30","25","40"}^^xsd:integer is 25, not lexical "25"
    assert (r["avg"], r["sum"], r["lo"], r["hi"]) == (95.0 / 3, 95.0, 25.0, 40.0)


def test_group_concat(ray_session):
    out = execute(_graph(), """
      SELECT ?x (GROUP_CONCAT(?nm ; SEPARATOR "|") AS ?names)
      WHERE { ?x <name> ?nm . } GROUP BY ?x
    """)
    rows = sorted((r["x"], r["names"]) for r in out.take_all())
    assert rows == [("<a>", "Alice"), ("<b>", "Bob")]


def test_order_by_numeric(ray_session):
    """ORDER BY over numeric typed literals sorts numerically: 25 < 30 < 40
    even though '\"25\"' > '\"40\"' compares wrong lexically after '\"1...\"'
    style values; use a 9-vs-10 case to prove it."""
    import ray.data as rd

    triples = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>"],
        "pred": ["<age>", "<age>"],
        "obj": [f'"9"^^<{XSD_INT}>', f'"10"^^<{XSD_INT}>'],
    }))
    out = execute(triples, """
      SELECT ?x ?a WHERE { ?x <age> ?a . } ORDER BY ?a LIMIT 2
    """)
    assert [r["x"] for r in out.take_all()] == ["<a>", "<b>"]  # 9 before 10


def test_min_max_numeric_9_vs_10(ray_session):
    import ray.data as rd

    triples = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>"],
        "pred": ["<age>", "<age>"],
        "obj": [f'"9"^^<{XSD_INT}>', f'"10"^^<{XSD_INT}>'],
    }))
    out = execute(triples, """
      SELECT (MIN(?a) AS ?lo) (MAX(?a) AS ?hi) WHERE { ?x <age> ?a . }
    """)
    r = out.take_all()[0]
    assert (r["lo"], r["hi"]) == (9.0, 10.0)  # lexical MIN would say "10"


def test_filter_inside_optional(ray_session):
    out = execute(_graph(), """
      SELECT ?x ?y ?nm WHERE {
        ?x <knows> ?y . OPTIONAL { ?x <name> ?nm FILTER(?nm = "Alice") }
      }
    """)
    rows = {(r["x"], r["y"], r["nm"]) for r in out.take_all()}
    assert rows == {("<a>", "<b>", "Alice"), ("<b>", "<c>", None), ("<c>", "<a>", None)}


def test_udf_call_in_filter(ray_session):
    out = execute(_graph(), """
      SELECT ?x WHERE {
        ?x <name> ?nm . FILTER(<http://daax.ai/sqlfunc/LOWER>(?nm) = "alice")
      }
    """)
    assert [r["x"] for r in out.take_all()] == ["<a>"]


def test_cast_in_filter(ray_session):
    out = execute(_graph(), """
      SELECT ?x WHERE {
        ?x <age> ?a .
        FILTER(<http://www.w3.org/2001/XMLSchema#integer>(?a) = 25)
      }
    """)
    assert [r["x"] for r in out.take_all()] == ["<b>"]


def test_ask_query(ray_session):
    out = execute(_graph(), 'ASK { ?x <name> "Alice" }')
    assert out.take_all() == [{"ask": True}]
    out2 = execute(_graph(), 'ASK { ?x <name> "Nobody" }')
    assert out2.take_all() == [{"ask": False}]


def test_zero_or_more_path(ray_session):
    out = execute(_graph(), """
      SELECT ?z WHERE { ?x <knows>* ?z . FILTER(?x = <a>) }
    """)
    got = sorted(r["z"] for r in out.take_all())
    # closure from the a->b->c->a cycle plus the zero-length identity —
    # every node reachable incl. itself, each exactly once
    assert got == ["<a>", "<b>", "<c>"]


def test_zero_or_one_path(ray_session):
    import ray.data as rd

    triples = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>"],
        "pred": ["<p>", "<p>"],
        "obj": ["<b>", "<c>"],
    }))
    out = execute(triples, """
      SELECT ?x ?z WHERE { ?x <p>? ?z . FILTER(?x = <a>) }
    """)
    got = sorted((r["x"], r["z"]) for r in out.take_all())
    assert got == [("<a>", "<a>"), ("<a>", "<b>")]


def test_construct(ray_session):
    out = execute(_graph(), """
      CONSTRUCT { ?y <knownBy> ?x . ?x a <Person> }
      WHERE { ?x <knows> ?y }
    """)
    rows = {(r["subj"], r["pred"], r["obj"]) for r in out.take_all()}
    assert rows == {
        ("<b>", "<knownBy>", "<a>"), ("<c>", "<knownBy>", "<b>"),
        ("<a>", "<knownBy>", "<c>"),
        ("<a>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<Person>"),
        ("<b>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<Person>"),
        ("<c>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<Person>"),
    }


def test_optional_filter_referencing_outer_var(ray_session):
    """LEFT-JOIN-ON semantics: the OPTIONAL filter compares an optional var
    to an OUTER var; rows whose matches all fail keep nulls."""
    out = execute(_graph(), """
      SELECT ?x ?a ?nm WHERE {
        ?x <age> ?a .
        OPTIONAL { ?x <name> ?nm FILTER(?a > 26 && ?nm = "Alice") }
      }
    """)
    rows = {(r["x"], r["a"], r["nm"]) for r in out.take_all()}
    XSD = "http://www.w3.org/2001/XMLSchema#"
    assert rows == {
        ("<a>", f'"30"^^<{XSD}integer>', "Alice"),   # passes both conditions
        ("<b>", f'"25"^^<{XSD}integer>', None),      # age fails -> null
        ("<c>", f'"40"^^<{XSD}integer>', None),      # no name at all
    }


def test_aggregate_over_expression(ray_session):
    out = execute(_graph(), """
      SELECT (SUM(?a * 2) AS ?s2) (MAX(?a + 1) AS ?m1) (COUNT(?a * 0) AS ?n)
      WHERE { ?x <age> ?a . }
    """)
    r = out.take_all()[0]
    assert (r["s2"], r["m1"], r["n"]) == (190.0, 41.0, 3)


def test_subselect_aggregate_join(ray_session):
    """{ SELECT ... } sub-query: inner COUNT per ?y joins the outer BGP on
    the shared variable, and the outer FILTER sees the aggregate column."""
    out = execute(_graph(), """
      SELECT ?x ?y ?cnt WHERE {
        ?x <knows> ?y .
        { SELECT ?y (COUNT(?z) AS ?cnt) WHERE { ?z <knows> ?y . } GROUP BY ?y }
      }
    """)
    rows = sorted((r["x"], r["y"], r["cnt"]) for r in out.take_all())
    assert rows == [("<a>", "<b>", 1), ("<b>", "<c>", 1), ("<c>", "<a>", 1)]


def test_subselect_alone_with_outer_modifiers(ray_session):
    out = execute(_graph(), """
      SELECT ?y ?cnt WHERE {
        { SELECT ?y (COUNT(?z) AS ?cnt) WHERE { ?z <knows> ?y . } GROUP BY ?y }
      } ORDER BY ?y LIMIT 2
    """)
    assert [(r["y"], r["cnt"]) for r in out.take_all()] == [("<a>", 1), ("<b>", 1)]


def test_subselect_projection_restricts(ray_session):
    """A plain (non-aggregate) sub-select acts as a projected restriction."""
    out = execute(_graph(), """
      SELECT ?x ?n WHERE {
        ?x <age> ?n .
        { SELECT ?x WHERE { ?x <name> "Alice" . } }
      }
    """)
    assert [(r["x"], r["n"]) for r in out.take_all()] == [
        ("<a>", f'"30"^^<{XSD_INT}>')]


def test_subselect_rejects_union_mix():
    with pytest.raises((NotImplementedError, ValueError)):
        SparqlParser("""
          SELECT ?x WHERE {
            { SELECT ?x WHERE { ?x <p> ?y . } } UNION { ?x <q> ?z . }
          }
        """).parse()


def test_projection_expression(ray_session):
    out = execute(_graph(), """
      SELECT ?x (?a * 2 AS ?a2) WHERE { ?x <age> ?a . } ORDER BY ?x
    """)
    assert [(r["x"], r["a2"]) for r in out.take_all()] == [
        ("<a>", 60.0), ("<b>", 50.0), ("<c>", 80.0)]


def test_projection_expression_with_aggregate_parses():
    q = SparqlParser("""
      SELECT (?a + 1 AS ?b) (COUNT(?x) AS ?n) WHERE { ?x <age> ?a . }
    """).parse()
    # the expression is deferred to AFTER aggregation
    assert [al for al, _ in q.post_binds] == ["b"]
    assert not q.binds


def test_describe_constant(ray_session):
    out = execute(_graph(), "DESCRIBE <a>")
    rows = sorted((r["subj"], r["pred"], r["obj"]) for r in out.take_all())
    assert [s for s, _, _ in rows] == ["<a>", "<a>", "<a>"] and len(rows) == 3


def test_describe_variable_where(ray_session):
    out = execute(_graph(), 'DESCRIBE ?x <c> WHERE { ?x <name> "Bob" . }')
    subs = {r["subj"] for r in out.take_all()}
    assert subs == {"<b>", "<c>"}
    assert len(out.take_all()) == 5  # b: knows+age+name, c: knows+age


def test_describe_empty_solution(ray_session):
    out = execute(_graph(), 'DESCRIBE ?x WHERE { ?x <name> "Nobody" . }')
    assert out.take_all() == []


def test_describe_values_only_body(ray_session):
    """DESCRIBE over a VALUES-only group: the inline table is the base
    relation (review fix: the constants-only fast path must not swallow
    variable bindings)."""
    out = execute(_graph(), "DESCRIBE ?x WHERE { VALUES ?x { <a> <b> } }")
    subs = {r["subj"] for r in out.take_all()}
    assert subs == {"<a>", "<b>"}


def test_describe_limit_bounds_solutions(ray_session):
    out = execute(_graph(), "DESCRIBE ?x WHERE { ?x <age> ?a . } LIMIT 1")
    subs = {r["subj"] for r in out.take_all()}
    assert len(subs) == 1 and subs < {"<a>", "<b>", "<c>"}


def test_describe_order_without_limit_is_set(ray_session):
    """ORDER BY alone is unobservable in a DESCRIBE's set-semantics graph
    (previously raised; now the full node set is described regardless)."""
    out = execute(_graph(), "DESCRIBE ?x WHERE { ?x <age> ?a . } ORDER BY ?x")
    assert {r["subj"] for r in out.take_all()} == {"<a>", "<b>", "<c>"}


def test_describe_unbound_variable_is_empty(ray_session):
    out = execute(_graph(), "DESCRIBE ?nowhere <a> WHERE { ?x <age> ?a . }")
    subs = {r["subj"] for r in out.take_all()}
    assert subs == {"<a>"}  # unbound var contributes nothing; constant kept


def test_select_values_only_group(ray_session):
    out = execute(_graph(), """
      SELECT ?x ?n WHERE { VALUES ?x { <a> <b> } ?x <age> ?n . }
    """)
    assert {(r["x"]) for r in out.take_all()} == {"<a>", "<b>"}


def test_explain_reports_plan_shape():
    from rdflib_r2r_ray.sparql import explain

    out = explain("""
      SELECT ?t (COUNT(?d) AS ?n) WHERE {
        ?d <urn:p:type> ?t . ?d <urn:p:x> ?x .
        OPTIONAL { ?d <urn:p:y> ?y }
        BIND(?x * 2 AS ?x2)
        VALUES ?t { "a" "b" }
        FILTER(?x > 0)
      } GROUP BY ?t HAVING(?n > 1) ORDER BY ?t LIMIT 5
    """)
    for frag in ("form: SELECT", "bgp: 2 pattern", "optional: 1",
                 "values: 1", "bind: x2", "filter: 1",
                 "count->n", "group by ['t']", "having: 1",
                 "top-k", "limit=5"):
        assert frag in out, f"{frag!r} missing from:\n{out}"


def test_explain_subselect_and_ask():
    from rdflib_r2r_ray.sparql import explain

    out = explain("""
      SELECT ?s WHERE {
        { SELECT ?s WHERE { ?s <urn:p:a> ?o } LIMIT 3 }
        ?s <urn:p:b> ?b .
        FILTER EXISTS { ?s <urn:p:c> ?c }
      } OFFSET 2
    """)
    assert "subselect:" in out and "limit: 3" in out
    assert "exists: 1" in out and "slice: offset=2" in out
    assert explain("ASK WHERE { ?s ?p ?o }").startswith("form: ASK")


def test_explain_raises_like_execute():
    from rdflib_r2r_ray.sparql import explain

    with pytest.raises(ValueError):
        explain("SELECT ?x WHERE { ?x <p> ?y } FROB")


def test_filter_in_and_not_in(ray_session):
    g = _graph()
    out = execute(g, """
      SELECT ?s WHERE { ?s <age> ?a . FILTER(?a IN (25, 40)) } ORDER BY ?s
    """).to_pandas()
    assert list(out["s"]) == ["<b>", "<c>"]
    out = execute(g, """
      SELECT ?s WHERE { ?s <age> ?a . FILTER(?a NOT IN (25, 40)) }
    """).to_pandas()
    assert list(out["s"]) == ["<a>"]
    # IN over term constants
    out = execute(g, """
      SELECT ?n WHERE { ?s <name> ?n . FILTER(?s IN (<a>)) }
    """).to_pandas()
    assert list(out["n"]) == ["Alice"]


def test_order_by_expression(ray_session):
    g = _graph()
    out = execute(g, """
      SELECT ?s ?a WHERE { ?s <age> ?a } ORDER BY DESC(?a * 2 - 1)
    """).to_pandas()
    assert list(out["s"]) == ["<c>", "<a>", "<b>"]
    assert list(out.columns) == ["s", "a"]  # hidden sort column dropped


def test_having_raw_aggregate(ray_session):
    import ray.data as rd

    g = rd.from_arrow(pa.table({
        "subj": ["<d1>", "<d2>", "<d3>", "<d4>"],
        "pred": ["<lang>"] * 4,
        "obj": ["en", "en", "fr", "en"],
    }))
    out = execute(g, """
      SELECT ?l WHERE { ?d <lang> ?l } GROUP BY ?l HAVING(COUNT(?d) >= 2)
    """).to_pandas()
    assert list(out.columns) == ["l"] and list(out["l"]) == ["en"]
    out = execute(g, """
      SELECT ?l (COUNT(*) AS ?n) WHERE { ?d <lang> ?l }
      GROUP BY ?l HAVING(COUNT(?d) >= 1 && MIN(?l) != "zz")
      ORDER BY DESC(?n)
    """).to_pandas()
    assert list(out["l"]) == ["en", "fr"] and list(out["n"]) == [3, 1]


def test_builtin_string_functions(ray_session):
    g = _graph()
    out = execute(g, """
      SELECT ?n (STRLEN(?n) AS ?l) (UCASE(?n) AS ?u) (LCASE(?n) AS ?d)
      WHERE { ?s <name> ?n } ORDER BY ?n
    """).to_pandas()
    assert list(out["l"]) == [5.0, 3.0]
    assert list(out["u"]) == ["ALICE", "BOB"]
    assert list(out["d"]) == ["alice", "bob"]
    out = execute(g, """
      SELECT ?n WHERE { ?s <name> ?n .
        FILTER(CONTAINS(?n, "li") || STRSTARTS(?n, "B")) } ORDER BY ?n
    """).to_pandas()
    assert list(out["n"]) == ["Alice", "Bob"]
    out = execute(g, """
      SELECT (SUBSTR("abcdef", 2, 3) AS ?a) (CONCAT("x", "-", "y") AS ?b)
             (REPLACE("banana", "an", "$0$0") AS ?c)
             (STRBEFORE("a-b", "-") AS ?d) (STRAFTER("a-b", "-") AS ?e)
      WHERE { ?s <name> ?n } LIMIT 1
    """).to_pandas()
    assert out.iloc[0].tolist() == ["bcd", "x-y", "banananana", "a", "b"]


def test_builtin_str_lang_datatype_tests(ray_session):
    import ray.data as rd

    g = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>", "<c>"],
        "pred": ["<p>"] * 3,
        "obj": ['"hi"@en', f'"7"^^<{XSD_INT}>', "<http://x.org/i>"],
    }))
    out = execute(g, """
      SELECT ?o (STR(?o) AS ?s) (LANG(?o) AS ?lg) WHERE { ?x <p> ?o } ORDER BY ?o
    """).to_pandas().set_index("o")
    assert out.loc['"hi"@en', "s"] == "hi" and out.loc['"hi"@en', "lg"] == "en"
    assert out.loc["<http://x.org/i>", "s"] == "http://x.org/i"
    assert out.loc["<http://x.org/i>", "lg"] == ""
    dts = execute(g, """
      SELECT ?o (DATATYPE(?o) AS ?dt) WHERE { ?x <p> ?o } ORDER BY ?o
    """).to_pandas().set_index("o")["dt"]
    assert dts[f'"7"^^<{XSD_INT}>'] == f"<{XSD_INT}>"
    assert dts['"hi"@en'].endswith("langString>")
    flt = execute(g, """
      SELECT ?o WHERE { ?x <p> ?o . FILTER(ISIRI(?o)) }
    """).to_pandas()
    assert list(flt["o"]) == ["<http://x.org/i>"]
    num = execute(g, """
      SELECT ?o WHERE { ?x <p> ?o . FILTER(ISNUMERIC(?o)) }
    """).to_pandas()
    assert list(num["o"]) == [f'"7"^^<{XSD_INT}>']


def test_builtin_numeric_and_coalesce(ray_session):
    g = _graph()
    out = execute(g, """
      SELECT ?s WHERE { ?s <age> ?a . FILTER(CEIL(?a / 7) = 4) }
    """).to_pandas()
    assert list(out["s"]) == ["<b>"]
    out = execute(g, """
      SELECT (ABS(-3) AS ?a) (FLOOR(2.7) AS ?f) (ROUND(2.5) AS ?r)
      WHERE { ?s <name> ?n } LIMIT 1
    """).to_pandas()
    assert out.iloc[0].tolist() == [3.0, 2.0, 3.0]
    out = execute(g, """
      SELECT ?x (COALESCE(?n, "none") AS ?nm)
      WHERE { ?x <age> ?a . OPTIONAL { ?x <name> ?n } } ORDER BY ?x
    """).to_pandas()
    assert list(out["nm"]) == ["Alice", "Bob", "none"]


def test_distinct_aggregates(ray_session):
    import ray.data as rd

    g = rd.from_arrow(pa.table({
        "subj": ["<d1>", "<d2>", "<d3>", "<d4>", "<d5>"],
        "pred": ["<src>"] * 5,
        "obj": ["s1", "s1", "s2", "s2", "s3"],
    }))
    out = execute(g, """
      SELECT (COUNT(DISTINCT ?o) AS ?n) (COUNT(?o) AS ?all)
      WHERE { ?d <src> ?o }
    """).to_pandas()
    assert out.iloc[0].tolist() == [3, 5]
    g2 = rd.from_arrow(pa.table({
        "subj": ["<a>", "<a>", "<a>", "<b>"],
        "pred": ["<v>"] * 4,
        "obj": [f'"10"^^<{XSD_INT}>', f'"10"^^<{XSD_INT}>',
                f'"20"^^<{XSD_INT}>', f'"5"^^<{XSD_INT}>'],
    }))
    out = execute(g2, """
      SELECT ?s (SUM(DISTINCT ?v) AS ?sd) (AVG(DISTINCT ?v) AS ?ad)
      WHERE { ?s <v> ?v } GROUP BY ?s ORDER BY ?s
    """).to_pandas()
    assert list(out["sd"]) == [30.0, 5.0]
    assert list(out["ad"]) == [15.0, 5.0]
    out = execute(g, """
      SELECT (GROUP_CONCAT(DISTINCT ?o ; SEPARATOR="|") AS ?c)
      WHERE { ?d <src> ?o }
    """).to_pandas()
    assert sorted(out.iloc[0, 0].split("|")) == ["s1", "s2", "s3"]


def test_predicate_object_lists(ray_session):
    g = _graph()
    out = execute(g, """
      SELECT ?s ?n ?a WHERE { ?s <name> ?n ; <age> ?a } ORDER BY ?s
    """).to_pandas()
    assert list(out["s"]) == ["<a>", "<b>"]
    out = execute(g, """
      SELECT ?s WHERE { ?s <knows> <b> , <c> }
    """).to_pandas()
    assert len(out) == 0  # nobody knows both b and c
    out = execute(g, """
      SELECT ?s WHERE { ?s <knows> ?x , ?y . FILTER(?x != ?y) }
    """).to_pandas()
    assert len(out) == 0  # each node knows exactly one


def test_typed_and_lang_literal_objects(ray_session):
    import ray.data as rd

    g = _graph()
    out = execute(g, f"""
      SELECT ?s WHERE {{ ?s <age> "25"^^<{XSD_INT}> }}
    """).to_pandas()
    assert list(out["s"]) == ["<b>"]
    g2 = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>"], "pred": ["<t>", "<t>"],
        "obj": ['"x"@en', '"x"@fr'],
    }))
    out = execute(g2, 'SELECT ?s WHERE { ?s <t> "x"@en }').to_pandas()
    assert list(out["s"]) == ["<a>"]


def test_grouped_path_quantifier_and_negset(ray_session):
    import ray.data as rd

    g = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>", "<c>", "<a>", "<x>", "<m>"],
        "pred": ["<p>", "<p>", "<p>", "<q>", "<q>", "<r>"],
        "obj": ["<b>", "<c>", "<d>", "<x>", "<y>", "<n>"],
    }))
    out = execute(g, "SELECT ?x ?y WHERE { ?x (<q>/<q>)+ ?y }").to_pandas()
    assert out.to_dict("records") == [{"x": "<a>", "y": "<y>"}]
    out = execute(g, "SELECT ?x ?y WHERE { ?x !(<p>|<q>) ?y }").to_pandas()
    assert out.to_dict("records") == [{"x": "<m>", "y": "<n>"}]
    out = execute(g, "SELECT ?y WHERE { <a> (<p>|<q>)* ?y } ORDER BY ?y").to_pandas()
    assert list(out["y"]) == ["<a>", "<b>", "<c>", "<d>", "<x>", "<y>"]
    with pytest.raises(NotImplementedError):
        execute(g, "SELECT ?x WHERE { ?x !(^<p>) ?y }")


def test_union_mixed_with_patterns(ray_session):
    g = _graph()
    out = execute(g, """
      SELECT ?x ?n ?v WHERE {
        ?x <name> ?n .
        { ?x <age> ?v } UNION { ?x <knows> ?v }
      }
    """).to_pandas()
    assert len(out) == 4  # a,b each: one age + one knows (c has no name)
    assert set(out["x"]) == {"<a>", "<b>"}
    out = execute(g, """
      SELECT ?x ?v WHERE {
        { ?x <age> ?v . FILTER(?v > 26) } UNION { ?x <name> ?v }
        OPTIONAL { ?x <knows> ?k }
        FILTER(BOUND(?k))
      }
    """).to_pandas()
    assert len(out) == 4
    with pytest.raises(NotImplementedError):
        # ?v unbound in the second branch -> needs compatibility join
        execute(g, """
          SELECT ?x WHERE {
            ?x <age> ?v .
            { ?x <knows> ?y . FILTER(?v > 0) } UNION { ?x <name> ?v }
          }
        """)


def test_xsd_duration_cast(ray_session):
    """F8 completeness: xsd:dayTimeDuration casts to total seconds (num
    kind), usable in arithmetic and comparisons; year/month components and
    invalid lexicals cast to NULL (rows drop in FILTER)."""
    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray import sparql

    rows = [
        ("<e/1>", "<p/dur>", "P1DT2H"),        # 93600 s
        ("<e/2>", "<p/dur>", "-PT90M"),        # -5400 s
        ("<e/3>", "<p/dur>", "PT0.5S"),        # 0.5 s
        ("<e/4>", "<p/dur>", "P1Y2M"),         # year/month -> NULL
        ("<e/5>", "<p/dur>", "not a duration"),
    ]
    trips = rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj": pa.array([r[2] for r in rows]),
    }))
    q = """
    PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
    SELECT ?s ?secs WHERE {
      ?s <p/dur> ?d .
      BIND(xsd:dayTimeDuration(?d) AS ?secs)
      FILTER(xsd:dayTimeDuration(?d) <= 100000)
    }
    """
    got = {r["s"]: r["secs"] for r in sparql.execute(trips, q).take_all()}
    assert got == {"<e/1>": 93600.0, "<e/2>": -5400.0, "<e/3>": 0.5}


def _quads():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>", "<c>", "<a>", "<b>"],
        "pred": ["<p>", "<p>", "<p>", "<q>", "<q>"],
        "obj": ["1", "2", "3", "x", "y"],
        "graph": ["<g1>", "<g1>", "<g2>", None, None],
    }))


def test_graph_clause(ray_session):
    # constant graph: scoped BGP
    out = execute(_quads(), """
      SELECT ?s ?o WHERE { GRAPH <g1> { ?s <p> ?o } }
    """).to_pandas().sort_values("s").reset_index(drop=True)
    assert list(out["s"]) == ["<a>", "<b>"]
    assert list(out["o"]) == ["1", "2"]

    # variable graph: binds ?g from the quad column (named graphs only)
    out = execute(_quads(), """
      SELECT ?g ?s WHERE { GRAPH ?g { ?s <p> ?o } }
    """).to_pandas().sort_values(["g", "s"]).reset_index(drop=True)
    assert list(out["g"]) == ["<g1>", "<g1>", "<g2>"]
    assert list(out["s"]) == ["<a>", "<b>", "<c>"]

    # graph group joined with an enclosing default-graph pattern
    out = execute(_quads(), """
      SELECT ?s ?v WHERE { ?s <q> ?v . GRAPH <g1> { ?s <p> ?o } }
    """).to_pandas().sort_values("s").reset_index(drop=True)
    assert list(out["s"]) == ["<a>", "<b>"]
    assert list(out["v"]) == ["x", "y"]

    # multi-pattern variable-graph group: per-pattern quad matches
    # equijoined on shared vars INCLUDING ?g — both patterns must hold in
    # the SAME named graph (the <q> triples live in the default graph, so
    # nothing matches)
    out = execute(_quads(), """
      SELECT ?g WHERE { GRAPH ?g { ?s <p> ?o . ?s <q> ?v } }
    """).to_pandas()
    assert len(out) == 0


def _upd_graph():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "subj": pa.array(["<a>", "<a>", "<b>", "<c>"]),
        "pred": pa.array(["<p>", "<q>", "<p>", "<p>"]),
        "obj": pa.array(["x", "1", "y", "x"]),
    }))


def test_update_insert_data(ray_session):
    from rdflib_r2r_ray.sparql import update

    out = update(_upd_graph(), 'INSERT DATA { <d> <p> "z" . <a> <p> "x" }')
    rows = sorted(map(tuple, out.to_pandas().values.tolist()))
    # <a> <p> x already present: set semantics, no duplicate
    assert rows == [("<a>", "<p>", "x"), ("<a>", "<q>", "1"),
                    ("<b>", "<p>", "y"), ("<c>", "<p>", "x"),
                    ("<d>", "<p>", "z")]


def test_update_delete_data_and_delete_where(ray_session):
    from rdflib_r2r_ray.sparql import update

    out = update(_upd_graph(), 'DELETE DATA { <a> <q> "1" . <zz> <p> "nope" }')
    rows = sorted(map(tuple, out.to_pandas().values.tolist()))
    assert rows == [("<a>", "<p>", "x"), ("<b>", "<p>", "y"),
                    ("<c>", "<p>", "x")]

    out = update(_upd_graph(), 'DELETE WHERE { ?s <p> "x" }')
    rows = sorted(map(tuple, out.to_pandas().values.tolist()))
    assert rows == [("<a>", "<q>", "1"), ("<b>", "<p>", "y")]


def test_update_delete_insert_where(ray_session):
    from rdflib_r2r_ray.sparql import update

    u = """
    DELETE { ?s <p> ?v }
    INSERT { ?s <renamed> ?v }
    WHERE  { ?s <p> ?v . FILTER(?v = "x") }
    """
    out = update(_upd_graph(), u)
    rows = sorted(map(tuple, out.to_pandas().values.tolist()))
    assert rows == [("<a>", "<q>", "1"), ("<a>", "<renamed>", "x"),
                    ("<b>", "<p>", "y"), ("<c>", "<renamed>", "x")]


def test_update_requires_clause(ray_session):
    from rdflib_r2r_ray.sparql import update

    with pytest.raises(ValueError, match="WHERE"):
        update(_upd_graph(), 'DELETE { ?s <p> ?v }')
    with pytest.raises(ValueError, match="ground"):
        update(_upd_graph(), 'INSERT DATA { ?s <p> "x" }')


def test_update_rejects_multi_operation(ray_session):
    from rdflib_r2r_ray.sparql import update

    with pytest.raises(NotImplementedError, match="multiple INSERT"):
        update(_upd_graph(),
               'INSERT DATA { <d> <p> "1" } ; INSERT DATA { <e> <p> "2" }')
    with pytest.raises(NotImplementedError, match="multiple DELETE"):
        update(_upd_graph(),
               'DELETE DATA { <a> <p> "x" } ; DELETE DATA { <b> <p> "y" }')


def test_update_decodes_dict_encoded_graph(ray_session):
    """A dict-encoded base graph (emit/parquet form) must still match plain
    delete rows in the exchange (encoding-mismatch hashing guard)."""
    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray.sparql import update

    def d(vals):
        return pa.array(vals).dictionary_encode()

    g = rd.from_arrow(pa.table({
        "subj": d(["<a>", "<b>"]), "pred": d(["<p>", "<p>"]),
        "obj": d(["x", "y"]),
    }))
    out = update(g, 'DELETE DATA { <a> <p> "x" }')
    rows = sorted(map(tuple, out.to_pandas().values.tolist()))
    assert rows == [("<b>", "<p>", "y")]


def test_hash_and_encode_builtins(ray_session):
    """SPARQL 1.1 MD5/SHA1/SHA256/SHA384/SHA512 hash the UTF-8 lexical
    form; ENCODE_FOR_URI percent-encodes all but RFC 3986 unreserved."""
    import hashlib

    rows = execute(_graph(), """
      SELECT ?n (MD5(?n) AS ?m) (SHA1(?n) AS ?s1) (SHA256(?n) AS ?s2)
             (SHA384(?n) AS ?s3) (SHA512(?n) AS ?s5)
             (ENCODE_FOR_URI(CONCAT(?n, " & co/~x")) AS ?e) WHERE {
        ?d <name> ?n .
      }
    """).take_all()
    assert len(rows) == 2
    for r in rows:
        n = r["n"].encode()
        assert r["m"] == hashlib.md5(n).hexdigest()
        assert r["s1"] == hashlib.sha1(n).hexdigest()
        assert r["s2"] == hashlib.sha256(n).hexdigest()
        assert r["s3"] == hashlib.sha384(n).hexdigest()
        assert r["s5"] == hashlib.sha512(n).hexdigest()
        assert r["e"] == r["n"] + "%20%26%20co%2F~x"


def test_disjoint_optional_cross_and_empty(ray_session):
    """OPTIONAL sharing no variable with the required part: a non-empty
    optional side cross-extends every solution; an empty side leaves the
    optional variable unbound (null)."""
    out = execute(_graph(), """
      SELECT ?x ?nm WHERE {
        ?x <age> ?a . FILTER(?a > 26)
        OPTIONAL { ?p <name> ?nm . FILTER(?nm = "Alice") }
      }
    """)
    got = sorted((r["x"], r["nm"]) for r in out.take_all())
    assert got == [("<a>", "Alice"), ("<c>", "Alice")]

    out2 = execute(_graph(), """
      SELECT ?x ?nm WHERE {
        ?x <age> ?a . FILTER(?a > 26)
        OPTIONAL { ?p <name> ?nm . FILTER(?nm = "Nobody") }
      }
    """)
    got2 = sorted((r["x"], r["nm"]) for r in out2.take_all())
    assert got2 == [("<a>", None), ("<c>", None)]


def test_offset_without_limit(ray_session):
    out = execute(_graph(), """
      SELECT ?x ?a WHERE { ?x <age> ?a } ORDER BY ?a OFFSET 1
    """)
    assert [r["x"] for r in out.take_all()] == ["<a>", "<c>"]


def test_langmatches_edges(ray_session):
    import ray.data as rd

    g = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>", "<c>", "<d>"],
        "pred": ["<t>"] * 4,
        "obj": ['"x"@en', '"y"@en-US', '"z"@fr', "plain"],
    }))
    out = execute(g, """
      SELECT ?s WHERE { ?s <t> ?o . FILTER(LANGMATCHES(LANG(?o), "en")) }
    """)
    assert sorted(r["s"] for r in out.take_all()) == ["<a>", "<b>"]
    out2 = execute(g, """
      SELECT ?s WHERE { ?s <t> ?o . FILTER langMatches(lang(?o), "*") }
    """)
    assert sorted(r["s"] for r in out2.take_all()) == ["<a>", "<b>", "<c>"]


def test_union_branch_optional_padding(ray_session):
    """A UNION branch whose OPTIONAL matches nothing keeps its rows with
    the optional variable null-padded."""
    out = execute(_graph(), """
      SELECT ?x ?nm WHERE {
        { ?x <age> ?a . OPTIONAL { ?x <name> ?nm } FILTER(?a >= 40) }
        UNION
        { ?x <knows> ?y . ?x <name> ?nm . FILTER(?nm = "Bob") }
      }
    """)
    got = sorted([(r["x"], r["nm"]) for r in out.take_all()],
                 key=lambda t: (t[0], t[1] or ""))
    assert got == [("<b>", "Bob"), ("<c>", None)]


def test_construct_order_limit(ray_session):
    """ORDER BY under CONSTRUCT is observable through LIMIT: the ordered
    top-k of the solution sequence selects which solutions instantiate."""
    out = execute(_graph(), """
      CONSTRUCT { ?x <isOldest> "yes" }
      WHERE { ?x <age> ?a } ORDER BY DESC(?a) LIMIT 1
    """)
    rows = sorted((r["subj"], r["pred"], r["obj"]) for r in out.take_all())
    assert rows == [("<c>", "<isOldest>", "yes")]


def test_describe_order_limit(ray_session):
    """DESCRIBE with ORDER BY + LIMIT describes the top-k solutions'
    nodes only."""
    out = execute(_graph(), """
      DESCRIBE ?x WHERE { ?x <age> ?a } ORDER BY DESC(?a) LIMIT 1
    """)
    rows = sorted((r["subj"], r["pred"], r["obj"]) for r in out.take_all())
    assert rows == [("<c>", "<age>", f'"40"^^<{XSD_INT}>'),
                    ("<c>", "<knows>", "<a>")]


def test_sample_and_group_concat_over_expressions(ray_session):
    import ray.data as rd

    triples = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>", "<c>", "<d>"],
        "pred": ["<in>"] * 4,
        "obj": ["<g1>", "<g1>", "<g2>", "<g1>"],
    }))
    out = execute(triples, """
      SELECT ?g (GROUP_CONCAT(UCASE(STR(?x)); SEPARATOR="|") AS ?cat)
                (SAMPLE(STR(?x)) AS ?w)
      WHERE { ?x <in> ?g . } GROUP BY ?g
    """)
    rows = sorted((r["g"], r["cat"], r["w"]) for r in out.take_all())
    assert rows[1] == ("<g2>", "C", "c")
    g1_cat = rows[0][1]
    assert sorted(g1_cat.split("|")) == ["A", "B", "D"]
    assert rows[0][2] == "a"  # deterministic min witness


def test_graph_var_multi_pattern_same_graph(ray_session):
    """GRAPH ?g over a star: patterns join within one named graph; a
    subject whose second triple sits in a DIFFERENT graph is excluded."""
    import ray.data as rd

    quads = rd.from_arrow(pa.table({
        "subj": ["<a>", "<a>", "<b>", "<b>"],
        "pred": ["<p>", "<q>", "<p>", "<q>"],
        "obj": ["1", "x", "2", "y"],
        "graph": ["<g1>", "<g1>", "<g1>", "<g2>"],
    }))
    out = execute(quads, """
      SELECT ?g ?s ?o ?v WHERE { GRAPH ?g { ?s <p> ?o . ?s <q> ?v } }
    """).to_pandas()
    rows = sorted(map(tuple, out[["g", "s", "o", "v"]].itertuples(index=False)))
    assert rows == [("<g1>", "<a>", "1", "x")]


def test_projection_expression_with_aggregates(ray_session):
    """SELECT (expr AS ?v) alongside aggregates — the expression runs on
    the aggregated relation and may reference aggregate aliases."""
    import ray.data as rd

    triples = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>", "<c>", "<d>"],
        "pred": ["<in>"] * 4,
        "obj": ["<g1>", "<g1>", "<g2>", "<g1>"],
    }))
    out = execute(triples, """
      SELECT ?g (COUNT(?x) AS ?n) (?n * 10 AS ?tens)
      WHERE { ?x <in> ?g . } GROUP BY ?g
    """)
    rows = sorted((r["g"], r["n"], r["tens"]) for r in out.take_all())
    assert rows == [("<g1>", 3, 30.0), ("<g2>", 1, 10.0)]


def test_optional_matching_nothing_pads_nulls(ray_session):
    """An OPTIONAL whose pattern matches NO triples keeps every required
    row with the optional variable null — including the cross-filter
    lowering (regression: the empty build side had no inferable schema
    and the left join raised)."""
    out = execute(_graph(), """
      SELECT ?x ?z WHERE { ?x <age> ?a . OPTIONAL { ?x <nosuch> ?z } }
    """)
    rows = sorted((r["x"], r["z"]) for r in out.take_all())
    assert rows == [("<a>", None), ("<b>", None), ("<c>", None)]

    out2 = execute(_graph(), """
      SELECT ?x ?z WHERE {
        ?x <age> ?a .
        OPTIONAL { ?x <nosuch> ?z . FILTER(?a > 26) }
      }
    """)
    rows2 = sorted((r["x"], r["z"]) for r in out2.take_all())
    assert rows2 == [("<a>", None), ("<b>", None), ("<c>", None)]


def test_transitive_path_over_absent_predicate(ray_session):
    """`<p>+` where the predicate has NO edges returns an empty relation
    (regression: the empty edge set had no inferable schema and crashed)."""
    out = execute(_graph(), "SELECT ?x ?z WHERE { ?x <nosuch>+ ?z }")
    assert out.take_all() == []


def test_global_aggregate_over_empty_input(ray_session):
    """A keyless aggregate over zero solutions is ONE group per the spec:
    COUNT=0, SUM=0, GROUP_CONCAT='', AVG unbound."""
    out = execute(_graph(), """
      SELECT (COUNT(?x) AS ?n) (SUM(?a) AS ?s) (AVG(?a) AS ?m)
             (GROUP_CONCAT(?x) AS ?cat)
      WHERE { ?x <nosuch> ?a }
    """)
    rows = out.take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] == 0 and r["s"] == 0.0 and r["m"] is None and r["cat"] == ""


def test_more_empty_and_path_edges(ray_session):
    """Shapes around the empty-relation fixes: `*` over an absent
    predicate still yields identity pairs for bound subjects; an OPTIONAL
    transitive path over an absent predicate null-pads; HAVING filters the
    synthesized empty-global group away."""
    out = execute(_graph(), """
      SELECT ?x ?z WHERE { ?x <nosuch>* ?z . ?x <name> ?nm }
    """)
    assert sorted((r["x"], r["z"]) for r in out.take_all()) == \
        [("<a>", "<a>"), ("<b>", "<b>")]

    out2 = execute(_graph(), """
      SELECT ?x ?z WHERE { ?x <name> ?nm . OPTIONAL { ?x <nosuch>+ ?z } }
    """)
    assert sorted((r["x"], r["z"]) for r in out2.take_all()) == \
        [("<a>", None), ("<b>", None)]

    out3 = execute(_graph(), """
      SELECT (COUNT(?x) AS ?n) WHERE { ?x <nosuch> ?a } HAVING(?n > 0)
    """)
    assert out3.take_all() == []


def _product_graph():
    import ray.data as rd

    rows = [
        ("<prod1>", "<label>", "P1"),
        ("<prod1>", "<comment>", "nice"),
        ("<prod1>", "<producer>", "<maker>"),
        ("<maker>", "<label>", "Maker Inc"),
        ("<prod1>", "<feature>", "<f1>"),
        ("<f1>", "<label>", "F-one"),
        ("<prod1>", "<tex1>", "t1"),
        ("<prod1>", "<num1>", '"7"^^<' + XSD_INT + ">"),
        ("<prod1>", "<tex4>", "t4"),      # OPTIONAL present
        # offers
        ("<off1>", "<product>", "<prod1>"),
        ("<off1>", "<price>", '"100"^^<' + XSD_INT + ">"),
        ("<off1>", "<vendor>", "<v1>"),
        ("<v1>", "<label>", "Vendor1"),
        ("<v1>", "<country>", "<DE>"),
        ("<off1>", "<validTo>", "2024-09-01"),
        ("<off2>", "<product>", "<prod1>"),     # stale offer — filtered
        ("<off2>", "<price>", '"90"^^<' + XSD_INT + ">"),
        ("<off2>", "<vendor>", "<v1>"),
        ("<off2>", "<validTo>", "2020-01-01"),
        # reviews
        ("<rev1>", "<reviewFor>", "<prod1>"),
        ("<rev1>", "<reviewer>", "<person1>"),
        ("<person1>", "<name>", "Ann"),
        ("<rev1>", "<title>", "Great"),
        ("<rev1>", "<rating1>", '"5"^^<' + XSD_INT + ">"),
        # rev1 has NO rating2 → nested OPTIONAL null
    ]
    return rd.from_arrow(pa.table({
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "obj": [r[2] for r in rows],
    }))


def test_bsbm_q2_shape_wide_star_with_optionals(ray_session):
    """BSBM explore Q2's shape: constant-subject wide star with 1-hop
    label joins plus OPTIONALs of which some match and some do not."""
    out = execute(_product_graph(), """
      SELECT ?label ?producer ?feat ?t4 ?t5 WHERE {
        <prod1> <label> ?label .
        <prod1> <comment> ?comment .
        <prod1> <producer> ?p .
        ?p <label> ?producer .
        <prod1> <feature> ?f .
        ?f <label> ?feat .
        <prod1> <tex1> ?t1 .
        <prod1> <num1> ?n1 .
        OPTIONAL { <prod1> <tex4> ?t4 }
        OPTIONAL { <prod1> <tex5> ?t5 }
      }
    """)
    rows = out.take_all()
    assert len(rows) == 1
    r = rows[0]
    assert (r["label"], r["producer"], r["feat"], r["t4"], r["t5"]) == \
        ("P1", "Maker Inc", "F-one", "t4", None)


def test_bsbm_q7_shape_nested_optionals(ray_session):
    """BSBM explore Q7's shape: constant subject with two disjoint
    multi-pattern OPTIONAL groups — one date-filtered offer chain, one
    review chain containing a NESTED OPTIONAL (rating2 absent → null)."""
    out = execute(_product_graph(), """
      SELECT ?label ?offer ?price ?vendorTitle ?review ?revName ?r1 ?r2
      WHERE {
        <prod1> <label> ?label .
        OPTIONAL {
          ?offer <product> <prod1> .
          ?offer <price> ?price .
          ?offer <vendor> ?vendor .
          ?vendor <label> ?vendorTitle .
          ?vendor <country> <DE> .
          ?offer <validTo> ?date .
          FILTER(?date > "2024-01-01")
        }
        OPTIONAL {
          ?review <reviewFor> <prod1> .
          ?review <reviewer> ?reviewer .
          ?reviewer <name> ?revName .
          OPTIONAL { ?review <rating1> ?r1 }
          OPTIONAL { ?review <rating2> ?r2 }
        }
      }
    """)
    rows = out.take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["label"] == "P1"
    assert r["offer"] == "<off1>" and r["vendorTitle"] == "Vendor1"
    assert r["review"] == "<rev1>" and r["revName"] == "Ann"
    assert r["r1"] == f'"5"^^<{XSD_INT}>' and r["r2"] is None


def test_doubly_nested_optional_in_union(ray_session):
    """OPTIONAL inside OPTIONAL inside a UNION branch recurses through the
    branch executor rather than silently dropping the innermost group."""
    out = execute(_product_graph(), """
      SELECT ?p ?review ?revName ?r2 WHERE {
        {
          ?p <label> ?lab .
          OPTIONAL {
            ?review <reviewFor> ?p .
            ?review <reviewer> ?rv .
            OPTIONAL { ?review <rating2> ?r2 }
            ?rv <name> ?revName .
          }
        } UNION {
          ?p <comment> ?c .
        }
      }
    """)
    rows = sorted([(r["p"], r["review"], r["revName"], r["r2"])
                   for r in out.take_all()],
                  key=lambda t: tuple(str(x) for x in t))
    # branch 1: prod1/maker/f1 have labels; only prod1 has a review (no
    # rating2 → null); branch 2: prod1 has a comment
    assert (("<prod1>", "<rev1>", "Ann", None) in rows)
    assert (("<maker>", None, None, None) in rows)
    assert (("<prod1>", None, None, None) in rows)  # union branch 2
    assert len(rows) == 5
