"""R2RML Turtle loader: parser subset, vocabulary interpretation, SQL-view
translation, join-requiring referencing object maps."""

import pyarrow as pa
import pytest

from rdflib_r2r_ray.r2rml import RR, TurtleParser, load_r2rml
from rdflib_r2r_ray.fixtures_r2rml import (
    DOCUMENTS_TTL,
    DOCUMENTS_VIEW_TTL,
    NATION_REGION_REF_TTL,
)


def test_turtle_parser_basics():
    p = TurtleParser("""
@prefix ex: <http://ex.org/> .
@base <http://b.org/> .
# a comment
<#s> a ex:Thing ;
  ex:name "hi \\"there\\""@en , "x"^^ex:dt ;
  ex:n [ ex:inner ex:v ] .
""").parse()
    props = p.spo["http://b.org/#s"]
    assert ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type",) == tuple(
        pr for pr, o in props if o.kind == "iri" and o.value == "http://ex.org/Thing"
    )
    lits = [o for pr, o in props if pr == "http://ex.org/name"]
    assert lits[0].value == 'hi "there"' and lits[0].lang == "en"
    assert lits[1].dtype == "http://ex.org/dt"
    bn = [o for pr, o in props if pr == "http://ex.org/n"][0]
    assert bn.kind == "bnode"
    assert p.spo[bn.value][0] == ("http://ex.org/inner", p.spo[bn.value][0][1])


def test_load_documents_mapping():
    mapping, views = load_r2rml(DOCUMENTS_TTL)
    assert not views
    (tm,) = mapping.triples_maps
    assert tm.table == "documents"
    assert tm.subject.kind == "template"
    assert tm.subject.template == "http://kg.ex/doc/{doc_id}"
    assert tm.classes == ("http://kg.ex/c/Document",)
    preds = sorted(pm.predicate.constant for pm in tm.pomaps)
    assert preds == [
        "<http://kg.ex/p/lang>", "<http://kg.ex/p/n_chars>", "<http://kg.ex/p/source>"
    ]
    assert all(pm.object.kind == "column" for pm in tm.pomaps)


def test_load_view_mapping():
    mapping, views = load_r2rml(DOCUMENTS_VIEW_TTL)
    assert len(views) == 1
    (vname, sql), = views.items()
    assert mapping.triples_maps[0].table == vname
    assert "WHERE lang = 'en'" in sql


def test_load_ref_join_mapping():
    from rdflib_r2r_ray.mapping import retarget_ref_to_template

    mapping, _ = load_r2rml(NATION_REGION_REF_TTL)
    by_name = {tm.name: tm for tm in mapping.triples_maps}
    nat = by_name["#NationMap"]
    ref = nat.pomaps[0].object
    assert ref.kind == "ref"
    assert ref.parent_table == "region"
    assert ref.join == (("n_regionkey", "r_regionkey"),)
    # parent subject template uses r_name (not joined) -> NOT foldable
    assert retarget_ref_to_template(ref) is None


def test_sqlview_simple_translation():
    from rdflib_r2r_ray.sources.sqlview import translate_simple_select

    t = translate_simple_select("SELECT a, b FROM t WHERE x = 'y' AND n > 3")
    assert t == ("t", ["a", "b"], "(x == 'y') and (n > 3)")
    assert translate_simple_select("SELECT * FROM t") == ("t", None, None)
    # non-simple shapes fall through to the DuckDB path
    assert translate_simple_select("SELECT a FROM t JOIN u USING (k)") is None
    assert translate_simple_select("SELECT count(*) AS c FROM t") is None


def test_ref_join_triples(ray_session):
    """A bnode/non-derivable parent subject forces a real join; the emitted
    object must be the PARENT row's subject."""
    import ray.data as rd

    from rdflib_r2r_ray.pipelines.kg import emit_graph
    from rdflib_r2r_ray.r2rml import load_r2rml

    mapping, _ = load_r2rml(NATION_REGION_REF_TTL)
    nation = rd.from_arrow(pa.table({
        "n_nationkey": pa.array([1, 2], pa.int32()),
        "n_regionkey": pa.array([10, 20], pa.int32()),
    }))
    region = rd.from_arrow(pa.table({
        "r_regionkey": pa.array([10, 20], pa.int32()),
        "r_name": pa.array(["EAST SIDE", "WEST"], pa.string()),
    }))
    rows = emit_graph({"nation": nation, "region": region}, mapping).take_all()
    ref = {(r["subj"], r["obj"]) for r in rows
           if r["pred"] == "<http://example.com/base/nation#inRegionNamed>"}
    assert ref == {
        ("<http://example.com/base/nation/n_nationkey=1>",
         "<http://example.com/base/region/EAST%20SIDE>"),
        ("<http://example.com/base/nation/n_nationkey=2>",
         "<http://example.com/base/region/WEST>"),
    }


def test_ref_join_with_template_graph_map(ray_session):
    """Row-dependent rr:graphMap on a JOIN-requiring ref pomap: the graph
    term computes on the child side and rides through the join (previously
    raised NotImplementedError)."""
    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray.pipelines.kg import emit_graph
    from rdflib_r2r_ray.r2rml import load_r2rml

    ttl = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .

    <#ChildMap>
      rr:logicalTable [ rr:tableName "child" ] ;
      rr:subjectMap [ rr:template "http://e/c/{cid}" ;
                      rr:graphMap [ rr:template "http://e/g/{grp}" ] ] ;
      rr:predicateObjectMap [
        rr:predicate <http://e/p/parent> ;
        rr:objectMap [
          rr:parentTriplesMap <#ParentMap> ;
          rr:joinCondition [ rr:child "fk" ; rr:parent "pid" ]
        ]
      ] .

    <#ParentMap>
      rr:logicalTable [ rr:tableName "parent" ] ;
      rr:subjectMap [ rr:template "http://e/p/{pname}" ] ;
      rr:predicateObjectMap [
        rr:predicate <http://e/p/name> ;
        rr:objectMap [ rr:column "pname" ]
      ] .
    """
    mapping, views = load_r2rml(ttl)
    assert not views
    child = rd.from_arrow(pa.table({
        "cid": pa.array([1, 2], pa.int64()),
        "fk": pa.array([10, 20], pa.int64()),
        "grp": pa.array(["a", "b"]),
    }))
    parent = rd.from_arrow(pa.table({
        "pid": pa.array([10, 20], pa.int64()),
        "pname": pa.array(["X", "Y"]),
    }))
    rows = emit_graph({"child": child, "parent": parent}, mapping).take_all()
    got = {(r["subj"], r["pred"], r["obj"], r["graph"]) for r in rows}
    assert ("<http://e/c/1>", "<http://e/p/parent>", "<http://e/p/X>",
            "<http://e/g/a>") in got
    assert ("<http://e/c/2>", "<http://e/p/parent>", "<http://e/p/Y>",
            "<http://e/g/b>") in got
