"""GraphStore surface: pattern matching, SPARQL, constructors round-trip."""

import pyarrow as pa
import pytest

from rdflib_r2r_ray.store import GraphStore

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _store():
    import ray.data as rd

    return GraphStore(rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>", "<a>", "<b>", "<a>"],
        "pred": ["<knows>", "<knows>", "<age>", "<age>", "<name>"],
        "obj": ["<b>", "<a>", f'"30"^^<{XSD_INT}>', f'"25"^^<{XSD_INT}>', "Alice"],
    })))


def test_triples_wildcard_and_constants(ray_session):
    st = _store()
    assert st.count() == 5
    assert st.count((None, "<knows>", None)) == 2
    assert st.count(("<a>", None, None)) == 3
    got = set(st.iter_triples(("<a>", "<knows>", None)))
    assert got == {("<a>", "<knows>", "<b>")}
    # fully-bound pattern = membership test
    assert st.count(("<b>", "<knows>", "<a>")) == 1
    assert st.count(("<b>", "<knows>", "<c>")) == 0


def test_query_through_store(ray_session):
    st = _store()
    out = st.query("SELECT ?x ?n WHERE { ?x <age> ?n . FILTER(?n > 26) }")
    assert [(r["x"], r["n"]) for r in out.take_all()] == [
        ("<a>", f'"30"^^<{XSD_INT}>')]


def test_store_roundtrip_constructors(ray_session, tmp_path):
    from rdflib_r2r_ray.pipelines.kg import materialize_graph
    from rdflib_r2r_ray.state.checkpoint import write_ntriples

    st = _store()
    pq_dir = str(tmp_path / "pq")
    nt_dir = str(tmp_path / "nt")
    materialize_graph(st.dataset, pq_dir, num_partitions=2, resume=False)
    write_ntriples(st.dataset, nt_dir, num_partitions=2, resume=False)
    orig = set(st.iter_triples())
    assert set(GraphStore.from_parquet(pq_dir).iter_triples()) == orig
    assert set(GraphStore.from_ntriples(nt_dir).iter_triples()) == orig


def test_shacl_empty_graph_and_no_targets(ray_session):
    """Validation over an empty graph, or shapes whose target class has no
    instances, reports zero violations instead of crashing on the
    schemaless empty relations (regression)."""
    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray import shacl

    shape = shacl.NodeShape(
        target_class="<http://kg.ex/c/Document>",
        properties=(shacl.PropertyShape(path="<p>", min_count=1),))
    sch = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                     ("obj", pa.string())])
    assert shacl.validate(rd.from_arrow(sch.empty_table()),
                          [shape]).count() == 0
    g = rd.from_arrow(pa.table({"subj": ["<a>"], "pred": ["<p>"],
                                "obj": ["x"]}))
    assert shacl.validate(g, [shape]).count() == 0
