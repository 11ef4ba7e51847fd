"""End-to-end KG construction pipeline tests (Ray): triples P/R vs the
pure-Python oracle, canonical entity rewriting, dedup, resumable write."""

import re

import pyarrow as pa
import pytest

import ray.data as rd

from rdflib_r2r_ray.aliases import (
    alias_table,
    best_entity_per_alias,
    canonical_map,
    linked_canonical_per_alias,
    merge_edges,
)
from rdflib_r2r_ray.fixtures import pages_table
from rdflib_r2r_ray.oracle import oracle_triples
from rdflib_r2r_ray.pipelines.kg import (
    MENTIONS_PRED,
    kg_construct,
    pages_mapping,
)


def oracle_kg_triples(pages: pa.Table):
    """Reference-semantics per-row oracle: mapping triples + mention triples
    with canonical rewrite — plain Python, no Arrow/Ray code paths."""
    mapping = pages_mapping()
    rows = pages.to_pylist()
    for r in rows:
        r.pop("html", None)
    trips = set(oracle_triples(mapping, {"pages": rows}))
    a2c = linked_canonical_per_alias()
    for r in rows:
        subj = f"<{r['url']}>"
        text = r["text"] or ""
        linked = set()
        for alias, canon in a2c.items():
            if re.search(r"\b" + re.escape(alias) + r"\b", text):
                linked.add(canon)
        for e in linked:
            trips.add((subj, f"<{MENTIONS_PRED}>", f"<{e}>", None))
    return {(s, p, o) for s, p, o, g in trips}


def test_alias_fixture_semantics():
    # spark-engine merges into spark (2 shared aliases)
    cm = canonical_map()
    assert cm["http://kg.ex/e/spark-engine"] == "http://kg.ex/e/spark"
    # chain merges into single component with min IRI canon
    assert cm["http://kg.ex/e/sort-merge"] == "http://kg.ex/e/merge-sort"
    assert cm["http://kg.ex/e/mergesort"] == "http://kg.ex/e/merge-sort"
    # ambiguity (1 shared alias) does NOT merge
    assert "http://kg.ex/e/table-furniture" not in cm
    assert "http://kg.ex/e/table-db" not in cm
    # linker picks max-prior candidate
    assert best_entity_per_alias()["table"] == "http://kg.ex/e/table-db"
    assert best_entity_per_alias()["window"] == "http://kg.ex/e/window-fn"


def test_kg_pipeline_matches_oracle(ray_session):
    pages = pages_table(n=200, seed=11)
    ds = rd.from_arrow(pages.drop_columns(["text"]))  # pipeline must re-extract
    triples = kg_construct(
        ds, pages_mapping(), "pages", has_html=True, linker_concurrency=2
    )
    got_tbl = triples.to_pandas()
    got = {(r.subj, r.pred, r.obj) for r in got_tbl.itertuples()}
    want = oracle_kg_triples(pages)
    # exact match expected for the deterministic core (P/R = 1.0 >= 0.95)
    missing = want - got
    extra = got - want
    assert not missing, f"missing {len(missing)}: {list(missing)[:5]}"
    assert not extra, f"extra {len(extra)}: {list(extra)[:5]}"
    # dedup: no exact duplicate triples
    assert len(got_tbl) == len(got)


def test_mentions_canonicalized(ray_session):
    # craft a page mentioning the duplicate pair's alias: entity must be canonical
    pages = pa.table(
        {
            "url": ["http://ex.org/p1"],
            "warc_ts": pa.array([None], pa.timestamp("us")),
            "text": ["we love spark stream and merge sort today"],
            "lang": ["en"],
        }
    )
    ds = rd.from_arrow(pages)
    triples = kg_construct(ds, pages_mapping(), "pages", has_html=False,
                           linker_concurrency=1)
    df = triples.to_pandas()
    ments = df[df.pred == f"<{MENTIONS_PRED}>"].obj.tolist()
    assert "<http://kg.ex/e/spark>" in ments          # canonical, not spark-engine
    assert "<http://kg.ex/e/merge-sort>" in ments     # component min IRI
    assert "<http://kg.ex/e/spark-engine>" not in ments
    assert "<http://kg.ex/e/sort-merge>" not in ments


def test_materialize_partitioned_write(ray_session, tmp_path):
    from rdflib_r2r_ray.pipelines.kg import materialize_graph
    from rdflib_r2r_ray.state.checkpoint import completed_partitions, read_checkpointed

    pages = pages_table(n=50, seed=5)
    ds = rd.from_arrow(pages)
    triples = kg_construct(ds, pages_mapping(), "pages", has_html=False,
                           linker_concurrency=1)
    out = str(tmp_path / "graph")
    res = materialize_graph(triples, out, num_partitions=4)
    assert res["written"] == 4
    assert res["rows"] == triples.count()  # kg_construct already dedups
    back = read_checkpointed(out)
    assert back.count() == res["rows"]
    assert len(completed_partitions(out)) == 4
    # resume: nothing recomputed
    ds2 = rd.from_arrow(pages)
    triples2 = kg_construct(ds2, pages_mapping(), "pages", has_html=False,
                            linker_concurrency=1)
    res2 = materialize_graph(triples2, out, num_partitions=4)
    assert res2["written"] == 0 and res2["skipped"] == 4


def test_bnode_table_cross_block_duplicates_stay_distinct(ray_session):
    """No-PK table with identical rows spread across MANY blocks: every
    duplicate row gets its own blank-node subject (global duplicate ranks
    via the content-partitioned emit — VERDICT round-2 item 10)."""
    import pyarrow as pa
    import ray.data as rd
    from rdflib_r2r_ray.mapping import direct_mapping
    from rdflib_r2r_ray.pipelines.kg import emit_graph

    # 12 copies of the same row + 3 of another, shuffled over 8 blocks
    vals = [("x", 1)] * 12 + [("y", 2)] * 3
    tbl = pa.table({"name": [v[0] for v in vals], "val": [v[1] for v in vals]})
    schema = pa.schema([pa.field("name", pa.string()), pa.field("val", pa.int64())])
    mapping = direct_mapping({"t": schema}, {"t": []})  # no PK -> bnode subject
    ds = rd.from_arrow(tbl).repartition(8)
    out = emit_graph({"t": ds}, mapping)
    rows = out.take_all()
    # per row: 2 column pomaps (+ type class if any) — group by predicate
    subjects = {r["subj"] for r in rows if r["pred"].endswith("#name>")}
    assert len(subjects) == 15, f"expected 15 distinct bnodes, got {len(subjects)}"
    assert all(s.startswith("_:") for s in subjects)
