"""Flagship pipeline: Ray-Data-native knowledge-graph construction.

read_parquet(pages/documents)
  → map_batches(ExtractText)                 # html→text, byte-identical per url  [stateless]
  → map_batches(AddSubject)                  # mint page/doc subject IRI          [stateless]
  → map_batches(EntityLinker, concurrency=N) # mentions + link scores        [ACTOR POOL]
  → map_batches(EmitTriples)                 # R2RML-style term maps → (s,p,o)    [stateless]
  → CanonicalRewrite(entity→min-IRI)         # union-find merge, broadcast map
  → distinct (s,p,o) groupby                 # SHUFFLE: exact dedup / materialize
  → write_parquet(partitioned by hash(subj))

This is the Ray Data reinterpretation of the reference's full-graph
materialization (UNION ALL per TriplesMap×pomap,
``docs/test-results/sqlite-rdb2rdf/DirectGraphTC0014.md:7-60``) over
Common-Crawl-style web-page tables (BASELINE.json north_star).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..aliases import alias_table, canonical_map
from ..mapping import Mapping, PredicateObjectMap, TermMap, TriplesMap
from ..stages.canonicalize import CanonicalRewrite
from ..stages.dedup import dedupe_triples
from ..stages.emit import TRIPLE_SCHEMA, EmitTriples, encode_triples, term_array
from ..stages.extract import ExtractText
from ..stages.linker import EntityLinker
from ..workerenv import cap_threads

KG = "http://kg.ex/"
MENTIONS_PRED = KG + "p/mentions"


def documents_mapping(base: str = KG) -> Mapping:
    """Mapping rules for the driver testdata ``documents`` table
    (doc_id, text, lang, source, n_chars)."""
    tm = TriplesMap(
        name="documents",
        table="documents",
        subject=TermMap(kind="template", template=base + "doc/{doc_id}", term_type="iri"),
        pomaps=(
            PredicateObjectMap(
                predicate=TermMap.iri_constant(base + "p/lang"),
                object=TermMap(kind="column", column="lang"),
            ),
            PredicateObjectMap(
                predicate=TermMap.iri_constant(base + "p/source"),
                object=TermMap(kind="column", column="source"),
            ),
            PredicateObjectMap(
                predicate=TermMap.iri_constant(base + "p/n_chars"),
                object=TermMap(kind="column", column="n_chars"),
            ),
        ),
        classes=(base + "c/Document",),
    )
    return Mapping(triples_maps=(tm,), base=base)


def pages_mapping(base: str = KG) -> Mapping:
    """Mapping rules for the F1 ``pages`` fixture (url, warc_ts, text, lang):
    subject = the page url itself (column term map, termType IRI)."""
    tm = TriplesMap(
        name="pages",
        table="pages",
        subject=TermMap(kind="column", column="url", term_type="iri"),
        pomaps=(
            PredicateObjectMap(
                predicate=TermMap.iri_constant(base + "p/lang"),
                object=TermMap(kind="column", column="lang"),
            ),
            PredicateObjectMap(
                predicate=TermMap.iri_constant(base + "p/crawl_ts"),
                object=TermMap(kind="column", column="warc_ts"),
            ),
        ),
        classes=(base + "c/Page",),
    )
    return Mapping(triples_maps=(tm,), base=base)


class AddSubject:
    """Adds the minted subject IRI as a ``subj`` column (input to the
    linker), reusing the mapping's subject term map."""

    def __init__(self, mapping: Mapping, table: str):
        tms = [tm for tm in mapping.triples_maps if tm.table == table]
        assert len(tms) == 1
        self.tm = tms[0]
        self.base = mapping.base

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj = term_array(self.tm.subject, batch, self.base, "s", self.tm.table)
        if "subj" in batch.column_names:
            batch = batch.drop_columns(["subj"])
        return batch.append_column("subj", subj)


def mentions_to_triples(batch: pa.Table) -> pa.Table:
    """mention rows → (subj, <mentions>, <entity>) triples."""
    n = len(batch)
    obj = pc.binary_join_element_wise("<", batch["entity"].combine_chunks()
                                      if isinstance(batch["entity"], pa.ChunkedArray)
                                      else batch["entity"], ">", "")
    return pa.table(
        {
            "subj": batch["subj"],
            "pred": pa.array([f"<{MENTIONS_PRED}>"] * n, pa.string()),
            "obj": obj,
            "graph": pa.array([None] * n, pa.string()),
        },
        schema=TRIPLE_SCHEMA,
    )


class KGEmitter:
    """Single-pass actor stage: row batch → (mapping triples ∪ canonicalized
    mention triples).

    The reference materializes the graph as a UNION ALL over rule projections
    (``DirectGraphTC0014.md:7-60``); computing that union INSIDE one UDF —
    instead of branching the Dataset — keeps the lineage linear, so the
    expensive upstream (read, html extraction) executes exactly once.  The
    alias dictionary + canonical map are broadcast refs dereferenced once per
    actor in ``__init__``."""

    def __init__(self, mapping: Mapping, table: str, alias_ref, canon_ref,
                 text_col: str = "text", extract_html: bool = False):
        cap_threads()
        self.extract = ExtractText(text_col=text_col) if extract_html else None
        self.add_subj = AddSubject(mapping, table)
        self.emit = EmitTriples(mapping, table)
        self.linker = EntityLinker(alias_ref, subj_col="subj", text_col=text_col)
        self.canon = CanonicalRewrite(canon_ref, columns=["entity"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.extract is not None:
            batch = self.extract(batch)
        batch = self.add_subj(batch)
        doc_triples = self.emit(batch)
        mentions = self.canon(self.linker(batch))
        mention_triples = mentions_to_triples(mentions)
        out = pa.concat_tables([doc_triples, mention_triples]).combine_chunks()
        # dict-encode pred/obj/graph: halves every downstream exchange's bytes
        return encode_triples(out)


# per-WORKER-process emitter cache: Ray reuses its pre-started worker
# processes for tasks, so the first task on each worker builds the emitter
# (broadcast refs dereferenced once) and every later task reuses it — the
# amortization of an actor pool WITHOUT the actor-spawn cost (~1.5 s for a
# 12-actor pool: fresh processes importing numpy/arrow/polars) and without
# pool sizing: tasks schedule elastically across ALL CPUs and interleave
# with the exchange's split tasks.
_EMITTER_CACHE: Dict[tuple, "KGEmitter"] = {}


def _cached_emitter(mapping: Mapping, table: str, alias_ref, canon_ref,
                    text_col: str, extract_html: bool) -> "KGEmitter":
    # hash(mapping): frozen dataclasses hash by value, so the key is stable
    # across tasks (each task unpickles its own mapping object)
    key = (hash(mapping), table,
           alias_ref.hex() if hasattr(alias_ref, "hex") else id(alias_ref),
           canon_ref.hex() if hasattr(canon_ref, "hex") else id(canon_ref),
           text_col, extract_html)
    em = _EMITTER_CACHE.get(key)
    if em is None:
        em = KGEmitter(mapping=mapping, table=table, alias_ref=alias_ref,
                       canon_ref=canon_ref, text_col=text_col,
                       extract_html=extract_html)
        _EMITTER_CACHE.clear()  # one live pipeline per worker is the norm
        _EMITTER_CACHE[key] = em
    return em


def kg_construct(
    ds: rd.Dataset,
    mapping: Mapping,
    table: str,
    *,
    alias_rows: Optional[List[Tuple[str, str, float]]] = None,
    text_col: str = "text",
    has_html: bool = False,
    linker_concurrency: Optional[int] = None,
    dedup: bool = True,
) -> rd.Dataset:
    """Full KG-construction pipeline over one logical table; returns the
    triples Dataset (subj, pred, obj, graph).

    The stateful stage (extract + emit + link) runs as TASKS with a
    per-worker emitter cache rather than an actor pool: the state here is a
    broadcast alias dictionary + compiled rules (cheap to build once per
    worker), so the cache gives actor-pool amortization while tasks schedule
    elastically over every CPU — measured faster than both a fixed ¾-CPU
    pool (leaves CPUs idle, ~1.5 s actor spawn per run) and a 1-per-CPU
    fractional pool (thrashes).  A stage holding EXPENSIVE pinned state (a
    real NER model) should stay an actor pool — see ``EntityLinker`` usage
    in ``driver_api.q_kg_mentions``."""
    if alias_rows is None:
        alias_rows = alias_table()
    alias_ref = ray.put(alias_rows)
    canon_ref = ray.put(canonical_map())

    def emit_task(batch: pa.Table, _m=mapping, _t=table, _a=alias_ref,
                  _c=canon_ref, _tc=text_col, _h=has_html) -> pa.Table:
        em = _cached_emitter(_m, _t, _a, _c, _tc, _h)
        return em(batch)

    triples = ds.map_batches(emit_task, batch_format="pyarrow")
    if dedup:
        triples = dedupe_triples(triples)
    return triples


def ref_join_triples(
    child_ds: rd.Dataset,
    parent_ds: rd.Dataset,
    mapping: Mapping,
    tm: TriplesMap,
    pm: PredicateObjectMap,
) -> rd.Dataset:
    """Join-requiring referencing object map (reference joinCondition
    handling, ``sql_converter.py:164-176``): when the parent subject is NOT
    derivable from child columns (``retarget_ref_to_template`` returns
    None — e.g. the parent subject template uses non-joined columns), the
    child and parent Datasets are joined on the rr:joinCondition columns
    and the object is the PARENT row's minted subject.

    The join goes through the broadcast-vs-shuffle planner: a dimension-like
    parent broadcasts; two fact tables fall back to the distributed hash
    join keyed on the raw join columns."""
    from ..relational import planned_join
    from ..stages.emit import term_array

    obj = pm.object
    assert obj.kind == "ref" and obj.parent_subject is not None
    child_cols = [c for c, _ in obj.join]
    parent_cols = [p for _, p in obj.join]

    # R2RML §9.1: target graphs = subject-level ∪ pom-level graph maps.
    # Constant graphs stamp in `finish`; ROW-DEPENDENT graph maps (template/
    # column) read CHILD columns, so they compute on the child side and ride
    # through the join as extra columns.
    g_terms = [g for g in dict.fromkeys((tm.graph, pm.graph)) if g is not None]
    const_graphs = [g.constant for g in g_terms if g.kind == "constant"]
    row_graphs = [g for g in g_terms if g.kind != "constant"]

    def child_side(batch: pa.Table, _tm=tm, _base=mapping.base, _cols=child_cols,
                   _gs=tuple(row_graphs)) -> pa.Table:
        subj = term_array(_tm.subject, batch, _base, "s", _tm.table)
        out = {"subj": subj}
        for gi, g in enumerate(_gs):
            out[f"__g{gi}"] = term_array(g, batch, _base, "g", _tm.table)
        for c in _cols:
            out[c] = batch[c]
        return pa.table(out)

    def parent_side(batch: pa.Table, _obj=obj, _base=mapping.base, _cols=parent_cols) -> pa.Table:
        pobj = term_array(_obj.parent_subject, batch, _base, "s", _obj.parent_table)
        out = {"obj": pobj}
        for p in _cols:
            out[p] = batch[p]
        return pa.table(out)

    child = child_ds.map_batches(child_side, batch_format="pyarrow")
    parent = parent_ds.map_batches(parent_side, batch_format="pyarrow")
    j = planned_join(child, parent, on=child_cols, right_on=parent_cols)
    pred_const = pm.predicate.constant  # constant in all supported cases
    assert pred_const, "ref pomap predicates must be constant"
    graphs = const_graphs if (const_graphs or row_graphs) else [None]

    def finish(batch: pa.Table, _pred=pred_const, _graphs=tuple(graphs),
               _n_row_graphs=len(row_graphs)) -> pa.Table:
        n = len(batch)
        outs = []
        g_arrays = [pa.array([g] * n, type=pa.string()) for g in _graphs]
        g_arrays += [pc.cast(batch[f"__g{gi}"], pa.string())
                     for gi in range(_n_row_graphs)]
        for g_arr in g_arrays:
            t = pa.table(
                {
                    "subj": batch["subj"],
                    "pred": pa.array([_pred] * n, pa.string()),
                    "obj": batch["obj"],
                    "graph": g_arr,
                },
                schema=TRIPLE_SCHEMA,
            )
            mask = pc.and_(pc.is_valid(t["subj"]), pc.is_valid(t["obj"]))
            outs.append(t.filter(mask))
        return pa.concat_tables(outs)

    return j.map_batches(finish, batch_format="pyarrow")


def emit_bnode_table(ds: rd.Dataset, mapping: Mapping, table: str) -> rd.Dataset:
    """Emit a no-PK (blank-node-subject) table with GLOBAL duplicate ranks:
    rows are hash-partitioned on FULL row content through the streaming
    exchange, so identical rows co-locate in one partition and
    ``emit._bnode_ids`` assigns each duplicate a distinct rank — removing
    the cross-block bnode-merge divergence (W3C D005 semantics; VERDICT
    round-2 item 10).  The emit runs INSIDE the exchange reduce (one call
    per complete partition), so Ray can never re-split a partition into
    smaller batches that would restart the ranks."""
    from ..stages.dedup import hash_group_exchange

    emitter = EmitTriples(mapping, table, skip_unfoldable_refs=True)
    cols = list(ds.schema().names)
    return hash_group_exchange(ds, cols, emitter, TRIPLE_SCHEMA)


def emit_graph(datasets: Dict[str, rd.Dataset], mapping: Mapping) -> rd.Dataset:
    """Emit the full graph for a multi-table mapping: per logical table one
    vectorized EmitTriples pass (join-free rules), plus one
    ``ref_join_triples`` branch per join-requiring referencing object map,
    unioned into a single triples Dataset.

    This is the general driver for R2RML mappings loaded from TTL
    (``r2rml.load_r2rml``): the reference compiles the same structure to a
    SQL UNION ALL with joins inlined (``sql_converter.py:164-176``)."""
    from ..mapping import retarget_ref_to_template

    outs: List[rd.Dataset] = []
    for table in mapping.by_table():
        ds = datasets[table]
        tms = [tm for tm in mapping.triples_maps if tm.table == table]
        if any(tm.subject.term_type == "bnode" for tm in tms):
            # no-PK tables need content-partitioned emit for global
            # duplicate-rank bnode ids (see emit_bnode_table)
            outs.append(emit_bnode_table(ds, mapping, table))
            continue
        outs.append(
            ds.map_batches(EmitTriples(mapping, table, skip_unfoldable_refs=True),
                           batch_format="pyarrow")
        )
    for tm in mapping.triples_maps:
        for pm in tm.pomaps:
            if pm.object.kind == "ref" and retarget_ref_to_template(pm.object) is None:
                outs.append(
                    ref_join_triples(
                        datasets[tm.table], datasets[pm.object.parent_table],
                        mapping, tm, pm,
                    )
                )
    out = outs[0]
    for other in outs[1:]:
        out = out.union(other)
    return out


def materialize_graph(
    triples: rd.Dataset,
    out_dir: str,
    num_partitions: "int | None" = None,
    rule_version: str = "v1",
    resume: bool = True,
) -> dict:
    """Materialize the graph: ONE fused exchange doing exact (s,p,o) dedup +
    subject-hash partitioning + sorted parquet write with per-partition
    lineage manifests (resume skips committed partitions).

    Dedup-inside-write is exact: partitioning on ``subj`` co-locates every
    candidate duplicate triple.  This is the north-star output layout —
    ``part=<hash(subj)%P>/data.parquet`` + ``_manifest.json`` — and replaces
    a separate dedup shuffle followed by a write (half the data movement).

    ``num_partitions=None`` sizes the partition count adaptively from the
    streamed output metadata (~500k triples each: the per-partition hash
    dedup degrades sharply (~40×) once a partition's working set outgrows
    cache over plasma-backed memory, and a tiny output commits one file
    instead of dozens of fsyncs).  The count is a layout contract — a
    resumed run reuses the count recorded in the existing manifests."""
    from ..state.checkpoint import checkpointed_write

    return checkpointed_write(
        triples,
        out_dir,
        keys=["subj"],
        num_partitions=num_partitions,
        lineage={"rule_version": rule_version, "pipeline": "kg_construct"},
        resume=resume,
        distinct_keys=["subj", "pred", "obj"],
    )
