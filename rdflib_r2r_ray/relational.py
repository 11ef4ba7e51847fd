"""Relational / dataflow operator layer (SURVEY.md §2.3, Q3-Q16).

Re-expresses the reference's SPARQL-algebra → SQL operator inventory
(``rdflib_r2r/query_conversions.py:388-419`` dispatcher) as Ray-Data-native
transforms over Datasets:

- Filter (Q3)            → ``ds.filter(expr=...)`` / map_batches mask
- Extend/bind (Q11)      → ``map_batches`` adding a computed Arrow column
- Inner join (Q5)        → ``ds.join`` hash join, or broadcast join for a
                           small side (``ray.put`` once, ``pa.Table.join``
                           per batch — no shuffle)
- Left join (Q6)         → ``ds.join(join_type="left_outer")``
- Union w/ padding (Q7)  → schema-align (null columns) + ``ds.union``
- Minus (Q8)             → ``left_anti`` join on all shared columns
- Exists / semi (Q16)    → ``left_semi`` join on correlation vars
- Grouped aggregation (Q9/Q10) → map-side partial aggregation inside
  ``map_batches`` (combiner) + small global ``groupby().aggregate``;
  count-distinct = distinct exchange then count; group_concat =
  ``map_groups`` with deterministic in-group ordering
- Project/Distinct/Slice (Q12) → ``select_columns`` / dedup exchange /
  ``limit``
- OrderBy / top-k (Q13)  → per-block partial top-k then global
  ``sort().limit(k)`` over the reduced set
- VALUES (Q15)           → ``ray.data.from_arrow`` + join

Scale notes: every helper here avoids full materialization; joins take an
explicit ``num_partitions`` (defaults scale with cluster CPUs); aggregates
combine map-side before the shuffle so the exchange moves one row per
(block × group), not per input row.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .stages.dedup import distinct_on, local_distinct
from .workerenv import cap_threads


def _num_partitions(default: int = 16) -> int:
    try:
        return max(4, int(ray.cluster_resources().get("CPU", default)) // 2)
    except Exception:
        return default


# ---------------------------------------------------------------------------
# Filter / extend / project (Q3, Q11, Q12)
# ---------------------------------------------------------------------------

def filter_expr(ds: rd.Dataset, expr: str) -> rd.Dataset:
    """Filter via an Arrow-compute expression string (predicate pushdown:
    Ray fuses this into the read stage where possible)."""
    return ds.filter(expr=expr)


def extend(ds: rd.Dataset, **cols) -> rd.Dataset:
    """Extend/BIND (reference ``query_conversions.py:285-290``): add computed
    columns. Each kwarg is ``name=fn(batch: pa.Table) -> pa.Array``."""

    def add(batch: pa.Table) -> pa.Table:
        for name, fn in cols.items():
            batch = batch.append_column(name, fn(batch))
        return batch

    return ds.map_batches(add, batch_format="pyarrow")


def money_cents(batch: pa.Table, col: str) -> pa.Array:
    """Deterministic money integerization: round(x*100) half-away-from-zero
    → int64. Bit-identical to SQL ``CAST(ROUND(x*100) AS BIGINT)``; makes
    downstream sums exact integer arithmetic (order-independent — safe under
    Ray's nondeterministic block ordering)."""
    return pc.cast(
        pc.round(pc.multiply(batch[col], pa.scalar(100.0)), 0, round_mode="half_towards_infinity"),
        pa.int64(),
    )


# ---------------------------------------------------------------------------
# Joins (Q5, Q6, Q8, Q16)
# ---------------------------------------------------------------------------

def _drop_empty_blocks(
    ds: rd.Dataset, fallback_schema: Optional[pa.Schema] = None
) -> rd.Dataset:
    """Remove schema-less empty blocks from a Dataset.

    ``filter``/``union`` lineages emit zero-column empty blocks; they skip
    ``map_batches`` UDFs entirely (so they can't be repaired there) and
    crash Ray's hash-shuffle join aggregator ("No match or multiple matches
    for key field ...").  Filtering on block METADATA (no data fetch) drops
    them; this materializes the input, which a hash join — itself a full
    barrier — already implies."""
    bundles = ds.iter_internal_ref_bundles()
    refs = [
        block
        for bundle in bundles
        for block, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]
    if not refs:
        schema = ds.schema()
        if schema is None:
            # every block empty AND schema uninferable (e.g. a filter
            # lineage that matched nothing): honor the caller's hint
            if fallback_schema is None:
                raise ValueError(
                    "empty dataset with unknown schema — pass "
                    "fallback_schema")
            return rd.from_arrow(fallback_schema.empty_table())
        target = pa.schema(list(zip(schema.names, schema.types)))
        return rd.from_arrow(target.empty_table())
    return rd.from_arrow_refs(refs)


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: Sequence[str],
    join_type: str = "inner",
    right_on: Optional[Sequence[str]] = None,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Distributed hash join (reference inner/left joins,
    ``query_conversions.py:246-269, 349-374``).

    Caveat: inputs whose lineage contains filtered unions of tiny reads can
    carry schema-less empty blocks that crash Ray's join aggregator — pass
    such inputs through :func:`_drop_empty_blocks` first (streaming is lost
    there, so it is not applied globally; see ``bgp.execute_bgp``)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions or _num_partitions(),
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
    )


def semi_join(left: rd.Dataset, right: rd.Dataset, on: Sequence[str], **kw) -> rd.Dataset:
    """EXISTS (reference ``query_conversions.py:183-210``) as left-semi."""
    return hash_join(left, right, on, join_type="left_semi", **kw)


def anti_join(left: rd.Dataset, right: rd.Dataset, on: Sequence[str], **kw) -> rd.Dataset:
    """MINUS / NOT EXISTS (reference ``query_conversions.py:403-406``)."""
    return hash_join(left, right, on, join_type="left_anti", **kw)


def set_diff_both(
    left: rd.Dataset,
    right: rd.Dataset,
    on: Sequence[str],
    op_col: str = "op",
    left_only: str = "removed",
    right_only: str = "added",
) -> rd.Dataset:
    """Symmetric set difference in ONE co-partitioned exchange: ``on``-tuples
    present (as a SET, per side) only in ``left`` come back tagged
    ``left_only``; only in ``right``, tagged ``right_only``.

    Replaces the naive CDC plan — dedup exchange per side + two shuffle
    anti-joins (4 all-to-all moves of every row) — with a single
    :func:`cogroup_exchange`: both sides hash-partition once on the full
    tuple, and because each reduce task holds COMPLETE key groups of both
    sides, per-side DISTINCT and both anti-joins are local vectorized polars
    ops.  Inputs may therefore carry duplicates (callers skip their own
    dedup pass)."""
    from .stages.dedup import _pl, cogroup_exchange
    from .stages.emit import decode_triples

    keys = list(on)
    s = left.schema()
    rs = right.schema()
    tmap = dict(zip(s.names, s.types))
    rmap = dict(zip(rs.names, rs.types))
    # co-partitioning hashes by VALUE within an encoding, but dict-encoded
    # and plain strings hash differently (measured) — if the sides disagree
    # per key column, decode both so the buckets line up
    if any(pa.types.is_dictionary(tmap[k]) != pa.types.is_dictionary(rmap[k])
           for k in keys):
        left = left.map_batches(decode_triples, batch_format="pyarrow")
        right = right.map_batches(decode_triples, batch_format="pyarrow")
    ktypes = [pa.string() if pa.types.is_dictionary(tmap[k]) else tmap[k]
              for k in keys]
    out_schema = pa.schema([(op_col, pa.string())] + list(zip(keys, ktypes)))

    def reduce_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        pl = _pl()
        ld = (pl.from_arrow(decode_triples(lt.select(keys))).unique()
              if lt.num_rows else None)
        rdd = (pl.from_arrow(decode_triples(rt.select(keys))).unique()
               if rt.num_rows else None)
        outs = []
        for mine, other, tag in ((ld, rdd, left_only), (rdd, ld, right_only)):
            if mine is None:
                continue
            only = mine.join(other, on=keys, how="anti") if other is not None else mine
            if only.height:
                outs.append(only.with_columns(pl.lit(tag).alias(op_col))
                            .select([op_col] + keys))
        if not outs:
            return out_schema.empty_table()
        return pl.concat(outs).to_arrow().cast(out_schema)

    return cogroup_exchange(left, keys, right, keys, reduce_fn, out_schema)


def broadcast_join(
    ds: rd.Dataset,
    small: pa.Table,
    on: Sequence[str],
    join_type: str = "inner",
    right_on: Optional[Sequence[str]] = None,
) -> rd.Dataset:
    """Join against a SMALL side without a shuffle: the table is put in the
    object store ONCE (``ray.put``) and each map task does a zero-copy local
    ``pa.Table.join`` per batch. The scale-path replacement for shipping the
    small side per batch."""
    small_ref = ray.put(small.combine_chunks())
    keys = list(on)
    rkeys = list(right_on) if right_on else keys
    jt = {"inner": "inner", "left_outer": "left outer", "left_semi": "left semi",
          "left_anti": "left anti"}[join_type]

    def join_batch(batch: pa.Table, _ref=small_ref, _keys=keys, _rk=rkeys, _jt=jt) -> pa.Table:
        rhs = ray.get(_ref)
        return batch.join(rhs, keys=_keys, right_keys=_rk, join_type=_jt)

    return ds.map_batches(join_batch, batch_format="pyarrow")


# Build sides under this many rows are broadcast instead of shuffled.  At
# ~50 B/row this is ≈10 MB in the object store — one put, zero exchange.
BROADCAST_LIMIT = 200_000


def planned_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: Sequence[str],
    join_type: str = "inner",
    right_on: Optional[Sequence[str]] = None,
    broadcast_limit: int = BROADCAST_LIMIT,
    right_schema: Optional[pa.Schema] = None,
) -> rd.Dataset:
    """Join with a broadcast-vs-shuffle decision made from METADATA, never by
    pulling data to the driver: the build side is materialized (blocks stay
    in the object store), its row count read from block metadata, and only if
    it is under ``broadcast_limit`` are the (bounded) blocks fetched and
    broadcast.  Otherwise both sides go through the distributed hash join.

    This is the planner the reference delegates to its SQL engine
    (``query_conversions.py:246-269`` joins compile to SQL and the database
    picks the strategy); here the build side is typically a dimension table
    or a filtered subquery, so broadcast wins by orders of magnitude over an
    all-to-all shuffle of the probe side."""
    mat = right.materialize()
    if mat.count() <= broadcast_limit:
        tables = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
        if not tables:
            s = mat.schema()
            if s is None and right_schema is not None:
                # caller knows the build side's column types (e.g. a BGP
                # relation is all strings) — honor the hint so an OPTIONAL
                # matching nothing still null-pads correctly
                tables = [right_schema.empty_table()]
            elif s is None:
                # zero-row build side whose schema Ray can't infer (e.g. a
                # MINUS group matching nothing): for anti/semi joins no
                # right payload survives, so synthesize the key columns
                # from the probe side's types; other join types would
                # silently lose right columns — fail loudly instead.
                if join_type not in ("left_anti", "left_semi"):
                    raise ValueError(
                        f"empty build side with unknown schema in a "
                        f"{join_type} join — materialize a typed empty "
                        f"table upstream")
                ls = left.schema()
                if ls is None:
                    # the probe side is itself empty and schemaless: the
                    # anti/semi join of an empty probe is empty — pass it
                    # through unchanged
                    return left
                rnames = list(right_on) if right_on else list(on)
                tables = [pa.schema(
                    [(rn, ls.types[ls.names.index(ln)])
                     for rn, ln in zip(rnames, on)]).empty_table()]
            else:
                tables = [pa.schema(list(zip(s.names, s.types))).empty_table()]
        small = pa.concat_tables(tables).combine_chunks()
        return broadcast_join(left, small, on, join_type=join_type, right_on=right_on)
    return hash_join(left, mat, on, join_type=join_type, right_on=right_on)


def _local_full_outer(keys, lschema: pa.Schema, rschema: pa.Schema,
                      n_left: int, *blocks: pa.Table) -> pa.Table:
    lt = [b for b in blocks[:n_left] if b.num_rows]
    rt = [b for b in blocks[n_left:] if b.num_rows]
    la = pa.concat_tables(lt).combine_chunks() if lt else lschema.empty_table()
    ra = pa.concat_tables(rt).combine_chunks() if rt else rschema.empty_table()
    return la.join(ra, keys=list(keys), join_type="full outer")


def full_outer_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: Sequence[str],
    broadcast_limit: int = BROADCAST_LIMIT,
) -> rd.Dataset:
    """FULL OUTER JOIN with the same metadata-driven planning as
    :func:`planned_join`.  When BOTH sides are small (counts read from
    block metadata — typically because they are pre-aggregated) the join
    runs as ONE Ray task doing a local Arrow full-outer over the already-
    materialized blocks — Ray's hash-JoinOperator spins up an actor pool
    that costs seconds of fixed latency regardless of input size.
    Anything bigger takes the native full_outer hash join (the correct
    all-to-all at scale).  Key columns must share names on both sides
    (they are coalesced)."""
    keys = list(on)
    lm, rm = left.materialize(), right.materialize()
    if lm.count() <= broadcast_limit and rm.count() <= broadcast_limit:
        ls = lm.schema()
        rs = rm.schema()
        out = ray.remote(_local_full_outer).remote(
            keys, pa.schema(list(zip(ls.names, ls.types))),
            pa.schema(list(zip(rs.names, rs.types))),
            len(lm.to_arrow_refs()), *lm.to_arrow_refs(), *rm.to_arrow_refs())
        return rd.from_arrow_refs([out])
    return hash_join(lm, rm, keys, join_type="full_outer")


def values_dataset(rows: List[dict]) -> rd.Dataset:
    """SPARQL VALUES inline table (reference ``query_conversions.py:376-386``)."""
    return rd.from_arrow(pa.Table.from_pylist(rows))


# A skewed input is by definition concentrated on FEW keys; if "hot"
# detection yields more than this many, the threshold is wrong and a
# broadcast of the right side's hot rows could be unbounded — fail loudly.
SKEW_JOIN_MAX_HOT_KEYS = 10_000

# Diagnostic: hot keys detected by the most recent skew_join call in this
# process (list of python values; [] when the all-cold path ran).  Read by
# tests and by operators that want to log their skew decisions loudly.
LAST_SKEW_JOIN_HOT_KEYS: list = []


def skew_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: Sequence[str],
    hot_count: int,
) -> rd.Dataset:
    """Skew-aware INNER join.  A hash join sends every row of a key to ONE
    reduce partition, so a hot key (a viral URL, the ``en`` language, a
    default value) serializes its entire row set through a single task.
    This operator splits the work: keys whose LEFT-side frequency reaches
    ``hot_count`` (detected from a map-side pre-aggregated grouped count —
    one row per key per block crosses the wire) join against the right
    side's matching rows via broadcast (embarrassingly parallel, no
    exchange touches the hot rows), while the cold remainder goes through
    the standard distributed hash join.  Result == plain inner join,
    bit-for-bit; only the physical plan changes.

    Contract: the right side's hot-key rows must fit a broadcast (true by
    construction when the right side is dim-like); > ``SKEW_JOIN_MAX_HOT_KEYS``
    detected hot keys raises rather than broadcasting unbounded state.

    Detection is one streaming pass, no exchange: each block sends its
    local value counts FILTERED to ``>= hot_count // num_blocks``
    (pigeonhole: a key with ``hot_count`` total rows must reach that local
    count in at least one block), and the driver sums the bounded
    candidate table.  The left side is materialized first — it is
    consumed again by the split maps anyway, and the real block count
    makes the pigeonhole threshold exact, so detection cannot miss a true
    hub (a FALSE candidate only costs one extra row in the driver fold;
    and ANY hot/cold split returns the identical join result)."""
    keys = list(on)
    if len(keys) != 1:
        raise NotImplementedError("skew_join supports a single join key")
    key = keys[0]
    left = left.materialize()
    local_min = max(1, int(hot_count) // max(1, left.num_blocks()))

    def count_partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(pc.drop_null(b[key]))
        t = pa.table({key: vc.field("values"),
                      "__cnt": pc.cast(vc.field("counts"), pa.int64())})
        return t.filter(pc.greater_equal(t["__cnt"], local_min))

    kt = left.schema().types[left.schema().names.index(key)]
    cand_tbls = [t for t in ray.get(
        left.select_columns([key]).map_batches(
            count_partial, batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    if cand_tbls:
        cands = pa.concat_tables(cand_tbls)[key].combine_chunks().unique()
        # second pass, exact: the partial sums above undercount keys that
        # sit below local_min in SOME blocks, so re-count the (bounded)
        # candidate set precisely — pigeonhole guarantees every true hub
        # is a candidate, so detection is now exact

        def count_cands(b: pa.Table, _c=cands) -> pa.Table:
            x = pc.drop_null(b[key])
            x = x.filter(pc.is_in(x, value_set=_c))
            vc = pc.value_counts(x)
            return pa.table({key: vc.field("values"),
                             "__cnt": pc.cast(vc.field("counts"),
                                              pa.int64())})

        exact_tbls = [t for t in ray.get(
            left.select_columns([key]).map_batches(
                count_cands, batch_format="pyarrow")
            .materialize().to_arrow_refs()) if t.num_rows]
        folded = pa.concat_tables(exact_tbls).group_by(key) \
            .aggregate([("__cnt", "sum")]) if exact_tbls else None
        hot_vals = folded.filter(
            pc.greater_equal(folded["__cnt_sum"], hot_count)
        )[key].combine_chunks() if folded is not None else pa.array([], kt)
    else:
        hot_vals = pa.array([], kt)
    LAST_SKEW_JOIN_HOT_KEYS[:] = hot_vals.to_pylist()
    if len(hot_vals) > SKEW_JOIN_MAX_HOT_KEYS:
        raise ValueError(
            f"skew_join detected {len(hot_vals)} hot keys (cap "
            f"{SKEW_JOIN_MAX_HOT_KEYS}); raise hot_count — this input is "
            "not skew-shaped at that threshold")

    if len(hot_vals) == 0:
        # no hub: degrade to the ordinary planner (broadcast-vs-shuffle
        # from metadata), not a forced hash join
        return planned_join(left, right, keys)

    def split(want_hot: bool):
        def f(b: pa.Table) -> pa.Table:
            m = pc.is_in(b[key], value_set=hot_vals)
            return b.filter(m if want_hot else
                            pc.not_equal(pc.fill_null(m, False), True))
        return f

    right_hot = right.map_batches(split(True), batch_format="pyarrow") \
                     .materialize()
    hot_table = pa.concat_tables(
        [t for t in ray.get(right_hot.to_arrow_refs()) if t.num_rows]
        or [pa.schema(list(zip(right_hot.schema().names,
                               right_hot.schema().types))).empty_table()])
    hot_part = broadcast_join(
        left.map_batches(split(True), batch_format="pyarrow"),
        hot_table, keys)
    # planned_join, not a bare hash join: when hot keys cover (nearly) the
    # whole input the cold tail is a sliver whose rows hash to few shuffle
    # partitions, and Ray's join aggregator crashes on the schema-less
    # EMPTY partitions that leaves behind; the planner's broadcast path
    # (right side here is dim-like by contract) avoids the exchange
    # entirely, and falls back to the hash join only for a genuinely large
    # right side.
    cold_part = planned_join(
        _drop_empty_blocks(left.map_batches(split(False),
                                            batch_format="pyarrow")),
        right, keys)
    return hot_part.union(cold_part)


# ---------------------------------------------------------------------------
# Union with padding (Q7)
# ---------------------------------------------------------------------------

def union_pad(
    *datasets: rd.Dataset, schemas: Optional[List[pa.Schema]] = None
) -> rd.Dataset:
    """UNION ALL with column padding (reference ``results_union``,
    ``conversion_utils.py:92-131``): the united schema is the name-sorted
    union of all columns; branches missing a column get typed nulls.

    Pass ``schemas`` when the branch schemas are statically known (e.g.
    SPARQL solution relations: every column is a string term) — each
    ``ds.schema()`` probe on a LAZY branch executes its whole prefix once,
    so a 2-branch union without the hint runs every branch twice."""
    schemas = schemas or [ds.schema() for ds in datasets]
    fields: Dict[str, pa.DataType] = {}
    for s in schemas:
        for name, typ in zip(s.names, s.types):
            fields.setdefault(name, typ)
    names = sorted(fields)
    target = pa.schema([pa.field(n, fields[n]) for n in names])

    def pad(batch: pa.Table) -> pa.Table:
        n = len(batch)
        arrays = []
        for f in target:
            if f.name in batch.column_names:
                arrays.append(pc.cast(batch[f.name], f.type))
            else:
                arrays.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(arrays, schema=target)

    padded = [ds.map_batches(pad, batch_format="pyarrow") for ds in datasets]
    out = padded[0]
    for other in padded[1:]:
        out = out.union(other)
    return out


# ---------------------------------------------------------------------------
# Aggregation (Q9, Q10)
# ---------------------------------------------------------------------------

def grouped_agg(
    ds: rd.Dataset,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    count_as: Optional[str] = None,
    in_schema: Optional[pa.Schema] = None,
) -> rd.Dataset:
    """GROUP BY with map-side combine: each batch is pre-aggregated locally
    (one row per group per block), then the raw-task hash exchange merges
    partials (one vectorized ``pa.group_by`` per partition — NOT Ray's
    sort-based groupby, whose driver coordination measured an ~8 s floor;
    the switch matters for HIGH-cardinality keys like windowed aggregates).
    The shuffle moves O(blocks × groups) rows instead of the whole input.

    Output columns: ``keys + sums + mins + maxs [+ count_as]`` (sums/mins/
    maxs keep their input column names; count_as is a row count)."""
    from .stages.dedup import hash_group_exchange

    keys, sums, mins, maxs = list(keys), list(sums), list(mins), list(maxs)
    cnt_col = "__cnt" if count_as else None

    def _agg_once(gb: pa.Table) -> pa.Table:
        aggs = (
            [(c, "sum") for c in sums]
            + [(c, "min") for c in mins]
            + [(c, "max") for c in maxs]
            + ([(cnt_col, "sum")] if cnt_col else [])
        )
        out = gb.group_by(keys).aggregate(aggs)
        ren = {f"{c}_sum": c for c in sums}
        ren.update({f"{c}_min": c for c in mins})
        ren.update({f"{c}_max": c for c in maxs})
        if cnt_col:
            ren[f"{cnt_col}_sum"] = cnt_col
        return out.rename_columns([ren.get(n, n) for n in out.column_names])

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        gb = batch.select(keys + sums + mins + maxs)
        if cnt_col:
            gb = gb.append_column(cnt_col, pa.array(np.ones(len(batch), np.int64)))
        return _agg_once(gb)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    # output schema derived from the combine applied to a TYPED empty input
    # (pa group_by types are deterministic; no data touched).  ``in_schema``
    # skips the probe — required when ``ds`` may be empty (schema() is None)
    s = in_schema if in_schema is not None else ds.schema()
    empty_in = pa.schema(
        [(n, t) for n, t in zip(s.names, s.types) if n in set(keys + sums + mins + maxs)]
    ).empty_table()
    if cnt_col:
        empty_in = empty_in.append_column(cnt_col, pa.array([], pa.int64()))
    final_names = keys + sums + mins + maxs + ([count_as] if count_as else [])

    def finalize(part: pa.Table) -> pa.Table:
        out = _agg_once(part)
        if cnt_col:
            out = out.rename_columns(
                [count_as if n == cnt_col else n for n in out.column_names]
            )
        return out.select(final_names)

    out_schema = finalize(empty_in).schema
    return hash_group_exchange(partials, keys, finalize, out_schema)


def count_distinct(ds: rd.Dataset, keys: Sequence[str], col: str, alias: str) -> rd.Dataset:
    """COUNT(DISTINCT col) GROUP BY keys (reference DISTINCT-in-aggregate,
    ``query_conversions.py:57-81``) as a two-stage exchange: global distinct
    on (keys, col) via the hash-bucket dedup, then a count per key group —
    never holds a per-group value set in one worker's memory."""
    keys = list(keys)
    dist = distinct_on(ds.select_columns(keys + [col]), keys + [col])
    return grouped_agg(dist, keys, count_as=alias)


def group_concat(
    ds: rd.Dataset,
    keys: Sequence[str],
    col: str,
    alias: str,
    sep: str = ",",
) -> rd.Dataset:
    """GROUP_CONCAT with deterministic (sorted) in-group order — Ray block
    order is nondeterministic, so an explicit sort inside the group is the
    only way to stable output (reference relies on SQL engine ordering).

    Runs through the streaming hash exchange (key groups arrive complete in
    one partition) with ONE vectorized polars sort + group_by + list-join
    per partition — no per-group Python, no sort-based Ray groupby
    (VERDICT round-2 item 6)."""
    from .stages.dedup import _pl, hash_group_exchange

    keys = list(keys)
    s = ds.schema()
    if s is None:
        # fully-empty schemaless input: no groups, so the concat relation
        # is empty (string-typed keys — nothing downstream can observe
        # the type of a zero-row column it never joins a row against)
        return rd.from_arrow(pa.schema(
            [(k, pa.string()) for k in keys]
            + [(alias, pa.string())]).empty_table())
    out_schema = pa.schema(
        [(k, s.types[s.names.index(k)]) for k in keys] + [(alias, pa.string())]
    )

    def concat_part(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part.select(keys + [col]))
        agg = (
            df.sort(keys + [col])
              .group_by(keys, maintain_order=True)
              .agg(pl.col(col).drop_nulls().cast(pl.String).alias("__v"))
              .with_columns(pl.col("__v").list.join(sep).alias(alias))
              .drop("__v")
        )
        return agg.to_arrow().cast(out_schema)

    return hash_group_exchange(ds.select_columns(keys + [col]), keys,
                               concat_part, out_schema)


# ---------------------------------------------------------------------------
# Order / top-k / distinct / limit (Q12, Q13)
# ---------------------------------------------------------------------------

def topk(
    ds: rd.Dataset,
    keys: Sequence[str],
    k: int,
    descending: bool | Sequence[bool] = True,
) -> rd.Dataset:
    """ORDER BY ... LIMIT k without a global sort: each block keeps its local
    top-k (vectorized ``sort_by`` + slice), then the reduced set (blocks × k
    rows) takes the global ``sort().limit(k)``. At 100 TB the global sort
    only ever sees the partials."""
    keys = list(keys)
    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    order = [(c, "descending" if d else "ascending") for c, d in zip(keys, descending)]

    def local(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        return batch.sort_by(order).slice(0, k)

    partial = ds.map_batches(local, batch_format="pyarrow").materialize()
    # the surviving set is ≤ blocks × k rows; when that is ONE task's worth,
    # a single remote sort+slice replaces the global sort exchange (whose
    # sample+shuffle rounds cost seconds even on tiny inputs — measured 4.1s
    # for a 30-row final reduce).  Large partial sets (huge k or block
    # counts) still take the distributed sort.
    if partial.count() <= 2_000_000:
        out = ray.remote(_topk_single).remote(order, k, *partial.to_arrow_refs())
        return rd.from_arrow_refs([out])
    return partial.sort(keys, descending=list(descending)).limit(k)


def _topk_single(order, k: int, *tables: pa.Table) -> pa.Table:
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return tables[0].slice(0, 0) if tables else pa.table({})
    return pa.concat_tables(live).combine_chunks().sort_by(order).slice(0, k)


def topk_offset(
    ds: rd.Dataset,
    keys: Sequence[str],
    k: int,
    offset: int,
    descending: bool | Sequence[bool] = True,
) -> rd.Dataset:
    """ORDER BY … LIMIT k OFFSET n (reference ``queryProject`` slice
    lowering, ``query_conversions.py:292-319``): the distributed part is a
    partial top-(n+k) per block + global sort over the partials only; the
    offset drop then touches ≤ n+k rows — never a full-data skip."""
    top = topk(ds, keys, k + offset, descending=descending)
    mat = top.materialize()
    tables = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
    if not tables:
        # result smaller than OFFSET / no matches: typed empty table, not a
        # concat_tables([]) ArrowInvalid
        s = mat.schema()
        return rd.from_arrow(pa.schema(list(zip(s.names, s.types))).empty_table())
    tbl = pa.concat_tables(tables)
    return rd.from_arrow(tbl.slice(offset, k))


def grouped_topk(
    ds: rd.Dataset,
    keys: Sequence[str],
    order_by: Sequence[Tuple[str, bool]],
    k: int,
    keep: Sequence[str] = (),
) -> rd.Dataset:
    """Per-GROUP top-k (``row_number() OVER (PARTITION BY keys ORDER BY …)
    <= k``) — the per-domain / per-source sampling primitive of corpus
    curation.  ``order_by``: (column, descending) pairs; add a unique
    tiebreak column for deterministic output.  ``keep``: extra payload
    columns carried through with the winning rows.

    Scale shape: a per-batch combiner keeps each group's local top-k (one
    vectorized polars sort + group head per batch — never more than
    k rows per (group, batch) move), then the hash exchange co-locates
    groups and one final sort+head per partition finishes.  No Ray sort, no
    per-group Python."""
    from .stages.dedup import _pl, hash_group_exchange

    keys = list(keys)
    cols = keys + [c for c, _ in order_by if c not in keys]
    cols += [c for c in keep if c not in cols]
    s = ds.schema()
    out_schema = pa.schema([(c, s.types[s.names.index(c)]) for c in cols])
    sort_cols = [c for c, _ in order_by]
    desc = [d for _, d in order_by]

    def local_head(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        pl = _pl()
        df = pl.from_arrow(batch.select(cols))
        out = df.sort(sort_cols, descending=desc).group_by(keys).head(k)
        return out.to_arrow().cast(out_schema)

    partials = ds.map_batches(local_head, batch_format="pyarrow")
    return hash_group_exchange(partials, keys, local_head, out_schema)


def cross_join(left: rd.Dataset, right: rd.Dataset, broadcast_limit: int = 100_000) -> rd.Dataset:
    """Cartesian product (disconnected BGP / reference ``queryJoin`` FROM-list
    merge, ``query_conversions.py:246-269``): the smaller side is broadcast
    once and each left batch emits batch × small via vectorized take.
    Refuses (loudly) when the build side exceeds ``broadcast_limit`` — a
    large×large cartesian product is a modeling error at any scale."""
    mat = right.materialize()
    m = mat.count()
    if m > broadcast_limit:
        raise ValueError(
            f"cross_join build side has {m} rows (> {broadcast_limit}); "
            "a large-large cartesian product would be quadratic — restructure the query"
        )
    tables = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
    if not tables:
        s = mat.schema()
        tables = [pa.schema(list(zip(s.names, s.types))).empty_table()]
    small = pa.concat_tables(tables).combine_chunks()
    small_ref = ray.put(small)

    def cross(batch: pa.Table, _ref=small_ref) -> pa.Table:
        rhs = ray.get(_ref)
        n, m = len(batch), len(rhs)
        if n == 0 or m == 0:
            cols = {c: batch[c].take(pa.array([], pa.int64())) for c in batch.column_names}
            cols.update({c: rhs[c].take(pa.array([], pa.int64())) for c in rhs.column_names})
            return pa.table(cols)
        li = pa.array(np.repeat(np.arange(n), m))
        ri = pa.array(np.tile(np.arange(m), n))
        cols = {c: batch[c].take(li) for c in batch.column_names}
        cols.update({c: rhs[c].take(ri) for c in rhs.column_names})
        return pa.table(cols)

    return left.map_batches(cross, batch_format="pyarrow")


def distinct(ds: rd.Dataset, keys: Optional[Sequence[str]] = None) -> rd.Dataset:
    """SELECT DISTINCT (reference Q12): projection + global exact distinct
    via the hash-bucket exchange."""
    if keys is None:
        keys = ds.schema().names
    return distinct_on(ds.select_columns(list(keys)), list(keys))


_KNUTH = 2654435761  # Knuth multiplicative hash constant


def grouped_quantiles_disc(
    ds: rd.Dataset, keys: Sequence[str], col: str, qs: Sequence[float]
) -> rd.Dataset:
    """Per-group exact discrete quantiles (``quantile_disc`` semantics,
    rank = ceil(q·n) within each group): per-batch (key, value) count
    combine → grouped-count exchange → per-key histogram walk, keyed on the
    GROUP so no driver materialization at any cardinality (contrast
    :func:`quantiles_disc`, whose global histogram lands on the driver)."""
    from .stages.dedup import _pl, hash_group_exchange

    keys = list(keys)
    s = ds.schema()
    tmap = dict(zip(s.names, s.types))
    vt = tmap[col]
    out_schema = pa.schema(
        [(k, tmap[k]) for k in keys] + [("q", pa.float64()), ("value", vt)]
    )

    def partial(b: pa.Table) -> pa.Table:
        sel = b.select(keys + [col]).drop_null()
        gb = sel.append_column("__cnt", pa.array(np.ones(len(sel), np.int64)))
        out = gb.group_by(keys + [col]).aggregate([("__cnt", "sum")])
        return out.rename_columns(keys + [col, "__cnt"])

    hist = grouped_agg(
        ds.select_columns(keys + [col]).map_batches(partial, batch_format="pyarrow"),
        keys + [col], sums=["__cnt"],
        in_schema=pa.schema([(k, tmap[k]) for k in keys]
                            + [(col, vt), ("__cnt", pa.int64())]),
    )

    def reduce_fn(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part).sort(keys + [col])
        frames = []
        for q in qs:
            f = (
                df.with_columns(
                    pl.col("__cnt").cum_sum().over(keys).alias("__cum"),
                    (pl.col("__cnt").sum().over(keys) * q).ceil()
                    .clip(lower_bound=1).alias("__rank"),
                )
                .filter(pl.col("__cum") >= pl.col("__rank"))
                .group_by(keys, maintain_order=True)
                .agg(pl.col(col).first().alias("value"))
                .with_columns(pl.lit(float(q), dtype=pl.Float64).alias("q"))
                .select(keys + ["q", "value"])
            )
            frames.append(f)
        return pl.concat(frames).to_arrow().cast(out_schema)

    return hash_group_exchange(hist, keys, reduce_fn, out_schema)


# ---------------------------------------------------------------------------
# Bloom-filter semi join: scan-side pushdown before the exact join
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 20          # 1 Mi bits = 128 KiB per filter
_BLOOM_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _bloom_positions(keys: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized 64-bit mix (splitmix-style) → bit positions."""
    x = keys.astype(np.uint64) + np.uint64(seed)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(_BLOOM_BITS)).astype(np.int64)


def _bloom_from_block(tbl: pa.Table, key: str) -> np.ndarray:
    bits = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
    ks = pc.drop_null(tbl[key]).to_numpy(zero_copy_only=False)
    for seed in _BLOOM_SEEDS:
        pos = _bloom_positions(ks, seed)
        np.bitwise_or.at(bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    return bits


def bloom_semi_join(
    left: rd.Dataset, right: rd.Dataset, on: Sequence[str],
    right_on: Optional[Sequence[str]] = None, **kw,
) -> rd.Dataset:
    """Semi join with a Bloom-filter pushdown: the build side's integer key
    column folds into a 128 KiB bit array (per-block partials OR-reduced in
    a task tree, driver holds one ref), every probe batch drops non-members
    BEFORE the exact semi join — at web scale the filter kills the bulk of
    the probe stream at the scan, so the join's exchange moves only likely
    matches.  False positives are removed by the exact join; the result
    equals :func:`semi_join` exactly.  Single integer key only (the common
    fact→dim case); compose hashes for multi-key."""
    rkey = list(right_on or on)[0]
    lkey = list(on)[0]

    mat = right.materialize()
    build = ray.remote(_bloom_from_block)
    orfold = ray.remote(_bloom_or)
    blooms = [build.remote(ref, rkey) for ref in mat.to_arrow_refs()]
    while len(blooms) > 1:  # OR-reduce tree keeps driver refs O(log n)
        blooms = [orfold.remote(*blooms[i:i + 8])
                  for i in range(0, len(blooms), 8)]
    bloom_ref = blooms[0] if blooms else ray.put(
        np.zeros(_BLOOM_BITS // 64, dtype=np.uint64))

    def probe(batch: pa.Table, _ref=bloom_ref) -> pa.Table:
        if len(batch) == 0:
            return batch
        bits = ray.get(_ref)
        valid = pc.is_valid(batch[lkey]).to_numpy(zero_copy_only=False)
        # fill nulls BEFORE to_numpy: a nullable int column otherwise comes
        # back float64 (NaN-backed), losing precision above 2^53 and making
        # negative-key float→uint64 conversion undefined — the probe would
        # hash differently than the build side's int64 path and silently
        # drop matching rows (false NEGATIVES)
        kk = pc.fill_null(batch[lkey], 0).to_numpy(zero_copy_only=False)
        member = valid.copy()
        for seed in _BLOOM_SEEDS:
            pos = _bloom_positions(kk, seed)
            member &= ((bits[pos >> 6] >> (pos & 63).astype(np.uint64))
                       & np.uint64(1)) > 0
        return batch.filter(pa.array(member))

    filtered = left.map_batches(probe, batch_format="pyarrow")
    return planned_join(filtered, mat, on=on, right_on=right_on,
                        join_type="left_semi", **kw)


def _bloom_or(*parts: np.ndarray) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        out |= p
    return out


def stratified_sample(
    ds: rd.Dataset,
    strata: Sequence[str],
    n_per_stratum: int,
    id_col: str,
    keep: Sequence[str] = (),
) -> rd.Dataset:
    """Deterministic stratified sample: ``n_per_stratum`` rows per stratum,
    chosen by a multiplicative hash of ``id_col`` (uniform, reproducible,
    and SQL-expressible: ``(id * 2654435761) % 2^32`` — exact for ids <
    2^32, which a sharded-id scheme satisfies per shard).

    Composition: one vectorized hash column + :func:`grouped_topk` (per-batch
    local head, hash exchange, final head) — the sample never requires a
    global sort or a driver materialization; each stratum moves at most
    ``n_per_stratum`` rows per input block."""
    def add_hash(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(1 << 32)
        return b.append_column("__h", pa.array(h.astype(np.int64)))

    out = grouped_topk(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        list(strata),
        [("__h", False), (id_col, False)],
        n_per_stratum,
        keep=[id_col, *keep],
    )
    names = [c for c in out.schema().names if c != "__h"]
    return out.select_columns(names)


def quantiles_disc(ds: rd.Dataset, col: str, qs: Sequence[float]) -> rd.Dataset:
    """Exact discrete quantiles (DuckDB ``quantile_disc`` semantics: the
    value at 1-indexed rank ``ceil(q*n)``) for a bounded-cardinality numeric
    column, via a distributed value histogram: per-batch ``value_counts``
    (combiner) → grouped count exchange keyed on the value → driver-side
    cumulative walk over the SMALL (one row per distinct value) histogram.

    Scale note: cost is O(distinct values), independent of row count — right
    for discrete columns (lengths, scores, counts).  For continuous doubles
    at corpus scale, bin first (``floor(x/w)*w``) and accept bin resolution,
    or run a two-pass refine; this operator refuses nothing but the
    histogram materialization is the caller's cardinality contract."""
    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({col: b[col], "__cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(pc.drop_null(b[col]))
        return pa.table({col: vc.field("values"), "__cnt": pc.cast(vc.field("counts"), pa.int64())})

    vt = ds.schema().types[ds.schema().names.index(col)]
    hist = grouped_agg(
        ds.select_columns([col]).map_batches(partial, batch_format="pyarrow"),
        [col], sums=["__cnt"],
        in_schema=pa.schema([(col, vt), ("__cnt", pa.int64())]),
    )
    tables = [t for t in ray.get(hist.materialize().to_arrow_refs()) if t.num_rows]
    if not tables:
        return rd.from_arrow(pa.table({"q": pa.array([], pa.float64()),
                                       "value": pa.array([], vt)}))
    h = pa.concat_tables(tables).combine_chunks().sort_by(col)
    counts = h["__cnt"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    vals = h[col]
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, int(math.ceil(q * n)))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(float(q))
        out_v.append(vals[idx].as_py())
    return rd.from_arrow(pa.table({"q": pa.array(out_q, pa.float64()),
                                   "value": pa.array(out_v, vt)}))


def quantiles_cont(ds: rd.Dataset, col: str, qs: Sequence[float]) -> rd.Dataset:
    """Exact INTERPOLATED quantiles (DuckDB ``quantile_cont`` semantics:
    linear interpolation between the order statistics at 0-indexed positions
    ``floor/ceil(q*(n-1))``).  Same distributed value-histogram shape as
    :func:`quantiles_disc` — cost O(distinct values), the cardinality
    contract is the caller's — only the driver-side walk differs: it finds
    BOTH bracketing order statistics and lerps ``lo + (pos-lo)*(hi-lo)``
    with the operand order DuckDB uses, so doubles match bit-for-bit."""
    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({col: b[col], "__cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(pc.drop_null(b[col]))
        return pa.table({col: vc.field("values"), "__cnt": pc.cast(vc.field("counts"), pa.int64())})

    vt = ds.schema().types[ds.schema().names.index(col)]
    hist = grouped_agg(
        ds.select_columns([col]).map_batches(partial, batch_format="pyarrow"),
        [col], sums=["__cnt"],
        in_schema=pa.schema([(col, vt), ("__cnt", pa.int64())]),
    )
    tables = [t for t in ray.get(hist.materialize().to_arrow_refs()) if t.num_rows]
    if not tables:
        return rd.from_arrow(pa.table({"q": pa.array([], pa.float64()),
                                       "value": pa.array([], pa.float64())}))
    h = pa.concat_tables(tables).combine_chunks().sort_by(col)
    cum = np.cumsum(h["__cnt"].to_numpy(zero_copy_only=False))
    n = int(cum[-1])
    vals = h[col]

    def order_stat(i: int) -> float:
        return float(vals[int(np.searchsorted(cum, i + 1, side="left"))].as_py())

    out_q, out_v = [], []
    for q in qs:
        pos = q * (n - 1)
        lo_i = int(math.floor(pos))
        hi_i = int(math.ceil(pos))
        lo = order_stat(lo_i)
        v = lo if hi_i == lo_i else lo + (pos - lo_i) * (order_stat(hi_i) - lo)
        out_q.append(float(q))
        out_v.append(v)
    return rd.from_arrow(pa.table({"q": pa.array(out_q, pa.float64()),
                                   "value": pa.array(out_v, pa.float64())}))


def _block_num_rows(t: pa.Table) -> int:
    return t.num_rows


def _block_enumerate(t: pa.Table, offset: int, alias: str) -> pa.Table:
    rn = pa.array(np.arange(offset + 1, offset + 1 + t.num_rows, dtype=np.int64))
    return t.append_column(alias, rn)


def _sort_enumerate_one(keys, desc, alias, *blocks: pa.Table) -> pa.Table:
    """One-task sort + ROW_NUMBER for small inputs (vocab tables etc.):
    a single pyarrow sort beats the range-partitioned sample sort's
    multi-stage fixed overhead by ~1 s at these sizes."""
    cap_threads()
    live = [b for b in blocks if b is not None and b.num_rows] or [blocks[0]]
    t = pa.concat_tables(live).combine_chunks()
    order = pc.sort_indices(
        t, sort_keys=[(k, "descending" if d else "ascending")
                      for k, d in zip(keys, desc)])
    return _block_enumerate(t.take(order), 0, alias)


# Inputs at or under this row count enumerate in ONE task instead of the
# sample sort — a 2M-row single-task sort is subsecond while the sample
# sort's boundary stages cost ~1 s regardless of input size.
_ENUM_ONE_TASK_ROWS = 2_000_000


def global_enumerate(
    ds: rd.Dataset,
    keys: Sequence[str],
    descending: Optional[Sequence[bool]] = None,
    alias: str = "row_num",
) -> rd.Dataset:
    """Global ``ROW_NUMBER() OVER (ORDER BY keys)`` — a total enumeration of
    the WHOLE dataset, not a top-k.  Ray's range-partitioned sample sort
    leaves the materialized blocks in global key order; each block is then
    enumerated locally and shifted by a prefix sum of block row COUNTS.
    Only the O(blocks) count integers ever reach the driver — rows stay in
    the object store (count + enumerate are per-block Ray tasks on the
    already-materialized refs, zero re-shuffle).  ``keys`` should be a
    total order (include a unique tiebreak column) or the enumeration is
    nondeterministic within ties, exactly like SQL ROW_NUMBER."""
    keys = list(keys)
    desc = list(descending) if descending is not None else [False] * len(keys)
    mat = ds.materialize()
    if mat.count() <= _ENUM_ONE_TASK_ROWS:
        refs = [r for r in mat.to_arrow_refs()]
        if not refs:
            return mat
        one = ray.remote(_sort_enumerate_one)
        return rd.from_arrow_refs([one.remote(keys, desc, alias, *refs)])
    s = mat.sort(keys, descending=desc).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return s
    counter = ray.remote(_block_num_rows)
    counts = ray.get([counter.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts[:-1], dtype=np.int64)]) \
        if len(counts) > 1 else np.array([0], dtype=np.int64)
    enum = ray.remote(_block_enumerate)
    out = [enum.remote(r, int(o), alias) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# Temporal joins the Dataset API lacks: as-of and range (band) joins.
# Both ride the two-sided co-partitioned hash exchange
# (stages/dedup.cogroup_exchange); the per-bucket kernel is one vectorized
# polars call over complete key groups — no per-row Python, no sort-based
# Ray Data shuffle.  Partitioning assumption: the equality key spreads the
# data (one key's rows must fit a reduce task); a band join WITHOUT an
# equality key needs time-bucketing instead (see range_join docstring).
# ---------------------------------------------------------------------------

def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    strategy: str = "backward",
    right_keep: Optional[Sequence[str]] = None,
) -> rd.Dataset:
    """INNER as-of join: for each left row, the single right row of the same
    ``by`` key with the greatest ``right_on`` <= ``left_on`` (``backward``;
    ``forward`` = smallest >=).  Matches DuckDB ``ASOF JOIN`` semantics.

    Plan: co-partition both sides on the equality key through the streaming
    hash exchange, then per bucket ONE ``polars.join_asof`` (sort by time +
    binary search per group, fully vectorized).  Unmatched left rows drop
    (inner).  ``right_keep`` selects which right columns survive (default:
    the as-of time column only — deterministic even when several right rows
    tie on the match time)."""
    from .stages.dedup import _pl, cogroup_exchange

    ls = left.schema()
    rs = right.schema()
    if right_keep is not None:
        collide = [c for c in right_keep if c in ls.names]
        if collide:
            raise ValueError(
                f"asof_join right_keep columns {collide} collide with left "
                "column names — rename them on the right side first")
    keep = [c for c in (list(right_keep) if right_keep is not None else [right_on])
            if c not in ls.names]
    rtypes = dict(zip(rs.names, rs.types))
    out_fields = list(zip(ls.names, ls.types)) + [(c, rtypes[c]) for c in keep]
    out_schema = pa.schema(out_fields)
    lcols = list(ls.names)

    def reduce_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0:
            return out_schema.empty_table()
        import warnings

        warnings.filterwarnings("ignore", message="Sortedness")
        pl = _pl()
        ldf = pl.from_arrow(lt).sort(left_on)
        # guard column collisions: right columns renamed with a private
        # prefix, mapped back on output
        ren = {c: f"__r_{c}" for c in rt.column_names}
        rdf = pl.from_arrow(rt).rename(ren).sort(f"__r_{right_on}")
        out = ldf.join_asof(
            rdf,
            left_on=left_on,
            right_on=f"__r_{right_on}",
            by_left=left_by,
            by_right=f"__r_{right_by}",
            strategy=strategy,
        )
        # inner semantics: drop left rows with no as-of match (matched time
        # is never null — null right times are excluded by the sort+search)
        out = out.filter(pl.col(f"__r_{right_on}").is_not_null())
        out = out.select(lcols + [f"__r_{c}" for c in keep]).rename(
            {f"__r_{c}": c for c in keep}
        )
        return out.to_arrow().cast(out_schema)

    return cogroup_exchange(
        left, [left_by], right, [right_by], reduce_fn, out_schema
    )


def interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_by: str,
    right_by: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
) -> rd.Dataset:
    """Keyed INTERVAL OVERLAP join: all (left, right) pairs of the same
    ``by`` key whose closed intervals intersect (``l.start <= r.end AND
    r.start <= l.end``).  NOT expressible as :func:`range_join` — the
    overlap predicate's bounds vary per row (each side has its own
    duration), where a band join needs one fixed [lower, upper].

    Same plan as the other interval-family operators: co-partition on the
    equality key through :func:`cogroup_exchange`, per bucket one
    vectorized polars equi-join on the key + a two-sided Arrow filter —
    pair blowup bounded by real matches per key, never the corpus."""
    from .stages.dedup import _pl, cogroup_exchange

    ls, rs = left.schema(), right.schema()
    lnames = set(ls.names)
    out_fields = list(zip(ls.names, ls.types)) + [
        (n, t) for n, t in zip(rs.names, rs.types)
        if n not in lnames and n != right_by
    ]
    out_schema = pa.schema(out_fields)
    # both endpoints always ship into the reduce (renamed with the private
    # __r_ prefix, so name collisions with left columns are harmless)
    rkeep = list(dict.fromkeys(
        [n for n in rs.names if (n not in lnames and n != right_by) or n == right_by]
        + [right_start, right_end]
    ))

    def reduce_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        pl = _pl()
        ldf = pl.from_arrow(lt)
        ren = {c: f"__r_{c}" for c in rt.column_names}
        rdf = pl.from_arrow(rt.select(rkeep)).rename(ren)
        out = ldf.join(
            rdf, left_on=left_by, right_on=f"__r_{right_by}", how="inner",
            coalesce=True,
        )
        out = out.filter(
            (pl.col(left_start) <= pl.col(f"__r_{right_end}"))
            & (pl.col(f"__r_{right_start}") <= pl.col(left_end)))
        keep = [c for c in out_schema.names if c in ldf.columns]
        out = out.select(
            keep + [f"__r_{c}" for c in out_schema.names if c not in keep]
        ).rename({f"__r_{c}": c for c in out_schema.names if c not in keep})
        return out.select(out_schema.names).to_arrow().cast(out_schema)

    return cogroup_exchange(
        left, [left_by], right, [right_by], reduce_fn, out_schema
    )


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    lower,
    upper,
) -> rd.Dataset:
    """INNER range (band) join: all (left, right) pairs of the same ``by``
    key with ``lower <= left_on - right_on <= upper`` (datetime columns:
    ``lower``/``upper`` are ``numpy.timedelta64``-coercible).

    Plan: co-partition on the equality key, then per bucket a vectorized
    polars equi-join on the key followed by an Arrow band filter — the
    row-pair blowup is bounded by real matches per key, never the corpus.
    For a band join with NO equality key, derive one: bucket both sides by
    ``floor(time / band_width)`` and join each left bucket to right buckets
    {b-1, b} (emit right twice, shifted), then apply the same band filter —
    the composition is this operator over the synthetic bucket key."""
    from .stages.dedup import _pl, cogroup_exchange

    ls = left.schema()
    rs = right.schema()
    lnames = set(ls.names)
    # right_by is redundant on output (it equals left_by by the join)
    out_fields = list(zip(ls.names, ls.types)) + [
        (n, t) for n, t in zip(rs.names, rs.types)
        if n not in lnames and n != right_by
    ]
    out_schema = pa.schema(out_fields)
    # right_on must ALWAYS ship into the reduce (the band filter references
    # __r_<right_on> even when its name collides with a left column — it is
    # renamed with the private prefix so the collision is harmless; a
    # colliding right_on is simply absent from the output schema)
    rkeep = list(dict.fromkeys(
        [n for n in rs.names if (n not in lnames and n != right_by) or n == right_by]
        + [right_on]
    ))

    def reduce_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        pl = _pl()
        ldf = pl.from_arrow(lt)
        ren = {c: f"__r_{c}" for c in rt.column_names}
        rdf = pl.from_arrow(rt.select(rkeep)).rename(ren)
        out = ldf.join(
            rdf, left_on=left_by, right_on=f"__r_{right_by}", how="inner",
            coalesce=True,
        )
        delta = pl.col(left_on) - pl.col(f"__r_{right_on}")
        out = out.filter((delta >= lower) & (delta <= upper))
        keep = [c for c in out_schema.names if c in ldf.columns]
        out = out.select(
            keep + [f"__r_{c}" for c in out_schema.names if c not in keep]
        ).rename({f"__r_{c}": c for c in out_schema.names if c not in keep})
        return out.select(out_schema.names).to_arrow().cast(out_schema)

    return cogroup_exchange(
        left, [left_by], right, [right_by], reduce_fn, out_schema
    )
