"""Entity canonicalization: duplicate-entity merging with union-find and
deterministic min-IRI canonical selection, plus the salted-shuffle utilities
that defuse head-entity skew (BASELINE north_star).

Design for 10^12-doc scale:

- Merge-edge discovery runs over the (small) alias dictionary / entity
  evidence, NOT over the corpus: mention groups produce local edges; only the
  edge list reaches the driver's union-find (SURVEY.md §7.4).  For edge lists
  too large for one node, ``label_propagation_components`` provides a
  shuffle-based min-label fixpoint.
- The canonical map (entity → min-IRI-of-component) is broadcast with
  ``ray.put`` and applied inside ``map_batches`` via dictionary-encoding:
  each batch rewrites only its *distinct* values — O(distinct) Python work,
  O(n) vectorized recompose — instead of a corpus-wide shuffle join.
- ``salted_groupby_count`` shows the two-stage (salt → de-salt) aggregation
  used wherever a groupby key follows a power law (head entities appear in a
  large fraction of rows).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..aliases import UnionFind
from ..workerenv import cap_threads


def components_union_find(edges: Iterable[Tuple[str, str]]) -> Dict[str, str]:
    """Driver-side union-find; returns node → component-min (identity omitted).

    Use when the edge list is small relative to the corpus (the common case:
    edges are per-entity, not per-document)."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return {n: r for n in list(uf.parent) if (r := uf.find(n)) != n}


_LOCAL_CC_MAX_EDGES = 200_000


def _union_find_local(*tables: pa.Table) -> pa.Table:
    """One-task connected components (path-halving union-find by min
    label): exact same (node, label=component minimum) contract as the
    distributed propagation, for edge sets that fit one worker."""
    cap_threads()
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return pa.table({"node": pa.array([], pa.string()),
                         "label": pa.array([], pa.string())})
    tbl = pa.concat_tables(live)
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    a_col, b_col = tbl["a"].to_pylist(), tbl["b"].to_pylist()
    for a, b in zip(a_col, b_col):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN so the root IS the component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted(set(a_col) | set(b_col))
    typ = tbl.schema.field("a").type
    return pa.table({"node": pa.array(nodes, typ),
                     "label": pa.array([find(n) for n in nodes], typ)})


def label_propagation_components(
    edges: rd.Dataset, max_iters: int = 20
) -> rd.Dataset:
    """Distributed connected components over an edge Dataset ``(a, b)`` via
    iterative min-label propagation — every round is a pair of keyed JOINS
    plus a grouped min, and the driver only ever sees a change COUNT (the
    label table itself never leaves the cluster, unlike a broadcast-dict
    fixpoint, which caps out at driver memory).

    Round: labels flow across edges in both directions
    (``label(x) = min(label(x), min over neighbours)``); converges in
    O(diameter) rounds — tiny for entity-dup graphs.  Returns Dataset
    ``(node, label)`` with label = component minimum."""
    from ..relational import grouped_agg, hash_join, planned_join

    def seed(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks() if isinstance(batch["a"], pa.ChunkedArray) else batch["a"]
        b = batch["b"].combine_chunks() if isinstance(batch["b"], pa.ChunkedArray) else batch["b"]
        node = pa.concat_arrays([a, b])
        label = pa.concat_arrays([pc.min_element_wise(a, b)] * 2)
        return pa.table({"node": node, "label": label})

    edges_m = edges.materialize()
    # small edge sets (count from block METADATA) take a one-task union-find
    # instead of O(diameter) join+exchange rounds whose fixed cost dominates
    # tiny inputs (measured: 8.6 s of exchanges for 6k edges vs ~0.5 s);
    # the distributed propagation below remains the 100 TB path — same
    # split as transitive_closure's _LOCAL_CLOSURE_MAX_EDGES
    if edges_m.count() <= _LOCAL_CC_MAX_EDGES:
        out = ray.remote(_union_find_local).remote(*edges_m.to_arrow_refs())
        return rd.from_arrow_refs([out])
    labels = grouped_agg(
        edges_m.map_batches(seed, batch_format="pyarrow"), ["node"], mins=["label"]
    ).materialize()

    for _ in range(max_iters):
        # labels cross each edge in both directions: (a,b) sends label(a)→b
        # and label(b)→a; planned_join broadcasts the smaller side per round
        la = planned_join(edges_m, labels, on=["a"], right_on=["node"]) \
            .map_batches(lambda t: t.select(["b", "label"]).rename_columns(["node", "label"]),
                         batch_format="pyarrow")
        lb = planned_join(edges_m, labels, on=["b"], right_on=["node"]) \
            .map_batches(lambda t: t.select(["a", "label"]).rename_columns(["node", "label"]),
                         batch_format="pyarrow")
        candidates = labels.union(la).union(lb)
        new = grouped_agg(candidates, ["node"], mins=["label"]).materialize()
        # convergence check WITHOUT pulling labels: count strict improvements
        improved = planned_join(
            new.map_batches(lambda t: t.rename_columns(["node", "new_label"]),
                            batch_format="pyarrow"),
            labels, on=["node"], right_on=["node"],
        ).map_batches(
            lambda t: t.filter(pc.less(t["new_label"], t["label"])),
            batch_format="pyarrow",
        )
        n_improved = improved.count()
        labels = new.map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        ).materialize()
        if n_improved == 0:
            break
    return labels


class CanonicalRewrite:
    """``map_batches`` callable rewriting IRI columns through the broadcast
    canonical map, vectorized via dictionary encoding (rewrite distinct
    values once per batch)."""

    def __init__(self, canon_ref, columns: Sequence[str]):
        self.canon: Dict[str, str] = (
            ray.get(canon_ref) if isinstance(canon_ref, ray.ObjectRef) else dict(canon_ref)
        )
        self.columns = list(columns)

    def _rewrite(self, arr: pa.Array) -> pa.Array:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        d = arr.dictionary_encode()
        vocab = d.dictionary.to_pylist()
        canon = self.canon
        new_vocab = pa.array([None if v is None else canon.get(v, v) for v in vocab], pa.string())
        return pc.take(new_vocab, d.indices)

    def __call__(self, batch: pa.Table) -> pa.Table:
        for c in self.columns:
            if c in batch.column_names:
                i = batch.column_names.index(c)
                batch = batch.set_column(i, c, self._rewrite(batch[c]))
        return batch


_SALT_COUNTER = None


def _next_salt(salt_buckets: int) -> int:
    """Per-process batch counter → salt value.  CRITICAL: the salt must be
    independent of the grouping KEY — a key-derived salt (hash(key) % B)
    sends every partial of a hot key to the SAME reducer, which is no salting
    at all.  A per-batch counter spreads a head key's partials across
    ``salt_buckets`` reducers because its rows arrive in many batches."""
    global _SALT_COUNTER
    if _SALT_COUNTER is None:
        import itertools

        _SALT_COUNTER = itertools.count()
    return next(_SALT_COUNTER) % salt_buckets


def _salted_partial(batch: pa.Table, key: str, count_col: str, salt_buckets: int) -> pa.Table:
    """Per-batch combiner: one output row per distinct key in the batch,
    salted with a key-independent per-batch value."""
    t = pa.table({key: batch[key]})
    g = t.group_by(key).aggregate([(key, "count")])
    counts = g[f"{key}_count"]
    salt_val = _next_salt(salt_buckets)
    salt = pa.array([salt_val] * len(g), pa.int32())
    return pa.table({key: g[key], "salt": salt, count_col: pc.cast(counts, pa.int64())})


def salted_groupby_count(
    ds: rd.Dataset, key: str, count_col: str = "n", salt_buckets: int = 32
) -> rd.Dataset:
    """Skew-safe ``groupby(key).count()``: pre-aggregate per (key, salt) —
    the key-independent salt spreads a head key's partials over up to
    ``salt_buckets`` reducers — then a tiny de-salt groupby sums the
    partials.  With the per-batch combiner the first shuffle already moves
    only one row per (key, batch); the salt bounds the worst reducer's input
    for aggregates whose partials don't shrink under combining."""

    def partial(batch: pa.Table) -> pa.Table:
        return _salted_partial(batch, key, count_col, salt_buckets)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    # de-salt through the raw hash exchange (NOT Ray's sort-based groupby,
    # whose driver coordination floor dominated this query at ~8 s): each
    # reduce partition holds complete key groups and sums the partials
    # vectorized.  A hot key's reducer input is bounded at one row per
    # (batch, salt) thanks to the combiner above.
    from .dedup import hash_group_exchange

    out_schema = pa.schema([(key, pa.string()), (count_col, pa.int64())])

    def desalt(part: pa.Table) -> pa.Table:
        g = part.select([key, count_col]).group_by(key).aggregate([(count_col, "sum")])
        return pa.table(
            {key: g[key], count_col: pc.cast(g[f"{count_col}_sum"], pa.int64())},
            schema=out_schema,
        )

    return hash_group_exchange(partials, [key], desalt, out_schema)
