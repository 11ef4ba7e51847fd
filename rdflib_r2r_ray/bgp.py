"""BGP (basic graph pattern) execution over a triples Dataset.

The reference compiles a SPARQL BGP to SQL by matching each triple pattern
against candidate TriplesMaps and joining on shared variables
(``rdflib_r2r/sql_converter.py:291-361``).  Here the graph is already
materialized as a ``(subj, pred, obj[, graph])`` Dataset, so a BGP executes
as: one filtered projection per pattern (constant positions → vectorized
equality filters; variable positions → projected columns) followed by hash
joins on shared variables — plus a union over the path-free alternatives
produced by ``paths.resolve_paths``.

Scale notes: pattern filters fuse with the scan (Arrow expressions, so Ray
pushes them down); join order follows the reference's presort heuristic —
most-selective (most-constant) patterns first — and every join is on raw
term columns.  For a pattern whose match set is small (e.g. bound
predicate over a rare term), pass ``broadcast_threshold`` to switch that
side to a broadcast join instead of a shuffle.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import pyarrow as pa

import ray
import ray.data as rd

from .paths import BNodeVar, NegSet, Path, Var, resolve_paths
from .relational import _drop_empty_blocks, broadcast_join, hash_join, union_pad
# module-level, not function-level: the package ships by value to Ray
# workers, where function-scope relative imports fail (see rayser.py)
from .stages.dedup import _pl

_POS = ("subj", "pred", "obj")


def _is_var(t) -> bool:
    return isinstance(t, (Var, BNodeVar))


def _var_name(t) -> str:
    return t.name


# ---------------------------------------------------------------------------
# X4 plugin hook — the analogue of the reference's SQLConverterPlugin
# (``sql_converter.py:235``: user callables injected into the BGP worklist
# ahead of the default matcher, ``:307-312``).  A plugin inspects one triple
# pattern and either returns a complete binding relation ``(dataset,
# var_names)`` for it — taking precedence over the default triple scan — or
# None to pass.  Plugins run in registration order; the default matcher is
# always the implicit last entry.
# ---------------------------------------------------------------------------

BGPPatternPlugin = Callable[[rd.Dataset, Tuple], Optional[Tuple[rd.Dataset, List[str]]]]
_BGP_PLUGINS: List[BGPPatternPlugin] = []


def register_bgp_plugin(fn: BGPPatternPlugin) -> BGPPatternPlugin:
    """Register a custom pattern matcher (usable as a decorator)."""
    _BGP_PLUGINS.append(fn)
    return fn


def unregister_bgp_plugin(fn: BGPPatternPlugin) -> None:
    _BGP_PLUGINS.remove(fn)


def clear_bgp_plugins() -> None:
    _BGP_PLUGINS.clear()


def _match_with_plugins(triples: rd.Dataset, pattern: Tuple) -> Tuple[rd.Dataset, List[str]]:
    for plugin in _BGP_PLUGINS:
        out = plugin(triples, pattern)
        if out is not None:
            return out
    return match_pattern(triples, pattern)


def match_pattern(triples: rd.Dataset, pattern: Tuple) -> Tuple[rd.Dataset, List[str]]:
    """One triple pattern → (projected Dataset of variable bindings, vars).

    Constants filter; variables project (renamed to the variable name).
    Two occurrences of the SAME variable inside one pattern add an
    intra-pattern equality filter (e.g. ``(?x, p, ?x)``)."""
    exprs = []
    var_cols: Dict[str, str] = {}
    for pos, term in zip(_POS, pattern):
        if _is_var(term):
            name = _var_name(term)
            if name in var_cols:
                exprs.append(f"({var_cols[name]} == {pos})")
            else:
                var_cols[name] = pos
        elif isinstance(term, NegSet):
            # negated property set: keep rows whose predicate is outside it
            for iri in term.iris:
                exprs.append(f"({pos} != {iri!r})")
        else:
            exprs.append(f"({pos} == {term!r})")
    ds = triples
    if exprs:
        ds = ds.filter(expr=" and ".join(exprs))
    cols = list(var_cols.values())
    names = list(var_cols.keys())
    ds = ds.map_batches(
        lambda b, _c=cols, _n=names: b.select(_c).rename_columns(_n),
        batch_format="pyarrow",
    )
    return ds, names


def _selectivity(pattern: Tuple) -> int:
    """More constants ⇒ more selective ⇒ earlier (reference presort,
    ``sql_converter.py:298``)."""
    return -sum(0 if _is_var(t) else 1 for t in pattern)


def _closure_fixpoint_local(subj_var, obj_var, max_iters, *tables):
    """Whole-closure fixpoint inside ONE worker task (small-edge-set path):
    polars self-join doubling until stable.  Runs only when the distinct edge
    count is under ``_LOCAL_CLOSURE_MAX_EDGES`` — a tree/DAG closure is then
    O(edges × diameter) rows, comfortably one worker's heap — and saves the
    ~1s/round driver-coordinated exchange cost that dominates small inputs."""
    pl = _pl()
    nonempty = [t for t in tables if t.num_rows]
    if not nonempty:
        # no edges at all: the closure of the empty relation is empty
        return pa.schema([(subj_var, pa.string()),
                          (obj_var, pa.string())]).empty_table()
    tbl = pa.concat_tables(nonempty)
    acc = pl.from_arrow(tbl).unique()
    n = acc.height
    for _ in range(max_iters):
        step = (
            acc.rename({obj_var: "__mid"})
            .join(acc.rename({subj_var: "__mid"}), on="__mid")
            .select(subj_var, obj_var)
        )
        acc2 = pl.concat([acc, step]).unique()
        if acc2.height == n:
            break
        acc, n = acc2, acc2.height
    return acc.to_arrow().cast(tbl.schema)


# one worker-task closure is cheaper than the distributed doubling loop up
# to ~this many distinct edges (closure rows stay ≲ edges × diameter); the
# distributed loop below remains the 100 TB path
_LOCAL_CLOSURE_MAX_EDGES = 100_000


def transitive_closure(
    triples: rd.Dataset,
    pred: str,
    max_iters: int = 64,
    subj_var: str = "s",
    obj_var: str = "o",
) -> rd.Dataset:
    """Transitive property path ``<p>+`` as an iterative distinct-semi-join
    fixpoint over the triples Dataset — BEYOND the reference, which raises on
    transitive paths (``sql_converter.py:229-230``).

    Per round: frontier ⋈ edges on the shared node → new pairs, global
    distinct, anti-join against the accumulated closure; stops when a round
    adds nothing.  The driver sees only per-round COUNTS (no data); rounds
    are O(graph diameter).  ``<p>*`` = union with the identity pairs of the
    node set; ``<p>`` alone is one filter.  Edge sets small enough for one
    worker (count known from block metadata) take a single-task polars
    fixpoint instead — same result, none of the per-round exchange barriers."""
    from .stages.dedup import distinct_on
    from .relational import planned_join

    edges = path_edges(triples, pred)
    if (subj_var, obj_var) != ("s", "o"):
        edges = edges.map_batches(
            lambda b: b.rename_columns([subj_var, obj_var]),
            batch_format="pyarrow",
        )
    # filter lineages carry schema-less empty blocks that crash Ray's
    # hash-shuffle join aggregator — drop them once up front (metadata-only).
    # A predicate with NO edges at all leaves nothing to infer a schema
    # from, so pass the known (subj, obj) string layout.
    edges = _drop_empty_blocks(edges, fallback_schema=pa.schema(
        [(subj_var, pa.string()), (obj_var, pa.string())]))
    acc = distinct_on(edges, [subj_var, obj_var]).materialize()
    n = acc.count()
    if n <= _LOCAL_CLOSURE_MAX_EDGES:
        out = ray.remote(_closure_fixpoint_local).remote(
            subj_var, obj_var, max_iters, *acc.to_arrow_refs()
        )
        return rd.from_arrow_refs([out])
    for _ in range(max_iters):
        # path DOUBLING (repeated squaring): acc ∪ acc⋈acc doubles the
        # maximum path length per round, so convergence takes
        # ⌈log₂ diameter⌉ rounds.  Each round is exactly ONE planner-routed
        # join + ONE distinct exchange; convergence is detected by the
        # distinct COUNT (metadata-only — replaces the round-2 anti-join +
        # extra materialize, measured ~2× fewer barriers per round).
        step = planned_join(
            acc.map_batches(
                lambda b: b.rename_columns([subj_var, "mid"]), batch_format="pyarrow"
            ),
            acc.map_batches(
                lambda b: b.rename_columns(["mid", obj_var]), batch_format="pyarrow"
            ),
            on=["mid"],
        ).select_columns([subj_var, obj_var])
        acc2 = distinct_on(acc.union(step), [subj_var, obj_var]).materialize()
        n2 = acc2.count()
        if n2 == n:
            break
        acc, n = acc2, n2
    return acc


def path_edges(triples: rd.Dataset, p) -> rd.Dataset:
    """(s, o) hop pairs matched by an inner path: a bare IRI string is one
    predicate filter; a composite path (Seq/Alt/Inv/NegSet) runs as a
    one-pattern BGP — this is what lets quantifiers close over GROUPED
    paths like ``(<a>/<b>)+`` (BEYOND the reference, which has no paths)."""
    if isinstance(p, str):
        hops = triples.filter(expr=f"pred == '{p}'")
        return hops.map_batches(
            lambda b: pa.table({"s": b["subj"], "o": b["obj"]}),
            batch_format="pyarrow",
        )
    sub = execute_bgp(triples, [(Var("__cs"), p, Var("__co"))])
    return sub.map_batches(
        lambda b: pa.table({"s": b["__cs"], "o": b["__co"]}),
        batch_format="pyarrow",
    )


def execute_bgp(
    triples: rd.Dataset,
    patterns: Sequence[Tuple],
    broadcast_threshold: int = 0,
) -> rd.Dataset:
    """Execute a BGP — see :func:`execute_bgp_cols` (result Dataset only)."""
    return execute_bgp_cols(triples, patterns, broadcast_threshold)[0]


def execute_bgp_cols(
    triples: rd.Dataset,
    patterns: Sequence[Tuple],
    broadcast_threshold: int = 0,
) -> Tuple[rd.Dataset, List[str]]:
    """Execute a BGP (may contain property paths) over the triples Dataset.

    Returns ``(dataset, column_names)`` with one STRING column per named
    variable (``Var``); intermediate path variables (``BNodeVar``) are
    joined on, then dropped.  Multiple path alternatives union with column
    padding.  The statically-known column list lets callers skip
    ``ds.schema()`` probes, each of which would execute the whole lazy
    branch once."""
    branches = []
    for bgp in resolve_paths(patterns):
        ordered = sorted(bgp, key=_selectivity)
        acc: Optional[rd.Dataset] = None
        acc_vars: List[str] = []
        for pat in ordered:
            ds, names = _match_with_plugins(triples, pat)
            if acc is None:
                acc, acc_vars = ds, names
                continue
            shared = [v for v in names if v in acc_vars]
            if shared:
                if broadcast_threshold:
                    # decide broadcast-vs-shuffle from block METADATA: count()
                    # on the materialized side is metadata-only — blocks are
                    # fetched to the driver only once known to be small
                    mat = ds.materialize()
                    if mat.count() <= broadcast_threshold:
                        small = pa.concat_tables(
                            [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
                            or [pa.table({n: pa.array([], pa.string()) for n in names})]
                        )
                        acc = broadcast_join(acc, small, on=shared)
                    else:
                        # same empty-block guard as the non-broadcast path:
                        # acc's filtered-union lineage can carry schema-less
                        # empty blocks that crash the shuffle-join aggregator
                        acc = hash_join(_drop_empty_blocks(acc), mat, on=shared)
                else:
                    # pattern matches over filtered unions carry schema-less
                    # empty blocks that crash the shuffle-join aggregator
                    acc = hash_join(_drop_empty_blocks(acc), _drop_empty_blocks(ds), on=shared)
            else:
                # disconnected BGP: cartesian product, like the reference's
                # FROM-list merge (``query_conversions.py:246-269``) — the
                # pattern side broadcasts (guarded by cross_join's limit)
                from .relational import cross_join

                acc = cross_join(acc, ds)
            acc_vars = acc_vars + [v for v in names if v not in acc_vars]
        keep = [v for v in acc_vars if not v.startswith("__pb")]
        branches.append(
            (acc.select_columns(keep) if keep != acc_vars else acc, keep)
        )
    if len(branches) == 1:
        return branches[0]
    all_names = sorted({n for _, names in branches for n in names})
    return (
        union_pad(
            *[ds for ds, _ in branches],
            schemas=[pa.schema([(n, pa.string()) for n in names])
                     for _, names in branches],
        ),
        all_names,
    )
