"""Distributed graph analytics over edge Datasets.

The graph is an edge table ``(src, dst)`` — the natural output of the kNN
graph (`stages/ann.knn_graph`), the fuzzy-dedup pair stages, or any KG
predicate selection.  Algorithms here keep EVERY per-node table distributed
(a Dataset in the object store, one row per node) — node state never lands
on the driver, the same discipline as the connected-components label
propagation in ``stages/canonicalize.py``.

PageRank uses FIXED-POINT integer arithmetic (scaled by 10^12 with floor
division) so the iteration is bit-exact under any block layout / reduction
order — which is what lets a 5-iteration run be replayed verbatim by an
unrolled-CTE SQL oracle.  Dangling mass is NOT redistributed (the classic
"PageRank lite" convention); with a constant out-degree graph like a kNN
graph there is no dangling mass at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .dedup import _pl

PR_SCALE = 10**12

# Graphs at or under this many edges run all iterations in ONE Ray task
# (vectorized numpy, same integer recurrence) instead of O(iters) join +
# exchange rounds whose fixed cost dominates tiny inputs — the same
# small-input split as canonicalize._LOCAL_CC_MAX_EDGES.  The distributed
# iteration below remains the 100 TB path.
_LOCAL_PR_MAX_EDGES = 1_000_000


def _pagerank_local(n_nodes: int, out_degree: int, iters: int,
                    damping_pct: int, node_col: str, src_col: str,
                    dst_col: str, rank_col: str, n_node_blocks: int,
                    *blocks: pa.Table) -> pa.Table:
    nt = [b for b in blocks[:n_node_blocks] if b.num_rows]
    et = [b for b in blocks[n_node_blocks:] if b.num_rows]
    nodes = (pa.concat_tables(nt)[node_col].to_numpy(zero_copy_only=False)
             if nt else np.array([], np.int64))
    nodes = np.sort(nodes)
    if et:
        edges = pa.concat_tables(et)
        src = np.searchsorted(nodes, edges[src_col].to_numpy(zero_copy_only=False))
        dst = np.searchsorted(nodes, edges[dst_col].to_numpy(zero_copy_only=False))
    else:
        src = dst = np.array([], np.int64)
    base_all = PR_SCALE // n_nodes
    base = ((100 - damping_pct) * base_all) // 100
    r = np.full(len(nodes), base_all, np.int64)
    for _ in range(iters):
        s = np.zeros(len(nodes), np.int64)
        np.add.at(s, dst, r[src] // out_degree)
        r = base + (damping_pct * s) // 100
    return pa.table({node_col: pa.array(nodes, pa.int64()),
                     rank_col: pa.array(r, pa.int64())})


# Same small-input split as _LOCAL_PR_MAX_EDGES for the edge-set analytics
# below (k-core / link prediction / triangles): at or under this many edges
# the whole algorithm runs in ONE Ray task (vectorized numpy/polars, same
# integer semantics) instead of per-round exchanges whose fixed cost
# dominates tiny graphs.  The distributed plans remain the 100 TB paths and
# are pytest-forced via monkeypatched thresholds.
_LOCAL_GRAPH_MAX_EDGES = 200_000


def _triangles_local(a_col: str, b_col: str, node_col: str, out_col: str,
                     *blocks: pa.Table) -> pa.Table:
    pl = _pl()
    et = [b for b in blocks if b.num_rows]
    if not et:
        return pa.table({node_col: pa.array([], pa.int64()),
                         out_col: pa.array([], pa.int64())})
    und = pl.from_arrow(pa.concat_tables(et)).rename(
        {a_col: "a", b_col: "b"}).select("a", "b")
    wed = und.join(und.rename({"a": "m", "b": "c"}),
                   left_on="b", right_on="m")
    closed = wed.join(und.rename({"b": "c"}), on=["a", "c"], how="semi")
    corners = pl.concat([closed.select(pl.col("a").alias("n")),
                         closed.select(pl.col("b").alias("n")),
                         closed.select(pl.col("c").alias("n"))])
    out = corners.group_by("n").len(name=out_col).sort("n")
    return pa.table({node_col: out["n"].to_numpy().astype(np.int64),
                     out_col: out[out_col].to_numpy().astype(np.int64)})


def triangle_counts(
    und: rd.Dataset,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "node",
    out_col: str = "n_tri",
) -> rd.Dataset:
    """Per-node triangle participation counts (the clustering-coefficient
    numerator) over an UNDIRECTED edge Dataset with canonically ordered
    endpoints (``a < b``, distinct).  Classic ordered wedge-closure plan:
    wedges (a<b<c) come from one self-join on the middle vertex, closed
    wedges from one (a,c) semi join back against the edge set — both joins
    ride :func:`relational.planned_join` (broadcast while the edge table is
    small, hash exchange at scale), then each triangle fans out to its
    three corners and one grouped-count exchange finishes.  Never builds a
    neighborhood matrix; the wedge stream is the only intermediate, which
    is the standard partitioning assumption (skewed hub vertices inflate
    wedges — pre-bound degree upstream if the graph has hubs)."""
    from ..relational import grouped_agg, planned_join

    und = und.select_columns([a_col, b_col]).materialize()
    if und.count() <= _LOCAL_GRAPH_MAX_EDGES:
        out = ray.remote(_triangles_local).remote(
            a_col, b_col, node_col, out_col, *und.to_arrow_refs())
        return rd.from_arrow_refs([out])
    right = und.map_batches(
        lambda t: t.rename_columns(["__m", "c"]), batch_format="pyarrow")
    wedges = planned_join(und, right, on=[b_col], right_on=["__m"])
    closed = planned_join(
        wedges, und.map_batches(
            lambda t: t.rename_columns([a_col, "c"]), batch_format="pyarrow"),
        on=[a_col, "c"], join_type="left_semi")

    def corners(t: pa.Table) -> pa.Table:
        node = np.concatenate([
            t[a_col].to_numpy(zero_copy_only=False),
            t[b_col].to_numpy(zero_copy_only=False),
            t["c"].to_numpy(zero_copy_only=False),
        ]).astype(np.int64, copy=False)
        return pa.table({node_col: pa.array(node, pa.int64()),
                         out_col: pa.array(np.ones(len(node), np.int64))})

    fan = closed.map_batches(corners, batch_format="pyarrow")
    return grouped_agg(
        fan, [node_col], sums=[out_col],
        in_schema=pa.schema([(node_col, pa.int64()), (out_col, pa.int64())]),
    )


def _degrees(und: rd.Dataset, a_col: str = "a", b_col: str = "b",
             node_col: str = "node", deg_col: str = "deg") -> rd.Dataset:
    """Per-node degree of an undirected (a<b, distinct) edge Dataset: one
    corner fan-out + grouped-count exchange."""
    from ..relational import grouped_agg

    def corners(t: pa.Table) -> pa.Table:
        node = np.concatenate([t[a_col].to_numpy(zero_copy_only=False),
                               t[b_col].to_numpy(zero_copy_only=False)])
        return pa.table({node_col: pa.array(node.astype(np.int64), pa.int64()),
                         deg_col: pa.array(np.ones(len(node), np.int64))})

    return grouped_agg(
        und.map_batches(corners, batch_format="pyarrow"),
        [node_col], sums=[deg_col],
        in_schema=pa.schema([(node_col, pa.int64()), (deg_col, pa.int64())]),
    )


def _kcore_local(k: int, max_rounds: int, a_col: str, b_col: str,
                 *blocks: pa.Table) -> pa.Table:
    et = [b for b in blocks if b.num_rows]
    if et:
        t = pa.concat_tables(et)
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        a = b = np.array([], np.int64)
    prev, converged = len(a), len(a) == 0
    for _ in range(max_rounds):
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        deg = np.bincount(inv, minlength=len(nodes))
        ia, ib = inv[: len(a)], inv[len(a):]
        keep = (deg[ia] >= k) & (deg[ib] >= k)
        a, b = a[keep], b[keep]
        if len(a) == prev:
            converged = True
            break
        prev = len(a)
    if not converged:
        raise RuntimeError(
            f"k-core peel did not converge within {max_rounds} rounds "
            f"(edge count still shrinking at {prev}); raise max_rounds")
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes))
    m = deg >= k
    return pa.table({"node": pa.array(nodes[m], pa.int64()),
                     "deg": pa.array(deg[m].astype(np.int64), pa.int64())})


def kcore(
    und: rd.Dataset,
    k: int,
    max_rounds: int = 4,
    a_col: str = "a",
    b_col: str = "b",
) -> rd.Dataset:
    """k-core decomposition by iterative peeling: each round drops every
    edge with an endpoint of degree < k (one degree exchange + two planned
    semi joins), until the edge set reaches a fixpoint.  Raises LOUDLY if
    the peel has not converged within ``max_rounds`` — the bound is what
    lets a fixed-depth unrolled SQL oracle replay the whole algorithm, and
    an unconverged run must never silently return a superset.  Returns the
    surviving nodes with their core degrees ``(node, deg)``."""
    from ..relational import planned_join

    edges = und.select_columns([a_col, b_col]).materialize()
    prev = edges.count()
    if prev <= _LOCAL_GRAPH_MAX_EDGES:
        # eager get so an unconverged peel raises HERE, matching the
        # distributed path's raise-at-call contract
        out = ray.get(ray.remote(_kcore_local).remote(
            k, max_rounds, a_col, b_col, *edges.to_arrow_refs()))
        return rd.from_arrow(out)
    converged = prev == 0
    for _ in range(max_rounds):
        deg = _degrees(edges, a_col, b_col)
        # materialize once: both semi joins consume it, and planned_join
        # would otherwise re-run the degree exchange per join
        keep = deg.filter(expr=f"deg >= {k}").select_columns(["node"]).materialize()
        kept = planned_join(edges, keep, on=[a_col], right_on=["node"],
                            join_type="left_semi")
        kept = planned_join(kept, keep, on=[b_col], right_on=["node"],
                            join_type="left_semi").materialize()
        cnt = kept.count()
        edges = kept
        if cnt == prev:
            converged = True
            break
        prev = cnt
    if not converged:
        raise RuntimeError(
            f"k-core peel did not converge within {max_rounds} rounds "
            f"(edge count still shrinking at {prev}); raise max_rounds")
    return _degrees(edges, a_col, b_col).filter(expr=f"deg >= {k}")


def _linkpred_local(min_common: int, ra_scale: int, a_col: str, b_col: str,
                    *blocks: pa.Table) -> pa.Table:
    pl = _pl()
    schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                        ("cn", pa.int64()), ("ra", pa.int64())])
    et = [b for b in blocks if b.num_rows]
    if not et:
        return schema.empty_table()
    und = pl.from_arrow(pa.concat_tables(et)).rename(
        {a_col: "a", b_col: "b"}).select("a", "b")
    adj = pl.concat([und.select(pl.col("a").alias("u"), pl.col("b").alias("w")),
                     und.select(pl.col("b").alias("u"), pl.col("a").alias("w"))])
    deg = adj.group_by("u").len(name="deg").rename({"u": "w"})
    wed = (adj.join(adj.rename({"u": "v"}), on="w")
           .filter(pl.col("u") < pl.col("v")))
    sc = (wed.join(deg, on="w")
          .with_columns((ra_scale // pl.col("deg")).alias("ra"))
          .group_by("u", "v")
          .agg(pl.len().alias("cn").cast(pl.Int64), pl.col("ra").sum())
          .join(und, left_on=["u", "v"], right_on=["a", "b"], how="anti")
          .filter(pl.col("cn") >= min_common))
    return sc.to_arrow().cast(schema)


def link_prediction(
    und: rd.Dataset,
    min_common: int = 2,
    ra_scale: int = 1000,
    a_col: str = "a",
    b_col: str = "b",
) -> rd.Dataset:
    """Common-neighbor link prediction over an undirected (a<b, distinct)
    edge Dataset: for every NON-adjacent pair (u,v) sharing ≥ ``min_common``
    neighbors, the common-neighbor count and the integer resource-allocation
    score ``Σ_w  ra_scale // deg(w)`` (Zhou et al. 2009 — the RA index;
    integer division keeps the oracle exact).  Plan: symmetric adjacency
    fan-out, one wedge self-join on the middle vertex (``planned_join`` —
    broadcast small, hash exchange at scale), middle-degree join for the RA
    contribution, one grouped-sum exchange on the (u,v) pair, and an anti
    join back against the edge set so only NEW links remain.  Same hub-skew
    caveat as :func:`triangle_counts` — the wedge stream is the widest
    intermediate; pre-bound degree upstream for hubby graphs."""
    from ..relational import grouped_agg, planned_join

    und = und.select_columns([a_col, b_col]).materialize()
    if und.count() <= _LOCAL_GRAPH_MAX_EDGES:
        out = ray.remote(_linkpred_local).remote(
            min_common, ra_scale, a_col, b_col, *und.to_arrow_refs())
        return rd.from_arrow_refs([out])

    def symm(t: pa.Table) -> pa.Table:
        u = np.concatenate([t[a_col].to_numpy(zero_copy_only=False),
                            t[b_col].to_numpy(zero_copy_only=False)])
        w = np.concatenate([t[b_col].to_numpy(zero_copy_only=False),
                            t[a_col].to_numpy(zero_copy_only=False)])
        return pa.table({"u": pa.array(u.astype(np.int64), pa.int64()),
                         "w": pa.array(w.astype(np.int64), pa.int64())})

    adj = und.map_batches(symm, batch_format="pyarrow").materialize()
    deg = _degrees(und, a_col, b_col)

    right = adj.map_batches(lambda t: t.rename_columns(["v", "w"]),
                            batch_format="pyarrow")
    wedges = planned_join(adj, right, on=["w"]).filter(expr="u < v")
    contrib = planned_join(wedges, deg, on=["w"], right_on=["node"])

    def score(t: pa.Table) -> pa.Table:
        ra = pc.divide(pa.scalar(ra_scale, pa.int64()), t["deg"])
        return pa.table({"u": t["u"], "v": t["v"],
                         "cn": pa.array(np.ones(len(t), np.int64)),
                         "ra": ra})

    pairs = grouped_agg(
        contrib.map_batches(score, batch_format="pyarrow"),
        ["u", "v"], sums=["cn", "ra"],
        in_schema=pa.schema([("u", pa.int64()), ("v", pa.int64()),
                             ("cn", pa.int64()), ("ra", pa.int64())]),
    )
    new_links = planned_join(pairs, und, on=["u", "v"],
                             right_on=[a_col, b_col], join_type="left_anti")
    return new_links.filter(expr=f"cn >= {min_common}")


def pagerank(
    edges: rd.Dataset,
    nodes: rd.Dataset,
    n_nodes: int,
    out_degree: int,
    iters: int = 5,
    damping_pct: int = 85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    rank_col: str = "rank",
) -> rd.Dataset:
    """Iterative PageRank over a CONSTANT-out-degree edge Dataset.

    Per iteration (all Dataset ops, nothing driver-side):
      1. contrib: edges ⋈ ranks on src (``planned_join`` — ranks broadcast
         while small, hash exchange at scale), each edge carries
         ``r[src] // out_degree``;
      2. one grouped-sum exchange keyed on dst;
      3. ranks' = nodes LEFT JOIN sums → ``base + damping·s // 100``
         (nodes with no in-links get s = 0).

    Each ranks generation is materialized — O(|V|) rows in the object
    store, never on the driver — to cut the lazy DAG between iterations
    (otherwise iteration t re-executes iterations 0..t-1).

    ``n_nodes`` and ``out_degree`` are caller-supplied plan constants (the
    kNN graph knows k; node count is one metadata ``count()``), so the
    whole iteration is a static pipeline."""
    from ..relational import grouped_agg, planned_join

    base_all = PR_SCALE // n_nodes
    base = ((100 - damping_pct) * base_all) // 100

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            node_col: b[node_col],
            rank_col: pa.array([base_all] * len(b), pa.int64()),
        })

    nodes = nodes.materialize()
    edges = edges.select_columns([src_col, dst_col]).materialize()

    if edges.count() <= _LOCAL_PR_MAX_EDGES:
        nrefs = nodes.to_arrow_refs()
        out = ray.remote(_pagerank_local).remote(
            n_nodes, out_degree, iters, damping_pct, node_col, src_col,
            dst_col, rank_col, len(nrefs), *nrefs, *edges.to_arrow_refs())
        return rd.from_arrow_refs([out])

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()

    contrib_schema = pa.schema([(dst_col, pa.int64()), ("c", pa.int64())])

    for _ in range(iters):
        joined = planned_join(edges, ranks, on=[src_col], right_on=[node_col])

        def contrib(t: pa.Table) -> pa.Table:
            # int64/int64 pc.divide truncates; all values positive ⇒ floor
            c = pc.divide(t[rank_col], pa.scalar(out_degree, pa.int64()))
            return pa.table({dst_col: t[dst_col], "c": c},
                            schema=contrib_schema)

        sums = grouped_agg(
            joined.map_batches(contrib, batch_format="pyarrow"),
            [dst_col], sums=["c"], in_schema=contrib_schema,
        )
        padded = planned_join(nodes, sums, on=[node_col], right_on=[dst_col],
                              join_type="left_outer")

        def step(t: pa.Table) -> pa.Table:
            s = pc.fill_null(pc.cast(t["c"], pa.int64()), 0)
            d = pc.divide(pc.multiply(s, pa.scalar(damping_pct, pa.int64())),
                          pa.scalar(100, pa.int64()))
            return pa.table({
                node_col: t[node_col],
                rank_col: pc.add(pa.scalar(base, pa.int64()), d),
            })

        ranks = padded.map_batches(step, batch_format="pyarrow").materialize()

    return ranks


def _ppr_local(seeds: list, out_degree: int, iters: int, damping_pct: int,
               node_col: str, src_col: str, dst_col: str, rank_col: str,
               n_node_blocks: int, *blocks: pa.Table) -> pa.Table:
    nt = [b for b in blocks[:n_node_blocks] if b.num_rows]
    et = [b for b in blocks[n_node_blocks:] if b.num_rows]
    nodes = (pa.concat_tables(nt)[node_col].to_numpy(zero_copy_only=False)
             if nt else np.array([], np.int64))
    nodes = np.sort(nodes)
    if et:
        edges = pa.concat_tables(et)
        src = np.searchsorted(nodes, edges[src_col].to_numpy(zero_copy_only=False))
        dst = np.searchsorted(nodes, edges[dst_col].to_numpy(zero_copy_only=False))
    else:
        src = dst = np.array([], np.int64)
    seed_mask = np.isin(nodes, np.asarray(sorted(seeds), np.int64))
    seed_all = PR_SCALE // max(1, len(seeds))
    restart = ((100 - damping_pct) * seed_all) // 100
    r = np.where(seed_mask, seed_all, 0).astype(np.int64)
    for _ in range(iters):
        s = np.zeros(len(nodes), np.int64)
        np.add.at(s, dst, r[src] // out_degree)
        r = np.where(seed_mask, restart, 0) + (damping_pct * s) // 100
    return pa.table({node_col: pa.array(nodes, pa.int64()),
                     rank_col: pa.array(r, pa.int64())})


def personalized_pagerank(
    edges: rd.Dataset,
    nodes: rd.Dataset,
    seeds: list,
    out_degree: int,
    iters: int = 5,
    damping_pct: int = 85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    rank_col: str = "rank",
) -> rd.Dataset:
    """Personalized PageRank (random walk with restart to a seed set) —
    the graph-proximity expansion primitive (seed docs → related docs for
    topic-targeted corpus mining).  Same constant-out-degree integer
    recurrence as :func:`pagerank` but the teleport mass lands ONLY on
    ``seeds``: init r = PR_SCALE//|S| on seeds (0 elsewhere); per round
    r' = restart·[v∈S] + damping·(Σ in-contribs)//100.  The seed set is a
    tiny plan constant carried in task closures; each round is one
    planned join + one grouped-sum exchange, ranks materialized per
    generation (O(|V|) in the object store, never on the driver); small
    graphs take the one-task vectorized path."""
    from ..relational import grouped_agg, planned_join

    seeds = sorted(int(s) for s in seeds)
    seed_all = PR_SCALE // max(1, len(seeds))
    restart = ((100 - damping_pct) * seed_all) // 100
    seed_arr = pa.array(seeds, pa.int64())

    nodes = nodes.materialize()
    edges = edges.select_columns([src_col, dst_col]).materialize()

    if edges.count() <= _LOCAL_PR_MAX_EDGES:
        nrefs = nodes.to_arrow_refs()
        out = ray.remote(_ppr_local).remote(
            seeds, out_degree, iters, damping_pct, node_col, src_col,
            dst_col, rank_col, len(nrefs), *nrefs, *edges.to_arrow_refs())
        return rd.from_arrow_refs([out])

    def init(b: pa.Table) -> pa.Table:
        m = pc.is_in(b[node_col], value_set=seed_arr)
        r = pc.if_else(m, pa.scalar(seed_all, pa.int64()),
                       pa.scalar(0, pa.int64()))
        return pa.table({node_col: b[node_col], rank_col: r})

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()
    contrib_schema = pa.schema([(dst_col, pa.int64()), ("c", pa.int64())])

    for _ in range(iters):
        joined = planned_join(edges, ranks, on=[src_col], right_on=[node_col])

        def contrib(t: pa.Table) -> pa.Table:
            c = pc.divide(t[rank_col], pa.scalar(out_degree, pa.int64()))
            return pa.table({dst_col: t[dst_col], "c": c},
                            schema=contrib_schema)

        sums = grouped_agg(
            joined.map_batches(contrib, batch_format="pyarrow"),
            [dst_col], sums=["c"], in_schema=contrib_schema,
        )
        padded = planned_join(nodes, sums, on=[node_col], right_on=[dst_col],
                              join_type="left_outer")

        def step(t: pa.Table) -> pa.Table:
            s = pc.fill_null(pc.cast(t["c"], pa.int64()), 0)
            d = pc.divide(pc.multiply(s, pa.scalar(damping_pct, pa.int64())),
                          pa.scalar(100, pa.int64()))
            m = pc.is_in(t[node_col], value_set=seed_arr)
            b0 = pc.if_else(m, pa.scalar(restart, pa.int64()),
                            pa.scalar(0, pa.int64()))
            return pa.table({node_col: t[node_col],
                             rank_col: pc.add(b0, d)})

        ranks = padded.map_batches(step, batch_format="pyarrow").materialize()

    return ranks


HITS_SCALE = 10**6


def _hits_local(iters: int, node_col: str, src_col: str, dst_col: str,
                n_node_blocks: int, *blocks: pa.Table) -> pa.Table:
    nt = [b for b in blocks[:n_node_blocks] if b.num_rows]
    et = [b for b in blocks[n_node_blocks:] if b.num_rows]
    nodes = (pa.concat_tables(nt)[node_col].to_numpy(zero_copy_only=False)
             if nt else np.array([], np.int64))
    nodes = np.sort(nodes)
    if et:
        edges = pa.concat_tables(et)
        src = np.searchsorted(nodes, edges[src_col].to_numpy(zero_copy_only=False))
        dst = np.searchsorted(nodes, edges[dst_col].to_numpy(zero_copy_only=False))
    else:
        src = dst = np.array([], np.int64)
    h = np.full(len(nodes), HITS_SCALE, np.int64)
    a = np.full(len(nodes), HITS_SCALE, np.int64)
    for _ in range(iters):
        hn = np.zeros(len(nodes), np.int64)
        np.add.at(hn, src, a[dst])       # h(u) = Σ_{u→v} a(v)
        h = hn
        an = np.zeros(len(nodes), np.int64)
        np.add.at(an, dst, h[src])       # a(v) = Σ_{u→v} h(u)
        a = an
    return pa.table({node_col: pa.array(nodes, pa.int64()),
                     "hub": pa.array(h, pa.int64()),
                     "auth": pa.array(a, pa.int64())})


def hits(
    edges: rd.Dataset,
    nodes: rd.Dataset,
    iters: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> rd.Dataset:
    """Kleinberg HITS hub/authority scores, UNNORMALIZED fixed-point
    integers (init ``HITS_SCALE``; magnitudes grow ~out_degree× per half
    step, so a handful of iterations stays well inside int64) — exact
    integer sums make the whole recurrence replayable bit-for-bit by an
    unrolled-CTE SQL oracle.

    Per iteration, the mutual-reinforcement updates run as Dataset ops:
      1. ``h(u) = Σ_{u→v} a(v)`` — edges ⋈ auth on dst, grouped-sum by src;
      2. ``a(v) = Σ_{u→v} h(u)`` — edges ⋈ the NEW hubs on src, grouped-sum
         by dst;
    each a planned join (broadcast while node state is small, hash exchange
    at scale) + one grouped-sum exchange; node state lives in the object
    store, never on the driver.  Graphs at or under
    ``_LOCAL_PR_MAX_EDGES`` run all iterations in one vectorized task."""
    from ..relational import grouped_agg, planned_join

    nodes = nodes.materialize()
    edges = edges.select_columns([src_col, dst_col]).materialize()

    if edges.count() <= _LOCAL_PR_MAX_EDGES:
        nrefs = nodes.to_arrow_refs()
        out = ray.remote(_hits_local).remote(
            iters, node_col, src_col, dst_col, len(nrefs), *nrefs,
            *edges.to_arrow_refs())
        return rd.from_arrow_refs([out])

    def init(b: pa.Table) -> pa.Table:
        s = pa.array([HITS_SCALE] * len(b), pa.int64())
        return pa.table({node_col: b[node_col], "v": s})

    def _half_step(state: rd.Dataset, probe_col: str, sum_col: str) -> rd.Dataset:
        """state(node, v) → new(node, v): v'(x) = Σ over edges where
        x = ``sum_col`` endpoint of v at the ``probe_col`` endpoint."""
        part_schema = pa.schema([(sum_col, pa.int64()), ("c", pa.int64())])
        joined = planned_join(edges, state, on=[probe_col], right_on=[node_col])
        parts = joined.map_batches(
            lambda t: pa.table({sum_col: t[sum_col], "c": t["v"]},
                               schema=part_schema),
            batch_format="pyarrow")
        sums = grouped_agg(parts, [sum_col], sums=["c"], in_schema=part_schema)
        padded = planned_join(nodes, sums, on=[node_col], right_on=[sum_col],
                              join_type="left_outer")
        return padded.map_batches(
            lambda t: pa.table({
                node_col: t[node_col],
                "v": pc.fill_null(pc.cast(t["c"], pa.int64()), 0)}),
            batch_format="pyarrow").materialize()

    hubs = nodes.map_batches(init, batch_format="pyarrow").materialize()
    auth = hubs
    for _ in range(iters):
        hubs = _half_step(auth, probe_col=dst_col, sum_col=src_col)
        auth = _half_step(hubs, probe_col=src_col, sum_col=dst_col)

    h = hubs.map_batches(lambda t: t.rename_columns([node_col, "hub"]),
                         batch_format="pyarrow")
    a = auth.map_batches(lambda t: t.rename_columns([node_col, "auth"]),
                         batch_format="pyarrow")
    return planned_join(h, a, on=[node_col])


def _lp_modes_local(iters: int, a_col: str, b_col: str,
                    *tables: pa.Table) -> pa.Table:
    """One-task synchronous mode-LP (polars group_by per round, same
    argmax/tie-break recurrence as the distributed path)."""
    pl = _pl()
    et = [t for t in tables if t is not None and t.num_rows]
    if not et:
        return pa.table({"node": pa.array([], pa.int64()),
                         "label": pa.array([], pa.int64())})
    e = pa.concat_tables(et)
    a = e[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
    b = e[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    nodes = np.unique(src)          # sorted; every node has >= 1 neighbor
    si = np.searchsorted(nodes, src)
    lab = nodes.copy()
    for _ in range(iters):
        df = pl.DataFrame({"node": dst, "label": lab[si]})
        pick = (df.group_by(["node", "label"]).len(name="cnt")
                .sort(["cnt", "label"], descending=[True, False])
                .group_by("node", maintain_order=True).head(1))
        new = np.empty(len(nodes), np.int64)
        new[np.searchsorted(nodes, pick["node"].to_numpy())] = \
            pick["label"].to_numpy()
        lab = new
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "label": pa.array(lab, pa.int64())})


def label_propagation_modes(
    und: rd.Dataset,
    iters: int = 3,
    a_col: str = "a",
    b_col: str = "b",
) -> rd.Dataset:
    """Synchronous mode-label-propagation COMMUNITIES (Raghavan et al.
    2007) over an undirected (a<b, distinct) edge Dataset — unlike
    connected components (min-label fixpoint), each round every node takes
    the MOST FREQUENT label among its neighbors (smallest label on ties),
    so dense regions converge to shared labels while bridges stay weak.
    Fixed ``iters`` synchronous rounds + total tie-break ⇒ deterministic
    under any block layout, replayable by an unrolled-CTE SQL oracle.

    Per round (all Dataset ops): corner fan-out joins each directed edge
    with its source's label (planned join), one grouped-count exchange on
    (node, label), and a per-node ``grouped_topk`` (count DESC, label ASC,
    k=1).  Label state lives in the object store, never on the driver.
    Small graphs run all rounds in ONE polars task."""
    from ..relational import grouped_agg, grouped_topk, planned_join

    und = und.select_columns([a_col, b_col]).materialize()
    if und.count() <= _LOCAL_GRAPH_MAX_EDGES:
        out = ray.remote(_lp_modes_local).remote(
            iters, a_col, b_col, *und.to_arrow_refs())
        return rd.from_arrow_refs([out])

    def symm(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    edges = und.map_batches(symm, batch_format="pyarrow").materialize()
    nodes = grouped_agg(
        edges.map_batches(
            lambda t: pa.table({"node": t["src"]}), batch_format="pyarrow"),
        ["node"], count_as="deg",
        in_schema=pa.schema([("node", pa.int64())]),
    ).map_batches(lambda t: t.select(["node"]),
                  batch_format="pyarrow").materialize()

    labels = nodes.map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["node"]}),
        batch_format="pyarrow").materialize()

    cnt_schema = pa.schema([("node", pa.int64()), ("label", pa.int64()),
                            ("cnt", pa.int64())])
    for _ in range(iters):
        msgs = planned_join(edges, labels, on=["src"], right_on=["node"])
        parts = msgs.map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"],
                                "cnt": pa.array([1] * len(t), pa.int64())}),
            batch_format="pyarrow")
        counts = grouped_agg(parts, ["node", "label"], sums=["cnt"],
                             in_schema=cnt_schema)
        labels = grouped_topk(counts, keys=["node"],
                              order_by=[("cnt", True), ("label", False)],
                              k=1).map_batches(
            lambda t: t.select(["node", "label"]),
            batch_format="pyarrow").materialize()
    return labels


def _bfs_local(iters: int, a_col: str, b_col: str, node_col: str,
               hop_col: str, weight_col, n_seed_refs: int,
               *tables: pa.Table) -> pa.Table:
    """One-task BFS / weighted SSSP (vectorized Bellman-Ford relaxation
    over dense node indices) — the small-graph path of :func:`bfs_hops`.
    ``weight_col`` None means unit weights."""
    schema = pa.schema([(node_col, pa.int64()), (hop_col, pa.int64())])
    seed_t = [t for t in tables[:n_seed_refs] if t is not None and t.num_rows]
    edge_t = [t for t in tables[n_seed_refs:] if t is not None and t.num_rows]
    if not seed_t:
        return schema.empty_table()
    seeds = pa.concat_tables(seed_t).combine_chunks()
    s_nodes = seeds[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
    s_hops = seeds[hop_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if edge_t:
        e = pa.concat_tables(edge_t).combine_chunks()
        a = e[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = e[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (e[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
             if weight_col else np.ones(len(a), np.int64))
    else:
        a = b = w = np.empty(0, np.int64)
    nodes = np.unique(np.concatenate([s_nodes, a, b]))
    big = np.int64(2**62)
    dist = np.full(len(nodes), big, np.int64)
    np.minimum.at(dist, np.searchsorted(nodes, s_nodes), s_hops)
    ai, bi = np.searchsorted(nodes, a), np.searchsorted(nodes, b)
    src, dst = np.concatenate([ai, bi]), np.concatenate([bi, ai])
    ww = np.concatenate([w, w])
    for _ in range(iters):
        nd = dist.copy()
        # dist[src] + ww overflows nowhere: unreachable = 2**62, weights tiny
        np.minimum.at(nd, dst, dist[src] + ww)
        dist = nd
    keep = dist < big
    return pa.table({node_col: pa.array(nodes[keep]),
                     hop_col: pa.array(dist[keep])}, schema=schema)


def bfs_hops(
    und: rd.Dataset,
    seeds: rd.Dataset,
    iters: int = 4,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "node",
    hop_col: str = "hop",
    weight_col: str = None,
    local_max_edges: int = _LOCAL_GRAPH_MAX_EDGES,
) -> rd.Dataset:
    """Multi-source BFS hop distances over an undirected canonical edge
    list, bounded at ``iters`` hops (unit-weight Bellman-Ford relaxation).

    ``seeds`` is a ``(node, hop)`` Dataset (normally hop = 0).  Each round
    is two Dataset ops — expansion join (``planned_join``: the hop table
    broadcasts while small, hash exchange at scale) + grouped-MIN exchange
    over ``dist ∪ expansion`` — with the hop table materialized between
    rounds (object store, never the driver), exactly the pagerank
    discipline above.  The relaxation recurrence (not a frontier queue) is
    deterministic under any block layout, so the whole run replays in an
    unrolled-CTE SQL oracle.  Nodes farther than ``iters`` hops from every
    seed are absent from the output.

    Graphs at or under ``local_max_edges`` run all rounds in ONE task
    (:func:`_bfs_local`, same recurrence)."""
    from ..relational import grouped_agg, planned_join

    ecols = [a_col, b_col] + ([weight_col] if weight_col else [])
    und = und.select_columns(ecols).materialize()
    hop_schema = pa.schema([(node_col, pa.int64()), (hop_col, pa.int64())])

    def norm_seed(t: pa.Table) -> pa.Table:
        return pa.table({node_col: pc.cast(t[node_col], pa.int64()),
                         hop_col: pc.cast(t[hop_col], pa.int64())},
                        schema=hop_schema)

    dist = seeds.map_batches(norm_seed, batch_format="pyarrow").materialize()
    if und.count() <= local_max_edges:
        srefs = dist.to_arrow_refs()
        out = ray.remote(_bfs_local).remote(
            iters, a_col, b_col, node_col, hop_col, weight_col,
            len(srefs), *srefs, *und.to_arrow_refs())
        return rd.from_arrow_refs([out])

    def both(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a]))}
        if weight_col:
            w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cols["w"] = pa.array(np.concatenate([w, w]))
        return pa.table(cols)

    edges = und.map_batches(both, batch_format="pyarrow").materialize()

    for _ in range(iters):
        j = planned_join(edges, dist, on=["src"], right_on=[node_col])

        def relax(t: pa.Table) -> pa.Table:
            step = t["w"] if weight_col else pa.scalar(1, pa.int64())
            return pa.table(
                {node_col: t["dst"],
                 hop_col: pc.add(pc.cast(t[hop_col], pa.int64()),
                                 pc.cast(step, pa.int64()) if weight_col else step)},
                schema=hop_schema)

        cand = j.map_batches(relax, batch_format="pyarrow")
        dist = grouped_agg(dist.union(cand), [node_col], mins=[hop_col],
                           in_schema=hop_schema).materialize()
    return dist


def _scc_local(src_col: str, dst_col: str, node_col: str, scc_col: str,
               n_node_blocks: int, *blocks: pa.Table) -> pa.Table:
    """One-task SCC: iterative Kosaraju (two DFS passes over adjacency
    dicts) — the small-graph fast path, same integer label contract as
    the distributed refinement (label = min node id of the component)."""
    nt = [b for b in blocks[:n_node_blocks] if b.num_rows]
    et = [b for b in blocks[n_node_blocks:] if b.num_rows]
    nodes = sorted({int(v) for b in nt
                    for v in b[node_col].to_pylist()})
    fwd: dict = {v: [] for v in nodes}
    rev: dict = {v: [] for v in nodes}
    for b in et:
        for s, d in zip(b[src_col].to_pylist(), b[dst_col].to_pylist()):
            if s in fwd and d in fwd:
                fwd[s].append(d)
                rev[d].append(s)
    order: list = []
    seen = set()
    for root in nodes:  # pass 1: finish order (iterative DFS)
        if root in seen:
            continue
        stack = [(root, iter(fwd[root]))]
        seen.add(root)
        while stack:
            v, it = stack[-1]
            nxt = next((u for u in it if u not in seen), None)
            if nxt is None:
                order.append(v)
                stack.pop()
            else:
                seen.add(nxt)
                stack.append((nxt, iter(fwd[nxt])))
    label: dict = {}
    for root in reversed(order):  # pass 2: reverse-graph components
        if root in label:
            continue
        comp = [root]
        label[root] = root
        while comp:
            v = comp.pop()
            for u in rev[v]:
                if u not in label:
                    label[u] = root
                    comp.append(u)
    # canonical label = min node id per component
    rep: dict = {}
    for v, r in label.items():
        rep[r] = min(rep.get(r, v), v)
    out = sorted(nodes)
    return pa.table({node_col: pa.array(out, pa.int64()),
                     scc_col: pa.array([rep[label[v]] for v in out],
                                       pa.int64())})


def _min_prop_fixpoint(edges: rd.Dataset, nodes: rd.Dataset, forward: bool,
                       max_inner: int, node_col: str, src_col: str,
                       dst_col: str, out_col: str) -> rd.Dataset:
    """Min-label fixpoint along DIRECTED edges (forward: labels flow
    src→dst, i.e. out = min over in-part ancestors ∪ self; backward:
    reversed).  Same join + grouped-min + change-count protocol as
    ``canonicalize.label_propagation_components`` — the label table never
    reaches the driver."""
    from ..relational import grouped_agg, planned_join

    a, b = (src_col, dst_col) if forward else (dst_col, src_col)

    def init(t: pa.Table) -> pa.Table:
        return pa.table({node_col: t[node_col], "label": t[node_col]})

    labels = nodes.map_batches(init, batch_format="pyarrow").materialize()
    for _ in range(max_inner):
        flow = planned_join(edges, labels, on=[a], right_on=[node_col]) \
            .map_batches(
                lambda t, _b=b: pa.table({node_col: t[_b],
                                          "label": t["label"]}),
                batch_format="pyarrow")
        new = grouped_agg(labels.union(flow), [node_col],
                          mins=["label"]).materialize()
        improved = planned_join(
            new.map_batches(lambda t: t.rename_columns([node_col, "nl"]),
                            batch_format="pyarrow"),
            labels, on=[node_col], right_on=[node_col],
        ).map_batches(lambda t: t.filter(pc.less(t["nl"], t["label"])),
                      batch_format="pyarrow")
        n_improved = improved.count()
        labels = new
        if n_improved == 0:
            break
    else:
        raise RuntimeError(
            f"scc: min-label propagation did not converge in {max_inner} "
            "rounds — raise max_inner for graphs of this diameter")
    return labels.map_batches(
        lambda t: t.rename_columns([node_col, out_col]),
        batch_format="pyarrow")


def scc(
    edges: rd.Dataset,
    nodes: rd.Dataset,
    max_outer: int = 15,
    max_inner: int = 40,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    scc_col: str = "scc",
) -> rd.Dataset:
    """Strongly connected components of a DIRECTED edge Dataset via
    distributed forward/backward min-label refinement (the Pregel-style
    coloring family — Yan et al. 2014): each outer round computes, within
    the current partition, f(v) = min in-part ancestor-or-self and
    b(v) = min in-part descendant-or-self (two min-label fixpoints, each
    a sequence of join + grouped-min exchanges), then splits every group
    to its (f, b) signature.  SCC-mates always share (f, b); a group
    where f == b == m certifies m→v and v→m for all members, so the
    stable partition is EXACTLY the SCC partition with label = min node
    id (since labels are node ids, the group's global-min membership
    forces f == b at the fixpoint — a group can never stabilize with
    f ≠ b).  Node/label state never reaches the driver; only change
    counts do.  Small graphs take a one-task iterative Kosaraju."""
    from ..relational import grouped_agg, planned_join

    nodes = nodes.select_columns([node_col]).materialize()
    edges = edges.select_columns([src_col, dst_col]).materialize()

    if edges.count() <= _LOCAL_GRAPH_MAX_EDGES:
        nrefs = nodes.to_arrow_refs()
        out = ray.remote(_scc_local).remote(
            src_col, dst_col, node_col, scc_col, len(nrefs),
            *nrefs, *edges.to_arrow_refs())
        return rd.from_arrow_refs([out])

    def init_part(t: pa.Table) -> pa.Table:
        return pa.table({node_col: t[node_col],
                         "part": pa.array([0] * len(t), pa.int64())})

    part = nodes.map_batches(init_part, batch_format="pyarrow").materialize()

    for _ in range(max_outer):
        # restrict edges to same-partition endpoints (two joins + filter)
        ep = planned_join(edges, part, on=[src_col], right_on=[node_col]) \
            .map_batches(lambda t: pa.table({src_col: t[src_col],
                                             dst_col: t[dst_col],
                                             "ps": t["part"]}),
                         batch_format="pyarrow")
        ep = planned_join(ep, part.map_batches(
                lambda t: t.rename_columns([node_col, "pd"]),
                batch_format="pyarrow"), on=[dst_col], right_on=[node_col]) \
            .map_batches(lambda t: t.filter(pc.equal(t["ps"], t["pd"]))
                         .select([src_col, dst_col]),
                         batch_format="pyarrow").materialize()

        f = _min_prop_fixpoint(ep, nodes, True, max_inner, node_col,
                               src_col, dst_col, "f")
        bwd = _min_prop_fixpoint(ep, nodes, False, max_inner, node_col,
                                 src_col, dst_col, "b")
        fb = planned_join(f, bwd, on=[node_col], right_on=[node_col]) \
            .materialize()

        n_open = fb.map_batches(
            lambda t: t.filter(pc.not_equal(t["f"], t["b"])),
            batch_format="pyarrow").count()
        if n_open == 0:
            return fb.map_batches(
                lambda t: pa.table({node_col: t[node_col],
                                    scc_col: t["f"]}),
                batch_format="pyarrow")
        # refine: new partition id = min node of each (f, b) group
        rep = grouped_agg(fb, ["f", "b"], mins=[node_col])
        part = planned_join(
            fb, rep.map_batches(
                lambda t: t.rename_columns(["rf", "rb", "part"]),
                batch_format="pyarrow"),
            on=["f", "b"], right_on=["rf", "rb"],
        ).map_batches(
            lambda t: pa.table({node_col: t[node_col], "part": t["part"]}),
            batch_format="pyarrow").materialize()
    raise RuntimeError(
        f"scc: partition refinement did not stabilize in {max_outer} rounds")
