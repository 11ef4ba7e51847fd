"""Unit tests for the distributed graph analytics (stages/graph.py):
fixed-point PageRank vs a literal single-process reference iteration."""

import pyarrow as pa


def _ref_pagerank(edges, n_nodes, out_degree, iters=5, scale=10**12,
                  damping_pct=85):
    """Driver-side literal re-implementation of the fixed-point recurrence
    (dict arithmetic, same floor divisions) — the Python oracle."""
    base_all = scale // n_nodes
    base = ((100 - damping_pct) * base_all) // 100
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    r = {v: base_all for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for src, dst in edges:
            s[dst] += r[src] // out_degree
        r = {v: base + (damping_pct * s[v]) // 100 for v in nodes}
    return r


import pytest


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_pagerank_matches_reference_recurrence(ray_session, monkeypatch, path):
    import ray.data as rd

    from rdflib_r2r_ray.stages import graph as G
    from rdflib_r2r_ray.stages.graph import pagerank

    if path == "distributed":  # force the join+exchange iteration
        monkeypatch.setattr(G, "_LOCAL_PR_MAX_EDGES", 0)

    # 6-node graph, constant out-degree 2 (a ring with chords) — includes a
    # node pair that concentrates rank and spreads across >1 block.
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4),
             (3, 4), (3, 5), (4, 5), (4, 0), (5, 0), (5, 1)]
    et = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                   "dst": pa.array([e[1] for e in edges], pa.int64())})
    nt = pa.table({"node": pa.array(list(range(6)), pa.int64())})
    # multiple blocks to exercise the exchange / join paths
    eds = rd.from_arrow(et).repartition(3)
    nds = rd.from_arrow(nt).repartition(2)

    got = {r["node"]: r["rank"]
           for r in pagerank(eds, nds, n_nodes=6, out_degree=2,
                             iters=5).take_all()}
    want = _ref_pagerank(edges, n_nodes=6, out_degree=2, iters=5)
    assert got == want
    # sanity: total mass conserved up to floor-division loss, all positive
    assert all(v > 0 for v in got.values())


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_kcore_peels_tree_fringe(ray_session, monkeypatch, path):
    """Triangle (1,2,3) with a pendant path 3-4-5: the 2-core is exactly
    the triangle with degree 2 each; the path peels off over two rounds."""
    import ray.data as rd

    from rdflib_r2r_ray.stages import graph as G
    from rdflib_r2r_ray.stages.graph import kcore

    if path == "distributed":
        monkeypatch.setattr(G, "_LOCAL_GRAPH_MAX_EDGES", 0)
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    et = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                   "b": pa.array([e[1] for e in edges], pa.int64())})
    got = {r["node"]: r["deg"]
           for r in kcore(rd.from_arrow(et), k=2, max_rounds=4).take_all()}
    assert got == {1: 2, 2: 2, 3: 2}


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_kcore_unconverged_raises(ray_session, monkeypatch, path):
    """A long path under an impossible round budget must fail loudly at
    call time, not return a superset of the core."""
    import pytest as _pytest
    import ray.data as rd

    from rdflib_r2r_ray.stages import graph as G
    from rdflib_r2r_ray.stages.graph import kcore

    if path == "distributed":
        monkeypatch.setattr(G, "_LOCAL_GRAPH_MAX_EDGES", 0)
    # path 0-1-2-...-9: 2-core is empty but peeling needs ~5 rounds
    edges = [(i, i + 1) for i in range(9)]
    et = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                   "b": pa.array([e[1] for e in edges], pa.int64())})
    with _pytest.raises(RuntimeError, match="did not converge"):
        kcore(rd.from_arrow(et), k=2, max_rounds=2)


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_triangle_counts_both_paths(ray_session, monkeypatch, path):
    """Two triangles sharing node 3 (+ a pendant edge): shared node counts
    both, pendant nodes count zero (absent)."""
    import ray.data as rd

    from rdflib_r2r_ray.stages import graph as G
    from rdflib_r2r_ray.stages.graph import triangle_counts

    if path == "distributed":
        monkeypatch.setattr(G, "_LOCAL_GRAPH_MAX_EDGES", 0)
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5), (5, 6)]
    et = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                   "b": pa.array([e[1] for e in edges], pa.int64())})
    got = {r["node"]: r["n_tri"]
           for r in triangle_counts(rd.from_arrow(et)).take_all()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_pagerank_sink_only_nodes_get_base(ray_session):
    """A node with no in-links must end at exactly the teleport base."""
    import ray.data as rd

    from rdflib_r2r_ray.stages.graph import PR_SCALE, pagerank

    # node 9 points into the 3-cycle but nothing points back at it
    edges = [(0, 1), (1, 2), (2, 0), (9, 0)]
    et = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                   "dst": pa.array([e[1] for e in edges], pa.int64())})
    nt = pa.table({"node": pa.array([0, 1, 2, 9], pa.int64())})

    got = {r["node"]: r["rank"]
           for r in pagerank(rd.from_arrow(et), rd.from_arrow(nt),
                             n_nodes=4, out_degree=1, iters=5).take_all()}
    base = (15 * (PR_SCALE // 4)) // 100
    assert got[9] == base
    assert got[0] > got[9]


def test_owl_sameas_closure_nontrivial(ray_session):
    """kg_owl_sameas must do real work: the diverted graph differs from the
    canonical mention graph (variant IRIs present, incl. 2-hop e3/ chains),
    and canonicalization restores it exactly (the oracle identity)."""
    from rdflib_r2r_ray.driver_api import q_kg_mentions, q_kg_owl_sameas

    sf = "/root/testdata/sf0.001"
    mentions = {tuple(r.values()) for r in q_kg_mentions(sf).take_all()}
    canon = {tuple(r.values()) for r in q_kg_owl_sameas(sf).take_all()}
    assert canon == mentions
    # the intermediate diversion is non-trivial: some entity slugs have
    # length % 3 == 2 (two-hop chain) — guards against divert degenerating
    slugs = {s[16:-1] for _, _, s in mentions}
    assert any(len(s) % 3 == 2 for s in slugs)
    assert any(len(s) % 3 == 1 for s in slugs)


def _ref_hits(edges, nodes, iters=3, scale=10**6):
    """Driver-side literal HITS recurrence (dict arithmetic) — the Python
    oracle for stages/graph.hits."""
    h = {v: scale for v in nodes}
    a = {v: scale for v in nodes}
    for _ in range(iters):
        hn = {v: 0 for v in nodes}
        for s, d in edges:
            hn[s] += a[d]
        h = hn
        an = {v: 0 for v in nodes}
        for s, d in edges:
            an[d] += h[s]
        a = an
    return h, a


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_hits_matches_reference_recurrence(ray_session, monkeypatch, path):
    import ray.data as rd

    from rdflib_r2r_ray.stages import graph as G
    from rdflib_r2r_ray.stages.graph import hits

    if path == "distributed":  # force the join+exchange iteration
        monkeypatch.setattr(G, "_LOCAL_PR_MAX_EDGES", 0)

    # asymmetric digraph with a pure hub (0), a pure authority (3) and a
    # node with no edges at all (5) — exercises the left-join zero fill
    edges = [(0, 1), (0, 2), (0, 3), (1, 3), (2, 3), (4, 1), (3, 4)]
    nodes = list(range(6))
    et = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                   "dst": pa.array([e[1] for e in edges], pa.int64())})
    nt = pa.table({"node": pa.array(nodes, pa.int64())})
    eds = rd.from_arrow(et).repartition(3)
    nds = rd.from_arrow(nt).repartition(2)

    got = {r["node"]: (r["hub"], r["auth"])
           for r in hits(eds, nds, iters=3).take_all()}
    h, a = _ref_hits(edges, nodes, iters=3)
    assert got == {v: (h[v], a[v]) for v in nodes}
    assert got[5] == (0, 0)          # isolated node zero-filled both sides
    assert got[0][0] > 0 and got[0][1] == 0   # pure hub


def _ref_lp_modes(edges, iters=3):
    """Literal mode-LP recurrence (dict arithmetic) — the Python oracle."""
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {v: v for v in nbrs}
    for _ in range(iters):
        new = {}
        for v, ns in nbrs.items():
            cnt = {}
            for n in ns:
                cnt[lab[n]] = cnt.get(lab[n], 0) + 1
            new[v] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = new
    return lab


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_label_prop_modes_matches_reference(ray_session, monkeypatch, path):
    import ray.data as rd

    from rdflib_r2r_ray.stages import graph as G
    from rdflib_r2r_ray.stages.graph import label_propagation_modes

    if path == "distributed":
        monkeypatch.setattr(G, "_LOCAL_GRAPH_MAX_EDGES", 0)

    # two 4-cliques joined by one bridge edge: LP should give each clique a
    # shared label without merging them across the bridge
    clique1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    clique2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = clique1 + clique2 + [(3, 10)]
    et = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                   "b": pa.array([e[1] for e in edges], pa.int64())})
    eds = rd.from_arrow(et).repartition(3)

    got = {r["node"]: r["label"]
           for r in label_propagation_modes(eds, iters=3).take_all()}
    want = _ref_lp_modes(edges, iters=3)
    assert got == want
    assert len({got[v] for v in range(3)}) == 1          # clique 1 agrees
    assert len({got[v] for v in range(11, 14)}) == 1     # clique 2 agrees
    assert got[0] != got[13]                             # bridge didn't merge


def _ref_ppr(edges, seeds, out_degree, iters=5, scale=10**12,
             damping_pct=85):
    """Literal personalized-PageRank recurrence (dict arithmetic, same
    floor divisions) — the Python oracle for personalized_pagerank."""
    seed_all = scale // len(seeds)
    restart = ((100 - damping_pct) * seed_all) // 100
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    r = {v: (seed_all if v in seeds else 0) for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for src, dst in edges:
            s[dst] += r[src] // out_degree
        r = {v: (restart if v in seeds else 0)
             + (damping_pct * s[v]) // 100 for v in nodes}
    return r


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_personalized_pagerank_matches_recurrence(ray_session, monkeypatch,
                                                  path):
    import ray.data as rd

    from rdflib_r2r_ray.stages import graph as G
    from rdflib_r2r_ray.stages.graph import personalized_pagerank

    if path == "distributed":
        monkeypatch.setattr(G, "_LOCAL_PR_MAX_EDGES", 0)

    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4),
             (3, 4), (3, 5), (4, 5), (4, 0), (5, 0), (5, 1)]
    et = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                   "dst": pa.array([e[1] for e in edges], pa.int64())})
    nt = pa.table({"node": pa.array(list(range(6)), pa.int64())})
    eds = rd.from_arrow(et).repartition(3)
    nds = rd.from_arrow(nt).repartition(2)

    got = {r["node"]: r["rank"]
           for r in personalized_pagerank(eds, nds, seeds=[0, 3],
                                          out_degree=2, iters=5).take_all()}
    want = _ref_ppr(edges, seeds={0, 3}, out_degree=2, iters=5)
    assert got == want
    # teleport mass is seed-only: non-seed sinks hold strictly less rank
    # than seeds, and every node reachable from a seed has positive rank
    assert got[0] > got[1] and got[3] > got[5]
    assert all(v >= 0 for v in got.values())


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_scc_two_cycles_and_bridge(ray_session, monkeypatch, path):
    """Two directed cycles {0,1,2} and {5,6} joined by one-way bridges
    2->5 and 6->9 (9 is a sink, 4 isolated): SCCs are {0,1,2}, {5,6},
    and singletons {4}, {9} — weak components would merge everything
    but 4."""
    import ray.data as rd

    from rdflib_r2r_ray.stages import graph as G
    from rdflib_r2r_ray.stages.graph import scc

    if path == "distributed":
        monkeypatch.setattr(G, "_LOCAL_GRAPH_MAX_EDGES", 0)

    edges = [(0, 1), (1, 2), (2, 0), (2, 5), (5, 6), (6, 5), (6, 9)]
    et = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                   "dst": pa.array([e[1] for e in edges], pa.int64())})
    nt = pa.table({"node": pa.array([0, 1, 2, 4, 5, 6, 9], pa.int64())})
    eds = rd.from_arrow(et).repartition(3)
    nds = rd.from_arrow(nt).repartition(2)

    got = {r["node"]: r["scc"] for r in scc(eds, nds).take_all()}
    assert got == {0: 0, 1: 0, 2: 0, 4: 4, 5: 5, 6: 5, 9: 9}


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_scc_dag_is_all_singletons(ray_session, monkeypatch, path):
    import ray.data as rd

    from rdflib_r2r_ray.stages import graph as G
    from rdflib_r2r_ray.stages.graph import scc

    if path == "distributed":
        monkeypatch.setattr(G, "_LOCAL_GRAPH_MAX_EDGES", 0)

    edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
    et = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                   "dst": pa.array([e[1] for e in edges], pa.int64())})
    nt = pa.table({"node": pa.array([0, 1, 2, 3], pa.int64())})
    got = {r["node"]: r["scc"]
           for r in scc(rd.from_arrow(et), rd.from_arrow(nt)).take_all()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
