"""BGP execution over a triples Dataset: pattern matching, joins on shared
variables, property paths, alternative-branch unions."""

import pyarrow as pa
import pytest

from rdflib_r2r_ray.paths import Alt, Inv, Seq, Var


def _graph():
    import ray.data as rd

    rows = [
        ("<a>", "<knows>", "<b>"),
        ("<b>", "<knows>", "<c>"),
        ("<c>", "<knows>", "<d>"),
        ("<a>", "<likes>", "<c>"),
        ("<b>", "<name>", '"Bob"'),
        ("<c>", "<name>", '"Carol"'),
    ]
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows]),
                "pred": pa.array([r[1] for r in rows]),
                "obj": pa.array([r[2] for r in rows]),
            }
        )
    )


def _rows(ds):
    return sorted(tuple(sorted(r.items())) for r in ds.take_all())


def test_single_pattern_constants_filter(ray_session):
    from rdflib_r2r_ray.bgp import execute_bgp

    out = execute_bgp(_graph(), [(Var("x"), "<knows>", Var("y"))])
    got = {(r["x"], r["y"]) for r in out.take_all()}
    assert got == {("<a>", "<b>"), ("<b>", "<c>"), ("<c>", "<d>")}


def test_join_on_shared_variable(ray_session):
    from rdflib_r2r_ray.bgp import execute_bgp

    out = execute_bgp(
        _graph(),
        [(Var("x"), "<knows>", Var("y")), (Var("y"), "<name>", Var("n"))],
    )
    got = {(r["x"], r["y"], r["n"]) for r in out.take_all()}
    assert got == {("<a>", "<b>", '"Bob"'), ("<b>", "<c>", '"Carol"')}


def test_sequence_path_two_hop(ray_session):
    from rdflib_r2r_ray.bgp import execute_bgp

    out = execute_bgp(_graph(), [(Var("x"), Seq("<knows>", "<knows>"), Var("z"))])
    got = {(r["x"], r["z"]) for r in out.take_all()}
    assert got == {("<a>", "<c>"), ("<b>", "<d>")}


def test_alternative_path_union(ray_session):
    from rdflib_r2r_ray.bgp import execute_bgp

    out = execute_bgp(_graph(), [("<a>", Alt("<knows>", "<likes>"), Var("y"))])
    got = {r["y"] for r in out.take_all()}
    assert got == {"<b>", "<c>"}


def test_inverse_path(ray_session):
    from rdflib_r2r_ray.bgp import execute_bgp

    out = execute_bgp(_graph(), [(Var("y"), Inv("<knows>"), "<a>")])
    # ^knows means: <a> knows ?y ... inverted pattern binds y as the object
    got = {r["y"] for r in out.take_all()}
    assert got == {"<b>"}


def test_broadcast_join_path(ray_session):
    from rdflib_r2r_ray.bgp import execute_bgp

    out = execute_bgp(
        _graph(),
        [(Var("x"), "<knows>", Var("y")), (Var("y"), "<name>", Var("n"))],
        broadcast_threshold=100,
    )
    got = {(r["x"], r["n"]) for r in out.take_all()}
    assert got == {("<a>", '"Bob"'), ("<b>", '"Carol"')}


def test_disconnected_bgp_cross_product(ray_session):
    """Disconnected patterns produce the cartesian product of their match
    sets (reference queryJoin FROM-list merge)."""
    from rdflib_r2r_ray.bgp import execute_bgp

    rows = execute_bgp(
        _graph(),
        [(Var("x"), "<knows>", Var("y")), (Var("p"), "<name>", Var("q"))],
    ).take_all()
    knows = {(r["x"], r["y"]) for r in rows}
    names = {(r["p"], r["q"]) for r in rows}
    n_knows = len(knows)
    n_names = len(names)
    assert len(rows) == n_knows * n_names
    assert all(set(r) == {"x", "y", "p", "q"} for r in rows)


def test_bgp_plugin_hook_rewrites_pattern(ray_session):
    """X4 plugin surface (reference SQLConverterPlugin,
    sql_converter.py:235,307-312): a registered matcher claims patterns on a
    VIRTUAL predicate and serves their bindings from a rewrite — here
    <shouts> is derived from <name> by uppercasing — and its relation joins
    normally with default-matched patterns."""
    import pyarrow.compute as pc

    from rdflib_r2r_ray.bgp import (
        clear_bgp_plugins, execute_bgp, register_bgp_plugin)
    from rdflib_r2r_ray.paths import Var

    g = _graph()

    def shouts_matcher(triples, pattern):
        s, p, o = pattern
        if p != "<shouts>":
            return None  # pass -> default matcher
        base = triples.filter(expr="pred == '<name>'")
        def rewrite(b):
            return pa.table({
                str(s.name): b["subj"],
                str(o.name): pc.utf8_upper(b["obj"]),
            })
        return base.map_batches(rewrite, batch_format="pyarrow"), [s.name, o.name]

    register_bgp_plugin(shouts_matcher)
    try:
        out = execute_bgp(g, [
            (Var("x"), "<knows>", Var("y")),
            (Var("y"), "<shouts>", Var("loud")),
        ])
        got = {(r["x"], r["y"], r["loud"]) for r in out.take_all()}
        assert got == {("<a>", "<b>", '"BOB"'), ("<b>", "<c>", '"CAROL"')}
    finally:
        clear_bgp_plugins()

    # after clearing, the virtual predicate matches nothing (default scan)
    out2 = execute_bgp(g, [(Var("y"), "<shouts>", Var("loud"))])
    assert out2.count() == 0
