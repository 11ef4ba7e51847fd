"""Property-path resolution tests — mirrors the reference's
``tests/test_resolve_path_in_triples.py`` cases (sequence, alternative,
inverse, combinations; bnode-renaming-aware comparison)."""

import pytest

from rdflib_r2r_ray.paths import Alt, BNodeVar, Inv, Seq, Transitive, Var, resolve_paths


def canon(bgps):
    """Normalize fresh-bnode names so structurally equal BGPs compare equal."""
    out = []
    for bgp in bgps:
        ren = {}

        def norm(t):
            if isinstance(t, BNodeVar):
                return ren.setdefault(t.name, f"_b{len(ren)}")
            return t

        out.append(tuple((norm(s), norm(p), norm(o)) for s, p, o in bgp))
    return sorted(out)


def test_sequence_path():
    got = canon(resolve_paths([(Var("s"), Seq("p1", "p2"), Var("o"))]))
    want = canon([[(Var("s"), "p1", BNodeVar("x")), (BNodeVar("x"), "p2", Var("o"))]])
    assert got == want


def test_sequence_three():
    [bgp] = list(resolve_paths([(Var("s"), Seq("p1", "p2", "p3"), Var("o"))]))
    assert len(bgp) == 3
    assert bgp[0][0] == Var("s") and bgp[2][2] == Var("o")
    assert bgp[0][2] == bgp[1][0] and bgp[1][2] == bgp[2][0]  # chained


def test_alternative_path_forks():
    got = canon(resolve_paths([(Var("s"), Alt("p1", "p2"), Var("o"))]))
    want = canon([[(Var("s"), "p1", Var("o"))], [(Var("s"), "p2", Var("o"))]])
    assert got == want


def test_inverse_path_swaps():
    got = list(resolve_paths([(Var("s"), Inv("p"), Var("o"))]))
    assert got == [[(Var("o"), "p", Var("s"))]]


def test_inverse_of_sequence():
    # ^(p1/p2) == swap then expand
    got = canon(resolve_paths([(Var("s"), Inv(Seq("p1", "p2")), Var("o"))]))
    want = canon([[(Var("o"), "p1", BNodeVar("x")), (BNodeVar("x"), "p2", Var("s"))]])
    assert got == want


def test_alt_of_seq_combination():
    bgps = list(resolve_paths([(Var("s"), Alt(Seq("a", "b"), "c"), Var("o"))]))
    assert len(bgps) == 2
    lens = sorted(len(b) for b in bgps)
    assert lens == [1, 2]


def test_plain_triples_pass_through():
    bgp = [(Var("s"), "p", Var("o")), (Var("o"), "q", "const")]
    assert list(resolve_paths(bgp)) == [bgp]


def test_multiple_paths_cross_product():
    bgps = list(resolve_paths([
        (Var("a"), Alt("p", "q"), Var("b")),
        (Var("b"), Alt("r", "s"), Var("c")),
    ]))
    assert len(bgps) == 4  # 2 × 2 alternatives


def test_exclude_keeps_path_unexpanded():
    p = Seq("p1", "p2")
    [bgp] = list(resolve_paths([(Var("s"), p, Var("o"))], exclude=lambda x: x is p))
    assert bgp == [(Var("s"), p, Var("o"))]


def test_transitive_raises():
    with pytest.raises(NotImplementedError):
        list(resolve_paths([(Var("s"), Transitive("p"), Var("o"))]))


def test_inverse_literal_object_raises():
    with pytest.raises(ValueError):
        list(resolve_paths([(Var("s"), Inv("p"), 42)]))
