"""Property-path resolution (plan-time BGP rewrite).

Reimplements the reference's path semantics
(``rdflib_r2r/sql_converter.py:197-233``, tested in
``tests/test_resolve_path_in_triples.py``) without rdflib types:

- ``Seq(p1, p2, ...)``  — sequence path ``p1/p2``: rewritten to a chain of
  triples through fresh blank-node variables.
- ``Alt(p1, p2, ...)``  — alternative path ``p1|p2``: forks the BGP, one
  branch per alternative (branches union at execution).
- ``Inv(p)``            — inverse path ``^p``: swaps subject and object.
- Transitive paths (``p*``/``p+``) raise ``NotImplementedError`` — same gap
  as the reference (``sql_converter.py:229-230``, ``plan.md:22``).

A triple pattern is any ``(s, p, o)`` tuple whose predicate is either a
concrete term (str/Var) or a path object. Pure plan-time logic: the
rewritten BGPs compile to filter+join pipelines over the triples Dataset
(see ``driver_api.q_kg_bgp_join`` for the execution shape).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Callable, Generator, List, Optional, Sequence, Tuple, Union


@dataclass(frozen=True)
class Var:
    """A query variable (named)."""

    name: str


@dataclass(frozen=True)
class BNodeVar:
    """A fresh intermediate variable minted during path expansion."""

    name: str


class Path:
    pass


@dataclass(frozen=True)
class Seq(Path):
    args: Tuple

    def __init__(self, *args):
        object.__setattr__(self, "args", tuple(args))


@dataclass(frozen=True)
class Alt(Path):
    args: Tuple

    def __init__(self, *args):
        object.__setattr__(self, "args", tuple(args))


@dataclass(frozen=True)
class Inv(Path):
    arg: object


@dataclass(frozen=True)
class NegSet(Path):
    """Negated property set ``!<p>`` / ``!(<p1>|<p2>)`` — matches any
    predicate NOT in the set (forward members only; inverse members raise
    at parse time).  BEYOND the reference, which has no path support."""

    iris: Tuple[str, ...]


@dataclass(frozen=True)
class Transitive(Path):
    """``p*`` / ``p+`` — declared for completeness; resolution raises."""

    arg: object
    min_hops: int = 1


Triple = Tuple[object, object, object]
BGP = Sequence[Triple]

_counter = itertools.count()


def _fresh() -> BNodeVar:
    return BNodeVar(f"__pb{next(_counter)}")


def resolve_paths(
    triples: BGP, exclude: Optional[Callable[[Path], bool]] = None
) -> Generator[List[Triple], None, None]:
    """Yield every path-free BGP alternative (one per Alt combination).

    Mirrors the reference's generator structure: the first triple is
    rewritten, then resolution recurses over the remainder; ``exclude``
    lets a caller keep chosen paths unexpanded (the reference uses this for
    its precomputed chain predicates, M9)."""
    exclude = exclude or (lambda p: False)
    triples = list(triples)
    if not triples:
        yield []
        return
    t0 = triples[0]
    s, p, o = t0
    if isinstance(p, Seq) and not exclude(p):
        replacement: List[Triple] = []
        subj = s
        for p1 in p.args[:-1]:
            mid = _fresh()
            replacement.append((subj, p1, mid))
            subj = mid
        replacement.append((subj, p.args[-1], o))
        yield from resolve_paths(replacement + triples[1:], exclude)
    elif isinstance(p, Alt) and not exclude(p):
        for p1 in p.args:
            yield from resolve_paths([(s, p1, o)] + triples[1:], exclude)
    elif isinstance(p, Inv) and not exclude(p):
        if isinstance(o, (str, Var, BNodeVar)):
            yield from resolve_paths([(o, p.arg, s)] + triples[1:], exclude)
        else:
            raise ValueError("Literals not supported as inverse path objects")
    elif isinstance(p, Transitive):
        raise NotImplementedError(
            "transitive property paths are unsupported (reference parity: "
            "sql_converter.py:229-230)"
        )
    elif isinstance(p, NegSet):
        # leaf: match_pattern lowers it to predicate != filters
        for rest in resolve_paths(triples[1:], exclude):
            yield [t0] + rest
    elif isinstance(p, Path) and not exclude(p):
        raise NotImplementedError(f"unsupported path type: {p}")
    else:
        for rest in resolve_paths(triples[1:], exclude):
            yield [t0] + rest
