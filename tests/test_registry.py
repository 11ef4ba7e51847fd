"""Named scalar-kernel registry (reference sqlfunc pass-through, F9/X4)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from rdflib_r2r_ray.functions import registry as reg


def test_builtins_and_apply(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"a": ["Hello", " World "], "b": ["X", "Y"]}))
    out = reg.apply(ds, "lo", "lower", "a")
    out = reg.apply(out, "cat", "CONCAT", "a", "b")
    rows = out.take_all()
    assert [r["lo"] for r in rows] == ["hello", " world "]
    assert [r["cat"] for r in rows] == ["HelloX", " World Y"]


def test_user_registration_ships_to_workers(ray_session):
    import ray.data as rd

    reg.register("REV3", lambda c: pa.array([None if v is None else v[::-1] for v in c.to_pylist()]), overwrite=True)
    ds = rd.from_arrow(pa.table({"a": ["abc", "xy"]}))
    rows = reg.apply(ds, "r", "rev3", "a").take_all()
    assert [r["r"] for r in rows] == ["cba", "yx"]


def test_unknown_function_fails_at_plan_time():
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"a": ["x"]}))
    with pytest.raises(KeyError):
        reg.apply(ds, "o", "NOPE", "a")


def test_duplicate_registration_guard():
    with pytest.raises(ValueError):
        reg.register("LOWER", lambda c: c)
