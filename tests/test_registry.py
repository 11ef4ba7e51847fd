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


def test_api_docs_generate(tmp_path, monkeypatch):
    """docs/gen_api.py regenerates the full API reference from live
    docstrings (one page per module + registry, plus the index)."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_api", os.path.join(repo, "docs", "gen_api.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    monkeypatch.setattr(gen, "REPO", str(tmp_path))
    os.makedirs(tmp_path / "docs", exist_ok=True)
    gen.main()
    out = tmp_path / "docs" / "api"
    pages = sorted(p.name for p in out.iterdir())
    assert "index.md" in pages and "sparql.md" in pages
    assert len(pages) == len(gen.MODULES) + len(gen.REGISTRIES) + 1
    # registry pages enumerate every registered pipeline
    dataq_doc = (out / "dataq.md").read_text()
    from rdflib_r2r_ray import dataq
    assert all(f"**{n}**" in dataq_doc for n in dataq.queries())
