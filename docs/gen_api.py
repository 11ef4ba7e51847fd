#!/usr/bin/env python
"""Generate the API reference (docs/api/*.md) from the package's live
docstrings — the markdown analogue of the reference's Sphinx tree
(``docs/api/*.rst``).  Run from the repo root:

    python docs/gen_api.py

One page per module: every public function/class defined IN that module
(imports excluded), with its signature and full docstring.  Query-registry
modules (dataq/mlq/relq/driver_api) list their registered pipelines
instead of every helper.
"""

from __future__ import annotations

import inspect
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (module path, one-line page summary)
MODULES = [
    ("rdflib_r2r_ray.sources.tables", "Logical-table readers (parquet/CSV/JSON, N-Triples/N-Quads/Turtle, Arrow IPC)"),
    ("rdflib_r2r_ray.sources.sqlview", "SQL-view logical tables over parquet"),
    ("rdflib_r2r_ray.sources.sqldb", "Partitioned live-database source (sqlite/DuckDB key-range fragments)"),
    ("rdflib_r2r_ray.mapping", "Mapping model + direct-mapping generator"),
    ("rdflib_r2r_ray.r2rml", "R2RML Turtle loader"),
    ("rdflib_r2r_ray.template", "IRI template minting + inversion"),
    ("rdflib_r2r_ray.terms", "RDF term lexicalization"),
    ("rdflib_r2r_ray.pipelines.kg", "KG-construction pipelines (emit, join, materialize)"),
    ("rdflib_r2r_ray.stages.emit", "Vectorized triple emission stage"),
    ("rdflib_r2r_ray.stages.extract", "HTML synthesis/extraction stages"),
    ("rdflib_r2r_ray.stages.linker", "Entity linking stage"),
    ("rdflib_r2r_ray.stages.canonicalize", "Entity canonicalization stage"),
    ("rdflib_r2r_ray.stages.dedup", "Dedup family: exact, MinHash-LSH, SimHash, embedding, exchanges"),
    ("rdflib_r2r_ray.stages.text", "Text analysis: langid, quality, tokens, BM25, PII, Gopher rules"),
    ("rdflib_r2r_ray.stages.ann", "Similarity search: brute/LSH/IVF/PQ top-k, kNN graph/classify, k-means"),
    ("rdflib_r2r_ray.stages.sketch", "Sketches: HLL, CMS heavy hitters, MRL quantiles"),
    ("rdflib_r2r_ray.stages.graph", "Distributed graph suite: PageRank, components, BFS, k-core, ..."),
    ("rdflib_r2r_ray.stages.multimodal", "Multimodal decode/feature stages over binary payload columns"),
    ("rdflib_r2r_ray.stages.codecs", "Dependency-free PNG/BMP/GIF/JPEG/WAV/AVI codecs"),
    ("rdflib_r2r_ray.relational", "Relational operator layer: joins, grouped aggregation, windows"),
    ("rdflib_r2r_ray.bgp", "Basic graph pattern matcher + plugin hook"),
    ("rdflib_r2r_ray.paths", "Property path algebra"),
    ("rdflib_r2r_ray.sparql", "SPARQL front end (parser, expression compiler, executor, update)"),
    ("rdflib_r2r_ray.shacl", "SHACL-lite validation"),
    ("rdflib_r2r_ray.state.checkpoint", "Checkpointed sinks: partitioned parquet/NT/NQ/Turtle/JSONL, resume"),
    ("rdflib_r2r_ray.store", "Graph store facade"),
    ("rdflib_r2r_ray.cli", "CLI: construct / sparql / update / validate / serve"),
]

REGISTRIES = [
    ("rdflib_r2r_ray.driver_api", "KG + SPARQL pipelines"),
    ("rdflib_r2r_ray.relq", "Relational pipelines"),
    ("rdflib_r2r_ray.dataq", "Curation / dedup / graph / multimodal / sketch pipelines"),
    ("rdflib_r2r_ray.mlq", "ML evaluation / training pipelines"),
]


def _public_members(mod):
    for name in sorted(vars(mod)):
        if name.startswith("_"):
            continue
        obj = vars(mod)[name]
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue
        yield name, obj


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def module_page(modname: str, summary: str) -> str:
    import importlib

    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", "", summary, ""]
    if mod.__doc__:
        lines += [mod.__doc__.strip(), ""]
    for name, obj in _public_members(mod):
        kind = "class" if inspect.isclass(obj) else "def"
        lines.append(f"## `{kind} {name}{_sig(obj) if kind == 'def' else ''}`")
        lines.append("")
        doc = inspect.getdoc(obj)
        if doc:
            lines += [doc, ""]
        if inspect.isclass(obj):
            for mname in ("__init__", "__call__"):
                m = vars(obj).get(mname)
                if m and inspect.isfunction(m):
                    lines.append(f"### `{name}.{mname}{_sig(m)}`")
                    lines.append("")
                    mdoc = inspect.getdoc(m)
                    if mdoc:
                        lines += [mdoc, ""]
    return "\n".join(lines) + "\n"


def registry_page(modname: str, summary: str) -> str:
    import importlib

    mod = importlib.import_module(modname)
    qs = mod.queries()
    lines = [f"# `{modname}` — {summary}", "",
             f"{len(qs)} registered pipelines.  Each takes an ``sf_dir`` of "
             "parquet tables and returns a ``ray.data.Dataset``; the "
             "matching entry in ``oracle_sql()`` is the DuckDB twin the "
             "driver compares against.", ""]
    for name, fn in sorted(qs.items()):
        doc = inspect.getdoc(fn) or ""
        first = doc.split("\n\n")[0].replace("\n", " ")
        lines.append(f"- **{name}** — {first}")
    return "\n".join(lines) + "\n"


def main() -> None:
    outdir = os.path.join(REPO, "docs", "api")
    os.makedirs(outdir, exist_ok=True)
    index = ["# API reference", "",
             "Generated from live docstrings by `docs/gen_api.py`.", "",
             "## Modules", ""]
    for modname, summary in MODULES:
        page = module_page(modname, summary)
        fname = modname.split(".", 1)[1].replace(".", "_") + ".md"
        with open(os.path.join(outdir, fname), "w") as f:
            f.write(page)
        index.append(f"- [`{modname}`]({fname}) — {summary}")
    index += ["", "## Pipeline registries", ""]
    for modname, summary in REGISTRIES:
        page = registry_page(modname, summary)
        fname = modname.split(".", 1)[1].replace(".", "_") + ".md"
        with open(os.path.join(outdir, fname), "w") as f:
            f.write(page)
        index.append(f"- [`{modname}`]({fname}) — {summary}")
    with open(os.path.join(outdir, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(MODULES) + len(REGISTRIES) + 1} pages to {outdir}")


if __name__ == "__main__":
    main()
