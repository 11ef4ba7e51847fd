"""Command-line entry points: ``python -m rdflib_r2r_ray <command>``.

The reference is consumed as a library (an rdflib Store plugin); its users
drive it from scripts.  This CLI covers the same end-to-end surface as a
standalone tool over a directory of tables:

- ``construct``: R2RML TTL (or direct mapping) over a table directory →
  deduplicated, partitioned triples (parquet or N-Triples), resumable.
- ``sparql``: run a SPARQL query string/file against the mapped graph and
  print or write the solution table.

The CLI owns its Ray session (the driver contract forbids ``ray.init`` in
library code; scripts guard with ``is_initialized``)."""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import ray
import ray.data as rd


def _init_ray(num_cpus: Optional[int]) -> None:
    from .rayser import register_for_ray

    register_for_ray()  # ship the package by value to workers (any cwd)
    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def _table_paths(data_dir: str) -> Dict[str, str]:
    """All physical tables in the data directory, name → path."""
    out: Dict[str, str] = {}
    for pat in ("*.parquet", "*.pq", "*.csv", "*.json", "*.jsonl", "*.ndjson"):
        for p in glob.glob(os.path.join(data_dir, pat)):
            out[os.path.splitext(os.path.basename(p))[0]] = p
    return out


def _load_mapping(args):
    """(Mapping, views) from --mapping TTL, or a direct mapping from the
    parquet footers (``--direct``; reference direct-mapping generator)."""
    from .mapping import direct_mapping
    from .r2rml import load_r2rml

    if args.mapping:
        with open(args.mapping) as f:
            return load_r2rml(f.read(), base=args.base or "")
    if not args.direct:
        raise SystemExit("pass --mapping FILE.ttl or --direct")
    import pyarrow.parquet as pq

    paths = _table_paths(args.data)
    names = args.tables.split(",") if args.tables else sorted(paths)
    schemas: Dict[str, pa.Schema] = {}
    for n in names:
        if n not in paths:
            raise SystemExit(f"table {n!r} not found in {args.data}")
        if not paths[n].endswith((".parquet", ".pq")):
            raise SystemExit("--direct needs parquet tables (schema from footer)")
        schemas[n] = pq.read_schema(paths[n])
    pks = {}
    for spec in args.pk or []:
        t, _, cols = spec.partition("=")
        pks[t] = cols.split(",")
    fks: Dict[str, List] = {}
    for spec in args.fk or []:
        # child:col[,col]->parent:col[,col]
        child, _, parent = spec.partition("->")
        ct, _, ccols = child.partition(":")
        pt, _, pcols = parent.partition(":")
        fks.setdefault(ct, []).append((ccols.split(","), pt, pcols.split(",")))
    return direct_mapping(schemas, pks, fks, base=args.base or "http://example.com/base/"), {}


def _build_graph(args) -> rd.Dataset:
    """Load every table the mapping touches (views included) and emit the
    full triples Dataset through the vectorized rule engine."""
    if not args.data:
        raise SystemExit("pass --data DIR (directory of tables)")
    from .pipelines.kg import emit_graph
    from .sources.sqlview import view_dataset
    from .sources.tables import read_logical_table

    mapping, views = _load_mapping(args)
    paths = _table_paths(args.data)

    needed = set(mapping.by_table())
    for tm in mapping.triples_maps:
        for pm in tm.pomaps:
            if pm.object.kind == "ref":
                needed.add(pm.object.parent_table)

    cols: Dict[str, set] = {}
    for tm in mapping.triples_maps:
        cols.setdefault(tm.table, set()).update(tm.columns())
        for pm in tm.pomaps:
            if pm.object.kind == "ref":
                pcols = {p for _, p in pm.object.join}
                if pm.object.parent_subject is not None:
                    pcols.update(pm.object.parent_subject.columns())
                cols.setdefault(pm.object.parent_table, set()).update(pcols)

    datasets: Dict[str, rd.Dataset] = {}
    for name in needed:
        if name in views:
            parquet_tables = {t: p for t, p in paths.items()
                              if p.endswith((".parquet", ".pq"))}
            datasets[name] = view_dataset(views[name], args.data, parquet_tables)
        elif name in paths:
            want = sorted(cols.get(name, ())) or None
            datasets[name] = read_logical_table(paths[name], columns=want)
        else:
            raise SystemExit(f"logical table {name!r} not found in {args.data}")
    return emit_graph(datasets, mapping)


def cmd_construct(args) -> int:
    from .pipelines.kg import materialize_graph
    from .state.checkpoint import write_ntriples

    _init_ray(args.num_cpus)
    triples = _build_graph(args)
    if args.format == "nt":
        report = write_ntriples(triples, args.out,
                                num_partitions=args.num_partitions,
                                resume=not args.no_resume)
    else:
        report = materialize_graph(triples, args.out,
                                   num_partitions=args.num_partitions,
                                   resume=not args.no_resume)
    print(json.dumps(report))
    return 0


def cmd_sparql(args) -> int:
    from . import sparql

    _init_ray(args.num_cpus)
    if args.query_file:
        with open(args.query_file) as f:
            query = f.read()
    elif args.query:
        query = args.query
    else:
        raise SystemExit("pass --query STR or --query-file FILE")
    out = sparql.execute(_load_graph(args), query)
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
        return 0
    df = out.limit(args.print_limit).to_pandas() if args.print_limit else out.to_pandas()
    df.to_csv(sys.stdout, index=False)
    return 0


def _load_graph(args) -> rd.Dataset:
    """Shared graph-input resolution: an exported N-Triples file (already a
    set) or the mapped tables (deduplicated — multiple rules may emit the
    same triple)."""
    from .stages.dedup import distinct_on

    if args.graph_nt:
        from .sources.tables import read_ntriples

        return read_ntriples(args.graph_nt)
    triples = _build_graph(args)
    return distinct_on(triples.select_columns(["subj", "pred", "obj"]),
                       ["subj", "pred", "obj"])


def cmd_update(args) -> int:
    from . import sparql
    from .state.checkpoint import write_ntriples

    _init_ray(args.num_cpus)
    if args.update_file:
        with open(args.update_file) as f:
            update_str = f.read()
    elif args.update:
        update_str = args.update
    else:
        raise SystemExit("pass --update STR or --update-file FILE")
    out = sparql.update(_load_graph(args), update_str)
    report = write_ntriples(out, args.out, num_partitions=args.num_partitions,
                            resume=False)
    print(json.dumps(report))
    return 0


def cmd_validate(args) -> int:
    import json as _json

    from . import shacl

    _init_ray(args.num_cpus)
    with open(args.shapes) as f:
        spec = _json.load(f)
    shapes = [
        shacl.NodeShape(
            target_class=ns["target_class"],
            properties=tuple(
                shacl.PropertyShape(
                    path=ps["path"],
                    min_count=ps.get("min_count"),
                    max_count=ps.get("max_count"),
                    in_set=tuple(ps["in"]) if "in" in ps else None,
                    pattern=ps.get("pattern"),
                    min_inclusive=ps.get("min_inclusive"),
                    max_inclusive=ps.get("max_inclusive"),
                ) for ps in ns.get("properties", ())),
        ) for ns in spec["shapes"]]
    report = shacl.validate(_load_graph(args), shapes)
    if args.out:
        report.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
        return 0
    df = report.to_pandas()
    df.to_csv(sys.stdout, index=False)
    # conformant graph => exit 0; violations => exit 3 (scriptable gate)
    return 0 if df.empty else 3


def _term_to_json(v) -> Optional[dict]:
    """Lexical term string → SPARQL 1.1 JSON-results binding object.
    ``None``/NaN (a null in a pandas float column) = unbound → omitted."""
    if v is None or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, float) and v.is_integer():
        # nullable int64 columns surface as float64 in pandas — render
        # integral values without the spurious ".0"
        return {"type": "literal", "value": str(int(v))}
    s = str(v)
    if s.startswith("<") and s.endswith(">"):
        return {"type": "uri", "value": s[1:-1]}
    if s.startswith("_:"):
        return {"type": "bnode", "value": s[2:]}
    if s.startswith('"'):
        import re as _re

        m = _re.match(r'^"(.*)"(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?$', s,
                      _re.S)
        if m:
            out = {"type": "literal", "value": m.group(1)}
            if m.group(2):
                out["datatype"] = m.group(2)
            if m.group(3):
                out["xml:lang"] = m.group(3)
            return out
    return {"type": "literal", "value": s}


_SERVE_FORM = """<!doctype html><title>rdflib_r2r_ray</title>
<h2>SPARQL endpoint</h2>
<form method="POST" action="/sparql">
<textarea name="query" rows="12" cols="80">SELECT * WHERE { ?s ?p ?o } LIMIT 10</textarea>
<br><button>Run</button> (or GET /sparql?query=...)
</form>"""


def cmd_serve(args) -> int:
    """Minimal SPARQL-over-HTTP endpoint (the reference ships a Flask
    SPARQL→SQL explorer, ``app/app.py:98-112``; this is the headless
    stdlib analogue): the mapped graph is materialized once at startup,
    each request executes against it and returns SPARQL 1.1 JSON results
    (or CSV with ``Accept: text/csv``)."""
    import threading
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from . import sparql

    _init_ray(args.num_cpus)
    graph = _load_graph(args).materialize()
    print(json.dumps({"serving": f"http://{args.host}:{args.port}/sparql",
                      "triples": graph.count()}), flush=True)
    # one query at a time: each request drives a full Ray Data execution,
    # and concurrent executions on one driver would contend for the same
    # CPU slots anyway
    query_lock = threading.Lock()

    def run_query(query: str, want_csv: bool) -> Tuple[int, str, str]:
        try:
            with query_lock:
                df = sparql.execute(graph, query).to_pandas()
        except Exception as ex:  # malformed/unsupported query → 400
            return 400, "text/plain", f"{type(ex).__name__}: {ex}"
        if want_csv:
            return 200, "text/csv", df.to_csv(index=False)
        if list(df.columns) == ["ask"] and len(df) == 1:
            # SPARQL 1.1 JSON boolean form for ASK results
            return (200, "application/sparql-results+json",
                    json.dumps({"head": {},
                                "boolean": bool(df["ask"].iloc[0])}))
        res = {
            "head": {"vars": list(df.columns)},
            "results": {"bindings": [
                {c: j for c in df.columns
                 if (j := _term_to_json(row[c])) is not None}
                for _, row in df.iterrows()
            ]},
        }
        return 200, "application/sparql-results+json", json.dumps(res)

    class Handler(BaseHTTPRequestHandler):
        def _respond(self, code: int, ctype: str, body: str) -> None:
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            u = urllib.parse.urlparse(self.path)
            if u.path == "/":
                return self._respond(200, "text/html", _SERVE_FORM)
            if u.path != "/sparql":
                return self._respond(404, "text/plain", "not found")
            q = urllib.parse.parse_qs(u.query).get("query", [""])[0]
            if not q:
                return self._respond(400, "text/plain", "missing ?query=")
            want_csv = "text/csv" in self.headers.get("Accept", "")
            self._respond(*run_query(q, want_csv))

        def do_POST(self):
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length).decode()
            ctype = self.headers.get("Content-Type", "")
            if "application/sparql-query" in ctype:
                q = body
            else:
                q = urllib.parse.parse_qs(body).get("query", [""])[0]
            if not q:
                return self._respond(400, "text/plain", "missing query")
            want_csv = "text/csv" in self.headers.get("Accept", "")
            self._respond(*run_query(q, want_csv))

        def log_message(self, fmt, *a):  # quiet by default
            if args.verbose:
                sys.stderr.write(fmt % a + "\n")

    srv = ThreadingHTTPServer((args.host, args.port), Handler)
    if args.port == 0:
        print(json.dumps({"bound_port": srv.server_address[1]}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return 0


def _add_graph_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data", help="directory of tables")
    p.add_argument("--mapping", help="R2RML Turtle mapping file")
    p.add_argument("--direct", action="store_true",
                   help="direct mapping from parquet schemas")
    p.add_argument("--tables", help="comma list of tables (--direct; default all)")
    p.add_argument("--pk", action="append", metavar="TABLE=COL[,COL]",
                   help="primary key for --direct (repeatable)")
    p.add_argument("--fk", action="append",
                   metavar="CHILD:COL[,COL]->PARENT:COL[,COL]",
                   help="foreign key for --direct (repeatable)")
    p.add_argument("--base", help="IRI base")
    p.add_argument("--num-cpus", type=int, default=None)


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="rdflib_r2r_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("construct", help="materialize the mapped graph")
    _add_graph_args(c)
    c.add_argument("--out", required=True)
    c.add_argument("--format", choices=["parquet", "nt"], default="parquet")
    c.add_argument("--num-partitions", type=int, default=24)
    c.add_argument("--no-resume", action="store_true")
    c.set_defaults(fn=cmd_construct)

    s = sub.add_parser("sparql", help="run a SPARQL query over the mapped graph")
    _add_graph_args(s)
    s.add_argument("--query")
    s.add_argument("--query-file")
    s.add_argument("--graph-nt",
                   help="query an exported N-Triples graph instead of mapping tables")
    s.add_argument("--out", help="write solutions as parquet instead of stdout CSV")
    s.add_argument("--print-limit", type=int, default=1000)
    s.set_defaults(fn=cmd_sparql)

    u = sub.add_parser("update", help="apply a SPARQL 1.1 Update and export "
                                      "the new graph version")
    _add_graph_args(u)
    u.add_argument("--update", help="update string (INSERT/DELETE DATA, "
                                    "DELETE/INSERT WHERE)")
    u.add_argument("--update-file")
    u.add_argument("--graph-nt",
                   help="update an exported N-Triples graph instead of mapping tables")
    u.add_argument("--out", required=True,
                   help="output directory for the updated graph (N-Triples)")
    u.add_argument("--num-partitions", type=int, default=24)
    u.set_defaults(fn=cmd_update)

    v = sub.add_parser("validate", help="SHACL-lite validation report")
    _add_graph_args(v)
    v.add_argument("--shapes", required=True,
                   help='JSON shapes file: {"shapes": [{"target_class": '
                        '"<iri>", "properties": [{"path": "<iri>", '
                        '"min_count": 1, "in": [...], "pattern": "...", '
                        '"max_inclusive": N}]}]}')
    v.add_argument("--graph-nt",
                   help="validate an exported N-Triples graph instead of mapping tables")
    v.add_argument("--out", help="write the report as parquet instead of stdout CSV")
    v.set_defaults(fn=cmd_validate)

    w = sub.add_parser("serve", help="HTTP SPARQL endpoint over the mapped "
                                     "graph (SPARQL 1.1 JSON results)")
    _add_graph_args(w)
    w.add_argument("--graph-nt",
                   help="serve an exported N-Triples graph instead of mapping tables")
    w.add_argument("--host", default="127.0.0.1")
    w.add_argument("--port", type=int, default=8890)
    w.add_argument("--verbose", action="store_true")
    w.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
