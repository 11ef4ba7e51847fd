"""CLI surface: construct (parquet + nt) and sparql over a tiny table dir."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_data")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": ["EAST", "WEST"],
    }), str(d / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([10, 11, 12], pa.int64()),
        "n_name": ["AAA", "BBB", "CCC"],
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    }), str(d / "nation.parquet"))
    return str(d)


def _run(args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "rdflib_r2r_ray", *args],
        capture_output=True, text=True, env=env, cwd=cwd, timeout=300,
    )


def test_cli_construct_and_sparql(data_dir, tmp_path):
    out_dir = str(tmp_path / "graph")
    r = _run([
        "construct", "--data", data_dir, "--direct",
        "--pk", "nation=n_nationkey", "--pk", "region=r_regionkey",
        "--fk", "nation:n_regionkey->region:r_regionkey",
        "--out", out_dir, "--num-partitions", "4", "--num-cpus", "4",
    ], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    # nation: 3 cols + rdf:type + fk-ref = 5/row; region: 2 cols + type = 3/row
    assert report["rows"] == 3 * 5 + 2 * 3
    # resume: a second run skips every committed partition
    r2 = _run([
        "construct", "--data", data_dir, "--direct",
        "--pk", "nation=n_nationkey", "--pk", "region=r_regionkey",
        "--fk", "nation:n_regionkey->region:r_regionkey",
        "--out", out_dir, "--num-partitions", "4", "--num-cpus", "4",
    ], cwd=str(tmp_path))
    assert json.loads(r2.stdout.strip().splitlines()[-1])["skipped"] == 4

    r3 = _run([
        "sparql", "--data", data_dir, "--direct",
        "--pk", "nation=n_nationkey", "--pk", "region=r_regionkey",
        "--query",
        "SELECT ?nm WHERE { ?n <http://example.com/base/nation#n_name> ?nm . }"
        " ORDER BY DESC(?nm) LIMIT 2",
        "--num-cpus", "4",
    ], cwd=str(tmp_path))
    assert r3.returncode == 0, r3.stderr[-2000:]
    lines = [l for l in r3.stdout.strip().splitlines() if l]
    assert lines[-2:] == ["CCC", "BBB"]


def test_cli_construct_ntriples(data_dir, tmp_path):
    out_dir = str(tmp_path / "nt")
    r = _run([
        "construct", "--data", data_dir, "--direct", "--tables", "region",
        "--pk", "region=r_regionkey", "--format", "nt",
        "--out", out_dir, "--num-partitions", "2", "--num-cpus", "4",
    ], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    lines = []
    for part in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, part, "data.nt")
        if os.path.exists(p):
            lines += open(p).read().strip().splitlines()
    assert len(lines) == 6 and all(l.endswith(" .") for l in lines)
    assert any('"EAST"' in l for l in lines)


def test_cli_update_and_validate(data_dir, tmp_path):
    out_dir = str(tmp_path / "upd")
    r = _run([
        "update", "--data", data_dir, "--direct", "--tables", "region",
        "--pk", "region=r_regionkey",
        "--update",
        'DELETE { ?r <http://example.com/base/region#r_name> ?nm } '
        'INSERT { ?r <http://example.com/base/region#renamed> ?nm } '
        'WHERE { ?r <http://example.com/base/region#r_name> ?nm . '
        'FILTER(?nm = "EAST") }',
        "--out", out_dir, "--num-partitions", "2", "--num-cpus", "4",
    ], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    lines = []
    for part in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, part, "data.nt")
        if os.path.exists(p):
            lines += open(p).read().strip().splitlines()
    joined = "\n".join(lines)
    assert "renamed" in joined and '#r_name> "EAST"' not in joined
    assert '#r_name> "WEST"' in joined  # untouched row keeps its name triple

    shapes = tmp_path / "shapes.json"
    shapes.write_text(json.dumps({"shapes": [{
        "target_class": "<http://example.com/base/region>",
        "properties": [
            {"path": "<http://example.com/base/region#r_name>",
             "min_count": 1, "pattern": "^[A-Z]+$"},
        ]}]}))
    r2 = _run([
        "validate", "--data", data_dir, "--direct", "--tables", "region",
        "--pk", "region=r_regionkey", "--shapes", str(shapes),
        "--num-cpus", "4",
    ], cwd=str(tmp_path))
    # both regions conform => exit 0, empty report (header only)
    assert r2.returncode == 0, r2.stderr[-2000:]

    shapes.write_text(json.dumps({"shapes": [{
        "target_class": "<http://example.com/base/region>",
        "properties": [
            {"path": "<http://example.com/base/region#r_name>",
             "in": ["EAST"]},
        ]}]}))
    r3 = _run([
        "validate", "--data", data_dir, "--direct", "--tables", "region",
        "--pk", "region=r_regionkey", "--shapes", str(shapes),
        "--num-cpus", "4",
    ], cwd=str(tmp_path))
    assert r3.returncode == 3, (r3.returncode, r3.stderr[-2000:])
    # the report must name the violating focus (WEST region) and constraint
    assert "WEST" in r3.stdout and ",in," in r3.stdout, r3.stdout


def test_cli_serve_sparql_endpoint(data_dir, tmp_path):
    """`serve` exposes the mapped graph over HTTP: JSON results on
    GET /sparql, CSV content negotiation, 400 on a bad query."""
    import time
    import urllib.error
    import urllib.request

    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [sys.executable, "-m", "rdflib_r2r_ray", "serve",
         "--data", data_dir, "--direct",
         "--pk", "region=r_regionkey", "--tables", "region",
         "--port", "0", "--num-cpus", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=str(tmp_path))
    try:
        port = None
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                time.sleep(0.2)
                continue
            msg = json.loads(line)
            if "bound_port" in msg:
                port = msg["bound_port"]
                break
        assert port, "server never reported its port"
        q = ("SELECT ?nm WHERE { ?r <http://example.com/base/region#r_name>"
             " ?nm } ORDER BY ?nm")
        import urllib.parse
        url = f"http://127.0.0.1:{port}/sparql?query={urllib.parse.quote(q)}"
        res = json.load(urllib.request.urlopen(url, timeout=60))
        assert res["head"]["vars"] == ["nm"]
        vals = [b["nm"]["value"] for b in res["results"]["bindings"]]
        assert vals == ["EAST", "WEST"]
        assert all(b["nm"]["type"] == "literal"
                   for b in res["results"]["bindings"])

        req = urllib.request.Request(url, headers={"Accept": "text/csv"})
        csv_body = urllib.request.urlopen(req, timeout=60).read().decode()
        assert csv_body.splitlines() == ["nm", "EAST", "WEST"]

        bad = f"http://127.0.0.1:{port}/sparql?query=NOT_SPARQL"
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=60)
        assert ei.value.code == 400

        # ASK returns the SPARQL 1.1 JSON boolean form
        ask = ("ASK { ?r <http://example.com/base/region#r_name> \"EAST\" }")
        ares = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/sparql?query="
            f"{urllib.parse.quote(ask)}", timeout=60))
        assert ares == {"head": {}, "boolean": True}

        # an unbound OPTIONAL variable is OMITTED from its binding, not
        # serialized as a bogus literal
        qo = ("SELECT ?r ?x WHERE { ?r <http://example.com/base/region#r_name>"
              " ?nm OPTIONAL { ?r <http://example.com/base/region#nope> ?x } }")
        ores = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/sparql?query="
            f"{urllib.parse.quote(qo)}", timeout=60))
        assert len(ores["results"]["bindings"]) == 2
        assert all("x" not in b for b in ores["results"]["bindings"])
    finally:
        proc.terminate()
        proc.wait(timeout=30)
