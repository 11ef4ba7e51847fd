#!/usr/bin/env python
"""Benchmark harness: headline KG-construction pipeline + named queries over
$GRAFT_SF_DIR (default /root/testdata/sf0.1), printing ONE JSON line.

Headline: the flagship pipeline (html synthesis → extract → entity-link →
emit → canonicalize → dedup) over the documents table replicated REPLICAS×
(deterministic doc_id offsets) so the run exercises real block-level
parallelism, not a single tiny block.

``--scaling``: run the headline twice in fresh processes at num_cpus=8 and
num_cpus=32 on the same input and report both throughputs + scaling
efficiency (the sandbox stand-in for the N vs 4N-node cluster criterion in
BASELINE.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("GRAFT_BENCH_REPLICAS", "40"))


def _headline(sf_dir: str) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from rdflib_r2r_ray.pipelines.kg import documents_mapping, kg_construct
    from rdflib_r2r_ray.stages.extract import make_html

    # Deterministic corpus amplification, shaped for scaling: the base table
    # is small, so it's broadcast once (ray.put) and each (replica, chunk)
    # unit synthesizes its own slice of the corpus — tasks = REPLICAS×CHUNKS,
    # independent of the source file's block count (a single-row-group
    # parquet would otherwise cap fan-out).
    base = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    n_base = base.num_rows
    n_docs = REPLICAS * n_base
    chunks = 4
    base_ref = ray.put(base)
    units = [{"rep": r, "chunk": c} for r in range(REPLICAS) for c in range(chunks)]

    def build(unit_batch: pa.Table, _ref=base_ref, _chunks=chunks) -> pa.Table:
        tbl = ray.get(_ref)
        outs = []
        for rep, c in zip(unit_batch["rep"].to_pylist(), unit_batch["chunk"].to_pylist()):
            lo = c * tbl.num_rows // _chunks
            hi = (c + 1) * tbl.num_rows // _chunks
            t = tbl.slice(lo, hi - lo)
            ids = t["doc_id"].to_pylist()
            texts = t["text"].to_pylist()
            new_ids = pa.array([i + rep * 10_000_000 for i in ids], pa.int64())
            urls = [f"http://bench.ex/d/{i + rep * 10_000_000}" for i in ids]
            htmls = pa.array(
                [make_html(tx or "", u) for tx, u in zip(texts, urls)], pa.binary()
            )
            t = t.set_column(t.column_names.index("doc_id"), "doc_id", new_ids)
            t = t.drop_columns(["text"]).append_column("html", htmls)
            outs.append(t)
        return pa.concat_tables(outs)

    # the dedup exchange executes at construction (materialize barrier), so
    # the timer wraps pipeline construction AND consumption
    t0 = time.time()
    ds = rd.from_items(units, override_num_blocks=len(units))
    # batch_size=1: one (replica, chunk) unit per task — the default 1024
    # would coalesce all unit rows into a couple of giant serial tasks
    ds = ds.map_batches(build, batch_format="pyarrow", batch_size=1)
    triples = kg_construct(ds, documents_mapping(), "documents", has_html=True)
    n_triples = triples.count()
    dt = time.time() - t0
    return {
        "sec": dt,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "docs_per_sec": n_docs / dt,
        "triples_per_sec": n_triples / dt,
    }


def _named_queries(sf_dir: str) -> dict:
    from rdflib_r2r_ray import driver_api

    out = {}
    for name, fn in driver_api.queries().items():
        t0 = time.time()
        ds = fn(sf_dir)
        n = ds.count() if hasattr(ds, "count") else len(ds)
        out[name] = round(time.time() - t0, 3)
    return out


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from rdflib_r2r_ray.rayser import register_for_ray

    register_for_ray()

    # warm the OS page cache so we measure compute + shuffle, not first read
    import ray.data as rd

    rd.read_parquet(f"{SF_DIR}/documents.parquet").count()

    head = _headline(SF_DIR)
    queries = _named_queries(SF_DIR)
    result = {
        "metric": "kg_construct_headline_sec",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": head["n_docs"],
        "n_triples": head["n_triples"],
        "docs_per_sec": round(head["docs_per_sec"], 1),
        "triples_per_sec": round(head["triples_per_sec"], 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        # larger corpus for the scaling runs so parallel compute dominates
        # fixed startup/shuffle overhead
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_REPLICAS=os.environ.get("GRAFT_SCALING_REPLICAS", "120"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_n, hi_n = 8, 32
    lo = run(lo_n)
    hi = run(hi_n)
    eff = (lo["value"] / hi["value"]) / (hi_n / lo_n)
    return {
        "metric": "scaling_efficiency",
        "num_cpus_lo": lo_n,
        "num_cpus_hi": hi_n,
        "sec_lo": lo["value"],
        "sec_hi": hi["value"],
        "docs_per_sec_lo": lo["docs_per_sec"],
        "docs_per_sec_hi": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
