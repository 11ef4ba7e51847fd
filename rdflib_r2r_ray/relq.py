"""Relational-operator query registry (SURVEY.md §2.3/§2.4 parity layer).

Each ``q_rel_*`` pipeline exercises one operator mapping from the reference's
SPARQL-algebra → SQL inventory (``rdflib_r2r/query_conversions.py``), paired
with an ANSI-SQL oracle for DuckDB. Column names and dtypes are aligned on
both sides; money doubles are integerized per-row (cents) BEFORE aggregation
so sums are exact integer arithmetic — order-independent under Ray's
nondeterministic block ordering.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from . import relational as R


def _read(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _cast_cols(ds: rd.Dataset, **types) -> rd.Dataset:
    def cast(batch: pa.Table) -> pa.Table:
        for col, typ in types.items():
            i = batch.column_names.index(col)
            batch = batch.set_column(i, col, pc.cast(batch[col], typ))
        return batch

    return ds.map_batches(cast, batch_format="pyarrow")


# --- Q3 filter + Q12 project ----------------------------------------------

def q_rel_filter(sf_dir: str) -> rd.Dataset:
    """Filter (reference ``queryFilter`` → WHERE) with projection pushdown."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"])
    ds = R.filter_expr(ds, "(l_quantity > 45) and (l_returnflag == 'R')")
    return ds.select_columns(["l_orderkey", "l_linenumber", "l_quantity"])


SQL_REL_FILTER = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
"""


# --- Q9/Q10/Q11 extend + grouped aggregation (TPC-H Q1 shape) -------------

def q_rel_pricing(sf_dir: str) -> rd.Dataset:
    """Extend (BIND) + GROUP BY with map-side combine + derived avg."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    ds = R.extend(
        ds,
        qty=lambda b: pc.cast(b["l_quantity"], pa.int64()),
        base_cents=lambda b: R.money_cents(b, "l_extendedprice"),
        disc_cents=lambda b: pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])),
                    pa.scalar(100.0),
                ),
                0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ),
    )
    agg = R.grouped_agg(
        ds.select_columns(["l_returnflag", "l_linestatus", "qty", "base_cents", "disc_cents"]),
        ["l_returnflag", "l_linestatus"],
        sums=["qty", "base_cents", "disc_cents"],
        count_as="count_order",
    )

    def finish(batch: pa.Table) -> pa.Table:
        avg = pc.divide(
            pc.cast(batch["qty"], pa.float64()), pc.cast(batch["count_order"], pa.float64())
        )
        return batch.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents", "sum_disc_cents", "count_order"]
        ).append_column("avg_qty", avg)

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_REL_PRICING = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
  COUNT(*) AS count_order,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- Q5 inner join + aggregation ------------------------------------------

def q_rel_join_agg(sf_dir: str) -> rd.Dataset:
    """Distributed hash join (orders ⋈ customer) then grouped aggregation."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    orders = R.extend(orders, price_cents=lambda b: R.money_cents(b, "o_totalprice"))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    # customer is the dimension side: the planner broadcasts it (count from
    # block metadata), so the fact table never shuffles
    j = R.planned_join(
        orders.select_columns(["o_custkey", "price_cents"]), cust,
        on=["o_custkey"], right_on=["c_custkey"],
    )
    return R.grouped_agg(
        j.select_columns(["c_mktsegment", "price_cents"]),
        ["c_mktsegment"], sums=["price_cents"], count_as="n_orders",
    ).map_batches(
        lambda b: b.rename_columns(["c_mktsegment", "sum_price_cents", "n_orders"]),
        batch_format="pyarrow",
    )


SQL_REL_JOIN_AGG = """
SELECT c_mktsegment,
  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
  COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --- Q5-shaped star join ---------------------------------------------------

def q_rel_star_join(sf_dir: str) -> rd.Dataset:
    """TPC-H Q5-shaped star join (local-supplier volume): lineitem ⋈
    date-filtered orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region('ASIA'),
    keeping only same-nation customer/supplier pairs, revenue per nation.
    The dimension chain (region→nation→supplier) folds driver-free through
    ``planned_join`` broadcasts; the fact table streams through without a
    shuffle.  Revenue in integer cents (per-row round, int64 sum) so the
    grouped total is order-independent and byte-equal to the SQL oracle."""
    import datetime as _dt

    region = R.filter_expr(
        _read(sf_dir, "region", columns=["r_regionkey", "r_name"]),
        "r_name == 'ASIA'").select_columns(["r_regionkey"])
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name", "n_regionkey"])
    nation = R.planned_join(nation, region, on=["n_regionkey"],
                            right_on=["r_regionkey"], join_type="left_semi")
    supp = R.planned_join(
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        nation, on=["s_nationkey"], right_on=["n_nationkey"])

    lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1997, 1, 1)

    def in_window(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                    pc.less(b["o_orderdate"], pa.scalar(hi)))
        return b.filter(m).select(["o_orderkey", "o_custkey"])

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(in_window, batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    li = R.extend(li, rev_cents=lambda b: pc.cast(
        pc.round(pc.multiply(
            pc.multiply(b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"])),
            pa.scalar(100.0)), 0, round_mode="half_towards_infinity"),
        pa.int64())).select_columns(["l_orderkey", "l_suppkey", "rev_cents"])

    j = R.planned_join(li, orders, on=["l_orderkey"], right_on=["o_orderkey"])
    j = R.planned_join(j, supp, on=["l_suppkey"], right_on=["s_suppkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    j = R.planned_join(j, cust, on=["o_custkey"], right_on=["c_custkey"])
    j = R.filter_expr(j, "c_nationkey == s_nationkey")
    return R.grouped_agg(
        j.select_columns(["n_name", "rev_cents"]), ["n_name"],
        sums=["rev_cents"], count_as="n_items",
    ).map_batches(
        lambda b: b.rename_columns(["n_name", "revenue_cents", "n_items"]),
        batch_format="pyarrow")


SQL_REL_STAR_JOIN = """
SELECT n_name,
  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
    AS revenue_cents,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_rel_merge_upsert(sf_dir: str) -> rd.Dataset:
    """MERGE INTO (upsert + delete) — the incremental-maintenance primitive
    for a continuously re-crawled corpus: apply a change feed (INSERT /
    UPDATE / DELETE rows keyed on the primary key) to a base table in ONE
    co-partitioned exchange.  The feed is synthesized deterministically
    from orders (key % 10: 0 → price update, 1 → delete, 2 → insert of a
    fresh key); each reduce task holds COMPLETE key groups of both sides,
    so delete-filter, update-overlay and inserts are local vectorized
    polars ops — no driver state, no multi-pass shuffle joins."""
    from .stages.dedup import _pl, cogroup_exchange

    base = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    ch_schema = pa.schema([("k", pa.int64()), ("op", pa.string()),
                           ("price", pa.float64())])

    def mk_changes(t: pa.Table) -> pa.Table:
        mod = pa.array(
            t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64) % 10)
        u = t.filter(pc.equal(mod, 0))
        d = t.filter(pc.equal(mod, 1))
        i = t.filter(pc.equal(mod, 2))
        return pa.concat_tables([
            pa.table({"k": u["o_orderkey"],
                      "op": pa.array(["U"] * len(u), pa.string()),
                      "price": pc.add(u["o_totalprice"], pa.scalar(1000.0))},
                     schema=ch_schema),
            pa.table({"k": d["o_orderkey"],
                      "op": pa.array(["D"] * len(d), pa.string()),
                      "price": pa.nulls(len(d), pa.float64())},
                     schema=ch_schema),
            pa.table({"k": pc.add(i["o_orderkey"],
                                  pa.scalar(10_000_000, pa.int64())),
                      "op": pa.array(["I"] * len(i), pa.string()),
                      "price": i["o_totalprice"]}, schema=ch_schema),
        ])

    changes = _read(sf_dir, "orders",
                    columns=["o_orderkey", "o_totalprice"]).map_batches(
        mk_changes, batch_format="pyarrow")
    out_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_totalprice", pa.float64())])

    def reduce_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        pl = _pl()
        if rt.num_rows == 0:
            return lt.cast(out_schema) if lt.num_rows else out_schema.empty_table()
        c = pl.from_arrow(rt)
        ins = c.filter(pl.col("op") == "I").select(
            pl.col("k").alias("o_orderkey"),
            pl.col("price").alias("o_totalprice"))
        if lt.num_rows == 0:
            return ins.to_arrow().cast(out_schema)
        b = pl.from_arrow(lt)
        kept = b.join(c.filter(pl.col("op") == "D").select("k"),
                      left_on="o_orderkey", right_on="k", how="anti")
        kept = (kept.join(c.filter(pl.col("op") == "U").select("k", "price"),
                          left_on="o_orderkey", right_on="k", how="left")
                .with_columns(pl.coalesce(pl.col("price"),
                                          pl.col("o_totalprice"))
                              .alias("o_totalprice"))
                .select("o_orderkey", "o_totalprice"))
        return pl.concat([kept, ins]).to_arrow().cast(out_schema)

    return cogroup_exchange(base, ["o_orderkey"], changes, ["k"],
                            reduce_fn, out_schema)


SQL_REL_MERGE_UPSERT = """
WITH ch AS (
  SELECT o_orderkey AS k, 'U' AS op, o_totalprice + 1000 AS price
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 'D', NULL FROM orders WHERE o_orderkey % 10 = 1
  UNION ALL
  SELECT o_orderkey + 10000000, 'I', o_totalprice
  FROM orders WHERE o_orderkey % 10 = 2),
base AS (SELECT o_orderkey AS k, o_totalprice FROM orders)
SELECT COALESCE(b.k, c.k) AS o_orderkey,
       CASE WHEN c.op IN ('U', 'I') THEN c.price ELSE b.o_totalprice END
         AS o_totalprice
FROM base b FULL JOIN ch c ON b.k = c.k
WHERE c.op IS NULL OR c.op <> 'D'
"""


def q_rel_incr_join(sf_dir: str) -> rd.Dataset:
    """Incremental JOIN-view maintenance — the join sibling of
    ``rel_incr_agg``'s aggregate IVM: the materialized view J = orders ⋈
    customer is maintained under an orders change feed (every 13th order
    re-priced +10.00) with DELTA work only — one broadcast anti-join
    removes the changed keys from J, one broadcast delta join computes
    their replacement rows — the base corpus is never re-joined.  At
    100 TB, J is the standing view and the delta is the day's changes.
    Integer cents so the maintained rows are bit-equal to the oracle's
    full recompute over the updated table."""
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    out_schema = pa.schema([
        ("o_orderkey", pa.int64()), ("c_name", pa.string()),
        ("total_cents", pa.int64()),
    ])

    def cents(arr) -> pa.Array:
        return pc.cast(pc.round(pc.multiply(arr, pa.scalar(100.0)), 0,
                                round_mode="half_towards_infinity"),
                       pa.int64())

    def base_rows(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                         "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                         "total_cents": cents(t["o_totalprice"])})

    def delta_rows(t: pa.Table) -> pa.Table:
        mod = pa.array(t["o_orderkey"].to_numpy(zero_copy_only=False)
                       .astype(np.int64) % 13)
        u = t.filter(pc.equal(mod, 0))
        return pa.table({"o_orderkey": pc.cast(u["o_orderkey"], pa.int64()),
                         "o_custkey": pc.cast(u["o_custkey"], pa.int64()),
                         "total_cents": pc.add(cents(u["o_totalprice"]),
                                               pa.scalar(1000, pa.int64()))})

    def pick(t: pa.Table) -> pa.Table:
        return t.select(["o_orderkey", "c_name", "total_cents"]).cast(out_schema)

    # standing view J (at 100 TB this is read back from its checkpoint, not
    # recomputed — see state/checkpoint.read_checkpointed)
    J = R.planned_join(orders.map_batches(base_rows, batch_format="pyarrow"),
                       cust, on=["o_custkey"], right_on=["c_custkey"])          .map_batches(pick, batch_format="pyarrow").materialize()
    delta = orders.map_batches(delta_rows, batch_format="pyarrow").materialize()
    # maintenance: remove changed keys (broadcast anti), add replacement rows
    kept = R.planned_join(J, delta.select_columns(["o_orderkey"]),
                          on=["o_orderkey"], join_type="left_anti")
    dj = R.planned_join(delta, cust, on=["o_custkey"], right_on=["c_custkey"])           .map_batches(pick, batch_format="pyarrow")
    return kept.union(dj)


SQL_REL_INCR_JOIN = """
SELECT o_orderkey, c_name,
       CAST(round(o_totalprice * 100, 0) AS BIGINT)
         + CASE WHEN o_orderkey % 13 = 0 THEN 1000 ELSE 0 END AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_rel_incr_agg(sf_dir: str) -> rd.Dataset:
    """Incremental aggregate maintenance (IVM): update a grouped
    SUM/COUNT under the rel_merge_upsert change feed WITHOUT recomputing
    from the merged table — old aggregate rows union SIGNED delta rows
    (update: Δsum = new−old cents, Δn = 0; delete: −sum, −1; insert:
    +sum, +1) through ONE grouped-sum exchange, dropping emptied groups.
    At 100 TB the old aggregate is a tiny snapshot and the deltas are the
    day's changes — this is the whole recompute-avoidance story.  Sums in
    integer cents so the maintained value is bit-equal to the oracle's
    full recompute over the merged table."""
    from .stages.dedup import _pl

    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    agg_schema = pa.schema([("o_orderpriority", pa.string()),
                            ("sum_cents", pa.int64()), ("n", pa.int64())])

    def cents(arr) -> pa.Array:
        return pc.cast(pc.round(pc.multiply(arr, pa.scalar(100.0)), 0,
                                round_mode="half_towards_infinity"),
                       pa.int64())

    def old_partial(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "sum_cents": cents(t["o_totalprice"]),
                         "n": pa.array(np.ones(len(t), np.int64))},
                        schema=agg_schema)

    def delta(t: pa.Table) -> pa.Table:
        mod = pa.array(t["o_orderkey"].to_numpy(zero_copy_only=False)
                       .astype(np.int64) % 10)
        u = t.filter(pc.equal(mod, 0))
        d = t.filter(pc.equal(mod, 1))
        i = t.filter(pc.equal(mod, 2))
        du = pa.table({
            "o_orderpriority": u["o_orderpriority"],
            "sum_cents": pc.subtract(
                cents(pc.add(u["o_totalprice"], pa.scalar(1000.0))),
                cents(u["o_totalprice"])),
            "n": pa.array(np.zeros(len(u), np.int64))}, schema=agg_schema)
        dd = pa.table({
            "o_orderpriority": d["o_orderpriority"],
            "sum_cents": pc.negate(cents(d["o_totalprice"])),
            "n": pa.array(np.full(len(d), -1, np.int64))}, schema=agg_schema)
        di = pa.table({
            "o_orderpriority": i["o_orderpriority"],
            "sum_cents": cents(i["o_totalprice"]),
            "n": pa.array(np.ones(len(i), np.int64))}, schema=agg_schema)
        return pa.concat_tables([du, dd, di])

    old = R.grouped_agg(
        _read(sf_dir, "orders", columns=cols).map_batches(
            old_partial, batch_format="pyarrow"),
        ["o_orderpriority"], sums=["sum_cents", "n"], in_schema=agg_schema)
    deltas = _read(sf_dir, "orders", columns=cols).map_batches(
        delta, batch_format="pyarrow")
    merged = R.grouped_agg(old.union(deltas), ["o_orderpriority"],
                           sums=["sum_cents", "n"], in_schema=agg_schema)

    def live(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["n"], pa.scalar(0, pa.int64())))

    return merged.map_batches(live, batch_format="pyarrow")


SQL_REL_INCR_AGG = """
WITH m AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 10 <> 1
  UNION ALL
  SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 10 = 2)
SELECT o_orderpriority,
       CAST(SUM(CAST(ROUND(price * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       COUNT(*) AS n
FROM m GROUP BY o_orderpriority
"""


def q_rel_gapfill(sf_dir: str) -> rd.Dataset:
    """Time-series gap filling (resample-to-weekly with zero-filled missing
    periods — what every training-telemetry/activity pipeline needs before
    windowed models): per-(user, week) counts from one grouped exchange;
    the GLOBAL week grid comes from a per-block min/max fold (two
    timestamps per block reach the driver) and is broadcast into a second
    user-keyed exchange whose reduce cross-joins each user against the
    grid and zero-fills — the dense grid is built per user partition,
    never on the driver."""
    from .stages.dedup import _pl, hash_group_exchange

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def to_week(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "wk": pc.floor_temporal(t["ts"], unit="week")})

    wk = ev.map_batches(to_week, batch_format="pyarrow").materialize()
    counts = R.grouped_agg(wk, ["user_id", "wk"], count_as="n")

    def mm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty block contributes nothing to the fold
            return pa.table({"lo": pa.array([], t["wk"].type),
                             "hi": pa.array([], t["wk"].type)})
        return pa.table({"lo": pa.array([pc.min(t["wk"]).as_py()]),
                         "hi": pa.array([pc.max(t["wk"]).as_py()])})

    lo = hi = None
    for r in wk.map_batches(mm, batch_format="pyarrow").take_all():
        lo = r["lo"] if lo is None else min(lo, r["lo"])
        hi = r["hi"] if hi is None else max(hi, r["hi"])
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("wk", pa.timestamp("us")), ("n", pa.int64())])
    if lo is None:  # zero events: empty result, stable schema
        return rd.from_arrow(out_schema.empty_table())
    week_us = 7 * 24 * 3600 * 1_000_000
    lo_us = int(np.datetime64(lo, "us").astype(np.int64))
    hi_us = int(np.datetime64(hi, "us").astype(np.int64))
    grid = np.arange(lo_us, hi_us + 1, week_us, dtype=np.int64)

    def reduce_fn(t: pa.Table, _grid=grid) -> pa.Table:
        pl = _pl()
        c = pl.from_arrow(t)
        users = c.select(pl.col("user_id").unique())
        wks = pl.DataFrame({"wk": _grid}).with_columns(
            pl.col("wk").cast(pl.Datetime("us")))
        dense = users.join(wks, how="cross")
        full = (dense.join(c, on=["user_id", "wk"], how="left")
                .with_columns(pl.col("n").fill_null(0))
                .select("user_id", "wk", "n"))
        return full.to_arrow().cast(out_schema)

    return hash_group_exchange(counts, ["user_id"], reduce_fn, out_schema)


SQL_REL_GAPFILL = """
WITH w AS (SELECT unnest(generate_series(
             date_trunc('week', (SELECT MIN(ts) FROM events)),
             date_trunc('week', (SELECT MAX(ts) FROM events)),
             INTERVAL 7 DAY)) AS wk),
u AS (SELECT DISTINCT user_id FROM events),
c AS (SELECT user_id, date_trunc('week', ts) AS wk, COUNT(*) AS n
      FROM events GROUP BY 1, 2)
SELECT u.user_id, w.wk, COALESCE(c.n, 0) AS n
FROM u CROSS JOIN w LEFT JOIN c ON c.user_id = u.user_id AND c.wk = w.wk
"""


def q_rel_cohort_retention(sf_dir: str) -> rd.Dataset:
    """Cohort retention matrix — the engagement analysis every event
    pipeline ships: users bucketed by first-event week (cohort), counted
    once per week they were active.  First-event via one grouped-MIN
    exchange; activity via one (user, week) distinct exchange; the small
    cohort table broadcasts through ``planned_join``; one grouped count
    finishes.  Week truncation is Monday-based on both sides
    (``pc.floor_temporal`` == DuckDB ``date_trunc('week')``)."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    first = R.grouped_agg(ev, ["user_id"], mins=["ts"])

    def to_cohort(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "cohort_week": pc.floor_temporal(t["ts"], unit="week")})

    cohort = first.map_batches(to_cohort, batch_format="pyarrow")

    def to_week(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "act_week": pc.floor_temporal(t["ts"], unit="week")})

    active = R.distinct(ev.map_batches(to_week, batch_format="pyarrow"),
                        ["user_id", "act_week"])
    j = R.planned_join(active, cohort, on=["user_id"])
    return R.grouped_agg(j.select_columns(["cohort_week", "act_week"]),
                         ["cohort_week", "act_week"], count_as="n_users")


SQL_REL_COHORT_RETENTION = """
WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events)
SELECT f.cohort_week, a.act_week, COUNT(*) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
"""


def q_rel_unpivot(sf_dir: str) -> rd.Dataset:
    """UNPIVOT / melt — wide-to-long reshaping (feature tables → (entity,
    attr, value) triples for sparse storage or per-attribute statistics).
    Embarrassingly parallel: one vectorized per-batch reshape, no exchange,
    streams straight to the consumer."""
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])
    out_schema = pa.schema([("p_partkey", pa.int64()), ("attr", pa.string()),
                            ("value", pa.float64())])

    def melt(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.concat_tables([
            pa.table({"p_partkey": t["p_partkey"],
                      "attr": pa.array(["p_size"] * n, pa.string()),
                      "value": pc.cast(t["p_size"], pa.float64())},
                     schema=out_schema),
            pa.table({"p_partkey": t["p_partkey"],
                      "attr": pa.array(["p_retailprice"] * n, pa.string()),
                      "value": t["p_retailprice"]}, schema=out_schema),
        ])

    return ds.map_batches(melt, batch_format="pyarrow")


SQL_REL_UNPIVOT = """
SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
"""


HIST_BINS = 20


def q_rel_histogram(sf_dir: str) -> rd.Dataset:
    """Equi-width histogram of a numeric column — the profiling primitive
    behind range-partition planning and outlier triage.  Bounds come from
    one per-block min/max fold (two integers per block reach the driver);
    bin assignment is exact integer math over cents, so every edge case
    lands in the same bin as the SQL oracle; counts ride one grouped
    exchange keyed on the bin."""
    from .stages.dedup import hash_group_exchange

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"c": pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0)), 0,
                     round_mode="half_towards_infinity"), pa.int64())})

    cents = ds.map_batches(to_cents, batch_format="pyarrow").materialize()

    def mm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty block contributes nothing to the fold
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([pc.min(t["c"]).as_py()], pa.int64()),
                         "hi": pa.array([pc.max(t["c"]).as_py()], pa.int64())})

    lo, hi = None, None
    for r in cents.map_batches(mm, batch_format="pyarrow").take_all():
        lo = r["lo"] if lo is None else min(lo, r["lo"])
        hi = r["hi"] if hi is None else max(hi, r["hi"])
    if lo is None:  # zero rows: empty histogram, stable schema
        return rd.from_arrow(pa.schema([("bin", pa.int64()),
                                        ("n", pa.int64())]).empty_table())

    def binify(t: pa.Table, _lo=lo, _hi=hi) -> pa.Table:
        c = t["c"].to_numpy()
        b = (c - _lo) * HIST_BINS // (_hi - _lo + 1)
        return pa.table({"bin": pa.array(b.astype(np.int64)),
                         "n": pa.array(np.ones(len(c), np.int64))})

    binned = cents.map_batches(binify, batch_format="pyarrow")
    return R.grouped_agg(binned, ["bin"], sums=["n"],
                         in_schema=pa.schema([("bin", pa.int64()),
                                              ("n", pa.int64())]))


SQL_REL_HISTOGRAM = f"""
WITH b AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders),
mm AS (SELECT MIN(c) AS lo, MAX(c) AS hi FROM b)
SELECT (c - lo) * {HIST_BINS} // (hi - lo + 1) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b, mm GROUP BY 1
"""


# --- Q6 left outer join ----------------------------------------------------

def q_rel_left_join(sf_dir: str) -> rd.Dataset:
    """LEFT OUTER JOIN preserving unmatched left rows (OPTIONAL)."""
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])
    j = R.planned_join(cust, orders, on=["c_custkey"], right_on=["o_custkey"], join_type="left_outer")
    j = R.extend(j, matched=lambda b: pc.cast(pc.is_valid(b["o_orderkey"]), pa.int64()))
    return R.grouped_agg(
        j.select_columns(["c_custkey", "matched"]), ["c_custkey"], sums=["matched"]
    ).map_batches(lambda b: b.rename_columns(["c_custkey", "n_orders"]), batch_format="pyarrow")


SQL_REL_LEFT_JOIN = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


# --- Q16 EXISTS (semi) / NOT EXISTS (anti) --------------------------------

def q_rel_exists(sf_dir: str) -> rd.Dataset:
    """EXISTS as left-semi join on the correlation variable."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    f_orders = R.filter_expr(
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"]),
        "o_orderstatus == 'F'",
    ).select_columns(["o_custkey"])
    return R.planned_join(cust, f_orders, on=["c_custkey"], right_on=["o_custkey"],
                          join_type="left_semi")


SQL_REL_EXISTS = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
"""


def q_rel_not_exists(sf_dir: str) -> rd.Dataset:
    """NOT EXISTS / MINUS as left-anti join."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    big = R.filter_expr(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
        "o_totalprice > 400000",
    ).select_columns(["o_custkey"])
    return R.planned_join(cust, big, on=["c_custkey"], right_on=["o_custkey"],
                          join_type="left_anti")


SQL_REL_NOT_EXISTS = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
"""


# --- Q7 union with padding -------------------------------------------------

def q_rel_union_pad(sf_dir: str) -> rd.Dataset:
    """UNION ALL with null padding for branch-missing columns."""
    cust = _read(sf_dir, "customer", columns=["c_name", "c_acctbal"]).map_batches(
        lambda b: b.rename_columns(["name", "acctbal"]), batch_format="pyarrow"
    )
    supp = _read(sf_dir, "supplier", columns=["s_name"]).map_batches(
        lambda b: b.rename_columns(["name"]), batch_format="pyarrow"
    )
    return R.union_pad(cust, supp)


SQL_REL_UNION_PAD = """
SELECT c_acctbal AS acctbal, c_name AS name FROM customer
UNION ALL
SELECT NULL, s_name FROM supplier
"""


# --- Q8 set minus ----------------------------------------------------------

def q_rel_except(sf_dir: str) -> rd.Dataset:
    """Set EXCEPT (customers with a 'P' order but no 'F' order): distinct +
    anti-join."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    p = R.distinct(R.filter_expr(orders, "o_orderstatus == 'P'").select_columns(["o_custkey"]))
    f = R.distinct(R.filter_expr(orders, "o_orderstatus == 'F'").select_columns(["o_custkey"]))
    return R.planned_join(p, f, on=["o_custkey"], join_type="left_anti")


SQL_REL_EXCEPT = """
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


# --- Q12 distinct ----------------------------------------------------------

def q_rel_distinct(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])
    return R.distinct(ds)


SQL_REL_DISTINCT = "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"


# --- Q13 order by + limit (top-k) ------------------------------------------

def q_rel_topk(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return R.topk(ds, ["o_totalprice", "o_orderkey"], 10, descending=[True, False])


SQL_REL_TOPK = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --- Q12/Q13 OFFSET --------------------------------------------------------

def q_rel_offset(sf_dir: str) -> rd.Dataset:
    """ORDER BY … LIMIT k OFFSET n (reference slice lowering,
    ``query_conversions.py:292-319``): partial top-(n+k) per block, global
    sort over partials, offset drop on ≤ n+k rows."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return R.topk_offset(ds, ["o_totalprice", "o_orderkey"], 10, 5, descending=[True, False])


SQL_REL_OFFSET = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5
"""


# --- Q10 SAMPLE aggregate --------------------------------------------------

def q_rel_sample(sf_dir: str) -> rd.Dataset:
    """SAMPLE aggregate (reference ``query_conversions.py:57-81``): SAMPLE
    may return ANY group member; this engine picks the MINIMUM so retries,
    re-runs and the SQL oracle all agree on one deterministic witness."""
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderkey"])
    agg = R.grouped_agg(ds, ["o_orderpriority"], mins=["o_orderkey"])
    return agg.map_batches(
        lambda b: b.rename_columns(["o_orderpriority", "sample_orderkey"]),
        batch_format="pyarrow",
    )


SQL_REL_SAMPLE = """
SELECT o_orderpriority, MIN(o_orderkey) AS sample_orderkey
FROM orders GROUP BY o_orderpriority
"""


# --- Q10 count-distinct ----------------------------------------------------

def q_rel_count_distinct(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_custkey"])
    return R.count_distinct(ds, ["o_orderpriority"], "o_custkey", "n_cust")


SQL_REL_COUNT_DISTINCT = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust
FROM orders GROUP BY o_orderpriority
"""


# --- Q10 group_concat ------------------------------------------------------

def q_rel_group_concat(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "nation", columns=["n_regionkey", "n_name"])
    return R.group_concat(ds, ["n_regionkey"], "n_name", "names")


SQL_REL_GROUP_CONCAT = """
SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS names
FROM nation GROUP BY n_regionkey
"""


# --- Q15 VALUES inline table ----------------------------------------------

def q_rel_values_join(sf_dir: str) -> rd.Dataset:
    vals = pa.Table.from_pylist(
        [{"n_name": "NATION_1"}, {"n_name": "NATION_7"}, {"n_name": "NATION_13"}]
    )
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    return R.broadcast_join(nation, vals, on=["n_name"]).select_columns(["n_nationkey", "n_name"])


SQL_REL_VALUES_JOIN = """
SELECT n_nationkey, n_name FROM nation
JOIN (VALUES ('NATION_1'), ('NATION_7'), ('NATION_13')) AS v(n_name) USING (n_name)
"""


# --- windowed aggregate (events; tumbling window) --------------------------

def q_rel_window_tumbling(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window aggregate over the events stream table —
    the windowed-aggregate custom operator expressed as extend(window key)
    + map-side-combined groupby."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    ds = R.extend(
        ds,
        window_start=lambda b: pc.floor_temporal(b["ts"], unit="hour"),
        value_cents=lambda b: R.money_cents(b, "value"),
    )
    return R.grouped_agg(
        ds.select_columns(["user_id", "window_start", "value_cents"]),
        ["user_id", "window_start"], sums=["value_cents"], count_as="n_events",
    ).map_batches(
        lambda b: b.rename_columns(["user_id", "window_start", "sum_value_cents", "n_events"]),
        batch_format="pyarrow",
    )


SQL_REL_WINDOW = """
SELECT user_id, date_trunc('hour', ts) AS window_start,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
  COUNT(*) AS n_events
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


def q_rel_window_hopping(sf_dir: str) -> rd.Dataset:
    """HOPPING (sliding) window aggregate: 1-hour windows every 30 minutes —
    each event lands in windows_size/hop = 2 windows, assigned by a
    vectorized flat expansion inside map_batches (no per-row Python), then
    the map-side-combined groupby.  The windowed-aggregate custom operator
    the Dataset API lacks, composed from primitives."""
    import numpy as np

    HOP_US = 30 * 60 * 1_000_000
    N_HOPS = 2  # window = 2 hops

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        cents = R.money_cents(batch, "value").to_numpy(zero_copy_only=False)
        # window starts: floor(ts/hop)*hop - k*hop for k in 0..N_HOPS-1
        base = (ts // HOP_US) * HOP_US
        rows_uid = np.repeat(uid, N_HOPS)
        rows_cents = np.repeat(cents, N_HOPS)
        offs = np.tile(np.arange(N_HOPS, dtype=np.int64) * HOP_US, len(ts))
        starts = np.repeat(base, N_HOPS) - offs
        return pa.table({
            "user_id": pa.array(rows_uid),
            "window_start": pa.array(starts).cast(pa.timestamp("us")),
            "value_cents": pa.array(rows_cents, pa.int64()),
        })

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    expanded = ds.map_batches(expand, batch_format="pyarrow")
    return R.grouped_agg(
        expanded, ["user_id", "window_start"], sums=["value_cents"], count_as="n_events",
    ).map_batches(
        lambda b: b.rename_columns(["user_id", "window_start", "sum_value_cents", "n_events"]),
        batch_format="pyarrow",
    )


SQL_REL_WINDOW_HOPPING = """
WITH hops AS (SELECT unnest(range(0, 2)) AS k)
SELECT user_id,
  make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - k * 1800000000) AS window_start,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
  COUNT(*) AS n_events
FROM events CROSS JOIN hops
GROUP BY user_id, window_start
"""


# --- sessionization (stateful per-key op via groupby().map_groups) ---------

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def q_rel_sessionize(sf_dir: str) -> rd.Dataset:
    """Sessionize events per user (30-min inactivity gap): a stateful
    streaming-window op the Dataset API lacks, composed over the raw-task
    hash exchange (``hash_group_exchange`` — every user's events land in
    one partition; session assignment is vectorized over the whole
    partition, not per-group Python)."""
    import numpy as np

    from .stages.dedup import hash_group_exchange

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("session_id", pa.int64())]
    )

    def assign(part: pa.Table) -> pa.Table:
        g = part.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        # normalize to µs FIRST so SESSION_GAP_US is unit-safe even if the
        # source column is ms/ns-resolution
        ts = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(uid)
        new_session = np.ones(n, dtype=np.int64)
        if n > 1:
            same_user = uid[1:] == uid[:-1]
            gap_ok = (ts[1:] - ts[:-1]) <= SESSION_GAP_US
            new_session[1:] = np.where(same_user & gap_ok, 0, 1)
        # per-user cumulative session index: global cumsum minus the cumsum
        # value at each user's first row (+1)
        cum = np.cumsum(new_session)
        first_idx = np.zeros(n, dtype=np.int64)
        if n > 1:
            boundary = np.nonzero(uid[1:] != uid[:-1])[0] + 1
            starts = np.concatenate([[0], boundary])
        else:
            starts = np.array([0], dtype=np.int64)
        base = np.repeat(cum[starts] - 1, np.diff(np.concatenate([starts, [n]])))
        session = cum - base
        return pa.table(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "session_id": pa.array(session),
            },
            schema=out_schema,
        )

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return hash_group_exchange(ds, ["user_id"], assign, out_schema)


SQL_REL_SESSIONIZE = """
WITH d AS (
  SELECT event_id, user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM d
"""


# --- scalar-function layer (reference §2.4 F1-F10) -------------------------

def q_rel_scalar_funcs(sf_dir: str) -> rd.Dataset:
    """Scalar expression compiler surface (reference
    ``query_conversions.py:56-181``): IF/CASE (F7), regex match (F6), XSD
    cast (F8), string UDF pass-through LOWER/UPPER (F9), BOUND/null (F5),
    arithmetic (F2) — all as pyarrow.compute kernels in one extend."""
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_type", "p_size", "p_retailprice"])
    return R.extend(
        ds,
        size_class=lambda b: pc.if_else(
            pc.greater(b["p_size"], 25), pa.scalar("large"),
            pc.if_else(pc.greater(b["p_size"], 10), pa.scalar("medium"), pa.scalar("small")),
        ),
        has_brass=lambda b: pc.match_substring_regex(b["p_type"], "BRASS"),
        name_lower=lambda b: pc.utf8_lower(b["p_name"]),
        size_f=lambda b: pc.cast(b["p_size"], pa.float64()),
        price_cents=lambda b: R.money_cents(b, "p_retailprice"),
        double_size=lambda b: pc.multiply(pc.cast(b["p_size"], pa.int64()), pa.scalar(2, pa.int64())),
    ).select_columns(
        ["p_partkey", "size_class", "has_brass", "name_lower", "size_f", "price_cents", "double_size"]
    )


SQL_REL_SCALAR_FUNCS = """
SELECT p_partkey,
  CASE WHEN p_size > 25 THEN 'large' WHEN p_size > 10 THEN 'medium' ELSE 'small' END AS size_class,
  regexp_matches(p_type, 'BRASS') AS has_brass,
  lower(p_name) AS name_lower,
  CAST(p_size AS DOUBLE) AS size_f,
  CAST(ROUND(p_retailprice*100) AS BIGINT) AS price_cents,
  CAST(p_size AS BIGINT) * 2 AS double_size
FROM part
"""


# --- corpus curation (quality gates + language + exact dedup in one pass) ---

def q_curate_corpus(sf_dir: str) -> rd.Dataset:
    """Training-data curation pipeline: integer quality gates (token count,
    digit ratio) + exact text dedup over a corpus with planted duplicates —
    filter and dedup composed as one streaming pipeline."""
    from .dataq import DUP_OFFSET, plant_exact_dups
    from .stages.dedup import exact_dedup_documents
    from .stages.text import text_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    corpus = docs.map_batches(plant_exact_dups, batch_format="pyarrow")

    def gate(batch: pa.Table) -> pa.Table:
        stats = text_stats(batch)
        keep = pc.and_(
            pc.greater_equal(stats["n_tokens"], pa.scalar(10, pa.int64())),
            pc.less_equal(stats["n_digit"], pc.multiply(stats["n_alpha"], pa.scalar(1, pa.int64()))),
        )
        return batch.filter(keep)

    gated = corpus.map_batches(gate, batch_format="pyarrow")
    return exact_dedup_documents(gated).select_columns(["doc_id"])


SQL_CURATE_CORPUS = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {10_000_000}, text FROM documents
), gated AS (
  SELECT * FROM corpus
  WHERE (CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) >= 10
    AND length(regexp_replace(text, '[^0-9]', '', 'g'))
        <= length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
)
SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY text
"""


def q_rel_grouped_topk(sf_dir: str) -> rd.Dataset:
    """Per-group top-k (row_number-over-partition ≤ k) — the per-domain /
    per-source sampling primitive of corpus curation: keep the 3 longest
    docs per source (ties → min doc_id).  Per-batch combiner + hash
    exchange; no Ray sort, no per-group Python."""
    ds = _read(sf_dir, "documents", columns=["source", "doc_id", "n_chars"])
    out = R.grouped_topk(
        ds, ["source"], [("n_chars", True), ("doc_id", False)], k=3
    )
    return out.select_columns(["source", "doc_id", "n_chars"])


SQL_REL_GROUPED_TOPK = """
SELECT source, doc_id, n_chars FROM documents
QUALIFY row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 3
"""


def q_rel_json_extract(sf_dir: str) -> rd.Dataset:
    """Semi-structured column extraction: pull a typed field out of a JSON
    string column vectorized (one RE2 kernel per batch — no per-row json
    parse on the hot path), then a map-side-combined aggregate per
    event_type.  The 100 TB shape for props/metadata columns: extract only
    the needed field at the scan, never materialize parsed objects."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"].combine_chunks()
                             if isinstance(b["props"], pa.ChunkedArray)
                             else b["props"],
                             r'"k":\s*(?P<v>-?\d+)')
        k = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return pa.table({
            "event_type": b["event_type"], "k": k,
            "n_with_k": pc.cast(pc.is_valid(k), pa.int64()),
        })

    ds = ds.map_batches(extract, batch_format="pyarrow")
    return R.grouped_agg(ds, ["event_type"], sums=["k", "n_with_k"])


SQL_REL_JSON_EXTRACT = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k,
       COUNT(json_extract_string(props, '$.k')) AS n_with_k
FROM events GROUP BY event_type
"""


# --- temporal joins (as-of / range) -----------------------------------------

def q_rel_interval_join(sf_dir: str) -> rd.Dataset:
    """Keyed interval-OVERLAP join (the ad-attribution / exposure-window
    shape: which purchase windows intersect which click windows per user):
    click intervals [ts, ts + (event_id % 5 + 1) h] vs purchase intervals
    [ts, ts + (event_id % 7 + 1) h], pairs whose CLOSED intervals
    intersect.  Not a band join — each row carries its own duration, so the
    overlap predicate has per-row bounds; ``relational.interval_join``
    co-partitions on user through the cogroup exchange and runs one
    vectorized equi-join + two-sided filter per bucket."""
    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def mk(kind: str, mod: int, p: str):
        def f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b["event_type"], kind))
            eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            start = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
            end = pc.add(start, pa.array((eid % mod + 1) * 3_600_000_000))
            return pa.table({f"{p}_event": pc.cast(t["event_id"], pa.int64()),
                             "user_id": pc.cast(t["user_id"], pa.int64()),
                             f"{p}_start": start, f"{p}_end": end})
        return f

    L = ev.map_batches(mk("click", 5, "l"), batch_format="pyarrow")
    Rt = ev.map_batches(mk("purchase", 7, "r"), batch_format="pyarrow")
    j = R.interval_join(L, Rt, left_by="user_id", right_by="user_id",
                        left_start="l_start", left_end="l_end",
                        right_start="r_start", right_end="r_end")
    return j.select_columns(["user_id", "l_event", "r_event"])


SQL_REL_INTERVAL_JOIN = """
WITH L AS (
  SELECT event_id AS l_event, user_id,
         epoch_us(ts) AS l_start,
         epoch_us(ts) + (event_id % 5 + 1) * 3600000000 AS l_end
  FROM events WHERE event_type = 'click'),
R AS (
  SELECT event_id AS r_event, user_id,
         epoch_us(ts) AS r_start,
         epoch_us(ts) + (event_id % 7 + 1) * 3600000000 AS r_end
  FROM events WHERE event_type = 'purchase')
SELECT L.user_id, l_event, r_event
FROM L JOIN R ON L.user_id = R.user_id
WHERE l_start <= r_end AND r_start <= l_end
"""


def q_rel_asof_join(sf_dir: str) -> rd.Dataset:
    """AS-OF join (an operator Ray Data's Dataset API lacks): each purchase
    event matched to the user's most recent prior click — last-touch
    attribution.  Composition: two-sided co-partitioned hash exchange on
    user_id + one vectorized ``polars.join_asof`` per bucket
    (``relational.asof_join``).  Oracle: DuckDB ``ASOF JOIN``."""
    purchases = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]) \
        .filter(expr="event_type == 'purchase'") \
        .select_columns(["event_id", "user_id", "ts"])
    clicks = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"]) \
        .filter(expr="event_type == 'click'") \
        .map_batches(lambda b: b.select(["user_id", "ts"]).rename_columns(
            ["c_user", "click_ts"]), batch_format="pyarrow")
    return R.asof_join(
        purchases, clicks, "user_id", "c_user", "ts", "click_ts",
    )


SQL_REL_ASOF_JOIN = """
SELECT p.event_id, p.user_id, p.ts, c.click_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT user_id AS c_user, ts AS click_ts FROM events WHERE event_type = 'click') c
ON p.user_id = c.c_user AND p.ts >= c.click_ts
"""


def q_rel_range_join(sf_dir: str) -> rd.Dataset:
    """Range (band) join: every (click, purchase) pair of the same user with
    the purchase 0-6 h after the click.  Co-partitioned exchange on user_id
    + per-bucket vectorized equi-join + Arrow band filter
    (``relational.range_join``); pair blowup bounded by matches per key."""
    import datetime as dt

    clicks = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]) \
        .filter(expr="event_type == 'click'") \
        .map_batches(lambda b: b.select(["event_id", "user_id", "ts"]).rename_columns(
            ["click_id", "user_id", "click_ts"]), batch_format="pyarrow")
    purchases = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]) \
        .filter(expr="event_type == 'purchase'") \
        .map_batches(lambda b: b.select(["event_id", "user_id", "ts"]).rename_columns(
            ["purchase_id", "p_user", "purchase_ts"]), batch_format="pyarrow")
    # band: purchase_ts - click_ts in [0, 6h] == click side left with
    # delta = purchase - click; express from the purchase side (left) so the
    # operator's delta = left_on - right_on
    return R.range_join(
        purchases, clicks, "p_user", "user_id", "purchase_ts", "click_ts",
        dt.timedelta(0), dt.timedelta(hours=6),
    )


SQL_REL_RANGE_JOIN = """
SELECT p.event_id AS purchase_id, p.user_id AS p_user, p.ts AS purchase_ts,
       c.event_id AS click_id, c.ts AS click_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ON p.user_id = c.user_id
AND p.ts - c.ts >= INTERVAL 0 SECOND AND p.ts - c.ts <= INTERVAL 6 HOUR
"""


# --- stratified sampling / quantiles ----------------------------------------

def q_rel_stratified_sample(sf_dir: str) -> rd.Dataset:
    """Deterministic per-stratum sample (20 docs per lang, multiplicative-
    hash order): ``relational.stratified_sample`` — local head + hash
    exchange, never a global sort.  Oracle: the same hash in a window
    row_number."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return R.stratified_sample(ds, ["lang"], 20, "doc_id", keep=["n_chars"])


SQL_REL_STRATIFIED_SAMPLE = """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
    row_number() OVER (PARTITION BY lang
                       ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents) t
WHERE rn <= 20
"""


def q_rel_quantiles(sf_dir: str) -> rd.Dataset:
    """Exact discrete quantiles of a bounded-cardinality numeric column via
    a distributed value histogram (``relational.quantiles_disc``)."""
    ds = _read(sf_dir, "documents", columns=["n_chars"])
    return R.quantiles_disc(ds, "n_chars", [0.5, 0.9, 0.99])


SQL_REL_QUANTILES = """
SELECT unnest([0.5, 0.9, 0.99]) AS q,
       unnest([quantile_disc(n_chars, 0.5),
               quantile_disc(n_chars, 0.9),
               quantile_disc(n_chars, 0.99)]) AS value
FROM documents
"""


def q_rel_range_partition(sf_dir: str) -> rd.Dataset:
    """Range-partition layout planning — the data-layout primitive under
    sorted/clustered 100 TB writes (each bucket becomes one contiguous key
    range of output files): exact quartile boundaries from the distributed
    value histogram (``quantiles_disc``, DuckDB ``quantile_disc`` rank
    semantics), broadcast to a vectorized bucket-assignment pass (strict
    ``v > boundary`` so boundary ties land LOW — deterministic), one
    grouped min/max/count exchange reports the per-range stats a planner
    needs (bounds for file pruning, counts for skew detection)."""
    ds = _read(sf_dir, "documents", columns=["n_chars"])
    bounds = [int(r["value"])
              for r in R.quantiles_disc(ds, "n_chars",
                                        [0.25, 0.5, 0.75]).take_all()]

    def assign(b: pa.Table) -> pa.Table:
        v = b["n_chars"]
        bucket = pa.array(np.zeros(len(b), np.int64))
        for bd in bounds:
            bucket = pc.add(bucket, pc.cast(
                pc.greater(v, pa.scalar(bd, pa.int64())), pa.int64()))
        return pa.table({"bucket": bucket, "n_chars": v,
                         "n_rows": pa.array(np.ones(len(b), np.int64))})

    return R.grouped_agg(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["bucket"], sums=["n_rows"], mins=["n_chars"],
    ).map_batches(
        lambda b: b.rename_columns(["bucket", "n_rows", "min_v"]),
        batch_format="pyarrow")


SQL_REL_RANGE_PARTITION = """
WITH b AS (
  SELECT quantile_disc(n_chars, 0.25) AS b1,
         quantile_disc(n_chars, 0.50) AS b2,
         quantile_disc(n_chars, 0.75) AS b3
  FROM documents)
SELECT CAST(CAST(n_chars > b1 AS BIGINT) + CAST(n_chars > b2 AS BIGINT)
            + CAST(n_chars > b3 AS BIGINT) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(n_chars) AS min_v
FROM documents, b GROUP BY 1
"""


# --- window analytics (rank / lag) ------------------------------------------

def q_rel_rank_window(sf_dir: str) -> rd.Dataset:
    """RANK() OVER (PARTITION BY lang ORDER BY n_chars DESC): per-partition
    vectorized rank over the hash exchange (complete groups per reduce task,
    one polars rank kernel per partition — tie-stable, so deterministic
    without a tiebreak column)."""
    from .stages.dedup import _pl, hash_group_exchange

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("lang", pa.string()),
        ("n_chars", pa.int64()), ("rnk", pa.int64()),
    ])

    def rank_part(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part)
        out = df.with_columns(
            pl.col("n_chars").rank(method="min", descending=True)
            .over("lang").cast(pl.Int64).alias("rnk")
        )
        return out.to_arrow().cast(out_schema)

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return hash_group_exchange(ds, ["lang"], rank_part, out_schema)


SQL_REL_RANK_WINDOW = """
SELECT doc_id, lang, n_chars,
       RANK() OVER (PARTITION BY lang ORDER BY n_chars DESC) AS rnk
FROM documents
"""


def q_rel_lag_delta(sf_dir: str) -> rd.Dataset:
    """LAG deltas per key (time since the user's previous event): hash
    exchange on user_id, one vectorized sort + shifted diff per partition
    (same scale shape as sessionize; never per-group Python)."""
    import numpy as np

    from .stages.dedup import hash_group_exchange

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("delta_us", pa.int64()),
    ])

    def lag_part(part: pa.Table) -> pa.Table:
        g = part.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(uid)
        delta = np.empty(n, dtype=np.float64)
        delta[0] = np.nan
        if n > 1:
            d = (ts[1:] - ts[:-1]).astype(np.float64)
            d[uid[1:] != uid[:-1]] = np.nan
            delta[1:] = d
        mask = ~np.isnan(delta)
        vals = pa.array(np.where(mask, delta, 0).astype(np.int64), pa.int64())
        return pa.table({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "delta_us": pc.if_else(pa.array(mask), vals, pa.scalar(None, pa.int64())),
        }, schema=out_schema)

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return hash_group_exchange(ds, ["user_id"], lag_part, out_schema)


SQL_REL_LAG_DELTA = """
SELECT event_id, user_id,
  CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER (
       PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT) AS delta_us
FROM events
"""


# --- bloom-pushdown semi join / grouped quantiles ----------------------------

def q_rel_bloom_semi_join(sf_dir: str) -> rd.Dataset:
    """Semi join with a Bloom-filter scan pushdown
    (``relational.bloom_semi_join``): the build side folds to a 128 KiB bit
    array (task-tree OR-reduce), probe batches drop non-members at the scan,
    the exact semi join removes false positives — identical result to
    ``rel_exists``, a fraction of the exchange volume at scale."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    f_orders = R.filter_expr(
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"]),
        "o_orderstatus == 'F'",
    ).select_columns(["o_custkey"])
    return R.bloom_semi_join(cust, f_orders, on=["c_custkey"], right_on=["o_custkey"])


SQL_REL_BLOOM_SEMI_JOIN = SQL_REL_EXISTS


def q_rel_grouped_quantiles(sf_dir: str) -> rd.Dataset:
    """Per-group exact discrete quantiles (median/p90 n_chars per lang) via
    the keyed histogram exchange (``relational.grouped_quantiles_disc``) —
    no driver materialization at any group cardinality."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    return R.grouped_quantiles_disc(ds, ["lang"], "n_chars", [0.5, 0.9])


SQL_REL_GROUPED_QUANTILES = """
SELECT lang, unnest([0.5, 0.9]) AS q,
       unnest([quantile_disc(n_chars, 0.5), quantile_disc(n_chars, 0.9)]) AS value
FROM documents GROUP BY lang
"""


# --- web-corpus URL canonicalization + dedup ---------------------------------

def q_dd_url_dedup(sf_dir: str) -> rd.Dataset:
    """URL canonicalization + exact dedup (the Common-Crawl first pass):
    synthesized crawl URLs (two variants per doc — tracking params / case /
    trailing slash) normalize vectorized (lower, strip query+fragment, strip
    trailing slash) and dedup keeps the MIN url_id per canonical URL via one
    map-side-combined grouped MIN — no distinct exchange needed.

    Fixture simplification (documented): the whole URL is case-folded; real
    canonicalization folds only scheme+authority."""
    def synth(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        base = [f"https://Example.com/d/{i}?ref=rss" for i in ids]
        alt = [f"https://example.com/d/{i}/" for i in ids]
        return pa.table({
            "url_id": pa.array(np.concatenate([ids * 2, ids * 2 + 1]), pa.int64()),
            "url": pa.array(base + alt, pa.string()),
        })

    def normalize(b: pa.Table) -> pa.Table:
        u = pc.utf8_lower(b["url"])
        u = pc.replace_substring_regex(u, r"[?#].*$", "")
        u = pc.replace_substring_regex(u, r"/$", "")
        return pa.table({"url_norm": u, "url_id": b["url_id"]})

    import numpy as np

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    urls = ds.map_batches(synth, batch_format="pyarrow") \
             .map_batches(normalize, batch_format="pyarrow")
    return R.grouped_agg(urls, ["url_norm"], mins=["url_id"])


SQL_DD_URL_DEDUP = """
WITH urls AS (
  SELECT doc_id * 2 AS url_id, 'https://Example.com/d/' || doc_id || '?ref=rss' AS url FROM documents
  UNION ALL
  SELECT doc_id * 2 + 1, 'https://example.com/d/' || doc_id || '/' FROM documents
),
norm AS (
  SELECT url_id,
    regexp_replace(regexp_replace(lower(url), '[?#].*$', ''), '/$', '') AS url_norm
  FROM urls)
SELECT url_norm, MIN(url_id) AS url_id FROM norm GROUP BY url_norm
"""


# --- grouping sets (ROLLUP) / pivot -----------------------------------------

def q_rel_rollup(sf_dir: str) -> rd.Dataset:
    """GROUP BY ROLLUP(lang, source): the three grouping sets run as three
    independent map-side-combined aggregations over the SAME streamed input
    and union with null padding — no operator needs more than its own
    grouping key's exchange."""
    import ray

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    # rollup cascade: the corpus is read and exchanged exactly ONCE (the
    # fine grouping); the coarser sets re-aggregate the |langs × sources|-row
    # fine result — small by definition — with plain Arrow on the driver
    fine = R.grouped_agg(ds, ["lang", "source"], sums=["n_chars"], count_as="n_docs").materialize()
    ftbl = pa.concat_tables(
        [t for t in ray.get(fine.to_arrow_refs()) if t.num_rows]
    ).combine_chunks()
    mid_tbl = ftbl.group_by(["lang"]).aggregate(
        [("n_chars", "sum"), ("n_docs", "sum")]
    ).rename_columns(["lang", "n_chars", "n_docs"])
    top_tbl = pa.table({
        "n_chars": pa.array([pc.sum(ftbl["n_chars"]).as_py()], pa.int64()),
        "n_docs": pa.array([pc.sum(ftbl["n_docs"]).as_py()], pa.int64()),
    })
    out = R.union_pad(fine, rd.from_arrow(mid_tbl), rd.from_arrow(top_tbl))
    return out.map_batches(
        lambda b: b.select(["lang", "source", "n_chars", "n_docs"]).rename_columns(
            ["lang", "source", "sum_n_chars", "n_docs"]),
        batch_format="pyarrow",
    )


SQL_REL_ROLLUP = """
SELECT lang, source,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, COUNT(*) AS n_docs
FROM documents GROUP BY ROLLUP(lang, source)
"""


def q_rel_cube(sf_dir: str) -> rd.Dataset:
    """GROUP BY CUBE(lang, source): all FOUR grouping sets from ONE streamed
    exchange — the fine (lang, source) aggregation is the only pass over the
    corpus; the (lang), (source) and () sets re-aggregate the tiny
    |langs × sources|-row fine result with plain Arrow on the driver."""
    import ray

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    fine = R.grouped_agg(ds, ["lang", "source"], sums=["n_chars"], count_as="n_docs").materialize()
    ftbl = pa.concat_tables(
        [t for t in ray.get(fine.to_arrow_refs()) if t.num_rows]
    ).combine_chunks()

    def coarse(key: str) -> pa.Table:
        return ftbl.group_by([key]).aggregate(
            [("n_chars", "sum"), ("n_docs", "sum")]
        ).rename_columns([key, "n_chars", "n_docs"])

    top_tbl = pa.table({
        "n_chars": pa.array([pc.sum(ftbl["n_chars"]).as_py()], pa.int64()),
        "n_docs": pa.array([pc.sum(ftbl["n_docs"]).as_py()], pa.int64()),
    })
    out = R.union_pad(fine, rd.from_arrow(coarse("lang")),
                      rd.from_arrow(coarse("source")), rd.from_arrow(top_tbl))
    return out.map_batches(
        lambda b: b.select(["lang", "source", "n_chars", "n_docs"]).rename_columns(
            ["lang", "source", "sum_n_chars", "n_docs"]),
        batch_format="pyarrow",
    )


def q_rel_grouping_sets(sf_dir: str) -> rd.Dataset:
    """GROUP BY GROUPING SETS ((lang), (source)) — the NON-hierarchical
    grouping-set shape that neither ROLLUP nor CUBE emits (no fine set, no
    grand total): same one-streamed-exchange plan as ``q_rel_cube`` — the
    (lang, source) fine aggregation is the only pass over the corpus, each
    requested set re-aggregates the tiny fine result locally."""
    import ray

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    fine = R.grouped_agg(ds, ["lang", "source"], sums=["n_chars"],
                         count_as="n_docs").materialize()
    ftbl = pa.concat_tables(
        [t for t in ray.get(fine.to_arrow_refs()) if t.num_rows]
    ).combine_chunks()

    def coarse(key: str) -> pa.Table:
        return ftbl.group_by([key]).aggregate(
            [("n_chars", "sum"), ("n_docs", "sum")]
        ).rename_columns([key, "n_chars", "n_docs"])

    out = R.union_pad(rd.from_arrow(coarse("lang")),
                      rd.from_arrow(coarse("source")))
    return out.map_batches(
        lambda b: b.select(["lang", "source", "n_chars", "n_docs"])
                   .rename_columns(["lang", "source", "sum_n_chars", "n_docs"]),
        batch_format="pyarrow",
    )


SQL_REL_GROUPING_SETS = """
SELECT lang, source,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, COUNT(*) AS n_docs
FROM documents GROUP BY GROUPING SETS ((lang), (source))
"""


SQL_REL_CUBE = """
SELECT lang, source,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, COUNT(*) AS n_docs
FROM documents GROUP BY CUBE(lang, source)
"""


PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


def q_rel_pivot(sf_dir: str) -> rd.Dataset:
    """PIVOT (conditional aggregation): per source, document count per lang
    as columns — lowered to indicator columns + ONE grouped sum (single
    exchange, no per-pivot pass)."""
    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def indicators(b: pa.Table) -> pa.Table:
        cols = {"source": b["source"]}
        for l in PIVOT_LANGS:
            cols[f"n_{l}"] = pc.cast(pc.equal(b["lang"], l), pa.int64())
        return pa.table(cols)

    return R.grouped_agg(
        ds.map_batches(indicators, batch_format="pyarrow"),
        ["source"], sums=[f"n_{l}" for l in PIVOT_LANGS],
    )


SQL_REL_PIVOT = f"""
SELECT source,
  {", ".join(f"CAST(SUM(CASE WHEN lang = '{l}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{l}" for l in PIVOT_LANGS)}
FROM documents GROUP BY source
"""


# --- window analytics (ntile / running sum / first-last) ---------------------

def q_rel_ntile(sf_dir: str) -> rd.Dataset:
    """NTILE(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id): hash
    exchange on lang, one vectorized position/size pass per partition.
    Bucket sizing matches SQL NTILE exactly (first ``n % k`` buckets get one
    extra row); the ORDER BY includes doc_id so the order is total and the
    result deterministic."""
    from .stages.dedup import _pl, hash_group_exchange

    K = 4
    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("lang", pa.string()),
        ("n_chars", pa.int64()), ("tile", pa.int64()),
    ])

    def ntile_part(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part).sort(["lang", "n_chars", "doc_id"])
        pos0 = pl.int_range(pl.len()).over("lang")
        n = pl.len().over("lang")
        base = n // K
        big = n % K
        cut = big * (base + 1)
        tile = (
            pl.when(pos0 < cut)
            .then(pos0 // (base + 1))
            .otherwise(big + (pos0 - cut) // pl.max_horizontal(base, 1))
            + 1
        ).cast(pl.Int64).alias("tile")
        return df.with_columns(tile).to_arrow().cast(out_schema)

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return hash_group_exchange(ds, ["lang"], ntile_part, out_schema)


SQL_REL_NTILE = """
SELECT doc_id, lang, n_chars,
       CAST(NTILE(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS tile
FROM documents
"""


def q_rel_running_sum(sf_dir: str) -> rd.Dataset:
    """Cumulative SUM OVER (PARTITION BY user_id ORDER BY ts, event_id):
    hash exchange on user_id, per-partition sort + one polars cum_sum kernel.
    Money doubles are integerized per-row (cents, round-half-away matching
    SQL ROUND) before the cumulative sum, so every prefix is exact integer
    arithmetic — order-independent across block layouts."""
    from .stages.dedup import _pl, hash_group_exchange

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("run_cents", pa.int64()),
    ])

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(b["value"], 100),
                             round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                         "ts": b["ts"], "cents": c})

    def run_part(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part).sort(["user_id", "ts", "event_id"])
        out = df.with_columns(
            pl.col("cents").cum_sum().over("user_id")
            .cast(pl.Int64).alias("run_cents")
        ).select(["event_id", "user_id", "run_cents"])
        return out.to_arrow().cast(out_schema)

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]) \
        .map_batches(cents, batch_format="pyarrow")
    return hash_group_exchange(ds, ["user_id"], run_part, out_schema)


SQL_REL_RUNNING_SUM = """
SELECT event_id, user_id,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS run_cents
FROM events
"""


def q_rel_first_last(sf_dir: str) -> rd.Dataset:
    """FIRST/LAST ordered aggregates per key (first and last event type per
    user by event time): per-BLOCK partial fold (each block contributes one
    row per user: first/last candidate + count), then a hash exchange merges
    partials — the exchange ships one row per (user, block), never the raw
    events. The combiner-before-exchange shape is what survives 100 TB."""
    from .stages.dedup import _pl, hash_group_exchange

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("first_type", pa.string()),
        ("last_type", pa.string()), ("n_events", pa.int64()),
    ])

    def block_partial(b: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(b).sort(["user_id", "ts", "event_id"])
        g = df.group_by("user_id", maintain_order=True).agg(
            first_type=pl.col("event_type").first(),
            min_ts=pl.col("ts").first(),
            min_eid=pl.col("event_id").first(),
            last_type=pl.col("event_type").last(),
            max_ts=pl.col("ts").last(),
            max_eid=pl.col("event_id").last(),
            cnt=pl.len().cast(pl.Int64),
        )
        return g.to_arrow()

    def merge_part(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part)
        g = df.group_by("user_id").agg(
            first_type=pl.col("first_type").sort_by(["min_ts", "min_eid"]).first(),
            last_type=pl.col("last_type").sort_by(["max_ts", "max_eid"]).last(),
            n_events=pl.col("cnt").sum().cast(pl.Int64),
        )
        return g.to_arrow().cast(out_schema)

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(block_partial, batch_format="pyarrow")
    return hash_group_exchange(ds, ["user_id"], merge_part, out_schema)


SQL_REL_FIRST_LAST = """
SELECT user_id,
  first(event_type ORDER BY ts, event_id) AS first_type,
  last(event_type ORDER BY ts, event_id) AS last_type,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
"""


def q_rel_full_outer(sf_dir: str) -> rd.Dataset:
    """FULL OUTER JOIN with genuinely unmatched rows on BOTH sides: per-
    customer order counts split by status ('F' vs 'O'); customers who only
    ever placed one kind keep a NULL count on the other side.  Both inputs
    are pre-aggregated (map-side combine → grouped-count exchange), so the
    outer join ships one row per customer per side — never raw orders."""
    import numpy as np

    from .relational import full_outer_join, grouped_agg

    def side(status: str, alias: str) -> rd.Dataset:
        ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"]) \
            .filter(expr=f"o_orderstatus == '{status}'") \
            .map_batches(lambda b: pa.table({"o_custkey": b["o_custkey"],
                                             "one": pa.array(np.ones(len(b), np.int64))}),
                         batch_format="pyarrow")
        agg = grouped_agg(ds, ["o_custkey"], sums=["one"],
                          in_schema=pa.schema([("o_custkey", pa.int64()),
                                               ("one", pa.int64())]))
        return agg.map_batches(lambda t, _a=alias: t.rename_columns(["o_custkey", _a]),
                               batch_format="pyarrow")

    return full_outer_join(side("F", "n_f"), side("O", "n_o"),
                           on=["o_custkey"])


SQL_REL_FULL_OUTER = """
WITH f AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_f FROM orders
           WHERE o_orderstatus = 'F' GROUP BY o_custkey),
     o AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_o FROM orders
           WHERE o_orderstatus = 'O' GROUP BY o_custkey)
SELECT COALESCE(f.o_custkey, o.o_custkey) AS o_custkey, f.n_f, o.n_o
FROM f FULL OUTER JOIN o ON f.o_custkey = o.o_custkey
"""


def q_rel_moving_sum(sf_dir: str) -> rd.Dataset:
    """Sliding window frame (SUM ... ROWS BETWEEN 2 PRECEDING AND CURRENT
    ROW) per user ordered by event time: hash exchange on user_id, one
    polars rolling_sum kernel per partition.  Money doubles are integerized
    per-row first (cents, round-half-away matching SQL ROUND) so every
    frame sum is exact integer arithmetic — block-layout independent."""
    from .stages.dedup import _pl, hash_group_exchange

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("frame_cents", pa.int64()),
    ])

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(b["value"], 100),
                             round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                         "ts": b["ts"], "cents": c})

    def frame_part(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part).sort(["user_id", "ts", "event_id"])
        out = df.with_columns(
            pl.col("cents").rolling_sum(window_size=3, min_samples=1)
            .over("user_id").cast(pl.Int64).alias("frame_cents")
        ).select(["event_id", "user_id", "frame_cents"])
        return out.to_arrow().cast(out_schema)

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]) \
        .map_batches(cents, batch_format="pyarrow")
    return hash_group_exchange(ds, ["user_id"], frame_part, out_schema)


SQL_REL_MOVING_SUM = """
SELECT event_id, user_id,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS frame_cents
FROM events
"""


def q_rel_time_window_sum(sf_dir: str) -> rd.Dataset:
    """TIME-based window frame (SUM ... RANGE BETWEEN INTERVAL 3 DAY
    PRECEDING AND CURRENT ROW) per user — the frame every telemetry
    pipeline actually wants (ROWS frames break under irregular event
    spacing).  Hash exchange on user_id, one polars ``rolling_sum_by``
    kernel per partition with ``closed='both'`` ([ts−3d, ts], peers
    included — exactly SQL RANGE-frame semantics); integer cents keep the
    sums exact."""
    from .stages.dedup import _pl, hash_group_exchange

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("win_cents", pa.int64()),
    ])

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(b["value"], 100),
                             round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                         "ts": b["ts"], "cents": c})

    def frame_part(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part).sort(["user_id", "ts", "event_id"])
        out = df.with_columns(
            pl.col("cents").rolling_sum_by("ts", window_size="3d",
                                           closed="both")
            .over("user_id").cast(pl.Int64).alias("win_cents")
        ).select(["event_id", "user_id", "win_cents"])
        return out.to_arrow().cast(out_schema)

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]) \
        .map_batches(cents, batch_format="pyarrow")
    return hash_group_exchange(ds, ["user_id"], frame_part, out_schema)


SQL_REL_TIME_WINDOW_SUM = """
SELECT event_id, user_id,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
    AS win_cents
FROM events
"""


def q_rel_percentile_cont(sf_dir: str) -> rd.Dataset:
    """Interpolated (continuous) quantiles of document length — DuckDB
    ``quantile_cont`` semantics, distributed value histogram + driver lerp
    (see ``relational.quantiles_cont``)."""
    from .relational import quantiles_cont

    ds = _read(sf_dir, "documents", columns=["n_chars"])
    return quantiles_cont(ds, "n_chars", [0.25, 0.5, 0.75, 0.95])


SQL_REL_PERCENTILE_CONT = """
SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS q,
       unnest([quantile_cont(n_chars, 0.25),
               quantile_cont(n_chars, 0.5),
               quantile_cont(n_chars, 0.75),
               quantile_cont(n_chars, 0.95)]) AS value
FROM documents
"""


def q_rel_funnel(sf_dir: str) -> rd.Dataset:
    """Ordered event-sequence (funnel) analysis: per user, did a 'view'
    happen, then a 'click' strictly after it, then a 'purchase' strictly
    after that?  Hash exchange on user_id; per partition ONE vectorized
    polars pass computes the three stage timestamps as windowed minima
    (t_view = min view ts; t_click = min click ts > t_view; t_buy = min
    purchase ts > t_click) — no per-user Python, no MATCH_RECOGNIZE engine.
    Output: one row per funnel stage with the user count that reached it."""
    from .relational import grouped_agg
    from .stages.dedup import _pl, hash_group_exchange

    part_schema = pa.schema([
        ("stage", pa.string()), ("n_users", pa.int64()),
    ])

    def funnel_part(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part)
        t_view = (pl.when(pl.col("event_type") == "view")
                  .then(pl.col("ts")).min().over("user_id"))
        df = df.with_columns(t_view.alias("t_view"))
        t_click = (pl.when((pl.col("event_type") == "click")
                           & (pl.col("ts") > pl.col("t_view")))
                   .then(pl.col("ts")).min().over("user_id"))
        df = df.with_columns(t_click.alias("t_click"))
        t_buy = (pl.when((pl.col("event_type") == "purchase")
                         & (pl.col("ts") > pl.col("t_click")))
                 .then(pl.col("ts")).min().over("user_id"))
        df = df.with_columns(t_buy.alias("t_buy"))
        g = df.group_by("user_id").agg(
            v=pl.col("t_view").first().is_not_null(),
            c=pl.col("t_click").first().is_not_null(),
            b=pl.col("t_buy").first().is_not_null(),
        )
        return pa.table({
            "stage": pa.array(["view", "view>click", "view>click>purchase"]),
            "n_users": pa.array([int(g["v"].sum()), int(g["c"].sum()),
                                 int(g["b"].sum())], pa.int64()),
        }, schema=part_schema)

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    parts = hash_group_exchange(ds, ["user_id"], funnel_part, part_schema)
    return grouped_agg(parts, ["stage"], sums=["n_users"], in_schema=part_schema)


SQL_REL_FUNNEL = """
WITH v AS (SELECT user_id, min(ts) AS t FROM events
           WHERE event_type = 'view' GROUP BY user_id),
     c AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN v USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY e.user_id),
     b AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id)
SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
UNION ALL SELECT 'view>click', CAST(COUNT(*) AS BIGINT) FROM c
UNION ALL SELECT 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM b
"""


def q_rel_late_events(sf_dir: str) -> rd.Dataset:
    """Watermark-style late-data detection: per user, an event is LATE if
    its timestamp is below the running maximum over everything that ARRIVED
    before it.  Arrival disorder is planted deterministically (every 10th
    event's arrival is delayed by 37 sequence slots — pure event_id
    arithmetic, so the oracle replays it).  Hash exchange on user_id, one
    sort + shifted cum-max pass per partition — the out-of-order/eviction
    primitive under every streaming-window operator."""
    from .stages.dedup import _pl, hash_group_exchange

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("lateness_us", pa.int64()),
    ])

    def late_part(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part).sort(["user_id", "arr", "event_id"])
        us = pl.col("ts").cast(pl.Datetime("us")).cast(pl.Int64)
        df = df.with_columns(us.alias("us")).with_columns(
            hw=pl.col("us").cum_max().shift(1).over("user_id"))
        out = df.filter(pl.col("hw").is_not_null()
                        & (pl.col("us") < pl.col("hw"))).select(
            pl.col("event_id"), pl.col("user_id"),
            (pl.col("hw") - pl.col("us")).alias("lateness_us"))
        return out.to_arrow().cast(out_schema)

    def plant(b: pa.Table) -> pa.Table:
        mod10 = pc.subtract(b["event_id"],
                            pc.multiply(pc.divide(b["event_id"], pa.scalar(10, pa.int64())),
                                        pa.scalar(10, pa.int64())))
        delay = pc.if_else(pc.equal(mod10, pa.scalar(0, pa.int64())),
                           pa.scalar(37, pa.int64()), pa.scalar(0, pa.int64()))
        return b.append_column("arr", pc.add(b["event_id"], delay))

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"]) \
        .map_batches(plant, batch_format="pyarrow")
    return hash_group_exchange(ds, ["user_id"], late_part, out_schema)


SQL_REL_LATE_EVENTS = """
WITH arr AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         event_id + CASE WHEN event_id % 10 = 0 THEN 37 ELSE 0 END AS arr
  FROM events),
w AS (
  SELECT event_id, user_id, us,
         MAX(us) OVER (PARTITION BY user_id ORDER BY arr, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
  FROM arr)
SELECT event_id, user_id, CAST(hw - us AS BIGINT) AS lateness_us
FROM w WHERE hw IS NOT NULL AND us < hw
"""


def q_rel_percent_rank(sf_dir: str) -> rd.Dataset:
    """PERCENT_RANK + CUME_DIST per partition: hash exchange on lang, one
    vectorized sort + cumulative-count pass per partition.  The ORDER BY is
    a total order (n_chars, doc_id), so rank == row_number and both window
    functions reduce to the same two IEEE-double divisions DuckDB computes
    — bit-exact on both sides."""
    from .stages.dedup import _pl, hash_group_exchange

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("lang", pa.string()),
        ("pct_rank", pa.float64()), ("cume_dist", pa.float64()),
    ])

    def pr_part(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part).sort(["lang", "n_chars", "doc_id"])
        out = df.with_columns(
            rn=pl.col("doc_id").cum_count().over("lang").cast(pl.Int64),
            n=pl.len().over("lang").cast(pl.Int64),
        ).select(
            pl.col("doc_id"), pl.col("lang"),
            ((pl.col("rn") - 1).cast(pl.Float64)
             / (pl.col("n") - 1).cast(pl.Float64)).alias("pct_rank"),
            (pl.col("rn").cast(pl.Float64)
             / pl.col("n").cast(pl.Float64)).alias("cume_dist"),
        )
        return out.to_arrow().cast(out_schema)

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return hash_group_exchange(ds, ["lang"], pr_part, out_schema)


SQL_REL_PERCENT_RANK = """
SELECT doc_id, lang,
  PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS pct_rank,
  CUME_DIST() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS cume_dist
FROM documents
"""


def q_rel_global_enumerate(sf_dir: str) -> rd.Dataset:
    """Global ROW_NUMBER over a total order (longest documents first): a
    range-partitioned sample sort leaves blocks in global key order, then
    per-block enumeration shifted by a metadata-only prefix sum of block
    row counts (see ``relational.global_enumerate`` — rows never reach the
    driver).  The full-corpus ranking primitive behind curriculum ordering
    and deterministic sharding."""
    from .relational import global_enumerate

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return global_enumerate(ds, ["n_chars", "doc_id"],
                            descending=[True, False], alias="row_num")


SQL_REL_GLOBAL_ENUMERATE = """
SELECT doc_id, n_chars,
  ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS row_num
FROM documents
"""


# --- set INTERSECT ----------------------------------------------------------

def q_rel_intersect(sf_dir: str) -> rd.Dataset:
    """Set INTERSECT (nations having BOTH a high-balance customer AND an
    low-balance supplier): per-side distinct through the hash exchange, then one
    distributed LEFT-SEMI join — the dual of ``rel_except``'s anti-join.
    Both sides pre-shrink to one row per key before anything crosses the
    wire, so the join input is bounded by key cardinality, not table size."""
    # NOTE: keys passed explicitly — Ray 2.49's schema() metadata mis-reports
    # a Filter->Project lineage as still carrying the filter column, so
    # distinct's schema-derived default would select a dropped column.
    c = R.distinct(R.filter_expr(
        _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"]),
        "c_acctbal > 9000"), ["c_nationkey"])
    s = R.distinct(R.filter_expr(
        _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"]),
        "s_acctbal < 1000"), ["s_nationkey"])
    return R.planned_join(c, s, on=["c_nationkey"], right_on=["s_nationkey"],
                          join_type="left_semi")


SQL_REL_INTERSECT = """
SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 9000
INTERSECT
SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal < 1000
"""


# --- UNNEST WITH ORDINALITY --------------------------------------------------

def q_rel_unnest(sf_dir: str) -> rd.Dataset:
    """UNNEST WITH ORDINALITY (list explode — the lateral flatten the
    Dataset API lacks as a relational operator): each document's whitespace
    token list becomes one row per (doc, position, token).  One vectorized
    polars split+explode pass per batch — no cross-row state, fully
    streaming, output fans out ~40× but never materializes."""
    from .stages.dedup import _pl

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        pl = _pl()
        df = (pl.from_arrow(b)
              .with_columns(pl.col("text").str.split(" ").alias("tok"))
              .drop("text"))
        df = df.with_columns(
            pl.int_ranges(1, pl.col("tok").list.len() + 1).alias("ord"))
        out = df.explode(["tok", "ord"], empty_as_null=False)
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("tok", pa.string()),
            ("ord", pa.int64()),
        ]))

    return ds.map_batches(explode, batch_format="pyarrow")


SQL_REL_UNNEST = """
SELECT doc_id,
       unnest(string_split(text, ' ')) AS tok,
       CAST(unnest(range(1, len(string_split(text, ' ')) + 1)) AS BIGINT) AS ord
FROM documents
"""


# --- skew-aware join ---------------------------------------------------------

_LANG_FAMILY = [
    ("en", "Germanic"), ("de", "Germanic"), ("fr", "Romance"),
    ("es", "Romance"), ("zh", "Sinitic"),
]


def q_rel_skew_join(sf_dir: str) -> rd.Dataset:
    """Skew-aware join on a naturally hot key: ``documents.lang`` is
    ~44 % ``en``, so a plain hash join funnels nearly half the corpus
    through one reduce partition.  :func:`relational.skew_join` detects hot
    keys from a map-side pre-aggregated count, broadcasts the dim side's
    hot rows (the ``en`` rows never enter an exchange), and hash-joins only
    the cold tail — same rows out, skew-proof physical plan."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    dim = rd.from_arrow(pa.table({
        "lang": [l for l, _ in _LANG_FAMILY],
        "family": [f for _, f in _LANG_FAMILY],
    }))
    j = R.skew_join(docs, dim, on=["lang"], hot_count=100)
    return j.select_columns(["doc_id", "lang", "family"])


SQL_REL_SKEW_JOIN = """
SELECT d.doc_id, d.lang, f.family
FROM documents d
JOIN (VALUES ('en','Germanic'), ('de','Germanic'), ('fr','Romance'),
             ('es','Romance'), ('zh','Sinitic')) f(lang, family)
  ON d.lang = f.lang
"""


def q_rel_pushdown_read(sf_dir: str) -> rd.Dataset:
    """Predicate pushdown AT THE SCAN: the row filter is a
    ``pyarrow.dataset`` expression handed to ``read_parquet(filter=...)``,
    so row groups whose min/max statistics exclude
    ``event_type = 'purchase' AND value > 100`` are skipped before their
    bytes leave storage — the 100 TB contrast to reading everything and
    filtering in a map stage (reference analogue: WHERE pushed into the SQL
    engine, ``sql_converter.py:265-267``).  Money doubles integerize to
    cents post-scan."""
    import pyarrow.dataset as pds

    expr = (pds.field("event_type") == "purchase") & (pds.field("value") > 100.0)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"],
                         filter=expr)

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(b["value"], 100),
                             round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                         "cents": c})

    return ds.map_batches(cents, batch_format="pyarrow")


SQL_REL_PUSHDOWN_READ = """
SELECT event_id, user_id,
       CAST(ROUND(value * 100) AS BIGINT) AS cents
FROM events WHERE event_type = 'purchase' AND value > 100
"""


def q_rel_regr_slope(sf_dir: str) -> rd.Dataset:
    """Per-group least-squares regression (REGR_SLOPE / REGR_INTERCEPT) in
    ONE pass over the fact table: the five raw moments (n, Σx, Σy, Σxy,
    Σxx) are exact int64 sums — x is the integral quantity, y the price
    rounded to whole dollars — combined map-side and merged through one
    grouped exchange, so at 100 TB the shuffle moves one 5-number row per
    (block, group).  Slope/intercept derive from the moments with the SAME
    float64 expression the SQL oracle uses (exact integer inputs + one
    deterministic IEEE expression = bit-identical doubles)."""
    in_schema = pa.schema([
        ("l_returnflag", pa.string()), ("n", pa.int64()), ("sx", pa.int64()),
        ("sy", pa.int64()), ("sxy", pa.int64()), ("sxx", pa.int64()),
    ])

    def moments(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(b["l_quantity"]), pa.int64())
        y = pc.cast(pc.round(b["l_extendedprice"],
                             round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({
            "l_returnflag": b["l_returnflag"], "n": pa.array([1] * len(b), pa.int64()),
            "sx": x, "sy": y, "sxy": pc.multiply(x, y), "sxx": pc.multiply(x, x),
        })
        return t

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    agg = R.grouped_agg(ds.map_batches(moments, batch_format="pyarrow"),
                        ["l_returnflag"], sums=["n", "sx", "sy", "sxy", "sxx"],
                        in_schema=in_schema)

    def solve(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        sx = t["sx"].to_numpy().astype(np.float64)
        sy = t["sy"].to_numpy().astype(np.float64)
        sxy = t["sxy"].to_numpy().astype(np.float64)
        sxx = t["sxx"].to_numpy().astype(np.float64)
        # identical operation order to the SQL oracle — keep in sync
        slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
        intercept = sy / n - slope * (sx / n)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": t["n"],
            "slope": pa.array(slope, pa.float64()),
            "intercept": pa.array(intercept, pa.float64()),
        })

    return agg.map_batches(solve, batch_format="pyarrow")


SQL_REL_REGR_SLOPE = """
WITH m AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
    CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
           * CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
           * CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sxx
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
    / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
    AS slope,
  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
    - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
       / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS intercept
FROM m
"""


def q_rel_mode(sf_dir: str) -> rd.Dataset:
    """Per-group MODE with a total tie-break (most frequent quantity per
    return flag, smallest value wins ties): map-side (group, value) partial
    counts collapse each block to at most |groups|×|values| rows, one
    grouped exchange merges them, and :func:`relational.grouped_topk`
    (count DESC, value ASC, k=1) picks the winner — never a full-data
    shuffle, deterministic under any block order."""
    in_schema = pa.schema([
        ("l_returnflag", pa.string()), ("qty", pa.int64()), ("cnt", pa.int64()),
    ])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "qty": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
            "cnt": pa.array([1] * len(b), pa.int64()),
        })
        return t

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    counts = R.grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                           ["l_returnflag", "qty"], sums=["cnt"],
                           in_schema=in_schema)
    top = R.grouped_topk(counts, keys=["l_returnflag"],
                         order_by=[("cnt", True), ("qty", False)], k=1)
    return top.map_batches(
        lambda t: pa.table({"l_returnflag": t["l_returnflag"],
                            "mode_qty": t["qty"], "mode_count": t["cnt"]}),
        batch_format="pyarrow")


SQL_REL_MODE = """
SELECT l_returnflag, qty AS mode_qty, cnt AS mode_count FROM (
  SELECT l_returnflag, qty, cnt,
    row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY cnt DESC, qty) AS rnk
  FROM (SELECT l_returnflag, CAST(ROUND(l_quantity) AS BIGINT) AS qty,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1, 2))
WHERE rnk = 1
"""


ZORDER_BITS = 16   # Morton code over the low 16 bits of each dim
ZORDER_PARTS = 16  # layout partitions over the realized z-key range


def q_rel_zorder_layout(sf_dir: str) -> rd.Dataset:
    """Z-ORDER (Morton) data-layout planning — the lakehouse OPTIMIZE
    ZORDER primitive: interleave the low 16 bits of two filter dimensions
    (user_id, event_id) into a 32-bit space-filling key, split the
    REALIZED key range into 16 layout partitions (zkey·16 // (max+1) —
    one metadata max() aggregate, the same plan-constant pattern as
    pagerank's node count), and report per-partition row counts plus both
    dimensions' min/max envelopes — the statistics a scan planner prunes
    row groups with (a z-clustered layout keeps BOTH envelopes narrow per
    file, where a single-column sort only narrows one).  The bit
    interleave is one vectorized numpy pass (16 shift/or steps over whole
    arrays); the envelope fold is one streaming hash exchange keyed on the
    partition id."""
    from .stages.dedup import _pl, hash_group_exchange

    mid = pa.schema([("zkey", pa.int64()), ("user_id", pa.int64()),
                     ("event_id", pa.int64())])
    out_schema = pa.schema([
        ("part", pa.int64()), ("n_rows", pa.int64()),
        ("u_min", pa.int64()), ("u_max", pa.int64()),
        ("e_min", pa.int64()), ("e_max", pa.int64()),
    ])

    def zmap(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        um, em = u & 0xFFFF, e & 0xFFFF
        z = np.zeros(len(u), np.int64)
        for k in range(ZORDER_BITS):
            z |= ((um >> k) & 1) << (2 * k)
            z |= ((em >> k) & 1) << (2 * k + 1)
        return pa.table({"zkey": pa.array(z), "user_id": t["user_id"],
                         "event_id": t["event_id"]}, schema=mid)

    keyed = _read(sf_dir, "events", columns=["event_id", "user_id"]
                  ).map_batches(zmap, batch_format="pyarrow").materialize()
    zmax = int(keyed.max("zkey"))

    def assign(t: pa.Table) -> pa.Table:
        z = t["zkey"].to_numpy(zero_copy_only=False)
        part = z * ZORDER_PARTS // (zmax + 1)
        return pa.table({"part": pa.array(part.astype(np.int64)),
                         "user_id": t["user_id"],
                         "event_id": t["event_id"]})

    def envelope(tbl: pa.Table) -> pa.Table:
        pl = _pl()
        df = (
            _pl().from_arrow(tbl).group_by("part")
            .agg(pl.len().cast(pl.Int64).alias("n_rows"),
                 pl.col("user_id").min().alias("u_min"),
                 pl.col("user_id").max().alias("u_max"),
                 pl.col("event_id").min().alias("e_min"),
                 pl.col("event_id").max().alias("e_max"))
        )
        return df.to_arrow().cast(out_schema)

    parts = keyed.map_batches(assign, batch_format="pyarrow")
    return hash_group_exchange(parts, ["part"], envelope, out_schema)


SQL_REL_ZORDER_LAYOUT = f"""
WITH z AS (
  SELECT user_id, event_id,
    CAST(list_sum(list_transform(range(0, {ZORDER_BITS}), k ->
      (((user_id & 65535) >> k) & 1) * (CAST(1 AS BIGINT) << (2*k)) +
      (((event_id & 65535) >> k) & 1) * (CAST(1 AS BIGINT) << (2*k + 1))))
      AS BIGINT) AS zkey
  FROM events),
m AS (SELECT MAX(zkey) AS zm FROM z)
SELECT zkey * {ZORDER_PARTS} // (zm + 1) AS part, COUNT(*) AS n_rows,
  MIN(user_id) AS u_min, MAX(user_id) AS u_max,
  MIN(event_id) AS e_min, MAX(event_id) AS e_max
FROM z CROSS JOIN m GROUP BY 1
"""


def q_rel_scd2(sf_dir: str) -> rd.Dataset:
    """SCD Type-2 dimension build from the event stream: collapse each
    user's consecutive runs of equal ``event_type`` into validity
    intervals (valid_from, valid_to; open-ended for the current state) —
    the slowly-changing-dimension history table a warehouse derives from
    CDC feeds.  One hash exchange on user_id, then a vectorized
    sort + shifted-comparison run detector per partition (same scale
    shape as sessionize / lag: never per-group Python)."""
    import numpy as np

    from .stages.dedup import hash_group_exchange

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("valid_from_us", pa.int64()), ("valid_to_us", pa.int64()),
    ])

    def scd2_part(part: pa.Table) -> pa.Table:
        g = part.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(g["event_type"].to_pylist(), dtype=object)
        ts = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return out_schema.empty_table()
        brk = np.ones(n, bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(brk)
        r_uid = uid[starts]
        r_from = ts[starts]
        nxt_from = np.roll(r_from, -1)
        nxt_uid = np.roll(r_uid, -1)
        open_end = np.ones(len(starts), bool)
        if len(starts) > 1:
            open_end[:-1] = nxt_uid[:-1] != r_uid[:-1]
        vt = pc.if_else(pa.array(~open_end),
                        pa.array(nxt_from.astype(np.int64), pa.int64()),
                        pa.scalar(None, pa.int64()))
        return pa.table({
            "user_id": pa.array(r_uid.astype(np.int64), pa.int64()),
            "event_type": pa.array(et[starts].tolist(), pa.string()),
            "valid_from_us": pa.array(r_from.astype(np.int64), pa.int64()),
            "valid_to_us": vt,
        }, schema=out_schema)

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "event_type"])
    return hash_group_exchange(ds, ["user_id"], scd2_part, out_schema)


SQL_REL_SCD2 = """
WITH r AS (
  SELECT user_id, event_type, ts, event_id,
    CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS grp
  FROM r),
runs AS (
  SELECT user_id, event_type, grp,
         CAST(epoch_us(MIN(ts)) AS BIGINT) AS valid_from_us
  FROM g GROUP BY 1, 2, 3)
SELECT user_id, event_type, valid_from_us,
  LEAD(valid_from_us) OVER (PARTITION BY user_id
                            ORDER BY valid_from_us, grp) AS valid_to_us
FROM runs
"""


def q_rel_event_bigrams(sf_dir: str) -> rd.Dataset:
    """Sequential pattern mining: per-user consecutive event-type
    transitions (the Markov/journey-analysis primitive behind funnel
    discovery and next-event prediction).  One user-keyed hash exchange
    co-locates each user's timeline; pair extraction is a whole-partition
    vectorized shift (sort by user/ts/event_id, mask same-user) with a
    per-partition combine, so the final grouped exchange moves one row per
    distinct transition per partition; the permille transition rate is
    computed on the tiny |types|² result in one task."""
    from .stages.dedup import hash_group_exchange

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    pair_schema = pa.schema([("e_from", pa.string()), ("e_to", pa.string()),
                             ("n", pa.int64())])

    def pairs(part: pa.Table) -> pa.Table:
        g = part.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        if len(uid) < 2:
            return pair_schema.empty_table()
        same = uid[1:] == uid[:-1]
        t = pa.table({"e_from": pa.array(et[:-1][same]),
                      "e_to": pa.array(et[1:][same])})
        return (t.group_by(["e_from", "e_to"])
                .aggregate([([], "count_all")])
                .rename_columns(["e_from", "e_to", "n"])
                .cast(pair_schema))

    parts = hash_group_exchange(ev, ["user_id"], pairs, pair_schema)
    g = R.grouped_agg(parts, ["e_from", "e_to"], sums=["n"],
                      in_schema=pair_schema)

    def rate(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        keys = t["e_from"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(keys, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, n)
        return t.append_column(
            "rate_permille", pa.array(n * 1000 // tot[inv], pa.int64()))

    return g.repartition(1).map_batches(rate, batch_format="pyarrow",
                                        batch_size=None)


EWMA_A, EWMA_S = 300, 1000  # alpha = 0.3 in permille fixed point


def q_rel_ewma(sf_dir: str) -> rd.Dataset:
    """Exponentially weighted moving average of ``value`` per user timeline
    (the streaming smoothing operator behind anomaly baselines and rate
    trackers) in exact fixed point: ``s₀ = v₀``, ``sₜ = (A·vₜ +
    (S−A)·sₜ₋₁) // S`` over half-up milli-quantized values, with ``//``
    truncating toward zero on BOTH sides (DuckDB's semantics — numpy's
    floor division would silently diverge on negative values).  The
    recurrence is inherently sequential IN TIME but parallel ACROSS users:
    one user-keyed hash exchange co-locates timelines, then each partition
    advances all its users ONE rank per vectorized step (≤ max
    events/user steps, each a numpy gather over the whole partition — no
    per-row Python).  The integer recurrence replays in a recursive-CTE
    SQL oracle."""
    from .stages.dedup import hash_group_exchange

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("ewma_milli", pa.int64())])

    def smooth(part: pa.Table) -> pa.Table:
        g = part.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        v = np.floor(g["value"].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1000.0 + 0.5).astype(np.int64)
        n = len(uid)
        if n == 0:
            return out_schema.empty_table()
        start = np.ones(n, bool)
        start[1:] = uid[1:] != uid[:-1]
        starts_idx = np.nonzero(start)[0]
        counts = np.diff(np.append(starts_idx, n))
        rank = np.arange(n) - np.repeat(starts_idx, counts)
        s = v.copy()
        for r in range(1, int(rank.max()) + 1 if n else 0):
            idx = np.nonzero(rank == r)[0]
            if not len(idx):
                break
            num = EWMA_A * v[idx] + (EWMA_S - EWMA_A) * s[idx - 1]
            # truncate toward zero like DuckDB's `//` (numpy's `//` floors,
            # which diverges on negative values)
            s[idx] = np.sign(num) * (np.abs(num) // EWMA_S)
        return pa.table({
            "event_id": pc.cast(g["event_id"], pa.int64()),
            "user_id": pa.array(uid.astype(np.int64)),
            "ewma_milli": pa.array(s)}, schema=out_schema)

    return hash_group_exchange(ev, ["user_id"], smooth, out_schema)


SQL_REL_EWMA = f"""
WITH RECURSIVE o AS (
  SELECT user_id, event_id,
    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS v,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r
  FROM events),
e AS (
  SELECT user_id, event_id, r, v, v AS s FROM o WHERE r = 1
  UNION ALL
  SELECT o.user_id, o.event_id, o.r, o.v,
    ({EWMA_A} * o.v + {EWMA_S - EWMA_A} * e.s) // {EWMA_S}
  FROM e JOIN o ON o.user_id = e.user_id AND o.r = e.r + 1)
SELECT event_id, user_id, CAST(s AS BIGINT) AS ewma_milli FROM e
"""


def q_rel_changepoint(sf_dir: str) -> rd.Dataset:
    """Single mean-shift changepoint per user timeline (the CUSUM-style
    anomaly localizer): for every split rank k the shift score is the
    cross-multiplied exact integer ``|l_sum·r_cnt − r_sum·l_cnt|`` (no
    division, no float), and the reported split maximizes it (ties →
    earliest rank).  One user-keyed hash exchange; per partition the
    cumulative sums, per-user totals and the arg-max are whole-partition
    polars/numpy ops.  Output: (user_id, split_rank, split_event_id,
    score)."""
    from .stages.dedup import _pl, hash_group_exchange

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("split_rank", pa.int64()),
                            ("split_event_id", pa.int64()),
                            ("score", pa.int64())])

    def best_split(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = (pl.from_arrow(part)
              .with_columns(v=(pl.col("value") * 1000.0 + 0.5)
                            .floor().cast(pl.Int64))
              .sort(["user_id", "ts", "event_id"])
              .with_columns(
                  r=pl.col("event_id").cum_count().over("user_id")
                  .cast(pl.Int64),
                  n=pl.col("v").count().over("user_id").cast(pl.Int64),
                  lsum=pl.col("v").cum_sum().over("user_id"),
                  tsum=pl.col("v").sum().over("user_id"))
              .filter(pl.col("r") < pl.col("n"))
              .with_columns(
                  score=(pl.col("lsum") * (pl.col("n") - pl.col("r"))
                         - (pl.col("tsum") - pl.col("lsum")) * pl.col("r"))
                  .abs())
              .sort(["user_id", "score", "r"],
                    descending=[False, True, False])
              .group_by("user_id", maintain_order=True).first()
              .select(pl.col("user_id").cast(pl.Int64),
                      pl.col("r").alias("split_rank"),
                      pl.col("event_id").alias("split_event_id")
                      .cast(pl.Int64),
                      pl.col("score")))
        return df.to_arrow().cast(out_schema)

    return hash_group_exchange(ev, ["user_id"], best_split, out_schema)


K_ANON = 30


def q_rel_k_anonymity(sf_dir: str) -> rd.Dataset:
    """k-anonymity audit over the (lang, source) quasi-identifier pair —
    the re-identification-risk report privacy review runs before a corpus
    release: every equivalence class with its size and a risk flag
    (``n < k`` ⇒ suppression candidate), plus each class's share of the
    corpus in permille.  One map-side combine + grouped exchange (classes,
    not rows, move); the tiny class table finishes in one task."""
    from .relational import grouped_agg

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"])

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t["lang"], "source": t["source"],
                         "n": pa.array(np.ones(t.num_rows, np.int64))})

    g = grouped_agg(docs.map_batches(ones, batch_format="pyarrow"),
                    ["lang", "source"], sums=["n"],
                    in_schema=pa.schema([("lang", pa.string()),
                                         ("source", pa.string()),
                                         ("n", pa.int64())]))

    def flag(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        tot = int(n.sum())
        return pa.table({
            "lang": t["lang"], "source": t["source"], "n": t["n"],
            "at_risk": pa.array((n < K_ANON).astype(np.int64)),
            "share_permille": pa.array(n * 1000 // tot),
        })

    return g.repartition(1).map_batches(flag, batch_format="pyarrow",
                                        batch_size=None)


SQL_REL_K_ANONYMITY = f"""
WITH g AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY lang, source),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g)
SELECT lang, source, n,
  CAST(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END AS BIGINT) AS at_risk,
  (n * 1000) // tot AS share_permille
FROM g CROSS JOIN t
"""


SQL_REL_CHANGEPOINT = """
WITH o AS (
  SELECT user_id, event_id,
    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS v,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r,
    COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events),
c AS (
  SELECT user_id, event_id, r, n,
    SUM(v) OVER (PARTITION BY user_id ORDER BY r
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum,
    SUM(v) OVER (PARTITION BY user_id) AS tsum
  FROM o)
SELECT user_id, CAST(r AS BIGINT) AS split_rank,
  event_id AS split_event_id,
  CAST(abs(lsum * (n - r) - (tsum - lsum) * r) AS BIGINT) AS score
FROM c WHERE r < n
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY score DESC, r) = 1
"""


SQL_REL_EVENT_BIGRAMS = """
WITH o AS (
  SELECT user_id, event_type,
    lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
  FROM events),
g AS (
  SELECT event_type AS e_from, nxt AS e_to, CAST(COUNT(*) AS BIGINT) AS n
  FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
t AS (SELECT e_from, CAST(SUM(n) AS BIGINT) AS tot FROM g GROUP BY 1)
SELECT g.e_from, g.e_to, g.n, (g.n * 1000) // t.tot AS rate_permille
FROM g JOIN t USING (e_from)
"""


def q_rel_sqlite_source(sf_dir: str) -> rd.Dataset:
    """Partitioned LIVE-DATABASE source end-to-end (reference S1 reads its
    relations from a SQLAlchemy engine — ``r2r_store.py:150-154``,
    ``old_tests/util.py:6-35``): the orders relation is loaded into a
    sqlite file (money pre-integerized to cents with the shared
    half-away-from-zero protocol), then ``sources.sqldb.read_sql_table``
    streams it back as 16 key-range fragment queries over a read-only
    actor-pool connection — predicate AND column pruning pushed into every
    fragment's SQL — and the fragments feed the ordinary grouped-agg
    exchange.  Oracle replays the same filter/group over the parquet
    twin."""
    import sqlite3

    import pyarrow.parquet as pq

    from .driver_api import _roundtrip_dir
    from .sources.sqldb import read_sql_table

    t = pq.read_table(f"{sf_dir}/orders.parquet",
                      columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cents = R.money_cents(t, "o_totalprice")
    db = _roundtrip_dir("sqlite_src") + "/orders.db"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, "
                "o_custkey INTEGER, price_cents INTEGER)")
    con.executemany(
        "INSERT INTO orders VALUES (?, ?, ?)",
        zip(t["o_orderkey"].to_pylist(), t["o_custkey"].to_pylist(),
            cents.to_pylist()))
    con.commit()
    con.close()

    ds = read_sql_table(
        f"sqlite:///{db}", "orders", "o_orderkey",
        columns=["o_custkey", "price_cents"],
        predicate="price_cents > 10000000", num_fragments=16)

    def shape(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                         "sum_cents": pc.cast(b["price_cents"], pa.int64())})

    return R.grouped_agg(
        ds.map_batches(shape, batch_format="pyarrow"),
        ["o_custkey"], sums=["sum_cents"], count_as="n_orders",
        in_schema=pa.schema([("o_custkey", pa.int64()),
                             ("sum_cents", pa.int64())]))


SQL_REL_SQLITE_SOURCE = """
SELECT o_custkey,
  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
  COUNT(*) AS n_orders
FROM orders
WHERE CAST(ROUND(o_totalprice*100) AS BIGINT) > 10000000
GROUP BY o_custkey
"""


def queries() -> Dict[str, Callable[[str], rd.Dataset]]:
    return {
        "rel_sqlite_source": q_rel_sqlite_source,
        "rel_event_bigrams": q_rel_event_bigrams,
        "rel_ewma": q_rel_ewma,
        "rel_changepoint": q_rel_changepoint,
        "rel_k_anonymity": q_rel_k_anonymity,
        "rel_scd2": q_rel_scd2,
        "rel_filter": q_rel_filter,
        "rel_grouped_topk": q_rel_grouped_topk,
        "rel_pricing": q_rel_pricing,
        "rel_join_agg": q_rel_join_agg,
        "rel_star_join": q_rel_star_join,
        "rel_merge_upsert": q_rel_merge_upsert,
        "rel_incr_agg": q_rel_incr_agg,
        "rel_incr_join": q_rel_incr_join,
        "rel_histogram": q_rel_histogram,
        "rel_unpivot": q_rel_unpivot,
        "rel_cohort_retention": q_rel_cohort_retention,
        "rel_gapfill": q_rel_gapfill,
        "rel_time_window_sum": q_rel_time_window_sum,
        "rel_range_partition": q_rel_range_partition,
        "rel_left_join": q_rel_left_join,
        "rel_exists": q_rel_exists,
        "rel_not_exists": q_rel_not_exists,
        "rel_union_pad": q_rel_union_pad,
        "rel_except": q_rel_except,
        "rel_distinct": q_rel_distinct,
        "rel_topk": q_rel_topk,
        "rel_offset": q_rel_offset,
        "rel_sample": q_rel_sample,
        "rel_count_distinct": q_rel_count_distinct,
        "rel_group_concat": q_rel_group_concat,
        "rel_values_join": q_rel_values_join,
        "rel_window_tumbling": q_rel_window_tumbling,
        "rel_window_hopping": q_rel_window_hopping,
        "rel_sessionize": q_rel_sessionize,
        "rel_scalar_funcs": q_rel_scalar_funcs,
        "curate_corpus": q_curate_corpus,
        "rel_json_extract": q_rel_json_extract,
        "rel_asof_join": q_rel_asof_join,
        "rel_interval_join": q_rel_interval_join,
        "rel_range_join": q_rel_range_join,
        "rel_stratified_sample": q_rel_stratified_sample,
        "rel_quantiles": q_rel_quantiles,
        "rel_rollup": q_rel_rollup,
        "rel_cube": q_rel_cube,
        "rel_grouping_sets": q_rel_grouping_sets,
        "rel_pivot": q_rel_pivot,
        "rel_rank_window": q_rel_rank_window,
        "rel_lag_delta": q_rel_lag_delta,
        "dd_url_dedup": q_dd_url_dedup,
        "rel_bloom_semi_join": q_rel_bloom_semi_join,
        "rel_grouped_quantiles": q_rel_grouped_quantiles,
        "rel_ntile": q_rel_ntile,
        "rel_running_sum": q_rel_running_sum,
        "rel_first_last": q_rel_first_last,
        "rel_full_outer": q_rel_full_outer,
        "rel_moving_sum": q_rel_moving_sum,
        "rel_percentile_cont": q_rel_percentile_cont,
        "rel_funnel": q_rel_funnel,
        "rel_global_enumerate": q_rel_global_enumerate,
        "rel_percent_rank": q_rel_percent_rank,
        "rel_late_events": q_rel_late_events,
        "rel_intersect": q_rel_intersect,
        "rel_unnest": q_rel_unnest,
        "rel_skew_join": q_rel_skew_join,
        "rel_regr_slope": q_rel_regr_slope,
        "rel_pushdown_read": q_rel_pushdown_read,
        "rel_mode": q_rel_mode,
        "rel_zorder_layout": q_rel_zorder_layout,
    }


def oracle_sql() -> Dict[str, str]:
    return {
        "rel_sqlite_source": SQL_REL_SQLITE_SOURCE,
        "rel_event_bigrams": SQL_REL_EVENT_BIGRAMS,
        "rel_ewma": SQL_REL_EWMA,
        "rel_changepoint": SQL_REL_CHANGEPOINT,
        "rel_k_anonymity": SQL_REL_K_ANONYMITY,
        "rel_filter": SQL_REL_FILTER,
        "rel_grouped_topk": SQL_REL_GROUPED_TOPK,
        "rel_pricing": SQL_REL_PRICING,
        "rel_join_agg": SQL_REL_JOIN_AGG,
        "rel_star_join": SQL_REL_STAR_JOIN,
        "rel_merge_upsert": SQL_REL_MERGE_UPSERT,
        "rel_incr_agg": SQL_REL_INCR_AGG,
        "rel_incr_join": SQL_REL_INCR_JOIN,
        "rel_histogram": SQL_REL_HISTOGRAM,
        "rel_unpivot": SQL_REL_UNPIVOT,
        "rel_cohort_retention": SQL_REL_COHORT_RETENTION,
        "rel_gapfill": SQL_REL_GAPFILL,
        "rel_time_window_sum": SQL_REL_TIME_WINDOW_SUM,
        "rel_range_partition": SQL_REL_RANGE_PARTITION,
        "rel_left_join": SQL_REL_LEFT_JOIN,
        "rel_exists": SQL_REL_EXISTS,
        "rel_not_exists": SQL_REL_NOT_EXISTS,
        "rel_union_pad": SQL_REL_UNION_PAD,
        "rel_except": SQL_REL_EXCEPT,
        "rel_distinct": SQL_REL_DISTINCT,
        "rel_topk": SQL_REL_TOPK,
        "rel_offset": SQL_REL_OFFSET,
        "rel_sample": SQL_REL_SAMPLE,
        "rel_json_extract": SQL_REL_JSON_EXTRACT,
        "rel_count_distinct": SQL_REL_COUNT_DISTINCT,
        "rel_group_concat": SQL_REL_GROUP_CONCAT,
        "rel_values_join": SQL_REL_VALUES_JOIN,
        "rel_window_tumbling": SQL_REL_WINDOW,
        "rel_window_hopping": SQL_REL_WINDOW_HOPPING,
        "rel_sessionize": SQL_REL_SESSIONIZE,
        "rel_scalar_funcs": SQL_REL_SCALAR_FUNCS,
        "curate_corpus": SQL_CURATE_CORPUS,
        "rel_asof_join": SQL_REL_ASOF_JOIN,
        "rel_interval_join": SQL_REL_INTERVAL_JOIN,
        "rel_range_join": SQL_REL_RANGE_JOIN,
        "rel_stratified_sample": SQL_REL_STRATIFIED_SAMPLE,
        "rel_quantiles": SQL_REL_QUANTILES,
        "rel_rollup": SQL_REL_ROLLUP,
        "rel_cube": SQL_REL_CUBE,
        "rel_grouping_sets": SQL_REL_GROUPING_SETS,
        "rel_pivot": SQL_REL_PIVOT,
        "rel_rank_window": SQL_REL_RANK_WINDOW,
        "rel_lag_delta": SQL_REL_LAG_DELTA,
        "rel_scd2": SQL_REL_SCD2,
        "dd_url_dedup": SQL_DD_URL_DEDUP,
        "rel_bloom_semi_join": SQL_REL_BLOOM_SEMI_JOIN,
        "rel_grouped_quantiles": SQL_REL_GROUPED_QUANTILES,
        "rel_ntile": SQL_REL_NTILE,
        "rel_running_sum": SQL_REL_RUNNING_SUM,
        "rel_first_last": SQL_REL_FIRST_LAST,
        "rel_full_outer": SQL_REL_FULL_OUTER,
        "rel_moving_sum": SQL_REL_MOVING_SUM,
        "rel_percentile_cont": SQL_REL_PERCENTILE_CONT,
        "rel_funnel": SQL_REL_FUNNEL,
        "rel_global_enumerate": SQL_REL_GLOBAL_ENUMERATE,
        "rel_percent_rank": SQL_REL_PERCENT_RANK,
        "rel_late_events": SQL_REL_LATE_EVENTS,
        "rel_intersect": SQL_REL_INTERSECT,
        "rel_unnest": SQL_REL_UNNEST,
        "rel_skew_join": SQL_REL_SKEW_JOIN,
        "rel_regr_slope": SQL_REL_REGR_SLOPE,
        "rel_pushdown_read": SQL_REL_PUSHDOWN_READ,
        "rel_mode": SQL_REL_MODE,
        "rel_zorder_layout": SQL_REL_ZORDER_LAYOUT,
    }
