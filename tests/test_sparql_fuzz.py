"""Differential fuzzing of the SPARQL front end against DuckDB: randomized
query shapes (BGP joins, OPTIONAL, numeric + string FILTERs, DISTINCT,
projection subsets) over the documents graph, each paired with an
equivalent SQL query over the raw table.  Catches planner/typing bugs the
fixed fixtures never exercise — the same idea as the driver's oracle gate,
but over a random family instead of hand-picked instances."""

import random

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

LANGS = ["en", "de", "fr", "es", "zh"]


def _gen(seed: int):
    rng = random.Random(seed)
    lo = rng.randrange(0, 500)
    hi = lo + rng.randrange(50, 400)
    want_lang = rng.random() < 0.5
    lang = rng.choice(LANGS)
    optional_src = rng.random() < 0.5
    distinct = rng.random() < 0.3
    # projection: always ?d, optionally ?l / ?c / ?s
    proj = ["d"] + [v for v, keep in (
        ("l", rng.random() < 0.7),
        ("c", rng.random() < 0.7),
    ) if keep]
    if optional_src and rng.random() < 0.7:
        proj.append("s")

    filt = f"?c >= {lo} && ?c < {hi}"
    if want_lang:
        filt += f' && ?l = "{lang}"'
    opt = "OPTIONAL { ?d <http://kg.ex/p/source> ?s }" if optional_src else ""
    q = f"""
    SELECT {"DISTINCT " if distinct else ""}{" ".join("?" + v for v in proj)}
    WHERE {{
      ?d <http://kg.ex/p/lang> ?l .
      ?d <http://kg.ex/p/n_chars> ?c .
      {opt}
      FILTER({filt})
    }}
    """

    colmap = {
        "d": "'<http://kg.ex/doc/' || CAST(doc_id AS VARCHAR) || '>'",
        "l": "lang",
        "c": "n_chars",
        "s": "source",
    }
    sel = ", ".join(f"{colmap[v]} AS {v}" for v in proj)
    where = f"n_chars >= {lo} AND n_chars < {hi} AND lang IS NOT NULL"
    if want_lang:
        where += f" AND lang = '{lang}'"
    sql = f"SELECT {'DISTINCT ' if distinct else ''}{sel} FROM documents WHERE {where}"
    return q, sql, proj


def _norm(df, proj):
    # SPARQL ints come back as N3 typed-literal strings ("225"^^<...>);
    # normalize both sides to bare lexical strings so the set compare is
    # representation-independent
    import re

    def lex(v):
        if v is None:
            return None
        s = str(v)
        m = re.match(r'^"(.*)"\^\^<[^>]*>$', s, re.S)
        return m.group(1) if m else s

    rows = []
    for tup in df[proj].itertuples(index=False):
        rows.append(tuple(lex(v) for v in tup))
    return sorted(rows, key=lambda r: tuple((x is None, x or "") for x in r))


@pytest.mark.parametrize("seed", range(25))
def test_sparql_matches_sql(ray_session, seed):
    from rdflib_r2r_ray import sparql
    from rdflib_r2r_ray.driver_api import _documents_triples

    q, sql, proj = _gen(seed)
    out = sparql.execute(_documents_triples(SF), q).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.execute(sql).df()
    # engine returns ?c as the bare lexical int (typed literal decoded);
    # SQL returns int — _norm stringifies both
    got = out.rename(columns={c: c for c in out.columns})
    assert _norm(got, proj) == _norm(want, proj), f"seed {seed}\n{q}\n{sql}"


def _gen_union(seed: int):
    """Randomized UNION-of-branches family (the BSBM explore Q4 shape the
    round-5 executor work added): two star branches with independent
    numeric/lang FILTERs, OPTIONAL in both branches or neither, optional
    DISTINCT and ORDER/LIMIT/OFFSET modifiers."""
    rng = random.Random(10_000 + seed)
    lo1 = rng.randrange(0, 400)
    hi1 = lo1 + rng.randrange(50, 300)
    lo2 = rng.randrange(0, 400)
    hi2 = lo2 + rng.randrange(50, 300)
    lang = rng.choice(LANGS)
    with_opt = rng.random() < 0.5
    distinct = rng.random() < 0.4
    modifiers = rng.random() < 0.5
    limit = rng.randrange(5, 40)
    offset = rng.randrange(0, 10)

    proj = ["d", "l", "c"] + (["s"] if with_opt else [])
    opt = "OPTIONAL { ?d <http://kg.ex/p/source> ?s }" if with_opt else ""
    base = ("?d <http://kg.ex/p/lang> ?l . "
            "?d <http://kg.ex/p/n_chars> ?c .")
    b1 = f"{{ {base} {opt} FILTER(?c >= {lo1} && ?c < {hi1}) }}"
    b2 = f'{{ {base} {opt} FILTER(?c >= {lo2} && ?c < {hi2} && ?l = "{lang}") }}'
    mod = f"ORDER BY ?d LIMIT {limit} OFFSET {offset}" if modifiers else ""
    q = f"""
    SELECT {"DISTINCT " if distinct else ""}{" ".join("?" + v for v in proj)}
    WHERE {{ {b1} UNION {b2} }}
    {mod}
    """

    colmap = {
        "d": "'<http://kg.ex/doc/' || CAST(doc_id AS VARCHAR) || '>'",
        "l": "lang", "c": "n_chars", "s": "source",
    }
    sel = ", ".join(f"{colmap[v]} AS {v}" for v in proj)
    w1 = f"n_chars >= {lo1} AND n_chars < {hi1} AND lang IS NOT NULL"
    w2 = (f"n_chars >= {lo2} AND n_chars < {hi2} AND lang = '{lang}'")
    inner = (f"SELECT {sel} FROM documents WHERE {w1} "
             f"UNION ALL SELECT {sel} FROM documents WHERE {w2}")
    sql = f"SELECT {'DISTINCT ' if distinct else ''}* FROM ({inner}) t"
    if modifiers:
        sql += f" ORDER BY d LIMIT {limit} OFFSET {offset}"
    return q, sql, proj


@pytest.mark.parametrize("seed", range(15))
def test_sparql_union_matches_sql(ray_session, seed):
    from rdflib_r2r_ray import sparql
    from rdflib_r2r_ray.driver_api import _documents_triples

    q, sql, proj = _gen_union(seed)
    out = sparql.execute(_documents_triples(SF), q).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.execute(sql).df()
    assert _norm(out, proj) == _norm(want, proj), f"seed {seed}\n{q}\n{sql}"


def _gen_agg(seed: int):
    """Randomized grouped-aggregate family: GROUP BY lang with a random
    subset of COUNT/SUM/AVG/MIN/MAX over n_chars, optional HAVING on the
    count, optional ORDER BY an aggregate alias + LIMIT."""
    rng = random.Random(20_000 + seed)
    fns = rng.sample(["count", "sum", "avg", "mn", "mx"],
                     k=rng.randrange(1, 4))
    having = rng.random() < 0.5
    hmin = rng.randrange(1, 40)
    order = rng.random() < 0.5
    lo = rng.randrange(0, 300)

    sparql_agg = {
        "count": "(COUNT(?c) AS ?count)", "sum": "(SUM(?c) AS ?sum)",
        "avg": "(AVG(?c) AS ?avg)", "mn": "(MIN(?c) AS ?mn)",
        "mx": "(MAX(?c) AS ?mx)",
    }
    sql_agg = {
        "count": "CAST(COUNT(n_chars) AS BIGINT) AS count",
        "sum": "SUM(n_chars) AS sum", "avg": "AVG(n_chars) AS avg",
        "mn": "CAST(MIN(n_chars) AS DOUBLE) AS mn",
        "mx": "CAST(MAX(n_chars) AS DOUBLE) AS mx",
    }
    proj = ["l"] + fns
    q = f"""
    SELECT ?l {" ".join(sparql_agg[f] for f in fns)}
    WHERE {{
      ?d <http://kg.ex/p/lang> ?l .
      ?d <http://kg.ex/p/n_chars> ?c .
      FILTER(?c >= {lo})
    }}
    GROUP BY ?l
    {f"HAVING(COUNT(?c) >= {hmin})" if having else ""}
    {f"ORDER BY DESC(?{fns[0]}) ?l LIMIT 3" if order else ""}
    """
    sql = (f"SELECT lang AS l, {', '.join(sql_agg[f] for f in fns)} "
           f"FROM documents WHERE n_chars >= {lo} AND lang IS NOT NULL "
           "GROUP BY lang")
    if having:
        sql += f" HAVING COUNT(n_chars) >= {hmin}"
    if order:
        sql += f" ORDER BY {fns[0]} DESC, l LIMIT 3"
    return q, sql, proj


@pytest.mark.parametrize("seed", range(15))
def test_sparql_agg_matches_sql(ray_session, seed):
    from rdflib_r2r_ray import sparql
    from rdflib_r2r_ray.driver_api import _documents_triples

    q, sql, proj = _gen_agg(seed)
    out = sparql.execute(_documents_triples(SF), q).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.execute(sql).df()

    def nrm(df):
        rows = []
        for tup in df[proj].itertuples(index=False):
            rows.append(tuple(round(float(v), 6) if isinstance(v, (int, float))
                              else str(v) for v in tup))
        return sorted(rows)

    assert nrm(out) == nrm(want), f"seed {seed}\n{q}\n{sql}"


def _gen_strfn(seed: int):
    """Randomized string-builtin family: one of STRLEN/UCASE/LCASE/SUBSTR/
    CONTAINS/STRSTARTS/STRENDS/CONCAT/REPLACE over the source column as a
    BIND + optional FILTER, paired with the DuckDB equivalent."""
    rng = random.Random(30_000 + seed)
    needle = rng.choice(["src1", "rc", "1", "src", "9"])
    sub_start = rng.randrange(1, 4)
    sub_len = rng.randrange(1, 4)
    fam = rng.choice(["strlen", "ucase", "substr", "contains",
                      "starts", "ends", "concat", "replace"])
    cases = {
        "strlen": ("BIND(STRLEN(?s) AS ?v)", "CAST(length(source) AS DOUBLE) AS v"),
        "ucase": ("BIND(UCASE(?s) AS ?v)", "upper(source) AS v"),
        "substr": (f"BIND(SUBSTR(?s, {sub_start}, {sub_len}) AS ?v)",
                   f"substr(source, {sub_start}, {sub_len}) AS v"),
        "contains": (f'BIND(IF(CONTAINS(?s, "{needle}"), "y", "n") AS ?v)',
                     f"CASE WHEN position('{needle}' IN source) > 0 "
                     "THEN 'y' ELSE 'n' END AS v"),
        "starts": (f'BIND(IF(STRSTARTS(?s, "{needle}"), "y", "n") AS ?v)',
                   f"CASE WHEN starts_with(source, '{needle}') "
                   "THEN 'y' ELSE 'n' END AS v"),
        "ends": (f'BIND(IF(STRENDS(?s, "{needle}"), "y", "n") AS ?v)',
                 f"CASE WHEN source LIKE '%{needle}' THEN 'y' ELSE 'n' "
                 "END AS v"),
        "concat": ('BIND(CONCAT(?s, "-", ?l) AS ?v)',
                   "source || '-' || lang AS v"),
        "replace": ('BIND(REPLACE(?s, "src", "S") AS ?v)',
                    "regexp_replace(source, 'src', 'S', 'g') AS v"),
    }
    bind, sqlv = cases[fam]
    q = f"""
    SELECT ?d ?v WHERE {{
      ?d <http://kg.ex/p/source> ?s .
      ?d <http://kg.ex/p/lang> ?l .
      {bind}
    }}
    """
    sql = (f"SELECT '<http://kg.ex/doc/' || CAST(doc_id AS VARCHAR) || '>' "
           f"AS d, {sqlv} FROM documents "
           "WHERE source IS NOT NULL AND lang IS NOT NULL")
    return q, sql, ["d", "v"]


@pytest.mark.parametrize("seed", range(16))
def test_sparql_string_builtin_matches_sql(ray_session, seed):
    from rdflib_r2r_ray import sparql
    from rdflib_r2r_ray.driver_api import _documents_triples

    q, sql, proj = _gen_strfn(seed)
    out = sparql.execute(_documents_triples(SF), q).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.execute(sql).df()
    assert _norm(out, proj) == _norm(want, proj), f"seed {seed}\n{q}\n{sql}"
