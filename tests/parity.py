"""Local stand-in for the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same sf dir
and compares row count, sorted column names, and the order-insensitive
multiset of stringified rows — stricter than a hash (it shows diffs).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

from bigdataamazon_spark.catalog import TABLES, table_path


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of the double; both engines hand back python floats
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(_norm_value(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def run_duckdb(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(spark, name: str, sf_dir: str, *, max_diff: int = 5) -> list[str]:
    """Return list of mismatch descriptions (empty == parity)."""
    from bigdataamazon_spark import queries as registry

    qfn = registry.queries()[name]
    oracle = registry.oracle_sql().get(name)
    sdf = qfn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns

    problems: list[str] = []
    if oracle is None:
        if len(s_rows) == 0:
            problems.append(f"{name}: rows-only check, got 0 rows")
        return problems

    d_cols, d_rows = run_duckdb(oracle, sf_dir)
    sc, sr = _normalize(list(s_cols), s_rows)
    dc, dr = _normalize(d_cols, d_rows)
    if sc != dc:
        problems.append(f"{name}: columns differ spark={sc} duck={dc}")
        return problems
    if len(sr) != len(dr):
        problems.append(f"{name}: row count spark={len(sr)} duck={len(dr)}")
    if sr != dr:
        dset, sset = set(dr), set(sr)
        only_s = [r for r in sr if r not in dset][:max_diff]
        only_d = [r for r in dr if r not in sset][:max_diff]
        problems.append(
            f"{name}: value mismatch; spark-only sample={only_s} duck-only sample={only_d}"
        )
    return problems
