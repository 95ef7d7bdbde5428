"""Local stand-in for the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same sf dir
and compares row count, sorted column names, and the order-insensitive
multiset of stringified rows — stricter than a hash (it shows diffs).

Fetch paths mirror the DRIVER exactly (round-2 lesson: the driver found
3 reds our old ``cursor.fetchall()`` sweep missed, because fetchall
returns DuckDB HUGEINT as Python int while the driver's pandas ``.df()``
path downcasts HUGEINT to float64 — ``1000.0`` vs ``1000`` in the value
hash). So: Spark results go through ``toPandas()``, oracle results
through ``duckdb .df()``, and values are stringified per-cell WITHOUT
cross-dtype normalization — an int and an equal float deliberately
compare unequal, exactly like the driver's hash.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd

from bigdataamazon_spark.catalog import TABLES, table_path


def _norm_value(v):
    # pandas nulls (None, NaN, NaT) — NaN stays distinguishable from
    # None via the float branch below only for genuine float NaN cells;
    # pd.isna treats all three as missing, which matches the driver's
    # frame-level stringification of missing cells.
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        # repr of the double — dtype-preserving: 1000.0 != "1000"
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat(sep=" ")
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def _frame_rows(df: pd.DataFrame, col_order: list[int]) -> list[tuple[str, ...]]:
    cells = df.to_numpy(dtype=object)
    return sorted(
        tuple(_norm_value(row[i]) for i in col_order) for row in cells
    )


def _normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = list(df.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], _frame_rows(df, order)


def run_duckdb(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    # the driver's fetch path: .df(), NOT fetchall — HUGEINT → float64
    return con.execute(sql).df()


def compare(spark, name: str, sf_dir: str, *, max_diff: int = 5) -> list[str]:
    """Return list of mismatch descriptions (empty == parity)."""
    from bigdataamazon_spark import queries as registry

    qfn = registry.queries()[name]
    oracle = registry.oracle_sql().get(name)
    sdf = qfn(spark, sf_dir)
    s_pdf = sdf.toPandas()

    problems: list[str] = []
    if oracle is None:
        if len(s_pdf) == 0:
            problems.append(f"{name}: rows-only check, got 0 rows")
        return problems

    d_pdf = run_duckdb(oracle, sf_dir)
    sc, sr = _normalize(s_pdf)
    dc, dr = _normalize(d_pdf)
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
