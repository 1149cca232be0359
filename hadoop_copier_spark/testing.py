"""Differential-oracle harness (SURVEY §5.2 item 2).

Runs a declared query on Spark and its oracle SQL on DuckDB over the same
parquet fixtures, serializes both result sets with the DRIVER's rules
(SURVEY §2b rule 5: sorted column names, rows joined ``col1|col2|…``,
NULL -> ``\\N``, SHA-256 over the sorted row set) and compares. Unlike the
round-1 harness this is **scale-preserving** for decimals: ``1.20`` and
``1.2`` serialize differently, exactly as the driver hashes them — so local
green implies driver green only if values AND decimal scales agree.

The local DuckDB version is recorded on connect (the round-1 hash failures
were a DuckDB-version divergence in double->decimal casting; queries now
avoid that cast entirely, see queries/base.py).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from decimal import Decimal

import duckdb

from .tables import TABLES

DUCKDB_VERSION = duckdb.__version__


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_value(v):
    """Driver-rule serialization of one cell.

    Decimals keep their scale (``str`` of a scale-2 Decimal prints two
    fractional digits); floats serialize by ``repr`` so equality means
    bit-identical doubles — both engines hand the driver Python objects, so
    identical bits <=> identical serialization regardless of engine version.
    """
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return str(v)  # scale-preserving: Decimal('1.20') -> '1.20'
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_value(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def normalize(columns: list[str], rows) -> tuple[list[str], list[tuple]]:
    """Sort columns by name, serialize values, sort rows — order-insensitive."""
    cols_lower = [c.lower() for c in columns]
    order = sorted(range(len(columns)), key=lambda i: cols_lower[i])
    out = [tuple(_norm_value(row[i]) for i in order) for row in rows]
    out.sort()
    return [cols_lower[i] for i in order], out


def result_hash(columns: list[str], rows) -> str:
    """SHA-256 over the normalized row set — the driver's value hash."""
    _, nrows = normalize(columns, rows)
    h = hashlib.sha256()
    for row in nrows:
        h.update("|".join(row).encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def run_spark(query_fn, spark, sf_dir):
    df = query_fn(spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def run_oracle(sql: str, sf_dir: str, con=None):
    own = con is None
    con = con or duck_connect(sf_dir)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        if own:
            con.close()


def compare(query_fn, oracle: str, spark, sf_dir: str, con=None) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    s_cols, s_rows = run_spark(query_fn, spark, sf_dir)
    o_cols, o_rows = run_oracle(oracle, sf_dir, con=con)
    ns_cols, ns_rows = normalize(s_cols, s_rows)
    no_cols, no_rows = normalize(o_cols, o_rows)
    problems = []
    if ns_cols != no_cols:
        problems.append(f"columns differ: spark={ns_cols} oracle={no_cols}")
        return problems
    if len(ns_rows) != len(no_rows):
        problems.append(f"row count differs: spark={len(ns_rows)} oracle={len(no_rows)}")
    for i, (a, b) in enumerate(zip(ns_rows, no_rows)):
        if a != b:
            problems.append(
                f"first differing row #{i} (cols {ns_cols}):\n  spark : {a}\n  oracle: {b}"
            )
            break
    if not problems and result_hash(s_cols, s_rows) != result_hash(o_cols, o_rows):
        problems.append("row-level equal but hash differs (serialization bug)")
    return problems
