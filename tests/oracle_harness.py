"""Local replica of the driver's DuckDB-oracle hash compare.

Runs a spec's Spark DataFrame and its DuckDB oracle on the same parquet
tables and asserts the collected row multisets are EXACTLY equal (columns
sorted by name, order-insensitive, bit-exact values).  If a query passes
here it should hash-match in the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("ts", v.isoformat())
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if v is None:
        return ("null",)
    if isinstance(v, list):
        return ("list", tuple(_norm(x) for x in v))
    return (type(v).__name__, str(v))


def _row_key(row):
    return tuple(str(x) for x in row)


def spark_result(spark, spec, sf_dir: str):
    df = spec.build(spark, sf_dir)
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=_row_key)


def oracle_result(con, spec):
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(_norm(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(cols), sorted(rows, key=_row_key)


def compare(spark, con, spec, sf_dir: str) -> None:
    scols, srows = spark_result(spark, spec, sf_dir)
    ocols, orows = oracle_result(con, spec)
    assert scols == ocols, f"{spec.name}: columns {scols} != {ocols}"
    assert len(srows) == len(orows), (
        f"{spec.name}: row count {len(srows)} != {len(orows)}")
    for i, (s, o) in enumerate(zip(srows, orows)):
        assert s == o, (
            f"{spec.name}: first mismatch at sorted row {i}:\n"
            f"  spark : {s}\n  oracle: {o}\n  cols  : {scols}")
