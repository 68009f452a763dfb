"""Local replica of the driver's DuckDB-oracle hash compare.

Runs a spec's Spark DataFrame and its DuckDB oracle on the same parquet
tables and asserts the row multisets are EXACTLY equal (columns sorted by
name, order-insensitive, bit-exact values).  If a query passes here it
should hash-match in the driver's CORRECTNESS gate.

CRITICAL FIDELITY NOTE (round-3 fix): the driver canonicalizes BOTH sides
through pandas (`toPandas()` / `fetchdf()`), so this harness must too.
Rounds 1-2 fetched the oracle via ``fetchall`` (lossless Python ints),
which silently blessed oracles whose uncast ``SUM(...)`` DuckDB returns as
HUGEINT: pandas coerces HUGEINT to float64 while Spark's bigint stays
int64, so the driver hash-failed four specs the local harness passed.
Going through pandas on both sides makes local green predict driver green.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    """Normalize one pandas-sourced cell to a comparable tagged tuple.

    Both sides arrive through pandas, so dtype coercions (HUGEINT→float64,
    nullable int→float64, timestamp→Timestamp) have already happened
    identically to the driver; here we only canonicalize the Python-level
    representation."""
    if v is None or v is pd.NaT:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("float", "nan")
        return ("float", repr(f))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.isoformat())
    if type(v) is datetime.date:
        # A bare DATE would normalize asymmetrically under the DRIVER's
        # canonicalization (Spark toPandas → datetime.date '1996-01-01'
        # vs DuckDB fetchdf → midnight Timestamp '1996-01-01T00:00:00'),
        # i.e. a guaranteed hash-fail at the gate even when values agree.
        # Fail loudly here instead of silently papering over it: specs
        # must CAST date columns to TIMESTAMP (or VARCHAR) on BOTH sides.
        raise AssertionError(
            "spec emitted a DATE-typed column; cast it to TIMESTAMP or "
            "VARCHAR on both the Spark and oracle side (driver "
            "canonicalization is asymmetric for DATE)")
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, np.ndarray):
        return ("list", tuple(_norm(x) for x in v.tolist()))
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_norm(x) for x in v))
    return (type(v).__name__, str(v))


def _row_key(row):
    return tuple(str(x) for x in row)


def _frame_result(df: pd.DataFrame):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm(v) for v in rec) for rec in df.itertuples(index=False)]
    return cols, sorted(rows, key=_row_key)


def spark_result(spark, spec, sf_dir: str):
    return _frame_result(spec.build(spark, sf_dir).toPandas())


def oracle_result(con, spec):
    return _frame_result(con.execute(spec.oracle).fetchdf())


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
