#!/usr/bin/env python
"""Driver-contract emulation (the verify recipe): a VANILLA SparkSession
(exactly what the driver builds — not our tuned ``session.get_spark``)
runs ``__spark_entry__.entry`` plus every ``queries()`` entry at sf0.01
and hash-compares against ``oracle_sql()`` via the harness replica.

Usage: python scripts/driver_emulation.py [name ...]   # default: all
Exit code 0 = every spec matches (rows+schema+values).
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(argv: list[str]) -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from oracle_harness import compare, duck_connection
    from axonops_schema_registry_spark.queries import SPEC_BY_NAME

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    n = E.entry(spark).count()
    print(f"entry(): {n} rows", flush=True)
    assert n >= 0

    names = argv or list(E.queries())
    osql = E.oracle_sql()
    con = duck_connection(SF_DIR)
    failed = []
    for i, name in enumerate(names):
        spec = SPEC_BY_NAME[name]
        t0 = time.time()
        try:
            if name in osql:
                compare(spark, con, spec, SF_DIR)
                status = "match"
            else:
                rows = spec.build(spark, SF_DIR).count()
                status = f"rows-only ({rows})"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {str(exc)[:300]}"
            failed.append(name)
        print(f"[{i + 1}/{len(names)}] {name}: {status} "
              f"({time.time() - t0:.1f}s)", flush=True)
    print(f"\n{len(names) - len(failed)}/{len(names)} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
