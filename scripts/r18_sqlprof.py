#!/usr/bin/env python
"""Operator-level profile of one spec (r18 measurement aid): runs the
spec warm, then dumps the SQL plan-graph node metrics from the UI
REST API — codegen span durations, rows, shuffle bytes per operator.

Usage: python scripts/r18_sqlprof.py <spec> [...]"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from axonops_schema_registry_spark import queries as q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4052"))


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def _dur_ms(v: str) -> float:
    """Parse spark metric strings like 'total (min, med, max)\n5.2 s
    (..., ..., ...)' or '123' or '4.5 ms'."""
    head = v.strip().split("\n")[-1].split("(")[0].strip()
    m = re.match(r"([0-9.]+)\s*(ms|s|m|h)?", head)
    if not m:
        return 0.0
    x = float(m.group(1))
    mult = {"ms": 1, "s": 1000, "m": 60000, "h": 3600000,
            None: 0}.get(m.group(2), 0)
    return x * mult


def main(argv: list[str]) -> int:
    import scripts.r18_profile as prof
    prof.UI_PORT = UI_PORT
    spark = prof._get_spark()  # noqa: SLF001
    spark.sparkContext.setLogLevel("ERROR")
    app = _rest("applications")[0]["id"]
    for name in argv:
        spec = q.SPEC_BY_NAME[name]
        spec.build(spark, SF_DIR).collect()   # warm
        spark.catalog.clearCache()
        before = {e["id"] for e in _rest(f"applications/{app}/sql")}
        spec.build(spark, SF_DIR).collect()
        execs = [e for e in _rest(
            f"applications/{app}/sql?details=true&planDescription=false"
            f"&length=200")
            if e["id"] not in before]
        print(f"\n=== {name}: {len(execs)} executions ===")
        for e in execs:
            nodes = []
            for nd in e.get("nodes", []):
                mets = {m["name"]: m["value"]
                        for m in nd.get("metrics", [])}
                dur = 0.0
                for k, v in mets.items():
                    if "time total" in k or k.startswith("duration") \
                            or k == "time to build hash map total":
                        dur = max(dur, _dur_ms(v))
                rows = mets.get("number of output rows", "")
                rows = rows.split("\n")[-1]
                nodes.append((dur, nd.get("nodeName", ""), rows))
            nodes.sort(key=lambda t: -t[0])
            tot = e.get("duration", 0)
            print(f"-- exec {e['id']} wall {tot} ms --")
            for dur, nm, rows in nodes[:12]:
                if dur < 50:
                    continue
                print(f"   {dur / 1000:7.2f}s  rows={rows:>12s}  {nm[:70]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
