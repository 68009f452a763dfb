#!/usr/bin/env python
"""Per-stage breakdown of one spec run (r18 measurement aid):
runs the spec once warm, then prints every completed stage of that
run window sorted by executorRunTime, with names, task counts and
shuffle bytes.  Usage: python scripts/r18_stages.py <spec> [...]"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from axonops_schema_registry_spark import queries as q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4051"))


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main(argv: list[str]) -> int:
    from scripts.r18_profile import _get_spark  # reuse builder

    os.environ["SPARK_GRAFT_UI_PORT"] = str(UI_PORT)
    import scripts.r18_profile as prof
    prof.UI_PORT = UI_PORT
    spark = _get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    app = _rest("applications")[0]["id"]
    for name in argv:
        spec = q.SPEC_BY_NAME[name]
        spec.build(spark, SF_DIR).collect()   # warm
        spark.catalog.clearCache()
        t0 = time.time()
        spec.build(spark, SF_DIR).collect()
        t1 = time.time()
        sts = []
        for st in _rest(f"applications/{app}/stages?status=complete"):
            sub = (st.get("firstTaskLaunchedTime")
                   or st.get("submissionTime"))
            if not sub:
                continue
            ts = time.mktime(time.strptime(sub[:19],
                                           "%Y-%m-%dT%H:%M:%S"))
            if t0 - 1 <= ts <= t1 + 1:
                sts.append(st)
        sts.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name}: wall {t1 - t0:.2f}s, {len(sts)} stages ===")
        for st in sts[:14]:
            nm = st.get("name", "")[:90]
            print(f"  run {st.get('executorRunTime', 0) / 1000:7.2f}s"
                  f" tasks {st.get('numCompleteTasks', 0):3d}"
                  f" shR {st.get('shuffleReadBytes', 0) / 1e6:7.2f}MB"
                  f" shW {st.get('shuffleWriteBytes', 0) / 1e6:7.2f}MB"
                  f" in {st.get('inputBytes', 0) / 1e6:6.1f}MB  {nm}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
