#!/usr/bin/env python
"""Window-rotation dry-run tooling (VERDICT r13 stretch ask #8).

Prints the upcoming driver window (``ALL_SPECS[:50]``) as:
  * a family histogram over the WINDOW_FAMILIES invariant set (plus
    every other tag present), with an explicit OK/MISSING verdict per
    required family, and
  * a per-spec freshness table — the newest round each windowed spec
    was driver-green (recomputed from the committed
    ``CORRECTNESS_r*.json`` history), so a stale-rotation mistake is
    one glance instead of an after-the-fact test failure.

Read-only: imports the registry (which itself asserts the family
invariant at import since r14) and the repo-root correctness files.
Exit 0 if every required family is sampled, 1 otherwise (redundant
with the import-time assertion, kept for clarity when the assertion
is bypassed during development).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from axonops_schema_registry_spark.queries import (  # noqa: E402
    ALL_SPECS,
    WINDOW_FAMILIES,
)


def last_green_rounds() -> dict[str, int]:
    """spec name -> newest round whose driver window recorded it green."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            results = json.load(fh)
        for name, res in results.items():
            ok = res.get("err") is None and res.get("rows_match") and (
                res.get("hash_match") or res.get("hash_match") is None)
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def main() -> int:
    window = ALL_SPECS[:50]
    green = last_green_rounds()

    tags = Counter(t for s in window for t in s.tags)
    print(f"upcoming driver window: {len(window)} specs")
    print("\nrequired families (WINDOW_FAMILIES):")
    missing = []
    for fam in WINDOW_FAMILIES:
        n = tags.get(fam, 0)
        status = "OK " if n else "MISSING"
        if not n:
            missing.append(fam)
        print(f"  {status:8s} {fam:12s} {n:3d} specs")
    other = {t: n for t, n in sorted(tags.items()) if t not in WINDOW_FAMILIES}
    print(f"\nother tags sampled: {other}")

    print("\nper-spec freshness (last driver-green round; NEW = never):")
    ages = Counter()
    for i, s in enumerate(window):
        g = green.get(s.name)
        label = f"r{g:02d}" if g else "NEW"
        ages[label] += 1
        print(f"  {i:2d}. {label:4s} {s.name}")
    print(f"\nfreshness histogram: {dict(sorted(ages.items()))}")
    stale = [lbl for lbl in ages if lbl != "NEW"]
    if stale:
        print(f"post-round freshness floor rises to: min over deferred "
              f"(window covers {min(stale)}..{max(stale)})")
    if missing:
        print(f"\nFAIL: families missing from window: {missing}")
        return 1
    print("\nOK: every required family is sampled")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
