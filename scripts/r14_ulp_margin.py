#!/usr/bin/env python
"""VERDICT r13 ask #6, sf1 half: sweep the FULL 10x-replica bigram
score population for the minimum distance of -ln(p)·1e6 to an integer
boundary (the fixture-corpus property test is
tests/test_properties.py::test_bigram_surprisal_micro_unit_margin —
see its docstring for why this margin is the safety condition of
ppl2's floor(·1e6) quantization).

The 10x replicas are NOT redundant with sf0.1: each word-salted copy
shifts doc_id by i·10,000,000 (≢ 0 mod 7), so every copy draws a
DIFFERENT id%7 reference slice and contributes genuinely new count
ratios.  Counting runs in pure Python over the synthesized parquet —
the margin being measured is a property of the IEEE doubles
themselves, and at the asserted floor (>1e-6 micro-units ≈ 500+ ulps)
the 1-ulp difference between Python's, Java's, and DuckDB's log is
noise against it.

Appends one line to docs/SCALING.md (idempotent marker splice).
Exit 0 iff the sf1 margin clears the same 1e-6 floor the pytest pins.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MARKER = "\n## r14 appendix: bigram-surprisal micro-unit margin at sf1"


def corpus_margin(rows) -> tuple[float, int]:
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for doc_id, text in rows:
        if doc_id % 7 == 0:
            continue
        toks = [t for t in text.lower().split() if t]
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for u, w in zip(toks, toks[1:]):
            big[(u, w)] = big.get((u, w), 0) + 1
    n = sum(uni.values())
    vals = [-math.log(cb / uni[u]) for (u, _w), cb in big.items()
            if cb != uni[u]]                        # exact 0 exempt
    vals += [-math.log(0.4 * cu / n) for cu in set(uni.values())]
    vals += [-math.log(cu / n) for cu in set(uni.values())]
    vals += [-math.log(0.4 / n), -math.log(1.0 / n)]
    margin = min(min(x - math.floor(x), math.ceil(x) - x)
                 for v in vals for x in (v * 1e6,))
    return margin, len(vals)


def main() -> int:
    import duckdb

    from sf1_rehearsal import synthesize

    from axonops_schema_registry_spark.session import get_spark

    spark = get_spark("ulp-margin")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ulp_margin_")
    try:
        big_dir = os.path.join(tmp, "sf1")
        os.makedirs(big_dir, exist_ok=True)
        synthesize(spark, big_dir)
        rows = duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet("
            f"'{big_dir}/documents.parquet/*.parquet')").fetchall()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    margin, n_vals = corpus_margin(rows)
    ok = margin > 1e-6
    ulps = margin / (1e7 * 2.0 ** -52)  # ulp at score·1e6 ~ 1e7
    print(f"sf1 micro-unit margin: {margin:.3e} over {n_vals} distinct "
          f"score values ({len(rows)} docs) — ~{ulps:,.0f} ulps at "
          f"magnitude 1e7; floor 1e-6: {'OK' if ok else 'FAIL'}")

    lines = [
        "",
        MARKER.strip(),
        "",
        "The safety condition of ppl2's tie-free floor(-ln(p)·1e6) "
        "quantization, quantified (VERDICT r13 ask #6): the minimum "
        "distance of any score value to an integer micro-unit "
        "boundary, swept over the ENTIRE distinct score population "
        "(seen-bigram, backoff-unigram, first-token, OOV floors; "
        "exact -ln(1)=0 exempt) of the full 10x replica corpus — "
        "each word-salted copy draws a different id%7 reference "
        "slice, so all ten contribute distinct ratios.  Fixture-"
        "corpus margins are pinned by "
        "test_bigram_surprisal_micro_unit_margin (sf0.001 3.0e-3, "
        "sf0.01 2.7e-4, sf0.1 9.5e-4).",
        "",
        "| corpus | distinct score values | min margin (micro-units) "
        "| ~ulps at 1e7 | floor |",
        "|---|---|---|---|---|",
        f"| sf1 (10x, {len(rows):,} docs) | {n_vals:,} | {margin:.3e} "
        f"| {ulps:,.0f} | 1e-6 {'OK' if ok else 'FAIL'} |",
        "",
        "A 1-ulp cross-engine `log` discrepancy moves a score by "
        "~1 ulp; the observed margin keeps every floor() on the same "
        "side by orders of magnitude, so ppl2's oracle equality is "
        "safe at this scale — and the sweep is the per-round tool to "
        "re-check when the corpus changes.",
    ]
    path = os.path.join(ROOT, "docs", "SCALING.md")
    with open(path) as fh:
        content = fh.read()
    if MARKER in content:
        head, _, rest = content.partition(MARKER)
        nxt = rest.find("\n## ")
        content = head + (rest[nxt:] if nxt >= 0 else "")
    with open(path, "w") as fh:
        fh.write(content.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print("appended to docs/SCALING.md")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
