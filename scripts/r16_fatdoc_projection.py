#!/usr/bin/env python
"""100 TB projection rows for the r15/r16 operators (VERDICT r15 ask
#7): qf1/qf2/ccb1/mix5 shipped with 1x/4x/10x thin-doc rows but no
cluster-hours row in the projection appendix; this measures them — and
the r16 ccn1 capstone — on the FAT (~6 KB/doc) corpus of the r15
bytes-term appendix, so the projected walls carry the measured bytes
term directly (all five tokenize the text column, so the bytes term is
their dominant axis).

Same derivation as the r14 projection appendix and the r15 fat-doc
appendix: marginal docs/s = 45,000 / (t(10) − t(1)); projected wall =
2.5e10 docs / (docs/s × 8,000/32 cores).  Min-of-3 per point.  Unlike
r15_fatdoc_scale.py this REPLACES its own SCALING.md section in place
(the new_op_scale marker convention) instead of truncating the file
tail.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r15_fatdoc_scale import SEGMENTS  # noqa: E402

from axonops_schema_registry_spark.queries import SPEC_BY_NAME  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

FACTORS = (1, 4, 10)
RUNS = int(os.environ.get("SPARK_GRAFT_FATDOC_RUNS", "7"))


def fatten_keep_stopwords(col: str) -> str:
    """The r15 fattener with one fix this operator set needs: STOPWORDS
    stay unsalted.  The r15 form salts EVERY word ('the' -> 'the_f0'),
    which destroys the stopword profiles ccn1's language-ID gate keys
    on — measured: 4,554 of 5,000 sf0.1 docs pass the 'en' gate thin,
    0 pass fat — so the whole downstream pipeline ran empty and the
    first draw's ccn1 row (1.80 s at 1x vs 5.87 s THIN) measured only
    the gate.  Salting only content words keeps ~6 KB/doc, keeps
    cross-doc dup structure AND per-segment block distinctness (any
    10-word block contains salted content words), and keeps the
    language profiles intact."""
    from axonops_schema_registry_spark.llm.text import LANG_STOPWORDS

    sw = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    # escape quotes: French/Italian elision forms (l', d', ...) would
    # otherwise break the generated SQL literal list (ADVICE r16)
    lst = ", ".join("'{}'".format(w.replace("'", "''")) for w in sw)
    return (f"array_join(transform(sequence(0, {SEGMENTS - 1}), "
            f"j -> array_join(transform(split({col}, ' '), "
            f"w -> CASE WHEN w IN ({lst}) THEN w "
            f"ELSE concat(w, '_f', j) END), ' ')), ' ')")


def synthesize(spark, out_dir: str, k: int) -> None:
    """r15_fatdoc_scale.synthesize with the gate-preserving fattener."""
    import os as _os

    from pyspark.sql import functions as F

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(_os.path.join(sf, "documents.parquet")) \
        .withColumn("text", F.expr(fatten_keep_stopwords("text")))
    copies = []
    for i in range(k):
        d = docs.withColumn("doc_id",
                            F.col("doc_id") + F.lit(i * 10_000_000))
        if i > 0:
            d = d.withColumn(
                "text", F.expr(
                    f"array_join(transform(split(text, ' '), "
                    f"w -> concat(w, '_s{i}')), ' ')"))
        copies.append(d)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    (out.repartition(32).write.mode("overwrite")
     .parquet(_os.path.join(out_dir, "documents.parquet")))


MARKER = ("\n## r16 appendix: fat-document projection rows for the "
          "r15/r16 operators")
QUERIES = ("qf1_quality_filter", "qf2_quality_gated_mixture",
           "ccb1_perplexity_buckets", "mix5_token_budget_mixture",
           "ccn1_ccnet_pipeline")


def main() -> int:
    from pyspark.sql import functions as F

    spark = get_spark("r16-fatdoc")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="fatdoc16_")
    dirs = {}
    try:
        for k in FACTORS:
            d = os.path.join(tmp, f"x{k}")
            synthesize(spark, d, k)
            dirs[k] = d
        stats = spark.read.parquet(
            os.path.join(dirs[1], "documents.parquet")) \
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg(F.length("text")).alias("b")).collect()[0]
        print(f"fat corpus: {stats.n} docs, avg {stats.b:.0f} B/doc",
              flush=True)

        lines = [MARKER.strip(), "",
                 "Completes the projection table for the operators that "
                 "shipped after the r14 appendix (VERDICT r15 ask #7): "
                 "the same fat-corpus decomposition as the r15 appendix "
                 f"(~{stats.b / 1024:.1f} KB/doc), same derivation "
                 "(marginal docs/s = 45,000 / (t(10) − t(1)); projected "
                 "wall = 2.5e10 docs / (docs/s × 8,000/32 cores)), "
                 f"min-of-{RUNS} per point.  All five tokenize the text "
                 "column, so the bytes term measured here is their "
                 "dominant axis; the rank/limit gates inside qf2 and "
                 "ccn1 are corpus-size-invariant by construction and "
                 "contribute only to the fixed 1x term.  One deviation "
                 "from the r15 fattener, forced by a measured bug: the "
                 "salt SKIPS stopwords (fatten_keep_stopwords in the "
                 "script) because salting them zeroes the stopword "
                 "profiles ccn1's language gate keys on — the first "
                 "draw gated 0 of 5,000 fat docs as 'en' (4,554 pass "
                 "thin) and ccn1's pipeline ran EMPTY (1.80 s at 1x vs "
                 "5.87 s thin — a fat corpus measuring faster than a "
                 "thin one was the tell).  Also note these rows need "
                 "SPARK_GRAFT_DRIVER_MEM=48g: the qf feature frame at "
                 "10x fat OOMs the default 8 g local driver heap.", "",
                 "| query | 1x s | 4x s | 10x s | fat marginal docs/s "
                 "(32 cores) | projected wall @ 2.5e10 docs, 8,000 "
                 "cores |",
                 "|---|---|---|---|---|---|"]
        def drop_persisted() -> None:
            # the qf/ccn frames hold multi-GB lazy localCheckpoints
            # alive until the ContextCleaner gets to them; on the FAT
            # corpus accumulated blocks evict each other mid-run and
            # draws go non-monotone (measured: qf1 @4x 20s > @10x
            # 18s on a quiet host).  Unpersist deterministically and
            # BLOCKING between runs — gc.collect()+System.gc() races
            # the cleanup against the next job and measured WORSE.
            for rdd in list(spark.sparkContext._jsc
                            .getPersistentRDDs().values()):
                rdd.unpersist(True)

        aqe_noted = []
        for name in QUERIES:
            spec = SPEC_BY_NAME[name]
            spec.build(spark, "/root/testdata/sf0.001").collect()
            t = {}
            for k in FACTORS:
                drop_persisted()
                spec.build(spark, dirs[k]).collect()  # factor warm-up
                runs = []
                # min-of-RUNS (default 7, not bench's 3): the fat
                # explode allocates humongous G1 regions and the
                # per-run draw is bimodal (probed spread 5-32 s at 4x
                # on a QUIET host with identical plans); the floor is
                # stable within a few draws, the mean is not — the
                # bench.py min-estimator rationale, with more draws
                # because the noise here is wider
                for _ in range(RUNS):
                    spark.catalog.clearCache()
                    drop_persisted()
                    t0 = time.perf_counter()
                    spec.build(spark, dirs[k]).collect()
                    runs.append(time.perf_counter() - t0)
                t[k] = min(runs)
                print(f"{name} @ {k}x: {t[k]:.2f}s "
                      f"(spread {min(runs):.2f}-{max(runs):.2f})",
                      flush=True)
            marg, span, leg = t[10] - t[1], 45_000, ""
            if t[1] > t[4]:
                # small-input artifact: the 1x point sits ABOVE 4x
                # with tight spreads (ccn1 measured 13.6 s at 1x vs
                # 8.3 s at 4x; probed: disabling AQE partition
                # coalescing recovers ~4 s of it — the tiny input
                # coalesces below the core count — the rest is fixed
                # small-size plan cost).  The volume term that
                # projects is the monotone 4x->10x leg.
                marg, span, leg = t[10] - t[4], 30_000, " (4x-10x leg)"
            if marg <= 0:
                rate, wall = "scan-bound (t(10) <= t(1))", "< 0.1 h"
            else:
                dps = span / marg
                rate = f"{dps:,.0f}{leg}"
                wall = f"{2.5e10 / (dps * 8000 / 32) / 3600:.1f} h"
            lines.append(f"| {name} | {t[1]:.2f} | {t[4]:.2f} "
                         f"| {t[10]:.2f} | {rate} | {wall} |")
            if leg:
                aqe_noted.append(name)
        if aqe_noted:
            lines += ["", "Note (VERDICT r16 stretch #9): "
                      + ", ".join(aqe_noted) + " read a 1x point "
                      "ABOVE 4x — the AQE small-input artifact "
                      "(adaptive partition coalescing folds the tiny "
                      "1x input below the 32-core task count; probed "
                      "~4 s of ccn1's gap in r16, the rest is fixed "
                      "small-size plan cost).  The projection uses "
                      "the monotone 4x-10x leg for these rows; at "
                      "cluster scale inputs never sit below the core "
                      "count, so the artifact does not project."]
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "SCALING.md")
        content = open(path).read()
        if MARKER in content:
            head, _, rest = content.partition(MARKER)
            nxt = rest.find("\n## ")
            content = head + (rest[nxt:] if nxt >= 0 else "")
        with open(path, "w") as fh:
            fh.write(content.rstrip("\n") + "\n\n"
                     + "\n".join(lines) + "\n")
        print("appended to docs/SCALING.md", flush=True)
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
