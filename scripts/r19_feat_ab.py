#!/usr/bin/env python
"""_hashed_ngram_counts A/B under the driver protocol: one cold JVM
per arm.  Usage: python scripts/r19_feat_ab.py {old|new} <spec> [...]
  old — the r18 inline form (split(text) evaluated 5x per row)
  new — the shipped split-once projection
"""

from __future__ import annotations

import glob
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE = "/root/testdata/sf0.001"


def main(argv: list[str]) -> None:
    variant, names = argv[0], argv[1:]
    assert variant in ("old", "new")

    from pyspark.sql import functions as F

    from axonops_schema_registry_spark.llm import sampling as S
    from axonops_schema_registry_spark.queries import SPEC_BY_NAME
    from axonops_schema_registry_spark.session import get_spark

    if variant == "old":
        def old_feats(docs, id_col, text_col, n_buckets):
            ws = f"split({text_col}, ' ')"
            feats_expr = (f"concat({ws}, zip_with("
                          f"slice({ws}, 1, size({ws}) - 1), "
                          f"slice({ws}, 2, size({ws}) - 1), "
                          f"(a, b) -> concat(a, ' ', b)))")
            return (docs.select(F.col(id_col).alias("id"),
                                F.explode(F.expr(feats_expr)).alias("f"))
                    .withColumn("b", S.portable_hash(F.col("f"))
                                % n_buckets)
                    .groupBy("id", "b")
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .localCheckpoint(eager=False))

        S._hashed_ngram_counts = old_feats

    spark = get_spark("feat-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for f in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        paths = ([f] if os.path.isfile(f) else
                 sorted(glob.glob(os.path.join(f, "*.parquet"))))
        for p in paths:
            with open(p, "rb") as fh:
                while fh.read(1 << 24):
                    pass
    for name in names:
        spec = SPEC_BY_NAME[name]
        spec.build(spark, SMOKE).collect()
        spark.catalog.clearCache()
        spec.build(spark, SF_DIR).collect()
        best, draws = float("inf"), []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.build(spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            draws.append(round(dt, 3))
            best = min(best, dt)
        print(f"RESULT {variant} {name} min={best:.3f} draws={draws}",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
