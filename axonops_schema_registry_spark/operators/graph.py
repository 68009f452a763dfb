"""Graph operators: transitive reachability closure to fixpoint.

Re-expresses the reference's recursive dependency walks —
``GetDependencyGraph`` (/root/reference/internal/api/handlers/
analysis.go:758-797) and deep reference resolution
(/root/reference/internal/registry/registry.go:1546-1592, one level per
call) — as iterate-until-empty-frontier over an edge DataFrame, the same
driver-loop shape as ``llm.dedup.connected_components``.

Scale: each iteration is one equi-join keyed on the frontier's dst
column; work per round is proportional to the NEW pairs discovered, not
the full closure (semi-naive evaluation).  Iterations = DAG depth —
schema-reference graphs are shallow (2-5 levels).  The seen-set
anti-join is simultaneously the cycle guard: a cyclic edge set
terminates because a revisited (src, dst) pair is never re-added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from axonops_schema_registry_spark.operators.core import release_checkpoint


def dependency_closure(edges: DataFrame, src: str = "subject",
                       dst: str = "ref_subject",
                       max_iter: int = 20) -> DataFrame:
    """Transitive closure of ``edges`` with a ``depth`` column.

    Returns (src, dst, depth) where depth is the SHORTEST hop count from
    src to dst (1 = direct edge).  Cycle-safe: pairs already seen are
    anti-joined away each round, so the frontier empties even on cyclic
    inputs and a node reachable by multiple paths keeps its minimum
    depth.
    """
    plain = edges.select(F.col(src).alias("__src"),
                         F.col(dst).alias("__dst")).distinct().cache()
    seed = plain.withColumn("depth", F.lit(1)).cache()
    closure = seed
    frontier = closure
    for depth in range(2, max_iter + 1):
        hop = plain.select(F.col("__src").alias("__via"),
                           F.col("__dst").alias("__next"))
        nxt = (frontier.join(hop, frontier["__dst"] == hop["__via"])
               .select("__src", F.col("__next").alias("__dst"))
               .distinct()
               .join(closure.select("__src", "__dst"),
                     ["__src", "__dst"], "left_anti")
               .withColumn("depth", F.lit(depth)))
        # localCheckpoint cuts the per-iteration lineage growth the same
        # way connected_components' cache() chain does, but also breaks
        # the self-referencing plan before the union below
        nxt = nxt.localCheckpoint(eager=True)
        if not nxt.take(1):
            release_checkpoint(nxt)
            break
        new_closure = closure.unionByName(nxt).localCheckpoint(eager=True)
        # cache-lifetime: the union's eager checkpoint holds its own
        # copy of every row, so the superseded closure generation and
        # the consumed frontier are dead blocks — release each eagerly
        # (at 100 TB leaving max_iter generations resident would evict
        # useful blocks)
        if closure is not seed:
            release_checkpoint(closure)
        if frontier is not seed:
            release_checkpoint(frontier)
        closure = new_closure
        frontier = nxt
    if closure is seed:
        # no 2-hop paths (flat reference graphs — common): checkpoint
        # the seed so the result keeps its materialized backing, then
        # the caches can still be released rather than leak
        closure = seed.localCheckpoint(eager=True)
    elif frontier is not seed and frontier is not closure:
        release_checkpoint(frontier)
    # the checkpoint backs the result in every path; the edge and seed
    # caches are no longer reachable
    plain.unpersist()
    seed.unpersist()
    return closure.select(F.col("__src").alias(src),
                          F.col("__dst").alias(dst), "depth")
