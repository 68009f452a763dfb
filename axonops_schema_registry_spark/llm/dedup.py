"""Document deduplication operators: exact, MinHash-LSH, SimHash.

All three share the same scale shape: a cheap per-document signature, a
bucketed equi-join to generate candidate pairs (never an n² cross
product), and an exact verification pass restricted to candidates.

MinHash-LSH banding math (n_hashes=64, bands=16 → r=4 rows/band):
P(candidate | jaccard j) = 1 - (1 - j^4)^16, which is ≈ 0.9998 at j=0.8
and ≈ 1-1e-15 at j=0.9 — so after exact verification the result equals the
exact all-pairs answer with overwhelming probability, at a fraction of the
cost.  SimHash blocks on 4 × 16-bit chunks: hamming distance ≤ 3 over 63
bits guarantees (pigeonhole) at least one identical chunk, so the chunk
equi-join loses no true pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from axonops_schema_registry_spark.operators.core import (
    plan_cache,
    release_checkpoint,
)
from axonops_schema_registry_spark.operators.text import (
    token_arrays,
    token_set,
)


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact dedup by content fingerprint: first occurrence wins.

    Returns (fingerprint, canonical_id, n_copies) — the hash-groupBy form;
    map-side partial aggregation keeps the shuffle at fingerprint
    cardinality, not row count.
    """
    return (df.withColumn("fingerprint", F.sha2(F.col(content_col), 256))
              .groupBy("fingerprint")
              .agg(F.min(id_col).alias("canonical_id"),
                   F.count(F.lit(1)).alias("n_copies")))


def minhash_signatures(arrs: DataFrame, n_hashes: int = 64) -> DataFrame:
    """(id, sig: array<bigint>) MinHash signature via seeded xxhash64,
    over a row-local (id, toks) token-ARRAY frame
    (:func:`operators.text.token_arrays`).

    Fully row-local formulation (r19): hash each token string ONCE
    (xxhash64), then compute every seeded minimum inside one
    higher-order transform — min_s over tokens of xxhash64(h0, s) —
    as a plain PROJECTION over the document's own token array.
    Value-identical to the r18 collect_list form (same hash calls, min
    is order-insensitive) and to the original explode-seeds plan, but
    there is now NO aggregate at all: the r18 shape re-collected the
    exploded tokens into an ObjectHashAggregate buffer, so one
    pathological multi-million-token document became an unbounded
    single-group aggregation-state spike (§5) — here the token array
    streams through as row data, no bigger than the document row
    itself, and per-seed evaluation touches one transient array at a
    time.  A 64-column min-aggregate plan would also avoid the explode
    but costs seconds of whole-stage codegen compilation; the HOF plan
    is one compact expression.
    """
    return arrs.select("id", F.expr(
        f"transform(sequence(0, {n_hashes - 1}), s -> "
        f"array_min(transform(toks, t -> xxhash64(xxhash64(t), s))))")
        .alias("sig"))


def minhash_band_buckets(arrs: DataFrame, n_hashes: int = 64,
                         bands: int = 16) -> DataFrame:
    """(id, band, key) LSH bucket memberships from a token-ARRAY frame
    (:func:`operators.text.token_arrays`) — the shared banding step of
    the one-shot pair generator and the persistent bucket store, fully
    row-local up to the bucket explode (16 rows/doc)."""
    rows = n_hashes // bands
    sigs = minhash_signatures(arrs, n_hashes)
    band_keys = F.expr(
        f"transform(sequence(0, {bands - 1}), b -> struct("
        f"b AS band, "
        f"xxhash64(array_join(transform(slice(sig, b * {rows} + 1, {rows}), "
        f"x -> cast(x AS string)), ',')) AS key))")
    return (sigs.select("id", F.explode(band_keys).alias("bk"))
                .select("id", F.col("bk.band").alias("band"),
                        F.col("bk.key").alias("key")))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.8, ngram: int = 3,
                      n_hashes: int = 64, bands: int = 16,
                      b_ids: DataFrame | None = None,
                      cache_tokens: bool = True,
                      max_bucket: int | None = None) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact Jaccard verify.

    Output is :func:`verify_jaccard`'s 6-column schema
    (id_a, id_b, n_inter, size_a, size_b, jaccard) — the pair set is
    identical to the exact all-pairs operator
    (operators.text.jaccard_pairs) whenever banding recall holds, but
    with candidate generation linear in corpus size.

    ``b_ids`` (single ``id`` column) restricts the RIGHT side of the
    bucket join: only pairs whose ``id_b`` is in it are emitted — the
    asymmetric incremental shape (new micro-batch vs whole corpus) where
    candidate volume is bounded by the NEW side's bucket collisions, not
    the full corpus's.

    ``cache_tokens`` caches the row-local token-ARRAY frame (it feeds
    the signature projection AND the exact-verify explode) plus the
    bucket frame both join sides read.  Entries are registered for
    facade-level release (``operators.core.release_plan_caches``);
    long-running streaming sinks pass ``False`` and re-derive tokens
    from their checkpointed corpus instead.

    ``max_bucket`` is the HOT-BUCKET guard: cap the LEFT (``id_a``)
    side of each ``(band, key)`` bucket at its ``max_bucket`` SMALLEST
    ids (rank window, shuffled on the same key the join already uses),
    bounding candidate volume at ``max_bucket`` pairs per (target doc,
    band) instead of O(bucket²) on a boilerplate-heavy corpus where one
    bucket swallows a large fraction of the corpus.  Recall tradeoff,
    documented: a true pair is missed only when NONE of the target's
    shared buckets ranks a matching earlier doc inside the cap — with
    16 bands a real near-pair collides in many bands, and first-wins
    consumers keep the smallest ids, which are exactly the ranks the
    cap preserves.  ``None`` (default) keeps the exact candidate set —
    the dd2 oracle's contract; flag-path consumers that collapse exact
    duplicates first (``incremental_dedup_flags``) are the intended
    cap users, since post-collapse bucket mass is near-identical-but-
    distinct content only.
    """
    arrs = token_arrays(df, id_col, text_col, ngram)
    if cache_tokens:
        # cache the ARRAY frame (one row/doc — same bytes as the
        # exploded frame in far fewer rows): it feeds the banding AND
        # the exact-verify explode below.  Exploding the CACHED frame
        # keeps the generator a plain column reference (codegen);
        # uncached callers explode via token_set instead, whose
        # ungated transform stays codegen-friendly (see token_set).
        arrs = plan_cache(arrs)
        toks = arrs.select("id", F.explode("toks").alias("token"))
    else:
        toks = token_set(df, id_col, text_col, ngram)
    bucketed = minhash_band_buckets(arrs, n_hashes, bands)
    if cache_tokens:
        # both join sides (and the max_bucket window) read the bucket
        # frame — without this the whole signature chain is computed
        # once PER SIDE (the r18 plan audit found the subtree twice).
        # Same lifetime contract as the toks cache above.
        bucketed = plan_cache(bucketed)
    b_side = bucketed if b_ids is None else bucketed.join(
        F.broadcast(b_ids.select(F.col(b_ids.columns[0]).alias("id"))),
        "id")
    a_side = bucketed
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "key").orderBy("id")
        a_side = (bucketed.withColumn("__rk", F.row_number().over(w))
                  .filter(F.col("__rk") <= max_bucket).drop("__rk"))
    a = a_side.select(F.col("id").alias("id_a"), "band", "key")
    b = b_side.select(F.col("id").alias("id_b"), "band", "key")
    candidates = (a.join(b, ["band", "key"])
                   .filter(F.col("id_a") < F.col("id_b"))
                   .select("id_a", "id_b").distinct())
    return verify_jaccard(toks, candidates, threshold)


def verify_jaccard(toks: DataFrame, candidates: DataFrame,
                   threshold: float) -> DataFrame:
    """Exact Jaccard verification of candidate pairs against a
    (id, token) frame — the shared verify half of every LSH path
    (one-shot pairs, incremental flags, the persistent bucket store):
    |A∩B| from a token equi-join restricted to candidates,
    |A∪B| = |A|+|B|-|∩|, BIGINT/BIGINT double division.

    Returns (id_a, id_b, n_inter, size_a, size_b, jaccard) for pairs
    at-or-above ``threshold``."""
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    ta = toks.select(F.col("id").alias("id_a"), "token")
    tb = toks.select(F.col("id").alias("id_b"), "token")
    inter = (candidates.join(ta, "id_a").join(tb, ["id_b", "token"])
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter")))
    return (candidates
            .join(inter, ["id_a", "id_b"], "left")
            .na.fill({"n_inter": 0})
            .join(sizes.select(F.col("id").alias("id_a"),
                               F.col("set_size").alias("size_a")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b"),
                               F.col("set_size").alias("size_b")), "id_b")
            .withColumn("jaccard",
                        F.col("n_inter").cast("double")
                        / (F.col("size_a") + F.col("size_b")
                           - F.col("n_inter")).cast("double"))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "n_inter", "size_a", "size_b", "jaccard"))


def cluster_capped_keep(df: DataFrame, k: int = 2,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        threshold: float = 0.8,
                        ngram: int = 3) -> DataFrame:
    """Cluster-capped keep set (cap1; also the dedup stage of the
    cur3 capstone and the CurationPipeline surface — ONE
    implementation for all three): near-dup clusters via MinHash
    pairs + connected components, each cluster keeping its ``k``
    smallest ids — the softened dedup policy (bounded benign
    repetition instead of keep-one; the cap bounds what a boilerplate
    cluster can contribute).  Singletons keep rank 1.

    Returns (id, cluster_id, cluster_size, keep_rank) for the KEPT
    rows only.  Scale shape: the pair+components path plus ONE rank
    window per cluster — state bounded by cluster size, which the
    upstream exact-collapse and max_bucket guards bound."""
    from pyspark.sql import Window

    pairs = minhash_lsh_pairs(df, id_col, text_col, threshold, ngram)
    comp = connected_components(pairs)
    labeled = (df.select(id_col)
               .join(comp.select(F.col("doc_id").alias(id_col),
                                 "cluster_id", "cluster_size"),
                     id_col, "left")
               .select(id_col,
                       F.coalesce("cluster_id", F.col(id_col))
                       .alias("cluster_id"),
                       F.coalesce("cluster_size", F.lit(1))
                       .cast("bigint").alias("cluster_size")))
    w = Window.partitionBy("cluster_id").orderBy(id_col)
    return (labeled.withColumn("keep_rank",
                               F.row_number().over(w).cast("int"))
            .filter(F.col("keep_rank") <= k))


def incremental_dedup_flags(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            threshold: float = 0.8,
                            ngram: int = 3,
                            new_ids: DataFrame | None = None,
                            cache_tokens: bool = True,
                            collapse_exact: bool = True,
                            max_bucket: int | None = None) -> DataFrame:
    """First-wins ingestion dedup: a document is a duplicate iff it
    near-matches ANY earlier document (by key order) — the standard
    filter a training pipeline applies while ingesting a stream of
    documents.  Order-independent by construction (earlier = smaller
    key), so the result is identical whether the corpus arrives in one
    batch or incrementally — the property the streaming twin
    (streaming.dedup_stream.IncrementalDedupSink) relies on.
    Candidate generation is the LSH banding path: no n².

    Output: (id, is_dup, dup_of) — dup_of is the EARLIEST matching
    document, NULL for originals.

    ``new_ids`` (single-column frame) scopes the verdicts to those
    documents only, pushing the restriction into the LSH bucket join's
    right side — the per-micro-batch shape of the streaming twin, where
    per-batch candidate volume is bounded by the NEW documents' bucket
    collisions rather than recomputed for the whole corpus.

    ``collapse_exact`` (default on) is the HOT-BUCKET guard for the
    common crawl case — byte-identical boilerplate pages: collapse each
    exact-content group (sha-256 fingerprint) to its smallest-id
    representative BEFORE signing, run LSH over representatives only,
    and propagate verdicts back.  The result is PROVABLY IDENTICAL to
    the uncollapsed run: identical texts have Jaccard 1 with each
    other, so every doc's earliest near-match is always achieved at a
    representative (any matching non-rep's rep is no later and matches
    the same text), giving dup_of(non-rep X of rep W) =
    coalesce(dup_of(W), W) and dup_of(rep) from rep-level pairs alone.
    What changes is cost: a bucket holding D copies of one page
    contributes O(D) fingerprint-groupBy rows instead of O(D²)
    candidate pairs.  Docs too short to shingle (fewer than ``ngram``
    words → empty token set → never matchable) keep singleton groups so
    their never-flagged semantics survive the collapse.

    ``max_bucket`` additionally caps the per-(band, key) LEFT side of
    the rep-level bucket join (see :func:`minhash_lsh_pairs`) — the
    guard for near-identical-but-not-byte-identical boilerplate, with
    the documented recall tradeoff; ``None`` keeps exact semantics."""
    out_ids = df.select(id_col) if new_ids is None else new_ids.select(
        F.col(new_ids.columns[0]).alias(id_col))
    if not collapse_exact:
        pairs = minhash_lsh_pairs(df, id_col, text_col, threshold, ngram,
                                  b_ids=new_ids,
                                  cache_tokens=cache_tokens,
                                  max_bucket=max_bucket)
        dup_of = (pairs.groupBy(F.col("id_b").alias(id_col))
                       .agg(F.min("id_a").alias("dup_of")))
        return (out_ids
                  .join(dup_of, id_col, "left")
                  .select(id_col,
                          F.col("dup_of").isNotNull().alias("is_dup"),
                          "dup_of"))
    # exact-collapse path: fingerprint → representative per group
    # (shingle-less docs get a per-doc unique fingerprint: they can
    # never match anything, so they must not collapse either).  The
    # rep is assigned with ONE window over __fp — carrying the text
    # through the shuffle — instead of groupBy + rep join + semi-join
    # (three corpus-sized shuffles): the "collapse tax" on a no-dup
    # corpus measured 1.64 s vs 0.62 s at sf0.1 under the old shape
    # (docs/SCALING.md dup-heavy section).  Cached when
    # ``cache_tokens`` (the one-shot-query setting) because three
    # consumers read it: rep_rows, b_reps, and the final propagation.
    # Like the toks cache above, the entry persists until the session
    # releases it — and this one carries FULL TEXT per row, so it
    # leaks one corpus-text-sized block PER CALL for repeated callers.
    # One-shot query jobs eat that by design; long-running callers
    # (the streaming sinks) pass ``cache_tokens=False`` and re-derive.
    from pyspark.sql import Window

    shingled = F.size(F.split(F.col(text_col), " ")) >= ngram
    fp_rep = (df.select(
        F.col(id_col).alias("__did"),
        F.col(text_col).alias("__text"),
        F.when(shingled, F.sha2(F.col(text_col), 256))
         .otherwise(F.concat(F.lit("__noshingle__"),
                             F.col(id_col).cast("string"))).alias("__fp"))
        .withColumn("__rep",
                    F.min("__did").over(Window.partitionBy("__fp"))))
    if cache_tokens:
        fp_rep = plan_cache(fp_rep)
    doc_rep = fp_rep.select("__did", "__rep")
    rep_rows = (fp_rep.filter(F.col("__did") == F.col("__rep"))
                .select(F.col("__did").alias(id_col),
                        F.col("__text").alias(text_col)))
    if new_ids is None:
        b_reps = None
    else:
        # the b-side must be the REPS OF the new docs' fingerprints —
        # the rep itself may be an OLD doc (a new doc byte-identical to
        # an earlier one), whose rep-level verdict the propagation needs
        b_reps = (doc_rep.join(out_ids.select(F.col(id_col)
                                              .alias("__did")), "__did")
                  .select("__rep").distinct())
    pairs = minhash_lsh_pairs(rep_rows, id_col, text_col, threshold,
                              ngram, b_ids=b_reps,
                              cache_tokens=cache_tokens,
                              max_bucket=max_bucket)
    dup_of_rep = (pairs.groupBy(F.col("id_b").alias("__rep"))
                  .agg(F.min("id_a").alias("__rdup")))
    return (out_ids.select(F.col(id_col).alias("__did"))
            .join(doc_rep, "__did")
            .join(dup_of_rep, "__rep", "left")
            .withColumn("dup_of",
                        F.when(F.col("__did") == F.col("__rep"),
                               F.col("__rdup"))
                        .otherwise(F.coalesce(F.col("__rdup"),
                                              F.col("__rep"))))
            .select(F.col("__did").alias(id_col),
                    F.col("dup_of").isNotNull().alias("is_dup"),
                    "dup_of"))


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 30,
                         stats: dict | None = None) -> DataFrame:
    """Duplicate clusters: connected components over the near-dup pair
    graph via min-label propagation with POINTER DOUBLING.

    Each node starts labeled with itself; every round each node takes
    the minimum label in its neighborhood (one hop), then shortcuts
    through its label's own label (label ← label[label]), doubling the
    distance already covered — rounds needed = O(log diameter), not
    diameter (the Hash-to-Min family of bounds, public literature).
    Stop at fixpoint; ``max_iter`` rounds cover components of
    diameter ~2^(max_iter - 1) — the LAST round must observe zero
    change to confirm the fixpoint, so the default 30 covers ~5×10^8
    hops with the confirmation round included — and exhausting them
    without convergence RAISES
    instead of silently returning half-propagated labels (pre-r12 the
    plain one-hop loop capped at 20 hops and a longer planted chain
    came back with wrong clusters — caught by the r12 planted-chain
    sweep, pinned in tests/test_fold_references.py).  ``stats``, when
    given, records {"rounds": n} for the scaling smokes.

    Returns (doc_id, cluster_id, cluster_size) for every node appearing
    in ``pairs``; ``cluster_id`` is the smallest doc id in the component
    (the keep-first dedup representative).

    Lineage discipline: each iteration references the previous label
    frame TWICE (once through the neighbor join, once through the
    left-join base), so without truncation the logical plan doubles per
    iteration — 20 iterations is a ~2^20-node plan that the analyzer
    walks on every action even though the caches shield execution.
    ``localCheckpoint(eager=True)`` cuts the plan back to a LogicalRDD
    leaf each round, keeping analyzer/optimizer time and any
    recomputation-on-eviction path O(1) per iteration; superseded
    generations release their blocks eagerly via
    :func:`operators.core.release_checkpoint` (same pattern as
    streaming.dedup_stream).
    """
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .unionByName(pairs.select(F.col(id_b).alias("src"),
                                       F.col(id_a).alias("dst")))
             .distinct().localCheckpoint(eager=True))
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        neighbor_min = (edges.join(labels,
                                   edges["dst"] == labels["node"])
                        .groupBy("src")
                        .agg(F.min("label").alias("nbr_label")))
        hop = (labels.join(neighbor_min,
                           labels["node"] == neighbor_min["src"],
                           "left")
               .select(F.col("node"),
                       F.least(F.col("label"),
                               F.coalesce(F.col("nbr_label"),
                                          F.col("label")))
                       .alias("label")))
        # pointer doubling: shortcut each node through its label's own
        # label — every label value IS a node id, so the self-join is
        # total; this is what turns diameter rounds into log rounds.
        # eager=True materializes the new generation NOW and replaces
        # its plan with a LogicalRDD leaf — lineage is truncated, not
        # merely shielded the way .cache() would
        thru = hop.select(F.col("node").alias("__ln"),
                          F.col("label").alias("__ll"))
        new_labels = (hop.join(thru, hop["label"] == thru["__ln"],
                               "left")
                      .select("node",
                              F.least(F.col("label"),
                                      F.coalesce(F.col("__ll"),
                                                 F.col("label")))
                              .alias("label"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
                   .filter(F.col("n.label") != F.col("o.label")).take(1))
        # the superseded generation is dead once the change check has
        # run — at 100 TB leaving max_iter checkpoint generations
        # resident would evict useful blocks, so free each eagerly
        release_checkpoint(labels)
        labels = new_labels
        if not changed:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        release_checkpoint(edges)
        release_checkpoint(labels)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"pointer-doubling rounds (component diameter beyond "
            f"~2^{max_iter}) — raise max_iter; refusing to return "
            "half-propagated cluster labels")
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    out = (labels.join(sizes, "label")
           .select(F.col("node").alias("doc_id"),
                   F.col("label").alias("cluster_id"), "cluster_size")
           .localCheckpoint(eager=True))
    # the result is materialized, so the working frames no longer back
    # anything reachable from it
    release_checkpoint(edges)
    release_checkpoint(labels)
    return out


N_SIMHASH_BITS = 63  # stay within positive signed-64 range
N_PORTABLE_BITS = 48  # md5-prefix hash: 12 hex chars, engine-portable
N_CHUNKS = 4


def simhash63(df: DataFrame, id_col: str, text_col: str,
              ngram: int = 1, portable: bool = False) -> DataFrame:
    """63-bit SimHash per document: sign of per-bit weighted token sums.

    Explode-bits formulation, mirroring ``minhash_signatures``: a
    63-column SUM(CASE) aggregate does the same arithmetic but costs
    seconds of whole-stage-codegen compilation; the narrow plan compiles
    instantly, shuffles (tokens × 63) skinny rows with map-side partial
    aggregation, and reassembles the hash with one more groupBy(id).

    ``portable=True`` swaps the xxhash64 token hash for a 48-bit
    md5-prefix hash (``conv(substr(md5(token), 1, 12), 16, 10)``) that
    DuckDB computes identically (``CAST('0x'||substr(md5(t),1,12) AS
    BIGINT)``), making the whole SimHash DuckDB-oracle-checkable.
    xxhash64 stays the default: one JVM hash beats md5+hex-parse in the
    hot path.
    """
    n_bits = N_PORTABLE_BITS if portable else N_SIMHASH_BITS
    arrs = token_arrays(df, id_col, text_col, ngram)
    if portable:
        from axonops_schema_registry_spark.llm.sampling import (
            portable_hash_sql,
        )

        hashed = f"transform(toks, t -> {portable_hash_sql('t')})"
    else:
        hashed = "transform(toks, t -> xxhash64(t))"
    # Fully row-local formulation (r19, the minhash_signatures rewrite
    # applied here): hash the document's own distinct-token array and
    # derive all bit votes in one higher-order aggregate — a plain
    # projection, NO collect_list re-aggregation of the exploded frame
    # (whose per-group buffer was unbounded state on a pathological
    # document, §5).  Bit b is set iff strictly more tokens have it 1
    # than 0 — 2·ones_b > n is exactly the old Σ±1 > 0 vote (ties
    # clear the bit in both forms).
    return (arrs
            .select("id", F.expr(hashed).alias("__h0"))
            .select("id", F.expr(
                f"aggregate(sequence(0, {n_bits - 1}), "
                f"CAST(0 AS BIGINT), (acc, b) -> acc + "
                f"IF(2 * size(filter(__h0, h -> ((h >> b) & 1) = 1)) "
                f"> size(__h0), "
                f"shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))")
                .alias("simhash")))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 3, ngram: int = 1,
                  portable: bool = False) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Blocking: split the 63-bit hash into 4 chunks; distance <= 3 implies an
    identical chunk (pigeonhole), so candidates come from 4 chunk
    equi-joins, not a cross product.  The blocking is therefore EXACT for
    the emitted predicate: the result is every pair at distance <=
    max_hamming, independent of the candidate-generation path.
    """
    assert max_hamming < N_CHUNKS, "pigeonhole blocking needs k < chunks"
    sigs = simhash63(df, id_col, text_col, ngram, portable=portable)
    chunk_width = (N_PORTABLE_BITS // N_CHUNKS) if portable else 16
    chunks = F.array(*[
        F.struct(F.lit(c).alias("chunk"),
                 F.expr(f"(simhash >> {c * chunk_width}) "
                        f"& {(1 << chunk_width) - 1}").alias("key"))
        for c in range(N_CHUNKS)])
    bucketed = (sigs.select("id", "simhash", F.explode(chunks).alias("ck"))
                    .select("id", "simhash",
                            F.col("ck.chunk").alias("chunk"),
                            F.col("ck.key").alias("key")))
    a = bucketed.select(F.col("id").alias("id_a"),
                        F.col("simhash").alias("sim_a"), "chunk", "key")
    b = bucketed.select(F.col("id").alias("id_b"),
                        F.col("simhash").alias("sim_b"), "chunk", "key")
    return (a.join(b, ["chunk", "key"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sim_a", "sim_b").distinct()
             .withColumn("hamming",
                         F.bit_count(F.expr("sim_a ^ sim_b")))
             .filter(F.col("hamming") <= max_hamming)
             .select("id_a", "id_b", "hamming"))


def winnowing_fingerprints(df: DataFrame, id_col: str, text_col: str,
                           k: int = 3, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS local fingerprinting algorithm — public): hash every
    k-gram, slide a w-hash window, select each window's minimum hash
    (rightmost on ties).  GUARANTEE: two documents sharing any run of
    >= w + k - 1 tokens share at least one selected fingerprint, while
    only ~2/(w+1) of positions are kept — the density/recall trade the
    paper proves.

    Returns (id, pos, print_hash) — the selected fingerprints with
    their 1-based k-gram positions.  Hashes are the engine-portable
    48-bit md5 prefix (llm.sampling.portable_hash's idiom), so a SQL
    oracle replays the selection exactly.

    Scale: the whole selection is ROW-LOCAL array arithmetic — window
    minima, dedup and all — so the plan is a zero-shuffle projection +
    explode; nothing moves between executors until whatever the caller
    aggregates.
    """
    from axonops_schema_registry_spark.llm.sampling import (
        portable_hash_sql,
    )

    # __ws is pre-projected below: an inline split in the lambda is
    # re-evaluated per element (O(words²) per doc)
    # k-gram hash at position i (1-based): portable 48-bit md5 prefix
    gram = portable_hash_sql(f"array_join(slice(__ws, i, {k}), ' ')")
    grams = (f"transform(sequence(1, size(__ws) - {k - 1}), "
             f"i -> {gram})")
    gated = (f"CASE WHEN size(__ws) >= {k} THEN {grams} "
             f"ELSE array() END")
    # per window p over [p, p+w-1]: the minimal (h, -j) struct is the
    # rightmost minimum; array_distinct collapses windows that elected
    # the same fingerprint — all inside one row
    win_min = (f"array_min(transform(sequence(CAST(p AS INT), "
               f"CAST(p AS INT) + {w - 1}), "
               f"j -> struct(element_at(__h, j) AS h, -j AS nj)))")
    selected = (f"CASE WHEN size(__h) >= {w} THEN "
                f"array_distinct(transform("
                f"sequence(1, size(__h) - {w - 1}), p -> {win_min})) "
                f"ELSE array() END")
    return (df.select(F.col(id_col).alias("id"),
                      F.split(F.col(text_col), " ").alias("__ws"))
            .select("id", F.expr(gated).alias("__h"))
            .select("id", F.explode(F.expr(selected)).alias("__m"))
            .select("id",
                    (-F.col("__m.nj")).cast("bigint").alias("pos"),
                    F.col("__m.h").alias("print_hash")))


def duplicated_span_islands(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", k: int = 8,
                            min_count: int = 2,
                            hash_grams: bool = False,
                            cache_grams: bool = True) -> DataFrame:
    """Maximal duplicated-substring spans — the substring-granular
    dedup of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better", ExactSubstr) at k-gram resolution: a
    position is duplicated when its k-gram occurs at least
    ``min_count`` times CORPUS-WIDE (across documents or repeated
    inside one), and consecutive duplicated positions merge into one
    maximal island — the span a pipeline cuts out of the document
    (vs document-level dedup, which drops whole documents only).

    Returns one row per maximal span: (id, start_pos, end_pos,
    n_words) — 1-based k-gram positions; the span covers words
    [start_pos, end_pos + k - 1], so n_words = end - start + k.

    Scale shape: positioned k-grams are a row-local explode; the
    occurrence count is a gram-keyed aggregate with map-side combine
    (token-scale shuffle, same as bp1's span df-count); the
    duplicated-position join shuffles on the gram key (the duplicated
    set scales with the corpus — never broadcast); island merging is
    the gaps-and-islands window per document (pos - row_number is
    constant within a run of consecutive positions).  The join is
    AMPLIFICATION-FREE under any skew: the dup side holds exactly one
    row per distinct gram, so a boilerplate gram occurring a billion
    times emits a billion join rows (its own occurrences), never a
    cross product — hot keys cost their input size, nothing more.

    ``hash_grams`` is the 100 TB form: replace the raw gram string
    with its ``xxhash64`` IMMEDIATELY after the explode, so both the
    occurrence-count aggregate and the duplicated-position join
    shuffle fixed 8-byte keys instead of ~9-word strings (an
    order-of-magnitude shuffle-width cut at k=8; measured in
    docs/SCALING.md).  A 64-bit collision would merge two distinct
    grams' counts — at 2^32 distinct grams (≈ 34 TB of 8-gram text)
    the birthday bound puts the chance of ANY collision near 0.5, and
    a single collision only risks one false duplicated position, so
    the variant trades a vanishing precision loss for the shuffle
    win.  Span output is pinned equal to the raw-string path in
    pytest; the default stays raw so the DuckDB oracle is replayable
    verbatim."""
    pos_grams = _positioned_grams(df, id_col, text_col, k, hash_grams)
    # cached (r18): the positioned-gram explode feeds BOTH the
    # occurrence-count aggregate and the duplicated-position join —
    # without this the k-gram string materialization (the family's
    # dominant per-task cost) runs once per consumer.  Callers are
    # one-shot query jobs / the facade, the toks-cache lifetime
    # contract (release via operators.core.release_plan_caches).  At
    # 100 TB prefer recompute (row-local off the scan) over pinning a
    # corpus-gram-scale frame: a long-running caller passes
    # ``cache_grams=False`` and re-derives, as the streaming sinks do
    # with token frames (ADVICE r18 — the cache_tokens convention).
    if cache_grams:
        pos_grams = plan_cache(pos_grams)
    dup = (pos_grams.groupBy("gram")
           .agg(F.count(F.lit(1)).alias("__n"))
           .filter(F.col("__n") >= min_count)
           .select("gram"))
    dpos = pos_grams.join(dup, "gram").select("id", "pos")
    return _span_islands(dpos, k)


def _positioned_grams(df: DataFrame, id_col: str, text_col: str,
                      k: int, hash_grams: bool) -> DataFrame:
    """(id, pos, gram) for every k-gram position (1-based) — the
    shared explode of the ExactSubstr family.  The split is projected
    ONCE (an inline split({text}) in the lambda is re-evaluated PER
    ELEMENT — O(words²) per doc, measured 3x slower on the es1 bench
    path); ``hash_grams`` swaps the raw string key for its xxhash64
    (the narrow-shuffle 100 TB form, see duplicated_span_islands)."""
    grams = (f"CASE WHEN size(__ws) >= {k} THEN "
             f"transform(sequence(1, size(__ws) - {k - 1}), "
             f"i -> struct(i AS pos, "
             f"array_join(slice(__ws, i, {k}), ' ') AS gram)) "
             f"ELSE array() END")
    gram_key = (F.xxhash64("g.gram") if hash_grams
                else F.col("g.gram"))
    return (df.select(F.col(id_col).alias("id"),
                      F.split(F.col(text_col), " ").alias("__ws"))
            .select("id", F.explode(F.expr(grams)).alias("g"))
            .select("id", F.col("g.pos").alias("pos"),
                    gram_key.alias("gram")))


def _span_islands(dpos: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands merge of flagged positions: consecutive
    positions share ``pos - row_number()``; each maximal run becomes
    (id, start_pos, end_pos, n_words) with n_words = end - start + k."""
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    return (dpos
            .withColumn("__grp", F.col("pos") - F.row_number().over(w))
            .groupBy("id", "__grp")
            .agg(F.min("pos").cast("bigint").alias("start_pos"),
                 F.max("pos").cast("bigint").alias("end_pos"))
            .select("id", "start_pos", "end_pos",
                    (F.col("end_pos") - F.col("start_pos") + k)
                    .cast("bigint").alias("n_words")))


def remove_duplicated_spans(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", k: int = 8,
                            min_count: int = 2,
                            hash_grams: bool = False,
                            min_span_words: int | None = None
                            ) -> DataFrame:
    """The CUT step completing :func:`duplicated_span_islands` — Lee
    et al. 2021's ExactSubstr pipeline actually edits the corpus:
    every word position covered by a duplicated-span island
    (positions [start_pos, end_pos + k - 1]) is removed from its
    document, ALL occurrences (the symmetric policy: duplicated
    content contributes nothing, rather than electing one surviving
    copy — the policy their released deduplicate tool applies when
    both sides match).

    ``min_span_words`` cuts only islands spanning at least that many
    words — the analogue of the paper's published setting (remove
    duplicate substrings of >= 50 tokens only), applied at ISLAND
    granularity: the gate tests the width of a merged maximal run of
    duplicated positions, and a run can chain positions whose k-grams
    match DIFFERENT partners, so an island >= ``min_span_words`` wide
    need not contain any single duplicated substring that long.  The
    gate therefore never misses a paper-qualifying span (a >= N-word
    duplicated substring always yields an island >= N wide) but can
    additionally cut chains of shorter incidental matches that merge
    into a wide island — a deliberate, conservative-toward-removal
    approximation, not per-match parity with Lee et al.'s threshold.
    None (the default, what the es2 oracle replays) cuts every
    island.

    Returns (id, n_words, n_removed, cleaned_text) per document —
    every input document appears, untouched ones with n_removed = 0
    and their (single-space re-joined) text intact.

    Scale shape: the islands subgraph is es1's (gram-keyed agg +
    join, never broadcast); the cut itself adds ONE doc-keyed shuffle
    (islands grouped to a per-doc span array, joined back on id) and
    is otherwise row-local — the span array is bounded by doc length,
    and the keep/drop scan is a single codegen'd higher-order-function
    expression over the word array, no second corpus explode."""
    islands = duplicated_span_islands(df, id_col, text_col, k,
                                      min_count, hash_grams)
    return _cut_spans(df, islands, id_col, text_col, k,
                      min_span_words)


def _cut_spans(df: DataFrame, islands: DataFrame, id_col: str,
               text_col: str, k: int,
               min_span_words: int | None) -> DataFrame:
    """Remove every word position covered by an island from its
    document — the shared cut tail of the ExactSubstr family (see
    remove_duplicated_spans for the full semantics)."""
    if min_span_words is not None:
        islands = islands.filter(F.col("n_words") >= min_span_words)
    spans = (islands.groupBy("id")
             .agg(F.collect_list(F.struct("start_pos", "end_pos"))
                  .alias("__spans")))
    # split once, compute the kept-word scan once (an inline repeat
    # would re-run the O(words x spans) exists() filter per consumer)
    tagged = (df.select(F.col(id_col).alias("id"),
                        F.split(F.col(text_col), " ").alias("__ws"))
              .join(spans, "id", "left")
              .withColumn("__spans",
                          F.coalesce(F.col("__spans"),
                                     F.array().cast(
                                         "array<struct<start_pos:bigint,"
                                         "end_pos:bigint>>")))
              .withColumn("__kept", F.expr(
                  f"filter(transform(__ws, (w, i) -> "
                  f"named_struct('w', w, 'p', CAST(i + 1 AS BIGINT))), "
                  f"s -> NOT exists(__spans, sp -> "
                  f"s.p >= sp.start_pos"
                  f" AND s.p <= sp.end_pos + {k - 1}))")))
    return (tagged.select(
        "id",
        F.expr("CAST(size(__ws) AS BIGINT)").alias("n_words"),
        F.expr("CAST(size(__ws) - size(__kept) AS BIGINT)")
         .alias("n_removed"),
        F.expr("array_join(transform(__kept, s -> s.w), ' ')")
         .alias("cleaned_text")))


def contaminated_span_islands(train: DataFrame, eval_df: DataFrame,
                              id_col: str = "doc_id",
                              text_col: str = "text", k: int = 8,
                              hash_grams: bool = False) -> DataFrame:
    """Cross-corpus ExactSubstr islands — the DECONTAMINATION form of
    :func:`duplicated_span_islands` (Lee et al. 2021 apply the same
    suffix-machinery between train and eval; GPT-3's appendix-C n-gram
    rule is the coarser cousin): a TRAIN position is flagged when its
    k-gram occurs ANYWHERE in the evaluation corpus, and consecutive
    flagged positions merge into maximal islands — the spans a
    pipeline must cut so the model never trains on benchmark text.
    ctm1/ctm2 COUNT these collisions per document; this localizes
    them to cuttable spans.

    Scale shape: train positioned k-grams are a row-local explode;
    the eval gram set is one distinct over the (much smaller) eval
    corpus; the membership join is gram-keyed and AMPLIFICATION-FREE
    (the eval side holds one row per distinct gram — a boilerplate
    gram costs its train occurrences, never a cross product), and AQE
    broadcasts the eval side whenever it actually is small.
    ``hash_grams`` narrows both shuffle keys to 8 bytes (the 100 TB
    form, same trade documented on duplicated_span_islands)."""
    pos_grams = _positioned_grams(train, id_col, text_col, k,
                                  hash_grams)
    eval_grams = (token_set(eval_df, id_col, text_col, k)
                  .select(F.col("token").alias("gram")).distinct())
    if hash_grams:
        eval_grams = eval_grams.select(F.xxhash64("gram").alias("gram"))
    dpos = pos_grams.join(eval_grams, "gram").select("id", "pos")
    return _span_islands(dpos, k)


def remove_contaminated_spans(train: DataFrame, eval_df: DataFrame,
                              id_col: str = "doc_id",
                              text_col: str = "text", k: int = 8,
                              hash_grams: bool = False,
                              min_span_words: int | None = None
                              ) -> DataFrame:
    """Cut every word position covered by a
    :func:`contaminated_span_islands` island from its TRAIN document —
    the decontamination edit itself (eval documents are never
    modified).  Same output contract and cut machinery as
    :func:`remove_duplicated_spans` (every train document appears;
    ``min_span_words`` gates at island granularity, the documented
    conservative-toward-removal approximation)."""
    islands = contaminated_span_islands(train, eval_df, id_col,
                                        text_col, k, hash_grams)
    return _cut_spans(train, islands, id_col, text_col, k,
                      min_span_words)


def _word_blocks(df: DataFrame, id_col: str, text_col: str,
                 block_words: int) -> DataFrame:
    """(id, block_idx, btext, bwords) — deterministic fixed-width
    segmentation shared by the line-dedup family: non-overlapping
    ``block_words``-word blocks, the final partial block kept as a
    shorter one.  One row-local higher-order transform; the word
    split is projected ONCE (the _positioned_grams lesson)."""
    bw = int(block_words)
    blocks_expr = (
        f"CASE WHEN size(__ws) > 0 THEN "
        f"transform(sequence(1, CAST(ceil(size(__ws) / {bw}.0) AS INT)), "
        f"b -> struct(CAST(b AS BIGINT) AS block_idx, "
        f"array_join(slice(__ws, (b - 1) * {bw} + 1, {bw}), ' ') AS btext, "
        f"CAST(least(b * {bw}, size(__ws)) - (b - 1) * {bw} AS BIGINT) "
        f"AS bwords)) ELSE array() END")
    return (df.select(F.col(id_col).alias("id"),
                      F.split(F.col(text_col), " ").alias("__ws"))
            .select("id", F.explode(F.expr(blocks_expr)).alias("b"))
            .select("id", F.col("b.block_idx").alias("block_idx"),
                    F.col("b.btext").alias("btext"),
                    F.col("b.bwords").alias("bwords")))


#: Bit split of the line-dedup first-occurrence election key: packed
#: order = id * 2**_PACK_BLOCK_BITS + block_idx.  Ids must sit in
#: [0, 2**43) and documents must segment into < 2**20 blocks (a >10M-word
#: document at the default width) or the packed BIGINT no longer sorts
#: like (id, block_idx).
_PACK_BLOCK_BITS = 20
_PACK_ID_BOUND = 1 << 43


def _packed_order():
    """The (id, block_idx) election order as ONE hash-aggregatable
    BIGINT, with out-of-bounds corpora failing LOUDLY instead of
    silently electing in packed-value order — the ``_sampled_ids``
    silent-failure lesson (llm/similarity.py), applied row-locally: a
    raising CASE on the row itself costs no extra aggregate and no
    extra corpus scan, where a max(id)/max(block_idx) guard FRAME
    would either recompute the election subtree or re-scan the corpus
    (the read-amplification audit's exact anti-pattern).  Shared by
    :func:`line_dedup` and ``streaming.dedup_stream.LineDedupSink`` so
    the batch and streaming elections stay guard-identical."""
    ok = ((F.col("id") >= 0)
          & (F.col("id") < F.lit(_PACK_ID_BOUND))
          & (F.col("block_idx") < F.lit(1 << _PACK_BLOCK_BITS)))
    return (F.when(ok, F.col("id") * F.lit(1 << _PACK_BLOCK_BITS)
                       + F.col("block_idx"))
            .otherwise(F.expr(
                "raise_error(concat('line-dedup election: packed "
                "(id, block_idx) order out of bounds at id=', "
                "CAST(id AS STRING), ', block_idx=', "
                "CAST(block_idx AS STRING), ' — ids must be in "
                "[0, 2^43) and documents must segment into < 2^20 "
                "blocks (>10M words at the default width); rescale "
                "ids or raise block_words'))"))
            ).cast("bigint")


def line_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", block_words: int = 10,
               min_block_words: int = 5,
               hash_blocks: bool = False) -> DataFrame:
    """CCNet-style keep-first paragraph dedup (Wenzek et al. 2020:
    hash every paragraph, keep only the FIRST occurrence corpus-wide)
    mapped onto deterministic fixed-width segmentation — the corpus
    here carries no newline structure, so a "paragraph" is a
    non-overlapping ``block_words``-word block (the final partial
    block is a shorter paragraph, exactly as a real trailing
    paragraph would be).

    Policy contrast with the ExactSubstr family
    (:func:`remove_duplicated_spans`): that cuts ALL occurrences of
    overlapping duplicated k-gram spans (symmetric removal); this
    keeps the first occurrence of each duplicated block and removes
    the later copies (the asymmetric CCNet policy — boilerplate
    survives exactly once).  First = smallest ``(id, block_idx)``.
    Blocks shorter than ``min_block_words`` are never dedup-keyed
    (CCNet's very-short-paragraph guard: two-word blocks collide
    constantly and carry no removable mass); equal block text implies
    equal word count, so gated blocks can never collide with eligible
    ones.

    Returns (id, n_blocks, n_removed, cleaned_text) per document —
    every input document appears; a document whose every block
    duplicates earlier text comes back with ``cleaned_text = ''``.

    Scale shape: the segmentation is one row-local higher-order
    transform off the scan (the word split is projected ONCE — the
    _positioned_grams lesson); first-occurrence election is a
    block-keyed groupBy with map-side partial aggregation — the
    (id, block_idx) order is packed into ONE BIGINT
    (``id·2²⁰ + block_idx``) so the min is a plain hash-aggregatable
    long (a struct-min plans as SortAggregate, sorting every
    partition twice; the packed form stays HashAggregate end-to-end).
    Bounds, ASSERTED row-locally by :func:`_packed_order`'s raising
    CASE: ids non-negative < 2⁴³ and blocks-per-doc < 2²⁰ (a
    >10M-word document at the default width) — out-of-bounds corpora
    fail loudly at execution instead of silently electing in
    packed-value order.  Election is skew-robust where a window
    over the block key would sort every hot boilerplate key in one
    task; then one block-keyed join back and one doc-keyed
    reassembly shuffle.  ``hash_blocks`` swaps the block-text shuffle
    key for its xxhash64 — the narrow-key 100 TB form, same trade the
    es1h path documents (output pinned identical on the fixture
    corpora in tests/test_llm_ops.py).
    """
    ex = _word_blocks(df, id_col, text_col, block_words)
    key = (F.xxhash64("btext") if hash_blocks
           else F.col("btext")).alias("__bkey")
    ex = ex.select("id", "block_idx", "btext", "bwords", key)
    packed = _packed_order()
    firsts = (ex.filter(F.col("bwords") >= min_block_words)
                .withColumn("__ord", packed)
                .groupBy("__bkey")
                .agg(F.min("__ord").alias("__first")))
    kept = (ex.join(firsts, "__bkey", "left")
              .withColumn("__keep",
                          (F.col("bwords") < min_block_words)
                          | (F.col("__first") == packed)))
    return _reassemble_blocks(kept)


def _reassemble_blocks(kept: DataFrame) -> DataFrame:
    """(id, n_blocks, n_removed, cleaned_text) from a flagged block
    frame (id, block_idx, btext, __keep) — the shared reassembly tail
    of the line-dedup family: one doc-keyed shuffle, kept blocks
    re-joined in block order (collect_list skips the when()'s nulls;
    array_sort on the (block_idx, btext) struct restores order)."""
    return (kept.groupBy("id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                 F.sum(F.when(~F.col("__keep"), 1).otherwise(0))
                  .cast("bigint").alias("n_removed"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("__keep"),
                                    F.struct("block_idx", "btext")))),
                         lambda s: s["btext"]),
                     " ").alias("cleaned_text")))


def line_decontaminate(train: DataFrame, eval_df: DataFrame,
                       id_col: str = "doc_id",
                       text_col: str = "text",
                       block_words: int = 10,
                       min_block_words: int = 5) -> DataFrame:
    """Cross-corpus line decontamination — :func:`line_dedup`'s
    es3-shaped sibling: cut from every TRAIN document any block whose
    text appears as a block anywhere in the EVALUATION corpus
    (evaluation documents are never modified).  The coarse, cheap
    form a pipeline runs when eval sets are paragraph-structured —
    :func:`remove_contaminated_spans` (es3) is the positioned-gram
    escalation that also catches spans straddling block boundaries.

    Same contract as :func:`line_dedup`: every train document comes
    back as (id, n_blocks, n_removed, cleaned_text); blocks shorter
    than ``min_block_words`` are never keyed (and an eval block that
    short never cuts anything).

    Scale shape: both corpora segment row-locally off their scans;
    the eval block set is ONE distinct over the (much smaller) eval
    corpus; the membership join is block-keyed and amplification-free
    (the eval side carries one row per distinct block), AQE free to
    broadcast it when it actually is small — the
    contaminated_span_islands shape at block granularity."""
    ex = _word_blocks(train, id_col, text_col, block_words)
    ev = (_word_blocks(eval_df, id_col, text_col, block_words)
          .filter(F.col("bwords") >= min_block_words)
          .select("btext").distinct()
          .withColumn("__hit", F.lit(True)))
    kept = (ex.join(ev, "btext", "left")
              .withColumn("__keep",
                          (F.col("bwords") < min_block_words)
                          | F.col("__hit").isNull()))
    return _reassemble_blocks(kept)


def gram_key_profile(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 8,
                     top_n: int = 20) -> DataFrame:
    """Shuffle-key skew diagnostic for the ExactSubstr family: the
    occurrence distribution of the k-gram key that
    :func:`duplicated_span_islands` / :func:`contaminated_span_islands`
    group and join on.  At 100 TB the FIRST question before running
    any of them is whether a handful of boilerplate grams will
    concentrate the shuffle (the hot keys salting/AQE-skew-join must
    absorb) — this emits that answer as a table: the ``top_n``
    hottest grams with rank, occurrence count, and exact
    parts-per-million share (``1_000_000·n DIV total`` — BIGINT
    division, no float), alongside corpus totals (positions,
    distinct grams) on every row.

    Scale shape: one row-local gram explode off the scan (the shared
    _positioned_grams projection), a gram-keyed count with map-side
    partial aggregation, a distributed top-k (Catalyst
    TakeOrderedAndProject — never a global sort), and a
    broadcast-of-one-row totals join; the final rank window orders
    the already-limited ``top_n`` rows only."""
    from pyspark.sql import Window

    pg = _positioned_grams(df, id_col, text_col, k, hash_grams=False)
    # materialize the gram counts ONCE (lazy checkpoint): both the
    # top-k and the totals consume them, and without this the
    # corpus-scale explode+agg runs twice — the table is
    # distinct-gram-sized, the same cardinality the es-family
    # election join already shuffles
    counts = (pg.groupBy("gram")
                .agg(F.count(F.lit(1)).cast("bigint")
                     .alias("n_occurrences"))
                .localCheckpoint(eager=False))
    totals = counts.agg(
        F.sum("n_occurrences").cast("bigint").alias("n_positions"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_grams"))
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("gram")) \
                .limit(top_n)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("gram"))
    return (top.crossJoin(F.broadcast(totals))
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .withColumn("ppm", F.expr(
                "CAST(1000000 * n_occurrences AS BIGINT)"
                " DIV n_positions"))
            .select("rank", F.col("gram").alias("gram_text"),
                    "n_occurrences", "ppm", "n_positions",
                    "n_distinct_grams"))


def lsh_bucket_profile(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", ngram: int = 3,
                       n_hashes: int = 64, bands: int = 16,
                       top_n: int = 20) -> DataFrame:
    """Bucket-occupancy skew diagnostic for the MinHash-LSH family —
    :func:`gram_key_profile`'s sibling one stage later: candidate
    pairs per LSH bucket grow QUADRATICALLY with occupancy
    (n·(n-1)/2), so one boilerplate-heavy bucket can dominate the
    entire candidate-verification bill.  This is the measurement
    behind choosing :func:`minhash_lsh_pairs`' ``max_bucket`` rank
    cap (and the dedup stores' cap): run it BEFORE the dedup job,
    read ``max_occupancy`` and the top buckets' ``pairs_ppm``
    (exact ``1_000_000·n_pairs DIV total`` BIGINT share of all
    candidate pairs), and size the cap so no bucket's quadratic term
    dwarfs the linear scan.

    Returns the ``top_n`` hottest buckets by candidate-pair count
    (ties: band, key ascending) with corpus totals on every row.
    The band keys are xxhash64-composed, so there is deliberately no
    DuckDB oracle (the es1h/dd6b class); the aggregation logic is
    pinned structurally in tests/test_llm_ops.py against a replay
    over :func:`minhash_band_buckets`' own output plus a planted
    identical-docs corpus.

    Scale shape: the banding is the dedup family's own (row-local
    signature + explode); occupancy is a bucket-keyed count with
    map-side partials, lazily checkpointed once for the top-k and
    totals consumers; top-k is a distributed TakeOrderedAndProject;
    totals broadcast-of-one-row."""
    from pyspark.sql import Window

    arrs = token_arrays(df, id_col, text_col, ngram)
    occ = (minhash_band_buckets(arrs, n_hashes, bands)
           .groupBy("band", "key")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
           .withColumn("n_pairs",
                       F.expr("(n_members * (n_members - 1)) DIV 2"))
           .localCheckpoint(eager=False))
    totals = occ.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("n_members").cast("bigint").alias("n_memberships"),
        F.sum("n_pairs").cast("bigint").alias("total_candidate_pairs"),
        F.max("n_members").cast("bigint").alias("max_occupancy"))
    top = (occ.orderBy(F.desc("n_pairs"), F.asc("band"), F.asc("key"))
              .limit(top_n))
    w = Window.orderBy(F.desc("n_pairs"), F.asc("band"), F.asc("key"))
    return (top.crossJoin(F.broadcast(totals))
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .withColumn("pairs_ppm",
                        F.when(F.col("total_candidate_pairs") > 0,
                               F.expr("CAST(1000000 * n_pairs AS "
                                      "BIGINT) DIV "
                                      "total_candidate_pairs"))
                        .otherwise(F.lit(0)).cast("bigint"))
            .select("rank", "band", "key", "n_members", "n_pairs",
                    "pairs_ppm", "n_buckets", "n_memberships",
                    "total_candidate_pairs", "max_occupancy"))
