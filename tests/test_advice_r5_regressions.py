"""Regression tests for the round-5 advisory findings (ADVICE.md r5):

1. (high) ``ngram_spans`` crashed on documents with fewer than n
   tokens: Spark's ``sequence(1, 0)`` is the DESCENDING [1, 0] and
   ``slice(arr, 0, n)`` throws INVALID_PARAMETER_VALUE.START, aborting
   the whole contamination job — and diverging from DuckDB's empty
   ``generate_series(1, 0)``.
2. (medium) ``corpus_gauge_rows`` fabricated schema_type from
   ``schema_id % 20`` and ``prometheus_gauges`` ignored ``self.corpus``
   — gauges must be derived from the caller's corpus, like the
   reference's refreshGauges derives from live storage.
3. (low) TX7's DuckDB oracle carried literal BACKSPACE bytes (0x08)
   where the ``\\b`` word boundaries belong, so Spark and DuckDB ipv4
   counts diverged on digit-dotted substrings like '1.2.3.4567'.
4. (low) ``SyslogTcpSink`` hardcoded the RFC 5424 header timestamp
   '2026-01-01T00:00:00Z' — it must carry the event's own time.
5. (low) ``IncrementalDedupSink`` grew unbounded lineage (no
   checkpoint) and recomputed the full corpus per batch.

Plus the VERDICT r5 nit: ``connected_components`` must not leak one
cached frame per iteration.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. short documents must yield zero spans, not a crash
# ---------------------------------------------------------------------------

def test_ngram_spans_short_doc_is_empty(spark):
    from axonops_schema_registry_spark.llm.contamination import ngram_spans

    df = spark.createDataFrame(
        [(1, "only four words here"), (2, "a b c d e f g")],
        "doc_id bigint, text string")
    rows = ngram_spans(df, "doc_id", "text", n=5).collect()
    ids = {r.id for r in rows}
    assert ids == {2}, rows  # the 4-word doc contributes nothing
    assert all(len(r.span.split(" ")) == 5 for r in rows)


def test_contamination_flags_survive_short_docs(spark):
    from axonops_schema_registry_spark.llm.contamination import (
        contamination_flags,
    )

    train = spark.createDataFrame(
        [(1, "tiny doc"),
         (2, "the quick brown fox jumps over the lazy dog today")],
        "doc_id bigint, text string")
    test = spark.createDataFrame(
        [(9, "quick brown fox jumps over"), (10, "short")],
        "doc_id bigint, text string")
    got = {r.doc_id: r.n_shared_spans
           for r in contamination_flags(train, test).collect()}
    assert got == {2: 1}


# ---------------------------------------------------------------------------
# 2. gauges derive from the caller's corpus, not a fabricated mix
# ---------------------------------------------------------------------------

def test_corpus_gauge_rows_reflect_corpus_types(spark):
    from axonops_schema_registry_spark.registry.metrics import (
        corpus_gauge_rows,
    )

    corpus = spark.createDataFrame(
        [("s1", 1, "PROTOBUF", "x", False),
         ("s1", 2, "PROTOBUF", "y", False),
         ("s2", 1, "JSON", "z", False),
         ("s2", 2, "JSON", "z", True)],   # deleted: excluded
        "subject string, version int, schema_type string, "
        "schema_text string, deleted boolean")
    rows = corpus_gauge_rows(corpus).collect()
    by_type = {r.labels: r.value for r in rows
               if r.metric == "schema_registry_schemas_total"}
    assert by_type == {'type="PROTOBUF"': 2.0, 'type="JSON"': 1.0}
    assert "AVRO" not in str(by_type)
    subj = {r.labels: r.value for r in rows
            if r.metric == "schema_registry_schema_versions"}
    assert subj == {'subject="s1"': 2.0, 'subject="s2"': 1.0}


def test_prometheus_gauges_use_self_corpus(spark):
    from axonops_schema_registry_spark.api import RegistryAnalytics
    from axonops_schema_registry_spark.registry.model import fixture_schemas

    reg = RegistryAnalytics(spark, fixture_schemas(spark))
    rows = reg.prometheus_gauges().collect()
    types = {r.labels for r in rows
             if r.metric == "schema_registry_schemas_total"}
    assert types == {'type="AVRO"', 'type="JSON"', 'type="PROTOBUF"'}


# ---------------------------------------------------------------------------
# 3. the Spark ipv4 pattern and the TX7 oracle pattern count identically
# ---------------------------------------------------------------------------

def test_ipv4_word_boundary_parity(spark):
    from axonops_schema_registry_spark.llm.text import PII_PATTERNS
    from axonops_schema_registry_spark.queries import llm_queries

    oracle = llm_queries.TX7_ORACLE
    assert "\x08" not in oracle, "oracle holds literal backspace bytes"
    tricky = "a 1.2.3.4567 b 10.0.0.1 c 1.2.3.4.5"
    n_spark = spark.createDataFrame([(tricky,)], "text string").select(
        F.regexp_count("text", F.lit(PII_PATTERNS["ipv4"]))
        .alias("n")).collect()[0].n
    n_duck = duckdb.sql(
        "SELECT len(regexp_extract_all(?, "
        r"'\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))",
        params=[tricky]).fetchone()[0]
    assert n_spark == n_duck


# ---------------------------------------------------------------------------
# 4. syslog header carries the event's timestamp, not a literal
# ---------------------------------------------------------------------------

def test_syslog_header_uses_event_time(spark):
    import socketserver
    import threading
    import time

    from axonops_schema_registry_spark.streaming.audit import SyslogTcpSink

    messages: list[str] = []

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            data = self.rfile.read().decode(errors="replace")
            while data:
                length, sep, rest = data.partition(" ")
                if not sep or not length.isdigit():
                    break
                n = int(length)
                messages.append(rest[:n])
                data = rest[n:]

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    server.daemon_threads = True
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        sink = SyslogTcpSink("127.0.0.1", server.server_address[1])
        batch = spark.createDataFrame(
            [(1, "2024-03-05 12:34:56", "CREATE")],
            "event_id bigint, ts string, event_type string") \
            .withColumn("ts", F.to_timestamp("ts"))
        sink(batch, epoch_id=0)
        for _ in range(100):
            if messages:
                break
            time.sleep(0.01)
    finally:
        server.shutdown()
        server.server_close()
    assert messages, "no syslog frame received"
    header_ts = messages[0].split(" ")[1]
    assert header_ts == "2024-03-05T12:34:56Z", messages[0]
    assert "2026-01-01T00:00:00Z" not in messages[0]


def test_syslog_clock_fallback_injectable():
    from axonops_schema_registry_spark.streaming.audit import SyslogTcpSink

    sink = SyslogTcpSink("127.0.0.1", 1, clock=lambda: "2030-01-02T03:04:05Z")
    assert sink.clock() == "2030-01-02T03:04:05Z"


# ---------------------------------------------------------------------------
# 5 + nit: cache lifetime — no persistent-RDD growth across a
# connected_components run; the dedup sink checkpoints per epoch
# ---------------------------------------------------------------------------

def test_connected_components_releases_caches(spark):
    from axonops_schema_registry_spark.llm.dedup import connected_components

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a bigint, id_b bigint")
    out = connected_components(pairs)
    got = {(r.doc_id, r.cluster_id, r.cluster_size) for r in out.collect()}
    assert (3, 1, 3) in got and (11, 10, 2) in got and (23, 20, 4) in got
    # the final labels cache is the ONLY frame allowed to remain
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, (before, after)


def test_incremental_sink_truncates_lineage(spark):
    from axonops_schema_registry_spark.streaming.dedup_stream import (
        IncrementalDedupSink,
    )

    sink = IncrementalDedupSink(threshold=0.8, ngram=3,
                                track_flags=True)
    words = "the quick brown fox jumps over the lazy dog".split()
    for epoch in range(4):
        batch = spark.createDataFrame(
            [(epoch * 10 + i,
              " ".join(words[(i + j) % len(words)] for j in range(9)))
             for i in range(3)],
            "doc_id bigint, text string")
        sink(batch, epoch_id=epoch)
    # localCheckpoint truncates lineage: the seen frame's logical plan
    # must not compound epoch over epoch
    plan = sink.seen._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan and "Union" not in plan, plan[:500]
    assert len(sink.flags) == 12


def test_dependency_closure_releases_caches(spark):
    from axonops_schema_registry_spark.operators.graph import (
        dependency_closure,
    )

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "subject string, ref_subject string")
    out = dependency_closure(edges, "subject", "ref_subject")
    got = {(r.subject, r.ref_subject, r.depth) for r in out.collect()}
    assert ("a", "d", 3) in got
    # the final checkpointed closure is the ONLY frame allowed to remain
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, (before, after)


# ---------------------------------------------------------------------------
# r6 self-review findings (pre-judge): multi-chunk canonical, flat-graph
# cache release, syslog session-timezone interpretation
# ---------------------------------------------------------------------------

def test_stateful_dedup_multichunk_group_canonical(spark):
    """A fingerprint group split across several Arrow chunks must still
    elect the micro-batch-min canonical (not a first-chunk min)."""
    import os
    import shutil
    import tempfile

    from axonops_schema_registry_spark.streaming.stateful import (
        exact_dedup_flags_stateful,
    )

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                          "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    d = tempfile.mkdtemp(prefix="mc_src_")
    ckpt = tempfile.mkdtemp(prefix="mc_ckpt_")
    try:
        # 20 identical texts, ids DESCENDING in file order so a
        # first-chunk winner would be wrong
        docs = spark.createDataFrame(
            [(100 - i, "identical content") for i in range(20)],
            "doc_id bigint, text string")
        sub = tempfile.mkdtemp(prefix="mc_part_")
        docs.coalesce(1).write.mode("overwrite").parquet(sub)
        part = next(p for p in os.listdir(sub)
                    if p.endswith(".parquet"))
        shutil.copy(os.path.join(sub, part),
                    os.path.join(d, "p0.parquet"))
        shutil.rmtree(sub, ignore_errors=True)

        stream = (spark.readStream.schema("doc_id bigint, text string")
                  .parquet(d))
        q = (exact_dedup_flags_stateful(stream)
             .writeStream.format("memory").queryName("mc_flags")
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM mc_flags").collect()
        assert len(rows) == 20
        assert all(r.canonical_id == 81 for r in rows)
        assert sum(1 for r in rows if not r.is_dup) == 1
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       prev)
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_dependency_closure_flat_graph_releases_caches(spark):
    """A graph with no 2-hop paths must release its caches too."""
    from axonops_schema_registry_spark.operators.graph import (
        dependency_closure,
    )

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    edges = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", "z")],
        "subject string, ref_subject string")
    out = dependency_closure(edges, "subject", "ref_subject")
    assert out.count() == 3
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, (before, after)


def test_syslog_ts_interprets_os_local_timezone():
    """collect() hands the sink NAIVE datetimes in the DRIVER's OS
    timezone (TimestampType.fromInternal), so the header conversion
    must use the OS zone — pinned by flipping TZ mid-test."""
    import datetime
    import os
    import time as _time

    from axonops_schema_registry_spark.streaming.audit import SyslogTcpSink

    naive = datetime.datetime(2024, 3, 5, 7, 0, 0)
    prev = os.environ.get("TZ")
    try:
        os.environ["TZ"] = "UTC"
        _time.tzset()
        assert SyslogTcpSink._rfc5424_ts(naive) == "2024-03-05T07:00:00Z"
        os.environ["TZ"] = "America/New_York"
        _time.tzset()
        assert SyslogTcpSink._rfc5424_ts(naive) == "2024-03-05T12:00:00Z"
    finally:
        if prev is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = prev
        _time.tzset()
