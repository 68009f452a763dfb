"""Regression tests for the round-1 advisory findings (ADVICE.md r1):

1. Avro union-branch trials polluted the shared ``visited`` recursion
   guard → false-COMPATIBLE on a later genuine comparison of the pair.
2. Protobuf recursion into self-referential messages blew the stack →
   legal recursive schemas judged 'schema parse error'.
3. Avro enum renames passed (reference reports enum name mismatch,
   checker.go:182-190).
4. register_batch never checked two same-subject candidates of one batch
   against each other (the reference's write path is sequential).
5. check_pair's JSON branch called dict() on a tuple of ref texts →
   cross-subject JSON refs always masked as 'schema parse error'.
"""

from __future__ import annotations

import json

from axonops_schema_registry_spark.registry.compat import check_pair
from axonops_schema_registry_spark.registry.compat.avro_check import check_avro
from axonops_schema_registry_spark.registry.compat.protobuf_check import (
    check_protobuf,
)

# ---------------------------------------------------------------------------
# 1. union-branch trials must not pollute the recursion guard
# ---------------------------------------------------------------------------

_R_V1 = {"type": "record", "name": "R",
         "fields": [{"name": "x", "type": "string"}]}
_R_V2_NODEFAULT = {"type": "record", "name": "R",
                   "fields": [{"name": "x", "type": "string"},
                              {"name": "y", "type": "string"}]}
_B_ALIASES_R = {"type": "record", "name": "B", "aliases": ["R"],
                "fields": [{"name": "x", "type": "string"}]}


def test_union_trial_does_not_mask_later_comparison():
    """Field `a`: reader union [R(incompat), B aliases R(compat)] — the
    failed R-branch trial must not record (R, R) as visited, or field
    `b`'s genuine R-vs-R comparison silently passes."""
    writer = json.dumps({
        "type": "record", "name": "Top",
        "fields": [{"name": "a", "type": _R_V1}, {"name": "b", "type": "R"}]})
    reader = json.dumps({
        "type": "record", "name": "Top",
        "fields": [{"name": "a", "type": [_R_V2_NODEFAULT, _B_ALIASES_R]},
                   {"name": "b", "type": "R"}]})
    issues = check_avro(reader, writer)
    assert any("b" in i and "no default" in i for i in issues), issues


def test_direct_comparison_still_reports():
    issues = check_avro(json.dumps(_R_V2_NODEFAULT), json.dumps(_R_V1))
    assert any("no default" in i for i in issues)


# ---------------------------------------------------------------------------
# 2. recursive protobuf messages terminate
# ---------------------------------------------------------------------------

_PROTO_NODE = ('syntax = "proto3";\n'
               'message Node {\n  Node next = 1;\n  string v = 2;\n}\n')
_PROTO_NODE_RETYPED = ('syntax = "proto3";\n'
                       'message Node {\n  Node next = 1;\n  int32 v = 2;\n}\n')


def test_recursive_protobuf_compatible():
    assert check_protobuf(_PROTO_NODE, _PROTO_NODE) == []


def test_recursive_protobuf_detects_real_issue():
    issues = check_protobuf(_PROTO_NODE_RETYPED, _PROTO_NODE)
    assert any("wire type changed" in i for i in issues), issues


def test_recursive_protobuf_via_check_pair_not_parse_error():
    issues = check_pair(_PROTO_NODE, _PROTO_NODE, "PROTOBUF")
    assert issues == []


# ---------------------------------------------------------------------------
# 3. enum name mismatch (alias escape)
# ---------------------------------------------------------------------------

def _enum(name, symbols, aliases=None):
    e = {"type": "enum", "name": name, "symbols": symbols}
    if aliases:
        e["aliases"] = aliases
    return json.dumps(e)


def test_enum_rename_without_alias_flagged():
    issues = check_avro(_enum("Color2", ["RED", "BLUE"]),
                        _enum("Color", ["RED", "BLUE"]))
    assert any("enum name mismatch" in i for i in issues), issues


def test_enum_rename_with_alias_passes():
    assert check_avro(_enum("Color2", ["RED", "BLUE"], aliases=["Color"]),
                      _enum("Color", ["RED", "BLUE"])) == []


def test_enum_same_name_symbol_rules_unchanged():
    issues = check_avro(_enum("Color", ["RED"]),
                        _enum("Color", ["RED", "BLUE"]))
    assert any("missing from" in i for i in issues)


# ---------------------------------------------------------------------------
# 4. intra-batch sequential gate
# ---------------------------------------------------------------------------

_A = json.dumps({"type": "record", "name": "S",
                 "fields": [{"name": "x", "type": "string"}]})
# incompatible as reader of _A: adds a defaultless field
_B_BAD = json.dumps({"type": "record", "name": "S",
                     "fields": [{"name": "x", "type": "string"},
                                {"name": "z", "type": "string"}]})
# compatible with _A (default) — and with history [_A] only
_C_OK = json.dumps({"type": "record", "name": "S",
                    "fields": [{"name": "x", "type": "string"},
                               {"name": "w", "type": "string",
                                "default": ""}]})


def _run_batch(spark, rows, mode="BACKWARD"):
    from axonops_schema_registry_spark.registry.registration import (
        register_batch,
    )

    existing = spark.createDataFrame(
        [], "subject string, version int, schema_type string, "
            "schema_text string")
    incoming = spark.createDataFrame(
        rows, "subject string, seq int, schema_type string, "
              "schema_text string")
    out = register_batch(spark, existing, incoming, mode=mode)
    return {r["seq"]: (r["status"], r["assigned_version"])
            for r in out.collect()}


def test_intra_batch_incompatibility_rejected(spark):
    """[A, B-incompatible-with-A] in ONE batch on a fresh subject: the
    sequential server would reject B; the join-only gate registered both."""
    got = _run_batch(spark, [("s", 1, "AVRO", _A), ("s", 2, "AVRO", _B_BAD)])
    assert got[1] == ("registered", 1)
    assert got[2][0] == "incompatible"


def test_intra_batch_rejected_does_not_join_history(spark):
    """Cascade: [A, B-bad, C-ok-vs-A]. B is rejected so C is checked
    against latest ACCEPTED (= A), not against B — C registers as v2."""
    got = _run_batch(spark, [("s", 1, "AVRO", _A),
                             ("s", 2, "AVRO", _B_BAD),
                             ("s", 3, "AVRO", _C_OK)])
    assert got[1] == ("registered", 1)
    assert got[2][0] == "incompatible"
    assert got[3] == ("registered", 2)


def test_intra_batch_duplicate_of_accepted_is_duplicate(spark):
    got = _run_batch(spark, [("s", 1, "AVRO", _A), ("s", 2, "AVRO", _A)])
    assert got[1] == ("registered", 1)
    assert got[2] == ("duplicate", None)


def test_intra_batch_duplicate_of_rejected_is_rechecked(spark):
    """A copy of a REJECTED candidate is not a duplicate — the server
    would re-run the check and reject it again."""
    got = _run_batch(spark, [("s", 1, "AVRO", _A),
                             ("s", 2, "AVRO", _B_BAD),
                             ("s", 3, "AVRO", _B_BAD)])
    assert got[2][0] == "incompatible"
    assert got[3][0] == "incompatible"


# ---------------------------------------------------------------------------
# 5. JSON cross-subject refs through the tuple-of-texts (UDF) shape
# ---------------------------------------------------------------------------

_JSON_MAIN = json.dumps({
    "type": "object",
    "properties": {"addr": {"$ref": "common.json"}}})
_JSON_REF_WIDE = json.dumps({
    "$id": "common.json", "type": "object",
    "properties": {"street": {"type": "string"}}})
_JSON_REF_NARROW = json.dumps({
    "$id": "common.json", "type": "object",
    "properties": {"street": {"type": "string", "maxLength": 5}}})


def test_json_refs_tuple_shape_resolves():
    issues = check_pair(_JSON_MAIN, _JSON_MAIN, "JSON",
                        (_JSON_REF_WIDE,), (_JSON_REF_WIDE,))
    assert issues == []
    assert not any("schema parse error" in i for i in issues)


def test_json_refs_tuple_shape_detects_narrowing():
    issues = check_pair(_JSON_MAIN, _JSON_MAIN, "JSON",
                        (_JSON_REF_NARROW,), (_JSON_REF_WIDE,))
    assert issues and not any("schema parse error" in i for i in issues)


def test_json_refs_mapping_shape_still_works():
    issues = check_pair(_JSON_MAIN, _JSON_MAIN, "JSON",
                        {"common.json": _JSON_REF_WIDE},
                        {"common.json": _JSON_REF_WIDE})
    assert issues == []


# ---------------------------------------------------------------------------
# as-of join operator edges (operators/core.py as_of_join)
# ---------------------------------------------------------------------------

def test_as_of_join_edges(spark):
    from axonops_schema_registry_spark.operators.core import as_of_join

    lefts = spark.createDataFrame(
        [("k", 5, 1), ("k", 10, 2), ("k", 4, 3), ("other", 7, 4)],
        "key string, lts int, lid int")
    rights = spark.createDataFrame(
        [("k", 5, "at5"), ("k", 9, "at9")],
        "key string, rts int, v string")
    out = {r["lid"]: (r["v"], r["asof_ts"])
           for r in as_of_join(lefts, rights, "key", "lts", "rts",
                               ["v"]).collect()}
    assert out[1] == ("at5", 5)     # tie: same-ts snapshot IS visible
    assert out[2] == ("at9", 9)     # latest prior wins
    assert out[3] == (None, None)   # before any snapshot → NULL
    assert out[4] == (None, None)   # key with no snapshots at all


def test_as_of_join_null_column_not_inherited(spark):
    """A snapshot with a legitimately-NULL value column must NOT inherit
    that column from an older snapshot (per-column last(ignorenulls)
    would mix two snapshots; the struct carry keeps them atomic)."""
    from axonops_schema_registry_spark.operators.core import as_of_join

    lefts = spark.createDataFrame(
        [("k", 10, 1)], "key string, lts int, lid int")
    rights = spark.createDataFrame(
        [("k", 5, "old-a", "old-b"), ("k", 9, "new-a", None)],
        "key string, rts int, a string, b string")
    row = as_of_join(lefts, rights, "key", "lts", "rts",
                     ["a", "b"]).collect()[0]
    assert row["a"] == "new-a"
    assert row["b"] is None           # NOT "old-b"
    assert row["asof_ts"] == 9


def test_range_join_subsecond_interval_end(spark):
    """An interval ending fractionally past a bucket boundary must still
    cover that bucket (unix_timestamp() truncation dropped it)."""
    import datetime

    from axonops_schema_registry_spark.operators.core import (
        range_join_bucketed,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    # interval [23:59:00, 1d+00:00:00.5): spans bucket 0 AND bucket 1
    iv = spark.createDataFrame(
        [("iv1",
          base + datetime.timedelta(hours=23, minutes=59),
          base + datetime.timedelta(days=1, microseconds=500_000))],
        "iv_id string, s timestamp, e timestamp")
    events = spark.createDataFrame(
        [("in_last_bucket", base + datetime.timedelta(
            days=1, microseconds=200_000)),
         ("past_end", base + datetime.timedelta(days=1, seconds=1))],
        "ev string, ts timestamp")
    got = {r["ev"] for r in range_join_bucketed(
        events, "ts", iv, "s", "e", bucket_seconds=86400).collect()}
    assert got == {"in_last_bucket"}


# ---------------------------------------------------------------------------
# DEK lifecycle state machine (queries/registry_queries.py dek_fold_state —
# mirror of /root/reference/internal/storage/memory/store.go:1915-2030)
# ---------------------------------------------------------------------------

def test_dek_fold_transition_table():
    from axonops_schema_registry_spark.queries.registry_queries import (
        dek_fold_state,
    )

    # happy lifecycle: create → soft → undelete → soft → permanent
    assert dek_fold_state(
        ["create", "soft_delete", "undelete", "soft_delete",
         "permanent_delete"]) == ("absent", 0)
    # recreate after purge is allowed
    assert dek_fold_state(
        ["create", "permanent_delete", "create"]) == ("live", 0)
    # create on an existing (even soft-deleted) key is ErrDEKExists and
    # must NOT resurrect or refresh it
    assert dek_fold_state(
        ["create", "soft_delete", "create"]) == ("deleted", 1)
    assert dek_fold_state(["create", "create"]) == ("live", 1)
    # undelete of a live or absent key is ErrDEKNotFound
    assert dek_fold_state(["create", "undelete"]) == ("live", 1)
    assert dek_fold_state(["undelete"]) == ("absent", 1)
    # soft delete of an absent key is ErrDEKNotFound; of an already
    # soft-deleted key is an accepted no-op (store re-sets the flag)
    assert dek_fold_state(["soft_delete"]) == ("absent", 1)
    assert dek_fold_state(
        ["create", "soft_delete", "soft_delete"]) == ("deleted", 0)
    # permanent delete works from live AND deleted, errors from absent
    assert dek_fold_state(["create", "permanent_delete"]) == ("absent", 0)
    assert dek_fold_state(["permanent_delete"]) == ("absent", 1)
