"""DEK rewrap-on-rotation lifecycle (RewrapDEK,
registry_dek.go:131-179)."""

from __future__ import annotations

from axonops_schema_registry_spark.registry.dek import rewrap_deks


def _fixture(spark, kek_version):
    deks = spark.createDataFrame(
        [("kek-a", "s1", 1, "m1", 1), ("kek-a", "s2", 1, "m2", 1),
         ("kek-b", "s3", 1, "m3", 1)],
        "kek_name string, subject string, dek_version int, "
        "key_material string, wrapped_with_version int")
    keks = spark.createDataFrame(
        [("kek-a", "kms-a", kek_version), ("kek-b", "kms-b", 1)],
        "kek_name string, kms_key_id string, key_version int")
    return deks, keks


def test_rotation_rewraps_only_stale_deks(spark):
    deks, keks = _fixture(spark, kek_version=2)
    rows = {(r["kek_name"], r["subject"]): r
            for r in rewrap_deks(deks, keks).collect()}
    a1, a2 = rows[("kek-a", "s1")], rows[("kek-a", "s2")]
    b = rows[("kek-b", "s3")]
    assert a1["action"] == a2["action"] == "rewrapped"
    assert b["action"] == "current"
    # rewrapped material changes, version advances; untouched KEK's DEK
    # keeps its bytes and version
    assert a1["encrypted_key_material"] != a1["old_encrypted_key_material"]
    assert a1["wrapped_with_version"] == 2
    assert b["encrypted_key_material"] == b["old_encrypted_key_material"]
    assert b["wrapped_with_version"] == 1


def test_rewrap_is_idempotent(spark):
    """Running the rewrap again with the already-advanced version makes
    no further changes (the reference's UpdateDEK converges)."""
    deks, keks = _fixture(spark, kek_version=2)
    first = rewrap_deks(deks, keks)
    again_input = first.select(
        "kek_name", "subject", "dek_version",
        # carry forward: material input unchanged, version advanced
        first["wrapped_with_version"].alias("wrapped_with_version"))
    deks2 = (deks.drop("wrapped_with_version")
             .join(again_input.select("kek_name", "subject",
                                      "wrapped_with_version"),
                   ["kek_name", "subject"]))
    out2 = rewrap_deks(deks2, keks)
    assert {r["action"] for r in out2.collect()} == {"current"}


def test_distinct_material_per_dek(spark):
    deks, keks = _fixture(spark, kek_version=2)
    out = rewrap_deks(deks, keks).collect()
    mats = [r["encrypted_key_material"] for r in out]
    assert len(mats) == len(set(mats))
