"""DEK rewrap-on-KEK-rotation as a batch transform.

Re-expresses ``RewrapDEK`` (/root/reference/internal/registry/
registry_dek.go:131-179): after a KEK rotates to a new key version,
every DEK wrapped under an older version gets its key material
re-encrypted under the current version.  The reference does this one
DEK per request (KMS unwrap → wrap → update); at fleet scale the same
operation is one broadcast join + a conditional column rewrite over the
whole DEK table.

The wrap function here is a DETERMINISTIC STAND-IN for the KMS
provider's Wrap call (sha256 over kms_key_id : key_version : material)
— no crypto/KMS libraries exist in this environment; the join shape,
rotation predicate, and versioned-material bookkeeping are the real
operator.  Everything stays JVM-side (sha2/concat), no Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _wrap(version: Column) -> Column:
    return F.sha2(F.concat_ws(":", F.col("kms_key_id"),
                              version.cast("string"),
                              F.col("key_material")), 256)


def rewrap_deks(deks: DataFrame, keks: DataFrame) -> DataFrame:
    """Rewrap every DEK whose material is wrapped under an older KEK key
    version.

    ``deks``: (kek_name, subject, dek_version, key_material,
    wrapped_with_version) — ``key_material`` is the generation input the
    wrap stand-in derives ciphertext from.  ``keks``: (kek_name,
    kms_key_id, key_version) with ``key_version`` already rotated.

    Returns every DEK with ``action`` ∈ {rewrapped, current},
    the old and new wrapped material, and the version it is now wrapped
    under.  KEK side is configuration-sized → broadcast.
    """
    k = keks.select("kek_name", "kms_key_id",
                    F.col("key_version").alias("kek_key_version"))
    j = deks.join(F.broadcast(k), "kek_name")
    needs = F.col("wrapped_with_version") < F.col("kek_key_version")
    old_wrapped = _wrap(F.col("wrapped_with_version"))
    new_wrapped = _wrap(F.col("kek_key_version"))
    return j.select(
        "kek_name", "subject", "dek_version",
        F.when(needs, F.lit("rewrapped")).otherwise("current")
        .alias("action"),
        old_wrapped.alias("old_encrypted_key_material"),
        F.when(needs, new_wrapped).otherwise(old_wrapped)
        .alias("encrypted_key_material"),
        F.when(needs, F.col("kek_key_version"))
        .otherwise(F.col("wrapped_with_version"))
        .alias("wrapped_with_version"))
