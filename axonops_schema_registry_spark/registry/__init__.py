"""Registry domain library: schema parsing, canonicalization, fingerprints,
field extraction, compatibility checking, and the registration pipeline.

Pure-Python (unit-testable) cores, surfaced to Spark as Arrow-batched
pandas UDFs — the reference's pluggable Parser / SchemaChecker strategy
registries (/root/reference/internal/schema/types.go:9-45,
/root/reference/internal/compatibility/checker.go:14-34) re-expressed as a
type → implementation dispatch in Python.
"""

from axonops_schema_registry_spark.registry.avro import (  # noqa: F401
    avro_canonical_form,
    avro_extract_fields,
    avro_fingerprint,
)
from axonops_schema_registry_spark.registry.compat import (  # noqa: F401
    check_compatibility,
    check_pair,
)
