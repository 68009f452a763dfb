"""Compatibility checking engine (SURVEY.md §2.9).

Re-implements the reference's 7-mode compatibility orchestration
(/root/reference/internal/compatibility/checker.go:39-92,
modes.go:7-71) over pluggable per-language checkers:

- BACKWARD  : new schema can READ data written by old  → check(new=reader, old=writer)
- FORWARD   : old schema can read data written by new  → check(old=reader, new=writer)
- FULL      : both directions
- *_TRANSITIVE : against every prior version, not just the latest
- NONE      : always compatible (short-circuit)

``check_pair(reader, writer, schema_type)`` is the pure pairwise function;
``check_compatibility(new, olds, mode, schema_type)`` orchestrates
direction(s) × history scope and returns (is_compatible, messages).
"""

from __future__ import annotations

import json
from collections.abc import Mapping, Sequence

from axonops_schema_registry_spark.registry.compat.avro_check import check_avro
from axonops_schema_registry_spark.registry.compat.jsonschema_check import (
    check_jsonschema,
)
from axonops_schema_registry_spark.registry.compat.protobuf_check import (
    check_protobuf,
)

MODES = ("NONE", "BACKWARD", "BACKWARD_TRANSITIVE", "FORWARD",
         "FORWARD_TRANSITIVE", "FULL", "FULL_TRANSITIVE")

_CHECKERS = {
    "AVRO": check_avro,
    "JSON": check_jsonschema,
    "PROTOBUF": check_protobuf,
}


def _refs_as_texts(refs) -> tuple[str, ...]:
    """Normalize either refs shape to a sequence of schema texts (Avro)."""
    if isinstance(refs, Mapping):
        return tuple(refs.values())
    return tuple(refs)


def _refs_as_mapping(refs) -> dict[str, str]:
    """Normalize either refs shape to a $ref-name → schema-text mapping
    (JSON).  A bare sequence of texts (the shape the Spark UDF ships) is
    keyed by each schema's ``$id``/``title`` so cross-subject ``$ref``
    strings resolve; previously ``dict(tuple_of_texts)`` raised and was
    masked as 'schema parse error'."""
    if isinstance(refs, Mapping):
        return dict(refs)
    out: dict[str, str] = {}
    for i, text in enumerate(refs):
        name = None
        try:
            doc = json.loads(text)
            if isinstance(doc, dict):
                name = doc.get("$id") or doc.get("title")
        except (TypeError, ValueError):
            pass
        out[str(name) if name else f"#ref{i}"] = text
    return out


def check_pair(reader: str, writer: str, schema_type: str = "AVRO",
               reader_refs: Sequence[str] | Mapping[str, str] = (),
               writer_refs: Sequence[str] | Mapping[str, str] = ()) -> list[str]:
    """Can ``reader`` read data written with ``writer``?  Empty list = yes.

    ``*_refs`` carry the schema texts of referenced subjects (resolved by
    the caller from the schema_references table), so named types / $refs
    across subjects resolve before checking.  Either shape is accepted for
    any type: a sequence of texts or a {ref_name: text} mapping.
    """
    checker = _CHECKERS.get(schema_type or "AVRO")
    if checker is None:
        return [f"unsupported schema type: {schema_type}"]
    try:
        if reader_refs or writer_refs:
            st = (schema_type or "AVRO").upper()
            if st == "AVRO":
                return check_avro(reader, writer,
                                  _refs_as_texts(reader_refs),
                                  _refs_as_texts(writer_refs))
            if st == "JSON":
                return check_jsonschema(reader, writer,
                                        _refs_as_mapping(reader_refs),
                                        _refs_as_mapping(writer_refs))
        return checker(reader, writer)
    except Exception as exc:  # malformed schema text
        return [f"schema parse error: {exc}"]


def _is_transitive(mode: str) -> bool:
    return mode.endswith("_TRANSITIVE")


def check_compatibility(new_schema: str, old_schemas: Sequence[str],
                        mode: str, schema_type: str = "AVRO",
                        ) -> tuple[bool, list[str]]:
    """Orchestrate mode × history-scope (checker.go:39-92).

    ``old_schemas`` must be ordered oldest → newest; latest-only modes use
    just the last entry, transitive modes use all.
    """
    mode = (mode or "BACKWARD").upper()
    if mode not in MODES:
        return False, [f"unknown compatibility mode: {mode}"]
    if mode == "NONE" or not old_schemas:
        return True, []
    scope = list(old_schemas) if _is_transitive(mode) else [old_schemas[-1]]
    base = mode.replace("_TRANSITIVE", "")
    messages: list[str] = []
    for old in scope:
        if base in ("BACKWARD", "FULL"):
            messages += [f"backward: {m}"
                         for m in check_pair(new_schema, old, schema_type)]
        if base in ("FORWARD", "FULL"):
            messages += [f"forward: {m}"
                         for m in check_pair(old, new_schema, schema_type)]
    return not messages, messages
