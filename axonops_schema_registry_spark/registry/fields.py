"""Unified field extraction: (schema_text, schema_type) → FieldInfo rows.

The reference extracts fields per schema for ALL analysis endpoints
(/root/reference/internal/analysis/fields.go:28-242: Avro recursive walk
with []/{} path marks, JSON Schema properties walk, Protobuf parse).
Here the extraction runs ONCE per schema into an exploded ``fields``
DataFrame that every downstream operator (search, similarity, quality,
statistics) reuses — eliminating the reference's O(subjects) re-extraction
loops (analysis.go:157-264).
"""

from __future__ import annotations

import json
from typing import Any

from axonops_schema_registry_spark.registry.avro import avro_extract_fields
from axonops_schema_registry_spark.registry.protobuf_parse import parse_proto

#: Spark-side schema of one extracted field.
FIELD_INFO_DDL = ("name string, path string, type string, required boolean, "
                  "has_default boolean, doc string")


def jsonschema_extract_fields(schema_text: str) -> list[dict[str, Any]]:
    schema = json.loads(schema_text)
    out: list[dict[str, Any]] = []

    def walk(node: Any, prefix: str, depth: int = 0) -> None:
        if not isinstance(node, dict) or depth > 32:
            return
        required = set(node.get("required", []))
        for name, sub in node.get("properties", {}).items():
            path = f"{prefix}.{name}" if prefix else name
            stype = sub.get("type", "object") if isinstance(sub, dict) else "any"
            if isinstance(stype, list):
                stype = "union[" + ",".join(stype) + "]"
            out.append({
                "name": name,
                "path": path,
                "type": stype,
                "required": name in required,
                "has_default": isinstance(sub, dict) and "default" in sub,
                "doc": sub.get("description") if isinstance(sub, dict) else None,
            })
            if isinstance(sub, dict):
                if stype == "object" or "properties" in sub:
                    walk(sub, path, depth + 1)
                elif stype == "array" and isinstance(sub.get("items"), dict):
                    walk(sub["items"], path + "[]", depth + 1)

    walk(schema, "")
    return out


def protobuf_extract_fields(schema_text: str) -> list[dict[str, Any]]:
    pf = parse_proto(schema_text)
    out: list[dict[str, Any]] = []

    def walk(msg, prefix: str) -> None:
        for num in sorted(msg.fields):
            f = msg.fields[num]
            path = f"{prefix}.{f.name}" if prefix else f.name
            ftype = (f"map<{f.map_key},{f.map_value}>" if f.label == "map"
                     else f.type)
            out.append({
                "name": f.name,
                "path": path,
                "type": ftype,
                "required": f.label == "required",
                "has_default": False,
                "doc": None,
            })
            sub = msg.messages.get(f.type.split(".")[-1])
            if sub is not None:
                walk(sub, path)
        for sub in msg.messages.values():
            pass  # nested types reached via fields only (matches reference)

    for msg in pf.messages.values():
        walk(msg, "")
    return out


def extract_fields(schema_text: str,
                   schema_type: str = "AVRO") -> list[dict[str, Any]]:
    st = (schema_type or "AVRO").upper()
    try:
        if st == "AVRO":
            return avro_extract_fields(schema_text)
        if st == "JSON":
            return jsonschema_extract_fields(schema_text)
        if st == "PROTOBUF":
            return protobuf_extract_fields(schema_text)
    except Exception:
        return []
    return []
