"""Avro schema handling: Parsing Canonical Form, fingerprints, field
extraction.

Re-implements (from the public Avro specification, not by translation) the
behaviors the reference exposes:

- Parsing Canonical Form + SHA-256 fingerprint
  (reference: /root/reference/internal/schema/avro/parser.go:62-64,139-312)
- recursive field extraction into FieldInfo rows
  (reference: /root/reference/internal/analysis/fields.go:28-123)

Canonical form follows the Avro spec's "Parsing Canonical Form":
[STRIP] keep only type, name, fields, symbols, items, values, size;
[ORDER] emit those keys in that order; [FULLNAMES] replace short names +
namespace with fullnames; [PRIMITIVES] collapse {"type":"x"} to "x";
[STRINGS] minimal JSON, no whitespace.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes",
              "string"}
NAMED_TYPES = {"record", "enum", "fixed", "error"}

#: Avro spec "Parsing Canonical Form" [ORDER] key order.
_FIELD_ORDER = ("name", "type", "fields", "symbols", "items", "values", "size")


def _fullname(name: str, namespace: str | None) -> str:
    if "." in name or not namespace:
        return name
    return f"{namespace}.{name}"


def _canon(schema: Any, namespace: str | None,
           known: set[str]) -> Any:
    """Recursively build the canonical JSON value."""
    if isinstance(schema, str):
        if schema in PRIMITIVES:
            return schema
        return _fullname(schema, namespace)
    if isinstance(schema, list):  # union
        return [_canon(s, namespace, known) for s in schema]
    if not isinstance(schema, dict):
        raise ValueError(f"invalid avro schema node: {schema!r}")

    t = schema.get("type")
    if t in PRIMITIVES:
        # primitive object form (possibly with logicalType etc.) → bare name;
        # PCF strips every attribute of a primitive besides the type itself.
        return t
    if t == "array":
        return {"type": "array",
                "items": _canon(schema["items"], namespace, known)}
    if t == "map":
        return {"type": "map",
                "values": _canon(schema["values"], namespace, known)}
    if t in NAMED_TYPES:
        ns = schema.get("namespace", namespace)
        name = _fullname(schema["name"], ns)
        out: dict[str, Any] = {"name": name, "type": t}
        if t == "record" or t == "error":
            out["type"] = "record" if t == "record" else "error"
            fields = []
            for f in schema.get("fields", []):
                fields.append({
                    "name": f["name"],
                    "type": _canon(f["type"],
                                   name.rsplit(".", 1)[0] if "." in name else ns,
                                   known),
                })
            out["fields"] = fields
        elif t == "enum":
            out["symbols"] = list(schema["symbols"])
        elif t == "fixed":
            out["size"] = int(schema["size"])
        known.add(name)
        return out
    if isinstance(t, (dict, list)):
        return _canon(t, namespace, known)
    if isinstance(t, str):
        # e.g. {"type": "some.Named", ...}
        return _canon(t, namespace, known)
    raise ValueError(f"unsupported avro schema: {schema!r}")


def _order_keys(node: Any) -> Any:
    if isinstance(node, dict):
        return {k: _order_keys(node[k]) for k in _FIELD_ORDER if k in node}
    if isinstance(node, list):
        return [_order_keys(v) for v in node]
    return node


def avro_canonical_form(schema_text: str) -> str:
    """Avro Parsing Canonical Form of a schema document."""
    schema = json.loads(schema_text)
    canon = _order_keys(_canon(schema, None, set()))
    return json.dumps(canon, separators=(",", ":"), ensure_ascii=False)


def avro_fingerprint(schema_text: str) -> str:
    """SHA-256 hex fingerprint over the Parsing Canonical Form
    (reference: internal/schema/avro/parser.go:62-64)."""
    return hashlib.sha256(
        avro_canonical_form(schema_text).encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# Field extraction (FieldInfo rows — internal/analysis/fields.go:18-123)
# ---------------------------------------------------------------------------

def _type_name(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union[" + ",".join(_type_name(s) for s in schema) + "]"
    t = schema.get("type")
    if t in ("record", "enum", "fixed", "error", "array", "map"):
        return t
    if isinstance(t, (dict, list)):
        return _type_name(t)
    return str(t)


def _is_optional_union(schema: Any) -> bool:
    return (isinstance(schema, list)
            and any(s == "null" or (isinstance(s, dict)
                                    and s.get("type") == "null")
                    for s in schema))


def avro_extract_fields(schema_text: str) -> list[dict[str, Any]]:
    """Flatten an Avro schema into FieldInfo dicts:
    (name, path, type, required, has_default, doc).

    Paths use ``.`` for nesting, ``[]`` for array items and ``{}`` for map
    values (reference: internal/analysis/fields.go:84-86).
    """
    schema = json.loads(schema_text)
    out: list[dict[str, Any]] = []
    seen: set[str] = set()

    def walk(node: Any, prefix: str) -> None:
        if isinstance(node, str):
            return
        if isinstance(node, list):
            for s in node:
                walk(s, prefix)
            return
        if not isinstance(node, dict):
            return
        t = node.get("type")
        if t == "record" or t == "error":
            rec_name = node.get("name", "")
            if rec_name in seen:
                return  # recursive type guard
            seen.add(rec_name)
            for f in node.get("fields", []):
                path = f"{prefix}.{f['name']}" if prefix else f["name"]
                ftype = f["type"]
                out.append({
                    "name": f["name"],
                    "path": path,
                    "type": _type_name(ftype),
                    "required": not _is_optional_union(ftype),
                    "has_default": "default" in f,
                    "doc": f.get("doc"),
                })
                walk(ftype, path)
        elif t == "array":
            walk(node.get("items"), prefix + "[]")
        elif t == "map":
            walk(node.get("values"), prefix + "{}")
        elif isinstance(t, (dict, list)):
            walk(t, prefix)

    walk(schema, "")
    return out
