"""Avro schema handling: Parsing Canonical Form, fingerprints, field
extraction.

Re-implements (from the public Avro specification, not by translation) the
behaviors the reference exposes:

- Parsing Canonical Form + SHA-256 fingerprint
  (reference: /root/reference/internal/schema/avro/parser.go:62-64,139-312)
- recursive field extraction into FieldInfo rows
  (reference: /root/reference/internal/analysis/fields.go:28-123)

Canonical form mirrors the REFERENCE's canonicalization
(parser.go:141-312), which deliberately deviates from the strict Avro
"Parsing Canonical Form" in three ways (confirmed by
modeling_avro_conformance.feature):

- record FIELD defaults are KEPT (so two schemas differing only in a
  default get different fingerprints/ids);
- primitive object forms keep their extra attributes ({"type":"int",
  "logicalType":"date"} is not collapsed to "int");
- bare named-type REFERENCES are emitted as-is (only definitions are
  namespace-qualified, with Avro nested-namespace inheritance).

doc / aliases / order (and object-level default) are stripped; named
definitions emit fully-qualified names with the separate "namespace"
key dropped; minimal JSON, no whitespace.
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


def _marshal(v: Any) -> str:
    """Go json.Marshal-equivalent for scalar/JSON values: sorted map
    keys, no spaces, integral floats printed as integers."""
    if isinstance(v, float) and v.is_integer():
        v = int(v)
    if isinstance(v, dict):
        return ("{" + ",".join(f'{_marshal(k)}:{_marshal(x)}'
                               for k, x in sorted(v.items())) + "}")
    if isinstance(v, list):
        return "[" + ",".join(_marshal(x) for x in v) + "]"
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False)


#: keys stripped from canonical objects (parser.go isNonCanonicalField);
#: field-level defaults are re-added by _canon_field
_NON_CANONICAL = {"doc", "aliases", "default", "order"}

#: key order per schema type (parser.go:211-230); "namespace" is absent
#: from every named-type order, which is how it gets dropped
_KEY_ORDER = {
    "record": ("name", "type", "fields"),
    "error": ("name", "type", "fields"),
    "enum": ("name", "type", "symbols"),
    "array": ("type", "items"),
    "map": ("type", "values"),
    "fixed": ("name", "type", "size"),
}


def _canon_value(v: Any, parent_ns: str) -> str:
    if isinstance(v, str):
        # primitive or named-type REFERENCE — emitted verbatim
        return f'"{v}"'
    if isinstance(v, list):  # union
        return "[" + ",".join(_canon_value(x, parent_ns) for x in v) + "]"
    if isinstance(v, dict):
        return _canon_object(v, parent_ns)
    return _marshal(v)


def _canon_field(field: dict, parent_ns: str) -> str:
    # field key order: name, type, default — the default is KEPT so
    # schemas differing only in defaults fingerprint differently
    parts = []
    if "name" in field:
        parts.append(f'"name":"{field["name"]}"')
    if "type" in field:
        parts.append(f'"type":{_canon_value(field["type"], parent_ns)}')
    if "default" in field:
        parts.append(f'"default":{_marshal(field["default"])}')
    return "{" + ",".join(parts) + "}"


def _canon_object(obj: dict, parent_ns: str) -> str:
    t = obj.get("type") if isinstance(obj.get("type"), str) else ""
    resolved_ns = parent_ns
    obj = dict(obj)
    if t in NAMED_TYPES:
        name = obj.get("name", "")
        explicit = obj.get("namespace")
        if isinstance(explicit, str) and explicit:
            resolved_ns = explicit
        if isinstance(name, str) and "." not in name and resolved_ns:
            obj["name"] = f"{resolved_ns}.{name}"
    order = _KEY_ORDER.get(t) or tuple(sorted(obj))
    parts = []
    for key in order:
        if key not in obj or key in _NON_CANONICAL:
            continue
        val = obj[key]
        if key == "fields" and isinstance(val, list):
            s = "[" + ",".join(
                _canon_field(f, resolved_ns) for f in val
                if isinstance(f, dict)) + "]"
        elif key == "symbols" and isinstance(val, list):
            s = "[" + ",".join(f'"{x}"' for x in val) + "]"
        else:
            s = _canon_value(val, resolved_ns)
        if s:
            parts.append(f'"{key}":{s}')
    return "{" + ",".join(parts) + "}"


def avro_canonical_form(schema_text: str) -> str:
    """Reference-parity canonical form (parser.go:141-312) — see the
    module docstring for the deliberate deviations from strict PCF."""
    try:
        obj = json.loads(schema_text)
    except ValueError:
        return schema_text.strip()
    return _canon_value(obj, "")


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


# ---------------------------------------------------------------------------
# structural validation (the parse-time checks the reference's 422 path runs)
# ---------------------------------------------------------------------------

def _default_matches(value: Any, ftype: Any, symbols_of: dict) -> bool:
    """Spec: a field default is validated against the FIRST union branch."""
    if isinstance(ftype, list):
        return _default_matches(value, ftype[0] if ftype else None,
                                symbols_of)
    if isinstance(ftype, dict):
        t = ftype.get("type")
        if t == "enum":
            return isinstance(value, str) and \
                value in ftype.get("symbols", [])
        if t == "array":
            return isinstance(value, list)
        if t == "map":
            return isinstance(value, dict)
        if t in ("record", "error"):
            return isinstance(value, dict)
        if t == "fixed":
            return isinstance(value, str)
        ftype = t
    if isinstance(ftype, str):
        if ftype == "null":
            return value is None
        if ftype == "boolean":
            return isinstance(value, bool)
        if ftype in ("int", "long"):
            return isinstance(value, int) and not isinstance(value, bool)
        if ftype in ("float", "double"):
            return isinstance(value, (int, float)) \
                and not isinstance(value, bool)
        if ftype in ("string", "bytes"):
            return isinstance(value, str)
        if ftype in symbols_of:  # named enum reference
            return isinstance(value, str) and value in symbols_of[ftype]
        return True  # named record/fixed reference: accept shallowly
    return True


def avro_validate(schema_text: str,
                  defined_extra: set[str] | frozenset[str] = frozenset(),
                  ) -> None:
    """Raise ValueError for schemas the reference's parser rejects with
    INVALID_SCHEMA (42201): unknown type names, duplicate field names,
    defaults that don't type-check, empty enums, non-positive fixed
    sizes.  Mirrors parse-time validation (hamba/avro semantics per
    modeling_negative_validation.feature + schema_parsing_exhaustive),
    re-derived from the Avro specification.

    Two passes: collect every named definition, then walk and check
    references — forward references are accepted (laxer than strict
    single-pass Avro, strict enough for every reference rejection case).
    ``defined_extra`` pre-seeds names provided by cross-subject schema
    REFERENCES (the registry's references array resolves them at
    registration time).
    """
    schema = json.loads(schema_text)
    defined: set[str] = set(defined_extra)
    for name in defined_extra:
        defined.add(name.rsplit(".", 1)[-1])
    symbols_of: dict[str, list] = {}

    def collect(node: Any, namespace: str | None) -> None:
        if isinstance(node, list):
            for b in node:
                collect(b, namespace)
            return
        if not isinstance(node, dict):
            return
        t = node.get("type")
        if t in NAMED_TYPES:
            name = node.get("name")
            if not name:
                raise ValueError(f"{t} without a name")
            ns = node.get("namespace", namespace)
            full = _fullname(name, ns)
            defined.add(full)
            defined.add(full.rsplit(".", 1)[-1])
            for alias in node.get("aliases", []):
                defined.add(_fullname(alias, ns))
            if t == "enum":
                symbols_of[full] = node.get("symbols", [])
                symbols_of[full.rsplit(".", 1)[-1]] = \
                    node.get("symbols", [])
            if t in ("record", "error"):
                for f in node.get("fields", []):
                    collect(f.get("type"), ns)
        elif t == "array":
            collect(node.get("items"), namespace)
        elif t == "map":
            collect(node.get("values"), namespace)
        elif isinstance(t, (dict, list)):
            collect(t, namespace)

    def check(node: Any, namespace: str | None) -> None:
        if isinstance(node, str):
            if node not in PRIMITIVES and node not in defined \
                    and _fullname(node, namespace) not in defined:
                raise ValueError(f"unknown type reference '{node}'")
            return
        if isinstance(node, list):
            for b in node:
                check(b, namespace)
            return
        if not isinstance(node, dict):
            raise ValueError(f"invalid schema node {node!r}")
        t = node.get("type")
        if t in ("record", "error"):
            ns = node.get("namespace", namespace)
            names = [f.get("name") for f in node.get("fields", [])]
            if len(names) != len(set(names)):
                dupes = sorted({n for n in names if names.count(n) > 1})
                raise ValueError(f"duplicate field name(s) {dupes} in "
                                 f"record '{node.get('name')}'")
            for f in node.get("fields", []):
                if not f.get("name"):
                    raise ValueError("record field without a name")
                check(f.get("type"), ns)
                if "default" in f and not _default_matches(
                        f["default"], f["type"], symbols_of):
                    raise ValueError(
                        f"default {f['default']!r} does not match type of "
                        f"field '{f['name']}'")
        elif t == "enum":
            syms = node.get("symbols")
            if not syms:
                raise ValueError(
                    f"enum '{node.get('name')}' has no symbols")
            if len(syms) != len(set(syms)):
                raise ValueError(
                    f"enum '{node.get('name')}' has duplicate symbols")
        elif t == "fixed":
            size = node.get("size")
            if not isinstance(size, int) or isinstance(size, bool) \
                    or size <= 0:
                raise ValueError(
                    f"fixed '{node.get('name')}' size must be a positive "
                    f"integer, got {size!r}")
        elif t == "array":
            if "items" not in node:
                raise ValueError("array without items")
            check(node["items"], namespace)
        elif t == "map":
            if "values" not in node:
                raise ValueError("map without values")
            check(node["values"], namespace)
        elif isinstance(t, (dict, list)):
            check(t, namespace)
        elif isinstance(t, str):
            check(t, namespace)
        else:
            raise ValueError(f"schema node without a type: {node!r}")

    collect(schema, None)
    check(schema, None)
