"""Evolution advisory + standalone validate/normalize operators.

Re-expresses the reference's schema-intelligence endpoints:

- ``SuggestSchemaEvolution`` (/root/reference/internal/api/handlers/
  analysis.go:875-912 request shape; the rich advice lives in the MCP
  tool, /root/reference/internal/mcp/tools_intelligence.go:579-710):
  per change request, emit the pinned advice/snippet strings AND apply
  the change to the current schema, then run the real compatibility
  checker so the caller gets a verdict, not just prose.
- ``SuggestCompatibleChange`` (analysis.go:1105-1139): the per-level
  suggestion strings, pinned verbatim.
- ``ValidateSchema`` / ``NormalizeSchema`` (analysis.go:19-86):
  parse-error reporting and canonical text + fingerprint as RESULT
  columns (not just an internal step of fingerprinting).

All functions are pure Python (driver- and executor-safe); the Spark
layer wraps them in one Arrow-batched pandas UDF per spec.
"""

from __future__ import annotations

import json
import re
from typing import Any

from axonops_schema_registry_spark.registry.avro import avro_canonical_form
from axonops_schema_registry_spark.registry.compat import check_compatibility
from axonops_schema_registry_spark.registry.spark_udfs import (
    canonical_fingerprint,
)

# analysis.go:1117-1131 — SuggestCompatibleChange suggestion strings
LEVEL_SUGGESTIONS: dict[str, tuple[str, ...]] = {
    "BACKWARD": ("Add new fields with default values",
                 "Do NOT remove existing fields",
                 "Do NOT change field types"),
    "BACKWARD_TRANSITIVE": ("Add new fields with default values",
                            "Do NOT remove existing fields",
                            "Do NOT change field types"),
    "FORWARD": ("Remove fields (new consumers will ignore them)",
                "Do NOT add required fields without defaults"),
    "FORWARD_TRANSITIVE": ("Remove fields (new consumers will ignore them)",
                           "Do NOT add required fields without defaults"),
    "FULL": ("Only add optional fields with defaults",
             "Do NOT remove or rename fields"),
    "FULL_TRANSITIVE": ("Only add optional fields with defaults",
                        "Do NOT remove or rename fields"),
    "NONE": ("Any change is allowed (no compatibility checks)",),
}


def level_suggestions(level: str) -> str:
    return "; ".join(LEVEL_SUGGESTIONS.get((level or "BACKWARD").upper(), ()))


def _needs_default(level: str) -> bool:
    lv = (level or "BACKWARD").upper()
    return "BACKWARD" in lv or "FULL" in lv


def _advice_snippet(schema_type: str, level: str, change_type: str,
                    field_name: str, field_type: str,
                    enum_symbol: str) -> tuple[str, str]:
    """Advice + snippet strings pinned to tools_intelligence.go:622-710."""
    st = (schema_type or "AVRO").upper()
    if change_type == "add_field":
        fn = field_name or "new_field"
        ft = field_type or "string"
        if st == "AVRO":
            if _needs_default(level):
                return (f"Add with default value for {level} compatibility",
                        f'{{"name":"{fn}","type":["null","{ft}"],'
                        f'"default":null}}')
            return (f"Add without default since compatibility level is "
                    f"{level}", f'{{"name":"{fn}","type":"{ft}"}}')
        if st == "JSON":
            return ("Add to properties; do not add to required array if "
                    "backward-compatible", f'"{fn}":{{"type":"{ft}"}}')
        if st == "PROTOBUF":
            return ("Add with a new unique field number",
                    f"{ft} {fn} = <next_number>;")
    if change_type == "deprecate_field":
        if st == "AVRO":
            return ("Add @deprecated to doc, add aliases for future rename, "
                    "set default value", "")
        if st == "JSON":
            return ("Mark as deprecated in description, remove from "
                    "required array", "")
        if st == "PROTOBUF":
            return ("Use the deprecated option on the field", "")
    if change_type == "add_enum_symbol":
        if st == "AVRO":
            return ("Add the new symbol to the end of the symbols array. "
                    "This is backward-compatible.", "")
        if st == "PROTOBUF":
            return ("Add the new value to the enum with the next available "
                    "number.", "")
        return ("Add the new value to the enum array.", "")
    # remove/retype have no MCP advice — the SuggestCompatibleChange
    # level guidance is the reference's answer (analysis.go:1117-1131)
    return (level_suggestions(level), "")


def _apply_avro(doc: Any, change_type: str, field_name: str,
                field_type: str, enum_symbol: str, needs_default: bool) -> Any:
    if change_type == "add_enum_symbol":
        if isinstance(doc, dict) and doc.get("type") == "enum":
            doc["symbols"] = list(doc.get("symbols", [])) + \
                [enum_symbol or "NEW_SYMBOL"]
        return doc
    fields = doc.get("fields", []) if isinstance(doc, dict) else []
    if change_type == "add_field":
        if needs_default:
            fields.append({"name": field_name,
                           "type": ["null", field_type or "string"],
                           "default": None})
        else:
            fields.append({"name": field_name,
                           "type": field_type or "string"})
    elif change_type == "deprecate_field":
        for f in fields:
            if f.get("name") == field_name:
                f["doc"] = "@deprecated Use new_field instead"
                if "default" not in f:
                    defaults = {"string": "", "int": 0, "long": 0,
                                "float": 0.0, "double": 0.0,
                                "boolean": False}
                    if f.get("type") in defaults:
                        f["default"] = defaults[f["type"]]
    elif change_type == "remove_field":
        doc["fields"] = [f for f in fields if f.get("name") != field_name]
    elif change_type == "retype_field":
        for f in fields:
            if f.get("name") == field_name:
                f["type"] = field_type
    return doc


def apply_change(schema_text: str, schema_type: str, level: str,
                 change_type: str, field_name: str = "",
                 field_type: str = "", enum_symbol: str = "") -> str:
    """Apply one evolution change request to ``schema_text``; returns the
    mutated schema text (the candidate the compat checker then judges)."""
    st = (schema_type or "AVRO").upper()
    if st == "AVRO":
        doc = json.loads(schema_text)
        doc = _apply_avro(doc, change_type, field_name, field_type,
                          enum_symbol, _needs_default(level))
        return json.dumps(doc)
    if st == "JSON":
        doc = json.loads(schema_text)
        props = doc.setdefault("properties", {})
        if change_type == "add_field":
            props[field_name] = {"type": field_type or "string"}
        elif change_type == "remove_field":
            props.pop(field_name, None)
            doc["required"] = [r for r in doc.get("required", [])
                               if r != field_name]
        elif change_type == "retype_field" and field_name in props:
            props[field_name]["type"] = field_type
        elif change_type == "deprecate_field" and field_name in props:
            props[field_name]["deprecated"] = True
            doc["required"] = [r for r in doc.get("required", [])
                               if r != field_name]
        return json.dumps(doc)
    if st == "PROTOBUF":
        lines = schema_text.splitlines()
        if change_type == "add_field":
            nums = [int(m.group(1))
                    for line in lines
                    for m in [re.search(r"=\s*(\d+)\s*;", line)] if m]
            nxt = max(nums, default=0) + 1
            for i in range(len(lines) - 1, -1, -1):
                if lines[i].strip() == "}":
                    lines.insert(i, f"  {field_type or 'string'} "
                                    f"{field_name} = {nxt};")
                    break
        elif change_type == "remove_field":
            lines = [ln for ln in lines
                     if not re.search(rf"\b{re.escape(field_name)}\s*=", ln)]
        elif change_type == "retype_field":
            lines = [re.sub(rf"^(\s*)\w+(\s+{re.escape(field_name)}\s*=)",
                            rf"\g<1>{field_type}\g<2>", ln)
                     for ln in lines]
        return "\n".join(lines) + "\n"
    return schema_text


def suggest_and_verify(schema_text: str, schema_type: str, level: str,
                       change_type: str, field_name: str = "",
                       field_type: str = "",
                       enum_symbol: str = "") -> dict[str, Any]:
    """One evolution suggestion: pinned advice/snippet + the APPLIED
    change judged by the real compatibility checker at ``level``."""
    advice, snippet = _advice_snippet(schema_type, level, change_type,
                                      field_name, field_type, enum_symbol)
    try:
        candidate = apply_change(schema_text, schema_type, level,
                                 change_type, field_name, field_type,
                                 enum_symbol)
        ok, msgs = check_compatibility(candidate, [schema_text], level,
                                       schema_type)
    except Exception as exc:  # malformed current schema
        ok, msgs = False, [f"schema parse error: {exc}"]
    return {"advice": advice, "snippet": snippet, "is_compatible": ok,
            "n_issues": len(msgs)}


# ---------------------------------------------------------------------------
# ValidateSchema / NormalizeSchema (analysis.go:19-86)
# ---------------------------------------------------------------------------

_JS_TYPES = {"null", "boolean", "object", "array", "number", "string",
             "integer"}
#: keyword → shape validator; mirrors the Draft-07 meta-schema checks the
#: reference gets from compiling with santhosh-tekuri/jsonschema
#: (jsonschema/parser.go:64-87) — wrong keyword SHAPES fail compilation
#: (schema_registration_exhaustive 'invalid JSON schema returns 422')


def json_schema_validate(doc) -> None:
    """Raise ValueError when ``doc`` violates the Draft-07 meta-schema
    in any of the ways the reference's compiler rejects."""
    import re as _re

    def err(msg: str):
        raise ValueError(f"failed to compile JSON schema: {msg}")

    def sub(node, where: str):
        if isinstance(node, bool):
            return
        if not isinstance(node, dict):
            err(f"{where}: schema must be object or boolean")
        t = node.get("type")
        if t is not None:
            types = t if isinstance(t, list) else [t]
            if not isinstance(t, (str, list)) \
                    or any(x not in _JS_TYPES for x in types):
                err(f"{where}: invalid type {t!r}")
        for kw in ("properties", "patternProperties", "definitions",
                   "$defs", "dependencies"):
            v = node.get(kw)
            if v is None:
                continue
            if not isinstance(v, dict):
                err(f"{where}: {kw} must be an object")
            for k, s in v.items():
                if kw == "dependencies" and isinstance(s, list):
                    continue
                sub(s, f"{where}/{kw}/{k}")
        req = node.get("required")
        if req is not None and (
                not isinstance(req, list)
                or any(not isinstance(x, str) for x in req)):
            err(f"{where}: required must be an array of strings")
        enum = node.get("enum")
        if enum is not None and not isinstance(enum, list):
            err(f"{where}: enum must be an array")
        for kw in ("allOf", "anyOf", "oneOf"):
            v = node.get(kw)
            if v is None:
                continue
            if not isinstance(v, list) or not v:
                err(f"{where}: {kw} must be a non-empty array")
            for i, s in enumerate(v):
                sub(s, f"{where}/{kw}/{i}")
        items = node.get("items")
        if items is not None:
            if isinstance(items, list):
                for i, s in enumerate(items):
                    sub(s, f"{where}/items/{i}")
            else:
                sub(items, f"{where}/items")
        for kw in ("additionalProperties", "additionalItems", "not",
                   "propertyNames", "contains", "if", "then", "else"):
            if kw in node:
                sub(node[kw], f"{where}/{kw}")
        pattern = node.get("pattern")
        if pattern is not None:
            if not isinstance(pattern, str):
                err(f"{where}: pattern must be a string")
            try:
                _re.compile(pattern)
            except _re.error as exc:
                err(f"{where}: invalid pattern: {exc}")
        ref = node.get("$ref")
        if ref is not None and not isinstance(ref, str):
            err(f"{where}: $ref must be a string")
        for kw in ("minLength", "maxLength", "minItems", "maxItems",
                   "minProperties", "maxProperties"):
            v = node.get(kw)
            if v is not None and (not isinstance(v, int)
                                  or isinstance(v, bool) or v < 0):
                err(f"{where}: {kw} must be a non-negative integer")
        for kw in ("minimum", "maximum", "exclusiveMinimum",
                   "exclusiveMaximum", "multipleOf"):
            v = node.get(kw)
            if v is not None and (not isinstance(v, (int, float))
                                  or isinstance(v, bool)):
                err(f"{where}: {kw} must be a number")

    if not isinstance(doc, (dict, bool)):
        err("root must be object or boolean")
    sub(doc, "#")


def validate_and_normalize(schema_text: str,
                           schema_type: str) -> dict[str, Any]:
    """(is_valid, error, canonical, fingerprint) per schema language.

    Invalid schemas report the parse error and empty canonical columns;
    the fingerprint of a valid schema is the same content address the
    registration pipeline uses (NormalizeSchema returns Normalized +
    Fingerprint together, analysis.go:53-86)."""
    st = (schema_type or "AVRO").upper()
    try:
        if st == "AVRO":
            from axonops_schema_registry_spark.registry.avro import (
                avro_validate,
            )

            avro_validate(schema_text)
            canonical = avro_canonical_form(schema_text)
        elif st == "JSON":
            doc = json.loads(schema_text)
            json_schema_validate(doc)
            canonical = json.dumps(doc, sort_keys=True,
                                   separators=(",", ":"),
                                   ensure_ascii=False)
        elif st == "PROTOBUF":
            from axonops_schema_registry_spark.registry.protobuf_parse import (
                parse_proto,
                proto_validate,
            )

            parsed = parse_proto(schema_text)
            if not parsed.messages and not parsed.enums:
                raise ValueError("no message or enum definitions")
            proto_validate(parsed)
            stripped = re.sub(r"//[^\n]*|/\*.*?\*/", " ", schema_text,
                              flags=re.DOTALL)
            canonical = re.sub(r"\s+", " ", stripped).strip()
        else:
            raise ValueError(
                f"Invalid schema type '{schema_type}'. Accepted types are "
                f"AVRO, PROTOBUF, and JSON")
    except Exception as exc:
        return {"is_valid": False, "error": f"{exc}", "canonical": "",
                "fingerprint": ""}
    return {"is_valid": True, "error": "", "canonical": canonical,
            "fingerprint": canonical_fingerprint(schema_text, st)}
