"""Avro reader/writer schema-resolution compatibility checker.

Implements the Avro specification's schema-resolution rules (the same
rule set as /root/reference/internal/compatibility/avro/checker.go, built
independently from the public spec):

- records match by fullname-insensitive structure; fields by name or
  reader alias; a reader field absent from the writer needs a default.
- enums: every writer symbol must exist in the reader (or reader default).
- fixed: name and size must match.
- primitive promotions (writer → reader): int→long/float/double,
  long→float/double, float→double, string↔bytes.
- unions: writer-branch-wise resolution; non-union writer resolves if any
  reader branch accepts it; union writer needs every branch readable.

Returns a list of human-readable issues; empty = compatible.
"""

from __future__ import annotations

import json
from typing import Any

PROMOTIONS: dict[str, set[str]] = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
    "null": {"null"},
    "boolean": {"boolean"},
}

PRIMITIVES = set(PROMOTIONS)


def _norm(schema: Any) -> Any:
    """Collapse {"type": "x"} primitive object form to the bare name."""
    if isinstance(schema, dict) and schema.get("type") in PRIMITIVES \
            and not any(k in schema for k in ("fields", "symbols", "items",
                                              "values", "size")):
        return schema["type"]
    return schema


def _type_of(schema: Any) -> str:
    schema = _norm(schema)
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema.get("type", "?")


def _name_of(schema: Any) -> str:
    if isinstance(schema, dict):
        return schema.get("name", "")
    return str(schema)


def _collect_named(schema: Any, acc: dict[str, Any]) -> None:
    if isinstance(schema, list):
        for s in schema:
            _collect_named(s, acc)
    elif isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed", "error") and "name" in schema:
            acc[schema["name"]] = schema
            # also index by bare name for namespace-qualified refs
            acc[schema["name"].split(".")[-1]] = schema
        for key in ("fields", "items", "values"):
            v = schema.get(key)
            if key == "fields" and isinstance(v, list):
                for f in v:
                    _collect_named(f.get("type"), acc)
            elif v is not None:
                _collect_named(v, acc)
        if isinstance(t, (list, dict)):
            _collect_named(t, acc)


def check_avro(reader_text: str, writer_text: str,
               reader_refs: tuple[str, ...] = (),
               writer_refs: tuple[str, ...] = ()) -> list[str]:
    """``*_refs``: schema texts of referenced subjects — their named types
    become resolvable, mirroring the reference's resolve-refs-then-check
    flow (/root/reference/internal/registry/registry.go:336-351,
    1546-1592)."""
    reader = json.loads(reader_text)
    writer = json.loads(writer_text)
    rnames: dict[str, Any] = {}
    wnames: dict[str, Any] = {}
    for ref in reader_refs:
        _collect_named(json.loads(ref), rnames)
    for ref in writer_refs:
        _collect_named(json.loads(ref), wnames)
    _collect_named(reader, rnames)
    _collect_named(writer, wnames)
    issues: list[str] = []
    _match(reader, writer, rnames, wnames, "", issues, set())
    return issues


def _deref(schema: Any, names: dict[str, Any]) -> Any:
    schema = _norm(schema)
    if isinstance(schema, str) and schema not in PRIMITIVES:
        return names.get(schema, names.get(schema.split(".")[-1], schema))
    return schema


def _match(reader: Any, writer: Any, rnames: dict, wnames: dict,
           path: str, issues: list[str], visited: set) -> None:
    reader = _deref(reader, rnames)
    writer = _deref(writer, wnames)
    at = path or "<root>"

    rt, wt = _type_of(reader), _type_of(writer)

    # union handling first (spec: resolve before anything else)
    # Branch checks are SPECULATIVE: each gets a throwaway copy of
    # `visited`, never committed back.  A shared set let a failed trial
    # record a (reader, writer) name pair, making a later genuine
    # comparison of the same pair return early as compatible.
    if wt == "union":
        branches = [_norm(b) for b in (writer if isinstance(writer, list)
                                       else writer.get("type"))]
        for b in branches:
            sub: list[str] = []
            _match(reader, b, rnames, wnames, path, sub, set(visited))
            if sub:
                issues.append(
                    f"{at}: reader cannot read writer union branch "
                    f"'{_type_of(b)}'")
        return
    if rt == "union":
        branches = [_norm(b) for b in (reader if isinstance(reader, list)
                                       else reader.get("type"))]
        for b in branches:
            sub = []
            _match(b, writer, rnames, wnames, path, sub, set(visited))
            if not sub:
                return  # some branch accepts the writer
        issues.append(f"{at}: writer type '{wt}' matches no reader union branch")
        return

    if rt in PRIMITIVES or wt in PRIMITIVES:
        if wt in PROMOTIONS and rt in PROMOTIONS.get(wt, set()):
            return
        issues.append(f"{at}: writer type '{wt}' not readable as '{rt}'")
        return

    if rt != wt:
        issues.append(f"{at}: type changed from '{wt}' to '{rt}'")
        return

    if rt == "record" or rt == "error":
        # spec resolution rule: record (unqualified) names must match, or
        # the reader must alias the writer's name (checker.go:102-180)
        rname = _name_of(reader).split(".")[-1]
        wname = _name_of(writer).split(".")[-1]
        if rname and wname and rname != wname:
            aliases = {a.split(".")[-1]
                       for a in (reader.get("aliases", [])
                                 if isinstance(reader, dict) else [])}
            if wname not in aliases:
                issues.append(f"{at}: record name mismatch "
                              f"'{wname}' → '{rname}' (no alias)")
                return
        # recursion guard keys on the NAME pair only — the structural
        # comparison of a named record pair is path-independent, and a
        # path-qualified key never repeats on self-referential types
        # (Node → next: Node would recurse forever)
        key = (_name_of(reader), _name_of(writer))
        if key in visited:
            return
        visited.add(key)
        wfields = {f["name"]: f for f in writer.get("fields", [])}
        # reader aliases: alias name → reader field
        for rf in reader.get("fields", []):
            fpath = f"{path}.{rf['name']}" if path else rf["name"]
            wf = wfields.get(rf["name"])
            if wf is None:
                for alias in rf.get("aliases", []):
                    if alias in wfields:
                        wf = wfields[alias]
                        break
            if wf is None:
                if "default" not in rf:
                    issues.append(
                        f"{fpath}: reader field has no default and is "
                        f"missing from writer")
                continue
            _match(rf["type"], wf["type"], rnames, wnames, fpath, issues,
                   visited)
        return

    if rt == "enum":
        # spec resolution: unqualified enum names must match or the reader
        # must alias the writer's name (checker.go:182-190)
        rname = _name_of(reader).split(".")[-1]
        wname = _name_of(writer).split(".")[-1]
        if rname and wname and rname != wname:
            aliases = {a.split(".")[-1]
                       for a in (reader.get("aliases", [])
                                 if isinstance(reader, dict) else [])}
            if wname not in aliases:
                issues.append(f"{at}: enum name mismatch "
                              f"'{wname}' → '{rname}' (no alias)")
                return
        rsyms = set(reader.get("symbols", []))
        wsyms = set(writer.get("symbols", []))
        extra = wsyms - rsyms
        if extra and "default" not in reader:
            issues.append(
                f"{at}: writer enum symbols {sorted(extra)} missing from "
                f"reader (no enum default)")
        return

    if rt == "fixed":
        if _name_of(reader).split(".")[-1] != _name_of(writer).split(".")[-1]:
            issues.append(f"{at}: fixed name mismatch")
        if reader.get("size") != writer.get("size"):
            issues.append(f"{at}: fixed size changed "
                          f"{writer.get('size')} → {reader.get('size')}")
        return

    if rt == "array":
        _match(reader.get("items"), writer.get("items"), rnames, wnames,
               path + "[]", issues, visited)
        return

    if rt == "map":
        _match(reader.get("values"), writer.get("values"), rnames, wnames,
               path + "{}", issues, visited)
        return

    issues.append(f"{at}: unsupported type pairing '{rt}' / '{wt}'")
