"""JSON Schema compatibility checker.

Can ``reader`` (new) accept every instance valid under ``writer`` (old)?
Implements the structural rule families of the reference's checker
(/root/reference/internal/compatibility/jsonschema/checker.go — type
widening, required/optional property rules, open/closed content model,
constraint narrowing, enum containment, composition, dependencies, $ref),
built independently against JSON Schema Draft-07 semantics with the
Draft-2020 keywords the reference also handles (dependentRequired/
dependentSchemas).

Checking direction: an issue is reported whenever the reader could REJECT
an instance the writer permits (i.e. the reader narrows).
"""

from __future__ import annotations

import json
from typing import Any

_NUMERIC = {"integer", "number"}


def _types(schema: dict) -> set[str] | None:
    t = schema.get("type")
    if t is None:
        return None  # any
    return set(t) if isinstance(t, list) else {t}


def _resolve_ref(schema: Any, root: dict,
                 external: dict[str, Any] | None = None) -> Any:
    while isinstance(schema, dict) and "$ref" in schema:
        ref = schema["$ref"]
        if not ref.startswith("#/"):
            # cross-subject reference: resolve from the external refs map
            # (checker.go:133-251's cross-subject $ref support)
            if external and ref in external:
                schema = external[ref]
                continue
            break
        node: Any = root
        for part in ref[2:].split("/"):
            if not isinstance(node, dict) or part not in node:
                return schema
            node = node[part]
        schema = node
    return schema


def check_jsonschema(reader_text: str, writer_text: str,
                     reader_refs: dict[str, str] | None = None,
                     writer_refs: dict[str, str] | None = None) -> list[str]:
    """``*_refs``: map of $ref name → schema text for cross-subject
    references (resolved by the caller from the schema_references table).
    """
    reader = json.loads(reader_text)
    writer = json.loads(writer_text)
    rext = {k: json.loads(v) for k, v in (reader_refs or {}).items()}
    wext = {k: json.loads(v) for k, v in (writer_refs or {}).items()}
    issues: list[str] = []
    _check(reader, writer, reader, writer, "", issues, set(), rext, wext)
    return issues


def _check(reader: Any, writer: Any, rroot: dict, wroot: dict,
           path: str, issues: list[str], visited: set,
           rext: dict | None = None, wext: dict | None = None) -> None:
    at = path or "<root>"
    # boolean schemas: true accepts all, false accepts none
    if reader is True or reader == {}:
        return
    if writer is False:
        return
    if reader is False:
        issues.append(f"{at}: reader accepts nothing but writer permits values")
        return
    if writer is True or writer == {}:
        writer = {}
    reader = _resolve_ref(reader, rroot, rext)
    writer = _resolve_ref(writer, wroot, wext)
    if not isinstance(reader, dict) or not isinstance(writer, dict):
        return
    # Structurally identical subschemas resolved against identical roots
    # impose identical constraints — trivially compatible (this also keeps
    # self-compatibility exact for unsatisfiable conjunctions like
    # allOf[string, integer], where the conjunct-probe heuristic below
    # would over-report).  Root equality matters: nested $refs resolve
    # against their OWN roots, so textual equality alone is not enough.
    if reader == writer and rroot == wroot and rext == wext:
        return
    key = (id(reader), id(writer))
    if key in visited:
        return
    visited.add(key)

    # --- composition -----------------------------------------------------
    for comb in ("allOf",):
        for i, sub in enumerate(reader.get(comb, [])):
            _check(sub, writer, rroot, wroot, f"{path}/allOf[{i}]", issues,
                   visited, rext, wext)
    if "allOf" in writer:
        # the writer emits only values satisfying EVERY allOf conjunct,
        # so the reader accepting ANY single conjunct (or the base
        # keywords) is sufficient — writer ⊆ conjunct ⊆ reader.
        base = {k: v for k, v in writer.items() if k != "allOf"}
        candidates = list(writer["allOf"]) + ([base] if base else [])
        first_issues: list[str] | None = None
        for wb in candidates:
            sub_issues: list[str] = []
            # probe with a COPY of visited: a failed earlier candidate must
            # not poison the memo for later candidates that revisit the
            # same (reader, subschema) pair (e.g. conjuncts $ref-ing a
            # shared $defs node) — a shared set would short-circuit the
            # later probe into a false 'compatible'
            _check(reader, wb, rroot, wroot, path, sub_issues,
                   set(visited), rext, wext)
            if not sub_issues:
                return
            if first_issues is None:
                first_issues = sub_issues
        issues.extend(first_issues or [])
        return
    if "anyOf" in writer or "oneOf" in writer:
        branches = writer.get("anyOf", []) + writer.get("oneOf", [])
        for i, wb in enumerate(branches):
            sub_issues: list[str] = []
            _check(reader, wb, rroot, wroot, f"{path}/branch[{i}]",
                   sub_issues, visited, rext, wext)
            issues.extend(sub_issues)
        return
    if "anyOf" in reader or "oneOf" in reader:
        branches = reader.get("anyOf", []) + reader.get("oneOf", [])
        for rb in branches:
            sub_issues = []
            # copied visited for the same reason as the writer-allOf probe
            _check(rb, writer, rroot, wroot, path, sub_issues,
                   set(visited), rext, wext)
            if not sub_issues:
                return
        issues.append(f"{at}: no reader anyOf/oneOf branch accepts the "
                      f"writer schema")
        return

    # --- type ------------------------------------------------------------
    rtypes, wtypes = _types(reader), _types(writer)
    if rtypes is not None:
        effective_w = wtypes if wtypes is not None else {"<any>"}
        widened = set()
        for wt in effective_w:
            if wt in rtypes:
                continue
            if wt == "integer" and "number" in rtypes:
                continue  # integer → number widening is safe
            widened.add(wt)
        if widened:
            issues.append(
                f"{at}: writer type(s) {sorted(widened)} not accepted by "
                f"reader type(s) {sorted(rtypes)}")
            return

    # --- negation --------------------------------------------------------
    if "not" in reader and reader["not"] != writer.get("not"):
        issues.append(f"{at}: reader adds/changes a 'not' restriction")

    # --- enum / const ----------------------------------------------------
    if "enum" in reader:
        renum = reader["enum"]
        if "enum" in writer:
            extra = [v for v in writer["enum"] if v not in renum]
            if extra:
                issues.append(f"{at}: writer enum values {extra} removed "
                              f"from reader enum")
        else:
            issues.append(f"{at}: reader adds enum restriction the writer "
                          f"did not have")
    if "const" in reader:
        if writer.get("const") != reader["const"] and \
                writer.get("enum") != [reader["const"]]:
            issues.append(f"{at}: reader adds/changes const")

    # --- numeric constraints --------------------------------------------
    def bound(kw: str, cmp_narrower) -> None:
        rv, wv = reader.get(kw), writer.get(kw)
        if rv is None:
            return
        if wv is None or cmp_narrower(rv, wv):
            issues.append(f"{at}: reader narrows {kw} "
                          f"({wv!r} → {rv!r})")

    bound("minimum", lambda r, w: r > w)
    bound("exclusiveMinimum", lambda r, w: r > w)
    bound("minLength", lambda r, w: r > w)
    bound("minItems", lambda r, w: r > w)
    bound("maximum", lambda r, w: r < w)
    bound("exclusiveMaximum", lambda r, w: r < w)
    bound("maxLength", lambda r, w: r < w)
    bound("maxItems", lambda r, w: r < w)
    if "multipleOf" in reader:
        rm, wm = reader["multipleOf"], writer.get("multipleOf")
        if wm is None or (wm % rm != 0):
            issues.append(f"{at}: reader narrows multipleOf ({wm!r} → {rm!r})")
    if "pattern" in reader and reader["pattern"] != writer.get("pattern"):
        issues.append(f"{at}: reader adds/changes pattern")

    # --- object rules ----------------------------------------------------
    rprops = reader.get("properties", {})
    wprops = writer.get("properties", {})
    wreq = set(writer.get("required", []))
    for name in set(reader.get("required", [])) - wreq:
        issues.append(f"{at}: property '{name}' newly required by reader")

    r_closed = reader.get("additionalProperties") is False
    w_closed = writer.get("additionalProperties") is False
    if r_closed and not w_closed:
        issues.append(f"{at}: reader closes the content model "
                      f"(additionalProperties: false) on an open writer")
    elif r_closed and w_closed:
        for name in set(wprops) - set(rprops):
            issues.append(f"{at}: writer property '{name}' not allowed by "
                          f"closed reader")
    for name, rsub in rprops.items():
        if name in wprops:
            _check(rsub, wprops[name], rroot, wroot,
                   f"{path}.{name}" if path else name, issues, visited, rext, wext)
        elif w_closed:
            pass  # writer never emits it
        # open writer + new reader property: unconstrained writer values
        # flow into rsub only if present; JSON Schema applies rsub to the
        # property when present, so a non-trivial rsub narrows:
        elif rsub not in (True, {}) and name in set(reader.get("required", [])):
            pass  # already reported as newly required
    # tuple items — Draft-07 list-form "items" and Draft-2020 "prefixItems"
    # normalize to the same positional check
    r_tuple = reader.get("prefixItems",
                         reader["items"]
                         if isinstance(reader.get("items"), list) else None)
    w_tuple = writer.get("prefixItems",
                         writer["items"]
                         if isinstance(writer.get("items"), list) else None)
    if isinstance(reader.get("items"), dict) or (
            isinstance(writer.get("items"), dict)
            and r_tuple is None and w_tuple is None):
        _check(reader.get("items", {}), writer.get("items", {}), rroot,
               wroot, path + "[]", issues, visited, rext, wext)
    elif r_tuple is not None and w_tuple is not None:
        for i, (ri, wi) in enumerate(zip(r_tuple, w_tuple)):
            _check(ri, wi, rroot, wroot, f"{path}[{i}]", issues, visited, rext, wext)
        # 2020: "items" false closes the tuple; 07: "additionalItems" false
        r_closed_tuple = (reader.get("additionalItems") is False
                          or reader.get("items") is False)
        if len(r_tuple) < len(w_tuple) and r_closed_tuple:
            issues.append(f"{at}: reader tuple shorter with "
                          f"additionalItems: false")

    # --- dependencies (Draft-07 + 2020) ---------------------------------
    rdep = {**reader.get("dependentRequired", {}),
            **{k: v for k, v in reader.get("dependencies", {}).items()
               if isinstance(v, list)}}
    wdep = {**writer.get("dependentRequired", {}),
            **{k: v for k, v in writer.get("dependencies", {}).items()
               if isinstance(v, list)}}
    for prop, needs in rdep.items():
        extra = set(needs) - set(wdep.get(prop, []))
        if extra:
            issues.append(f"{at}: reader adds dependentRequired "
                          f"{prop} → {sorted(extra)}")
    rds = {**reader.get("dependentSchemas", {}),
           **{k: v for k, v in reader.get("dependencies", {}).items()
              if isinstance(v, dict)}}
    wds = {**writer.get("dependentSchemas", {}),
           **{k: v for k, v in writer.get("dependencies", {}).items()
              if isinstance(v, dict)}}
    for prop, rsub in rds.items():
        _check(rsub, wds.get(prop, {}), rroot, wroot,
               f"{path}/dependentSchemas/{prop}", issues, visited, rext, wext)
