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


def _value_types(schema: dict) -> set[str] | None:
    """Infer types from an enum/const value set (no explicit ``type``)."""
    if "enum" in schema:
        values = schema["enum"]
    elif "const" in schema:
        values = [schema["const"]]
    else:
        return None
    out: set[str] = set()
    for v in values:
        if v is None:
            out.add("null")
        elif isinstance(v, bool):
            out.add("boolean")
        elif isinstance(v, int):
            out.add("integer")
        elif isinstance(v, float):
            out.add("number")
        elif isinstance(v, str):
            out.add("string")
        elif isinstance(v, list):
            out.add("array")
        else:
            out.add("object")
    return out or None


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
    if "allOf" in reader:
        # each conjunct was verified against the WHOLE writer above;
        # strip it so a writer-allOf candidate probe below doesn't demand
        # a single candidate satisfy every reader conjunct (reordered
        # identical allOf lists must stay compatible — BDD combined 001)
        reader = {k: v for k, v in reader.items() if k != "allOf"}
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
    if wtypes is None:
        # enum/const-only writers have a concrete value set: infer the
        # type(s) from the values so `{"enum": ["red"]}` probes as a
        # string writer, not as "<any>" (BDD jsonschema_diff 027/029)
        wtypes = _value_types(writer)
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
    if "not" in reader:
        rnot, wnot = reader["not"], writer.get("not")
        if wnot is None:
            issues.append(f"{at}: reader adds a 'not' restriction")
        elif rnot != wnot:
            # reader rejects sat(rnot); safe iff the writer could never
            # emit those values, i.e. sat(rnot) ⊆ sat(wnot).  Probe with
            # roles swapped (each not-subschema resolves against its OWN
            # root).  Narrowing `not` (number → integer) is compatible.
            sub: list[str] = []
            _check(wnot, rnot, wroot, rroot, f"{path}/not", sub,
                   set(visited), wext, rext)
            if sub:
                issues.append(f"{at}: reader broadens/changes the 'not' "
                              f"restriction")

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
    bound("minProperties", lambda r, w: r > w)
    bound("maximum", lambda r, w: r < w)
    bound("exclusiveMaximum", lambda r, w: r < w)
    bound("maxLength", lambda r, w: r < w)
    bound("maxItems", lambda r, w: r < w)
    bound("maxProperties", lambda r, w: r < w)
    if "multipleOf" in reader:
        rm, wm = reader["multipleOf"], writer.get("multipleOf")
        if wm is None or (wm % rm != 0):
            issues.append(f"{at}: reader narrows multipleOf ({wm!r} → {rm!r})")
    if "pattern" in reader and reader["pattern"] != writer.get("pattern"):
        issues.append(f"{at}: reader adds/changes pattern")

    # --- object rules ----------------------------------------------------
    # Content-model semantics mirror the reference's checker
    # (jsonschema/checker.go:290-405 checkObjectCompatibility,
    # :605-628 additionalProperties): a writer with an OPEN model (no
    # additionalProperties, or true) may have emitted ANY value under a
    # property name the reader now types, so adding a constrained
    # property to an open writer is incompatible; a CLOSED writer
    # (additionalProperties: false) could never emit it, so the same add
    # is compatible; a partially-open writer (schema-valued
    # additionalProperties) gates the add on that schema.  Removals are
    # judged against the READER's model symmetrically.
    rprops = reader.get("properties", {})
    wprops = writer.get("properties", {})
    wreq = set(writer.get("required", []))
    rreq = set(reader.get("required", []))
    # only names DECLARED in reader's properties count (checker.go:334-
    # 362 iterates newProps; a required entry for an undeclared name is
    # ignored — BDD jsonschema_diff 054/056)
    for name in (rreq - wreq) & set(rprops):
        issues.append(f"{at}: property '{name}' newly required by reader")

    r_ap = reader.get("additionalProperties", True)
    w_ap = writer.get("additionalProperties", True)
    r_open = r_ap is True
    w_open = w_ap is True
    if r_ap is False and w_ap is not False:
        issues.append(f"{at}: reader closes the content model "
                      f"(additionalProperties: false) on an open writer")
    elif isinstance(r_ap, dict) and w_ap is not False:
        # schema-valued reader AP must accept whatever the writer's AP
        # permitted (true/absent probes as the anything-schema) —
        # narrowing or changing it is incompatible (BDD 080/082/085/087)
        _check(r_ap, {} if w_ap is True else w_ap, rroot, wroot,
               f"{path}/additionalProperties", issues, visited, rext, wext)

    # removed properties, judged against the READER's content model
    for name, wsub in wprops.items():
        if name in rprops:
            continue
        if wsub is False:
            continue  # writer never emitted it (BDD 084/086)
        if r_open:
            continue  # reader still accepts it as additional content
        if reader.get("patternProperties"):
            continue  # pattern may cover it (checker.go:309-311, coarse)
        if isinstance(r_ap, dict):
            sub2: list[str] = []
            _check(r_ap, wsub if isinstance(wsub, dict) else {}, rroot,
                   wroot, f"{path}.{name}", sub2, set(visited), rext, wext)
            if sub2:
                issues.append(f"{at}: property '{name}' removed but not "
                              f"covered by additionalProperties")
        else:
            issues.append(f"{at}: property '{name}' removed from closed "
                          f"reader model")

    # added + shared properties, judged against the WRITER's model
    for name, rsub in rprops.items():
        ppath = f"{path}.{name}" if path else name
        if name in wprops:
            _check(rsub, wprops[name], rroot, wroot, ppath, issues,
                   visited, rext, wext)
            continue
        if rsub is True or rsub == {}:
            continue  # no new constraint
        if name in rreq:
            continue  # already reported as newly required
        if w_open:
            issues.append(f"{at}: property '{name}' added to open "
                          f"content model")
        elif isinstance(w_ap, dict):
            sub3: list[str] = []
            _check(rsub if isinstance(rsub, dict) else {}, w_ap, rroot,
                   wroot, ppath, sub3, set(visited), rext, wext)
            if sub3:
                issues.append(f"{at}: property '{name}' added with type "
                              f"incompatible with additionalProperties")
        # closed writer: could never emit it → compatible

    # --- array rules -----------------------------------------------------
    # tuple items — Draft-07 list-form "items" and Draft-2020 "prefixItems"
    # normalize to the same positional check; the tail model is Draft-07
    # "additionalItems" or Draft-2020 schema-valued "items"
    r_tuple = reader.get("prefixItems",
                         reader["items"]
                         if isinstance(reader.get("items"), list) else None)
    w_tuple = writer.get("prefixItems",
                         writer["items"]
                         if isinstance(writer.get("items"), list) else None)

    def tail_model(schema, is_2020_tuple):
        if "additionalItems" in schema:
            return schema["additionalItems"]
        if is_2020_tuple and "items" in schema:
            return schema["items"]
        return True

    # bare additionalItems keyword compare (BDD 086-089: removing the
    # boolean or changing the tail schema is incompatible even without a
    # tuple present)
    r_ai_kw = reader.get("additionalItems", True)
    w_ai_kw = writer.get("additionalItems", True)
    if r_ai_kw is False and w_ai_kw is not False and r_tuple is None:
        issues.append(f"{at}: reader forbids additionalItems the writer "
                      f"allowed")
    elif isinstance(r_ai_kw, dict) and w_ai_kw is not False:
        _check(r_ai_kw, {} if w_ai_kw is True else w_ai_kw, rroot, wroot,
               f"{path}/additionalItems", issues, visited, rext, wext)

    if r_tuple is None and w_tuple is None \
            and reader.get("items") is False \
            and "items" in reader and writer.get("items") is not False:
        # Draft-2020 boolean tail: items false forbids what the writer's
        # true/absent/schema items allowed (BDD 2020 084-086)
        issues.append(f"{at}: reader forbids array items the writer "
                      f"allowed")
    elif (r_tuple is None and w_tuple is None) and (
            isinstance(reader.get("items"), dict)
            or isinstance(writer.get("items"), dict)):
        if writer.get("items") is not False:
            w_it = writer.get("items")
            _check(reader.get("items", {}),
                   {} if w_it in (None, True) else w_it, rroot,
                   wroot, path + "[]", issues, visited, rext, wext)
    elif r_tuple is not None and w_tuple is not None:
        r_tail = tail_model(reader, "prefixItems" in reader)
        w_tail = tail_model(writer, "prefixItems" in writer)
        for i, (ri, wi) in enumerate(zip(r_tuple, w_tuple)):
            _check(ri, wi, rroot, wroot, f"{path}[{i}]", issues, visited,
                   rext, wext)
        # reader tuple LONGER: extra positions must accept whatever the
        # writer's tail model emitted there (BDD 063-067)
        for i in range(len(w_tuple), len(r_tuple)):
            ri = r_tuple[i]
            if ri is True or ri == {}:
                continue
            if w_tail is False:
                continue  # writer never emitted a value there
            sub4: list[str] = []
            _check(ri if isinstance(ri, dict) else {},
                   {} if w_tail is True else w_tail, rroot, wroot,
                   f"{path}[{i}]", sub4, set(visited), rext, wext)
            if sub4 or ri is False:
                issues.append(f"{at}: item added at position {i} not "
                              f"covered by writer tail model")
        # reader tuple SHORTER: removed positions fall to the reader's
        # tail model (BDD 068-070, 091-093)
        for i in range(len(r_tuple), len(w_tuple)):
            wi = w_tuple[i]
            if wi is False:
                continue  # writer never emitted a value there
            if r_tail is True:
                continue
            if r_tail is False:
                issues.append(f"{at}: item removed at position {i} with "
                              f"additionalItems: false")
                continue
            sub5: list[str] = []
            _check(r_tail, wi if isinstance(wi, dict) else {}, rroot,
                   wroot, f"{path}[{i}]", sub5, set(visited), rext, wext)
            if sub5:
                issues.append(f"{at}: item removed at position {i} not "
                              f"covered by additionalItems")

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
