"""Replay the reference's MCP tool-call BDD scenarios against the same
``RegistrySim`` semantics the REST parity suite uses.

The MCP server (/root/reference/internal/mcp/tools*.go) is a thin tool
layer over the registry: every tool resolves to the operations the Spark
engine implements (register/dedup/gate, config/mode chains, DEK/KEK
lifecycle, exporters, the analysis surface).  Each tool handler here
formats its result exactly like the Go side — ``jsonResult`` (compact
JSON, struct field order) or ``textResult`` — and failures become
``error: <message>`` with the IsError flag, so the features' substring
assertions check real response content.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any

import bdd_audit
from bdd_parity import FEATURES_DIR, _scenarios
from bdd_lifecycle_parity import (
    Mismatch,
    RegistrySim,
    _dispatch_http,
)

MCP_DIR = os.path.join(FEATURES_DIR, "mcp")

MCP_FEATURES = (
    "mcp_config.feature",
    "mcp_metrics.feature",
    "mcp_kms_e2e.feature",
    "mcp_data_rules_e2e.feature",
    "mcp_schema_read.feature",
    "mcp_schema_write.feature",
    "mcp_dek.feature",
    "mcp_comparison.feature",
    "mcp_validation.feature",
    "mcp_context.feature",
    "mcp_context_isolation.feature",
    "mcp_metadata.feature",
    "mcp_exporter.feature",
    "mcp_dependency_graph.feature",
    "mcp_evolution.feature",
    "mcp_intelligence.feature",
    "mcp_data_contracts.feature",
    "mcp_encryption_lifecycle.feature",
    "mcp_modeling_domain.feature",
    "mcp_modeling_errors.feature",
    "mcp_modeling_event_driven.feature",
    "mcp_modeling_lifecycle.feature",
    "mcp_modeling_multiformat.feature",
    "mcp_workflow_cicd.feature",
    "mcp_workflow_cross_cutting.feature",
    "mcp_workflow_deprecation.feature",
    "mcp_workflow_encryption.feature",
    "mcp_workflow_evolution.feature",
    "mcp_workflow_governance.feature",
    "mcp_workflow_new_topic.feature",
    "mcp_workflow_team_onboarding.feature",
    "mcp_workflow_troubleshooting.feature",
    # second wave: confirmation flow, tool listing + permission presets,
    # admin user/API-key store, server basics, resources + glossary +
    # prompts (content files read from the reference corpus)
    "mcp_confirmation.feature",
    "mcp_permissions.feature",
    "mcp_security.feature",
    "mcp_server.feature",
    "mcp_audit.feature",
    "mcp_observability.feature",
    "mcp_admin.feature",
    "mcp_glossary.feature",
    "mcp_resources.feature",
    "mcp_resource_context.feature",
    "mcp_prompts.feature",
    "mcp_prompts_extended.feature",
)


def _go_json(v: Any) -> str:
    """Compact JSON like Go's json.Marshal (dict insertion order kept)."""
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False)


_ERR_TEXT = {
    40401: "subject not found",
    40402: "version not found",
    40403: "schema not found",
    40404: "subject has been deleted",
    40405: "subject must be soft-deleted before being permanently "
           "deleted",
    40406: "version has been deleted",
    40407: "version must be soft-deleted before being permanently "
           "deleted",
    40408: "subject-level compatibility not configured",
    40450: "exporter not found",
    40470: "key encryption key not found",
    40471: "data encryption key not found",
    40950: "exporter already exists",
    40970: "key encryption key already exists",
    40971: "data encryption key already exists",
    42201: "invalid schema",
    42202: "invalid version",
    42203: "invalid compatibility level",
    42204: "invalid mode",
    42205: "operation not permitted",
    42206: "has active references",
}


def _err(body) -> tuple[str, bool]:
    msg = None
    if isinstance(body, dict):
        msg = body.get("message") or _ERR_TEXT.get(body.get("error_code"))
    return f"error: {msg or 'request failed'}", True


def _qualify(ctx: str, subject: str) -> str:
    if ctx and ctx != "." and not subject.startswith(":"):
        return f":{ctx if ctx.startswith('.') else '.' + ctx}:{subject}"
    return subject


def _record_of(sim: RegistrySim, subject: str, row: dict,
               with_cv: bool = True) -> dict:
    """storage.SchemaRecord JSON shape (storage.go:99-111) with the
    confluent:version stamp (autoPopulateConfluentVersion)."""
    out = {"id": row["id"],
           "subject": re.sub(r"^:\.[^:]*:", "", subject),
           "version": row["version"],
           "schemaType": row["type"] or "AVRO",
           "schema": row["text"]}
    if row.get("references"):
        out["references"] = row["references"]
    md = row.get("metadata")
    if with_cv:
        md = sim._merge_meta(
            md, {"properties": {"confluent:version":
                                str(row["version"])}})
    if md is not None:
        out["metadata"] = md
    if row.get("rule_set") is not None:
        out["ruleSet"] = row["rule_set"]
    return out


def _http(sim: RegistrySim, verb: str, url: str, payload=None):
    return _dispatch_http(sim, verb, url,
                          _go_json(payload) if payload is not None
                          else None)


def _latest_row(sim: RegistrySim, subject: str):
    live = sim._live(sim.resolve_alias(subject))
    return max(live, key=lambda x: x["version"], default=None)


def _fields_of_row(x: dict) -> list[dict]:
    from axonops_schema_registry_spark.registry.fields import (
        extract_fields,
    )

    return extract_fields(x["text"], x["type"] or "AVRO")


def _cfg_camel(a: dict) -> dict:
    """MCP config inputs are snake_case (tools_metadata.go:100-114)."""
    m = {"compatibility_level": "compatibility",
         "compatibility_group": "compatibilityGroup",
         "validate_fields": "validateFields",
         "default_metadata": "defaultMetadata",
         "override_metadata": "overrideMetadata",
         "default_rule_set": "defaultRuleSet",
         "override_rule_set": "overrideRuleSet",
         "alias_for_deks": "aliasForDeks",
         "compatibility_policy": "compatibilityPolicy"}
    return {m.get(k, k): v for k, v in a.items()}


def _compat_advice(level: str, change_type: str) -> list[str]:
    """compatibilityAdvice (tools_comparison.go:275-325), verbatim."""
    if change_type == "add_field":
        if "BACKWARD" in level:
            return ["New fields MUST have a default value for backward "
                    "compatibility.",
                    "Consumers using the old schema will ignore the "
                    "new field."]
        if "FORWARD" in level:
            return ["New fields can be added freely in "
                    "forward-compatible mode.",
                    "However, old producers won't populate the new "
                    "field."]
        if "FULL" in level:
            return ["New fields MUST have a default value for full "
                    "compatibility.",
                    "Both old and new consumers/producers must handle "
                    "the field's presence or absence."]
        return ["With NONE compatibility, any change is allowed."]
    if change_type == "remove_field":
        if "BACKWARD" in level:
            return ["Removing fields is allowed in backward-compatible "
                    "mode if the field had a default value.",
                    "Consumers using the new schema must not depend on "
                    "the removed field."]
        if "FORWARD" in level:
            return ["Removing fields is NOT forward-compatible. Old "
                    "consumers still expect the field.",
                    "Consider deprecating the field first by adding "
                    "documentation."]
        if "FULL" in level:
            return ["Removing fields is only safe if the field had a "
                    "default value.",
                    "Ensure no consumers depend on the removed field."]
        return ["With NONE compatibility, any change is allowed."]
    if change_type == "rename_field":
        return ["Field renames are NOT directly compatible in any "
                "mode.",
                "Instead, add a new field with the desired name and a "
                "default value,",
                "then deprecate the old field. In Avro, use aliases "
                "for backward compatibility."]
    if change_type == "change_type":
        return ["Type changes are generally incompatible.",
                "Some promotions are allowed (e.g., int\u2192long, "
                "float\u2192double in Avro).",
                "For incompatible type changes, create a new field and "
                "deprecate the old one."]
    return ["Supported change types: add_field, remove_field, "
            "rename_field, change_type"]


def _suggest_evolution(row: dict, level: str, a: dict) -> dict:
    """suggestAddField / suggestDeprecateField / suggestAddEnumSymbol
    (tools_intelligence.go:600-715)."""
    change = a.get("change_type") or ""
    stype = row["type"] or "AVRO"
    if change == "add_field":
        fname = a.get("field_name") or "new_field"
        ftype = a.get("field_type") or "string"
        needs_default = "BACKWARD" in level or "FULL" in level
        out = {"change_type": "add_field", "field_name": fname,
               "field_type": ftype}
        if stype == "AVRO":
            if needs_default:
                out["advice"] = ("Add with default value for "
                                 f"{level} compatibility")
                out["snippet"] = (f'{{"name":"{fname}","type":["null",'
                                  f'"{ftype}"],"default":null}}')
            else:
                out["advice"] = ("Add without default since "
                                 f"compatibility level is {level}")
                out["snippet"] = f'{{"name":"{fname}","type":"{ftype}"}}'
        elif stype == "JSON":
            out["advice"] = ("Add to properties; do not add to "
                             "required array if backward-compatible")
            out["snippet"] = f'"{fname}":{{"type":"{ftype}"}}'
        else:
            out["advice"] = "Add with a new unique field number"
            out["snippet"] = f"{ftype} {fname} = <next_number>;"
        return out
    if change == "deprecate_field":
        fname = a.get("field_name") or ""
        out = {"change_type": "deprecate_field", "field_name": fname}
        if stype == "AVRO":
            out["advice"] = ("Add @deprecated to doc, add aliases for "
                             "future rename, set default value")
            out["steps"] = [
                '1. Add "doc": "@deprecated Use new_field instead" to '
                "the field",
                "2. Add a default value if one doesn't exist",
                "3. In a future version, the field can be removed "
                "after all consumers migrate"]
        elif stype == "JSON":
            out["advice"] = ("Mark as deprecated in description, "
                             "remove from required array")
            out["steps"] = [
                '1. Add "deprecated": true to the field\'s schema',
                '2. Remove the field from the "required" array if '
                "present",
                '3. Add "description": "Deprecated: use new_field '
                'instead"']
        else:
            out["advice"] = "Use the deprecated option on the field"
            out["steps"] = [
                "1. Add [deprecated = true] option to the field",
                "2. Add a comment explaining the migration path"]
        return out
    if change == "add_enum_symbol":
        symbol = a.get("enum_symbol") or "NEW_SYMBOL"
        out = {"change_type": "add_enum_symbol", "symbol": symbol}
        if stype == "AVRO":
            out["advice"] = ("Add the new symbol to the end of the "
                             "symbols array. This is "
                             "backward-compatible.")
            out["note"] = "Never remove or reorder existing symbols."
        elif stype == "PROTOBUF":
            out["advice"] = ("Add the new value to the enum with the "
                             "next available number.")
            out["note"] = ("Never reuse field numbers from removed "
                           "enum values.")
        else:
            out["advice"] = "Add the new value to the enum array."
        return out
    return {"error": "unsupported change_type",
            "supported_types": ["add_field", "deprecate_field",
                                "add_enum_symbol"]}


def _kms_camel(a: dict) -> dict:
    """MCP DEK inputs are snake_case (tools_dek.go:87-94); the sim's
    store uses the HTTP camelCase keys."""
    m = {"kms_type": "kmsType", "kms_key_id": "kmsKeyId",
         "kms_props": "kmsProps",
         "encrypted_key_material": "encryptedKeyMaterial"}
    return {m.get(k, k): v for k, v in a.items()}


def _config_write(sim: RegistrySim, name: str, a: dict,
                  subject: str, ctx: str):
    def ok_json(v):
        return _go_json(v), False

    if name == "set_config":
        level = a.get("compatibility_level") or ""
        if not subject and ctx != ".":
            ck = f":{ctx if ctx.startswith('.') else '.' + ctx}:"
            st, body = sim.set_subject_config(ck, level)
        elif subject:
            st, body = sim.set_subject_config(subject, level)
        else:
            st, body = sim.set_global_config(level)
        if st != 200:
            return _err(body)
        return ok_json({"compatibilityLevel": level.upper()})
    if name == "delete_config":
        st, body = (sim.delete_subject_config(subject) if subject
                    else sim.delete_global_config())
        if st != 200:
            return _err(body)
        return ok_json({"compatibilityLevel": body["compatibilityLevel"]})
    level = a.get("compatibility_level") or a.get("compatibility") or ""
    extra = _cfg_camel(a)
    st, body = (sim.set_subject_config(subject, level, extra=extra)
                if subject
                else sim.set_global_config(level, extra=extra))
    if st != 200:
        return _err(body)
    return ok_json({"compatibilityLevel": level.upper()})


_CONTENT_DIR = os.path.join(os.path.dirname(MCP_DIR),
                            "..", "..", "..", "internal", "mcp",
                            "content")
_CONTENT_DIR = os.path.normpath(os.path.join(
    FEATURES_DIR, "..", "..", "..", "internal", "mcp", "content"))


def read_resource(sim: RegistrySim, uri: str):
    """schema:// resource reads (resources.go / glossary.go) →
    (text, error|None)."""
    m = re.match(r"schema://([^/]+)(?:/(.*))?$", uri)
    if not m:
        return None, f"unknown resource URI {uri}"
    host, rest = m.group(1), m.group(2) or ""
    ctx = "."
    if host == "contexts" and rest:
        segs = rest.split("/")
        if len(segs) == 1:
            _, body = sim.list_contexts()
            return _go_json(body), None
        ctx = segs[0] if segs[0].startswith(".") else "." + segs[0]
        host, rest = segs[1], "/".join(segs[2:])
        if host == "config" and not rest:
            # contexts/{ctx}/config -> the server-config shape
            host, rest = "server", "config"

    def q(subject: str) -> str:
        return _qualify(ctx, subject)

    if host == "glossary":
        path = os.path.join(_CONTENT_DIR, "glossary", rest + ".md")
        if not os.path.exists(path):
            return None, f"unknown glossary {rest}"
        return open(path, encoding="utf-8").read(), None
    if host == "server" and rest == "info":
        return _go_json({"version": "dev", "commit": "",
                         "build_time": "",
                         "schema_types": ["AVRO", "PROTOBUF",
                                          "JSON"]}), None
    if host == "server" and rest == "config":
        level = sim._resolved_level(q("x") if ctx != "." else "x")
        return _go_json({"compatibility":
                         {"compatibilityLevel": level},
                         "mode": sim.resolved_mode(
                             q("x") if ctx != "." else "x")}), None
    if host == "subjects" and not rest:
        _, body = sim.list_subjects(ctx=ctx if ctx != "." else None)
        return _go_json(body), None
    if host == "types":
        return _go_json(["AVRO", "PROTOBUF", "JSON"]), None
    if host == "contexts":
        _, body = sim.list_contexts()
        return _go_json(body), None
    if host == "mode":
        return _go_json({"mode": sim.resolved_mode(
            q("x") if ctx != "." else "x")}), None
    if host == "keks" and not rest:
        return _go_json([sim._kek_body(k)
                         for n2, k in sorted(sim.keks.items())
                         if not k["deleted"]]), None
    if host == "keks":
        segs = rest.split("/")
        k = sim.keks.get(segs[0])
        if k is None or k["deleted"]:
            return None, f"KEK not found {segs[0]}"
        if len(segs) == 1:
            return _go_json(sim._kek_body(k)), None
        if segs[1] == "deks":
            st, body = sim.dek_list(segs[0])
            return _go_json(body), None
    if host == "exporters" and not rest:
        return _go_json(sorted(sim.exporters)), None
    if host == "exporters":
        e = sim.exporters.get(rest)
        if e is None:
            return None, f"exporter not found {rest}"
        return _go_json(sim._exporter_body(e)), None
    if host == "status":
        return _go_json({"healthy": True, "version": "dev",
                         "cluster_id": "default-cluster"}), None
    if host == "subjects":
        segs = rest.split("/")
        subject = q(segs[0])
        if len(segs) == 1:
            row = _latest_row(sim, subject)
            if row is None:
                return None, "subject not found"
            level = sim._resolved_level(subject)
            return _go_json({"subject": segs[0],
                             "latest": _record_of(sim, subject, row,
                                                  with_cv=False),
                             "compatibility":
                                 {"compatibilityLevel": level}}), None
        if segs[1] == "versions" and len(segs) == 2:
            st, body = sim.list_versions(subject)
            if st != 200:
                return None, "subject not found"
            return _go_json(body), None
        if segs[1] == "versions" and len(segs) == 3:
            live = sim._live(sim.resolve_alias(subject))
            row = next((x for x in live
                        if str(x["version"]) == segs[2]), None)
            if row is None:
                return None, "version not found"
            return _go_json(_record_of(sim, subject, row,
                                       with_cv=False)), None
        if segs[1] == "config":
            level = sim._resolved_level(subject)
            return _go_json({"compatibilityLevel": level}), None
        if segs[1] == "mode":
            return _go_json({"mode":
                             sim.resolved_mode(subject)}), None
    if host == "schemas":
        segs = rest.split("/")
        try:
            sid = int(segs[0])
        except ValueError:
            return None, f"invalid schema ID {segs[0]}"
        if len(segs) == 1:
            st, body = sim.schema_by_id(sid, ctx)
            if st != 200:
                return None, "schema not found"
            return _go_json(body), None
        if segs[1] == "subjects":
            st, body = sim.subjects_for_id(sid, ctx)
            return _go_json(body if st == 200 else []), None
        if segs[1] == "versions":
            st, body = sim.versions_for_id(sid, ctx)
            return _go_json(body if st == 200 else []), None
    return None, f"unknown resource URI {uri}"


_PROMPT_META: dict[str, str] | None = None


def _prompt_descriptions() -> dict[str, str]:
    """Prompt name → description, parsed from the reference's
    prompts.go AddPrompt blocks."""
    global _PROMPT_META
    if _PROMPT_META is None:
        path = os.path.normpath(os.path.join(
            FEATURES_DIR, "..", "..", "..", "internal", "mcp",
            "prompts.go"))
        meta: dict[str, str] = {}
        if os.path.exists(path):
            text = open(path, encoding="utf-8").read()
            for m in re.finditer(
                    r'Name:\s+"([a-z0-9-]+)",\s*\n\s*'
                    r'Description:\s+"((?:[^"\\]|\\.)*)"', text):
                meta[m.group(1)] = m.group(2)
        _PROMPT_META = meta
    return _PROMPT_META


#: static prompts: name -> (file, fixed description) — prompts.go
_PROMPTS_STATIC = {
    "getting-started": "Quick-start guide for the Schema Registry MCP "
                       "server",
    "troubleshooting": "Troubleshooting guide for schema registry "
                       "issues",
    "naming-conventions": "Subject naming conventions guide",
    "context-management": "Multi-tenant context management guide",
    "import-from-confluent": "Confluent migration workflow",
    "setup-rbac": "Authentication and RBAC configuration guide",
    "schema-references-guide": "Schema references guide with "
                               "per-format semantics",
    "full-encryption-lifecycle": "End-to-end CSFLE encryption "
                                 "lifecycle",
    "data-rules-deep-dive": "Data contract rules deep dive",
    "registry-health-audit": "Registry health audit procedure",
    "schema-evolution-cookbook": "Schema evolution cookbook with "
                                 "practical recipes",
    "debug-deserialization": "Consumer deserialization troubleshooting "
                             "guide",
    "cicd-integration": "CI/CD pipeline integration guide",
    "governance-setup": "Schema governance setup guide",
    "metrics-health-check": "Analyze schema registry health using "
                            "metrics",
}

#: subject-templated prompts: name -> (desc fmt, enrichment fmt) where
#: the enrichment appends the subject's live latest version info
_PROMPTS_SUBJECT = {
    "evolve-schema": ('Schema evolution guide for "{s}"',
                      "\n\nCurrent latest version: {v}, schema type: "
                      "{t}"),
    "review-schema-quality": ('Schema quality review for "{s}"',
                              "\n\nCurrent version: {v}, type: {t}"),
    "plan-breaking-change": ('Breaking change plan for "{s}"',
                             "\n\nCurrent version: {v}, type: {t}"),
    "setup-data-contracts": ('Data contracts setup for "{s}"',
                             "\n\nCurrent version: {v}, type: {t}"),
    "impact-analysis": ('Impact analysis guide for "{s}"',
                        "\n\nCurrent version: {v}, type: {t}"),
    "deprecate-subject": ('Deprecation workflow for "{s}"',
                          "\n\nCurrent version: {v}, type: {t}"),
    "schema-review-checklist": ('Schema review checklist for "{s}"',
                                "\n\nCurrent latest version: {v}, "
                                "type: {t}"),
    "audit-subject-history": ('Version history audit for "{s}"', None),
    "check-compatibility": ('Compatibility troubleshooting for "{s}"',
                            None),
}

#: glossary-lookup keyword routing (prompts.go:696-713)
_GLOSSARY_KEYWORDS = [
    ("core-concepts", ["subject", "version", "schema id", "wire format",
                       "dedup", "fingerprint", "mode", "naming",
                       "strategy", "register", "serializ"]),
    ("compatibility", ["compatibility", "backward", "forward", "full",
                       "transitive", "compat", "promotion", "alias"]),
    ("data-contracts", ["data contract", "metadata", "ruleset", "rule",
                        "tag", "merge", "governance", "domain rule",
                        "migration rule", "encoding rule",
                        "concurrency"]),
    ("encryption", ["encrypt", "csfle", "kek", "dek", "kms", "vault",
                    "envelope", "key rotation", "rewrap", "aes"]),
    ("contexts", ["context", "multi-tenant", "tenant", "namespace",
                  "isolation", "inheritance", "global", "__global"]),
    ("exporters", ["exporter", "schema link", "linking", "replicate",
                   "disaster recovery"]),
    ("schema-types", ["avro", "protobuf", "proto", "json schema",
                      "logical type", "wire type", "canonicali",
                      "draft"]),
    ("design-patterns", ["pattern", "envelope", "lifecycle", "snapshot",
                         "delta", "fat", "thin", "rename", "ci/cd",
                         "dlq", "dead letter"]),
    ("best-practices", ["best practice", "naming", "convention",
                        "mistake", "antipattern", "guidance"]),
    ("migration", ["migrat", "confluent", "import", "import mode",
                   "id preserv"]),
    ("mcp-configuration", ["mcp config", "tool policy", "permission",
                           "preset", "read-only", "confirmation",
                           "origin"]),
    ("error-reference", ["error code", "error ref", "40401", "42201",
                         "diagnostic"]),
    ("auth-and-security", ["auth", "rbac", "role", "api key",
                           "rate limit", "audit"]),
    ("storage-backends", ["storage", "backend", "postgres", "mysql",
                          "cassandra", "stateless"]),
    ("normalization-and-fingerprinting", ["fingerprint", "normal",
                                          "canonical", "sha-256",
                                          "dedup"]),
    ("tool-selection-guide", ["tool", "which tool", "how to",
                              "decision tree", "find schema"]),
]

#: debug-registration-error inline diagnostics — the key lines of the
#: reference's per-code guidance (prompts.go:500-620)
_DEBUG_GUIDES = {
    "42201": "Error 42201: Invalid schema\n\nThe schema failed "
             "validation.\n1. Use validate_schema to get a detailed "
             "error message",
    "409": "Error 409: Incompatible schema\n\n1. Use get_config to "
           "check the compatibility level\n2. Use check_compatibility "
           "to get detailed incompatibility reasons\n3. Use "
           "explain_compatibility_failure to understand what changed",
    "40401": "Error 40401: Subject not found\n\n1. Use list_subjects "
             "to see all available subjects\n2. Use match_subjects to "
             "find similarly named subjects",
    "40402": "Error 40402: Version not found\n\n1. Use list_versions "
             "to see available versions for the subject",
    "40403": "Error 40403: Schema not found\n\n1. Use "
             "get_max_schema_id to see the ID range",
}


def _prompt_file(name: str) -> str | None:
    path = os.path.join(_CONTENT_DIR, "prompts", name + ".md")
    if not os.path.exists(path):
        return None
    return open(path, encoding="utf-8").read()


def get_prompt(sim: RegistrySim, name: str, args: dict):
    """(text, description, error|None) — the reference's prompt
    handlers: content files with {placeholder} substitution, live
    registry enrichment, and dynamic descriptions.  Prompts registered
    under a 'schema-' prefix resolve to the same handlers."""
    if name.startswith("schema-") and name not in _PROMPTS_SUBJECT \
            and name not in _PROMPTS_STATIC and \
            name not in ("schema-review-checklist",
                         "schema-evolution-cookbook",
                         "schema-references-guide"):
        name = name[len("schema-"):]
    if name in _PROMPTS_STATIC:
        text = _prompt_file(name)
        if text is None:
            return None, "", f"unknown prompt {name}"
        return text, _PROMPTS_STATIC[name], None
    if name == "design-schema":
        fmt_ = (args.get("format") or "").upper()
        if not fmt_:
            return None, "", "required argument 'format' is missing"
        fname = {"AVRO": "design-schema-avro",
                 "PROTOBUF": "design-schema-protobuf",
                 "JSON": "design-schema-json"}.get(fmt_)
        desc = f"Schema design guide for {fmt_} format"
        if fname is None:
            return (f'Unknown format "{fmt_}". Supported formats: '
                    "AVRO, PROTOBUF, JSON.", desc, None)
        text = _prompt_file(fname) or ""
        domain = args.get("domain")
        if domain:
            text = (f'Design a {fmt_} schema for the "{domain}" '
                    f"domain.\n\n{text}")
        return text, desc, None
    if name in _PROMPTS_SUBJECT:
        subject = args.get("subject") or ""
        if not subject:
            return None, "", "required argument 'subject' is missing"
        desc_fmt, enrich = _PROMPTS_SUBJECT[name]
        text = (_prompt_file(name) or "").replace("{subject}", subject)
        ctx = args.get("context") or "."
        qsubject = _qualify(ctx, subject)
        row = _latest_row(sim, qsubject)
        if name == "audit-subject-history":
            st, vers = sim.list_versions(qsubject)
            if st == 200:
                text += ("\n\nRegistered versions: ["
                         + " ".join(str(v) for v in vers) + "]")
        elif name == "check-compatibility":
            level = sim._resolved_level(qsubject)
            text += f"\n\nCurrent compatibility level: {level}"
        elif row is not None and enrich:
            text += enrich.format(v=row["version"],
                                  t=row["type"] or "AVRO")
        return text, desc_fmt.format(s=subject), None
    if name == "migrate-schemas":
        src_f = (args.get("source_format") or "").upper()
        tgt_f = (args.get("target_format") or "").upper()
        if not src_f or not tgt_f:
            return None, "", ("required arguments 'source_format' and "
                              "'target_format' are missing")
        text = (_prompt_file(name) or "") \
            .replace("{source}", src_f).replace("{target}", tgt_f)
        return text, f"Migration guide from {src_f} to {tgt_f}", None
    if name == "setup-encryption":
        kms = args.get("kms_type") or ""
        if not kms:
            return None, "", "required argument 'kms_type' is missing"
        text = (_prompt_file(name) or "").replace("{kms_type}", kms)
        return text, f"Encryption setup guide for {kms}", None
    if name == "configure-exporter":
        etype = args.get("exporter_type") or "AUTO"
        text = (_prompt_file(name) or "").replace("{exporter_type}",
                                                  etype)
        return text, f"Exporter configuration guide ({etype} context)", \
            None
    if name == "new-kafka-topic":
        topic = args.get("topic_name") or ""
        if not topic:
            return None, "", "required argument 'topic_name' is missing"
        fmt_ = (args.get("format") or "AVRO").upper()
        text = (_prompt_file(name) or "") \
            .replace("{topic_name}", topic).replace("{format}", fmt_)
        return text, f'Kafka topic setup for "{topic}" ({fmt_})', None
    if name == "team-onboarding":
        team = args.get("team_name") or ""
        if not team:
            return None, "", "required argument 'team_name' is missing"
        text = (_prompt_file(name) or "").replace("{team_name}", team)
        return text, f'Team onboarding workflow for "{team}"', None
    if name == "cross-cutting-change":
        field = args.get("field_name") or ""
        if not field:
            return None, "", "required argument 'field_name' is missing"
        text = (_prompt_file(name) or "").replace("{field_name}", field)
        return text, \
            f'Cross-cutting change workflow for field "{field}"', None
    if name == "compare-formats":
        use_case = args.get("use_case") or ""
        if not use_case:
            return None, "", "required argument 'use_case' is missing"
        text = (_prompt_file(name) or "").replace("{use_case}",
                                                  use_case)
        return text, f'Format comparison for "{use_case}"', None
    if name == "glossary-lookup":
        topic = (args.get("topic") or "").lower()
        if not topic:
            return None, "", "required argument 'topic' is missing"
        matched = next(
            (f"schema://glossary/{slug}"
             for slug, kws in _GLOSSARY_KEYWORDS
             if any(kw in topic for kw in kws)),
            "schema://glossary/core-concepts")
        text = (_prompt_file(name) or "") \
            .replace("{topic}", topic).replace("{matched_uri}", matched)
        return text, f'Glossary lookup for "{topic}"', None
    if name == "debug-registration-error":
        code = str(args.get("error_code") or "")
        if not code:
            return None, "", "required argument 'error_code' is missing"
        guide = _DEBUG_GUIDES.get(code)
        if guide is None:
            fallback = _prompt_file(name) or ""
            guide = f"Error code: {code}\n\n{fallback}"
        return guide, f"Debug guide for error code {code}", None
    return None, "", f"unknown prompt {name}"


#: tool -> required permission scope ("" = always allowed), and the
#: preset -> scope sets (permissions.go:10-205)
_SYSTEM_TOOLS = {
    "health_check", "get_server_info", "get_server_version",
    "get_cluster_id", "get_schema_types", "list_contexts",
    "count_subjects", "get_registry_statistics", "get_metrics_summary",
    "get_metrics_by_category", "query_metric", "list_metrics"}
_SCOPE_TOOLS = {
    "schema_read": {
        "get_schema_by_id", "get_raw_schema_by_id", "get_schema_version",
        "get_raw_schema_version", "get_latest_schema", "list_versions",
        "get_subjects_for_schema", "get_versions_for_schema",
        "get_referenced_by", "lookup_schema", "list_schemas",
        "get_max_schema_id", "list_subjects", "get_schemas_by_subject",
        "get_schema_history", "get_dependency_graph", "export_schema",
        "export_subject", "count_versions", "search_schemas",
        "match_subjects", "format_schema", "resolve_alias",
        "get_subject_metadata", "validate_schema", "normalize_schema",
        "validate_subject_name", "check_compatibility",
        "find_schemas_by_field", "find_schemas_by_type",
        "find_similar_schemas", "score_schema_quality",
        "check_field_consistency", "get_schema_complexity",
        "detect_schema_patterns", "suggest_schema_evolution",
        "plan_migration_path", "check_compatibility_multi",
        "diff_schemas", "compare_subjects", "suggest_compatible_change",
        "explain_compatibility_failure"},
    "schema_write": {"register_schema"},
    "schema_delete": {"delete_subject", "delete_version"},
    "config_read": {"get_config", "get_config_full",
                    "get_subject_config_full",
                    "get_global_config_direct"},
    "config_write": {"set_config", "set_config_full", "delete_config"},
    "mode_read": {"get_mode", "check_write_mode"},
    "mode_write": {"set_mode", "delete_mode"},
    "import": {"import_schemas"},
    "encryption_read": {"get_kek", "list_keks", "get_dek", "list_deks",
                        "list_dek_versions"},
    "encryption_write": {"create_kek", "update_kek", "delete_kek",
                         "undelete_kek", "test_kek", "create_dek",
                         "delete_dek", "undelete_dek", "rewrap_dek"},
    "exporter_read": {"list_exporters", "get_exporter",
                      "get_exporter_status", "get_exporter_config"},
    "exporter_write": {"create_exporter", "update_exporter",
                       "delete_exporter", "pause_exporter",
                       "resume_exporter", "reset_exporter",
                       "update_exporter_config"},
    "admin_read": {"list_users", "get_user", "get_user_by_username",
                   "list_apikeys", "get_apikey", "list_roles"},
    "admin_write": {"create_user", "update_user", "delete_user",
                    "change_password", "create_apikey", "update_apikey",
                    "delete_apikey", "revoke_apikey", "rotate_apikey"},
}
_PRESETS = {
    "readonly": {"schema_read", "config_read", "mode_read",
                 "encryption_read", "exporter_read"},
    "developer": {"schema_read", "config_read", "mode_read",
                  "encryption_read", "exporter_read", "schema_write",
                  "config_write"},
    "operator": {"schema_read", "config_read", "mode_read",
                 "encryption_read", "exporter_read", "schema_write",
                 "config_write", "schema_delete", "mode_write",
                 "encryption_write", "exporter_write", "import"},
    "admin": {"schema_read", "config_read", "mode_read",
              "encryption_read", "exporter_read", "schema_write",
              "config_write", "schema_delete", "mode_write",
              "encryption_write", "exporter_write", "import",
              "admin_read", "admin_write"},
    "full": None,
}


def allowed_tools(scopes) -> list[str]:
    out = set(_SYSTEM_TOOLS)
    for scope, tools in _SCOPE_TOOLS.items():
        if scopes is None or scope in scopes:
            out |= tools
    return sorted(out)


def tool_allowed(name: str, scopes) -> bool:
    if scopes is None or name in _SYSTEM_TOOLS:
        return True
    return any(name in _SCOPE_TOOLS.get(s, ()) for s in scopes)


def _confirm_scope(name: str, a: dict):
    """(requires?, scope-args) per confirmableTools + call sites
    (confirmation.go:149-158, tools_*.go)."""
    def b(k):
        v = a.get(k)
        return v if isinstance(v, bool) else str(v).lower() == "true"

    if name == "delete_subject" and b("permanent"):
        return {"subject": a.get("subject"), "permanent": True}
    if name == "delete_version" and b("permanent"):
        return {"subject": a.get("subject"),
                "version": a.get("version"), "permanent": True}
    if name == "import_schemas":
        return {"schema_count": len(a.get("schemas") or []),
                "schemas_hash": _go_json(a.get("schemas") or [])}
    if name == "set_mode" and \
            str(a.get("mode") or "").upper() == "IMPORT":
        return {"subject": a.get("subject"), "mode": a.get("mode")}
    if name == "delete_config" and not a.get("subject"):
        return {"subject": ""}
    if name == "delete_kek" and b("permanent"):
        return {"name": a.get("name"), "permanent": True}
    if name == "delete_dek" and b("permanent"):
        return {"kek_name": a.get("kek_name"),
                "subject": a.get("subject"),
                "version": a.get("version"),
                "algorithm": a.get("algorithm"), "permanent": True}
    if name == "delete_exporter":
        return {"name": a.get("name")}
    return None


def _confirm_check(sim: RegistrySim, name: str, a: dict):
    """Two-phase confirmation (confirmation.go:187-286). Returns a
    (text, is_error) result to short-circuit with, or None to proceed."""
    if not getattr(sim, "_confirm_enabled", False):
        return None
    scope = _confirm_scope(name, a)
    if scope is None:
        return None
    store = getattr(sim, "_confirm_tokens", None)
    if store is None:
        store = sim._confirm_tokens = {}
    key = (name, _go_json(scope))
    if a.get("dry_run"):
        sim._ts += 1
        token = f"confirm-{sim._ts}"
        store[token] = {"key": key, "used": False}
        bdd_audit.mcp_event(sim, "mcp_confirm_issued", name)
        bdd_audit.metrics_of(sim).record_mcp_confirmation(
            "token_issued")
        preview = {"action": name, **{k: v for k, v in scope.items()
                                      if k != "schemas_hash"}}
        return _go_json({"confirmation_required": True,
                         "confirm_token": token, "preview": preview,
                         "message": "This operation requires "
                         f"confirmation. To proceed, call {name} again "
                         "with confirm_token set to the token above "
                         "and dry_run omitted or false."}), False
    token = a.get("confirm_token")
    if token:
        entry = store.get(token)
        if entry is None:
            bdd_audit.mcp_event(sim, "mcp_confirm_rejected", name)
            bdd_audit.metrics_of(sim).record_mcp_confirmation(
                "token_rejected")
            return ("error: confirmation failed: invalid or expired "
                    "confirmation token", True)
        if entry["used"]:
            bdd_audit.mcp_event(sim, "mcp_confirm_rejected", name)
            return ("error: confirmation failed: confirmation token "
                    "has already been used", True)
        if entry["key"][0] != name:
            bdd_audit.mcp_event(sim, "mcp_confirm_rejected", name)
            return (f"error: confirmation failed: confirmation token "
                    f"was issued for tool \"{entry['key'][0]}\", not "
                    f"\"{name}\"", True)
        if entry["key"] != key:
            bdd_audit.mcp_event(sim, "mcp_confirm_rejected", name)
            return ("error: confirmation failed: confirmation token "
                    "does not match the provided arguments", True)
        entry["used"] = True
        bdd_audit.mcp_event(sim, "mcp_confirmed", name)
        bdd_audit.metrics_of(sim).record_mcp_confirmation("confirmed")
        return None
    bdd_audit.metrics_of(sim).record_mcp_policy_denial(
        "confirmation_required")
    return _go_json({"error": "confirmation_required",
                     "confirmation_required": True,
                     "message": "This destructive operation requires "
                     f"confirmation. Call {name} with dry_run=true "
                     "first to get a confirmation token."}), False


def call_tool(sim: RegistrySim, name: str, a: dict) -> tuple[str, bool]:
    """Dispatch one MCP tool call → (result_text, is_error)."""
    ctx = a.get("context") or "."
    subject = _qualify(ctx, a.get("subject") or "") \
        if a.get("subject") else ""

    def ok_json(v) -> tuple[str, bool]:
        return _go_json(v), False

    blocked = _confirm_check(sim, name, a)
    if blocked is not None:
        return blocked

    # --- config / mode (tools_config.go) ------------------------------
    if name == "get_config":
        if subject and subject in sim.levels:
            return ok_json(sim._cfg_body(
                {"compatibilityLevel": sim.levels[subject]},
                sim.cfg_extra.get(subject)))
        level = sim._resolved_level(subject or (f":{ctx}:x"
                                                if ctx != "." else "x"))
        return ok_json({"compatibilityLevel": level})
    if name in ("set_config", "set_config_full", "delete_config"):
        # MCP config tools call registry.SetConfig/DeleteConfig directly
        # — no CheckModeForWrite gate (tools_config.go/tools_metadata.go)
        saved_modes = (sim.root_mode, dict(sim.subj_modes))
        sim.root_mode, sim.subj_modes = None, {}
        try:
            return _config_write(sim, name, a, subject, ctx)
        finally:
            sim.root_mode, sim.subj_modes = saved_modes
    if name == "get_mode":
        return ok_json({"mode": sim.resolved_mode(
            subject or (f":{ctx}:x" if ctx != "." else "x"))})
    if name == "set_mode":
        mode = a.get("mode") or ""
        force = bool(a.get("force"))
        st, body = (sim.set_subject_mode(subject, mode, force=force)
                    if subject
                    else sim.set_global_mode(mode, force=force))
        if st != 200:
            return _err(body)
        return ok_json(body)
    if name == "delete_mode":
        st, body = (sim.delete_subject_mode(subject) if subject
                    else sim.delete_global_mode())
        if st != 200:
            return _err(body)
        return ok_json(body)

    # --- server basics + schema reads (tools.go / tools_schema.go) ----
    if name == "health_check":
        return "Schema registry is healthy", False
    if name == "get_server_info":
        return ok_json({"version": "dev",
                        "schema_types": ["AVRO", "PROTOBUF", "JSON"]})
    if name == "list_subjects":
        st, body = sim.list_subjects(deleted=bool(a.get("deleted")),
                                     ctx=ctx if ctx != "." else None)
        if a.get("prefix"):
            body = [s for s in body if s.startswith(a["prefix"])]
        if a.get("pattern"):
            try:
                rx = re.compile(a["pattern"])
            except re.error as exc:
                return (f"error: invalid regex pattern: {exc}", True)
            body = [s for s in body if rx.search(s)]
        return ok_json(body)
    if name == "get_latest_schema":
        st, body = sim.get_version(subject, "latest")
        if st != 200:
            return _err(body)
        row = next(x for x in sim._live(sim.resolve_alias(subject))
                   if x["version"] == body["version"])
        return ok_json(_record_of(sim, subject, row))
    if name == "get_schema_version":
        st, body = sim.get_version(subject, a.get("version"))
        if st != 200:
            return _err(body)
        row = next(x for x in sim._live(sim.resolve_alias(subject))
                   if x["version"] == body["version"])
        return ok_json(_record_of(sim, subject, row))
    if name == "get_raw_schema_version":
        st, body = sim.raw_schema(subject, a.get("version"))
        if st != 200:
            return _err(body)
        return body, False
    if name == "get_schema_by_id":
        st, body = sim.schema_by_id(int(a.get("id") or 0), ctx)
        if st != 200:
            return _err(body)
        return ok_json(body)
    if name == "get_raw_schema_by_id":
        st, body = sim.schema_by_id(int(a.get("id") or 0), ctx)
        if st != 200:
            return _err(body)
        return body["schema"], False
    if name == "list_versions":
        st, body = sim.list_versions(subject,
                                     deleted=bool(a.get("deleted")))
        if st != 200:
            return _err(body)
        return ok_json(body)
    if name == "get_subjects_for_schema":
        st, body = sim.subjects_for_id(int(a.get("id") or 0), ctx,
                                       deleted=bool(a.get("deleted")))
        if st != 200:
            return _err(body)
        return ok_json(body)
    if name == "get_versions_for_schema":
        st, body = sim.versions_for_id(int(a.get("id") or 0), ctx,
                                       deleted=bool(a.get("deleted")))
        if st != 200:
            return _err(body)
        return ok_json(body)
    if name == "get_referenced_by":
        st, body = sim.get_version(subject, a.get("version"))
        if st != 200:
            return _err(body)
        return ok_json(sim._referenced_by(sim.resolve_alias(subject),
                                          {body["version"]}))
    if name == "lookup_schema":
        st, body = sim.lookup(subject, a.get("schema") or "",
                              (a.get("schema_type") or "AVRO").upper(),
                              deleted=bool(a.get("deleted")))
        if st != 200:
            return _err(body)
        return ok_json(body)
    if name == "get_schema_types":
        return ok_json(["AVRO", "JSON", "PROTOBUF"])
    if name == "list_schemas":
        st, body = _http(sim, "GET", "/schemas")
        return ok_json(body)
    if name == "get_max_schema_id":
        mx = max((i for (c, _), i in sim.ids.items() if c == ctx),
                 default=0)
        return ok_json({"max_id": mx})

    # --- schema writes (tools_write.go) -------------------------------
    if name == "register_schema":
        saved = (sim.root_mode, dict(sim.subj_modes))
        sim.root_mode, sim.subj_modes = None, {}
        try:
            st, body = sim.register(
                subject, a.get("schema") or "",
                (a.get("schema_type") or "AVRO").upper(),
                metadata=a.get("metadata"),
                rule_set=a.get("rule_set"),
                references=a.get("references"))
        finally:
            sim.root_mode, sim.subj_modes = saved
        if st != 200:
            return _err(body)
        target = sim.resolve_alias(subject)
        row = next(x for x in sim.subjects.get(target, [])
                   if x["version"] == body["version"])
        return ok_json(_record_of(sim, target, row))
    if name in ("delete_subject", "delete_version"):
        # MCP write tools call the registry directly — the HTTP-layer
        # CheckModeForWrite gate does not apply (tools_write.go)
        saved = (sim.root_mode, dict(sim.subj_modes))
        sim.root_mode, sim.subj_modes = None, {}
        try:
            if name == "delete_subject":
                st, body = sim.delete_subject(
                    subject, permanent=bool(a.get("permanent")))
            else:
                st, body = sim.delete_version(
                    subject, a.get("version"),
                    permanent=bool(a.get("permanent")))
        finally:
            sim.root_mode, sim.subj_modes = saved
        if st != 200:
            return _err(body)
        return ok_json(body if name == "delete_subject"
                       else {"version": body})
    if name == "check_compatibility":
        live = sim._live(sim.resolve_alias(subject))
        stype = (a.get("schema_type") or "AVRO").upper()
        ver = a.get("version") or "latest"
        level = sim._resolved_level(subject)
        base = level.replace("_TRANSITIVE", "")
        if ver in ("latest", -1):
            targets = [max(live, key=lambda v: v["version"])] \
                if live else []
        elif str(ver) == "all":
            base = level if level == "NONE" or \
                level.endswith("_TRANSITIVE") else level + "_TRANSITIVE"
            targets = live
        else:
            t = next((v for v in live
                      if v["version"] == int(ver)), None)
            if t is None:
                return _err({"error_code": 40402})
            targets = [t]
        ok, msgs = sim.compat_ok(subject, a.get("schema") or "", stype,
                                 base if targets else "NONE", targets,
                                 cand_refs=a.get("references"))
        out = {"is_compatible": ok}
        if msgs:
            out["messages"] = msgs
        return ok_json(out)

    # --- contexts / import (tools_context.go) -------------------------
    if name == "list_contexts":
        st, body = sim.list_contexts()
        return ok_json(body)
    if name == "import_schemas":
        st, body = sim.import_schemas({"schemas": a.get("schemas") or []})
        if st not in (200, 422) or "results" not in (body or {}):
            return _err(body)
        if st == 422:
            return _err({"message": "import failed: " + _go_json(body)})
        return ok_json(body)

    # --- DEK registry (tools_dek.go) ----------------------------------
    if name in ("create_kek", "get_kek", "update_kek", "delete_kek",
                "undelete_kek", "list_keks", "create_dek", "get_dek",
                "list_deks", "list_dek_versions", "delete_dek",
                "undelete_dek", "rewrap_dek", "test_kek"):
        kek = a.get("kek_name") or a.get("name") or ""
        algo = a.get("algorithm") or ""
        dek_subject = a.get("subject") or ""
        if name == "create_kek":
            st, body = sim.kek_create(_kms_camel(a))
        elif name == "get_kek":
            st, body = sim.kek_get(kek, deleted=bool(a.get("deleted")))
        elif name == "update_kek":
            st, body = sim.kek_update(kek, _kms_camel(a))
        elif name == "delete_kek":
            st, body = sim.kek_delete(
                kek, permanent=bool(a.get("permanent")))
            body = {"deleted": True} if st == 204 else body
        elif name == "undelete_kek":
            st, body = sim.kek_undelete(kek)
            body = {"undeleted": True} if st == 204 else body
        elif name == "list_keks":
            st, body = sim.kek_list(deleted=bool(a.get("deleted")))
        elif name == "create_dek":
            st, body = sim.dek_create(kek, _kms_camel(a))
        elif name == "get_dek":
            st, body = sim.dek_get(kek, dek_subject,
                                   int(a.get("version") or -1), algo,
                                   deleted=bool(a.get("deleted")))
        elif name == "list_deks":
            st, body = sim.dek_list(kek, deleted=bool(a.get("deleted")))
        elif name == "list_dek_versions":
            st, body = sim.dek_versions(
                kek, dek_subject, algo, deleted=bool(a.get("deleted")))
        elif name == "delete_dek":
            st, body = sim.dek_delete(
                kek, dek_subject, int(a.get("version") or -1), algo,
                permanent=bool(a.get("permanent")))
            body = {"deleted": True} if st == 204 else body
        elif name == "undelete_dek":
            st, body = sim.dek_undelete(
                kek, dek_subject, int(a.get("version") or -1), algo)
            body = {"undeleted": True} if st == 204 else body
        elif name == "test_kek":
            if (a.get("kms_type") or a.get("kmsType")) in ("hcvault",
                                                           "openbao"):
                # tools_metadata.go:208-211 — Transit ping succeeds
                return ok_json({"success": True})
            return _err({"message": "KMS not configured"})
        else:  # rewrap_dek
            kek_rec = sim.keks.get(kek)
            if not (kek_rec and kek_rec.get("kmsType") in ("hcvault",
                                                           "openbao")):
                return _err({"message": "KMS not configured"})
            st, body = sim.dek_rewrap(
                kek, dek_subject, int(a.get("version") or -1),
                algo or None)
        if st not in (200, 204):
            return _err(body)
        return ok_json(body)

    # --- exporters (tools_exporter.go) --------------------------------
    if name in ("list_exporters", "create_exporter", "get_exporter",
                "update_exporter", "delete_exporter", "pause_exporter",
                "resume_exporter", "reset_exporter",
                "get_exporter_status", "get_exporter_config",
                "update_exporter_config"):
        ename = a.get("name") or ""
        verb_url = {
            "list_exporters": ("GET", "/exporters", None),
            "create_exporter": ("POST", "/exporters", a),
            "get_exporter": ("GET", f"/exporters/{ename}", None),
            "update_exporter": ("PUT", f"/exporters/{ename}", a),
            "delete_exporter": ("DELETE", f"/exporters/{ename}", None),
            "pause_exporter": ("PUT", f"/exporters/{ename}/pause", None),
            "resume_exporter": ("PUT", f"/exporters/{ename}/resume",
                                None),
            "reset_exporter": ("PUT", f"/exporters/{ename}/reset", None),
            "get_exporter_status": ("GET", f"/exporters/{ename}/status",
                                    None),
            "get_exporter_config": ("GET", f"/exporters/{ename}/config",
                                    None),
            "update_exporter_config": ("PUT",
                                       f"/exporters/{ename}/config", a),
        }[name]
        st, body = _http(sim, verb_url[0], verb_url[1], verb_url[2])
        if st >= 400:
            return _err(body)
        if name == "delete_exporter":
            return ok_json({"deleted": True})
        if name == "pause_exporter":
            return ok_json({"name": ename, "state": "PAUSED"})
        if name == "resume_exporter":
            return ok_json({"name": ename, "state": "RUNNING"})
        if name == "reset_exporter":
            return ok_json({"name": ename, "state": "reset"})
        return ok_json(body)

    # --- analysis / validation / comparison / intelligence ------------
    # these MCP tools have their OWN result shapes, distinct from the
    # REST analysis handlers (tools_validation.go / tools_comparison.go
    # / tools_intelligence.go)
    if name in ("validate_schema", "normalize_schema"):
        from axonops_schema_registry_spark.registry.evolution import (
            validate_and_normalize,
        )

        st = (a.get("schema_type") or "AVRO").upper()
        r = validate_and_normalize(a.get("schema") or "", st)
        if name == "validate_schema":
            out = {"valid": r["is_valid"], "schema_type": st}
            if r["is_valid"]:
                out["fingerprint"] = r["fingerprint"]
                out["canonical"] = r["canonical"]
            else:
                out["error"] = r["error"]
            return ok_json(out)
        if not r["is_valid"]:
            return _err({"message": f"invalid schema: {r['error']}"})
        return ok_json({"normalized": r["canonical"],
                        "fingerprint": r["fingerprint"],
                        "schema_type": st})
    if name == "validate_subject_name":
        # MCP uses regex strategies (tools_validation.go:127-159), not
        # the REST suffix heuristics
        strategy = a.get("strategy") or "topic_name"
        patterns = {
            "topic_name": r"^[a-zA-Z0-9._-]+-(key|value)$",
            "record_name": r"^[a-zA-Z_][a-zA-Z0-9_.]*$",
            "topic_record_name":
                r"^[a-zA-Z0-9._-]+-[a-zA-Z_][a-zA-Z0-9_.]*$",
        }
        pat = patterns.get(strategy)
        subj_in = a.get("subject") or ""
        if pat is None:
            return ok_json({"valid": False, "subject": subj_in,
                            "strategy": strategy,
                            "error": "unknown strategy; supported: "
                                     "topic_name, record_name, "
                                     "topic_record_name"})
        valid = re.fullmatch(pat.strip("^$"), subj_in) is not None
        out = {"valid": valid, "subject": subj_in,
               "strategy": strategy, "pattern": pat}
        if not valid:
            out["error"] = ("subject name does not match the "
                            f"{strategy} naming strategy")
        return ok_json(out)
    if name == "search_schemas":
        pattern = a.get("pattern") or ""
        use_re = bool(a.get("regex"))
        limit = min(a.get("limit") or 100, 1000)
        if use_re:
            try:
                rx = re.compile(pattern)
            except re.error as exc:
                return _err({"message": str(exc)})
        matches = []
        _, names = sim.list_subjects(ctx=ctx if ctx != "." else None)
        for s in names:
            if len(matches) >= limit:
                break
            x = _latest_row(sim, _qualify(ctx, s))
            if x is None:
                continue
            hit = rx.search(x["text"]) if use_re \
                else pattern in x["text"]
            if hit:
                matches.append({"subject": s, "version": x["version"],
                                "schema_type": x["type"] or "AVRO"})
        return ok_json({"matches": matches, "count": len(matches)})
    if name == "match_subjects":
        pattern = a.get("pattern") or ""
        use_re = bool(a.get("regex"))
        if use_re:
            try:
                rx = re.compile(pattern)
            except re.error as exc:
                return _err({"message": str(exc)})
        _, names = sim.list_subjects(ctx=ctx if ctx != "." else None)
        matches = [s for s in names
                   if (rx.search(s) if use_re else pattern in s)]
        return ok_json({"matches": matches, "count": len(matches)})
    if name == "get_schema_history":
        target = sim.resolve_alias(subject)
        rows = sim._live(target)
        if not rows and target not in sim.subjects:
            return _err({"error_code": 40401})
        entries = [{"version": x["version"], "id": x["id"],
                    "schema_type": x["type"] or "AVRO",
                    "schema": x["text"],
                    **({"references": x["references"]}
                       if x.get("references") else {})}
                   for x in sorted(rows, key=lambda x: x["version"])]
        return ok_json({"subject": a.get("subject") or "",
                        "versions": entries, "count": len(entries)})
    if name == "get_dependency_graph":
        def build(node_subject, node_version, depth, seen, max_depth):
            node = {"subject": node_subject, "version": node_version,
                    "depth": depth}
            key = f"{node_subject}:{node_version}"
            if depth >= max_depth or key in seen:
                return node
            seen.add(key)
            ids = sim._referenced_by(_qualify(ctx, node_subject),
                                     {node_version})
            children = []
            for s2 in sorted(sim.subjects):
                for y in sim._live(s2):
                    if y["id"] in ids:
                        children.append(build(
                            re.sub(r"^:\.[^:]*:", "", s2),
                            y["version"], depth + 1, seen, max_depth))
            if children:
                node["children"] = children
            return node

        root = build(a.get("subject") or "", a.get("version") or 0, 0,
                     set(), a.get("max_depth") or 10)
        return ok_json(root)
    if name == "export_schema":
        ver = a.get("version") or -1
        st, body = sim.get_version(subject,
                                   "latest" if ver <= 0 else ver)
        if st != 200:
            return _err(body)
        row = next(x for x in sim._live(sim.resolve_alias(subject))
                   if x["version"] == body["version"])
        out = {"subject": a.get("subject") or "",
               "version": row["version"], "id": row["id"],
               "schema_type": row["type"] or "AVRO",
               "schema": row["text"]}
        if row.get("references"):
            out["references"] = row["references"]
        if row.get("metadata") is not None:
            out["metadata"] = row["metadata"]
        if row.get("rule_set") is not None:
            out["rule_set"] = row["rule_set"]
        out["compatibility"] = sim._resolved_level(subject)
        return ok_json(out)
    if name == "export_subject":
        target = sim.resolve_alias(subject)
        rows = sim._live(target)
        if not rows:
            return _err({"error_code": 40401})
        versions = []
        for x in sorted(rows, key=lambda x: x["version"]):
            v = {"version": x["version"], "id": x["id"],
                 "schema_type": x["type"] or "AVRO",
                 "schema": x["text"]}
            if x.get("references"):
                v["references"] = x["references"]
            if x.get("metadata") is not None:
                v["metadata"] = x["metadata"]
            if x.get("rule_set") is not None:
                v["rule_set"] = x["rule_set"]
            versions.append(v)
        return ok_json({"subject": a.get("subject") or "",
                        "versions": versions, "count": len(versions),
                        "compatibility": sim._resolved_level(target)})
    if name == "get_registry_statistics":
        _, names = sim.list_subjects(ctx=ctx if ctx != "." else None)
        type_counts: dict[str, int] = {}
        total = 0
        for s in names:
            target = _qualify(ctx, s)
            live = sim._live(sim.resolve_alias(target))
            total += len(live)
            if live:
                t = max(live, key=lambda x: x["version"])["type"] \
                    or "AVRO"
                type_counts[t] = type_counts.get(t, 0) + 1
        return ok_json({"total_subjects": len(names),
                        "total_versions": total, "types": type_counts,
                        "total_keks": len([k for k in
                                           sim.keks.values()
                                           if not k["deleted"]]),
                        "total_exporters": len(sim.exporters)})
    if name == "count_versions":
        st, body = sim.list_versions(subject)
        if st != 200:
            return _err(body)
        return ok_json({"subject": a.get("subject") or "",
                        "count": len(body)})
    if name == "count_subjects":
        _, names = sim.list_subjects(ctx=ctx if ctx != "." else None)
        return ok_json({"count": len(names)})
    if name == "check_compatibility_multi":
        stype = (a.get("schema_type") or "AVRO").upper()
        results = []
        for subj in a.get("subjects") or []:
            target = sim.resolve_alias(_qualify(ctx, subj))
            live = sim._live(target)
            if not live:
                results.append({"subject": subj,
                                "is_compatible": False,
                                "error": "subject not found"})
                continue
            base = sim._resolved_level(target).replace(
                "_TRANSITIVE", "")
            ok, msgs = sim.compat_ok(
                target, a.get("schema") or "", stype, base,
                [max(live, key=lambda v: v["version"])],
                cand_refs=a.get("references"))
            row = {"subject": subj, "is_compatible": ok}
            if msgs:
                row["messages"] = msgs
            results.append(row)
        return ok_json({"all_compatible":
                        all(r["is_compatible"] for r in results),
                        "results": results})
    if name in ("diff_schemas", "compare_subjects"):
        def path_types(x):
            return {f["path"]: f["type"] for f in _fields_of_row(x)}

        def field_diffs(fa, fb):
            diffs = []
            for p, t in fa.items():
                if p not in fb:
                    diffs.append({"field": p, "change": "removed",
                                  "old_type": t})
                elif t != fb[p]:
                    diffs.append({"field": p, "change": "modified",
                                  "old_type": t, "new_type": fb[p]})
            for p, t in fb.items():
                if p not in fa:
                    diffs.append({"field": p, "change": "added",
                                  "new_type": t})
            return sorted(diffs, key=lambda d: d["field"])

        if name == "diff_schemas":
            live = sim._live(sim.resolve_alias(subject))
            vf = a.get("version_from") or 0
            x1 = next((x for x in live if x["version"] == vf), None)
            if x1 is None:
                return _err({"message": f"version {vf}: version not "
                                        "found"})
            vt = a.get("version_to") or 0
            x2 = (max(live, key=lambda x: x["version"]) if vt <= 0
                  else next((x for x in live
                             if x["version"] == vt), None))
            if x2 is None:
                return _err({"message": f"version {vt}: version not "
                                        "found"})
            diffs = field_diffs(path_types(x1), path_types(x2))
            return ok_json({"subject": a.get("subject") or "",
                            "version_from": vf,
                            "version_to": x2["version"],
                            "diffs": diffs, "total": len(diffs)})
        sa = a.get("subject_a") or ""
        sb = a.get("subject_b") or ""
        xa = _latest_row(sim, _qualify(ctx, sa))
        if xa is None:
            return _err({"message": f'subject "{sa}": subject not '
                                    "found"})
        xb = _latest_row(sim, _qualify(ctx, sb))
        if xb is None:
            return _err({"message": f'subject "{sb}": subject not '
                                    "found"})
        fa, fb = path_types(xa), path_types(xb)
        return ok_json({"subject_a": sa, "subject_b": sb,
                        "type_a": xa["type"] or "AVRO",
                        "type_b": xb["type"] or "AVRO",
                        "fields_a": len(fa), "fields_b": len(fb),
                        "common_fields":
                            sorted(set(fa) & set(fb)),
                        "diffs": field_diffs(fa, fb)})
    if name == "suggest_compatible_change":
        level = sim._resolved_level(subject)
        change = a.get("change_type") or ""
        advice = _compat_advice(level, change)
        return ok_json({"subject": a.get("subject") or "",
                        "compatibility_level": level,
                        "change_type": change, "advice": advice})
    if name == "explain_compatibility_failure":
        live = sim._live(sim.resolve_alias(subject))
        if not live:
            return _err({"error_code": 40401})
        stype = (a.get("schema_type") or "AVRO").upper()
        level = sim._resolved_level(subject)
        base = level.replace("_TRANSITIVE", "")
        ok, msgs = sim.compat_ok(
            subject, a.get("schema") or "", stype, base,
            [max(live, key=lambda v: v["version"])],
            cand_refs=a.get("references"))
        if ok:
            return ok_json({"is_compatible": True,
                            "message": "Schema is fully compatible."})
        return ok_json({"is_compatible": False,
                        "compatibility_level": level,
                        "explanations": [
                            {"message": m,
                             "explanation": m,
                             "suggestion": ""} for m in msgs]})
    if name in ("find_schemas_by_field", "find_schemas_by_type",
                "score_schema_quality", "get_schema_complexity",
                "check_field_consistency"):
        # same underlying shapes as the REST analysis endpoints
        _REST = {
            "find_schemas_by_field": ("POST", "/schemas/search/field"),
            "find_schemas_by_type": ("POST", "/schemas/search/type"),
            "score_schema_quality": ("POST", "/schemas/quality"),
            "get_schema_complexity": ("POST", "/schemas/complexity"),
        }
        if name == "check_field_consistency":
            st, body = _http(sim, "GET",
                             f"/statistics/fields/{a.get('field', '')}")
        else:
            verb, url = _REST[name]
            payload = dict(a)
            if "schema_type" in payload:
                payload["schemaType"] = payload.pop("schema_type")
            st, body = _http(sim, verb, url, payload)
        if st >= 400:
            return _err(body)
        return ok_json(body)
    if name == "find_similar_schemas":
        from axonops_schema_registry_spark.registry.analysis import (
            normalize_field_name,
        )

        threshold = min(float(a.get("threshold") or 0.3), 1.0)
        src_row = _latest_row(sim, sim.resolve_alias(subject))
        if src_row is None:
            return _err({"error_code": 40401})
        src_set = {normalize_field_name(f["name"])
                   for f in _fields_of_row(src_row)}
        matches = []
        _, names = sim.list_subjects(ctx=ctx if ctx != "." else None)
        for s in names:
            if s == (a.get("subject") or ""):
                continue
            x = _latest_row(sim, _qualify(ctx, s))
            if x is None:
                continue
            other = {normalize_field_name(f["name"])
                     for f in _fields_of_row(x)}
            union = src_set | other
            if not union:
                continue
            shared = sorted(src_set & other)
            simil = len(shared) / len(union)
            if simil >= threshold:
                matches.append({"subject": s, "similarity": simil,
                                "common_fields": shared})
        matches.sort(key=lambda m: -m["similarity"])
        return ok_json({"subject": a.get("subject") or "",
                        "matches": matches, "count": len(matches)})
    if name == "detect_schema_patterns":
        from axonops_schema_registry_spark.registry.analysis import (
            normalize_field_name,
        )

        _, names = sim.list_subjects(ctx=ctx if ctx != "." else None)
        suffixes: dict[str, int] = {}
        type_counts: dict[str, int] = {}
        field_freq: dict[str, int] = {}
        total_versions = 0
        multi = 0
        for s in names:
            parts = s.split("-")
            if len(parts) > 1:
                suffixes[parts[-1]] = suffixes.get(parts[-1], 0) + 1
            target = sim.resolve_alias(_qualify(ctx, s))
            live = sim._live(target)
            total_versions += len(live)
            if len(live) > 1:
                multi += 1
            x = max(live, key=lambda x: x["version"], default=None)
            if x is None:
                continue
            t = x["type"] or "AVRO"
            type_counts[t] = type_counts.get(t, 0) + 1
            seen = set()
            for f in _fields_of_row(x):
                k = normalize_field_name(f["name"])
                if k not in seen:
                    seen.add(k)
                    field_freq[k] = field_freq.get(k, 0) + 1
        thr = max(len(names) * 3 // 10, 2)
        common = sorted(
            ({"field": k, "count": c}
             for k, c in field_freq.items() if c >= thr),
            key=lambda d: -d["count"])
        top_suffixes = sorted(
            ({"suffix": k, "count": c}
             for k, c in suffixes.items() if c >= 2),
            key=lambda d: -d["count"])
        return ok_json({
            "total_subjects": len(names),
            "schema_types": type_counts,
            "naming_suffixes": top_suffixes,
            "common_fields": common,
            "avg_versions": (total_versions / len(names)
                             if names else 0.0),
            "multi_version_subjects": multi})
    if name == "suggest_schema_evolution":
        row = _latest_row(sim, sim.resolve_alias(subject))
        if row is None:
            return _err({"error_code": 40401})
        level = sim._resolved_level(subject)
        out = _suggest_evolution(row, level, a)
        if "error" in out:
            return ok_json(out)
        out["subject"] = a.get("subject") or ""
        out["current_version"] = row["version"]
        out["compatibility_level"] = level
        return ok_json(out)
    if name == "plan_migration_path":
        row = _latest_row(sim, sim.resolve_alias(subject))
        if row is None:
            return _err({"error_code": 40401})
        level = sim._resolved_level(subject)
        st_type = (a.get("schema_type") or row["type"] or "AVRO").upper()
        src_f = {f["path"]: f["type"] for f in _fields_of_row(row)}
        tgt_f = {f["path"]: f["type"] for f in _fields_of_row(
            {"text": a.get("target_schema") or "", "type": st_type})}
        steps = []
        num = 1
        needs_default = "BACKWARD" in level or "FULL" in level
        for p in sorted(tgt_f):
            if p not in src_f:
                desc = f"Add field '{p}' of type '{tgt_f[p]}'"
                if needs_default:
                    desc += " with a default value"
                steps.append({"step": num, "action": "add_field",
                              "description": desc})
                num += 1
        for p in sorted(src_f):
            if p in tgt_f and src_f[p] != tgt_f[p]:
                steps.append({
                    "step": num, "action": "change_type",
                    "description":
                        f"Change type of '{p}' from '{src_f[p]}' to "
                        f"'{tgt_f[p]}'. Consider adding a new field "
                        "instead if this is not a type promotion."})
                num += 1
        for p in sorted(src_f):
            if p not in tgt_f:
                steps.append({
                    "step": num, "action": "remove_field",
                    "description":
                        f"Remove field '{p}'. Deprecate it first if "
                        "not already deprecated. Ensure no consumers "
                        "depend on it."})
                num += 1
        return ok_json({"subject": a.get("subject") or "",
                        "current_version": row["version"],
                        "compatibility_level": level,
                        "steps": steps, "total_steps": len(steps)})
    if name == "get_cluster_id":
        return ok_json({"id": "default-cluster"})
    if name == "get_server_version":
        return ok_json({"version": "dev"})

    # --- metadata extras (tools_metadata.go) --------------------------
    if name == "get_config_full" or name == "get_subject_config_full":
        level = sim._resolved_level(subject or (f":{ctx}:x"
                                                if ctx != "." else "x"))
        holder = sim.cfg_extra.get(subject) if subject else \
            sim.glob_cfg_extra
        return ok_json(sim._cfg_body({"compatibilityLevel": level},
                                     holder))
    if name == "set_config_full":
        level = a.get("compatibility_level") or a.get("compatibility") \
            or ""
        extra = _cfg_camel(a)
        st, body = (sim.set_subject_config(subject, level, extra=extra)
                    if subject
                    else sim.set_global_config(level, extra=extra))
        if st != 200:
            return _err(body)
        return ok_json({"compatibilityLevel": level.upper()})
    if name == "get_global_config_direct":
        lvl = sim.root_level
        return ok_json(sim._cfg_body(
            {"compatibilityLevel": lvl or "BACKWARD"},
            sim.glob_cfg_extra))
    if name == "resolve_alias":
        return ok_json({"subject": a.get("subject") or "",
                        "resolved": sim.resolve_alias(subject)})
    if name == "get_schemas_by_subject":
        target = sim.resolve_alias(subject)
        rows = sim.subjects.get(target, []) if a.get("deleted") \
            else sim._live(target)
        if not rows:
            return _err({"error_code": 40401})
        return ok_json([_record_of(sim, target, x, with_cv=False)
                        for x in sorted(rows,
                                        key=lambda x: x["version"])])
    if name == "check_write_mode":
        mode = sim.resolved_mode(subject)
        writable = mode not in ("READONLY", "READONLY_OVERRIDE",
                                "IMPORT")
        return ok_json({"subject": a.get("subject") or "",
                        "mode": mode, "writable": writable})
    if name == "get_subject_metadata":
        st, body = sim.subject_metadata(subject)
        if st != 200:
            return _err(body)
        return ok_json(body)
    if name == "format_schema":
        st, body = sim.get_version(subject, a.get("version") or "latest")
        if st != 200:
            return _err(body)
        return ok_json({"subject": a.get("subject") or "",
                        "version": body["version"],
                        "schemaType": body["schemaType"],
                        "schema": body["schema"]})

    # --- admin users / API keys (tools_admin.go; in-memory auth store)
    if name == "list_roles":
        return ok_json([
            {"name": "super_admin",
             "description": "Full access to everything including user "
                            "management"},
            {"name": "admin",
             "description": "Can manage schemas, configuration, and "
                            "view admin info"},
            {"name": "developer",
             "description": "Can register and read schemas"},
            {"name": "readonly",
             "description": "Can only read schemas and configuration"},
        ])
    if name in ("create_user", "list_users", "get_user", "update_user",
                "delete_user", "get_user_by_username",
                "change_password", "create_apikey", "list_apikeys",
                "get_apikey", "update_apikey", "delete_apikey",
                "revoke_apikey", "rotate_apikey"):
        users = getattr(sim, "_users", None)
        if users is None:
            users = sim._users = {}
            sim._apikeys = {}
            sim._next_uid = 1

        def user_body(u):
            return {"id": u["id"], "username": u["username"],
                    "email": u.get("email", ""), "role": u["role"],
                    "enabled": u["enabled"]}

        def key_body(k):
            return {"id": k["id"], "key_prefix": k["key"][:8],
                    "name": k["name"], "role": k["role"],
                    "user_id": k["user_id"], "enabled": k["enabled"]}

        if name == "create_user":
            uname = a.get("username") or ""
            if not uname or not a.get("password"):
                return _err({"message": "username and password are "
                                        "required"})
            if any(u["username"] == uname for u in users.values()):
                return _err({"message": "user already exists"})
            uid = sim._next_uid
            sim._next_uid += 1
            users[uid] = {"id": uid, "username": uname,
                          "email": a.get("email", ""),
                          "role": a.get("role") or "readonly",
                          "enabled": a.get("enabled", True),
                          "password": a["password"]}
            return ok_json(user_body(users[uid]))
        if name == "list_users":
            return ok_json([user_body(u)
                            for _, u in sorted(users.items())])
        if name in ("get_user", "update_user", "delete_user",
                    "change_password"):
            u = users.get(int(a.get("id") or 0))
            if u is None:
                return _err({"message": "user not found"})
            if name == "get_user":
                return ok_json(user_body(u))
            if name == "delete_user":
                del users[u["id"]]
                return ok_json({"deleted": True})
            if name == "change_password":
                if a.get("old_password") != u["password"]:
                    return _err({"message": "invalid password"})
                u["password"] = a.get("new_password") or ""
                return ok_json({"changed": True})
            for k in ("email", "role", "enabled", "password"):
                if a.get(k) is not None:
                    u[k] = a[k]
            return ok_json(user_body(u))
        if name == "get_user_by_username":
            u = next((u for u in users.values()
                      if u["username"] == (a.get("username") or "")),
                     None)
            if u is None:
                return _err({"message": "user not found"})
            return ok_json(user_body(u))
        keys = sim._apikeys
        if name == "create_apikey":
            if (a.get("expires_in") or 0) <= 0:
                return _err({"message": "expires_in is required and "
                                        "must be positive (duration in "
                                        "seconds)"})
            if int(a.get("user_id") or 0) not in users:
                return _err({"message": "user not found"})
            kid = sim._next_uid
            sim._next_uid += 1
            keys[kid] = {"id": kid, "key": f"sk-{kid:08d}-secret",
                         "name": a.get("name") or "",
                         "role": a.get("role") or "readonly",
                         "user_id": int(a["user_id"]),
                         "enabled": True}
            return ok_json({**key_body(keys[kid]),
                            "key": keys[kid]["key"]})
        if name == "list_apikeys":
            pool = [k for _, k in sorted(keys.items())
                    if not a.get("user_id")
                    or k["user_id"] == int(a["user_id"])]
            return ok_json([key_body(k) for k in pool])
        k = keys.get(int(a.get("id") or 0))
        if k is None:
            return _err({"message": "API key not found"})
        if name == "get_apikey":
            return ok_json(key_body(k))
        if name == "update_apikey":
            for f2 in ("name", "role", "enabled"):
                if a.get(f2) is not None:
                    k[f2] = a[f2]
            return ok_json(key_body(k))
        if name == "delete_apikey":
            del keys[k["id"]]
            return ok_json({"deleted": True})
        if name == "revoke_apikey":
            k["enabled"] = False
            return ok_json({"revoked": True})
        if name == "rotate_apikey":
            k["key"] = f"sk-{k['id']:08d}-rotated"
            return ok_json({**key_body(k), "key": k["key"]})

    return None  # unknown tool → scenario skipped


# ---------------------------------------------------------------------------
# Replay
# ---------------------------------------------------------------------------

_QUOTED = r'"((?:[^"\\]|\\.)*)"'

STEPS: list[tuple[re.Pattern, str]] = [
    (re.compile(rf'I call MCP tool {_QUOTED} with JSON input using '
                rf'stored {_QUOTED}:'), "call_json_stored"),
    (re.compile(rf'I call MCP tool {_QUOTED} with JSON input:'),
     "call_json"),
    (re.compile(rf'I call MCP tool {_QUOTED} with input:'),
     "call_table"),
    (re.compile(rf'I call MCP tool {_QUOTED}'), "call_plain"),
    (re.compile(rf'I register an? (?:Avro |"(\w+)" )?schema for '
                rf'subject {_QUOTED}:?'), "seed"),
    (re.compile(rf'subject {_QUOTED} has (?:"(\w+)" )?schema:'),
     "seed_rev"),
    (re.compile(rf'the MCP result should not contain {_QUOTED}'),
     "not_contains"),
    (re.compile(rf'the MCP result should contain {_QUOTED}'),
     "contains"),
    (re.compile(rf'the MCP result should be {_QUOTED}'), "exact"),
    (re.compile(rf'the MCP result field {_QUOTED} should be empty or '
                rf'absent'), "field_empty"),
    (re.compile(rf'I store the response field {_QUOTED} as {_QUOTED}'),
     "store_resp_field"),
    (re.compile(r'the MCP result should not be an error'), "not_error"),
    (re.compile(r'the MCP result should be an error'), "is_error"),
    (re.compile(rf'the MCP result field {_QUOTED} should be non-empty'),
     "field_nonempty"),
    (re.compile(rf'the MCP result field {_QUOTED} should not equal '
                rf'stored {_QUOTED}'), "field_not_stored"),
    (re.compile(rf'the MCP result field {_QUOTED} should equal '
                rf'stored {_QUOTED}'), "field_stored"),
    (re.compile(rf'I store the MCP result field {_QUOTED} as '
                rf'{_QUOTED}'), "store_field"),
    (re.compile(r'MCP confirmations are enabled'), "confirm_on"),
    (re.compile(rf'MCP permission preset is {_QUOTED}'), "preset"),
    (re.compile(rf'MCP permission scopes are {_QUOTED}'), "scopes"),
    (re.compile(r'I list MCP tools'), "list_tools"),
    (re.compile(rf'I read MCP resource {_QUOTED}'), "read_resource"),
    (re.compile(rf'the MCP resource result should contain {_QUOTED}'),
     "res_contains"),
    (re.compile(rf'the MCP resource result should not contain '
                rf'{_QUOTED}'), "res_not_contains"),
    (re.compile(rf'I get MCP prompt {_QUOTED} with arguments:'),
     "get_prompt_args"),
    (re.compile(rf'I get MCP prompt {_QUOTED}'), "get_prompt"),
    (re.compile(rf'the MCP prompt result should contain {_QUOTED}'),
     "prompt_contains"),
    (re.compile(rf'the MCP prompt result should not contain '
                rf'{_QUOTED}'), "prompt_not_contains"),
    (re.compile(rf'the MCP prompt description should contain '
                rf'{_QUOTED}'), "prompt_desc_contains"),
    (re.compile(r'the MCP prompt result should be an error'),
     "prompt_is_error"),
    (re.compile(r'the MCP resource result should be an error'),
     "res_is_error"),
    (re.compile(r'I can unwrap the MCP result encrypted key '
                r'material'), "unwrap_material"),
    (re.compile(r'the Prometheus metric "([^"]+)" with labels '
                r'"((?:[^"\\]|\\.)*)" should exist'), "prom_labels"),
    (re.compile(r'the Prometheus metric "([^"]+)" should exist'),
     "prom_exists"),
    (re.compile(r'the audit log should contain an event:'),
     "audit_table"),
    (re.compile(r'the audit log should not contain event "([^"]+)"'),
     "audit_not_event"),
    (re.compile(r'the audit log should contain event "([^"]+)"'),
     "audit_event"),
    (re.compile(r'the audit log should contain "([^"]+)"'),
     "audit_contains_str"),
    (re.compile(r'the audit log should'), "ignore"),
    (re.compile(r'the schema registry is running'), "ignore"),
    (re.compile(r'no subjects exist'), "ignore"),
]


def _unescape(s: str) -> str:
    return s.replace('\\"', '"').replace("\\\\", "\\")


def _coerce(v: str):
    if v in ("true", "false"):
        return v == "true"
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return v


def _parse_table(doc: str) -> dict:
    out = {}
    for line in (doc or "").splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) >= 2:
            out[cells[0]] = _coerce("|".join(cells[1:]).strip())
    return out


def replay(features=MCP_FEATURES, features_dir: str = MCP_DIR):
    n_checked = 0
    mismatches: list[Mismatch] = []
    skipped: list[tuple[str, str, str]] = []
    for fname in features:
        path = os.path.join(features_dir, fname)
        if not os.path.exists(path):
            skipped.append((fname, "<file>", "missing"))
            continue
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
        for name, steps in _scenarios(text):
            n, mm, reason = _replay_scenario(fname, name, steps)
            if reason:
                skipped.append((fname, name, reason))
                continue
            n_checked += n
            mismatches.extend(mm)
    return n_checked, mismatches, skipped


def _replay_scenario(feature: str, scenario: str, steps):
    sim = RegistrySim()
    stored: dict[str, Any] = {}
    last_resp: Any = None
    text_out, is_err = "", False
    res_text, res_err = "", None
    prompt_text, prompt_desc, prompt_err = "", "", None
    n = 0
    mm: list[Mismatch] = []

    def sub_stored(s: str) -> str:
        # the MCP step driver resolves $var references from StoredValues
        # (mcp_steps.go:73-90); floats print as ints
        for key in sorted(stored, key=len, reverse=True):
            ph = "$" + key
            if ph in s:
                val = stored[key]
                if isinstance(val, float) and val.is_integer():
                    val = int(val)
                s = s.replace(ph, str(val))
        return s

    def run_tool(tool: str, args: dict):
        nonlocal text_out, is_err
        scopes = getattr(sim, "_scopes", None)
        if not tool_allowed(tool, scopes):
            # the tool is simply not registered under this preset
            text_out, is_err = f"error: tool {tool} not found", True
            return None
        out = call_tool(sim, tool, args)
        if out is None:
            return f"unknown MCP tool: {tool}"
        text_out, is_err = out
        # tools.go:293-319 wrapper: every executed tool logs one
        # mcp_tool_call / mcp_tool_error event
        bdd_audit.mcp_event(
            sim, "mcp_tool_error" if is_err else "mcp_tool_call",
            tool, args, error="tool returned error" if is_err else "")
        bdd_audit.metrics_of(sim).record_mcp_tool_call(
            tool, "error" if is_err else "success",
            principal="mcp-anonymous")
        return None

    for line, doc in steps:
        body = re.sub(r"^(Given|When|Then|And|But)\s+", "", line)
        body = sub_stored(body)
        doc = sub_stored(doc) if doc else doc
        for rx, op in STEPS:
            m = rx.search(body)
            if not m:
                continue
            if op == "ignore":
                pass
            elif op == "unwrap_material":
                # envelope round-trip: b64(wrapped) = prefix || raw and
                # b64(raw) = keyMaterial (vault/provider.go:143-160)
                n += 1
                import base64 as _b64
                ok_unwrap = False
                try:
                    doc_ = json.loads(text_out)
                    wrapped = _b64.b64decode(
                        doc_["encryptedKeyMaterial"])
                    raw = wrapped.split(b":", 2)[2]
                    ok_unwrap = (wrapped.startswith(b"vault:v")
                                 and _b64.b64encode(raw).decode()
                                 == doc_.get("keyMaterial"))
                except Exception:
                    ok_unwrap = False
                if not ok_unwrap:
                    mm.append(Mismatch(feature, scenario, body,
                                       "unwrap ok", text_out[:140]))
            elif op == "prom_exists":
                n += 1
                if not bdd_audit.has_metric(bdd_audit.scrape(sim),
                                            m.group(1)):
                    mm.append(Mismatch(feature, scenario, body,
                                       m.group(1), "absent"))
            elif op == "prom_labels":
                n += 1
                if not bdd_audit.metric_with_labels(
                        bdd_audit.scrape(sim), m.group(1), m.group(2)):
                    mm.append(Mismatch(feature, scenario, body,
                                       (m.group(1), m.group(2)),
                                       "absent"))
            elif op == "audit_table":
                n += 1
                expected = bdd_audit.parse_expect_table(doc or "")
                if not bdd_audit.match_table(sim.audit_log, expected):
                    best = bdd_audit.best_partial(sim.audit_log,
                                                  expected)
                    mm.append(Mismatch(feature, scenario,
                                       "audit table "
                                       + expected.get("event_type",
                                                      "?"),
                                       expected, best))
            elif op == "audit_not_event":
                n += 1
                if any(e.get("event_type") == m.group(1)
                       for e in sim.audit_log):
                    mm.append(Mismatch(feature, scenario, body,
                                       f"no {m.group(1)}", "present"))
            elif op == "audit_event":
                n += 1
                if not any(e.get("event_type") == m.group(1)
                           for e in sim.audit_log):
                    mm.append(Mismatch(feature, scenario, body,
                                       m.group(1), "absent"))
            elif op == "audit_contains_str":
                n += 1
                blob = json.dumps(sim.audit_log, default=str)
                if m.group(1) not in blob:
                    mm.append(Mismatch(feature, scenario, body,
                                       m.group(1), "absent"))
            elif op == "confirm_on":
                sim._confirm_enabled = True
            elif op in ("preset", "scopes"):
                sim._scopes = (_PRESETS.get(m.group(1), set())
                               if op == "preset"
                               else {s.strip()
                                     for s in m.group(1).split(",")})
                # isToolAllowed (tools.go:189-201) runs at tool
                # REGISTRATION: every scope-blocked tool records one
                # permission-denied sample when the server comes up
                mreg = bdd_audit.metrics_of(sim)
                for scope_name, tools in sorted(_SCOPE_TOOLS.items()):
                    if scope_name not in sim._scopes:
                        for t in sorted(tools):
                            mreg.record_mcp_permission_denied(
                                t, scope_name)
            elif op == "list_tools":
                text_out = _go_json(allowed_tools(
                    getattr(sim, "_scopes", None)))
                is_err = False
            elif op == "read_resource":
                res_text, res_err = read_resource(sim, m.group(1))
                res_text = res_text or ""
            elif op == "res_contains":
                n += 1
                want = _unescape(m.group(1))
                if want not in res_text:
                    mm.append(Mismatch(feature, scenario, body, want,
                                       (res_err or res_text)[:200]))
            elif op == "res_not_contains":
                n += 1
                want = _unescape(m.group(1))
                if want in res_text:
                    mm.append(Mismatch(feature, scenario, body,
                                       f"not {want}", res_text[:200]))
            elif op == "res_is_error":
                n += 1
                if res_err is None:
                    mm.append(Mismatch(feature, scenario, body,
                                       "error", res_text[:200]))
            elif op in ("get_prompt", "get_prompt_args"):
                args = _parse_table(doc) if op == "get_prompt_args" \
                    else {}
                args = {k: str(v) for k, v in args.items()}
                prompt_text, prompt_desc, prompt_err = get_prompt(
                    sim, m.group(1), args)
                prompt_text = prompt_text or ""
            elif op == "prompt_contains":
                n += 1
                want = _unescape(m.group(1))
                if want not in prompt_text:
                    mm.append(Mismatch(
                        feature, scenario, body, want,
                        (prompt_err or prompt_text)[:200]))
            elif op == "prompt_not_contains":
                n += 1
                want = _unescape(m.group(1))
                if want in prompt_text:
                    mm.append(Mismatch(feature, scenario, body,
                                       f"not {want}",
                                       prompt_text[:200]))
            elif op == "prompt_desc_contains":
                n += 1
                want = _unescape(m.group(1))
                if want not in prompt_desc:
                    mm.append(Mismatch(feature, scenario, body, want,
                                       prompt_desc[:200]))
            elif op == "prompt_is_error":
                n += 1
                if prompt_err is None:
                    mm.append(Mismatch(feature, scenario, body,
                                       "error", prompt_text[:120]))
            elif op == "call_plain":
                err = run_tool(m.group(1), {})
                if err:
                    return 0, [], err
            elif op == "call_table":
                err = run_tool(m.group(1), _parse_table(doc))
                if err:
                    return 0, [], err
            elif op in ("call_json", "call_json_stored"):
                try:
                    args = json.loads(doc) if doc else {}
                except json.JSONDecodeError as exc:
                    return 0, [], f"bad JSON input: {exc}"
                if op == "call_json_stored":
                    # the step driver injects the stored value as
                    # confirm_token (mcp_steps.go:548-564)
                    args["confirm_token"] = str(stored.get(m.group(2)))
                err = run_tool(m.group(1), args)
                if err:
                    return 0, [], err
            elif op == "seed":
                stype = (m.group(1) or "AVRO").upper()
                # no docstring -> the step driver's default schema
                # (mcp_steps.go:248-259)
                st, b = sim.register(m.group(2),
                                     doc or '{"type":"string"}', stype)
                last_resp = b
                n += 1
                if st != 200:
                    mm.append(Mismatch(feature, scenario, body,
                                       "seed 200", (st, b)))
            elif op == "seed_rev":
                stype = (m.group(2) or "AVRO").upper()
                st, b = sim.register(m.group(1),
                                     doc or '{"type":"string"}', stype)
                last_resp = b
                n += 1
                if st != 200:
                    mm.append(Mismatch(feature, scenario, body,
                                       "seed 200", (st, b)))
            elif op == "contains":
                n += 1
                want = _unescape(m.group(1))
                if want not in text_out:
                    mm.append(Mismatch(feature, scenario, body, want,
                                       text_out[:200]))
            elif op == "exact":
                n += 1
                want = _unescape(m.group(1))
                if text_out != want:
                    mm.append(Mismatch(feature, scenario, body, want,
                                       text_out[:200]))
            elif op == "field_empty":
                n += 1
                try:
                    parsed = json.loads(text_out)
                except ValueError:
                    parsed = {}
                val = parsed.get(m.group(1)) \
                    if isinstance(parsed, dict) else None
                if val not in (None, ""):
                    mm.append(Mismatch(feature, scenario, body,
                                       f"empty {m.group(1)}", val))
            elif op == "store_resp_field":
                if isinstance(last_resp, dict):
                    stored[m.group(2)] = last_resp.get(m.group(1))
            elif op == "not_contains":
                n += 1
                want = _unescape(m.group(1))
                if want in text_out:
                    mm.append(Mismatch(feature, scenario, body,
                                       f"not {want}", text_out[:200]))
            elif op == "not_error":
                n += 1
                if is_err:
                    mm.append(Mismatch(feature, scenario, body,
                                       "no error", text_out[:200]))
            elif op == "is_error":
                n += 1
                if not is_err:
                    mm.append(Mismatch(feature, scenario, body,
                                       "error", text_out[:200]))
            elif op in ("field_nonempty", "field_stored",
                        "field_not_stored", "store_field"):
                try:
                    parsed = json.loads(text_out)
                except ValueError:
                    parsed = {}
                val = parsed.get(m.group(1)) \
                    if isinstance(parsed, dict) else None
                if op == "store_field":
                    stored[m.group(2)] = val
                else:
                    n += 1
                    if op == "field_nonempty" and val in (None, "", [],
                                                          {}):
                        mm.append(Mismatch(feature, scenario, body,
                                           f"non-empty {m.group(1)}",
                                           text_out[:200]))
                    elif op == "field_stored" \
                            and val != stored.get(m.group(2)):
                        mm.append(Mismatch(feature, scenario, body,
                                           stored.get(m.group(2)), val))
                    elif op == "field_not_stored" \
                            and val == stored.get(m.group(2)):
                        mm.append(Mismatch(
                            feature, scenario, body,
                            f"!= {stored.get(m.group(2))}", val))
            break
        else:
            return 0, [], f"unrecognized step: {body[:60]}"
    return n, mm, None
