"""Audit-event derivation parity with the reference's audit middleware.

The reference emits one structured audit event per security-relevant
request from an HTTP middleware (`internal/auth/audit.go:640-760`): the
event type is classified from (method, path, query, status)
(`audit.go:762-941`), the target from the URL (`audit.go:1098-1147`),
outcome/reason from the status code (`audit.go:1016-1046`), and handlers
enrich a mutable ``AuditHints`` with before/after hashes and schema
metadata (`internal/api/handlers/handlers.go:597-716` and friends).
Read-only events (schema_get, config_get, mode_get, subject_list) are
disabled by default (`audit.go:405-478`) and must never appear.

This module replays that pipeline over the BDD ``RegistrySim``: a pre
snapshot captures the object state a handler would have read, and
:func:`derive` reproduces the middleware + handler-hint event exactly.
The table-assertion semantics mirror the reference's own godog step
(`tests/bdd/steps/mcp_steps.go:774-840`): ``path`` matches by substring,
a trailing ``*`` is a prefix match, an empty cell requires an
empty/absent field, and any single event in the log may satisfy the
table.
"""

from __future__ import annotations

import hashlib
import json
import re
from typing import Any

# -- primitives -----------------------------------------------------------


def sha(content: Any) -> str:
    """``sha256:<hex>`` as hashSchemaContent/hashString (handlers.go:1887,2186)."""
    if not isinstance(content, (str, bytes)):
        content = json.dumps(content, sort_keys=True, default=str)
    if isinstance(content, str):
        content = content.encode()
    return "sha256:" + hashlib.sha256(content).hexdigest()


#: write ops + auth failures + MCP events; read events excluded
#: (setDefaultEnabledEvents, audit.go:405-478)
DEFAULT_ENABLED = {
    "schema_register", "schema_delete_soft", "schema_delete_permanent",
    "schema_import", "schema_lookup", "compatibility_check",
    "config_update", "config_delete", "mode_update", "mode_delete",
    "auth_failure", "auth_forbidden",
    "subject_delete_soft", "subject_delete_permanent",
    "user_create", "user_update", "user_delete", "password_change",
    "apikey_create", "apikey_update", "apikey_delete", "apikey_revoke",
    "apikey_rotate",
    "kek_create", "kek_update", "kek_delete_soft", "kek_delete_permanent",
    "kek_undelete", "kek_test",
    "dek_create", "dek_delete_soft", "dek_delete_permanent",
    "dek_undelete",
    "exporter_create", "exporter_update", "exporter_delete",
    "exporter_pause", "exporter_resume", "exporter_reset",
    "exporter_config_update",
    "server_startup", "server_shutdown",
    "mcp_tool_call", "mcp_tool_error", "mcp_admin_action",
    "mcp_confirm_issued", "mcp_confirm_rejected", "mcp_confirmed",
    "security_warning", "auth_ldap_fallback",
}


def classify(verb: str, path: str, q: dict, status: int) -> str:
    """determineEventType (audit.go:762-941) — order matters."""
    if status == 401:
        return "auth_failure"
    if status == 403:
        return "auth_forbidden"
    perm = q.get("permanent") == "true"
    if "/import/" in path and verb == "POST":
        return "schema_import"
    if "/compatibility/" in path and verb == "POST":
        return "compatibility_check"
    if "/subjects/" in path and "/versions" in path:
        if verb == "POST":
            return "schema_register"
        if verb == "DELETE":
            return "schema_delete_permanent" if perm \
                else "schema_delete_soft"
        if verb == "GET":
            return "schema_get"
    if "/subjects/" in path and "/versions" not in path and verb == "POST":
        return "schema_lookup"
    if "/schemas/ids/" in path:
        return "schema_get"
    if "/subjects/" in path and "/versions" not in path and verb == "DELETE":
        return "subject_delete_permanent" if perm else "subject_delete_soft"
    if path == "/subjects" and verb == "GET":
        return "subject_list"
    if "/admin/users" in path:
        return {"POST": "user_create", "PUT": "user_update",
                "DELETE": "user_delete"}.get(verb, "")
    if "/me/password" in path and verb == "POST":
        return "password_change"
    if "/admin/apikeys" in path:
        if "/revoke" in path and verb == "POST":
            return "apikey_revoke"
        if "/rotate" in path and verb == "POST":
            return "apikey_rotate"
        return {"POST": "apikey_create", "PUT": "apikey_update",
                "DELETE": "apikey_delete"}.get(verb, "")
    if "/dek-registry/v1/keks" in path:
        if "/deks/" in path:
            if verb == "POST":
                return "dek_undelete" if "/undelete" in path \
                    else "dek_create"
            if verb == "DELETE":
                return "dek_delete_permanent" if perm \
                    else "dek_delete_soft"
        elif "/deks" in path and verb == "POST":
            return "dek_create"
        if "/deks" not in path:
            if "/test" in path and verb == "POST":
                return "kek_test"
            if verb == "POST":
                return "kek_undelete" if "/undelete" in path \
                    else "kek_create"
            if verb == "PUT":
                return "kek_update"
            if verb == "DELETE":
                return "kek_delete_permanent" if perm \
                    else "kek_delete_soft"
    if "/exporters" in path:
        if "/pause" in path and verb == "PUT":
            return "exporter_pause"
        if "/resume" in path and verb == "PUT":
            return "exporter_resume"
        if "/reset" in path and verb == "PUT":
            return "exporter_reset"
        if "/config" in path and verb == "PUT":
            return "exporter_config_update"
        return {"POST": "exporter_create", "PUT": "exporter_update",
                "DELETE": "exporter_delete"}.get(verb, "")
    if "/config" in path:
        return {"GET": "config_get", "PUT": "config_update",
                "DELETE": "config_delete"}.get(verb, "")
    if "/mode" in path:
        return {"GET": "mode_get", "PUT": "mode_update",
                "DELETE": "mode_delete"}.get(verb, "")
    return ""


def _segment_after(path: str, prefix: str) -> str:
    i = path.find(prefix)
    if i < 0 or i + len(prefix) >= len(path):
        return ""
    rest = path[i + len(prefix):]
    return rest.split("/", 1)[0]


def extract_subject(path: str) -> str:
    """extractSubject (audit.go:957-997): raw path segment, possibly
    a :.ctx:qualified name."""
    for prefix in ("/subjects/", "/config/", "/mode/"):
        s = _segment_after(path, prefix)
        if s:
            return s
    return ""


def extract_target(path: str, event_type: str) -> tuple[str, str]:
    """extractTarget (audit.go:1098-1147)."""
    if "/subjects/" in path:
        s = extract_subject(path)
        if s:
            return "subject", s
    if "/schemas/ids/" in path:
        return "schema", _segment_after(path, "/schemas/ids/")
    if "/config" in path:
        s = extract_subject(path)
        return ("config", s) if s else ("config", "_global")
    if "/mode" in path:
        s = extract_subject(path)
        return ("mode", s) if s else ("mode", "_global")
    if "/dek-registry/v1/keks" in path:
        kek = _segment_after(path, "/dek-registry/v1/keks/")
        return ("dek" if "/deks" in path else "kek", kek)
    if "/exporters" in path:
        return "exporter", _segment_after(path, "/exporters/")
    if "/admin/users" in path:
        return "user", _segment_after(path, "/admin/users/")
    if "/admin/apikeys" in path:
        return "apikey", _segment_after(path, "/admin/apikeys/")
    if "/import/" in path:
        return "schema", ""
    return "", ""


def outcome_from_status(status: int) -> str:
    return "success" if 200 <= status < 400 else "failure"


def reason_from_status(status: int) -> str:
    """reasonFromStatusCode (audit.go:1024-1046)."""
    if 200 <= status < 400:
        return ""
    return {401: "no_valid_credentials", 403: "permission_denied",
            404: "not_found", 409: "already_exists",
            400: "validation_error", 422: "invalid_schema",
            429: "rate_limited"}.get(
        status, "internal_error" if status >= 500 else "")


def classify_import_error(msg: str) -> str:
    """classifyImportError (handlers.go:1870-1885)."""
    low = msg.lower()
    if "schema id" in low or "id already" in low:
        return "schema_id_conflict"
    if "version" in low and "exists" in low:
        return "subject_version_conflict"
    if "invalid" in low or "parse" in low:
        return "invalid_schema"
    if "required" in low or "must be" in low:
        return "validation_error"
    return "internal_error"


# -- table assertion (mcp_steps.go:774-840 semantics) ---------------------


def _fmt(v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    if isinstance(v, dict):
        # Go fmt %v of a map — only ever matched against "" or "*"
        return "map[" + " ".join(f"{k}:{val}" for k, val
                                 in sorted(v.items())) + "]"
    return str(v)


def field_matches(ev: dict, field: str, want: str) -> bool:
    got = ev.get(field)
    if got is None and want == "":
        return True
    if field == "path":
        return want in _fmt(got)
    gs = _fmt(got)
    if want.endswith("*"):
        return gs.startswith(want[:-1])
    return gs == want


def match_table(events: list[dict], expected: dict[str, str]) -> bool:
    return any(all(field_matches(ev, f, w) for f, w in expected.items())
               for ev in events)


def best_partial(events: list[dict], expected: dict[str, str]) -> Any:
    """Diagnostic: the event with the most matching fields, reduced to
    its mismatching fields."""
    best, best_n = None, -1
    for ev in events:
        k = sum(field_matches(ev, f, w) for f, w in expected.items())
        if k > best_n:
            best, best_n = ev, k
    if best is None:
        return "no events"
    return {f: best.get(f) for f, w in expected.items()
            if not field_matches(best, f, w)}


def parse_expect_table(doc: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in (doc or "").splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if cells and cells[0]:
            out[cells[0]] = cells[1] if len(cells) > 1 else ""
    return out


# -- pre-request snapshot -------------------------------------------------


def _latest_live(sim, subject: str) -> dict | None:
    live = [v for v in sim.subjects.get(subject, [])
            if not v.get("deleted")]
    return max(live, key=lambda v: v["version"], default=None)


def snapshot(sim, verb: str, path: str, q: dict) -> dict:
    """State a reference handler would have read before mutating."""
    pre: dict[str, Any] = {}
    parts = [p for p in path.split("/") if p]
    if parts[:1] == ["contexts"] and len(parts) >= 3:
        ctx = parts[1] if parts[1].startswith(".") else "." + parts[1]
        if parts[2] in ("subjects", "config", "mode") and len(parts) >= 4:
            parts = [parts[2], f":{ctx}:{parts[3]}"] + parts[4:]
    if parts[:1] == ["subjects"] and len(parts) >= 2:
        subject = sim.resolve_alias(parts[1])
        pre["subject"] = subject
        latest = _latest_live(sim, subject)
        # a permanent delete after the mandatory soft-delete still
        # reads the (soft-deleted) latest for before_hash/schema_type
        latest_any = max(sim.subjects.get(subject, []),
                         key=lambda v: v["version"], default=None)
        if latest is not None:
            pre["latest"] = dict(latest)
        if latest_any is not None:
            pre["latest_any"] = dict(latest_any)
        if len(parts) >= 4 and parts[2] == "versions" and verb == "DELETE":
            v = parts[3]
            vers = sim.subjects.get(subject, [])
            if v in ("latest", "-1"):
                tgt = latest or latest_any
            else:
                try:
                    tgt = next((x for x in vers
                                if x["version"] == int(v)), None)
                except ValueError:
                    tgt = None
            if tgt is not None:
                pre["del_version"] = dict(tgt)
    elif parts[:1] == ["config"]:
        if len(parts) >= 2:
            pre["prev_level"] = sim.levels.get(parts[1])
        else:
            # the global tier always resolves (server default BACKWARD),
            # so DELETE /config is idempotent WITH a before_hash
            pre["prev_level"] = sim.root_level or "BACKWARD"
    elif parts[:1] == ["mode"]:
        if len(parts) >= 2:
            pre["prev_mode"] = sim.subj_modes.get(parts[1])
        else:
            pre["prev_mode"] = sim.root_mode or "READWRITE"
    elif parts[:2] == ["dek-registry", "v1"] and len(parts) >= 4:
        kek = parts[3]
        pre["kek"] = sim.keks.get(kek)
        if len(parts) >= 6 and parts[4] == "deks":
            dsubj = parts[5]
            by_subj = sim.deks.get(kek, {}).get(dsubj, {})
            pre["dek"] = dict(by_subj) if by_subj else None
    elif parts[:1] == ["exporters"] and len(parts) >= 2:
        pre["exporter"] = sim.exporters.get(parts[1])
    elif parts[:2] == ["admin", "users"] and len(parts) >= 3:
        try:
            pre["user"] = sim.users.get(int(parts[2]))
        except ValueError:
            pre["user"] = None
    elif parts[:2] == ["admin", "apikeys"] and len(parts) >= 3:
        try:
            pre["apikey"] = sim.apikeys.get(int(parts[2]))
        except ValueError:
            pre["apikey"] = None
    return pre


# -- event derivation -----------------------------------------------------

_BLANK = {"timestamp": "", "duration_ms": "", "event_type": "",
          "outcome": "", "actor_id": "", "actor_type": "", "role": "",
          "auth_method": "", "target_type": "", "target_id": "",
          "schema_id": "", "version": "", "schema_type": "",
          "before_hash": "", "after_hash": "", "context": "",
          "request_id": "", "transport_security": "", "source_ip": "",
          "user_agent": "", "method": "", "path": "", "status_code": "",
          "reason": "", "error": "", "request_body": "", "metadata": ""}


def _body_name(doc, key: str = "name") -> str:
    try:
        payload = json.loads(doc) if isinstance(doc, str) else (doc or {})
    except json.JSONDecodeError:
        return ""
    return payload.get(key, "") if isinstance(payload, dict) else ""


def _empty_schema_request(doc) -> bool:
    """The register handler 422s on a missing/empty schema string before
    setting any hints."""
    if doc is None:
        return True
    if isinstance(doc, str):
        text = doc.strip()
        if not text:
            return True
        if text.startswith("{"):
            try:
                payload = json.loads(text)
            except json.JSONDecodeError:
                return False
            if isinstance(payload, dict) and "schema" in payload:
                return not payload.get("schema")
    return False


def _req_schema_type(doc) -> str:
    """The parsed request schemaType the handler pins in hints
    (handlers.go:597-602) — defaults AVRO."""
    if isinstance(doc, str):
        try:
            payload = json.loads(doc)
        except (json.JSONDecodeError, TypeError):
            return "AVRO"
        if isinstance(payload, dict):
            return (payload.get("schemaType") or "AVRO").upper()
    return "AVRO"


def derive(sim, verb: str, url: str, doc, status, body, pre: dict,
           extra: dict | None = None) -> list[dict]:
    """Middleware + handler-hint event(s) for one completed request.

    ``extra`` carries step-level knowledge not in the URL (the register
    step's schemaType, for instance).  Returns [] when the request maps
    to no enabled event (audit.go:487-500 Log() gate).
    """
    if status is None:
        return []
    extra = extra or {}
    path, _, query = url.partition("?")
    q = dict(kv.split("=", 1) for kv in query.split("&") if "=" in kv)
    et = classify(verb, path, q, int(status))
    if not et or et not in DEFAULT_ENABLED:
        return []

    actor = getattr(sim, "actor", None)
    auth_method = getattr(sim, "auth_method", "") or ""
    ev = dict(_BLANK)
    ev.update({
        "timestamp": f"t{sim._ts}", "duration_ms": 1,
        "event_type": et, "outcome": outcome_from_status(int(status)),
        "reason": reason_from_status(int(status)),
        "method": verb, "path": path, "status_code": int(status),
        "request_id": f"req-{len(sim.audit_log) + 1}",
        "source_ip": "127.0.0.1", "user_agent": "bdd-replay/1.0",
        "transport_security": ("mtls" if getattr(sim, "cert_state", None)
                               == "valid" else "tls"),
        "context": ".",
    })
    # actor: the auth middleware populates hints; a 401 means no
    # authenticated principal (audit.go:676-692)
    if int(status) != 401 and isinstance(actor, dict):
        ev["actor_id"] = actor.get("username", "")
        ev["actor_type"] = ("api_key" if auth_method == "api_key"
                            else "user")
        ev["role"] = actor.get("role", "") or ""
        ev["auth_method"] = auth_method
    else:
        ev["actor_type"] = "anonymous"

    tt, tid = extract_target(path, et)
    ev["target_type"], ev["target_id"] = tt, tid

    # context: handlers set hints.Context = registryCtx parsed from the
    # subject or the /contexts/ route (resolveSubjectAndContext)
    parts = [p for p in path.split("/") if p]
    if parts[:1] == ["contexts"] and len(parts) >= 2:
        ev["context"] = (parts[1] if parts[1].startswith(".")
                         else "." + parts[1])
        if tt == "subject" and len(parts) >= 4 \
                and parts[2] == "subjects":
            ev["target_id"] = parts[3]
    elif tt in ("subject", "config", "mode") and tid.startswith(":."):
        m = re.match(r"^:(\.[^:]*):", tid)
        if m:
            ev["context"] = m.group(1)

    if int(status) in (401, 403):
        return [ev]

    # ---- handler hints per family --------------------------------------
    subject = pre.get("subject", "")
    latest = pre.get("latest")
    ok = outcome_ok(status)
    if et == "schema_register":
        ev["schema_type"] = extra.get("schema_type") \
            or _req_schema_type(doc)
        if _empty_schema_request(doc):
            # the handler 422s on an empty schema string BEFORE the
            # hint block at handlers.go:597 — no schema_type recorded
            ev["schema_type"] = ""
        if int(status) == 200 and isinstance(body, dict):
            # before/after hashes only on the success path
            # (handlers.go:704-716)
            if latest is not None:
                ev["before_hash"] = sha(latest["fp"])
            ev["schema_id"] = body.get("id", "")
            ev["version"] = body.get("version", "")
            hit = next((x for x in sim.subjects.get(subject, [])
                        if x["version"] == body.get("version")), None)
            if hit is not None:
                ev["after_hash"] = sha(hit["fp"])
                ev["schema_type"] = hit["type"] or "AVRO"
        elif int(status) == 409:
            # handler override (handlers.go:683-685)
            ev["reason"] = "incompatible"
        if ok and extra.get("schema_id") is not None:
            ev["schema_id"] = extra["schema_id"]
    elif et == "schema_lookup":
        ev["schema_type"] = extra.get("schema_type") \
            or _req_schema_type(doc)
        if int(status) == 200 and isinstance(body, dict):
            ev["schema_id"] = body.get("id", "")
            ev["version"] = body.get("version", "")
            ev["schema_type"] = body.get("schemaType", "AVRO")
    elif et in ("subject_delete_soft", "subject_delete_permanent"):
        tgt = latest or pre.get("latest_any")
        if ok and tgt is not None:
            ev["before_hash"] = sha(tgt["fp"])
            ev["schema_type"] = tgt["type"] or "AVRO"
    elif et in ("schema_delete_soft", "schema_delete_permanent"):
        tgt = pre.get("del_version")
        if ok and tgt is not None:
            ev["before_hash"] = sha(tgt["fp"])
            ev["schema_type"] = tgt["type"] or "AVRO"
            ev["schema_id"] = tgt["id"]
            ev["version"] = tgt["version"]
    elif et == "config_update":
        if ok:
            if pre.get("prev_level"):
                ev["before_hash"] = sha(pre["prev_level"])
            ev["after_hash"] = sha(doc if doc is not None else "")
    elif et == "config_delete":
        if ok and pre.get("prev_level"):
            ev["before_hash"] = sha(pre["prev_level"])
    elif et == "mode_update":
        if ok:
            if pre.get("prev_mode"):
                ev["before_hash"] = sha(pre["prev_mode"])
            ev["after_hash"] = sha(doc if doc is not None else "")
    elif et == "mode_delete":
        if ok and pre.get("prev_mode"):
            ev["before_hash"] = sha(pre["prev_mode"])
    elif et.startswith("kek_"):
        # CreateKEK sets target hints only on success (dek.go:61-65)
        kek_name = tid or (_body_name(doc) if ok else "")
        ev["target_id"] = kek_name
        post = sim.keks.get(kek_name)
        if ok and pre.get("kek") is not None:
            ev["before_hash"] = sha(pre["kek"])
        if et in ("kek_create", "kek_update", "kek_undelete", "kek_test") \
                and post is not None and ok:
            ev["after_hash"] = sha(post)
    elif et.startswith("dek_"):
        kek_name = tid
        dsubj = _segment_after(path, "/deks/") or _body_name(doc,
                                                             "subject")
        post = sim.deks.get(kek_name, {}).get(dsubj)
        if ok and pre.get("dek") is not None:
            ev["before_hash"] = sha(pre["dek"])
        elif ok and post is not None and et != "dek_create":
            ev["before_hash"] = sha(post)
        if et in ("dek_create", "dek_undelete") and post \
                and ok:
            ev["after_hash"] = sha(post)
        if ok and "/versions/" in path:
            # versioned DEK delete/undelete pins the version
            # (dek.go:445-452)
            v = _segment_after(path, "/versions/")
            if v.isdigit():
                ev["version"] = int(v)
    elif et.startswith("exporter_"):
        # CreateExporter sets target hints early, even on failure
        # (exporter.go:50-54)
        name = _segment_after(path, "/exporters/") or _body_name(doc)
        ev["target_type"], ev["target_id"] = "exporter", name
        post = sim.exporters.get(name)
        if ok and pre.get("exporter") is not None:
            ev["before_hash"] = sha(pre["exporter"])
        if et != "exporter_delete" and post is not None and ok:
            ev["after_hash"] = sha(post)
    elif et in ("user_create", "user_update", "user_delete"):
        if et == "user_create" and outcome_ok(status) \
                and isinstance(body, dict):
            ev["target_id"] = body.get("username", tid)
            ev["after_hash"] = sha(body)
        if pre.get("user") is not None:
            ev["before_hash"] = sha(pre["user"])
            ev["target_id"] = tid or pre["user"].get("username", "")
        if et == "user_update" and outcome_ok(status) \
                and isinstance(body, dict):
            ev["after_hash"] = sha(body)
    elif et.startswith("apikey_"):
        if et == "apikey_create" and outcome_ok(status) \
                and isinstance(body, dict):
            ev["target_id"] = body.get("name", tid)
            ev["after_hash"] = sha(body)
        if pre.get("apikey") is not None:
            ev["before_hash"] = sha(pre["apikey"])
            ev["target_id"] = tid or pre["apikey"].get("name", "")
        if et in ("apikey_update", "apikey_revoke", "apikey_rotate") \
                and outcome_ok(status) and isinstance(body, dict):
            ev["after_hash"] = sha(body)
    elif et == "password_change":
        # account.go:93-96 — target set after a successful change
        if ok and isinstance(actor, dict):
            ev["target_type"] = "user"
            ev["target_id"] = actor.get("username", "")
    elif et == "compatibility_check":
        sub = _segment_after(path, "/compatibility/subjects/")
        if sub:
            ev["target_type"], ev["target_id"] = "subject", sub
            m = re.match(r"^:(\.[^:]*):", sub)
            if m:
                ev["context"] = m.group(1)
    elif et == "schema_import":
        return _import_events(sim, ev, doc, body)
    return [ev]


def outcome_ok(status) -> bool:
    return 200 <= int(status) < 400


def _import_events(sim, base: dict, doc, body) -> list[dict]:
    """emitPerSchemaAuditEvents (handlers.go:1796-1869): one event per
    schema in the bulk request; the middleware's own event is
    suppressed."""
    try:
        payload = json.loads(doc) if isinstance(doc, str) else (doc or {})
    except json.JSONDecodeError:
        return [base]
    schemas = payload.get("schemas") or []
    results = (body or {}).get("results") if isinstance(body, dict) else None
    if not schemas or results is None:
        # mode-gate 422 etc.: the handler bails before per-schema
        # emission, but AFTER hints.TargetType="subject"
        # (handlers.go:1651-1653), so the middleware event stands with
        # the subject target type
        base["target_type"], base["target_id"] = "subject", ""
        return [base]
    out = []
    for i, res in enumerate(results):
        ev = dict(base)
        req = schemas[i] if i < len(schemas) else {}
        ok = bool(res.get("success"))
        ev.update({
            "outcome": "success" if ok else "failure",
            "status_code": 200 if ok else 422,
            "reason": "" if ok else classify_import_error(
                res.get("error", "")),
            "error": "" if ok else res.get("error", ""),
            "target_type": "subject",
            "target_id": req.get("subject", ""),
            "schema_id": req.get("id", ""),
            "version": req.get("version", ""),
            "schema_type": (req.get("schemaType") or "AVRO").upper(),
            "after_hash": sha(req.get("schema", "")) if ok else "",
            "metadata": {"batch_size": str(len(schemas)),
                         "batch_index": str(i)},
        })
        out.append(ev)
    return out


def classify_mcp_error(msg: str) -> str:
    """classifyMCPError (audit.go:1049-1069)."""
    low = msg.lower()
    if "not found" in low:
        return "not_found"
    if "permission" in low or "forbidden" in low or "unauthorized" in low:
        return "permission_denied"
    if "already exists" in low or "duplicate" in low:
        return "already_exists"
    if "invalid schema" in low or "parse" in low:
        return "invalid_schema"
    if "incompatible" in low:
        return "incompatible"
    if "invalid" in low or "required" in low or "missing" in low:
        return "validation_error"
    return "internal_error"


def mcp_event(sim, event_type: str, tool: str,
              args: dict | None = None, *, error: str = "") -> None:
    """LogMCPEvent / LogMCPConfirmationEvent (audit.go:1263-1343):
    method "MCP", path = tool name, status_code 0, no transport
    fields; target = the subject argument when present."""
    args = args or {}
    ev = dict(_BLANK)
    ev.update({
        "timestamp": f"t{sim._ts}", "duration_ms": 1,
        "event_type": event_type,
        "outcome": "failure" if error else "success",
        "actor_id": "mcp-anonymous", "actor_type": "anonymous",
        "method": "MCP", "path": tool, "status_code": 0,
        "context": str(args.get("context") or "."),
        "error": error,
        "reason": classify_mcp_error(error) if error else "",
    })
    subj = args.get("subject")
    if subj and event_type in ("mcp_tool_call", "mcp_tool_error"):
        ev["target_type"], ev["target_id"] = "subject", str(subj)
    if event_type.startswith("mcp_confirm"):
        # confirmation events carry no error/target/context-from-args
        ev.update({"outcome": "success", "error": "", "reason": "",
                   "context": ".", "target_type": "", "target_id": ""})
    sim.audit_log.append(ev)


# -- real local audit-output receivers (audit_outputs.feature) ------------


class WebhookReceiver:
    """In-process HTTP server collecting NDJSON audit batches — the
    BDD environment's webhook receiver, minus Docker."""

    def __init__(self) -> None:
        import http.server
        import threading

        receiver = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length", 0))
                for line in self.rfile.read(n).decode().splitlines():
                    if line.strip():
                        receiver.events.append(json.loads(line))
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):
                pass

        self.events: list[dict] = []
        self.server = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}/audit"
        threading.Thread(target=self.server.serve_forever,
                         daemon=True).start()


class SyslogReceiver:
    """In-process TCP server parsing RFC 5425 length-framed RFC 5424
    syslog messages."""

    def __init__(self) -> None:
        import socketserver
        import threading

        receiver = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                data = self.rfile.read().decode(errors="replace")
                while data:
                    length, sep, rest = data.partition(" ")
                    if not sep or not length.isdigit():
                        break
                    n = int(length)
                    receiver.messages.append(rest[:n])
                    data = rest[n:]

        self.messages: list[str] = []
        self.server = socketserver.ThreadingTCPServer(
            ("127.0.0.1", 0), Handler)
        self.server.daemon_threads = True
        self.port = self.server.server_address[1]
        threading.Thread(target=self.server.serve_forever,
                         daemon=True).start()


_WEBHOOK_RECEIVER: WebhookReceiver | None = None
_SYSLOG_RECEIVER: SyslogReceiver | None = None


def audit_wire(sim) -> None:
    """Attach real webhook + syslog delivery to a sim (the
    audit_outputs.feature environment): every derived audit event is
    POSTed as NDJSON to a live local HTTP receiver and written
    length-framed to a live local syslog receiver through the
    PRODUCTION sink classes."""
    global _WEBHOOK_RECEIVER, _SYSLOG_RECEIVER
    from axonops_schema_registry_spark.streaming.audit import (
        HttpWebhookSink,
        SyslogTcpSink,
    )

    if _WEBHOOK_RECEIVER is None:
        _WEBHOOK_RECEIVER = WebhookReceiver()
    if _SYSLOG_RECEIVER is None:
        _SYSLOG_RECEIVER = SyslogReceiver()
    _WEBHOOK_RECEIVER.events.clear()
    _SYSLOG_RECEIVER.messages.clear()
    sim._audit_wire = (
        HttpWebhookSink(_WEBHOOK_RECEIVER.url),
        SyslogTcpSink("127.0.0.1", _SYSLOG_RECEIVER.port,
                      app_name="schema-registry-test"),
        _WEBHOOK_RECEIVER, _SYSLOG_RECEIVER)


def webhook_events(sim, min_count: int = 0) -> list[dict]:
    """Received webhook events; syslog/webhook delivery is threaded,
    so poll briefly until the expected volume lands."""
    import time

    wh = sim._audit_wire[2]
    for _ in range(50):
        if len(wh.events) >= max(min_count, 1):
            break
        time.sleep(0.01)
    return wh.events


def syslog_messages(sim, needle: str = "") -> list[str]:
    import time

    sr = sim._audit_wire[3]
    for _ in range(100):
        if any(needle in m for m in sr.messages):
            break
        time.sleep(0.01)
    return sr.messages


# -- metrics middleware replica (metrics.go:517-560 + recorders) ----------


def metrics_of(sim):
    m = getattr(sim, "metrics", None)
    if m is None:
        from axonops_schema_registry_spark.registry.metrics import (
            MetricsRegistry,
        )
        m = sim.metrics = MetricsRegistry()
    return m


def scrape(sim) -> str:
    """GET /metrics: refresh the storage-derived gauges from sim state
    (refreshGauges, metrics.go:474-486) and render the exposition."""
    m = metrics_of(sim)
    live_by_subject: dict[str, int] = {}
    type_counts: dict[str, int] = {}
    for subj, vers in sim.subjects.items():
        live = [v for v in vers if not v.get("deleted")]
        if live:
            live_by_subject[subj] = len(live)
            for v in live:
                t = v["type"] or "AVRO"
                type_counts[t] = type_counts.get(t, 0) + 1
    m.refresh_gauges(len(live_by_subject), type_counts,
                     live_by_subject)
    m.set("schema_registry_cache_size",
          float(len(sim.apikeys) + len(sim.config_keys)), "api_keys")
    return m.render()


def has_metric(body: str, name: str) -> bool:
    """hasMetric (metrics_steps.go:168-181)."""
    for line in body.split("\n"):
        if line.startswith("#"):
            if name in line:
                return True
            continue
        if line.startswith(name):
            return True
    return False


_METRIC_LINE = re.compile(
    r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(\{[^}]*\})?\s+([0-9eE.+-]+)")


def metric_value(body: str, name: str) -> float | None:
    """getMetricValue (metrics_steps.go:186-201): first sample whose
    bare name matches exactly."""
    for line in body.split("\n"):
        if line.startswith("#"):
            continue
        m = _METRIC_LINE.match(line)
        if m and m.group(1) == name:
            return float(m.group(3))
    return None


def metric_with_labels(body: str, name: str, labels: str) -> bool:
    """Label-substring matching (metrics_steps.go:81-103)."""
    labels = labels.replace('\\"', '"')
    return any(line.startswith(name + "{") and labels in line
               for line in body.split("\n"))


def observe_metrics(sim, verb: str, url: str, status, body,
                    events: list[dict]) -> None:
    """Everything the reference's middleware chain records for one
    request: HTTP counters, Confluent counters, per-principal series,
    auth attempts + credential cache, storage ops, and the per-family
    recorder the handler would have called."""
    if status is None:
        return
    m = metrics_of(sim)
    status = int(status)
    path = url.partition("?")[0]
    actor = sim.actor if isinstance(getattr(sim, "actor", None), dict) \
        else None
    principal = actor.get("username") if actor and status != 401 \
        else None
    m.observe_http(verb, path, status, principal=principal)
    if getattr(sim, "actor", None) is not None:
        method = getattr(sim, "auth_method", "") or "basic"
        if status == 401:
            m.record_auth_attempt(method, False, "invalid_credentials")
        elif actor is not None:
            m.record_auth_attempt(method, True)
            seen = getattr(sim, "_cred_seen", None)
            if seen is None:
                seen = sim._cred_seen = set()
            cred = actor.get("username", "")
            m.record_cache_access("credentials", cred in seen)
            seen.add(cred)
    if status not in (401, 403):
        m.record_storage_operation("memory", verb.lower(),
                                   error=(status == 404
                                          or status >= 500))
    ok = 200 <= status < 400
    for ev in events:
        m.record_audit_event("stdout")
        et = ev["event_type"]
        if et == "schema_register":
            m.record_schema_registration(
                ev.get("schema_type") or "AVRO", ok)
        elif ok and et in ("subject_delete_soft",
                           "subject_delete_permanent",
                           "schema_delete_soft",
                           "schema_delete_permanent"):
            m.record_schema_deletion(ev.get("schema_type") or "AVRO")
        elif et == "compatibility_check":
            if ok and isinstance(body, dict):
                m.record_compatibility_check(
                    "AVRO", "BACKWARD",
                    bool(body.get("is_compatible", True)))
            elif status == 422:
                # checker failed to parse the candidate
                m.inc("schema_registry_compatibility_errors_total",
                      "AVRO", "BACKWARD")
        elif et == "auth_ldap_fallback":
            m.record_ldap_fallback(ev.get("actor_id", ""))


def record(sim, verb: str, url: str, doc, status, body, pre: dict,
           extra: dict | None = None) -> None:
    fb = getattr(sim, "pending_ldap_fallback", None)
    if fb:
        # auth.go LogEvent path: the LDAP middleware logs the fallback
        # warning against the in-flight request, before the handler runs
        # (statusCode 0, no transport/context fields)
        ev = dict(_BLANK)
        ev.update({
            "timestamp": f"t{sim._ts}", "duration_ms": 1,
            "event_type": "auth_ldap_fallback", "outcome": "warning",
            "actor_id": fb, "actor_type": "user", "auth_method": "ldap",
            "target_type": "user", "target_id": fb,
            "reason": "ldap_user_not_found_fallback_to_db",
            "method": verb, "path": url.partition("?")[0],
            "status_code": 0,
            "request_id": f"req-{len(sim.audit_log) + 1}",
            "source_ip": "127.0.0.1", "user_agent": "bdd-replay/1.0",
        })
        sim.audit_log.append(ev)
        sim.pending_ldap_fallback = None
        metrics_of(sim).record_ldap_fallback(fb)
    events = derive(sim, verb, url, doc, status, body, pre, extra)
    sim.audit_log.extend(events)
    observe_metrics(sim, verb, url, status, body, events)
    wire = getattr(sim, "_audit_wire", None)
    if wire is not None and events:
        webhook_sink, syslog_sink = wire[0], wire[1]
        webhook_sink.send_events(events)
        for ev in events:
            syslog_sink.send(json.dumps(ev, default=str))
