"""Replay the reference's deletion/lifecycle BDD scenarios against a pure
registry state model built from THIS repo's semantics.

``RegistrySim`` is the single-tenant in-memory model of the semantics our
Spark operators implement — registration (dedup → gate → version
allocation, ``registry/registration.py``), the soft/permanent delete
taxonomy (``version_delete_status`` / del1 / del2), content-addressed
schema ids (W3), and visibility rules (P1/P4).  The replay feeds it the
reference's own acceptance scenarios (deletion_exhaustive,
delete_and_reregister, confluent_conformance, schema_id_stability, ...)
and asserts every HTTP status / error code / field assertion matches —
status-level parity for the whole lifecycle surface, not just compat.

The validator / compat / fingerprint calls are the REAL production
functions; only the mutable-state bookkeeping is simulated.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any

import bdd_audit
from bdd_parity import FEATURES_DIR, _scenarios

LIFECYCLE_FEATURES = (
    "deletion.feature",
    "deletion_exhaustive.feature",
    "deletion_lifecycle.feature",
    "deletion_advanced.feature",
    "delete_and_reregister.feature",
    "confluent_conformance.feature",
    "schema_deduplication.feature",
    "schema_identity.feature",
    "schema_id_stability.feature",
    # config / mode resolution + write gating (modes.py semantics)
    "config_defaults.feature",
    "config_inheritance.feature",
    "config_merge.feature",
    "configuration.feature",
    "compatibility_config_exhaustive.feature",
    "delete_global_config.feature",
    "delete_global_mode.feature",
    "mode_management.feature",
    "mode_exhaustive.feature",
    "mode_enforcement.feature",
    "readonly_enforcement.feature",
    # cross-subject schema references (J1 referenced-by / J3 resolution)
    "schema_references.feature",
    "references_exhaustive.feature",
    # multi-tenant contexts (ctx1/lv1: :.ctx: addressing, per-context id
    # spaces, the context config/mode tier)
    "contexts.feature",
    "contexts_isolation.feature",
    "contexts_operations.feature",
    "contexts_config_mode.feature",
    "contexts_global_config.feature",
    "contexts_edge_cases.feature",
    "contexts_validation.feature",
    "contexts_schema_types.feature",
    "contexts_url_routing.feature",
    # round-5 second wave: the remaining registry-domain features — full
    # config bodies, ruleSet validation, reserved fields, aliases,
    # pagination, import mode, raw-schema/history/export endpoints,
    # subject validation/matching, compat groups, verbose checks
    "ruleset_validation.feature",
    "encoding_rules.feature",
    "metadata_rulesets.feature",
    "reserved_fields.feature",
    "subject_aliases.feature",
    "advanced_features.feature",
    "configuration_advanced.feature",
    "compatibility_verbose.feature",
    "compatibility_groups.feature",
    "compatibility_modes.feature",
    "compare_and_set.feature",
    "compatibility_jsonschema_validation.feature",
    "concurrent_access.feature",
    "concurrency_edge_cases.feature",
    "boundary_testing.feature",
    "edge_cases.feature",
    "error_codes_exhaustive.feature",
    "error_handling_exhaustive.feature",
    "api_errors.feature",
    "api_endpoints_advanced.feature",
    "response_shapes.feature",
    "pagination.feature",
    "pagination_exhaustive.feature",
    "import_mode_comprehensive.feature",
    "schema_registration.feature",
    "schema_registration_exhaustive.feature",
    "schema_lookup.feature",
    "schema_lookup_exhaustive.feature",
    "schema_listing.feature",
    "schema_listing_advanced.feature",
    "subject_filtering.feature",
    "subject_operations.feature",
    "subject_version_exhaustive.feature",
    "unicode_subjects.feature",
    "raw_schema_endpoints.feature",
    "rest_subject_validation.feature",
    "rest_subject_history_export.feature",
    "references_edge_cases.feature",
    "schema_references_advanced.feature",
    "schema_types.feature",
    "schema_types_avro.feature",
    "schema_types_jsonschema.feature",
    "schema_types_protobuf.feature",
    "schema_avro_advanced.feature",
    "schema_jsonschema_advanced.feature",
    "schema_protobuf_advanced.feature",
    "avro_namespace_inheritance.feature",
    "audit_rest.feature",
    "contexts_real_world.feature",
    "contexts_schema_evolution.feature",
    "contexts_config_mode_advanced.feature",
    "contexts_advanced_api.feature",
    "contexts_references.feature",
    "modeling_avro_conformance.feature",
    "modeling_avro_ecommerce.feature",
    "modeling_avro_reference_evolution.feature",
    "modeling_jsonschema_conformance.feature",
    "modeling_jsonschema_api_contracts.feature",
    "modeling_jsonschema_reference_evolution.feature",
    "modeling_protobuf_conformance.feature",
    "modeling_protobuf_iot.feature",
    "modeling_protobuf_reference_evolution.feature",
    "modeling_full_lifecycle.feature",
    # CSFLE DEK registry (KEK/DEK CRUD, soft/permanent/undelete, version
    # taxonomy; kms_encryption.feature stays out — it needs a live Vault)
    "dek_registry.feature",
    # REST analysis surface — wired through the PRODUCTION helpers
    # (registry.analysis quality/complexity/fuzzy, registry.fields,
    # registry.evolution validate/normalize)
    "rest_schema_search.feature",
    "rest_statistics.feature",
    "rest_subject_diff_evolve.feature",
    "rest_schema_analysis.feature",
    "rest_compatibility_analysis.feature",
    "rest_schema_validation.feature",
    "rest_analysis_edge_cases.feature",
    # exporter CRUD + pause/resume/reset lifecycle and the bulk
    # explicit-ID import endpoint (partial results, ID-conflict rules)
    "exporters.feature",
    "schema_import.feature",
    "import_advanced.feature",
    "import_conflict.feature",
    # goroutine races replayed sequentially — the registry's writes are
    # serialized, so the deterministic converged outcome is the contract
    "concurrency.feature",
    "concurrency_edge_cases.feature",
    # HTTP surface basics: health/liveness, server metadata, OpenAPI
    # docs (served from the reference's api/openapi.yaml), 405 method
    # guard, content-type contracts, hardening error shapes
    "health.feature",
    "health_and_metadata.feature",
    "server_info.feature",
    "method_not_allowed.feature",
    "content_types.feature",
    "documentation.feature",
    "security_hardening.feature",
    # the auth-backed admin surface: seeded super_admin + basic-auth
    # actors, role permissions on every route once authenticated,
    # user/API-key CRUD, self-service account endpoints
    "admin_users.feature",
    "admin_apikeys.feature",
    "account_self_service.feature",
    "auth_apikey_memory.feature",
    "auth_basic.feature",
    "auth_htpasswd.feature",
    "rate_limiting.feature",
    # IdP-backed auth semantics (claims/role mapping, bearer-only
    # rejection of Basic, issuer/audience checks, LDAP DB-fallback,
    # mTLS transport refusal + the @mtls-auth basic layer); the token
    # CRYPTO itself needs the live stacks and is out of scope
    "auth_flows.feature",
    "auth_jwt.feature",
    "auth_oidc.feature",
    "auth_ldap.feature",
    "auth_mtls.feature",
    # compatibility features replayed a SECOND way: the compat suite
    # (bdd_parity.py) checks abstract verdicts through check_compatibility;
    # this full-sim replay additionally verifies their HTTP status codes
    # and every audit-event table
    "avro_compatibility_exhaustive.feature",
    "compatibility.feature",
    "compatibility_avro.feature",
    "compatibility_jsonschema.feature",
    "compatibility_protobuf.feature",
    "compatibility_transitive.feature",
    "compatibility_transitive_chain.feature",
    "modeling_avro_compatibility.feature",
    "modeling_jsonschema_compatibility.feature",
    "modeling_negative_validation.feature",
    "modeling_protobuf_compatibility.feature",
    "schema_parsing_exhaustive.feature",
    # Prometheus metrics surface (registry/metrics.py name/label/type
    # parity; scrape assertions per metrics_steps.go)
    "metrics_axonops.feature",
    "metrics_confluent_compat.feature",
    "metrics_auth.feature",
    # audit sinks: file/stdout tables + LIVE local webhook and syslog
    # receivers fed through the production sink classes
    "audit_outputs.feature",
    # backend process lifecycle: memory loses state on restart,
    # persistent backends keep it (restart/stop/kill/pause semantics)
    "operational_memory.feature",
    "operational_postgres.feature",
    "operational_mysql.feature",
    "operational_cassandra.feature",
)

MAX_VERSION = 2 ** 31 - 1


def _fuzzy_score(query: str, target: str) -> float:
    """1 - levenshtein/maxlen on lowercased strings (fuzzy.go:41-56)."""
    q, t = query.lower(), target.lower()
    if q == t:
        return 1.0
    if not q and not t:
        return 1.0
    prev = list(range(len(t) + 1))
    for i, cq in enumerate(q, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (cq != ct)))
        prev = cur
    return 1.0 - prev[-1] / max(len(q), len(t))
LEVELS = {"NONE", "BACKWARD", "FORWARD", "FULL", "BACKWARD_TRANSITIVE",
          "FORWARD_TRANSITIVE", "FULL_TRANSITIVE"}
MODES = {"READWRITE", "READONLY", "READONLY_OVERRIDE", "IMPORT"}


class RegistrySim:
    """Single-tenant registry state machine (memory/store.go semantics)."""

    def __init__(self) -> None:
        self.subjects: dict[str, list[dict]] = {}
        #: (context, fingerprint) -> schema id; EACH context has its own
        #: id space (the reference scopes every registry op by context)
        self.ids: dict[tuple[str, str], int] = {}
        self.next_ids: dict[str, int] = {}
        #: default-context tier (root /config и /mode); None = unset —
        #: falls through to the __GLOBAL tier, then the server default
        self.root_level: str | None = None
        self.levels: dict[str, str] = {}     # subjects + ":.ctx:" tiers
        self.root_mode: str | None = None
        self.subj_modes: dict[str, str] = {}
        #: full config bodies (defaultMetadata / overrideMetadata /
        #: defaultRuleSet / overrideRuleSet) per subject + global
        self.cfg_extra: dict[str, dict] = {}
        self.glob_cfg_extra: dict = {}
        #: DEK registry (dek_registry.feature; memory/store.go:1632-2010):
        #: keks[name] -> record; deks[kek][subject][version] -> record
        self.keks: dict[str, dict] = {}
        self.deks: dict[str, dict[str, dict[int, dict]]] = {}
        #: exporters (exporters.feature; registry_exporter.go)
        self.exporters: dict[str, dict] = {}
        self.exporter_status: dict[str, dict] = {}
        #: auth store (admin_users/admin_apikeys/account_self_service):
        #: the test server pre-seeds a super_admin + two config-defined
        #: API keys; actor None = anonymous, "bad" = failed credentials
        self.users: dict[int, dict] = {
            1: {"id": 1, "username": "admin", "email": "",
                "role": "super_admin", "enabled": True,
                "password": "admin-password"}}
        self.apikeys: dict[int, dict] = {}
        self.next_uid = 2
        self.actor = None
        self.config_keys = {"test-apikey-admin": "admin",
                            "test-apikey-readonly": "readonly"}
        #: htpasswd fixture users (auth_htpasswd.feature; RBAC
        #: default_role readonly)
        self.htpasswd = {"htuser1": "htpassword1",
                         "htuser2": "htpassword2"}
        #: IdP-provisioned identities (LDAP/OIDC fixtures + the mTLS
        #: env's admin/admin and the LDAP DB-fallback bootstrap user)
        self.idp_users = {("admin", "adminpass"): "admin",
                          ("admin", "admin"): "super_admin",
                          ("developer", "devpass"): "developer",
                          ("readonly", "readonlypass"): "readonly",
                          ("nogroup", "nogrouppass"): "readonly",
                          ("localadmin", "localadminpass"):
                              "super_admin"}
        #: mTLS transport state: None (no TLS client), "valid",
        #: "refused" (missing/expired/wrong-CA cert)
        self.cert_state = None
        self.conn_refused = False
        #: bearer-only servers (JWT/OIDC) reject Basic credentials
        self.bearer_only = False
        #: the auth_* features run against an auth-REQUIRED server
        self.auth_required = False
        self._ts = 1700000000000
        #: audit middleware replica (bdd_audit.py; audit.go:640-760):
        #: one derived event per security-relevant request
        self.audit_log: list[dict] = []
        self.auth_method = ""

    # -- context addressing (:.ctx:subject, default context ".") ---------
    @staticmethod
    def ctx_of(subject: str) -> str:
        m = re.match(r"^:(\.[^:]*):", subject)
        return m.group(1) if m else "."

    def _ctx_key(self, subject: str) -> str | None:
        """The context-tier config key (':.ctx:'), None in the default
        context (whose tier IS the root row)."""
        ctx = self.ctx_of(subject)
        return f":{ctx}:" if ctx != "." else None

    _GLOBAL_KEY = ":.__GLOBAL:"

    @staticmethod
    def valid_ctx(ctx: str) -> bool:
        return ctx == "." or bool(re.fullmatch(r"\.[A-Za-z0-9._\-]+", ctx))

    def list_contexts(self) -> tuple[int, Any]:
        ctxs = {"."} | {self.ctx_of(s) for s, vs in self.subjects.items()
                        if vs}
        return 200, sorted(ctxs)

    # -- mode resolution (modes.py semantics + the contexts tier) ---------
    def resolved_mode(self, subject: str) -> str:
        if self.root_mode == "READONLY_OVERRIDE":
            return "READONLY_OVERRIDE"  # root kill switch (modes.py)
        if subject in self.subj_modes:
            return self.subj_modes[subject]
        ck = self._ctx_key(subject)
        if ck is None:
            if self.root_mode is not None:
                return self.root_mode
        elif ck in self.subj_modes:
            return self.subj_modes[ck]
        return self.subj_modes.get(self._GLOBAL_KEY, "READWRITE")

    def _write_blocked(self, subject: str) -> bool:
        return self.resolved_mode(subject) in ("READONLY",
                                               "READONLY_OVERRIDE")

    # -- config bodies / aliases / reserved fields ------------------------
    #: full-config keys echoed by PUT/GET /config (ConfigRequest,
    #: handlers.go:1093-1110 / configToResponse:1426-1440)
    _CFG_KEYS = ("normalize", "validateFields", "alias",
                 "compatibilityGroup", "defaultMetadata",
                 "overrideMetadata", "defaultRuleSet", "overrideRuleSet",
                 "aliasForDeks", "compatibilityPolicy")

    def _cfg_body(self, base: dict, extra: dict | None) -> dict:
        out = dict(base)
        for k in self._CFG_KEYS:
            v = (extra or {}).get(k)
            # Go omitempty: empty strings drop out, but normalize /
            # validateFields are *bool — an explicit false survives
            if v is not None and v != "":
                out[k] = v
        return out

    @staticmethod
    def _invalid_cfg_ruleset(extra: dict | None):
        """422/42201 when defaultRuleSet/overrideRuleSet is malformed
        (registry.go:817-824 → ErrInvalidRuleSet → handlers.go:1073)."""
        from axonops_schema_registry_spark.registry.rules import (
            validate_ruleset_obj,
        )

        for key in ("defaultRuleSet", "overrideRuleSet"):
            if extra and extra.get(key) is not None:
                issues = validate_ruleset_obj(extra[key])
                if issues:
                    return 422, {"error_code": 42201,
                                 "message": f"invalid {key}: " +
                                            "; ".join(issues)}
        return None

    def _cfg_chain(self, subject: str, key: str):
        """4-tier config value lookup: subject → context tier → __GLOBAL
        (GetSubjectConfigFull / isNormalizeEnabled shape)."""
        for holder in (self.cfg_extra.get(subject),
                       self.cfg_extra.get(self._ctx_key(subject) or "")
                       if self._ctx_key(subject) else self.glob_cfg_extra,
                       self.cfg_extra.get(self._GLOBAL_KEY)):
            if holder and holder.get(key) is not None:
                return holder[key]
        return None

    def resolve_alias(self, subject: str) -> str:
        """Single-level alias redirect (registry_helpers.go:28-37),
        applied by the read/write subject handlers."""
        alias = self._cfg_chain(subject, "alias")
        return alias if alias else subject

    @staticmethod
    def _reserved_fields(metadata) -> set[str]:
        """'confluent:reserved' metadata property → field-name set
        (registry.go:1460-1481)."""
        props = (metadata or {}).get("properties") or {}
        val = props.get("confluent:reserved") or ""
        return {f.strip() for f in val.split(",") if f.strip()}

    @staticmethod
    def _top_level_fields(text: str, stype: str) -> set[str]:
        """Top-level field names per schema type (schema/types.go:31-35:
        Avro record fields, JSON Schema properties, any top-level
        Protobuf message's fields)."""
        try:
            if stype == "PROTOBUF":
                from axonops_schema_registry_spark.registry.protobuf_parse import (
                    parse_proto,
                )

                parsed = parse_proto(text)
                return {f.name for msg in parsed.messages.values()
                        for f in msg.fields.values()}
            doc = json.loads(text)
            if not isinstance(doc, dict):
                return set()
            if stype == "JSON":
                props = doc.get("properties")
                return set(props) if isinstance(props, dict) else set()
            if doc.get("type") == "record":
                return {f.get("name") for f in doc.get("fields", [])
                        if isinstance(f, dict)}
        except Exception:
            pass
        return set()

    def _validate_reserved(self, subject: str, text: str, stype: str,
                           req_metadata) -> list[str]:
        """validateReservedFields (registry.go:1483-1512): runs on the
        RAW request metadata, before inheritance/merge."""
        reserved = self._reserved_fields(req_metadata)
        msgs = []
        latest = max(self._live(subject),
                     key=lambda v: v["version"], default=None)
        if latest is not None:
            for field in sorted(
                    self._reserved_fields(latest.get("metadata"))):
                if field not in reserved:
                    msgs.append(
                        f"The new schema has reserved field {field} "
                        "removed from its metadata which is present in "
                        "the old schema's metadata.")
        fields = self._top_level_fields(text, stype)
        for field in sorted(reserved):
            if field in fields:
                msgs.append("The new schema has field that conflicts "
                            f"with the reserved field {field}.")
        return msgs

    # -- helpers ----------------------------------------------------------
    @staticmethod
    def _merge_meta(a, b):
        """Section-wise deep merge, later argument wins on conflicts
        (registry.go:1724-1800): dict sections merge key-wise, list
        sections union preserving order."""
        if a is None:
            return json.loads(json.dumps(b)) if b is not None else None
        if b is None:
            return json.loads(json.dumps(a))
        out = dict(a)
        for k, v in b.items():
            if k in out and isinstance(out[k], dict) \
                    and isinstance(v, dict):
                out[k] = {**out[k], **v}
            elif k in out and isinstance(out[k], list) \
                    and isinstance(v, list):
                if all(isinstance(x, dict) and "name" in x
                       for x in out[k] + v):
                    # rule lists merge BY NAME, later layer replaces
                    names_b = {x["name"] for x in v}
                    out[k] = [x for x in out[k]
                              if x["name"] not in names_b] + list(v)
                else:
                    out[k] = out[k] + [x for x in v if x not in out[k]]
            else:
                out[k] = v
        return out

    def _fp(self, text: str, stype: str,
            references: list[dict] | None = None) -> str | None:
        from axonops_schema_registry_spark.registry.evolution import (
            validate_and_normalize,
        )
        from axonops_schema_registry_spark.registry.spark_udfs import (
            canonical_fingerprint,
        )

        if not references:
            r = validate_and_normalize(text, stype)
            return r["fingerprint"] if r["is_valid"] else None
        # references pre-resolve external names: validate with them known
        try:
            if stype == "AVRO":
                from axonops_schema_registry_spark.registry.avro import (
                    avro_validate,
                )

                avro_validate(text, defined_extra={
                    r["name"] for r in references})
            elif stype == "PROTOBUF":
                from axonops_schema_registry_spark.registry.protobuf_parse import (
                    parse_proto,
                    proto_validate,
                )

                proto_validate(parse_proto(text), known_imports=tuple(
                    r["name"] for r in references))
            else:
                json.loads(text)
            return canonical_fingerprint(text, stype)
        except Exception:
            return None

    def _live(self, subject: str) -> list[dict]:
        return [v for v in self.subjects.get(subject, [])
                if not v["deleted"]]

    # -- write path -------------------------------------------------------
    def _referenced_by(self, subject: str, versions: set[int],
                       exclude_subject: str | None = None) -> list[int]:
        """Schema ids of LIVE versions referencing (subject, version in
        versions) — the J1 reverse-reference join."""
        out = []
        for s2 in self.subjects:
            if s2 == exclude_subject:
                continue
            ctx2 = self.ctx_of(s2)
            for x in self._live(s2):
                for r in x.get("references") or []:
                    rs = self._qualify_ref(ctx2, r.get("subject", ""))
                    if rs == subject and r.get("version") in versions:
                        out.append(x["id"])
        return sorted(set(out))

    @staticmethod
    def _qualify_ref(ctx: str, ref_subject: str) -> str:
        """References resolve within the referring schema's context:
        unqualified target names gain the :.ctx: prefix."""
        if ctx != "." and not ref_subject.startswith(":"):
            return f":{ctx}:{ref_subject}"
        return ref_subject

    @staticmethod
    def _fold_refs_fp(fp: str, references: list[dict]) -> str:
        """computeGlobalFingerprint (registry.go:1516-1540): the same
        schema body with different references gets a different id."""
        import hashlib

        h = hashlib.sha256()
        h.update(fp.encode())
        for r in sorted(references,
                        key=lambda r: (r.get("subject", ""),
                                       r.get("version", 0),
                                       r.get("name", ""))):
            h.update(f"\x00{r.get('name', '')}\x00{r.get('subject', '')}"
                     f"\x00{r.get('version', 0)}".encode())
        return h.hexdigest()

    def register(self, subject: str, text: str, stype: str = "AVRO",
                 metadata=None, rule_set=None,
                 references: list[dict] | None = None) -> tuple[int, Any]:
        from axonops_schema_registry_spark.registry.compat import (
            check_compatibility,
        )

        subject = self.resolve_alias(subject)
        ctx = self.ctx_of(subject)
        if not self.valid_ctx(ctx):
            return 422, {"error_code": 42210,
                         "message": "Invalid context name"}
        if ctx == ".__GLOBAL":
            # __GLOBAL is a virtual context holding only config/mode
            return 400, {"error_code": 400,
                         "message": "cannot register in __GLOBAL"}
        if self._write_blocked(subject):
            return 422, {"error_code": 42205}
        if self.resolved_mode(subject) == "IMPORT":
            # normal registration is not allowed in IMPORT mode —
            # explicit-ID import is the only permitted write
            return 422, {"error_code": 42205}
        for r in references or []:
            # every reference must resolve to a LIVE (subject, version)
            # in the referring schema's context, of the SAME schema type
            # (references_edge_cases: cross-type references are 42201)
            rs = self._qualify_ref(ctx, r.get("subject", ""))
            tgt = next((x for x in self._live(rs)
                        if x["version"] == r.get("version")), None)
            if tgt is None or tgt["type"] != stype:
                return 422, {"error_code": 42201,
                             "message": "Invalid schema reference"}
        fp = self._fp(text, stype, references)
        if fp is None:
            return 422, {"error_code": 42201}
        if references:
            fp = self._fold_refs_fp(fp, references)
        # structural ruleSet validation happens right after parsing,
        # before dedup/compat (registry.go:94-98)
        if rule_set is not None:
            from axonops_schema_registry_spark.registry.rules import (
                validate_ruleset_obj,
            )

            issues = validate_ruleset_obj(rule_set)
            if issues:
                return 422, {"error_code": 42201,
                             "message": "invalid ruleSet: " +
                                        "; ".join(issues)}
        req_metadata = metadata  # RAW request metadata, pre-inheritance
        live = self._live(subject)
        # confluent metadata semantics (registry.go:121-131 dedup requires
        # metadata equality; absent metadata/ruleSet INHERITS from the
        # latest version): the global id is content-addressed on the
        # schema text alone, but a metadata/ruleSet CHANGE creates a new
        # VERSION carrying the same id (schema_identity.feature)
        latest = max(live, key=lambda v: v["version"], default=None)
        if metadata is None and latest is not None:
            metadata = latest.get("metadata")
        if rule_set is None and latest is not None:
            rule_set = latest.get("rule_set")
        # 3-layer merge: final = merge(merge(config.default, specific),
        # config.override) — subject config replaces global wholesale
        cfg = self.cfg_extra.get(subject, self.glob_cfg_extra)
        metadata = self._merge_meta(
            self._merge_meta(cfg.get("defaultMetadata"), metadata),
            cfg.get("overrideMetadata"))
        rule_set = self._merge_meta(
            self._merge_meta(cfg.get("defaultRuleSet"), rule_set),
            cfg.get("overrideRuleSet"))
        for v in live:
            if v["fp"] == fp and v.get("metadata") == metadata \
                    and v.get("rule_set") == rule_set:
                return 200, {"id": v["id"], "version": v["version"]}
        level = self._resolved_level(subject)
        gate_pool = self._filter_compat_group(subject, metadata, live)
        ok, _ = self.compat_ok(subject, text, stype, level, gate_pool,
                               cand_refs=references)
        if not ok:
            return 409, {"error_code": 409,
                         "message": "Schema being registered is "
                                    "incompatible with an earlier schema"}
        # reserved-field validation runs after the compat gate, on the
        # RAW request metadata (registry.go:175-180)
        if self._cfg_chain(subject, "validateFields"):
            msgs = self._validate_reserved(subject, text, stype,
                                           req_metadata)
            if msgs:
                return 409, {"error_code": 409,
                             "message": "; ".join(msgs)}
        vers = self.subjects.setdefault(subject, [])
        version = max((v["version"] for v in vers), default=0) + 1
        ctx = self.ctx_of(subject)
        nxt = self.next_ids.get(ctx, 1)
        sid = self.ids.setdefault((ctx, fp), nxt)
        if sid == nxt:
            self.next_ids[ctx] = nxt + 1
        vers.append({"version": version, "text": text, "type": stype,
                     "fp": fp, "id": sid, "deleted": False,
                     "metadata": metadata, "rule_set": rule_set,
                     "references": references or []})
        return 200, {"id": sid, "version": version}

    def register_import(self, subject: str, text: str, stype: str,
                        sid: int, version: int | None,
                        references: list[dict] | None = None
                        ) -> tuple[int, Any]:
        """Explicit-ID import (import_batch semantics: requires IMPORT
        mode; same id must always carry the same fingerprint).
        References are stored but NOT resolved — imports may arrive out
        of order (import_mode_comprehensive.feature)."""
        if self.resolved_mode(subject) != "IMPORT":
            return 422, {"error_code": 42205}
        fp = self._fp(text, stype, references)
        if fp is None:
            return 422, {"error_code": 42201}
        if references:
            fp = self._fold_refs_fp(fp, references)
        ctx = self.ctx_of(subject)
        existing_fp = next((f for (c, f), i in self.ids.items()
                            if i == sid and c == ctx), None)
        if existing_fp is not None and existing_fp != fp:
            # importing a DIFFERENT schema under a taken id is the
            # operation-not-permitted error (mode_enforcement: 42205)
            return 422, {"error_code": 42205}
        vers = self.subjects.setdefault(subject, [])
        if version is None:
            version = max((v["version"] for v in vers), default=0) + 1
        for v in vers:
            if v["version"] == version and not v["deleted"]:
                # duplicate version in an import returns the EXISTING
                # version untouched (Confluent allows and ignores)
                return 200, {"id": v["id"], "version": version}
        self.ids[(ctx, fp)] = sid
        self.next_ids[ctx] = max(self.next_ids.get(ctx, 1), sid + 1)
        vers.append({"version": version, "text": text, "type": stype,
                     "fp": fp, "id": sid, "deleted": False,
                     "references": references or []})
        return 200, {"id": sid, "version": version}

    def _ref_texts(self, owner_subject: str,
                   references: list[dict] | None) -> dict[str, str]:
        """{ref_name: schema_text} for a stored version's references,
        resolved in the owner's context (CheckCompatibility resolves
        existing-version references before checking)."""
        out: dict[str, str] = {}
        ctx = self.ctx_of(owner_subject)
        for r in references or []:
            rs = self._qualify_ref(ctx, r.get("subject", ""))
            tgt = next((x for x in self.subjects.get(rs, [])
                        if x["version"] == r.get("version")), None)
            if tgt is not None:
                out[r.get("name", "")] = tgt["text"]
        return out

    def compat_ok(self, subject: str, cand: str, stype: str, level: str,
                  pool: list[dict],
                  cand_refs: list[dict] | None = None
                  ) -> tuple[bool, list[str]]:
        """Mode orchestration with per-version reference resolution —
        the sim twin of registry.CheckCompatibility."""
        from axonops_schema_registry_spark.registry.compat import (
            check_pair,
        )

        level = (level or "BACKWARD").upper()
        if level == "NONE" or not pool:
            return True, []
        targets = pool if level.endswith("_TRANSITIVE") \
            else [max(pool, key=lambda v: v["version"])]
        base = level.replace("_TRANSITIVE", "")
        c_refs = self._ref_texts(subject, cand_refs)
        msgs: list[str] = []
        for x in targets:
            x_refs = self._ref_texts(subject, x.get("references"))
            if base in ("BACKWARD", "FULL"):
                msgs += check_pair(cand, x["text"], stype,
                                   reader_refs=c_refs,
                                   writer_refs=x_refs)
            if base in ("FORWARD", "FULL"):
                msgs += check_pair(x["text"], cand, stype,
                                   reader_refs=x_refs,
                                   writer_refs=c_refs)
        return not msgs, msgs

    def _filter_compat_group(self, subject: str, metadata,
                             pool: list[dict]) -> list[dict]:
        """filterByCompatibilityGroup (registry.go): when the config
        names a compatibilityGroup property, the gate only sees prior
        versions in the CANDIDATE's group."""
        group_key = self._cfg_chain(subject, "compatibilityGroup")
        if not group_key:
            return pool

        def grp(md):
            return ((md or {}).get("properties") or {}).get(group_key)

        cand = grp(metadata)
        return [v for v in pool if grp(v.get("metadata")) == cand]

    def _resolved_level(self, subject: str) -> str:
        """4-tier chain (GetConfigFull, lv1): subject -> context tier
        (root /config for the default context) -> __GLOBAL context ->
        server default BACKWARD.  Root config does NOT leak into named
        contexts (contexts_global_config)."""
        if subject in self.levels:
            return self.levels[subject]
        ck = self._ctx_key(subject)
        if ck is None:
            if self.root_level is not None:
                return self.root_level
        elif ck in self.levels:
            return self.levels[ck]
        return self.levels.get(self._GLOBAL_KEY, "BACKWARD")

    # -- config / mode endpoints ------------------------------------------
    def _root_blocked(self) -> bool:
        return (self.root_mode or "READWRITE") in ("READONLY",
                                                   "READONLY_OVERRIDE")

    def set_global_config(self, level: str,
                          extra: dict | None = None) -> tuple[int, Any]:
        if self._root_blocked():
            return 422, {"error_code": 42205}
        level = (level or "").upper()
        if level not in LEVELS:
            return 422, {"error_code": 42203,
                         "message": "Invalid compatibility level"}
        bad = self._invalid_cfg_ruleset(extra)
        if bad:
            return bad
        self.root_level = level
        if extra is not None:
            self.glob_cfg_extra = {
                k: v for k, v in extra.items() if k != "compatibility"}
        # PUT /config echoes the full ConfigRequest (handlers.go:1093)
        return 200, self._cfg_body({"compatibility": level},
                                   self.glob_cfg_extra)

    def get_global_config(self, *,
                          default_to_global: bool = False
                          ) -> tuple[int, Any]:
        lvl = self.root_level
        if lvl is None and default_to_global:
            lvl = self.levels.get(self._GLOBAL_KEY)
        return 200, self._cfg_body(
            {"compatibilityLevel": lvl or "BACKWARD"},
            self.glob_cfg_extra)

    def delete_global_config(self) -> tuple[int, Any]:
        if self._root_blocked():
            return 422, {"error_code": 42205}
        old = self.root_level or "BACKWARD"
        self.root_level = None
        return 200, {"compatibilityLevel": old}

    def set_subject_config(self, subject: str, level: str,
                           extra: dict | None = None) -> tuple[int, Any]:
        if self._write_blocked(subject):
            return 422, {"error_code": 42205}
        level = (level or "").upper()
        if level not in LEVELS:
            return 422, {"error_code": 42203,
                         "message": "Invalid compatibility level"}
        bad = self._invalid_cfg_ruleset(extra)
        if bad:
            return bad
        self.levels[subject] = level
        if extra is not None:
            self.cfg_extra[subject] = {
                k: v for k, v in extra.items() if k != "compatibility"}
        return 200, self._cfg_body({"compatibility": level},
                                   self.cfg_extra.get(subject))

    def get_subject_config(self, subject: str, *,
                           default_to_global: bool = False
                           ) -> tuple[int, Any]:
        if subject in self.levels:
            return 200, self._cfg_body(
                {"compatibilityLevel": self.levels[subject]},
                self.cfg_extra.get(subject))
        if default_to_global:
            # walks the full 4-tier chain
            return 200, {"compatibilityLevel": self._resolved_level(subject)}
        return 404, {"error_code": 40408}

    def delete_subject_config(self, subject: str) -> tuple[int, Any]:
        if self._write_blocked(subject):
            return 422, {"error_code": 42205}
        if subject not in self.levels:
            # DELETE of a missing per-subject config is 40401, not the
            # GET-side 40408 (handlers.go DeleteConfig → ErrNotFound →
            # ErrorCodeSubjectNotFound)
            return 404, {"error_code": 40401,
                         "message": "Config not found for subject"}
        self.cfg_extra.pop(subject, None)
        return 200, {"compatibilityLevel": self.levels.pop(subject)}

    def _import_blocked(self, subject: str | None, force: bool) -> bool:
        """Switching to IMPORT requires force=true when live schemas
        exist and the current mode is not already IMPORT
        (registry.go:962-982)."""
        if force:
            return False
        current = (self.resolved_mode(subject) if subject
                   else (self.root_mode or "READWRITE"))
        if current == "IMPORT":
            return False
        if subject:
            return bool(self._live(subject))
        return any(self._live(s) for s in self.subjects)

    def set_global_mode(self, mode: str, *,
                        force: bool = False) -> tuple[int, Any]:
        # mode changes are ALWAYS allowed (otherwise READONLY is a trap)
        mode = (mode or "").upper()
        if mode not in MODES:
            return 422, {"error_code": 42204, "message": "Invalid mode"}
        if mode == "IMPORT" and self._import_blocked(None, force):
            return 422, {"error_code": 42205}
        self.root_mode = mode
        return 200, {"mode": mode}

    def get_global_mode(self) -> tuple[int, Any]:
        return 200, {"mode": self.root_mode or "READWRITE"}

    def set_subject_mode(self, subject: str, mode: str, *,
                         force: bool = False) -> tuple[int, Any]:
        mode = (mode or "").upper()
        if mode not in MODES:
            return 422, {"error_code": 42204, "message": "Invalid mode"}
        if mode == "IMPORT" and self._import_blocked(subject, force):
            return 422, {"error_code": 42205}
        self.subj_modes[subject] = mode
        return 200, {"mode": mode}

    def get_subject_mode(self, subject: str, *,
                         default_to_global: bool = False
                         ) -> tuple[int, Any]:
        if subject in self.subj_modes:
            return 200, {"mode": self.subj_modes[subject]}
        if default_to_global:
            return 200, {"mode": self.resolved_mode(subject)}
        return 404, {"error_code": 40409}

    def delete_global_mode(self) -> tuple[int, Any]:
        old = self.root_mode or "READWRITE"
        self.root_mode = None
        return 200, {"mode": old}

    def delete_subject_mode(self, subject: str) -> tuple[int, Any]:
        if subject not in self.subj_modes:
            # DELETE-side missing mode is 40401 (handlers.go:1986)
            return 404, {"error_code": 40401,
                         "message": "Mode not found for subject"}
        # DeleteMode returns the PREVIOUS mode (registry.go:1337-1352)
        return 200, {"mode": self.subj_modes.pop(subject)}

    # -- read path --------------------------------------------------------
    def get_version(self, subject: str, v, *,
                    deleted: bool = False) -> tuple[int, Any]:
        subject = self.resolve_alias(subject)
        pool = (self.subjects.get(subject, []) if deleted
                else self._live(subject))
        if not pool:
            return 404, {"error_code": 40401}
        if v in ("latest", -1):
            v = max(x["version"] for x in pool)
        if not isinstance(v, int) or v <= 0 or v > MAX_VERSION:
            return 422, {"error_code": 42202}
        if not any(x["version"] == v for x in pool):
            # distinguish "soft-deleted" (40406) from "never existed"
            # (40402) — error_handling_exhaustive
            if any(x["version"] == v
                   for x in self.subjects.get(subject, [])):
                return 404, {"error_code": 40406,
                             "message": f"Version {v} was soft deleted"}
        for x in pool:
            if x["version"] == v:
                out = {"subject": re.sub(r"^:\.[^:]*:", "", subject),
                       "version": v,
                       "id": x["id"], "schema": x["text"],
                       "schemaType": x["type"]}
                # confluent:version is stamped into metadata.properties
                # on every stored version (excluded from the dedup
                # identity — it varies per version by construction)
                md = self._merge_meta(
                    x.get("metadata"),
                    {"properties": {"confluent:version": str(v)}})
                out["metadata"] = md
                if x.get("rule_set") is not None:
                    out["ruleSet"] = x["rule_set"]
                if x.get("references"):
                    out["references"] = x["references"]
                return 200, out
        return 404, {"error_code": 40402}

    def list_versions(self, subject: str, *, deleted: bool = False,
                      deleted_only: bool = False) -> tuple[int, Any]:
        subject = self.resolve_alias(subject)
        if deleted_only:
            # deletedOnly takes precedence over deleted
            # (handlers.go:341-358): only tombstoned versions, [] when
            # none — but a wholly unknown subject is still a 404
            vers = self.subjects.get(subject)
            if not vers:
                return 404, {"error_code": 40401}
            return 200, sorted(x["version"] for x in vers if x["deleted"])
        pool = (self.subjects.get(subject, []) if deleted
                else self._live(subject))
        if not pool:
            return 404, {"error_code": 40401}
        return 200, sorted(x["version"] for x in pool)

    def list_subjects(self, *, deleted: bool = False,
                      ctx: str | None = None) -> tuple[int, Any]:
        """Listings are ALWAYS context-scoped: the root /subjects shows
        only the default context (contexts_isolation); /contexts/{ctx}/
        subjects shows that context with unqualified names."""
        scope = ctx if ctx is not None else "."
        names = (sorted(s for s, vs in self.subjects.items() if vs)
                 if deleted
                 else sorted(s for s in self.subjects if self._live(s)))
        names = [re.sub(r"^:\.[^:]*:", "", s) for s in names
                 if self.ctx_of(s) == scope]
        return 200, names

    def list_subjects_deleted_only(self, *,
                                   ctx: str | None = None
                                   ) -> tuple[int, Any]:
        """deletedOnly=true: subjects whose every remaining version is
        tombstoned (active-set diff, handlers.go:263-283)."""
        scope = ctx if ctx is not None else "."
        names = sorted(s for s, vs in self.subjects.items()
                       if vs and not self._live(s))
        return 200, [re.sub(r"^:\.[^:]*:", "", s) for s in names
                     if self.ctx_of(s) == scope]

    def lookup(self, subject: str, text: str, stype: str = "AVRO", *,
               deleted: bool = False,
               references: list[dict] | None = None) -> tuple[int, Any]:
        subject = self.resolve_alias(subject)
        pool = (self.subjects.get(subject, []) if deleted
                else self._live(subject))
        if not pool:
            return 404, {"error_code": 40401}
        fp = self._fp(text, stype, references)
        if fp is not None and references:
            fp = self._fold_refs_fp(fp, references)
        for x in pool:
            if x["fp"] == fp:
                return 200, {"subject": re.sub(r"^:\.[^:]*:", "", subject),
                             "version": x["version"],
                             "id": x["id"], "schema": x["text"],
                             "schemaType": x["type"] or "AVRO"}
        return 404, {"error_code": 40403,
                     "message": "Schema not found"}

    def schema_by_id(self, sid: int, ctx: str = ".", *,
                     subject: str | None = None,
                     fetch_max_id: bool = False) -> tuple[int, Any]:
        for subj, vs in sorted(self.subjects.items()):
            if self.ctx_of(subj) != ctx:
                continue
            for x in vs:
                if x["id"] == sid:
                    # schemaType is always present in the by-id response
                    # (schemaTypeForResponse, handlers.go:28-33, 240-246)
                    out = {"schema": x["text"],
                           "schemaType": x["type"] or "AVRO"}
                    if x.get("references"):
                        out["references"] = x["references"]
                    if subject:
                        # ?subject= enriches with that subject's
                        # per-version metadata/ruleSet (handlers.go:197)
                        hit = next((y for y in self.subjects.get(
                            subject, []) if y["id"] == sid), None)
                        if hit:
                            if hit.get("metadata") is not None:
                                out["metadata"] = hit["metadata"]
                            if hit.get("rule_set") is not None:
                                out["ruleSet"] = hit["rule_set"]
                    if fetch_max_id:
                        out["maxId"] = max(
                            (i for (c, _), i in self.ids.items()
                             if c == ctx), default=0)
                    return 200, out
        return 404, {"error_code": 40403, "message": "Schema not found"}

    def raw_schema(self, subject: str, v) -> tuple[int, Any]:
        """GET /subjects/{s}/versions/{v}/schema — bare schema text."""
        subject = self.resolve_alias(subject)
        status, body = self.get_version(subject, v)
        if status != 200:
            return status, body
        return 200, body["schema"]

    def subject_metadata(self, subject: str) -> tuple[int, Any]:
        """GET /subjects/{s}/metadata — bare metadata from the latest
        live version (handlers.go:2146-2162)."""
        subject = self.resolve_alias(subject)
        live = self._live(subject)
        if not live:
            return 404, {"error_code": 40401}
        latest = max(live, key=lambda x: x["version"])
        return 200, latest.get("metadata") or {}

    def count_subjects(self, ctx: str = ".") -> tuple[int, Any]:
        _, names = self.list_subjects(ctx=ctx)
        return 200, {"count": len(names)}

    def count_versions(self, subject: str) -> tuple[int, Any]:
        subject = self.resolve_alias(subject)
        status, body = self.list_versions(subject)
        if status != 200:
            return status, body
        return 200, {"subject": subject, "count": len(body)}

    @staticmethod
    def validate_subject_name(payload: dict) -> tuple[int, Any]:
        """POST /subjects/validate (analysis.go:546-599)."""
        subject = payload.get("subject") or ""
        strategy = payload.get("strategy") or "topic_name"
        if not subject:
            return 400, {"error_code": 42201,
                         "message": "Subject is required"}
        valid, issues, suggestion = True, [], ""
        ident = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
        if strategy == "topic_name":
            if not subject.endswith(("-key", "-value")):
                valid = False
                issues.append("TopicNameStrategy subjects must end with "
                              "'-key' or '-value'")
                suggestion = subject + "-value"
        elif strategy == "record_name":
            if any(not ident.fullmatch(p)
                   for p in subject.split(".")):
                valid = False
                issues.append(
                    "RecordNameStrategy subjects must be valid qualified "
                    "names (e.g., com.example.User)")
        elif strategy == "topic_record_name":
            if "-" not in subject:
                valid = False
                issues.append("TopicRecordNameStrategy subjects must "
                              "contain a topic and record name")
        return 200, {"subject": subject, "strategy": strategy,
                     "valid": valid, "issues": issues,
                     "suggestion": suggestion}

    def match_subjects(self, payload: dict) -> tuple[int, Any]:
        """POST /subjects/match (analysis.go:617-682): regex / glob /
        fuzzy (Levenshtein-ratio) matching over live subjects."""
        pattern = payload.get("pattern") or ""
        mode = payload.get("mode") or "regex"
        threshold = payload.get("threshold") or 0.6
        threshold = min(float(threshold), 1.0)
        if not pattern:
            return 400, {"error_code": 42201,
                         "message": "Pattern is required"}
        _, names = self.list_subjects()
        matched: list[str] = []
        if mode == "regex":
            try:
                rx = re.compile(pattern)
            except re.error as exc:
                return 400, {"error_code": 42201,
                             "message": f"Invalid regex: {exc}"}
            matched = [s for s in names if rx.search(s)]
        elif mode == "glob":
            from axonops_schema_registry_spark.operators.text import (
                glob_to_regex,
            )

            rx = re.compile(glob_to_regex(pattern.lower()))
            matched = [s for s in names if rx.fullmatch(s.lower())]
        elif mode == "fuzzy":
            matched = [s for s in names
                       if _fuzzy_score(pattern, s) >= threshold]
        return 200, {"pattern": pattern, "mode": mode,
                     "count": len(matched), "matches": matched}

    def versions_for_id(self, sid: int, ctx: str = ".", *,
                        deleted: bool = False,
                        subject: str | None = None) -> tuple[int, Any]:
        out = [{"subject": re.sub(r"^:\.[^:]*:", "", s),
                "version": x["version"]}
               for s in sorted(self.subjects)
               if self.ctx_of(s) == ctx
               and (subject is None or s == subject)
               for x in (self.subjects[s] if deleted else self._live(s))
               if x["id"] == sid]
        if not out:
            return 404, {"error_code": 40403,
                         "message": "Schema not found"}
        return 200, out

    def subjects_for_id(self, sid: int, ctx: str = ".", *,
                        deleted: bool = False,
                        subject: str | None = None) -> tuple[int, Any]:
        subs = sorted(re.sub(r"^:\.[^:]*:", "", s)
                      for s in self.subjects
                      if self.ctx_of(s) == ctx
                      and (subject is None or s == subject)
                      and any(x["id"] == sid for x in
                              (self.subjects[s] if deleted
                               else self._live(s))))
        if not subs:
            return 404, {"error_code": 40403,
                         "message": "Schema not found"}
        return 200, subs

    # -- DEK registry (Confluent CSFLE; registry_dek.go + dek.go) ---------
    _DEK_ALGOS = {"AES128_GCM", "AES256_GCM", "AES256_SIV"}

    def _tick(self) -> int:
        self._ts += 1
        return self._ts

    @staticmethod
    def _kek_body(k: dict) -> dict:
        out = {"name": k["name"], "kmsType": k["kmsType"],
               "kmsKeyId": k["kmsKeyId"], "shared": k["shared"],
               "ts": k["ts"]}
        if k.get("kmsProps"):
            out["kmsProps"] = k["kmsProps"]
        if k.get("doc"):
            out["doc"] = k["doc"]
        if k.get("deleted"):
            out["deleted"] = True
        return out

    @staticmethod
    def _dek_body(d: dict) -> dict:
        out = {"kekName": d["kekName"], "subject": d["subject"],
               "version": d["version"], "algorithm": d["algorithm"],
               "ts": d["ts"]}
        if d.get("encryptedKeyMaterial"):
            out["encryptedKeyMaterial"] = d["encryptedKeyMaterial"]
        if d.get("deleted"):
            out["deleted"] = True
        return out

    def kek_create(self, payload: dict) -> tuple[int, Any]:
        name = (payload.get("name") or "").strip()
        if not name:
            return 422, {"error_code": 42201,
                         "message": "KEK name is required"}
        if not (payload.get("kmsType") or "").strip():
            return 422, {"error_code": 42201,
                         "message": "kmsType is required"}
        if not (payload.get("kmsKeyId") or "").strip():
            return 422, {"error_code": 42201,
                         "message": "kmsKeyId is required"}
        if name in self.keks:
            return 409, {"error_code": 40970,
                         "message": "Key encryption key already exists: "
                                    + name}
        self.keks[name] = {
            "name": name, "kmsType": payload["kmsType"],
            "kmsKeyId": payload["kmsKeyId"],
            "kmsProps": payload.get("kmsProps"),
            "doc": payload.get("doc") or "",
            "shared": bool(payload.get("shared")),
            "deleted": False, "ts": self._tick()}
        return 200, self._kek_body(self.keks[name])

    def kek_get(self, name: str, *, deleted: bool = False):
        k = self.keks.get(name)
        if k is None or (k["deleted"] and not deleted):
            return 404, {"error_code": 40470,
                         "message": "Key encryption key not found: "
                                    + name}
        return 200, self._kek_body(k)

    def kek_update(self, name: str, payload: dict) -> tuple[int, Any]:
        k = self.keks.get(name)
        if k is None or k["deleted"]:
            return 404, {"error_code": 40470,
                         "message": "Key encryption key not found: "
                                    + name}
        if payload.get("kmsProps") is not None:
            k["kmsProps"] = payload["kmsProps"]
        if payload.get("doc"):
            k["doc"] = payload["doc"]
        if payload.get("shared") is not None:
            k["shared"] = bool(payload["shared"])
        k["ts"] = self._tick()
        return 200, self._kek_body(k)

    def kek_delete(self, name: str, *, permanent: bool = False):
        k = self.keks.get(name)
        if k is None:
            return 404, {"error_code": 40470,
                         "message": "Key encryption key not found: "
                                    + name}
        if permanent:
            # permanent KEK delete cascades to every DEK under it
            del self.keks[name]
            self.deks.pop(name, None)
        else:
            k["deleted"] = True
            k["ts"] = self._tick()
        return 204, None

    def kek_undelete(self, name: str) -> tuple[int, Any]:
        k = self.keks.get(name)
        if k is None or not k["deleted"]:
            return 404, {"error_code": 40470,
                         "message": "Key encryption key not found: "
                                    + name}
        k["deleted"] = False
        k["ts"] = self._tick()
        return 204, None

    def kek_list(self, *, deleted: bool = False) -> tuple[int, Any]:
        return 200, sorted(n for n, k in self.keks.items()
                           if deleted or not k["deleted"])

    def dek_create(self, kek_name: str, payload: dict) -> tuple[int, Any]:
        if kek_name not in self.keks:
            return 404, {"error_code": 40470,
                         "message": "Key encryption key not found: "
                                    + kek_name}
        subject = (payload.get("subject") or "").strip()
        if not subject:
            return 422, {"error_code": 42201,
                         "message": "subject is required"}
        algo = payload.get("algorithm") or "AES256_GCM"
        if algo not in self._DEK_ALGOS:
            return 422, {"error_code": 42201,
                         "message": f"invalid algorithm: {algo}"}
        vmap = self.deks.setdefault(kek_name, {}).setdefault(subject, {})
        version = payload.get("version") or 0
        if version <= 0:
            version = max(vmap, default=0) + 1
        if version in vmap:
            return 409, {"error_code": 40971,
                         "message": "Data encryption key already exists"}
        material = payload.get("encryptedKeyMaterial") or ""
        key_material = ""
        if not material and self.keks[kek_name].get("shared") \
                and self.keks[kek_name].get("kmsType") in (
                "hcvault", "openbao"):
            # server-side generation needs a SHARED KEK (the server may
            # only call the KMS when the KEK is marked shared)
            # KMS-backed envelope generation (vault/provider.go:143-160:
            # random material generated locally, wrapped via Transit).
            # (shared gate: registry_dek.go CreateDEK)
            # No live Vault in the sandbox — the stand-in derives
            # deterministic material of the algorithm's key size and a
            # transit-shaped wrapped form; the BDD assertions check
            # presence/shape, the reference checks the same
            import base64
            import hashlib
            size = 16 if algo == "AES128_GCM" else 32
            raw = hashlib.sha256(
                f"{kek_name}/{subject}/{version}/{algo}".encode()
            ).digest()[:size]
            key_material = base64.b64encode(raw).decode()
            material = base64.b64encode(b"vault:v1:" + raw).decode()
        vmap[version] = {
            "kekName": kek_name, "subject": subject, "version": version,
            "algorithm": algo,
            "encryptedKeyMaterial": material,
            "keyMaterial": key_material,
            "deleted": False, "ts": self._tick()}
        # the CREATE response carries the plaintext material once;
        # every read strips it (dekToResponse on the read path)
        body = self._dek_body(vmap[version])
        if key_material:
            body["keyMaterial"] = key_material
        return 200, body

    def _dek_find(self, kek_name: str, subject: str, version: int,
                  algorithm: str, deleted: bool):
        vmap = self.deks.get(kek_name, {}).get(subject)
        if not vmap:
            return None
        if version <= 0:
            cands = [v for v, d in vmap.items()
                     if (deleted or not d["deleted"])
                     and (not algorithm or d["algorithm"] == algorithm)]
            if not cands:
                return None
            version = max(cands)
        d = vmap.get(version)
        if d is None or (algorithm and d["algorithm"] != algorithm) \
                or (d["deleted"] and not deleted):
            return None
        return d

    def dek_get(self, kek_name: str, subject: str, version: int,
                algorithm: str, *, deleted: bool = False):
        if kek_name not in self.keks:
            return 404, {"error_code": 40470,
                         "message": "Key encryption key not found: "
                                    + kek_name}
        d = self._dek_find(kek_name, subject, version, algorithm,
                           deleted)
        if d is None:
            return 404, {"error_code": 40471,
                         "message": "Data encryption key not found"}
        return 200, self._dek_body(d)

    def dek_list(self, kek_name: str, *, deleted: bool = False):
        if kek_name not in self.keks:
            return 404, {"error_code": 40470,
                         "message": "Key encryption key not found: "
                                    + kek_name}
        subs = sorted(
            s for s, vmap in self.deks.get(kek_name, {}).items()
            if deleted or any(not d["deleted"] for d in vmap.values()))
        return 200, subs

    def dek_versions(self, kek_name: str, subject: str, algorithm: str,
                     *, deleted: bool = False):
        if kek_name not in self.keks:
            return 404, {"error_code": 40470,
                         "message": "Key encryption key not found: "
                                    + kek_name}
        vmap = self.deks.get(kek_name, {}).get(subject, {})
        return 200, sorted(
            v for v, d in vmap.items()
            if (deleted or not d["deleted"])
            and (not algorithm or d["algorithm"] == algorithm))

    def dek_delete(self, kek_name: str, subject: str, version: int,
                   algorithm: str, *, permanent: bool = False):
        vmap = self.deks.get(kek_name, {}).get(subject)
        if not vmap:
            return 404, {"error_code": 40471,
                         "message": "Data encryption key not found"}
        if version == -1:
            hits = [v for v, d in vmap.items()
                    if not algorithm or d["algorithm"] == algorithm]
            if not hits:
                return 404, {"error_code": 40471,
                             "message": "Data encryption key not found"}
            for v in hits:
                if permanent:
                    del vmap[v]
                else:
                    vmap[v]["deleted"] = True
                    vmap[v]["ts"] = self._tick()
        else:
            d = vmap.get(version)
            if d is None or (algorithm and d["algorithm"] != algorithm):
                return 404, {"error_code": 40471,
                             "message": "Data encryption key not found"}
            if permanent:
                del vmap[version]
            else:
                d["deleted"] = True
                d["ts"] = self._tick()
        if permanent and not vmap:
            self.deks[kek_name].pop(subject, None)
        return 204, None

    def dek_rewrap(self, kek_name: str, subject: str, version: int,
                   algorithm: str | None = None) -> tuple[int, Any]:
        """Rewrap a DEK under the KEK's current KMS key
        (registry_dek.go RewrapDEK): unwrap + wrap again yields new
        encrypted material; the deterministic stand-in bumps the
        transit version prefix."""
        import base64
        import hashlib
        if kek_name not in self.keks:
            return 404, {"error_code": 40470,
                         "message": "Key encryption key not found: "
                                    + kek_name}
        d = self._dek_find(kek_name, subject, version, algorithm or "",
                           False)
        if d is None:
            return 404, {"error_code": 40471,
                         "message": "Data encryption key not found"}
        algo = d["algorithm"]
        size = 16 if algo == "AES128_GCM" else 32
        raw = hashlib.sha256(
            f"{kek_name}/{subject}/{d['version']}/{algo}".encode()
        ).digest()[:size]
        d["encryptedKeyMaterial"] = base64.b64encode(
            b"vault:v2:" + raw).decode()
        d["ts"] = self._tick()
        return 200, self._dek_body(d)

    def dek_undelete(self, kek_name: str, subject: str, version: int,
                     algorithm: str) -> tuple[int, Any]:
        vmap = self.deks.get(kek_name, {}).get(subject)
        if not vmap:
            return 404, {"error_code": 40471,
                         "message": "Data encryption key not found"}
        if version == -1:
            hits = [d for d in vmap.values()
                    if (not algorithm or d["algorithm"] == algorithm)
                    and d["deleted"]]
            if not hits:
                return 404, {"error_code": 40471,
                             "message": "Data encryption key not found"}
            for d in hits:
                d["deleted"] = False
                d["ts"] = self._tick()
        else:
            d = vmap.get(version)
            if d is None or (algorithm and d["algorithm"] != algorithm) \
                    or not d["deleted"]:
                return 404, {"error_code": 40471,
                             "message": "Data encryption key not found"}
            d["deleted"] = False
            d["ts"] = self._tick()
        return 204, None

    # -- exporters (registry_exporter.go; state PAUSED/RUNNING) -----------
    _EXP_CTX_TYPES = {"AUTO", "CUSTOM", "NONE"}

    @staticmethod
    def _exporter_body(e: dict) -> dict:
        out = {"name": e["name"]}
        for k in ("contextType", "context", "subjects",
                  "subjectRenameFormat", "config"):
            if e.get(k):
                out[k] = e[k]
        return out

    def exporter_create(self, payload: dict) -> tuple[int, Any]:
        name = (payload.get("name") or "").strip()
        if not name:
            return 422, {"error_code": 42201,
                         "message": "Exporter name is required"}
        ctype = (payload.get("contextType") or "AUTO").upper()
        if ctype not in self._EXP_CTX_TYPES:
            return 422, {"error_code": 42201,
                         "message": f"invalid context type: {ctype} "
                                    "(must be AUTO, CUSTOM, or NONE)"}
        if name in self.exporters:
            return 409, {"error_code": 40950,
                         "message": "Exporter already exists: " + name}
        self.exporters[name] = {
            "name": name, "contextType": ctype,
            "context": payload.get("context") or "",
            "subjects": payload.get("subjects") or [],
            "subjectRenameFormat":
                payload.get("subjectRenameFormat") or "",
            "config": payload.get("config") or {}}
        # new exporters start PAUSED at offset 0
        self.exporter_status[name] = {"name": name, "state": "PAUSED",
                                      "offset": 0, "trace": "",
                                      "ts": self._tick()}
        return 200, {"name": name}

    def exporter_update(self, name: str, payload: dict,
                        *, config_only: bool = False) -> tuple[int, Any]:
        e = self.exporters.get(name)
        if e is None:
            return 404, {"error_code": 40450,
                         "message": "Exporter not found: " + name}
        if config_only:
            e["config"] = payload.get("config") or {}
            return 200, {"name": name}
        ctype = (payload.get("contextType") or "").upper()
        if ctype and ctype not in self._EXP_CTX_TYPES:
            return 422, {"error_code": 42201,
                         "message": f"invalid context type: {ctype} "
                                    "(must be AUTO, CUSTOM, or NONE)"}
        # update REPLACES the record (memory/store.go:1520-1535)
        self.exporters[name] = {
            "name": name, "contextType": ctype,
            "context": payload.get("context") or "",
            "subjects": payload.get("subjects") or [],
            "subjectRenameFormat":
                payload.get("subjectRenameFormat") or "",
            "config": payload.get("config") or {}}
        return 200, {"name": name}

    def exporter_state(self, name: str, *, state: str | None = None,
                       reset: bool = False) -> tuple[int, Any]:
        if name not in self.exporters:
            return 404, {"error_code": 40450,
                         "message": "Exporter not found: " + name}
        st = self.exporter_status.setdefault(
            name, {"name": name, "state": "PAUSED", "offset": 0,
                   "trace": "", "ts": 0})
        if state:
            st["state"] = state
        if reset:
            st["offset"] = 0
            st["trace"] = ""
        st["ts"] = self._tick()
        return 200, {"name": name}

    def import_schemas(self, payload: dict) -> tuple[int, Any]:
        """POST /import/schemas — bulk explicit-ID import
        (registry.go:1184-1309): requires IMPORT mode, per-row
        validation, partial results, 422 only on total failure."""
        if (self.root_mode or "READWRITE") != "IMPORT":
            return 422, {"error_code": 42205,
                         "message": "Import is not permitted. The "
                                    "registry must be in IMPORT mode "
                                    "to import schemas."}
        schemas = payload.get("schemas") or []
        if not schemas:
            return 400, {"error_code": 42201,
                         "message": "No schemas provided"}
        results, imported, errors = [], 0, 0
        for s in schemas:
            res = {"id": s.get("id") or 0,
                   "subject": s.get("subject") or "",
                   "version": s.get("version") or 0, "success": False}

            def fail(msg):
                nonlocal errors
                res["error"] = msg
                errors += 1
                results.append(res)

            sid, subj = s.get("id") or 0, s.get("subject") or ""
            ver, text = s.get("version") or 0, s.get("schema") or ""
            if sid <= 0:
                fail("schema ID must be positive")
                continue
            if not subj:
                fail("subject is required")
                continue
            if ver <= 0:
                fail("version must be positive")
                continue
            if not text:
                fail("schema is required")
                continue
            stype = (s.get("schemaType") or "AVRO").upper()
            refs = s.get("references")
            fp = self._fp(text, stype, refs)
            if fp is None:
                fail("invalid schema")
                continue
            if refs:
                fp = self._fold_refs_fp(fp, refs)
            ctx = self.ctx_of(subj)
            existing_fp = next((f for (c, f), i in self.ids.items()
                                if i == sid and c == ctx), None)
            if existing_fp is not None and existing_fp != fp:
                fail("schema ID already exists")
                continue
            vers = self.subjects.setdefault(subj, [])
            if any(v["version"] == ver for v in vers):
                fail("subject/version already exists")
                continue
            self.ids[(ctx, fp)] = sid
            self.next_ids[ctx] = max(self.next_ids.get(ctx, 1), sid + 1)
            vers.append({"version": ver, "text": text, "type": stype,
                         "fp": fp, "id": sid, "deleted": False,
                         "references": refs or []})
            res["success"] = True
            imported += 1
            results.append(res)
        status = 422 if imported == 0 and errors > 0 else 200
        return status, {"imported": imported, "errors": errors,
                        "results": results}

    # -- delete path ------------------------------------------------------
    def delete_version(self, subject: str, v, *,
                       permanent: bool = False) -> tuple[int, Any]:
        subject = self.resolve_alias(subject)
        if self._write_blocked(subject):
            return 422, {"error_code": 42205}
        if isinstance(v, int) and (v == 0 or v < -1 or v > MAX_VERSION):
            return 422, {"error_code": 42202}
        vers = self.subjects.get(subject)
        if not vers:
            return 404, {"error_code": 40401}
        if not permanent:
            live = self._live(subject)
            resolved = v
            if resolved in ("latest", -1) and live:
                resolved = max(x["version"] for x in live)
            if isinstance(resolved, int) and self._referenced_by(
                    subject, {resolved}):
                return 422, {"error_code": 42206,
                             "message": "has active references"}
            if v in ("latest", -1):
                if not live:
                    # all versions tombstoned: GetSchemaBySubjectVersion
                    # sees no live rows → SUBJECT not found (the del2
                    # 40401 branch)
                    return 404, {"error_code": 40401}
                v = max(x["version"] for x in live)
            for x in live:
                if x["version"] == v:
                    x["deleted"] = True
                    return 200, v
            return 404, {"error_code": 40402}
        # permanent: resolves against soft-deleted versions
        tombs = [x for x in vers if x["deleted"]]
        if v in ("latest", -1):
            if not tombs:
                return 404, {"error_code": 40402}
            v = max(x["version"] for x in tombs)
        for x in vers:
            if x["version"] == v:
                if not x["deleted"]:
                    # version-level not-soft-deleted is 40407
                    # (ErrorCodeVersionNotSoftDeleted, types.go:176);
                    # 40405 is the subject-level code
                    return 404, {"error_code": 40407}
                vers.remove(x)
                return 200, v
        return 404, {"error_code": 40402}

    def delete_subject(self, subject: str, *,
                       permanent: bool = False) -> tuple[int, Any]:
        subject = self.resolve_alias(subject)
        if self._write_blocked(subject):
            return 422, {"error_code": 42205}
        vers = self.subjects.get(subject)
        if not vers:
            return 404, {"error_code": 40401}
        live = self._live(subject)
        if self._referenced_by(subject,
                               {x["version"] for x in live},
                               exclude_subject=subject):
            return 422, {"error_code": 42206,
                         "message": "has active references"}
        if not permanent:
            if not live:
                # double soft delete → 40404 (confluent_conformance)
                return 404, {"error_code": 40404}
            out = sorted(x["version"] for x in live)
            for x in live:
                x["deleted"] = True
            return 200, out
        if live:
            # hard delete requires prior soft delete
            return 404, {"error_code": 40405}
        out = sorted(x["version"] for x in vers)
        del self.subjects[subject]
        # permanent delete removes subject config/mode; SOFT delete
        # preserves them (deletion_exhaustive 'config preserved on
        # soft-delete, removed on permanent delete')
        self.levels.pop(subject, None)
        self.subj_modes.pop(subject, None)
        self.cfg_extra.pop(subject, None)
        return 200, out


# ---------------------------------------------------------------------------
# Gherkin replay
# ---------------------------------------------------------------------------

_RE_TYPED = r'(?:"(\w+)" )?'

STEPS: list[tuple[re.Pattern, str]] = [
    (re.compile(r'the global compatibility level is "(\w+)"'), "glob"),
    (re.compile(r'^I set the global config to "(\w+)"'), "set_glob_cfg"),
    (re.compile(r'^I set the global compatibility level to "(\w+)"'),
     "set_glob_cfg"),
    (re.compile(r'subject "([^"]+)" has compatibility level "(\w+)"'),
     "subj_level"),
    (re.compile(r'I set the config for subject "([^"]+)" to "(\w+)"'),
     "set_subj_cfg"),
    (re.compile(r'I get the global config'), "get_glob_cfg"),
    (re.compile(r'I get the config for subject "([^"]+)"'), "get_subj_cfg"),
    (re.compile(r'I delete the global config'), "del_glob_cfg"),
    (re.compile(r'I delete the config for subject "([^"]+)"'),
     "del_subj_cfg"),
    (re.compile(r'(?:^I set the global mode to|^the global mode is) '
                r'"(\w+)"'), "set_glob_mode"),
    (re.compile(r'I get the global mode'), "get_glob_mode"),
    (re.compile(r'I set the mode for subject "([^"]+)" to "(\w+)"'),
     "set_subj_mode"),
    (re.compile(r'I get the mode for subject "([^"]+)"'), "get_subj_mode"),
    (re.compile(r'I delete the mode for subject "([^"]+)"'),
     "del_subj_mode"),
    (re.compile(r'I get versions for schema ID (\S+)'), "versions_for_id"),
    (re.compile(r'I get the subjects for the stored schema ID'),
     "subjects_for_stored_id"),
    (re.compile(r'subject "([^"]+)" has mode "(\w+)"'), "set_subj_mode"),
    (re.compile(r'the response field "([^"]+)" should not equal stored '
                r'"([^"]+)"'), "assert_field_not_stored"),
    (re.compile(r'the response should be valid JSON'), "assert_valid_json"),
    (re.compile(r'the stored "([^"]+)" should be greater than (\d+)'),
     "assert_stored_gt"),
    (re.compile(r'I check compatibility of (?:"(\w+)" )?schema against '
                r'all versions of subject "([^"]+)":'), "compat_check_all"),
    (re.compile(r'I check compatibility of (?:"(\w+)" )?schema with '
                r'reference "([^"]+)" from subject "([^"]+)" version '
                r'(\d+) against subject "([^"]+)":'), "compat_check_ref"),
    (re.compile(r'I check compatibility of (?:"(\w+)" )?schema against '
                r'subject "([^"]+)" version (\d+):'), "compat_check_ver"),
    (re.compile(r'I check compatibility of (?:"(\w+)" )?schema against '
                r'subject "([^"]+)":'), "compat_check"),
    (re.compile(r'the compatibility check should be (\w+)'),
     "assert_compat"),
    (re.compile(r'I (PUT|POST) "([^"]+)" with body:'), "http_body"),
    (re.compile(r'I (PUT|POST) "([^"]+)" with empty body'), "http_nobody"),
    (re.compile(r'I (PUT|POST) "([^"]+)" with raw body "([^"]*)"'),
     "http_rawbody"),
    (re.compile(r'the response field "([^"]+)" should not be empty'),
     "assert_field_nonempty"),
    (re.compile(r'I (PUT|POST) "([^"]+)"$'), "http_nobody"),
    (re.compile(r'the response field "([^"]+)" should be empty or '
                r'absent'), "assert_field_empty"),
    (re.compile(rf'subject "([^"]+)" has {_RE_TYPED}schema:'), "seed"),
    (re.compile(rf'I register a {_RE_TYPED}schema under subject "([^"]+)":$'),
     "register"),
    (re.compile(rf'I register a {_RE_TYPED}schema under subject "([^"]+)" '
                r'with references:'), "register_refs"),
    (re.compile(r'I get the referenced by for subject "([^"]+)" '
                r'version (\d+)'), "referenced_by"),
    (re.compile(r'I get the stored schema by ID'), "stored_schema_by_id"),
    (re.compile(r'the response array should contain stored integer '
                r'"([^"]+)"'), "assert_contains_stored_int"),
    (re.compile(r'the response array should contain integer (\d+)'),
     "assert_contains_int"),
    (re.compile(r'I delete version (\d+) of subject "([^"]+)"'), "del_ver"),
    (re.compile(r'I permanently delete version (\d+) of subject "([^"]+)"'),
     "hdel_ver"),
    (re.compile(r'I delete subject "([^"]+)"'), "del_subj"),
    (re.compile(r'I permanently delete subject "([^"]+)"'), "hdel_subj"),
    (re.compile(r'I get the latest version of subject "([^"]+)"'),
     "get_latest"),
    (re.compile(r'I get version (\d+) of subject "([^"]+)"'), "get_ver"),
    (re.compile(r'I list versions of subject "([^"]+)"'), "list_vers"),
    (re.compile(r'I list all subjects'), "list_subj"),
    (re.compile(r'I list subjects with deleted'), "list_subj_del"),
    (re.compile(rf'I lookup schema in subject "([^"]+)" with deleted:'),
     "lookup_del"),
    (re.compile(rf'I lookup schema in subject "([^"]+)":'), "lookup"),
    (re.compile(r'I get schema by ID (\S+)'), "schema_by_id"),
    (re.compile(r'I get the subjects for schema ID (\S+)'), "subjects_for_id"),
    (re.compile(r'I (GET|DELETE|PATCH|HEAD|OPTIONS) "([^"]+)"'),
     "http"),
    (re.compile(r'the response header "Content-Type" should contain '
                r'"([^"]+)"'), "assert_content_type"),
    (re.compile(r'the response status should be (\d+)'), "assert_status"),
    (re.compile(r'the response should have error code (\d+)'), "assert_err"),
    (re.compile(r'the response should be an array of length (\d+)'),
     "assert_len"),
    (re.compile(r'the response array should contain "([^"]+)"'),
     "assert_contains_item"),
    (re.compile(r'the response array should not contain "([^"]+)"'),
     "assert_not_contains_item"),
    (re.compile(r'the response should contain "([^"]+)"'),
     "assert_contains"),
    (re.compile(r'the response body should not contain "([^"]+)"'),
     "assert_not_contains"),
    (re.compile(r'the response field "([^"]+)" should equal stored "([^"]+)"'),
     "assert_field_stored"),
    (re.compile(r'the response field "([^"]+)" should be (\d+)$'),
     "assert_field"),
    (re.compile(r'the response field "([^"]+)" should be (true|false)$'),
     "assert_field_bool"),
    (re.compile(r'the response field "([^"]+)" should be "([^"]+)"'),
     "assert_field_str"),
    (re.compile(r'the response field "([^"]+)" should be an array'),
     "assert_field_array"),
    (re.compile(r'the response should have field "([^"]+)"'),
     "assert_has_field"),
    (re.compile(r'the response should not have field "([^"]+)"'),
     "assert_no_field"),
    (re.compile(r'the response body should contain "([^"]+)"'),
     "assert_contains"),
    (re.compile(r'I store the response field "([^"]+)" as "([^"]+)"'),
     "store_field"),
    # audit assertions (mcp_steps.go:774-840 table semantics; replica
    # events derived by bdd_audit.py)
    (re.compile(r'the audit log should contain an event:'),
     "audit_table"),
    (re.compile(r'the audit log should not contain event "([^"]+)"'),
     "audit_not_event"),
    (re.compile(r'the audit log should contain event "([^"]+)" with '
                r'subject "([^"]+)"'), "audit_event_subject"),
    (re.compile(r'the audit log should contain event "([^"]+)" with '
                r'method "([^"]+)"'), "audit_event_method"),
    (re.compile(r'the audit log should contain event "([^"]+)" with '
                r'path containing "([^"]+)"'), "audit_event_path"),
    (re.compile(r'the audit log should contain event "([^"]+)"'),
     "audit_event"),
    (re.compile(r'the audit log should contain "([^"]+)"'),
     "audit_contains_str"),
    (re.compile(rf'I import a {_RE_TYPED}schema with ID (\d+) under '
                r'subject "([^"]+)" version (\d+):'), "import_one"),
    (re.compile(r'I import schemas:'), "import_many"),
    (re.compile(r'the import should have (\d+) imported and (\d+) '
                r'errors?'), "assert_import"),
    (re.compile(r'the schema registry is running'), "running"),
    # operational_memory.feature: process lifecycle of the in-memory
    # backend (restart wipes state, pause preserves it)
    (re.compile(r'a running schema registry with memory backend'),
     "running"),
    # operational_{postgres,mysql,cassandra}: the PERSISTENT-backend
    # contract — registry restarts keep data, a dead database makes the
    # registry unhealthy without losing state (the semantics our
    # parquet/iceberg-backed engine shares: state outlives compute)
    (re.compile(r'a running schema registry with (?:postgres|mysql|'
                r'cassandra) backend'), "persistent_backend"),
    (re.compile(r'I restart the database container'), "mem_unpause"),
    (re.compile(r'I wait (\d+) seconds'), "noop"),
    (re.compile(r'I have registered (\d+) schemas across multiple '
                r'subjects'), "mem_seed_n"),
    (re.compile(r'I have registered schemas under subjects "([^"]+)" '
                r'and "([^"]+)"'), "mem_seed_two"),
    (re.compile(r'I restart the schema registry'), "mem_restart"),
    (re.compile(r'I stop the schema registry'), "mem_stop"),
    (re.compile(r'I start the schema registry'), "mem_start"),
    (re.compile(r'I kill the database container'), "mem_kill"),
    (re.compile(r'I pause the database'), "mem_pause"),
    (re.compile(r'I unpause the database'), "mem_unpause"),
    (re.compile(r'I wait for the registry to become healthy'),
     "mem_wait_up"),
    (re.compile(r'I wait for the registry to become unhealthy'),
     "mem_wait_down"),
    (re.compile(r'I authenticate as "([^"]+)" with password "([^"]*)"'),
     "auth_basic"),
    (re.compile(r'I authenticate with stored API key "([^"]+)"'),
     "auth_stored_key"),
    (re.compile(r'I authenticate with API key "([^"]+)"'), "auth_key"),
    (re.compile(r'I clear authentication'), "auth_clear"),
    (re.compile(r'I generate an expired JWT token with claims:'),
     "jwt_bad"),
    (re.compile(r'I generate a JWT token signed with wrong key with '
                r'claims:'), "jwt_bad"),
    (re.compile(r'I generate a JWT token with claims:'), "jwt_ok"),
    (re.compile(r'I authenticate with bearer token "([^"]*)"'),
     "bearer_bad"),
    (re.compile(r'I obtain an OIDC token for "([^"]+)" with password '
                r'"([^"]*)"'), "oidc"),
    (re.compile(r'I connect with mTLS certificate "([^"]+)"'),
     "mtls_cert"),
    (re.compile(r'I connect without a client certificate'),
     "mtls_none"),
    (re.compile(r'I attempt a GET request to "([^"]+)"'),
     "mtls_attempt"),
    (re.compile(r'the connection should be refused'),
     "assert_refused"),
    (re.compile(r'I get the metrics'), "get_metrics"),
    (re.compile(r'the response should contain Prometheus metric '
                r'"([^"]+)"'), "assert_prom_metric"),
    # Prometheus scrape assertions (metrics_steps.go:17-158)
    (re.compile(r'the Prometheus metric "([^"]+)" with labels '
                r'"((?:[^"\\]|\\.)*)" should exist'), "prom_labels"),
    (re.compile(r'the Prometheus metric "([^"]+)" should not exist'),
     "prom_not_exists"),
    (re.compile(r'the Prometheus metric "([^"]+)" should exist'),
     "prom_exists"),
    (re.compile(r'the Prometheus metric "([^"]+)" should have value '
                r'>= (\d+)'), "prom_value_ge"),
    (re.compile(r'the Prometheus metric "([^"]+)" should have value '
                r'(\d+)'), "prom_value_eq"),
    (re.compile(r'the Prometheus metric "([^"]+)" should have '
                r'increased from "([^"]+)"'), "prom_increased"),
    (re.compile(r'I store the current value of metric "([^"]+)" as '
                r'"([^"]+)"'), "prom_store"),
    (re.compile(r'I wait for metrics refresh'), "noop"),
    (re.compile(r'the webhook receiver should have received an event '
                r'with event_type "([^"]+)"'), "wh_event"),
    (re.compile(r'the webhook receiver should have received an event '
                r'matching:'), "wh_matching"),
    (re.compile(r'the webhook receiver should have at least (\d+) '
                r'events'), "wh_at_least"),
    (re.compile(r'the syslog TLS receiver should have received a '
                r'message containing "([^"]+)"'), "syslog_contains"),
    (re.compile(r'I create a user with username "([^"]+)" password '
                r'"([^"]+)" role "([^"]+)"(?: email "([^"]+)")?'),
     "mk_user"),
    (re.compile(r'I create an API key with name "([^"]+)" role '
                r'"([^"]+)" expires_in (\d+)'), "mk_key"),
    (re.compile(r'I list all users'), "list_users"),
    (re.compile(r'I list all API keys'), "list_keys"),
    (re.compile(r'I list roles'), "list_roles"),
    (re.compile(r'I get user by stored ID "([^"]+)"'), "get_user_sid"),
    (re.compile(r'I get user by ID "(\d+)"'), "get_user_id"),
    (re.compile(r'I update user "(\d+)" with:'), "upd_user_id"),
    (re.compile(r'I send (\d+) rapid requests to "([^"]+)"'),
     "rapid_requests"),
    (re.compile(r'at least one response should have status (\d+)'),
     "assert_any_status"),
    (re.compile(r'the response roles array should have length (\d+)'),
     "assert_roles_len"),
    (re.compile(r'I update user with stored ID "([^"]+)" with:'),
     "upd_user_sid"),
    (re.compile(r'I delete user with stored ID "([^"]+)"'),
     "del_user_sid"),
    (re.compile(r'I get API key by stored ID "([^"]+)"'),
     "get_key_sid"),
    (re.compile(r'I update API key with stored ID "([^"]+)" with:'),
     "upd_key_sid"),
    (re.compile(r'I delete API key with stored ID "([^"]+)"'),
     "del_key_sid"),
    (re.compile(r'I revoke API key with stored ID "([^"]+)"'),
     "revoke_key_sid"),
    (re.compile(r'I rotate API key with stored ID "([^"]+)" '
                r'expires_in (\d+)'), "rotate_key_sid"),
    (re.compile(r'the response users array should have length (\d+)'),
     "assert_users_len"),
    (re.compile(r'the response apikeys array should have length '
                r'(\d+)'), "assert_keys_len"),
    (re.compile(r'the response field "([^"]+)" should not be empty'),
     "assert_field_nonempty2"),
    (re.compile(r'I get the cluster ID'), "cluster_id"),
    (re.compile(r'I get the server version'), "server_version"),
    (re.compile(r'I get the contexts'), "get_contexts"),
    (re.compile(r'the response should not contain "((?:[^"\\]|\\.)*)"'),
     "assert_not_contains"),
    (re.compile(r'no subjects exist'), "ignore"),
    (re.compile(r'I get the schema types'), "schema_types"),
    (re.compile(r'I get the raw schema by ID (\d+)'), "raw_by_id"),
    (re.compile(r'I get the raw schema for subject "([^"]+)" '
                r'version (\d+)'), "raw_by_ver"),
    (re.compile(rf'I lookup a {_RE_TYPED}schema in subject "([^"]+)":'),
     "lookup_typed"),
    (re.compile(r'the response should be an integer with value (\d+)'),
     "assert_int"),
    (re.compile(rf'subject "([^"]+)" has {_RE_TYPED}schema with '
                r'reference "([^"]+)" from subject "([^"]+)" '
                r'version (\d+):'), "seed_one_ref"),
    (re.compile(rf'subject "([^"]+)" has {_RE_TYPED}schema with '
                r'references:'), "seed_refs"),
    (re.compile(r'I import a schema with ID (\d+) under subject '
                r'"([^"]+)"(?: version (\d+))?:'), "import_with_id"),
    (re.compile(r'I list all schemas'), "list_schemas"),
    # goroutine concurrency scenarios: the registry serializes writes,
    # so the deterministic outcome equals a sequential replay
    (re.compile(r'(\d+) goroutines register the same Avro schema to '
                r'subject "([^"]+)"'), "conc_same"),
    (re.compile(r'(\d+) goroutines attempt to register schemas to '
                r'subject "([^"]+)"'), "conc_distinct"),
    (re.compile(r'(\d+) subjects each with one Avro schema'),
     "conc_seed_subjects"),
    (re.compile(r'(\d+) goroutines each soft-delete their own subject'),
     "conc_delete_each"),
    (re.compile(r'(\d+) goroutines each register a unique Avro schema '
                r'to separate subjects'), "conc_separate"),
    (re.compile(r'(\d+) writer goroutines add versions and (\d+) reader '
                r'goroutines read latest from subject "([^"]+)"'),
     "conc_mixed"),
    (re.compile(r'all concurrent results should succeed'),
     "assert_conc_ok"),
    (re.compile(r'all concurrent results should have status (\d+)'),
     "assert_conc_status"),
    (re.compile(r'no concurrent results should have a 500 status'),
     "assert_conc_no500"),
    (re.compile(r'all returned schema IDs should be identical'),
     "assert_conc_same_ids"),
    (re.compile(r'all returned schema IDs should be unique'),
     "assert_conc_uniq_ids"),
    (re.compile(r'all reader responses should contain a valid schema'),
     "assert_conc_reads"),
    (re.compile(r'subject "([^"]+)" should have exactly (\d+) '
                r'versions?'), "assert_n_versions"),
    (re.compile(r'GET /subjects should return an empty array'),
     "assert_subjects_empty"),
]

_UNSUPPORTED_TOKENS = ()


_TAGS_CACHE: dict[str, dict] = {}


def _feature_tags(fname: str) -> dict[str, tuple]:
    """scenario name -> tuple of @tags directly above it."""
    if fname not in _TAGS_CACHE:
        path = os.path.join(FEATURES_DIR, fname)
        out: dict[str, tuple] = {}
        pending: list[str] = []
        if os.path.exists(path):
            for line in open(path, encoding="utf-8"):
                s = line.strip()
                if s.startswith("@"):
                    pending = s.split()
                elif s.startswith("Scenario"):
                    out[s.split(":", 1)[1].strip()] = tuple(pending)
                    pending = []
                elif s and not s.startswith("#"):
                    pending = pending if s.startswith("Feature") \
                        else pending
        _TAGS_CACHE[fname] = out
    return _TAGS_CACHE[fname]


@dataclasses.dataclass
class Mismatch:
    feature: str
    scenario: str
    step: str
    expected: Any
    got: Any


def _parse_url(url: str):
    """(path_parts, query_dict) for the handful of registry URL shapes."""
    path, _, query = url.partition("?")
    q = dict(kv.split("=", 1) for kv in query.split("&") if "=" in kv)
    return [p for p in path.split("/") if p], q


def replay(features=LIFECYCLE_FEATURES,
           features_dir: str = FEATURES_DIR):
    """Returns (n_assertions, mismatches, skipped)."""
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


def _typed(g) -> dict:
    return {"schema_type": (g or "AVRO").upper()}


#: direct-sim replay ops -> the HTTP request the reference's BDD step
#: driver would have issued, so the audit middleware replica can derive
#: the same event.  Ops that already route through _dispatch_http are
#: audited there and MUST NOT appear here (no double emission).
_AUDIT_ROUTES = {
    "seed": lambda m, doc: (
        "POST", f"/subjects/{m.group(1)}/versions", doc,
        _typed(m.group(2))),
    "seed_refs": lambda m, doc: (
        "POST", f"/subjects/{m.group(1)}/versions", doc,
        _typed(m.group(2))),
    "seed_one_ref": lambda m, doc: (
        "POST", f"/subjects/{m.group(1)}/versions", doc,
        _typed(m.group(2))),
    "register": lambda m, doc: (
        "POST", f"/subjects/{m.group(2)}/versions", doc,
        _typed(m.group(1))),
    "register_refs": lambda m, doc: (
        "POST", f"/subjects/{m.group(2)}/versions", doc,
        _typed(m.group(1))),
    "import_with_id": lambda m, doc: (
        "POST", f"/subjects/{m.group(2)}/versions", doc,
        {"schema_type": "AVRO", "schema_id": int(m.group(1))}),
    "lookup": lambda m, doc: (
        "POST", f"/subjects/{m.group(1)}", doc, {}),
    "lookup_del": lambda m, doc: (
        "POST", f"/subjects/{m.group(1)}?deleted=true", doc, {}),
    "lookup_typed": lambda m, doc: (
        "POST", f"/subjects/{m.group(2)}", doc, _typed(m.group(1))),
    "del_ver": lambda m, doc: (
        "DELETE", f"/subjects/{m.group(2)}/versions/{m.group(1)}",
        None, {}),
    "hdel_ver": lambda m, doc: (
        "DELETE",
        f"/subjects/{m.group(2)}/versions/{m.group(1)}?permanent=true",
        None, {}),
    "del_subj": lambda m, doc: (
        "DELETE", f"/subjects/{m.group(1)}", None, {}),
    "hdel_subj": lambda m, doc: (
        "DELETE", f"/subjects/{m.group(1)}?permanent=true", None, {}),
    "compat_check": lambda m, doc: (
        "POST",
        f"/compatibility/subjects/{m.group(2)}/versions/latest",
        doc, {}),
    "compat_check_ver": lambda m, doc: (
        "POST",
        f"/compatibility/subjects/{m.group(2)}/versions/{m.group(3)}",
        doc, {}),
    "compat_check_all": lambda m, doc: (
        "POST", f"/compatibility/subjects/{m.group(2)}/versions",
        doc, {}),
    "set_glob_cfg": lambda m, doc: ("PUT", "/config", m.group(1), {}),
    "set_subj_cfg": lambda m, doc: (
        "PUT", f"/config/{m.group(1)}", m.group(2), {}),
    "del_glob_cfg": lambda m, doc: ("DELETE", "/config", None, {}),
    "del_subj_cfg": lambda m, doc: (
        "DELETE", f"/config/{m.group(1)}", None, {}),
    "set_glob_mode": lambda m, doc: ("PUT", "/mode", m.group(1), {}),
    "set_subj_mode": lambda m, doc: (
        "PUT", f"/mode/{m.group(1)}", m.group(2), {}),
    "del_subj_mode": lambda m, doc: (
        "DELETE", f"/mode/{m.group(1)}", None, {}),
    "import_one": lambda m, doc: (
        "POST", "/import/schemas",
        json.dumps({"schemas": [
            {"id": int(m.group(2)), "subject": m.group(3),
             "version": int(m.group(4)), "schema": doc,
             "schemaType": (m.group(1) or "AVRO").upper()}]}), {}),
    "import_many": lambda m, doc: (
        "POST", "/import/schemas", doc, {}),
}



def _areg(sim, subject, text, stype="AVRO"):
    """Audited register for replay ops that loop over sim.register."""
    url = f"/subjects/{subject}/versions"
    pre = bdd_audit.snapshot(sim, "POST", url, {})
    st, bd = sim.register(subject, text, stype)
    bdd_audit.record(sim, "POST", url, text, st, bd, pre,
                     {"schema_type": stype})
    return st, bd


def _adel(sim, subject):
    url = f"/subjects/{subject}"
    pre = bdd_audit.snapshot(sim, "DELETE", url, {})
    st, bd = sim.delete_subject(subject)
    bdd_audit.record(sim, "DELETE", url, None, st, bd, pre)
    return st, bd



def _wipe_store(sim) -> None:
    """Memory-backend process restart: all registry state is lost and
    the server re-seeds its bootstrap auth store (memory/store.go — the
    backend holds everything in process memory)."""
    fresh = RegistrySim()
    for attr in ("subjects", "ids", "next_ids", "root_level", "levels",
                 "root_mode", "subj_modes", "cfg_extra",
                 "glob_cfg_extra", "keks", "deks", "exporters",
                 "exporter_status", "users", "apikeys", "next_uid"):
        setattr(sim, attr, getattr(fresh, attr))


def _invalid_candidate(doc, stype) -> bool:
    """The check endpoint 422s when the candidate fails to parse
    (CheckCompatibility handler -> 42201)."""
    from axonops_schema_registry_spark.registry.evolution import (
        validate_and_normalize,
    )
    return not validate_and_normalize(doc or "", stype)["is_valid"]


def _replay_scenario(feature: str, scenario: str, steps):
    sim = RegistrySim()
    if feature == "audit_outputs.feature":
        # live local webhook + syslog receivers fed through the
        # production HttpWebhookSink / SyslogTcpSink classes
        bdd_audit.audit_wire(sim)
    sim.auth_required = feature.startswith("auth_") \
        or feature.startswith("rate_limiting")
    sim.bearer_only = feature in ("auth_jwt.feature",
                                  "auth_oidc.feature")
    if feature == "auth_mtls.feature":
        # only the @mtls-auth section runs against the auth-enabled
        # server; section 1 is transport-level security only
        sim.auth_required = "@mtls-auth" in _feature_tags(
            feature).get(scenario, ())
    stored: dict[str, Any] = {}
    status, body = None, None
    n = 0
    mm: list[Mismatch] = []

    def sub_stored(s: str) -> str:
        return re.sub(r"\{\{(\w+)\}\}",
                      lambda m: str(stored.get(m.group(1), m.group(0))), s)

    for line, doc in steps:
        bodytext = re.sub(r"^(Given|When|Then|And|But)\s+", "", line)
        bodytext = sub_stored(bodytext)
        if any(tok in bodytext for tok in _UNSUPPORTED_TOKENS):
            return 0, [], f"unsupported step: {bodytext[:60]}"
        for rx, op in STEPS:
            m = rx.search(bodytext)
            if not m:
                continue
            aud_route = _AUDIT_ROUTES.get(op)
            if aud_route is not None:
                a_verb, a_url, a_doc, a_extra = aud_route(m, doc)
                a_path, _, a_qs = a_url.partition("?")
                a_q = dict(kv.split("=", 1)
                           for kv in a_qs.split("&") if "=" in kv)
                a_pre = bdd_audit.snapshot(sim, a_verb, a_path, a_q)
            if op == "auth_basic":
                if sim.bearer_only:
                    # Basic credentials against a bearer-only server
                    sim.actor = "bad"
                    break
                u = next((u for u in sim.users.values()
                          if u["username"] == m.group(1)
                          and u["password"] == m.group(2)
                          and u["enabled"]), None)
                if u is None and \
                        sim.htpasswd.get(m.group(1)) == m.group(2) \
                        and m.group(2):
                    u = {"id": 0, "username": m.group(1),
                         "role": "readonly"}
                sim.auth_method = "basic"
                if u is None:
                    role = sim.idp_users.get((m.group(1), m.group(2)))
                    if role is not None:
                        u = {"id": 0, "username": m.group(1),
                             "role": role}
                        # the LDAP server's basic-auth path reports
                        # method "ldap" (auth.go actorTypeFromAuthMethod)
                        if feature == "auth_ldap.feature":
                            sim.auth_method = "ldap"
                            if m.group(1) == "localadmin":
                                # DB-bootstrap fallback: warning event +
                                # subsequent requests tagged
                                # ldap_fallback
                                sim.auth_method = "ldap_fallback"
                                sim.pending_ldap_fallback = m.group(1)
                if u is None and feature == "auth_ldap.feature":
                    # not in LDAP, not in DB: 401 preceded by the
                    # fallback warning naming the attempted user
                    sim.pending_ldap_fallback = m.group(1)
                sim.actor = u if u is not None else "bad"
            elif op == "auth_key":
                sim.auth_method = "api_key"
                role = sim.config_keys.get(m.group(1))
                k = next((k for k in sim.apikeys.values()
                          if k["key"] == m.group(1) and k["enabled"]),
                         None)
                if role is not None:
                    sim.actor = {"id": 0, "username": m.group(1),
                                 "role": role}
                elif k is not None:
                    sim.actor = {"id": k["user_id"],
                                 "username": k["username"],
                                 "role": k["role"]}
                else:
                    sim.actor = "bad"
            elif op == "auth_stored_key":
                sim.auth_method = "api_key"
                keyval = str(stored.get(m.group(1)))
                k = next((k for k in sim.apikeys.values()
                          if k["key"] == keyval and k["enabled"]), None)
                if k is not None:
                    sim.actor = {"id": k["user_id"],
                                 "username": k["username"],
                                 "role": k["role"]}
                else:
                    sim.actor = "bad"
            elif op == "auth_clear":
                sim.actor = None
                sim.auth_method = ""
            elif op == "jwt_ok":
                sim.auth_method = "jwt"
                claims = {}
                for ln in (doc or "").splitlines():
                    cells = [c.strip()
                             for c in ln.strip().strip("|").split("|")]
                    if len(cells) >= 2:
                        claims[cells[0]] = cells[1]
                uname = claims.get("sub") \
                    or claims.get("preferred_username") or ""
                bad_iss = "iss" in claims and \
                    claims["iss"] != "test-issuer"
                bad_aud = "aud" in claims and \
                    claims["aud"] != "schema-registry"
                if bad_iss or bad_aud:
                    sim.actor = "bad"
                else:
                    sim.actor = {"id": 0, "username": uname,
                                 "role": claims.get("role")
                                 or "readonly"}
            elif op in ("jwt_bad", "bearer_bad"):
                sim.actor = "bad"
            elif op == "oidc":
                sim.auth_method = "oidc"
                role = sim.idp_users.get((m.group(1), m.group(2)))
                sim.actor = ({"id": 0, "username": m.group(1),
                              "role": role}
                             if role is not None else "bad")
            elif op == "mtls_cert":
                sim.cert_state = ("refused"
                                  if m.group(1) in ("client-expired",
                                                    "client-wrong-ca")
                                  else "valid")
                sim.conn_refused = False
            elif op == "mtls_none":
                sim.cert_state = "refused"
            elif op == "mtls_attempt":
                if sim.cert_state == "refused":
                    sim.conn_refused = True
                    status, body = None, None
                else:
                    status, body = _dispatch_http(sim, "GET",
                                                  m.group(1), None)
            elif op == "assert_refused":
                n += 1
                if not sim.conn_refused:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "refused", (status, body)))
            elif op == "noop":
                pass
            elif op == "wh_event":
                n += 1
                evs = bdd_audit.webhook_events(sim, 1)
                if not any(e.get("event_type") == m.group(1)
                           for e in evs):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       m.group(1),
                                       [e.get("event_type")
                                        for e in evs][-5:]))
            elif op == "wh_matching":
                n += 1
                expected = bdd_audit.parse_expect_table(
                    sub_stored(doc or ""))
                evs = bdd_audit.webhook_events(sim, 1)
                if not bdd_audit.match_table(evs, expected):
                    mm.append(Mismatch(
                        feature, scenario, bodytext, expected,
                        bdd_audit.best_partial(evs, expected)))
            elif op == "wh_at_least":
                n += 1
                evs = bdd_audit.webhook_events(sim, int(m.group(1)))
                if len(evs) < int(m.group(1)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f">= {m.group(1)}", len(evs)))
            elif op == "syslog_contains":
                n += 1
                msgs = bdd_audit.syslog_messages(sim, m.group(1))
                if not any(m.group(1) in x for x in msgs):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       m.group(1),
                                       [x[:60] for x in msgs[-3:]]))
            elif op == "get_metrics":
                status, body = 200, bdd_audit.scrape(sim)
            elif op == "prom_exists":
                n += 1
                if not bdd_audit.has_metric(bdd_audit.scrape(sim),
                                            m.group(1)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       m.group(1), "absent"))
            elif op == "prom_not_exists":
                n += 1
                if bdd_audit.has_metric(bdd_audit.scrape(sim),
                                        m.group(1)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"no {m.group(1)}", "present"))
            elif op == "prom_labels":
                n += 1
                if not bdd_audit.metric_with_labels(
                        bdd_audit.scrape(sim), m.group(1), m.group(2)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       (m.group(1), m.group(2)),
                                       "absent"))
            elif op in ("prom_value_ge", "prom_value_eq"):
                n += 1
                val = bdd_audit.metric_value(bdd_audit.scrape(sim),
                                             m.group(1))
                want = int(m.group(2))
                bad = (val is None or
                       (val < want if op == "prom_value_ge"
                        else int(val) != want))
                if bad:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       want, val))
            elif op == "prom_store":
                stored[m.group(2)] = bdd_audit.metric_value(
                    bdd_audit.scrape(sim), m.group(1)) or 0.0
            elif op == "prom_increased":
                n += 1
                val = bdd_audit.metric_value(bdd_audit.scrape(sim),
                                             m.group(1))
                prev = stored.get(m.group(2), 0.0)
                if val is None or not isinstance(prev, float) \
                        or val <= prev:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"> {prev}", val))
            elif op == "assert_prom_metric":
                n += 1
                if not isinstance(body, str) or m.group(1) not in body:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       m.group(1), str(body)[:80]))
            elif op == "mk_user":
                payload = {"username": m.group(1),
                           "password": m.group(2), "role": m.group(3)}
                if m.group(4):
                    payload["email"] = m.group(4)
                status, body = _dispatch_http(sim, "POST",
                                              "/admin/users",
                                              json.dumps(payload))
            elif op == "mk_key":
                status, body = _dispatch_http(
                    sim, "POST", "/admin/apikeys",
                    json.dumps({"name": m.group(1),
                                "role": m.group(2),
                                "expires_in": int(m.group(3))}))
            elif op == "list_users":
                status, body = _dispatch_http(sim, "GET",
                                              "/admin/users", None)
            elif op == "list_keys":
                status, body = _dispatch_http(sim, "GET",
                                              "/admin/apikeys", None)
            elif op == "list_roles":
                status, body = _dispatch_http(sim, "GET",
                                              "/admin/roles", None)
            elif op in ("get_user_sid", "upd_user_sid", "del_user_sid",
                        "get_key_sid", "upd_key_sid", "del_key_sid",
                        "revoke_key_sid", "rotate_key_sid"):
                sid = stored.get(m.group(1))
                base = ("/admin/users" if "user" in op
                        else "/admin/apikeys")
                url2 = f"{base}/{sid}"
                if op in ("get_user_sid", "get_key_sid"):
                    status, body = _dispatch_http(sim, "GET", url2,
                                                  None)
                elif op in ("upd_user_sid", "upd_key_sid"):
                    status, body = _dispatch_http(sim, "PUT", url2, doc)
                elif op in ("del_user_sid", "del_key_sid"):
                    status, body = _dispatch_http(sim, "DELETE", url2,
                                                  None)
                elif op == "revoke_key_sid":
                    status, body = _dispatch_http(
                        sim, "POST", url2 + "/revoke", None)
                else:
                    status, body = _dispatch_http(
                        sim, "POST", url2 + "/rotate",
                        json.dumps({"expires_in": int(m.group(2))}))
            elif op == "get_user_id":
                status, body = _dispatch_http(
                    sim, "GET", f"/admin/users/{m.group(1)}", None)
            elif op == "upd_user_id":
                status, body = _dispatch_http(
                    sim, "PUT", f"/admin/users/{m.group(1)}", doc)
            elif op == "rapid_requests":
                # the auth test config caps requests_per_minute at a
                # small value; a 20-request burst must trip 429s
                results = [_dispatch_http(sim, "GET", m.group(2), None)
                           for _ in range(int(m.group(1)))]
                # config.memory-auth.yaml: requests_per_second 2,
                # burst_size 3 — a 20-burst trips the limiter
                limit = 3
                results = [r if i < limit
                           else (429, {"error_code": 429,
                                       "message": "Too Many Requests"})
                           for i, r in enumerate(results)]
                client = (sim.actor.get("username", "anon")
                          if isinstance(sim.actor, dict) else "anon")
                for r in results[limit:]:
                    bdd_audit.metrics_of(sim).record_rate_limit_hit(
                        client)
                stored["__rapid"] = results
                status, body = results[-1]
            elif op == "assert_any_status":
                n += 1
                want = int(m.group(1))
                if not any(r[0] == want
                           for r in stored.get("__rapid", [])):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       want,
                                       [r[0] for r in
                                        stored.get("__rapid", [])][:5]))
            elif op == "assert_roles_len":
                n += 1
                got = len(body.get("roles", [])) \
                    if isinstance(body, dict) else None
                if got != int(m.group(1)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       int(m.group(1)), got))
            elif op == "assert_users_len":
                n += 1
                got = len(body.get("users", [])) \
                    if isinstance(body, dict) else None
                if got != int(m.group(1)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       int(m.group(1)), got))
            elif op == "assert_keys_len":
                n += 1
                got = len(body.get("apikeys", [])) \
                    if isinstance(body, dict) else None
                if got != int(m.group(1)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       int(m.group(1)), got))
            elif op == "assert_field_nonempty2":
                n += 1
                got = body.get(m.group(1)) \
                    if isinstance(body, dict) else None
                if got in (None, "", [], {}):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"non-empty {m.group(1)}", got))
            elif op == "running":
                # the step driver's health probe (GET /) -> 200
                status, body = 200, {}
            elif op == "mem_seed_n":
                for i in range(int(m.group(1))):
                    _areg(sim, f"op-mem-subj-{i}",
                          '{"type":"record","name":"M%d","fields":'
                          '[{"name":"f","type":"string"}]}' % i)
                status, body = 200, {}
            elif op == "mem_seed_two":
                for subj in (m.group(1), m.group(2)):
                    _areg(sim, subj,
                          '{"type":"record","name":"Seed","fields":'
                          '[{"name":"f","type":"string"}]}')
                status, body = 200, {}
            elif op == "persistent_backend":
                sim.persistent = True
                status, body = 200, {}
            elif op in ("mem_restart", "mem_kill"):
                # a persistent backend holds state across process death;
                # the memory backend loses it (storage split in the
                # reference: memory/store.go vs postgres/store.go)
                if not getattr(sim, "persistent", False):
                    _wipe_store(sim)
                sim.down = op == "mem_kill"
            elif op == "mem_stop":
                sim.down = True
            elif op == "mem_start":
                # a fresh process comes up empty (memory backend) but a
                # persistent backend re-reads its store
                if not getattr(sim, "persistent", False):
                    _wipe_store(sim)
                sim.down = False
            elif op == "mem_pause":
                sim.down = True  # DB paused: state retained
            elif op == "mem_unpause":
                sim.down = False
            elif op == "mem_wait_up":
                n += 1
                if getattr(sim, "down", False):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "healthy", "down"))
            elif op == "mem_wait_down":
                n += 1
                if not getattr(sim, "down", False):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "unhealthy", "up"))
            elif op == "cluster_id":
                status, body = _dispatch_http(sim, "GET",
                                              "/v1/metadata/id", None)
            elif op == "server_version":
                status, body = _dispatch_http(
                    sim, "GET", "/v1/metadata/version", None)
            elif op == "get_contexts":
                status, body = sim.list_contexts()
            elif op == "glob":
                sim.root_level = m.group(1)
            elif op == "subj_level":
                sim.levels[m.group(1)] = m.group(2)
            elif op == "set_glob_cfg":
                status, body = sim.set_global_config(m.group(1))
            elif op == "set_subj_cfg":
                status, body = sim.set_subject_config(m.group(1),
                                                      m.group(2))
            elif op == "get_glob_cfg":
                status, body = sim.get_global_config()
            elif op == "get_subj_cfg":
                status, body = sim.get_subject_config(m.group(1))
            elif op == "del_glob_cfg":
                status, body = sim.delete_global_config()
            elif op == "del_subj_cfg":
                status, body = sim.delete_subject_config(m.group(1))
            elif op == "set_glob_mode":
                # the reference BDD step driver forces mode changes
                # (import_mode_comprehensive switches to IMPORT with
                # schemas present); only the raw PUT path models ?force=
                status, body = sim.set_global_mode(m.group(1), force=True)
            elif op == "get_glob_mode":
                status, body = sim.get_global_mode()
            elif op == "set_subj_mode":
                status, body = sim.set_subject_mode(m.group(1),
                                                    m.group(2),
                                                    force=True)
            elif op == "get_subj_mode":
                status, body = sim.get_subject_mode(m.group(1))
            elif op == "del_subj_mode":
                status, body = sim.delete_subject_mode(m.group(1))
            elif op == "versions_for_id":
                try:
                    status, body = sim.versions_for_id(int(m.group(1)))
                except ValueError:
                    return 0, [], f"unresolved placeholder: {bodytext[:50]}"
            elif op == "subjects_for_stored_id":
                sid = stored.get("schema_id")
                if sid is None:
                    return 0, [], "no stored schema_id"
                status, body = sim.subjects_for_id(int(sid))
            elif op == "compat_check_ver" and _invalid_candidate(
                    doc, (m.group(1) or "AVRO").upper()):
                status, body = 422, {"error_code": 42201,
                                     "message": "Invalid schema"}
            elif op == "compat_check_ver":
                stype = (m.group(1) or "AVRO").upper()
                subj = sim.resolve_alias(m.group(2))
                ver = int(m.group(3))
                target = next((v for v in sim._live(subj)
                               if v["version"] == ver), None)
                if target is None:
                    status, body = 404, {"error_code": 40402}
                else:
                    base = sim._resolved_level(subj).replace(
                        "_TRANSITIVE", "")
                    ok, _ = sim.compat_ok(subj, doc, stype, base,
                                          [target])
                    status, body = 200, {"is_compatible": ok}
            elif op == "compat_check_ref" and _invalid_candidate(
                    doc, (m.group(1) or "AVRO").upper()):
                status, body = 422, {"error_code": 42201,
                                     "message": "Invalid schema"}
            elif op == "compat_check_ref":
                stype = (m.group(1) or "AVRO").upper()
                subj = sim.resolve_alias(m.group(5))
                refs = [{"name": m.group(2), "subject": m.group(3),
                         "version": int(m.group(4))}]
                live = sim._live(subj)
                level = sim._resolved_level(subj).replace(
                    "_TRANSITIVE", "")
                ok, _ = sim.compat_ok(subj, doc, stype, level, live,
                                      cand_refs=refs)
                status, body = 200, {"is_compatible": ok}
            elif op == "compat_check" and _invalid_candidate(
                    doc, (m.group(1) or "AVRO").upper()):
                status, body = 422, {"error_code": 42201,
                                     "message": "Invalid schema"}
            elif op == "compat_check":
                stype = (m.group(1) or "AVRO").upper()
                subj = sim.resolve_alias(m.group(2))
                live = sim._live(subj)
                # the plain check endpoint tests against LATEST only —
                # the _TRANSITIVE suffix widens the REGISTRATION gate and
                # the /versions/all endpoint, not this one
                # (compatibility_config_exhaustive 'compatible with
                # latest but not all versions')
                level = sim._resolved_level(subj)
                level = level.replace("_TRANSITIVE", "")
                ok, _ = sim.compat_ok(subj, doc, stype, level, live)
                status, body = 200, {"is_compatible": ok}
            elif op == "assert_compat":
                n += 1
                want = m.group(1) == "compatible"
                got = body.get("is_compatible") \
                    if isinstance(body, dict) else None
                if got != want:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       want, got))
            elif op == "http_body":
                verb, url = m.group(1), m.group(2)
                out = _dispatch_http(sim, verb, url, doc)
                if out is None:
                    return 0, [], f"unsupported URL: {verb} {url}"
                status, body = out
            elif op == "seed":
                stype = (m.group(2) or "AVRO").upper()
                status, body = sim.register(m.group(1), doc, stype)
                n += 1
                if status != 200:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "seed 200", status))
            elif op == "register":
                stype = (m.group(1) or "AVRO").upper()
                gate = _auth_gate(sim, "POST",
                                  ["subjects", m.group(2), "versions"])
                if gate is not None:
                    status, body = gate
                else:
                    status, body = sim.register(m.group(2), doc, stype)
            elif op == "register_refs":
                stype = (m.group(1) or "AVRO").upper()
                try:
                    payload = json.loads(doc)
                except json.JSONDecodeError:
                    status, body = 422, {"error_code": 42201}
                else:
                    status, body = sim.register(
                        m.group(2), payload.get("schema", ""),
                        (payload.get("schemaType") or stype).upper(),
                        metadata=payload.get("metadata"),
                        rule_set=payload.get("ruleSet"),
                        references=payload.get("references"))
            elif op == "referenced_by":
                subj, ver = m.group(1), int(m.group(2))
                ids = sim._referenced_by(subj, {ver})
                status, body = 200, ids
            elif op == "stored_schema_by_id":
                sid = stored.get("schema_id")
                if sid is None:
                    return 0, [], "no stored schema_id"
                status, body = sim.schema_by_id(int(sid))
            elif op == "assert_field_not_stored":
                n += 1
                got = body.get(m.group(1)) if isinstance(body, dict) \
                    else None
                if got == stored.get(m.group(2)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"!= {stored.get(m.group(2))}", got))
            elif op == "assert_valid_json":
                n += 1
                ok_json = True
                if isinstance(body, str):
                    try:
                        json.loads(body)
                    except (TypeError, json.JSONDecodeError):
                        ok_json = False
                elif isinstance(body, dict) and "schema" in body:
                    try:
                        json.loads(body["schema"])
                    except (TypeError, json.JSONDecodeError):
                        ok_json = False
                elif not isinstance(body, (dict, list)):
                    ok_json = False
                if not ok_json:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "valid JSON", body))
            elif op == "assert_stored_gt":
                n += 1
                val = stored.get(m.group(1))
                if not (isinstance(val, int) and val > int(m.group(2))):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"> {m.group(2)}", val))
            elif op == "compat_check_all" and _invalid_candidate(
                    doc, (m.group(1) or "AVRO").upper()):
                status, body = 422, {"error_code": 42201,
                                     "message": "Invalid schema"}
            elif op == "compat_check_all":
                stype = (m.group(1) or "AVRO").upper()
                subj = sim.resolve_alias(m.group(2))
                live = sim._live(subj)
                level = sim._resolved_level(subj)
                base = level.replace("_TRANSITIVE", "")
                lvl = base + "_TRANSITIVE" if base != "NONE" else "NONE"
                ok, _ = sim.compat_ok(subj, doc, stype, lvl, live)
                status, body = 200, {"is_compatible": ok}
            elif op == "assert_contains_int":
                n += 1
                if not (isinstance(body, list) and int(m.group(1)) in body):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       int(m.group(1)), body))
            elif op == "assert_contains_stored_int":
                n += 1
                want = stored.get(m.group(1))
                if not (isinstance(body, list) and want in body):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       want, body))
            elif op == "del_ver":
                status, body = sim.delete_version(m.group(2),
                                                  int(m.group(1)))
            elif op == "hdel_ver":
                status, body = sim.delete_version(
                    m.group(2), int(m.group(1)), permanent=True)
            elif op == "del_subj":
                status, body = sim.delete_subject(m.group(1))
            elif op == "hdel_subj":
                status, body = sim.delete_subject(m.group(1),
                                                  permanent=True)
            elif op == "get_latest":
                status, body = sim.get_version(m.group(1), "latest")
            elif op == "get_ver":
                status, body = sim.get_version(m.group(2),
                                               int(m.group(1)))
            elif op == "list_vers":
                status, body = sim.list_versions(m.group(1))
            elif op == "list_subj":
                status, body = sim.list_subjects()
            elif op == "list_subj_del":
                status, body = sim.list_subjects(deleted=True)
            elif op == "lookup":
                status, body = sim.lookup(m.group(1), doc)
            elif op == "lookup_del":
                status, body = sim.lookup(m.group(1), doc, deleted=True)
            elif op == "schema_by_id":
                try:
                    status, body = sim.schema_by_id(int(m.group(1)))
                except ValueError:
                    return 0, [], f"unresolved placeholder: {bodytext[:50]}"
            elif op == "subjects_for_id":
                try:
                    status, body = sim.subjects_for_id(int(m.group(1)))
                except ValueError:
                    return 0, [], f"unresolved placeholder: {bodytext[:50]}"
            elif op == "http":
                verb, url = m.group(1), m.group(2)
                out = _dispatch_http(sim, verb, url, doc)
                if out is None:
                    return 0, [], f"unsupported URL: {verb} {url}"
                status, body = out
            elif op == "assert_content_type":
                # the dispatch models bodies, not headers — infer the
                # content type the server would set for this body
                n += 1
                if isinstance(body, str):
                    got_ct = ("text/yaml" if body.startswith("openapi")
                              else "text/html" if "<" in body[:10]
                              else "application/json")
                else:
                    # registry JSON endpoints use the Confluent media
                    # type (writeJSON, handlers.go:1444+); the health
                    # endpoints use plain application/json
                    got_ct = ("application/vnd.schemaregistry.v1+json; "
                              "also application/json")
                if m.group(1) not in got_ct:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       m.group(1), got_ct))
            elif op == "assert_status":
                n += 1
                if status != int(m.group(1)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       int(m.group(1)), (status, body)))
            elif op == "assert_err":
                n += 1
                got = body.get("error_code") if isinstance(body, dict) \
                    else None
                if got != int(m.group(1)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       int(m.group(1)), got))
            elif op == "assert_len":
                n += 1
                got = len(body) if isinstance(body, list) else None
                if got != int(m.group(1)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       int(m.group(1)), body))
            elif op == "assert_contains_item":
                n += 1
                if not (isinstance(body, list) and m.group(1) in body):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       m.group(1), body))
            elif op == "assert_not_contains_item":
                n += 1
                if isinstance(body, list) and m.group(1) in body:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"not {m.group(1)}", body))
            elif op == "assert_contains":
                n += 1
                if m.group(1) not in json.dumps(body):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       m.group(1), body))
            elif op == "assert_not_contains":
                n += 1
                if m.group(1) in json.dumps(body):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"not {m.group(1)}", body))
            elif op == "assert_field":
                n += 1
                got = body.get(m.group(1)) if isinstance(body, dict) \
                    else None
                if got != int(m.group(2)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       int(m.group(2)), got))
            elif op == "assert_field_bool":
                n += 1
                want = m.group(2) == "true"
                got = body.get(m.group(1)) if isinstance(body, dict) \
                    else None
                if got != want:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       want, got))
            elif op == "assert_field_str":
                n += 1
                got = body.get(m.group(1)) if isinstance(body, dict) \
                    else None
                if got != m.group(2):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       m.group(2), got))
            elif op == "assert_has_field":
                n += 1
                if not (isinstance(body, dict) and m.group(1) in body):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"field {m.group(1)}", body))
            elif op == "assert_field_array":
                n += 1
                got = body.get(m.group(1)) if isinstance(body, dict) \
                    else None
                if not isinstance(got, list):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"array {m.group(1)}", body))
            elif op == "http_nobody":
                out = _dispatch_http(sim, m.group(1), m.group(2), None)
                if out is None:
                    return 0, [], f"unsupported URL: {m.group(1)} " \
                                  f"{m.group(2)}"
                status, body = out
            elif op == "http_rawbody":
                out = _dispatch_http(sim, m.group(1), m.group(2),
                                     m.group(3))
                if out is None:
                    return 0, [], f"unsupported URL: {m.group(1)} " \
                                  f"{m.group(2)}"
                status, body = out
            elif op == "assert_field_nonempty":
                n += 1
                got = body.get(m.group(1)) if isinstance(body, dict) \
                    else None
                if got in (None, "", [], {}):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"non-empty {m.group(1)}", got))
            elif op == "assert_field_empty":
                n += 1
                got = body.get(m.group(1)) if isinstance(body, dict) \
                    else None
                if got not in (None, "", [], {}):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"empty {m.group(1)}", got))
            elif op == "assert_no_field":
                n += 1
                if isinstance(body, dict) and m.group(1) in body:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"no field {m.group(1)}", body))
            elif op == "assert_field_stored":
                n += 1
                got = body.get(m.group(1)) if isinstance(body, dict) \
                    else None
                if got != stored.get(m.group(2)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       stored.get(m.group(2)), got))
            elif op == "store_field":
                if isinstance(body, dict):
                    stored[m.group(2)] = body.get(m.group(1))
            elif op == "schema_types":
                status, body = 200, ["AVRO", "JSON", "PROTOBUF"]
            elif op == "raw_by_id":
                status, body = sim.schema_by_id(int(m.group(1)))
                if status == 200:
                    body = body["schema"]
            elif op == "raw_by_ver":
                status, body = sim.raw_schema(m.group(1),
                                              int(m.group(2)))
            elif op == "lookup_typed":
                stype = (m.group(1) or "AVRO").upper()
                status, body = sim.lookup(m.group(2), doc, stype)
            elif op == "assert_int":
                n += 1
                if body != int(m.group(1)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       int(m.group(1)), body))
            elif op == "seed_refs":
                stype = (m.group(2) or "AVRO").upper()
                try:
                    payload = json.loads(doc)
                except json.JSONDecodeError:
                    status, body = 422, {"error_code": 42201}
                else:
                    status, body = sim.register(
                        m.group(1), payload.get("schema", ""),
                        (payload.get("schemaType") or stype).upper(),
                        metadata=payload.get("metadata"),
                        rule_set=payload.get("ruleSet"),
                        references=payload.get("references"))
                n += 1
                if status != 200:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "seed 200", (status, body)))
            elif op == "seed_one_ref":
                stype = (m.group(2) or "AVRO").upper()
                refs = [{"name": m.group(3), "subject": m.group(4),
                         "version": int(m.group(5))}]
                status, body = sim.register(m.group(1), doc, stype,
                                            references=refs)
                n += 1
                if status != 200:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "seed 200", (status, body)))
            elif op == "import_one":
                stype = (m.group(1) or "AVRO").upper()
                status, body = sim.import_schemas({"schemas": [
                    {"id": int(m.group(2)), "subject": m.group(3),
                     "version": int(m.group(4)), "schema": doc,
                     "schemaType": stype}]})
            elif op == "import_many":
                try:
                    payload = json.loads(doc)
                except json.JSONDecodeError:
                    status, body = 400, {"error_code": 42201}
                else:
                    status, body = sim.import_schemas(payload)
            elif op == "assert_import":
                n += 1
                want = (int(m.group(1)), int(m.group(2)))
                got = (body.get("imported"), body.get("errors")) \
                    if isinstance(body, dict) else None
                if got != want:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       want, got))
            elif op == "import_with_id":
                status, body = sim.register_import(
                    m.group(2), doc, "AVRO", int(m.group(1)),
                    int(m.group(3)) if m.group(3) else None)
            elif op == "list_schemas":
                status, body = _dispatch_http(sim, "GET", "/schemas",
                                              None)
            elif op == "conc_same":
                text = ('{"type":"record","name":"Conc","fields":'
                        '[{"name":"v","type":"string"}]}')
                stored["__conc"] = [_areg(sim, m.group(2), text)
                                    for _ in range(int(m.group(1)))]
                stored["__readers"] = []
            elif op == "conc_distinct":
                stored["__conc"] = [
                    _areg(sim, m.group(2),
                          '{"type":"record","name":"G%d",'
                                 '"fields":[{"name":"v","type":'
                                 '"string"}]}' % i)
                    for i in range(int(m.group(1)))]
                stored["__readers"] = []
            elif op == "conc_seed_subjects":
                subs = [f"conc-subj-{i}"
                        for i in range(int(m.group(1)))]
                for i, s in enumerate(subs):
                    sim.register(s, '{"type":"record","name":"S%d",'
                                    '"fields":[{"name":"v","type":'
                                    '"string"}]}' % i)
                stored["__subjects"] = subs
            elif op == "conc_delete_each":
                stored["__conc"] = [_adel(sim, s)
                                    for s in stored.get("__subjects",
                                                        [])]
            elif op == "conc_separate":
                stored["__conc"] = [
                    _areg(sim, f"conc-sep-{i}",
                          '{"type":"record","name":"U%d",'
                                 '"fields":[{"name":"v","type":'
                                 '"string"}]}' % i)
                    for i in range(int(m.group(1)))]
            elif op == "conc_mixed":
                subj = m.group(3)
                writes, reads = [], []
                for i in range(int(m.group(1))):
                    writes.append(_areg(
                        sim, subj,
                        '{"type":"record","name":"L%d","fields":'
                        '[{"name":"x","type":"int"}]}' % i))
                    reads.append(sim.get_version(subj, "latest"))
                stored["__conc"] = writes + reads
                stored["__readers"] = reads
            elif op == "assert_conc_ok":
                n += 1
                bad = [r for r in stored.get("__conc", [])
                       if r[0] != 200]
                if bad:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "all 200", bad[:3]))
            elif op == "assert_conc_status":
                n += 1
                want = int(m.group(1))
                bad = [r for r in stored.get("__conc", [])
                       if r[0] != want]
                if bad:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"all {want}", bad[:3]))
            elif op == "assert_conc_no500":
                n += 1
                bad = [r for r in stored.get("__conc", [])
                       if r[0] >= 500]
                if bad:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "no 5xx", bad[:3]))
            elif op == "assert_conc_same_ids":
                n += 1
                ids = {r[1].get("id") for r in stored.get("__conc", [])
                       if isinstance(r[1], dict)}
                if len(ids) != 1:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "one id", ids))
            elif op == "assert_conc_uniq_ids":
                n += 1
                ids = [r[1].get("id") for r in stored.get("__conc", [])
                       if isinstance(r[1], dict)]
                if len(ids) != len(set(ids)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "unique ids", ids))
            elif op == "assert_conc_reads":
                n += 1
                bad = [r for r in stored.get("__readers", [])
                       if not (r[0] == 200 and isinstance(r[1], dict)
                               and r[1].get("schema"))]
                if bad:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "valid schemas", bad[:3]))
            elif op == "assert_n_versions":
                n += 1
                st_, got = sim.list_versions(m.group(1))
                count = len(got) if st_ == 200 else 0
                if count != int(m.group(2)):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       int(m.group(2)), (st_, got)))
            elif op == "assert_subjects_empty":
                n += 1
                _, got = sim.list_subjects()
                if got != []:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       "[]", got))
            elif op == "audit_table":
                n += 1
                expected = bdd_audit.parse_expect_table(
                    sub_stored(doc or ""))
                if not bdd_audit.match_table(sim.audit_log, expected):
                    best = bdd_audit.best_partial(sim.audit_log,
                                                  expected)
                    mm.append(Mismatch(feature, scenario,
                                       "audit table "
                                       + expected.get("event_type", "?"),
                                       expected, best))
            elif op == "audit_not_event":
                n += 1
                if any(e.get("event_type") == m.group(1)
                       for e in sim.audit_log):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       f"no {m.group(1)}", "present"))
            elif op == "audit_event":
                n += 1
                if not any(e.get("event_type") == m.group(1)
                           for e in sim.audit_log):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       m.group(1), "absent"))
            elif op == "audit_event_subject":
                n += 1
                if not any(e.get("event_type") == m.group(1)
                           and e.get("target_id") == m.group(2)
                           for e in sim.audit_log):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       (m.group(1), m.group(2)),
                                       "absent"))
            elif op == "audit_event_method":
                n += 1
                if not any(e.get("event_type") == m.group(1)
                           and e.get("method") == m.group(2)
                           for e in sim.audit_log):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       (m.group(1), m.group(2)),
                                       "absent"))
            elif op == "audit_event_path":
                n += 1
                if not any(e.get("event_type") == m.group(1)
                           and m.group(2) in str(e.get("path", ""))
                           for e in sim.audit_log):
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       (m.group(1), m.group(2)),
                                       "absent"))
            elif op == "audit_contains_str":
                n += 1
                blob = json.dumps(sim.audit_log, default=str)
                if m.group(1) not in blob:
                    mm.append(Mismatch(feature, scenario, bodytext,
                                       m.group(1), "absent"))
            if aud_route is not None:
                bdd_audit.record(sim, a_verb, a_url, a_doc, status,
                                 body, a_pre, a_extra)
            break
        else:
            if bodytext.startswith("|"):
                continue  # table rows of an ignored step
            return 0, [], f"unrecognized step: {bodytext[:60]}"
    return n, mm, None


def _paginate(out, q):
    """?offset=&limit= on list endpoints (pagination.feature)."""
    if not (isinstance(out, tuple) and isinstance(out[1], list)):
        return out
    status, body = out
    try:
        offset = int(q.get("offset", 0))
        limit = int(q["limit"]) if "limit" in q else None
    except ValueError:
        return out
    body = body[offset:]
    if limit is not None and limit > 0:
        # limit <= 0 means unlimited (pagination.feature)
        body = body[:limit]
    return status, body


def _dispatch_dek(sim: RegistrySim, verb: str, parts, q, doc):
    """/dek-registry/v1/keks... routes (server.go:226-248)."""
    deleted = q.get("deleted") == "true"
    permanent = q.get("permanent") == "true"
    algorithm = q.get("algorithm", "")
    try:
        payload = json.loads(doc) if doc else {}
    except json.JSONDecodeError:
        return 400, {"error_code": 42201, "message": "Invalid request body"}
    if parts == ["keks"]:
        if verb == "GET":
            return _paginate(sim.kek_list(deleted=deleted), q)
        if verb == "POST":
            return sim.kek_create(payload)
        return None

    def ver_of(s: str):
        try:
            v = int(s)
        except ValueError:
            return None
        return v if v > 0 else None

    if len(parts) >= 2 and parts[0] == "keks":
        name = parts[1]
        if len(parts) == 2:
            if verb == "GET":
                return sim.kek_get(name, deleted=deleted)
            if verb == "PUT":
                return sim.kek_update(name, payload)
            if verb == "DELETE":
                return sim.kek_delete(name, permanent=permanent)
            return None
        if parts[2] == "undelete" and len(parts) == 3:
            return sim.kek_undelete(name)
        if parts[2] == "test" and len(parts) == 3 and verb == "POST":
            kek_rec = sim.keks.get(name)
            if kek_rec and kek_rec.get("kmsType") in ("hcvault",
                                                      "openbao"):
                return 200, sim._kek_body(kek_rec)
            # no KMS provider configured for other types
            return 422, {"error_code": 42201,
                         "message": "KMS not configured"}
        if parts[2] != "deks":
            return None
        if len(parts) == 3:
            if verb == "GET":
                return _paginate(sim.dek_list(name, deleted=deleted), q)
            if verb == "POST":
                return sim.dek_create(name, payload)
            return None
        subject = parts[3]
        if len(parts) == 4:
            if verb == "GET":
                return sim.dek_get(name, subject, -1, algorithm,
                                   deleted=deleted)
            if verb == "POST":
                if q.get("rewrap") == "true":
                    kek_rec = sim.keks.get(name)
                    if not (kek_rec and kek_rec.get("kmsType") in
                            ("hcvault", "openbao")):
                        # no KMS provider for other types
                        # (dek.go:557-577 → registry_dek.go:133-136)
                        return 422, {"error_code": 42201,
                                     "message": "KMS not configured: "
                                                "rewrap requires a KMS "
                                                "provider"}
                    return sim.dek_rewrap(name, subject, -1, algorithm)
                body = dict(payload)
                body["subject"] = subject
                return sim.dek_create(name, body)
            if verb == "DELETE":
                return sim.dek_delete(name, subject, -1, algorithm,
                                      permanent=permanent)
            return None
        if parts[4] == "undelete" and len(parts) == 5:
            return sim.dek_undelete(name, subject, -1, algorithm)
        if parts[4] != "versions":
            return None
        if len(parts) == 5 and verb == "GET":
            return _paginate(
                sim.dek_versions(name, subject, algorithm,
                                 deleted=deleted), q)
        if len(parts) >= 6:
            v = ver_of(parts[5])
            if v is None:
                return 422, {"error_code": 42202,
                             "message": "Invalid version: must be a "
                                        "positive integer"}
            if len(parts) == 6:
                if verb == "GET":
                    return sim.dek_get(name, subject, v, algorithm,
                                       deleted=deleted)
                if verb == "DELETE":
                    return sim.dek_delete(name, subject, v, algorithm,
                                          permanent=permanent)
                return None
            if len(parts) == 7 and parts[6] == "undelete":
                return sim.dek_undelete(name, subject, v, algorithm)
    return None


def _latest(sim: RegistrySim, subject: str):
    live = sim._live(sim.resolve_alias(subject))
    return max(live, key=lambda x: x["version"], default=None)


def _fields_of(x: dict) -> list[dict]:
    from axonops_schema_registry_spark.registry.fields import (
        extract_fields,
    )

    return extract_fields(x["text"], x["type"] or "AVRO")


def _dispatch_analysis(sim: RegistrySim, verb: str, parts, q, doc):
    """The /schemas|/statistics|/compatibility analysis surface
    (analysis.go) — wired through the PRODUCTION helpers
    (registry.analysis / registry.fields / registry.evolution) so the
    reference's BDD scenarios exercise the same code the Spark specs
    run."""
    from axonops_schema_registry_spark.registry.analysis import (
        complexity_grade,
        fuzzy_score,
        naming_variants,
        normalize_field_name,
        score_schema_quality,
    )
    from axonops_schema_registry_spark.registry.evolution import (
        validate_and_normalize,
    )

    try:
        payload = json.loads(doc) if doc else {}
    except json.JSONDecodeError:
        return 400, {"error_code": 42201, "message": "Invalid request body"}

    def bad(msg):
        return 400, {"error_code": 42201, "message": msg}

    def schema_or_subject():
        """(text, stype) | error — inline schema wins, else subject's
        latest (quality/complexity request shape)."""
        text, stype = payload.get("schema") or "", \
            payload.get("schemaType") or ""
        if not text and payload.get("subject"):
            x = _latest(sim, payload["subject"])
            if x is None:
                return None, (404, {"error_code": 40401,
                                    "message": "Subject not found"})
            return (x["text"], x["type"] or "AVRO"), None
        if not text:
            return None, bad("Schema or subject is required")
        st = (stype or "AVRO").upper()
        if st not in ("AVRO", "JSON", "PROTOBUF"):
            return None, (422, {"error_code": 42201,
                                "message": f"Invalid schema type "
                                           f"'{stype}'"})
        return (text, st), None

    def live_latest_rows():
        _, names = sim.list_subjects()
        for s in names:
            x = _latest(sim, s)
            if x is not None:
                yield s, x

    if verb == "POST" and parts == ["schemas", "validate"]:
        if not payload.get("schema"):
            return bad("Schema is required")
        st = (payload.get("schemaType") or "AVRO").upper()
        if st not in ("AVRO", "JSON", "PROTOBUF"):
            return 422, {"error_code": 42201,
                         "message": f"Invalid schema type "
                                    f"'{payload.get('schemaType')}'"}
        r = validate_and_normalize(payload["schema"], st)
        return 200, {"is_valid": r["is_valid"], "schema_type": st,
                     "error": r["error"] or ""}
    if verb == "POST" and parts == ["schemas", "normalize"]:
        if not payload.get("schema"):
            return bad("Schema is required")
        st = (payload.get("schemaType") or "AVRO").upper()
        if st not in ("AVRO", "JSON", "PROTOBUF"):
            return 422, {"error_code": 42201,
                         "message": f"Invalid schema type "
                                    f"'{payload.get('schemaType')}'"}
        r = validate_and_normalize(payload["schema"], st)
        if not r["is_valid"]:
            return 422, {"error_code": 42201, "message": r["error"]}
        return 200, {"schema_type": st, "canonical": r["canonical"],
                     "fingerprint": r["fingerprint"]}
    if verb == "POST" and parts == ["schemas", "search"]:
        query = payload.get("query") or ""
        if not query:
            return bad("Query is required")
        use_re = bool(payload.get("regex"))
        limit = min(payload.get("limit") or 50, 1000)
        if use_re:
            try:
                rx = re.compile(query)
            except re.error as exc:
                return bad(f"Invalid regex: {exc}")
        matches = []
        for s, x in live_latest_rows():
            if len(matches) >= limit:
                break
            hit = rx.search(x["text"]) if use_re else query in x["text"]
            if hit:
                matches.append({"subject": s, "version": x["version"],
                                "schema_type": x["type"] or "AVRO"})
        return 200, {"query": query, "count": len(matches),
                     "matches": matches}
    if verb == "POST" and parts == ["schemas", "search", "field"]:
        field = payload.get("field") or ""
        if not field:
            return bad("Field is required")
        mode = payload.get("mode") or "exact"
        threshold = min(float(payload.get("threshold") or 0.6), 1.0)
        limit = min(payload.get("limit") or 50, 1000)
        variants = [v.lower() for v in naming_variants(field)]
        if mode == "regex":
            try:
                rx = re.compile(field)
            except re.error as exc:
                return bad(f"Invalid regex: {exc}")
        results = []
        for s, x in live_latest_rows():
            if len(results) >= limit:
                break
            for f in _fields_of(x):
                row = {"subject": s, "field_name": f["name"],
                       "field_type": f["type"], "field_path": f["path"],
                       "schema_type": x["type"] or "AVRO"}
                if mode == "exact":
                    if f["name"].lower() in variants:
                        results.append({**row, "score": 1.0})
                elif mode == "fuzzy":
                    score = fuzzy_score(field, f["name"])
                    if score >= threshold:
                        results.append({**row, "score": score})
                elif mode == "regex" and rx.search(f["name"]):
                    results.append({**row, "score": 1.0})
        return 200, {"field": field, "mode": mode,
                     "count": len(results), "matches": results}
    if verb == "POST" and parts == ["schemas", "search", "type"]:
        pat = payload.get("type_pattern") or ""
        if not pat:
            return bad("type_pattern is required")
        use_re = bool(payload.get("regex"))
        limit = min(payload.get("limit") or 50, 1000)
        if use_re:
            try:
                rx = re.compile(pat)
            except re.error as exc:
                return bad(f"Invalid regex: {exc}")
        results = []
        for s, x in live_latest_rows():
            if len(results) >= limit:
                break
            for f in _fields_of(x):
                if (rx.search(f["type"]) if use_re
                        else pat.lower() in f["type"].lower()):
                    results.append({"subject": s,
                                    "field_name": f["name"],
                                    "field_type": f["type"]})
        return 200, {"type_pattern": pat, "count": len(results),
                     "matches": results}
    if verb == "POST" and parts == ["schemas", "similar"]:
        subject = payload.get("subject") or ""
        if not subject:
            return bad("Subject is required")
        threshold = min(float(payload.get("threshold") or 0.3), 1.0)
        limit = min(payload.get("limit") or 10, 1000)
        src = _latest(sim, subject)
        if src is None:
            return 404, {"error_code": 40401,
                         "message": "Subject not found"}
        src_set = {normalize_field_name(f["name"])
                   for f in _fields_of(src)}
        results = []
        for s, x in live_latest_rows():
            if s == subject or len(results) >= limit:
                continue
            tgt = {normalize_field_name(f["name"])
                   for f in _fields_of(x)}
            union = src_set | tgt
            if not union:
                continue
            shared = sorted(src_set & tgt)
            sim_score = len(shared) / len(union)
            if sim_score >= threshold:
                results.append({"subject": s, "similarity": sim_score,
                                "shared_fields": shared})
        return 200, {"subject": subject, "count": len(results),
                     "similar": results}
    if verb == "POST" and parts == ["schemas", "quality"]:
        got, err = schema_or_subject()
        if err:
            return err
        text, st = got
        fields = _fields_of({"text": text, "type": st})
        return 200, score_schema_quality(fields, text, st)
    if verb == "POST" and parts == ["schemas", "complexity"]:
        got, err = schema_or_subject()
        if err:
            return err
        text, st = got
        out = complexity_grade(_fields_of({"text": text, "type": st}))
        return 200, {"schema_type": st, **out}
    if verb == "POST" and parts == ["compatibility", "check"]:
        if not payload.get("schema"):
            return bad("Schema is required")
        st = (payload.get("schemaType") or "AVRO").upper()
        results = []
        for subj in payload.get("subjects") or []:
            live = sim._live(sim.resolve_alias(subj))
            if not live:
                results.append({"subject": subj, "is_compatible": False,
                                "error": "Subject not found"})
                continue
            base = sim._resolved_level(subj).replace("_TRANSITIVE", "")
            ok, _ = sim.compat_ok(subj, payload["schema"], st, base,
                                  [max(live,
                                       key=lambda v: v["version"])])
            results.append({"subject": subj, "is_compatible": ok})
        return 200, {"results": results, "count": len(results)}
    if verb == "POST" and len(parts) == 4 \
            and parts[:2] == ["compatibility", "subjects"] \
            and parts[3] in ("suggest", "explain"):
        subject = sim.resolve_alias(parts[2])
        level = sim._resolved_level(subject)
        if parts[3] == "suggest":
            base = level.upper()
            sugg = {
                "BACKWARD": ["Add new fields with default values",
                             "Do NOT remove existing fields",
                             "Do NOT change field types"],
                "FORWARD": ["Remove fields (new consumers will ignore "
                            "them)",
                            "Do NOT add required fields without "
                            "defaults"],
                "FULL": ["Only add optional fields with defaults",
                         "Do NOT remove or rename fields"],
                "NONE": ["Any change is allowed (no compatibility "
                         "checks)"],
            }.get(base.replace("_TRANSITIVE", ""), [])
            return 200, {"subject": subject,
                         "compatibility_level": level,
                         "suggestions": sugg}
        if not payload.get("schema"):
            return bad("Schema is required")
        st = (payload.get("schemaType") or "AVRO").upper()
        live = sim._live(subject)
        base = level.replace("_TRANSITIVE", "")
        targets = [max(live, key=lambda v: v["version"])] if live else []
        ok, msgs = sim.compat_ok(subject, payload["schema"], st, base,
                                 targets)
        out = {"subject": subject, "compatibility_level": level,
               "is_compatible": ok}
        if not ok:
            out["error"] = "; ".join(msgs)
            out["explanation"] = ("The schema is not compatible with "
                                  "the existing schema under "
                                  f"{level} compatibility")
        return 200, out
    if verb == "POST" and parts == ["compatibility", "compare"]:
        s1, s2 = payload.get("subject1") or "", \
            payload.get("subject2") or ""
        if not s1 or not s2:
            return bad("Both subject1 and subject2 are required")
        x1 = _latest(sim, s1)
        if x1 is None:
            return 404, {"error_code": 40401,
                         "message": "Subject1 not found"}
        x2 = _latest(sim, s2)
        if x2 is None:
            return 404, {"error_code": 40401,
                         "message": "Subject2 not found"}
        f1 = {f["name"]: f["type"] for f in _fields_of(x1)}
        f2 = {f["name"]: f["type"] for f in _fields_of(x2)}
        return 200, {"subject1": s1, "subject2": s2,
                     "shared": sorted(set(f1) & set(f2)),
                     "only_in_sub1": sorted(set(f1) - set(f2)),
                     "only_in_sub2": sorted(set(f2) - set(f1))}
    if verb == "GET" and parts == ["statistics"]:
        _, names = sim.list_subjects()
        type_counts: dict[str, int] = {}
        total = 0
        for s, x in live_latest_rows():
            total += len(sim._live(s))
            t = x["type"] or "AVRO"
            type_counts[t] = type_counts.get(t, 0) + 1
        return 200, {"subject_count": len(names),
                     "version_count": total,
                     "type_counts": type_counts}
    if verb == "GET" and parts == ["statistics", "patterns"]:
        _, names = sim.list_subjects()
        counts: dict[str, int] = {}
        for _, x in live_latest_rows():
            for f in _fields_of(x):
                k = normalize_field_name(f["name"])
                counts[k] = counts.get(k, 0) + 1
        common = [{"field": k, "count": c}
                  for k, c in sorted(counts.items()) if c >= 2]
        return 200, {"subject_count": len(names),
                     "common_fields": common,
                     "pattern_count": len(common)}
    if verb == "GET" and len(parts) == 3 \
            and parts[:2] == ["statistics", "fields"]:
        field = parts[2]
        variants = {normalize_field_name(v)
                    for v in naming_variants(field)}
        usages = []
        type_counts: dict[str, int] = {}
        for s, x in live_latest_rows():
            for f in _fields_of(x):
                if normalize_field_name(f["name"]) in variants:
                    usages.append({"subject": s,
                                   "field_name": f["name"],
                                   "field_type": f["type"]})
                    type_counts[f["type"]] = \
                        type_counts.get(f["type"], 0) + 1
        return 200, {"field": field,
                     "consistent": len(type_counts) <= 1,
                     "type_counts": type_counts, "usages": usages}
    if verb == "POST" and len(parts) == 3 and parts[0] == "subjects" \
            and parts[2] in ("diff", "migrate", "evolve"):
        subject = sim.resolve_alias(parts[1])
        if parts[2] == "diff":
            v1 = payload.get("version1") or 1
            a = next((x for x in sim._live(subject)
                      if x["version"] == v1), None)
            if a is None:
                return 404, {"error_code": 40402,
                             "message": f"Version {v1} not found"}
            v2 = payload.get("version2") or 0
            if v2 == 0:
                b = _latest(sim, subject)
                if b is None:
                    return 404, {"error_code": 40401,
                                 "message": "Subject not found"}
                v2 = b["version"]
            else:
                b = next((x for x in sim._live(subject)
                          if x["version"] == v2), None)
                if b is None:
                    return 404, {"error_code": 40402,
                                 "message": f"Version {v2} not found"}
            fa = {f["name"]: f["type"] for f in _fields_of(a)}
            fb = {f["name"]: f["type"] for f in _fields_of(b)}
            added = [{"field": k, "type": fb[k]}
                     for k in sorted(set(fb) - set(fa))]
            removed = [{"field": k, "type": fa[k]}
                       for k in sorted(set(fa) - set(fb))]
            changed = [{"field": k, "old_type": fa[k],
                        "new_type": fb[k]}
                       for k in sorted(set(fa) & set(fb))
                       if fa[k] != fb[k]]
            return 200, {"subject": subject, "version1": v1,
                         "version2": v2, "added": added or None,
                         "removed": removed or None,
                         "changed": changed or None}
        latest = _latest(sim, subject)
        if latest is None:
            return 404, {"error_code": 40401,
                         "message": "Subject not found"}
        level = sim._resolved_level(subject)
        if parts[2] == "evolve":
            return 200, {"subject": subject,
                         "current_version": latest["version"],
                         "compatibility_level": level,
                         "changes_requested":
                             len(payload.get("changes") or []),
                         "message": "Schema evolution suggestions are "
                                    "available via the MCP tool "
                                    "suggest_schema_evolution for "
                                    "richer analysis"}
        target = payload.get("target_schema") or ""
        if not target:
            return bad("target_schema is required")
        st = (payload.get("schema_type") or latest["type"]
              or "AVRO").upper()
        src = {f["name"]: f["type"] for f in _fields_of(latest)}
        tgt = {f["name"]: f["type"]
               for f in _fields_of({"text": target, "type": st})}
        steps = [f"Add field '{k}' (type: {tgt[k]}) with a default "
                 "value" for k in tgt if k not in src]
        steps += [f"Remove field '{k}' (may require compatibility "
                  "level change)" for k in src if k not in tgt]
        if not steps:
            steps = ["No migration steps needed — schemas have the "
                     "same fields"]
        return 200, {"subject": subject,
                     "current_version": latest["version"],
                     "compatibility_level": level, "steps": steps,
                     "step_count": len(steps)}
    if verb == "GET" and len(parts) == 5 and parts[0] == "subjects" \
            and parts[2] == "versions" and parts[4] == "dependencies":
        subject = sim.resolve_alias(parts[1])
        try:
            v = int(parts[3])
        except ValueError:
            return 400, {"error_code": 42202,
                         "message": "Invalid version"}
        x = next((y for y in sim._live(subject)
                  if y["version"] == v), None)
        if x is None:
            return 404, {"error_code": 40403,
                         "message": "Schema not found"}
        ids = sim._referenced_by(subject, {v})
        refs = [{"subject": s2, "version": y["version"]}
                for s2 in sorted(sim.subjects)
                for y in sim._live(s2) if y["id"] in ids]
        return 200, {"subject": subject, "version": v,
                     "schema_id": x["id"], "referenced_by": refs}
    return None


def _dispatch_exporter(sim: RegistrySim, verb: str, parts, q, doc):
    """/exporters routes (server.go:365-374, exporter.go)."""
    try:
        payload = json.loads(doc) if doc else {}
    except json.JSONDecodeError:
        return 400, {"error_code": 42201, "message": "Invalid request body"}
    if parts == ["exporters"]:
        if verb == "GET":
            return 200, sorted(sim.exporters)
        if verb == "POST":
            return sim.exporter_create(payload)
        return None
    if len(parts) >= 2 and parts[0] == "exporters":
        name = parts[1]
        if len(parts) == 2:
            if verb == "GET":
                e = sim.exporters.get(name)
                if e is None:
                    return 404, {"error_code": 40450,
                                 "message": "Exporter not found: "
                                            + name}
                return 200, sim._exporter_body(e)
            if verb == "PUT":
                return sim.exporter_update(name, payload)
            if verb == "DELETE":
                if name not in sim.exporters:
                    return 404, {"error_code": 40450,
                                 "message": "Exporter not found: "
                                            + name}
                del sim.exporters[name]
                sim.exporter_status.pop(name, None)
                return 200, {"name": name}
            return None
        action = parts[2]
        if action == "pause" and verb == "PUT":
            return sim.exporter_state(name, state="PAUSED")
        if action == "resume" and verb == "PUT":
            return sim.exporter_state(name, state="RUNNING")
        if action == "reset" and verb == "PUT":
            return sim.exporter_state(name, reset=True)
        if action == "status" and verb == "GET":
            if name not in sim.exporters:
                return 404, {"error_code": 40450,
                             "message": "Exporter not found: " + name}
            st = sim.exporter_status.get(
                name, {"name": name, "state": "PAUSED", "offset": 0,
                       "trace": "", "ts": 0})
            out = {"name": st["name"], "state": st["state"]}
            for k in ("offset", "ts", "trace"):
                if st.get(k):
                    out[k] = st[k]
            return 200, out
        if action == "config":
            if name not in sim.exporters:
                return 404, {"error_code": 40450,
                             "message": "Exporter not found: " + name}
            if verb == "GET":
                return 200, sim.exporters[name].get("config") or {}
            if verb == "PUT":
                return sim.exporter_update(name, payload,
                                           config_only=True)
    return None


_ROLE_PERMS = {
    # rbac.go:59-100 (schema/config/mode/admin/encryption/exporter)
    "super_admin": {"schema:read", "schema:write", "schema:delete",
                    "config:read", "config:write", "mode:read",
                    "mode:write", "import", "admin:read", "admin:write",
                    "encryption:read", "encryption:write",
                    "exporter:read", "exporter:write", "me"},
    "admin": {"schema:read", "schema:write", "schema:delete",
              "config:read", "config:write", "mode:read", "mode:write",
              "import", "admin:read", "encryption:read",
              "encryption:write", "exporter:read", "exporter:write",
              "me"},
    "developer": {"schema:read", "schema:write", "config:read",
                  "mode:read", "encryption:read", "me"},
    "readonly": {"schema:read", "config:read", "mode:read",
                 "encryption:read", "exporter:read", "me"},
}


def _route_perm(verb: str, parts: list) -> str | None:
    """Required permission per route class (rbac.go:190-235)."""
    if not parts:
        return None
    head = parts[0]
    if head in ("health", "docs", "openapi.yaml"):
        return None
    if head == "admin":
        return "admin:read" if verb == "GET" else "admin:write"
    if head == "me":
        return "me"
    if head in ("config",):
        return "config:read" if verb == "GET" else "config:write"
    if head in ("mode",):
        return "mode:read" if verb == "GET" else "mode:write"
    if head == "dek-registry":
        return "encryption:read" if verb == "GET" else "encryption:write"
    if head == "exporters":
        return "exporter:read" if verb == "GET" else "exporter:write"
    if head == "import":
        return "import"
    if verb == "GET":
        return "schema:read"
    if verb == "DELETE":
        return "schema:delete"
    if head == "subjects" and len(parts) == 2 and verb == "POST":
        return "schema:read"  # lookup is a read
    return "schema:write"


def _auth_gate(sim: RegistrySim, verb: str, parts: list):
    """401/403 enforcement: anonymous access is allowed everywhere
    except /admin and /me (matching the no-auth test server), but once
    a scenario authenticates, role permissions apply to every route."""
    actor = sim.actor
    protected = bool(parts) and parts[0] in ("admin", "me")
    public = bool(parts) and parts[0] in ("health", "metrics")
    if not parts or public:
        return None  # health/metrics stay public even with auth on
    if actor is None and not protected and not sim.auth_required:
        return None
    if actor is None or actor == "bad":
        return 401, {"error_code": 401,
                     "message": "Authentication required"}
    perm = _route_perm(verb, parts)
    if perm is None:
        return None
    if perm not in _ROLE_PERMS.get(actor["role"], set()):
        return 403, {"error_code": 403, "message": "Forbidden"}
    return None


def _user_body(u: dict) -> dict:
    out = {"id": u["id"], "username": u["username"]}
    if u.get("email"):
        out["email"] = u["email"]
    out.update({"role": u["role"], "enabled": u["enabled"],
                "created_at": "2026-01-01T00:00:00Z",
                "updated_at": "2026-01-01T00:00:00Z"})
    return out


def _key_body(k: dict, with_key: bool = False) -> dict:
    out = {"id": k["id"]}
    if with_key:
        out["key"] = k["key"]
    out.update({"key_prefix": k["key"][:8], "name": k["name"],
                "role": k["role"], "user_id": k["user_id"],
                "username": k["username"], "enabled": k["enabled"],
                "created_at": "2026-01-01T00:00:00Z",
                "expires_at": "2027-01-01T00:00:00Z"})
    return out


_VALID_ROLES = ("super_admin", "admin", "developer", "readonly")


def _dispatch_admin(sim: RegistrySim, verb: str, parts, doc):
    """/admin + /me routes (handlers/admin.go, account.go)."""
    try:
        payload = json.loads(doc) if doc else {}
    except json.JSONDecodeError:
        return 400, {"error_code": 42201, "message": "Invalid request "
                                                     "body"}
    if parts and parts[0] == "me":
        me = sim.actor
        u = next((x for x in sim.users.values()
                  if x["username"] == me["username"]), None)
        if u is None:
            return 404, {"error_code": 40421,
                         "message": "User not found"}
        if len(parts) == 1 and verb == "GET":
            return 200, _user_body(u)
        if parts[1:] == ["password"] and verb == "POST":
            if not payload.get("old_password"):
                return 400, {"error_code": 42201,
                             "message": "Old password is required"}
            if not payload.get("new_password"):
                return 400, {"error_code": 42208,
                             "message": "New password is required"}
            if payload["old_password"] != u["password"]:
                return 403, {"error_code": 403,
                             "message": "Current password is incorrect"}
            u["password"] = payload["new_password"]
            return 204, None
        return None
    rest = parts[1:]
    if rest and rest[0] == "users":
        if len(rest) == 1 and verb == "GET":
            return 200, {"users": [_user_body(u) for _, u in
                                   sorted(sim.users.items())]}
        if len(rest) == 1 and verb == "POST":
            if not payload.get("username"):
                return 400, {"error_code": 42201,
                             "message": "Username is required"}
            if not payload.get("password"):
                return 400, {"error_code": 42208,
                             "message": "Password is required"}
            role = payload.get("role") or ""
            if not role:
                return 400, {"error_code": 42209,
                             "message": "Role is required"}
            if role not in _VALID_ROLES:
                return 400, {"error_code": 42209,
                             "message": f"invalid role: {role}"}
            if any(u["username"] == payload["username"]
                   for u in sim.users.values()):
                return 409, {"error_code": 40922,
                             "message": "User already exists"}
            uid = sim.next_uid
            sim.next_uid += 1
            sim.users[uid] = {
                "id": uid, "username": payload["username"],
                "email": payload.get("email", ""), "role": role,
                "enabled": payload.get("enabled", True),
                "password": payload["password"]}
            return 201, _user_body(sim.users[uid])
        if len(rest) == 2:
            try:
                uid = int(rest[1])
            except ValueError:
                return 400, {"error_code": 42201,
                             "message": "Invalid user ID"}
            u = sim.users.get(uid)
            if u is None:
                return 404, {"error_code": 40421,
                             "message": "User not found"}
            if verb == "GET":
                return 200, _user_body(u)
            if verb == "PUT":
                role = payload.get("role")
                if role is not None and role not in _VALID_ROLES:
                    return 400, {"error_code": 42209,
                                 "message": f"invalid role: {role}"}
                for k in ("email", "role", "enabled", "password"):
                    if payload.get(k) is not None:
                        u[k] = payload[k]
                return 200, _user_body(u)
            if verb == "DELETE":
                del sim.users[uid]
                return 204, None
        return None
    if rest and rest[0] == "apikeys":
        if len(rest) == 1 and verb == "GET":
            return 200, {"apikeys": [_key_body(k) for _, k in
                                     sorted(sim.apikeys.items())]}
        if len(rest) == 1 and verb == "POST":
            if not payload.get("name"):
                return 400, {"error_code": 42201,
                             "message": "Name is required"}
            role = payload.get("role") or ""
            if not role:
                return 400, {"error_code": 42209,
                             "message": "Role is required"}
            if role not in _VALID_ROLES:
                return 400, {"error_code": 42209,
                             "message": f"invalid role: {role}"}
            if (payload.get("expires_in") or 0) <= 0:
                return 400, {"error_code": 42201,
                             "message": "expires_in is required and "
                                        "must be positive (duration in "
                                        "seconds)"}
            owner = sim.actor
            if any(k["name"] == payload["name"]
                   and k["username"] == owner["username"]
                   for k in sim.apikeys.values()):
                return 409, {"error_code": 40923,
                             "message": "API key name already exists "
                                        "for this user"}
            kid = sim.next_uid
            sim.next_uid += 1
            sim.apikeys[kid] = {
                "id": kid, "key": f"srk-{kid:08d}-secretmaterial",
                "name": payload["name"], "role": role,
                "user_id": owner.get("id", 0),
                "username": owner["username"], "enabled": True}
            return 201, _key_body(sim.apikeys[kid], with_key=True)
        if len(rest) >= 2:
            try:
                kid = int(rest[1])
            except ValueError:
                return 400, {"error_code": 42201,
                             "message": "Invalid API key ID"}
            k = sim.apikeys.get(kid)
            if k is None:
                return 404, {"error_code": 40423,
                             "message": "API key not found"}
            if len(rest) == 2:
                if verb == "GET":
                    return 200, _key_body(k)
                if verb == "PUT":
                    for f2 in ("name", "role", "enabled"):
                        if payload.get(f2) is not None:
                            k[f2] = payload[f2]
                    return 200, _key_body(k)
                if verb == "DELETE":
                    del sim.apikeys[kid]
                    return 204, None
            if rest[2] == "revoke" and verb == "POST":
                k["enabled"] = False
                return 200, _key_body(k)
            if rest[2] == "rotate" and verb == "POST":
                if (payload.get("expires_in") or 0) <= 0:
                    return 400, {"error_code": 42201,
                                 "message": "expires_in is required "
                                            "and must be positive "
                                            "(duration in seconds)"}
                k["enabled"] = False
                kid2 = sim.next_uid
                sim.next_uid += 1
                sim.apikeys[kid2] = {**k, "id": kid2, "enabled": True,
                                     "key": f"srk-{kid2:08d}-rotated"}
                return 200, {"new_key": _key_body(sim.apikeys[kid2],
                                                  with_key=True),
                             "revoked_id": kid}
        return None
    if rest == ["roles"] and verb == "GET":
        return 200, {"roles": [
            {"name": r, "description": r,
             "permissions": sorted(_ROLE_PERMS[r] - {"me"})}
            for r in _VALID_ROLES]}
    return None


def _dispatch_http(sim: RegistrySim, verb: str, url: str, doc):
    """HTTP dispatch + the audit middleware replica: snapshot the
    object state a handler would read, serve, then derive and log the
    audit event exactly as auth.AuditLogger.Middleware does
    (audit.go:640-760)."""
    path, _, query = url.partition("?")
    q = dict(kv.split("=", 1) for kv in query.split("&") if "=" in kv)
    pre = bdd_audit.snapshot(sim, verb, path, q)
    out = _dispatch_http_gated(sim, verb, url, doc)
    bdd_audit.record(sim, verb, url, doc, out[0], out[1], pre)
    return out


def _dispatch_http_gated(sim: RegistrySim, verb: str, url: str, doc):
    parts, _q = _parse_url(url)
    gate = _auth_gate(sim, verb, parts)
    if gate is not None:
        return gate
    if parts and parts[0] in ("admin", "me"):
        out = _dispatch_admin(sim, verb, parts, doc)
        if out is None:
            return _unknown_path(verb, url)
        return out
    out = _dispatch_http_inner(sim, verb, url, doc)
    if out is None:
        return _unknown_path(verb, url)
    return out


def _dispatch_http_inner(sim: RegistrySim, verb: str, url: str, doc):
    parts, q = _parse_url(url)
    if parts[:2] == ["dek-registry", "v1"]:
        return _dispatch_dek(sim, verb, parts[2:], q, doc)
    if parts and parts[0] == "exporters":
        return _dispatch_exporter(sim, verb, parts, q, doc)
    if parts == ["import", "schemas"] and verb == "POST":
        try:
            payload = json.loads(doc) if doc else {}
        except json.JSONDecodeError:
            return 400, {"error_code": 42201,
                         "message": "Invalid request body"}
        return sim.import_schemas(payload)
    out = _dispatch_analysis(sim, verb, parts, q, doc)
    if out is not None:
        return out
    # /contexts/{ctx}/rest... routes to the same handlers with subjects
    # rewritten to the :.ctx: qualified form
    if len(parts) >= 2 and parts[0] == "contexts" and parts[1] != "":
        ctx = parts[1] if parts[1].startswith(".") else "." + parts[1]
        if not RegistrySim.valid_ctx(ctx):
            return 422, {"error_code": 42210,
                         "message": "Invalid context name"}
        rest = parts[2:]
        if ctx == ".__GLOBAL" and rest and rest[0] in ("subjects",
                                                       "schemas"):
            return 400, {"error_code": 400,
                         "message": "__GLOBAL holds no subjects"}
        if verb == "GET" and rest == ["subjects"]:
            return sim.list_subjects(
                deleted=q.get("deleted") == "true", ctx=ctx)
        if rest and rest[0] == "schemas" and len(rest) >= 3 \
                and rest[1] == "ids":
            sid = int(rest[2])
            if len(rest) == 3:
                return sim.schema_by_id(sid, ctx)
            if len(rest) == 4 and rest[3] == "subjects":
                return sim.subjects_for_id(sid, ctx)
            if len(rest) == 4 and rest[3] == "versions":
                return sim.versions_for_id(sid, ctx)
        if rest and rest[0] == "subjects" and len(rest) >= 2:
            rest = ["subjects", f":{ctx}:{rest[1]}"] + rest[2:]
        elif rest and rest[0] in ("config", "mode") and len(rest) >= 2:
            rest = [rest[0], f":{ctx}:{rest[1]}"] + rest[2:]
        elif rest and rest[0] == "compatibility" and len(rest) >= 3 \
                and rest[1] == "subjects":
            rest = ["compatibility", "subjects",
                    f":{ctx}:{rest[2]}"] + rest[3:]
        sep = "?" + url.partition("?")[2] if "?" in url else ""
        return _dispatch_http(sim, verb, "/" + "/".join(rest) + sep, doc)
    if verb == "GET" and parts == ["contexts"]:
        return sim.list_contexts()
    if verb == "GET" and parts == ["schemas", "types"]:
        return 200, ["AVRO", "JSON", "PROTOBUF"]
    if verb == "POST" and len(parts) >= 4 \
            and parts[0] == "compatibility" and parts[1] == "subjects" \
            and parts[3] == "versions":
        try:
            payload = json.loads(doc) if doc else {}
        except json.JSONDecodeError:
            return 422, {"error_code": 42201}
        subj = sim.resolve_alias(parts[2])
        stype = (payload.get("schemaType") or "AVRO").upper()
        cand = payload.get("schema", "")
        cand_refs = payload.get("references")
        live = sim._live(subj)
        verbose = q.get("verbose") == "true"
        if len(parts) == 4:
            # against ALL versions
            if not live:
                return 404, {"error_code": 40401}
            level = sim._resolved_level(subj)
            base = level.replace("_TRANSITIVE", "")
            lvl = base + "_TRANSITIVE" if base != "NONE" else "NONE"
            ok, msgs = sim.compat_ok(subj, cand, stype, lvl, live,
                                     cand_refs=cand_refs)
            out = {"is_compatible": ok}
            if verbose:
                out["messages"] = list(msgs or [])
            return 200, out
        ver = parts[4]
        if ver == "latest":
            if not live:
                return 404, {"error_code": 40401}
            target = max(live, key=lambda v: v["version"])
        else:
            try:
                nver = int(ver)
            except ValueError:
                return 422, {"error_code": 42202}
            if nver <= 0 or nver > MAX_VERSION:
                return 422, {"error_code": 42202}
            # specific-version checks report the VERSION-level 40402
            # even when the whole subject is missing
            # (error_codes_exhaustive:52)
            target = next((v for v in live if v["version"] == nver), None)
            if target is None:
                return 404, {"error_code": 40402}
        # single-version checks honor the configured level's base mode
        # (contexts_config_mode_advanced: ctx-tier NONE ⇒ compatible)
        base = sim._resolved_level(subj).replace("_TRANSITIVE", "")
        ok, msgs = sim.compat_ok(subj, cand, stype, base, [target],
                                 cand_refs=cand_refs)
        out = {"is_compatible": ok}
        if verbose:
            out["messages"] = list(msgs)
        return 200, out
    deleted = q.get("deleted") == "true"
    deleted_only = q.get("deletedOnly") == "true"
    permanent = q.get("permanent") == "true"
    dtg = q.get("defaultToGlobal") == "true"
    force = q.get("force") == "true"
    if verb in ("PUT", "POST"):
        try:
            payload = json.loads(doc) if doc else {}
        except json.JSONDecodeError:
            return 422, {"error_code": 42201}
        if parts == ["config"]:
            if not payload.get("compatibility"):
                # empty body returns the CURRENT config (edge_cases /
                # handlers.go:1040-1049)
                _, cur = sim.get_global_config()
                return 200, {"compatibility": cur["compatibilityLevel"]}
            return sim.set_global_config(payload.get("compatibility", ""),
                                         extra=payload)
        if len(parts) == 2 and parts[0] == "config":
            if not payload.get("compatibility"):
                return 200, {"compatibility":
                             sim._resolved_level(parts[1])}
            return sim.set_subject_config(
                parts[1], payload.get("compatibility", ""), extra=payload)
        if parts == ["mode"]:
            if not payload.get("mode"):
                # empty mode body is a tombstone write: reset to default
                # (handlers.go:1333-1349)
                sim.root_mode = None
                return 200, {"mode": "READWRITE"}
            return sim.set_global_mode(payload.get("mode", ""),
                                       force=force)
        if len(parts) == 2 and parts[0] == "mode":
            if not payload.get("mode"):
                sim.subj_modes.pop(parts[1], None)
                return 200, {"mode": sim.resolved_mode(parts[1])}
            return sim.set_subject_mode(parts[1], payload.get("mode", ""),
                                        force=force)
        if verb == "POST" and parts == ["subjects", "validate"]:
            return sim.validate_subject_name(payload)
        if verb == "POST" and parts == ["subjects", "match"]:
            return sim.match_subjects(payload)
        if verb == "POST" and len(parts) == 2 and parts[0] == "subjects":
            stype = payload.get("schemaType") or "AVRO"
            if stype not in ("AVRO", "JSON", "PROTOBUF"):
                # schemaType is case-sensitive: "avro" is rejected
                # (api_endpoints_advanced)
                return 422, {"error_code": 42201,
                             "message": f"Invalid schemaType {stype}"}
            return sim.lookup(parts[1], payload.get("schema", ""), stype,
                              deleted=deleted,
                              references=payload.get("references"))
        if verb == "POST" and len(parts) == 3 and parts[0] == "subjects" \
                and parts[2] == "versions":
            stype = payload.get("schemaType") or "AVRO"
            if stype not in ("AVRO", "JSON", "PROTOBUF"):
                return 422, {"error_code": 42201,
                             "message": f"Invalid schemaType {stype}"}
            text = payload.get("schema", "")
            if "id" in payload:
                return sim.register_import(
                    parts[1], text, stype, int(payload["id"]),
                    payload.get("version"),
                    references=payload.get("references"))
            return sim.register(parts[1], text, stype,
                                metadata=payload.get("metadata"),
                                rule_set=payload.get("ruleSet"),
                                references=payload.get("references"))
        return None
    if verb == "GET":
        if parts == ["config"]:
            return sim.get_global_config(default_to_global=dtg)
        if len(parts) == 2 and parts[0] == "config":
            return sim.get_subject_config(parts[1], default_to_global=dtg)
        if parts == ["mode"]:
            return sim.get_global_mode()
        if len(parts) == 2 and parts[0] == "mode":
            return sim.get_subject_mode(parts[1], default_to_global=dtg)
        if not parts:
            return 200, {}
        if parts == ["health"] or (len(parts) == 2
                                   and parts[0] == "health"):
            # /, /health/live, /health/ready, /health/startup all
            # report liveness (handlers.go:126-160)
            return 200, {"status": "UP"}
        if parts == ["docs"]:
            return 200, "<html>swagger-ui</html>"
        if parts == ["openapi.yaml"]:
            spec = os.path.join(FEATURES_DIR, "..", "..", "..", "api",
                                "openapi.yaml")
            spec = os.path.normpath(spec)
            if os.path.exists(spec):
                return 200, open(spec, encoding="utf-8").read()
            return 404, {"error_code": 404}
        if parts == ["v1", "metadata", "id"]:
            return 200, {"id": "default-cluster"}
        if parts == ["v1", "metadata", "version"]:
            return 200, {"version": "dev", "commit": "",
                         "build_time": ""}
        if parts == ["subjects", "count"]:
            return sim.count_subjects()
        if parts == ["subjects"]:
            if deleted_only:
                out = sim.list_subjects_deleted_only()
            else:
                out = sim.list_subjects(deleted=deleted)
            prefix = q.get("subjectPrefix")
            if prefix and isinstance(out[1], list):
                out = (out[0], [s for s in out[1]
                                if s.startswith(prefix)])
            return _paginate(out, q)
        if parts == ["schemas"]:
            # GET /schemas — flat version listing (handlers.go:1597-1641)
            prefix = q.get("subjectPrefix", "")
            latest_only = q.get("latestOnly") == "true"
            rows = []
            for s in sorted(sim.subjects):
                if sim.ctx_of(s) != "." or not s.startswith(prefix):
                    continue
                pool = sim.subjects[s] if deleted else sim._live(s)
                if latest_only and pool:
                    pool = [max(pool, key=lambda x: x["version"])]
                for x in sorted(pool, key=lambda x: x["version"]):
                    row = {"subject": s, "version": x["version"],
                           "id": x["id"],
                           "schemaType": x["type"] or "AVRO",
                           "schema": x["text"]}
                    if x.get("references"):
                        row["references"] = x["references"]
                    rows.append(row)
            return _paginate((200, rows), q)
        if len(parts) == 3 and parts[0] == "subjects" \
                and parts[2] == "metadata":
            return sim.subject_metadata(parts[1])
        if len(parts) == 3 and parts[0] == "subjects" \
                and parts[2] == "history":
            subj = sim.resolve_alias(parts[1])
            if subj not in sim.subjects:
                return 404, {"error_code": 40401,
                             "message": "Subject not found"}
            hist = [{"version": x["version"], "schema_id": x["id"],
                     "schema_type": x["type"] or "AVRO"}
                    for x in sorted(sim._live(subj),
                                    key=lambda x: x["version"])][:50]
            return 200, {"subject": subj, "count": len(hist),
                         "history": hist}
        if len(parts) == 3 and parts[0] == "subjects" \
                and parts[2] == "export":
            subj = sim.resolve_alias(parts[1])
            live = sim._live(subj)
            if not live:
                return 404, {"error_code": 40401,
                             "message": "Subject not found"}
            entries = [{"subject": subj, "version": x["version"],
                        "id": x["id"], "schema": x["text"],
                        "schema_type": x["type"] or "AVRO"}
                       for x in sorted(live,
                                       key=lambda x: x["version"])]
            return 200, {"subject": subj, "count": len(entries),
                         "versions": entries}
        if len(parts) == 5 and parts[0] == "subjects" \
                and parts[2] == "versions" and parts[4] == "export":
            subj = sim.resolve_alias(parts[1])
            try:
                nver = int(parts[3])
            except ValueError:
                # this endpoint 400s on a malformed version
                # (analysis.go:1031-1035), unlike the 422 elsewhere
                return 400, {"error_code": 42202,
                             "message": "Invalid version"}
            x = next((x for x in sim._live(subj)
                      if x["version"] == nver), None)
            if x is None:
                return 404, {"error_code": 40403,
                             "message": "Schema not found"}
            return 200, {"subject": subj, "version": nver, "id": x["id"],
                         "schema": x["text"],
                         "schema_type": x["type"] or "AVRO",
                         "compatibility_level":
                             sim._resolved_level(subj)}
        if len(parts) == 3 and parts[0] == "subjects" \
                and parts[2] == "versions":
            return _paginate(
                sim.list_versions(parts[1], deleted=deleted,
                                  deleted_only=deleted_only), q)
        if len(parts) == 4 and parts[0] == "subjects" \
                and parts[2] == "versions" and parts[3] == "count":
            return sim.count_versions(parts[1])
        if len(parts) in (4, 5) and parts[0] == "subjects" \
                and parts[2] == "versions":
            if parts[3] == "latest":
                v = "latest"
            else:
                try:
                    v = int(parts[3])
                except ValueError:
                    return 422, {"error_code": 42202}
            if len(parts) == 5 and parts[4] == "schema":
                return sim.raw_schema(parts[1], v)
            if len(parts) == 5 and parts[4] == "referencedby":
                # missing subject/version is a 404 here, not an empty
                # list (raw_schema_endpoints.feature)
                status, body = sim.get_version(parts[1], v)
                if status != 200:
                    return status, body
                return 200, sim._referenced_by(
                    sim.resolve_alias(parts[1]), {body["version"]})
            if len(parts) == 5:
                return None
            return sim.get_version(parts[1], v, deleted=deleted)
        if len(parts) in (3, 4) and parts[:2] == ["schemas", "ids"]:
            try:
                sid = int(parts[2])
            except ValueError:
                return 400, {"error_code": 42201,
                             "message": "Invalid schema ID"}
            subj = q.get("subject", "")
            ctx = RegistrySim.ctx_of(subj)
            if len(parts) == 3:
                return sim.schema_by_id(
                    sid, ctx, subject=subj or None,
                    fetch_max_id=q.get("fetchMaxId") == "true")
            if parts[3] == "schema":
                status, body = sim.schema_by_id(sid, ctx)
                if status != 200:
                    return status, body
                return 200, body["schema"]
            if parts[3] == "subjects":
                return _paginate(sim.subjects_for_id(
                    sid, ctx, deleted=deleted,
                    subject=subj or None), q)
            if parts[3] == "versions":
                return _paginate(sim.versions_for_id(
                    sid, ctx, deleted=deleted,
                    subject=subj or None), q)
        return None
    if verb == "DELETE":
        if parts == ["mode"]:
            return sim.delete_global_mode()
        if parts == ["config"]:
            return sim.delete_global_config()
        if len(parts) == 2 and parts[0] == "config":
            return sim.delete_subject_config(parts[1])
        if len(parts) == 2 and parts[0] == "mode":
            return sim.delete_subject_mode(parts[1])
        if len(parts) == 2 and parts[0] == "subjects":
            return sim.delete_subject(parts[1], permanent=permanent)
        if len(parts) == 4 and parts[0] == "subjects" \
                and parts[2] == "versions":
            if parts[3] == "latest":
                v = "latest"
            else:
                try:
                    v = int(parts[3])
                except ValueError:
                    return 422, {"error_code": 42202}
            return sim.delete_version(parts[1], v, permanent=permanent)
        return None
    return None


#: route pattern -> allowed verbs, for the chi MethodNotAllowed
#: handler (server.go:139, 485-496); everything else is the 404
_ROUTE_VERBS = [
    (re.compile(r"^/schemas/types$"), {"GET"}),
    (re.compile(r"^/schemas/ids/[^/]+(/.*)?$"), {"GET"}),
    (re.compile(r"^/schemas$"), {"GET"}),
    (re.compile(r"^/subjects$"), {"GET"}),
    (re.compile(r"^/subjects/[^/]+$"), {"GET", "POST", "DELETE"}),
    (re.compile(r"^/subjects/[^/]+/versions$"), {"GET", "POST"}),
    (re.compile(r"^/subjects/[^/]+/versions/[^/]+$"),
     {"GET", "DELETE"}),
    (re.compile(r"^/config(/[^/]+)?$"), {"GET", "PUT", "DELETE"}),
    (re.compile(r"^/mode(/[^/]+)?$"), {"GET", "PUT", "DELETE"}),
    (re.compile(r"^/contexts$"), {"GET"}),
]


def _unknown_path(verb: str, url: str):
    """The router's JSON 404 catch-all and 405 method guard
    (error_handling_exhaustive / method_not_allowed): every modeled
    endpoint returns earlier, so an unmatched URL is a LOUD mismatch
    rather than a silent skip."""
    path = url.partition("?")[0]
    for rx, verbs in _ROUTE_VERBS:
        if rx.match(path) and verb not in verbs:
            return 405, {"error_code": 405,
                         "message": "HTTP 405 Method Not Allowed"}
    return 404, {"error_code": 404, "message": "HTTP 404 Not Found"}
