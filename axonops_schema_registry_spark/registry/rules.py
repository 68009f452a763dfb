"""Data-contract ruleSet structural validation.

The reference stores migration/domain/encoding rules per schema and
validates them STRUCTURALLY at write time — rule name presence, kinds,
category-scoped modes, and onSuccess/onFailure actions — without
evaluating the CEL expression (/root/reference/internal/rules/
validator.go:51-99; rule model /root/reference/internal/storage/
storage.go:76-96).  Same contract here: ``validate_ruleset`` returns
issue strings, empty = structurally valid.  The reference deliberately
does NOT require name uniqueness or a CONDITION expr (confirmed against
ruleset_validation.feature), so neither do we.
"""

from __future__ import annotations

import json

RULE_KINDS = {"CONDITION", "TRANSFORM"}
#: phase → modes allowed there (migration rules move between versions,
#: domain/encoding rules run on the read/write path) — validator.go:17-25
PHASE_MODES = {
    "migrationRules": {"UPGRADE", "DOWNGRADE", "UPDOWN"},
    "domainRules": {"WRITE", "READ", "WRITEREAD"},
    "encodingRules": {"WRITE", "READ", "WRITEREAD"},
}
RULE_MODES = set().union(*PHASE_MODES.values())
#: onSuccess/onFailure actions; comma-separated pairs are allowed for
#: dual-mode (WRITEREAD/UPDOWN) rules — validator.go:29-47
RULE_ACTIONS = {"", "NONE", "DLQ", "ERROR"}


def _valid_action(action: str) -> bool:
    if action in RULE_ACTIONS:
        return True
    return all(p.strip() in RULE_ACTIONS for p in action.split(","))


def validate_ruleset(ruleset_json: str) -> list[str]:
    try:
        rs = json.loads(ruleset_json)
    except Exception as exc:
        return [f"ruleset is not valid JSON: {exc}"]
    return validate_ruleset_obj(rs)


def validate_ruleset_obj(rs) -> list[str]:
    """Validate an already-parsed ruleSet object (dict or None)."""
    if rs is None:
        return []
    if not isinstance(rs, dict):
        return ["ruleset must be an object"]
    issues: list[str] = []
    for phase, allowed_modes in PHASE_MODES.items():
        rules = rs.get(phase, []) or []
        if not isinstance(rules, list):
            issues.append(f"{phase}: must be an array")
            continue
        for i, rule in enumerate(rules):
            at = f"{phase}[{i}]"
            if not isinstance(rule, dict):
                issues.append(f"{at}: rule must be an object")
                continue
            name = str(rule.get("name") or "")
            if not name.strip():
                issues.append(f"{at}: name is required")
            kind = rule.get("kind", "")
            if kind not in RULE_KINDS:
                issues.append(f"{at}: kind must be CONDITION or "
                              f"TRANSFORM, got '{kind}'")
            mode = rule.get("mode", "")
            if mode not in allowed_modes:
                issues.append(f"{at}: invalid mode '{mode}' for {phase}")
            for field in ("onSuccess", "onFailure"):
                action = str(rule.get(field) or "")
                if not _valid_action(action):
                    issues.append(
                        f"{at}: {field} must be NONE, DLQ, or ERROR "
                        f"(comma-separated for dual-mode), got '{action}'")
    return issues
