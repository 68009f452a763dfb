"""Data-contract ruleSet structural validation.

The reference stores migration/domain/encoding rules per schema and
validates them STRUCTURALLY at write time — kinds, modes, phase
consistency, name uniqueness, expr presence — without evaluating the CEL
expression (/root/reference/internal/rules/validator.go:49-99; rule model
/root/reference/internal/storage/storage.go:76-96).  Same contract here:
``validate_ruleset`` returns issue strings, empty = structurally valid.
"""

from __future__ import annotations

import json

RULE_KINDS = {"CONDITION", "TRANSFORM"}
RULE_MODES = {"UPGRADE", "DOWNGRADE", "UPDOWN", "WRITE", "READ", "WRITEREAD"}
#: phase → modes allowed there (migration rules move between versions,
#: domain/encoding rules run on the read/write path)
PHASE_MODES = {
    "migrationRules": {"UPGRADE", "DOWNGRADE", "UPDOWN"},
    "domainRules": {"WRITE", "READ", "WRITEREAD"},
    "encodingRules": {"WRITE", "READ", "WRITEREAD"},
}


def validate_ruleset(ruleset_json: str) -> list[str]:
    try:
        rs = json.loads(ruleset_json)
    except Exception as exc:
        return [f"ruleset is not valid JSON: {exc}"]
    if rs is None:
        return []
    if not isinstance(rs, dict):
        return ["ruleset must be an object"]
    issues: list[str] = []
    seen_names: set[str] = set()
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
            name = rule.get("name", "")
            if not name:
                issues.append(f"{at}: rule name is required")
            elif name in seen_names:
                issues.append(f"{at}: duplicate rule name '{name}'")
            else:
                seen_names.add(name)
            kind = rule.get("kind", "")
            if kind not in RULE_KINDS:
                issues.append(f"{at}: invalid kind '{kind}'")
            mode = rule.get("mode", "")
            if mode not in RULE_MODES:
                issues.append(f"{at}: invalid mode '{mode}'")
            elif mode not in allowed_modes:
                issues.append(f"{at}: mode '{mode}' not allowed in {phase}")
            if kind == "CONDITION" and not rule.get("expr"):
                issues.append(f"{at}: CONDITION rule requires expr")
    return issues
