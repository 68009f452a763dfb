"""Replay the reference's BDD compatibility scenarios through check_compatibility.

The reference ships Gherkin feature files (tests/bdd/features/*.feature)
whose compat scenarios have a fixed, machine-readable shape: seed a
subject's version history (``has schema:`` docstrings), set a level,
register/check a candidate, assert 200 (compatible) or 409
(incompatible).  This module parses exactly those steps and replays each
scenario against our checker — verdict-level parity with the reference's
own acceptance suite, far beyond the repo's hand-picked 49-case matrix.

Scenarios that need a live server (references, mode switching, config
mutation mid-scenario, error-code taxonomies 400/404/422) are skipped and
counted, so the report is honest about coverage.
"""

from __future__ import annotations

import dataclasses
import os
import re

FEATURES_DIR = "/root/reference/tests/bdd/features"

#: pure-compatibility feature files (server-behavior files like
#: compatibility_modes / config_exhaustive mutate global state per step)
PARITY_FEATURES = (
    "avro_compatibility_exhaustive.feature",
    "compatibility.feature",
    "compatibility_avro.feature",
    "compatibility_jsonschema.feature",
    "compatibility_jsonschema_combined_draft07.feature",
    "compatibility_jsonschema_combined_draft2020.feature",
    "compatibility_jsonschema_diff_draft07.feature",
    "compatibility_jsonschema_diff_draft2020.feature",
    "compatibility_protobuf.feature",
    "compatibility_protobuf_diff.feature",
    "compatibility_transitive.feature",
    "compatibility_transitive_chain.feature",
    "compatibility_all_versions.feature",
    "modeling_avro_compatibility.feature",
    "modeling_jsonschema_compatibility.feature",
    "modeling_protobuf_compatibility.feature",
    # register-path parsing acceptance: 200 (parses) vs 422 (invalid)
    "schema_parsing_exhaustive.feature",
    "modeling_negative_validation.feature",
)

_RE_GLOBAL = re.compile(r'the global compatibility level is "(\w+)"')
_RE_SUBJ_LEVEL = re.compile(r'subject "([^"]+)" has compatibility level "(\w+)"')
_RE_HAS = re.compile(r'subject "([^"]+)" has (?:"(\w+)" )?schema:')
_RE_REGISTER = re.compile(r'I register a (?:"(\w+)" )?schema under subject "([^"]+)":')
_RE_CHECK = re.compile(r'I check compatibility of (?:"(\w+)" )?schema against subject "([^"]+)":')
_RE_CHECK_ALL = re.compile(r'I check compatibility of schema against all versions of subject "([^"]+)":')
_RE_STATUS = re.compile(r'the response status should be (\d+)')
_RE_VERDICT = re.compile(r'the compatibility check should be (compatible|incompatible)')

#: steps that change semantics we do not replay → skip the scenario
_UNSUPPORTED = (
    "with reference", "with references", "I get the", "global mode",
)

_RE_SET_SUBJ_CFG = re.compile(r'I set the config for subject "([^"]+)" to "(\w+)"')
_RE_SET_GLOB_CFG = re.compile(r'I set the global config to "(\w+)"')
_RE_DEL_SUBJ_CFG = re.compile(r'I delete the config for subject "([^"]+)"')
#: inert steps (assertions about transport/audit artifacts)
_IGNORED = (
    "the audit log should contain", "schema registry is running",
    "should have exactly", "response should have error code",
    'response field', "the compatibility check should be",  # verdict handled
)

_TYPE = {"JSON": "JSON", "PROTOBUF": "PROTOBUF", "AVRO": "AVRO", None: "AVRO"}


@dataclasses.dataclass
class Expectation:
    feature: str
    scenario: str
    kind: str            # 'register' | 'check' | 'check_all'
    schema_type: str
    level: str
    history: tuple[str, ...]
    candidate: str
    expect: str          # 'compatible' | 'incompatible' | 'invalid'

    @property
    def expect_compatible(self) -> bool:
        return self.expect == "compatible"


@dataclasses.dataclass
class ParseReport:
    expectations: list[Expectation]
    skipped: list[tuple[str, str, str]]  # (feature, scenario, reason)


def _scenarios(text: str):
    """Yield (name, [(step_line, docstring|None), ...]) per scenario.
    ``Background:`` steps are prepended to every scenario, and
    ``Scenario Outline`` + ``Examples`` tables expand to one scenario
    per row with ``<var>`` placeholders substituted."""
    for name, steps in _scenarios_raw(text):
        table_idx = next((k for k, (line, _) in enumerate(steps)
                          if line.startswith("Examples:")), None)
        if table_idx is None:
            yield name, steps
            continue
        rows = [[c.strip() for c in line.strip("|").split("|")]
                for line, _ in steps[table_idx + 1:]
                if line.startswith("|")]
        if not rows:
            continue
        header, body = rows[0], rows[1:]
        for r, row in enumerate(body):
            binding = dict(zip(header, row))

            def sub(s: str) -> str:
                for k, v in binding.items():
                    s = s.replace(f"<{k}>", v)
                return s

            yield (f"{name} [{r}]",
                   [(sub(line), sub(doc) if doc else doc)
                    for line, doc in steps[:table_idx]])


def _scenarios_raw(text: str):
    lines = text.splitlines()
    i, cur, steps = 0, None, []
    background: list = []
    in_background = False
    in_examples = False
    while i < len(lines):
        line = lines[i].strip()
        if line.startswith("Background:"):
            in_background = True
            i += 1
            continue
        if line.startswith("Scenario:") or \
                line.startswith("Scenario Outline:"):
            in_background = False
            in_examples = False
            if cur is not None:
                yield cur, steps
            cur = line.split(":", 1)[1].strip()
            steps = list(background)
            i += 1
            continue
        if cur is not None and line.startswith("Examples:"):
            in_examples = True
            steps.append((line, None))
            i += 1
            continue
        if cur is not None and in_examples and line.startswith("|"):
            steps.append((line, None))
            i += 1
            continue
        if (cur is not None or in_background) \
                and re.match(r"^(Given|When|Then|And|But)\b", line):
            doc = None
            j = i + 1
            # docstring directly after the step
            while j < len(lines) and lines[j].strip() == "":
                j += 1
            if j < len(lines) and lines[j].strip().startswith('"""'):
                j += 1
                buf = []
                while j < len(lines) and not lines[j].strip().startswith('"""'):
                    buf.append(lines[j])
                    j += 1
                doc = "\n".join(buf).strip()
                i = j + 1
            elif j < len(lines) and lines[j].strip().startswith("|"):
                # a Gherkin data table belongs to the step (MCP tool
                # inputs, audit expectations) — keep the raw rows
                buf = []
                while j < len(lines) and lines[j].strip().startswith("|"):
                    buf.append(lines[j].strip())
                    j += 1
                doc = "\n".join(buf)
                i = j
            else:
                i += 1
            (background if in_background else steps).append((line, doc))
            continue
        i += 1
    if cur is not None:
        yield cur, steps


def parse_features(features=PARITY_FEATURES,
                   features_dir: str = FEATURES_DIR) -> ParseReport:
    out, skipped = [], []
    for fname in features:
        path = os.path.join(features_dir, fname)
        if not os.path.exists(path):
            skipped.append((fname, "<file>", "missing"))
            continue
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
        for name, steps in _scenarios(text):
            exp, reason = _replay_scenario(fname, name, steps)
            if reason is not None:
                skipped.append((fname, name, reason))
            out.extend(exp)
    return ParseReport(out, skipped)


def _replay_scenario(feature: str, scenario: str, steps):
    glob_level = "BACKWARD"
    levels: dict[str, str] = {}
    history: dict[str, list[str]] = {}
    types: dict[str, str] = {}
    pending = None  # (kind, subject, schema_type, candidate)
    exps: list[Expectation] = []
    for line, doc in steps:
        body = re.sub(r"^(Given|When|Then|And|But)\s+", "", line)
        if any(tok in body for tok in _UNSUPPORTED):
            return [], f"unsupported step: {body[:60]}"
        if m := _RE_GLOBAL.search(body):
            glob_level = m.group(1)
            continue
        if m := _RE_SET_SUBJ_CFG.search(body):
            levels[m.group(1)] = m.group(2)
            pending = None
            continue
        if m := _RE_SET_GLOB_CFG.search(body):
            glob_level = m.group(1)
            pending = None
            continue
        if m := _RE_DEL_SUBJ_CFG.search(body):
            levels.pop(m.group(1), None)
            pending = None
            continue
        if m := _RE_SUBJ_LEVEL.search(body):
            levels[m.group(1)] = m.group(2)
            continue
        if m := _RE_HAS.search(body):
            subj, styp = m.group(1), _TYPE.get(m.group(2), "AVRO")
            if doc is None:
                return [], "has-schema step without docstring"
            history.setdefault(subj, []).append(doc)
            types[subj] = styp
            continue
        if m := _RE_REGISTER.search(body):
            styp, subj = _TYPE.get(m.group(1), "AVRO"), m.group(2)
            if doc is None:
                return [], "register step without docstring"
            pending = ("register", subj, styp, doc)
            continue
        if m := _RE_CHECK_ALL.search(body):
            if doc is None:
                return [], "check step without docstring"
            pending = ("check_all", m.group(1), types.get(m.group(1), "AVRO"),
                       doc)
            continue
        if m := _RE_CHECK.search(body):
            styp, subj = _TYPE.get(m.group(1), "AVRO"), m.group(2)
            if doc is None:
                return [], "check step without docstring"
            pending = ("check", subj, styp or types.get(subj, "AVRO"), doc)
            continue
        if m := _RE_STATUS.search(body):
            status = int(m.group(1))
            if pending is None or pending[0] != "register":
                pending = None
                continue  # status assertion about a non-register call
            if status not in (200, 409, 422):
                return [], f"non-compat status {status}"
            kind, subj, styp, cand = pending
            expect = {200: "compatible", 409: "incompatible",
                      422: "invalid"}[status]
            exps.append(Expectation(
                feature, scenario, kind, styp,
                levels.get(subj, glob_level),
                tuple(history.get(subj, [])), cand, expect))
            if status == 200:
                history.setdefault(subj, []).append(cand)
            pending = None
            continue
        if m := _RE_VERDICT.search(body):
            if pending is None or pending[0] not in ("check", "check_all"):
                return [], "verdict assertion without pending check"
            kind, subj, styp, cand = pending
            level = levels.get(subj, glob_level)
            if kind == "check_all":
                if not level.endswith("_TRANSITIVE") and level != "NONE":
                    level = f"{level}_TRANSITIVE"
            elif kind == "check":
                # the plain check endpoint verifies against LATEST only;
                # _TRANSITIVE widens registration and /versions/all
                level = level.replace("_TRANSITIVE", "")
            exps.append(Expectation(
                feature, scenario, kind, styp, level,
                tuple(history.get(subj, [])), cand, m.group(1)))
            pending = None
            continue
        if any(tok in body for tok in _IGNORED):
            continue
        if body.startswith("|"):
            continue  # table rows of an ignored step
        return [], f"unrecognized step: {body[:60]}"
    return exps, None


def run_parity(report: ParseReport):
    """Returns (n_checked, mismatches) — mismatch = (expectation, got).

    Register verdicts are three-way, mirroring the server's order of
    checks: parse/validate first (422), then dedup-idempotence (200),
    then the compatibility gate (200/409)."""
    from axonops_schema_registry_spark.registry.compat import (
        check_compatibility,
    )
    from axonops_schema_registry_spark.registry.evolution import (
        validate_and_normalize,
    )

    mismatches = []
    for exp in report.expectations:
        if exp.kind == "register" and \
                not validate_and_normalize(
                    exp.candidate, exp.schema_type)["is_valid"]:
            got = "invalid"
        elif exp.kind == "register" and exp.candidate in exp.history:
            # the reference dedups BEFORE the gate: re-registering an
            # existing version is idempotent 200 even at an
            # incompatible level
            got = "compatible"
        else:
            ok, _ = check_compatibility(
                exp.candidate, list(exp.history), exp.level,
                exp.schema_type)
            got = "compatible" if ok else "incompatible"
        if got != exp.expect:
            mismatches.append((exp, got))
    return len(report.expectations), mismatches
