"""Verdict-level parity with the reference's own BDD compatibility suite.

Replays every server-free scenario from the reference's Gherkin features
(18 files, ~690 register/check expectations across AVRO / JSON /
PROTOBUF and all 7 levels) through the validator + ``check_compatibility``
and asserts the three-way verdict (200 ok / 409 incompatible / 422
invalid schema) matches the scenario's expected status / check result.
This is the round-5 VERDICT ask #8: parity beyond the repo's own
hand-picked matrix, against the reference's acceptance tests themselves.
"""

from __future__ import annotations

import os

import pytest

from bdd_parity import FEATURES_DIR, parse_features, run_parity

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FEATURES_DIR),
    reason="reference BDD features not available")


def test_bdd_compatibility_parity():
    report = parse_features()
    n, mismatches = run_parity(report)
    # the harness must actually be replaying a substantial suite — a
    # parser regression that silently skips everything would otherwise
    # pass vacuously
    assert n >= 680, f"only {n} expectations parsed"
    lines = [
        f"{exp.feature} | {exp.scenario} | {exp.schema_type} {exp.level} "
        f"expected {'compatible' if exp.expect_compatible else 'incompatible'}"
        for exp, _ in mismatches]
    assert not mismatches, "verdict mismatches:\n" + "\n".join(lines)


def test_bdd_parity_skip_budget():
    """Skips must stay confined to genuinely server-bound scenarios
    (references to live subjects, mode switching, REST-level POSTs)."""
    report = parse_features()
    assert len(report.skipped) <= 25, report.skipped
