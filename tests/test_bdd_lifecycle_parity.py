"""Status-level parity with the reference's deletion/lifecycle BDD suite.

``bdd_lifecycle_parity.RegistrySim`` models the exact semantics our Spark
operators implement (registration dedup/gate/versioning, soft/permanent
delete taxonomy, content-addressed ids, visibility) using the REAL
validator / compat / fingerprint functions; the replay asserts every
HTTP status, error code, and field assertion from 31 reference feature
files — deletion taxonomy, config/mode resolution and write gating,
3-layer metadata/ruleSet merge, explicit-ID import, id stability.  This caught a real taxonomy bug on first run: version-level
permanent-delete-without-soft is 40407 (ErrorCodeVersionNotSoftDeleted),
not the subject-level 40405 del2 had pinned.
"""

from __future__ import annotations

import os

import pytest

from bdd_lifecycle_parity import FEATURES_DIR, replay

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FEATURES_DIR),
    reason="reference BDD features not available")


def test_lifecycle_parity():
    n, mismatches, skipped = replay()
    assert n >= 6300, f"only {n} assertions replayed"
    lines = [f"{m.feature} | {m.scenario} | {m.step} | "
             f"want {m.expected} got {m.got}" for m in mismatches]
    assert not mismatches, "lifecycle mismatches:\n" + "\n".join(lines)


def test_lifecycle_skip_budget():
    _, _, skipped = replay()
    # skips must stay confined to scenarios the sim cannot model:
    # goroutine concurrency steps, unknown-path 404 catch-alls, and the
    # exporter/import-endpoint audit scenarios
    assert len(skipped) <= 20, skipped
