"""Content-level parity with the reference's MCP tool-call BDD suite.

``bdd_mcp_parity`` dispatches every tool call to the same RegistrySim /
production helpers the REST parity suite exercises, formatting results
exactly like the Go MCP server (compact JSON / textResult / ``error:``
texts), so the features' substring and field assertions check real
response content across 29 MCP feature files — schema CRUD, config/mode,
DEK/KEK lifecycle, exporters, comparison/validation/intelligence tools,
and the modeling/workflow end-to-end scenarios.
"""

from __future__ import annotations

import os

import pytest

from bdd_mcp_parity import MCP_DIR, replay

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MCP_DIR),
    reason="reference MCP BDD features not available")


def test_mcp_parity():
    n, mismatches, skipped = replay()
    assert n >= 1150, f"only {n} assertions replayed"
    lines = [f"{m.feature} | {m.scenario} | {m.step} | "
             f"want {m.expected} got {m.got}" for m in mismatches]
    assert not mismatches, "MCP mismatches:\n" + "\n".join(lines)


def test_mcp_skip_budget():
    _, _, skipped = replay()
    # the only unmodelable steps: create_user (auth store) and MCP
    # resource reads (server-side resource templates)
    assert len(skipped) <= 2, skipped
