"""Unit pins for bench.py's per-round min-draw flag ledger
(VERDICT r17 What's-wrong #4): three same-sitting r17 draws produced
three disjoint ⚠ sets on an unchanged repo because the gate read ONE
draw.  ``_round_min_ledger`` persists the per-query min across every
draw of the building round; the bests-table ⚠ evaluates that merged
min, so re-running bench within a sitting can only clear flags."""

from __future__ import annotations

import importlib.util
import json
import pathlib

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_spec = importlib.util.spec_from_file_location("bench", _ROOT / "bench.py")
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_ledger_merges_min_within_round(tmp_path):
    root = str(tmp_path)
    m1 = bench._round_min_ledger(root, 18, {"a": 1.0, "b": 2.0})
    assert m1 == {"a": 1.0, "b": 2.0}
    # second draw: slower a (kept at min), faster b (improves), new c
    m2 = bench._round_min_ledger(root, 18, {"a": 1.5, "b": 0.8, "c": 3.0})
    assert m2 == {"a": 1.0, "b": 0.8, "c": 3.0}
    rec = json.load(open(tmp_path / "BENCH_round_ledger.json"))
    assert rec == {"round": 18, "min": m2}


def test_ledger_resets_across_rounds(tmp_path):
    root = str(tmp_path)
    bench._round_min_ledger(root, 18, {"a": 0.1})
    m = bench._round_min_ledger(root, 19, {"a": 5.0})
    assert m == {"a": 5.0}, "a prior round's draws must not leak in"


def test_ledger_unknown_round_is_current_draw_only(tmp_path):
    root = str(tmp_path)
    bench._round_min_ledger(root, 18, {"a": 0.1})
    # cur_round None: cannot attribute the stored mins to this round
    m = bench._round_min_ledger(root, None, {"a": 5.0})
    assert m == {"a": 5.0}


def test_ledger_corrupt_file_falls_through(tmp_path):
    (tmp_path / "BENCH_round_ledger.json").write_text("{not json")
    m = bench._round_min_ledger(str(tmp_path), 18, {"a": 1.0})
    assert m == {"a": 1.0}


def test_bests_table_flags_on_round_min(tmp_path):
    """The ⚠ column must read the round-min normalized ratio: a slow
    current draw with a calm earlier draw in the ledger stays
    unflagged; a query slow in EVERY draw flags."""
    baseline = tmp_path / "BASELINE.md"
    baseline.write_text("# b\n")
    real_file = bench.__file__
    try:
        # point bench's root (dirname(abspath(__file__))) at tmp_path
        bench.__file__ = str(tmp_path / "bench.py")
        best = {"fast_earlier": (1.0, "r10"), "always_slow": (1.0, "r10")}
        timings = {"fast_earlier": 2.0, "always_slow": 2.0}
        round_min = {"fast_earlier": 1.0, "always_slow": 2.0}
        bench._update_bests_table(timings, best, gauge=1.0,
                                  round_min=round_min, gauge_min=1.0)
    finally:
        bench.__file__ = real_file
    text = baseline.read_text()
    rows = {ln.split("|")[1].strip(): ln
            for ln in text.splitlines() if ln.startswith("| ")}
    assert "⚠" not in rows["fast_earlier"], (
        "calm ledger draw must clear the flag for the sitting")
    assert "⚠" in rows["always_slow"]
