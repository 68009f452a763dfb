"""Unit pins for bench.py's per-round min-draw flag ledger
(VERDICT r17 What's-wrong #4): three same-sitting r17 draws produced
three disjoint ⚠ sets on an unchanged repo because the gate read ONE
draw.  ``_round_min_ledger`` persists, per query, the min across the
building round's draws of the raw seconds AND of each draw's own
normalized ratio; the bests-table ⚠ evaluates the merged ratio, so
re-running bench within a sitting can only clear flags.

The ratio ledger deliberately stores per-draw normalized ratios
rather than re-normalizing min timings by a composite min-gauge: the
composite is a best-case host no draw produced, deflates the
normalizer, and OVER-flags queries that only appeared on slow draws
(observed live on the second r18 draw — the flag set grew)."""

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
    s1, n1 = bench._round_min_ledger(root, 18, {"a": 1.0, "b": 2.0},
                                     {"a": 1.3, "b": 0.9})
    assert s1 == {"a": 1.0, "b": 2.0}
    assert n1 == {"a": 1.3, "b": 0.9}
    # second draw: slower a (kept at min), faster b, new c; a's ratio
    # improves on the calmer draw and the merged ratio takes the min
    s2, n2 = bench._round_min_ledger(root, 18,
                                     {"a": 1.5, "b": 0.8, "c": 3.0},
                                     {"a": 1.05, "b": 1.2, "c": 0.7})
    assert s2 == {"a": 1.0, "b": 0.8, "c": 3.0}
    assert n2 == {"a": 1.05, "b": 0.9, "c": 0.7}
    rec = json.load(open(tmp_path / "BENCH_round_ledger.json"))
    assert rec == {"round": 18, "min": s2, "norm_min": n2}


def test_ledger_resets_across_rounds(tmp_path):
    root = str(tmp_path)
    bench._round_min_ledger(root, 18, {"a": 0.1}, {"a": 0.5})
    s, n = bench._round_min_ledger(root, 19, {"a": 5.0}, {"a": 2.0})
    assert s == {"a": 5.0} and n == {"a": 2.0}, (
        "a prior round's draws must not leak in")


def test_ledger_unknown_round_is_current_draw_only(tmp_path):
    root = str(tmp_path)
    bench._round_min_ledger(root, 18, {"a": 0.1}, {"a": 0.5})
    # cur_round None: cannot attribute the stored mins to this round
    s, n = bench._round_min_ledger(root, None, {"a": 5.0}, {"a": 2.0})
    assert s == {"a": 5.0} and n == {"a": 2.0}


def test_ledger_corrupt_file_falls_through(tmp_path):
    (tmp_path / "BENCH_round_ledger.json").write_text("{not json")
    s, n = bench._round_min_ledger(str(tmp_path), 18, {"a": 1.0},
                                   {"a": 1.0})
    assert s == {"a": 1.0} and n == {"a": 1.0}


def test_bests_table_flags_on_round_min_ratio(tmp_path):
    """The ⚠ column must read the merged per-draw normalized ratio: a
    query whose ratio cleared on ANY draw of the sitting stays
    unflagged even when the current draw is slow; a query slow in
    every draw flags."""
    baseline = tmp_path / "BASELINE.md"
    baseline.write_text("# b\n")
    real_file = bench.__file__
    try:
        # point bench's root (dirname(abspath(__file__))) at tmp_path
        bench.__file__ = str(tmp_path / "bench.py")
        best = {"fast_earlier": (1.0, "r10"), "always_slow": (1.0, "r10")}
        timings = {"fast_earlier": 2.0, "always_slow": 2.0}
        round_min = {"fast_earlier": 1.0, "always_slow": 2.0}
        norm_min = {"fast_earlier": 1.0, "always_slow": 2.0}
        bench._update_bests_table(timings, best, gauge=1.0,
                                  round_min=round_min,
                                  round_norm_min=norm_min)
    finally:
        bench.__file__ = real_file
    text = baseline.read_text()
    rows = {ln.split("|")[1].strip(): ln
            for ln in text.splitlines() if ln.startswith("| ")}
    assert "⚠" not in rows["fast_earlier"], (
        "calm ledger draw must clear the flag for the sitting")
    assert "⚠" in rows["always_slow"]
