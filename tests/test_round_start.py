"""round_start.py chores — the bench-ledger settle step (r18, VERDICT
r17 #2): the driver's post-commit bench run leaves BASELINE.md /
BENCH_normalized.json / BENCH_round_ledger.json dirty; round-start
must pin (stage) or revert them, never leave them floating into
judging.  Exercised in a throwaway git repo."""

from __future__ import annotations

import importlib.util
import os
import pathlib
import subprocess


def _load_round_start(repo_dir: str):
    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "round_start", root / "scripts" / "round_start.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.REPO = repo_dir
    return mod


def _git(repo, *args):
    return subprocess.run(["git", *args], cwd=repo,
                          capture_output=True, text=True, check=True)


def _mkrepo(tmp_path):
    d = str(tmp_path / "repo")
    os.makedirs(d)
    _git(d, "init", "-q")
    _git(d, "config", "user.email", "t@t")
    _git(d, "config", "user.name", "t")
    with open(os.path.join(d, "BASELINE.md"), "w") as f:
        f.write("base\n")
    with open(os.path.join(d, "BENCH_normalized.json"), "w") as f:
        f.write("{}\n")
    _git(d, "add", "-A")
    _git(d, "commit", "-qm", "init")
    return d


def _status(repo):
    return _git(repo, "status", "--porcelain").stdout


def test_settle_pins_dirty_tracked_and_untracked(tmp_path):
    repo = _mkrepo(tmp_path)
    rs = _load_round_start(repo)
    with open(os.path.join(repo, "BASELINE.md"), "a") as f:
        f.write("driver draw\n")
    with open(os.path.join(repo, "BENCH_round_ledger.json"), "w") as f:
        f.write('{"round": 18}\n')
    rs.settle_bench_ledger(discard=False)
    st = _status(repo)
    # both staged (index column set), nothing left unstaged
    assert "M  BASELINE.md" in st
    assert "A  BENCH_round_ledger.json" in st
    assert "?? BENCH" not in st


def test_settle_discard_reverts_tracked_and_removes_untracked(
        tmp_path):
    repo = _mkrepo(tmp_path)
    rs = _load_round_start(repo)
    with open(os.path.join(repo, "BASELINE.md"), "a") as f:
        f.write("driver draw\n")
    with open(os.path.join(repo, "BENCH_round_ledger.json"), "w") as f:
        f.write('{"round": 18}\n')
    rs.settle_bench_ledger(discard=True)
    assert _status(repo) == ""
    assert open(os.path.join(repo, "BASELINE.md")).read() == "base\n"
    assert not os.path.exists(
        os.path.join(repo, "BENCH_round_ledger.json"))


def test_settle_clean_is_noop(tmp_path):
    repo = _mkrepo(tmp_path)
    rs = _load_round_start(repo)
    rs.settle_bench_ledger(discard=False)
    assert _status(repo) == ""
