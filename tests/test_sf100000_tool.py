"""The 10^5 ladder tool (tools/bench_sf100000_store.py) at toy scale:
fold gen→append→delete, state survival under the locked updater, and
crash-resume semantics (band_done skips the non-idempotent band step).
"""

# multi-minute store/ladder/soak tier: deselected from the default
# gate (pytest.ini addopts) so the driver's suite run completes;
# run with `pytest -m slow` (the builder's sessions do).
pytestmark = __import__("pytest").mark.slow

import importlib.util
import json
import sys
import threading
from pathlib import Path

import pytest


@pytest.fixture()
def tool(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "b100k_under_test",
        Path(__file__).resolve().parents[1]
        / "tools"
        / "bench_sf100000_store.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["b100k_under_test"] = mod
    spec.loader.exec_module(mod)
    mod.ARTIFACT = tmp_path / "state.json"
    mod.STORE_ROOT = tmp_path / "stores"
    mod.BAND_PATH = mod.STORE_ROOT / "band"
    mod.SRP_PATH = mod.STORE_ROOT / "srp"
    mod.SCALE_PER_FOLD = 4
    mod.FOLDS = 2
    mod.TARGET_VECS = 2 * 4 * 2000  # 2 folds x 4 replicas x base vecs
    monkeypatch.setattr(
        mod, "_fold_dir", lambda i: tmp_path / f"fold{i}"
    )
    return mod


def test_update_is_merge_not_clobber(tool):
    """Two writers that each load-then-save must interleave, not
    clobber — the measured failure: fold 1's gen wall vanished when a
    concurrently-running append saved a stale whole-file state."""
    tool._update_fold(0, {"gen_s": 1.0})
    # simulate the concurrent writer pattern: many threads each
    # updating a different fold through the locked path
    def write(i):
        tool._update_fold(i, {"gen_s": float(i)})

    threads = [threading.Thread(target=write, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    state = json.load(tool.ARTIFACT.open())
    assert set(state["folds"]) == {str(i) for i in range(8)}


def test_fold_ladder_and_band_done_resume(tool, spark):
    """gen 0 -> append 0 (build) -> gen 1 -> append 1 (append), fold
    dirs deleted after consumption; then a simulated crash after the
    band step of a fold: re-running append skips the band step
    (band_done) instead of double-appending."""
    import os

    tool.cmd_gen(0)
    assert (tool._fold_dir(0) / "documents.parquet").exists()
    tool.cmd_append(0)
    state = json.load(tool.ARTIFACT.open())
    f0 = state["folds"]["0"]
    assert f0["band_mode"] == "build" and f0["srp_mode"] == "build"
    assert f0["append_done"] and not tool._fold_dir(0).exists()

    tool.cmd_gen(1)
    tool.cmd_append(1)
    state = json.load(tool.ARTIFACT.open())
    f1 = state["folds"]["1"]
    assert f1["band_mode"] == "append" and f1["srp_mode"] == "append"
    # both folds' records coexist (no clobber across steps)
    assert state["folds"]["0"]["append_done"]
    # store grew across the append
    assert f1["band_store_bytes"] > f0["band_store_bytes"]

    # crash-resume: mark fold 2 as band_done with its docs deleted —
    # the resumed append must NOT try to read documents.parquet
    tool.cmd_gen(0)  # regenerate a fold dir to play fold 2
    fd = tool._fold_dir(0)
    import shutil

    shutil.rmtree(fd / "documents.parquet")
    tool._update_fold(0, {"band_done": True, "append_done": False})
    # remove append_done so the step runs
    tool._update(lambda s: s["folds"]["0"].pop("append_done"))
    tool.cmd_append(0)  # must succeed: srp step only
    state = json.load(tool.ARTIFACT.open())
    assert state["folds"]["0"]["append_done"]
    assert not fd.exists()
    # band store untouched by the resumed run (no double-append):
    # its bytes still match what fold 1 recorded
    assert tool._du(tool.BAND_PATH) == f1["band_store_bytes"]
    assert os.path.exists(tool.SRP_PATH)
