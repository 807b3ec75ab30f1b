"""bench.py operating-point tuning file (bench_tuning.json).

The measurement queues write ``bench_tuning.json`` next to ``bench.py``
ONLY after a measured on-chip win (scripts/r3_salvage_queue.sh); the
driver's bare ``python bench.py`` at round end then records the
measured-best operating point without a source edit.  These tests pin the
contract: file values are *defaults* (explicit env wins), only string
``SBA_BENCH_*`` keys apply, and a missing/malformed file is a no-op.

No reference counterpart: the reference has no benchmark harness
(BASELINE.md — its pipeline publishes no throughput numbers).
"""

import importlib.util
import json
import os
import shutil
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench_copy(tmp_path, monkeypatch):
    """Import a copy of bench.py from tmp_path so the test's tuning file
    cannot touch (or be shadowed by) a real repo-root bench_tuning.json."""
    shutil.copy(os.path.join(REPO, "bench.py"), tmp_path / "bench.py")
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", tmp_path / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod, tmp_path
    sys.modules.pop("bench_under_test", None)


def test_tuning_defaults_applied_env_wins(bench_copy, monkeypatch):
    mod, d = bench_copy
    (d / "bench_tuning.json").write_text(json.dumps({
        "SBA_BENCH_BATCH": "192",
        "SBA_BENCH_REMAT_ENC_MODE": "blocks",
        "NOT_A_BENCH_KEY": "x",     # ignored: wrong prefix
        "SBA_BENCH_BAD": 3,         # ignored: non-string value
    }))
    monkeypatch.setenv("SBA_BENCH_BATCH", "64")  # explicit env wins
    monkeypatch.delenv("SBA_BENCH_REMAT_ENC_MODE", raising=False)
    monkeypatch.delenv("NOT_A_BENCH_KEY", raising=False)
    monkeypatch.delenv("SBA_BENCH_BAD", raising=False)
    mod._apply_tuning()
    assert os.environ["SBA_BENCH_BATCH"] == "64"
    assert os.environ["SBA_BENCH_REMAT_ENC_MODE"] == "blocks"
    assert "NOT_A_BENCH_KEY" not in os.environ
    assert "SBA_BENCH_BAD" not in os.environ


@pytest.mark.parametrize("content", [None, "{broken", '["a", "b"]'])
def test_tuning_missing_or_malformed_is_noop(bench_copy, monkeypatch,
                                             content):
    mod, d = bench_copy
    if content is not None:
        (d / "bench_tuning.json").write_text(content)
    monkeypatch.delenv("SBA_BENCH_REMAT_ENC_MODE", raising=False)
    before = dict(os.environ)
    mod._apply_tuning()
    assert dict(os.environ) == before


def test_last_tpu_roundtrip_and_fallback_line(bench_copy, monkeypatch,
                                              capsys):
    """The un-losable artifact contract (VERDICT r3 next-#1): every
    successful TPU bench writes logs/last_tpu_bench.json, and the fallback
    line (printed on driver SIGTERM or dead-tunnel CPU smoke) carries that
    figure with its timestamp instead of recording nothing."""
    mod, d = bench_copy
    mod._write_last_tpu(512.25)
    last = mod._read_last_tpu()
    assert last["value"] == 512.25 and "iso_ts" in last
    mod._emit_fallback_line("test reason")
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["metric"] == "gan_train_step_images_per_sec_tpu_last_measured"
    assert rec["value"] == 512.25
    assert "test reason" in rec["note"]


def test_last_tpu_missing_file_placeholder(bench_copy, capsys):
    mod, d = bench_copy
    assert mod._read_last_tpu() is None
    mod._emit_fallback_line("no file")
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 0.0 and rec["vs_baseline"] is None


def test_last_json_line_parser(bench_copy):
    mod, _ = bench_copy
    text = 'BENCH_BACKEND_UP tpu\nnoise {bad\n{"a": 1}\ntrailer'
    assert mod._last_json_line(text) == '{"a": 1}'
    assert mod._last_json_line("no json here") is None
