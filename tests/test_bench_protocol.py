"""bench.py robustness protocol (round-5 redesign after two rc=124
driver-artifact losses): partial rows must always yield a valid
headline, torn tails must not crash, and the best candidate wins."""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_read_rows_tolerates_torn_tail(tmp_path):
    mod = _load()
    p = tmp_path / "partial.jsonl"
    p.write_text('{"mode": "a", "qps": 1.0}\n{"mode": "b", "q')  # torn
    rows = mod._read_rows(str(p))
    assert rows == [{"mode": "a", "qps": 1.0}]


def test_read_rows_missing_file(tmp_path):
    mod = _load()
    assert mod._read_rows(str(tmp_path / "nope.jsonl")) == []


def test_headline_picks_best_qps(capsys):
    mod = _load()
    rows = [
        {"mode": "exact", "qps": 100.0, "recall": 0.99, "corpus": 10,
         "dims": 4, "batch": 8, "ms_per_query": 0.08, "platform": "cpu"},
        {"mode": "int8", "qps": 150.0, "recall": 0.97, "corpus": 10,
         "dims": 4, "batch": 8, "ms_per_query": 0.05, "platform": "cpu"},
    ]
    mod._print_headline(rows)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "int8" and out["value"] == 150.0
    assert out["all_modes_qps"] == {"exact": 100.0, "int8": 150.0}
    assert out["vs_baseline"] == round(150.0 / mod.BASELINE_QPS, 2)


def test_emit_appends_row_and_prints_running_headline(tmp_path, capsys,
                                                      monkeypatch):
    """Each measured candidate lands in the partial file AND prints a
    best-so-far headline line — a driver-timeout kill mid-run still
    leaves a parseable last line on stdout (r3/r4 failure class)."""
    mod = _load()
    p = tmp_path / "emit.jsonl"
    monkeypatch.setenv("BENCH_EMIT_PATH", str(p))
    mod._CHILD_ROWS.clear()
    row = {"mode": "exact", "qps": 10.0, "recall": 1.0, "corpus": 10,
           "dims": 4, "batch": 8, "ms_per_query": 1.0, "platform": "cpu"}
    mod._emit(row)
    assert json.loads(p.read_text().strip()) == row
    line = json.loads(capsys.readouterr().out.strip())
    assert line["mode"] == "exact" and line["value"] == 10.0
