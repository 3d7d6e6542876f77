"""The consolidation pipeline must be lossless (round-3 verdict weak #1:
regenerating results from logs silently destroyed measured rows whose
source logs had rotated away)."""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "consolidate_r4", REPO / "benchmarks" / "consolidate_r4.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["consolidate_r4"] = mod
    spec.loader.exec_module(mod)
    mod.LOGS = tmp_path / "logs"
    mod.LOGS.mkdir()
    return mod


def test_merge_never_drops_rows(tmp_path, monkeypatch):
    mod = _load(tmp_path, monkeypatch)
    out = tmp_path / "results.json"
    key, fname, _ = mod.CAMPAIGNS[0]

    # first consolidation: one measured row
    (mod.LOGS / fname).write_text(
        json.dumps({"exp": "a", "qps": 100}) + "\n")
    mod.main(["--out", str(out)])
    got = json.loads(out.read_text())
    assert got["groups"][key]["rows"]["a"]["qps"] == 100

    # the source log rotates away; a NEW log appears with a different row.
    # Re-consolidating must keep row "a" (the r3 pipeline dropped it).
    (mod.LOGS / fname).write_text(
        json.dumps({"exp": "b", "qps": 200}) + "\n")
    mod.main(["--out", str(out)])
    got = json.loads(out.read_text())
    rows = got["groups"][key]["rows"]
    assert rows["a"]["qps"] == 100, "merge dropped a previously-measured row"
    assert rows["b"]["qps"] == 200

    # a re-measurement of "a" refreshes it in place
    (mod.LOGS / fname).write_text(
        json.dumps({"exp": "a", "qps": 150}) + "\n")
    mod.main(["--out", str(out)])
    rows = json.loads(out.read_text())["groups"][key]["rows"]
    assert rows["a"]["qps"] == 150 and rows["b"]["qps"] == 200


def test_rows_carry_source_provenance(tmp_path, monkeypatch):
    mod = _load(tmp_path, monkeypatch)
    out = tmp_path / "results.json"
    key, fname, _ = mod.CAMPAIGNS[0]
    (mod.LOGS / fname).write_text(
        json.dumps({"exp": "x", "qps": 1}) + "\n")
    mod.main(["--out", str(out)])
    row = json.loads(out.read_text())["groups"][key]["rows"]["x"]
    assert row["_src"].endswith(fname)


def test_garbage_lines_skipped(tmp_path, monkeypatch):
    mod = _load(tmp_path, monkeypatch)
    out = tmp_path / "results.json"
    key, fname, _ = mod.CAMPAIGNS[0]
    (mod.LOGS / fname).write_text(
        "WARNING: noise\n{broken json\n"
        + json.dumps({"exp": "ok", "v": 1}) + "\n"
        + json.dumps({"no_exp_key": True}) + "\n")
    mod.main(["--out", str(out)])
    rows = json.loads(out.read_text())["groups"][key]["rows"]
    assert list(rows) == ["ok"]


def _load_r5(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "consolidate_r5", REPO / "benchmarks" / "consolidate_r5.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["consolidate_r5"] = mod
    spec.loader.exec_module(mod)
    mod.LOGS = tmp_path / "logs"
    mod.LOGS.mkdir()
    return mod


def test_r5_variant_and_mode_rows_do_not_clobber(tmp_path):
    """Lab rows share one 'exp' but differ by 'variant'; bench.py
    per-candidate rows have only 'mode'. Each must land as its own
    experiment (the first r5 consolidation collapsed all lab variants
    into a single row)."""
    mod = _load_r5(tmp_path)
    out = tmp_path / "results.json"
    key, fname, _ = next(c for c in mod.CAMPAIGNS
                         if c[1] == "pq_quality_lab_cpu.log")
    (mod.LOGS / fname).write_text(
        '{"exp": "pq_lab", "variant": "a", "recall_rr0": 0.1}\n'
        '{"exp": "pq_lab", "variant": "b", "recall_rr0": 0.9}\n')
    bkey, bfname, _ = next(c for c in mod.CAMPAIGNS
                           if c[1] == "bench_prime_rows.jsonl")
    (mod.LOGS / bfname).write_text(
        '{"mode": "exact_bfloat16", "qps": 1.0}\n'
        '{"mode": "int8_2stage", "qps": 2.0}\n')
    mod.main(["--out", str(out)])
    got = json.loads(out.read_text())
    assert set(got["groups"][key]["rows"]) == {"pq_lab_a", "pq_lab_b"}
    assert set(got["groups"][bkey]["rows"]) == {
        "mode_exact_bfloat16", "mode_int8_2stage"}
