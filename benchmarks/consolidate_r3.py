"""Fold the round-3 campaign files into benchmarks/results_r3_tpu.json.

Round 3's measurements accumulated in per-campaign jsonl files (one JSON
line per experiment; the LAST occurrence of an experiment name wins, so
re-runs supersede broken attempts):

  r3_serving.jsonl       HTTP serving: binary wire + continuous batching
  r3_api_overhead_f32.jsonl  layer-by-layer API overhead (f32 config)
  r3_api_overhead_bf16.jsonl same, bf16 serving config + upload probe
  r3_ivf_grouped.jsonl   grouped (cell-major) IVF on chip, 1M x 768
  r3_ivf_grouped_4m.jsonl    grouped IVF at 4M x 768 (HBM-bound regime)
  r3_graph_sweep.jsonl   graph ANN wider-expand/fewer-iters sweep
  r3_outofcore_20m.jsonl 20M x 768 memmap-backed steady-state scans

Usage: python benchmarks/consolidate_r3.py [--out PATH]
"""

import argparse
import json
from collections import OrderedDict
from pathlib import Path

HERE = Path(__file__).parent

CAMPAIGNS = [
    ("serving", "r3_serving.jsonl",
     "HTTP serving at 1M x 768 bf16: binary wire protocol (msgpack + raw "
     "f32) + continuous in-flight-aware batching (round-2 verdict #1)"),
    ("api_overhead_f32", "r3_api_overhead_f32.jsonl",
     "layer-by-layer API overhead, f32 config (kernel/store/arrays/api)"),
    ("api_overhead_bf16", "r3_api_overhead_bf16.jsonl",
     "layer-by-layer API overhead, bf16 serving config, with the raw "
     "query-upload probe attributing the gap to the transfer link "
     "(round-2 verdict #2)"),
    ("ivf_grouped_1m", "r3_ivf_grouped.jsonl",
     "grouped (cell-major) IVF dispatch at 1M x 768: stage decomposition "
     "+ pallas grid score kernel (ROADMAP #24)"),
    ("ivf_grouped_4m", "r3_ivf_grouped_4m.jsonl",
     "grouped IVF at 4M x 768 int8 cells — the HBM-bound regime where "
     "pruning beats the exact scan (round-2 verdict #3 via pruning)"),
    ("ivf_grouped_5m", "r3_ivf_grouped_5m.jsonl",
     "grouped IVF at 5M x 768 int8 cells vs the exact bf16 scan "
     "(round-2 config5 regime)"),
    ("ivfpq_grouped", "r3_ivfpq_grouped.jsonl",
     "grouped (cell-major) IVF-PQ at 1M x 768: the per-query ADC "
     "one-hot (~37 MB/query) becomes one (qcap, M*K) x (M*K, cmax) MXU "
     "matmul per probed cell inside VMEM (round-2 verdict #5 on "
     "servability)"),
    ("int8_mxu", "r3_int8_mxu.jsonl",
     "s8xs8 MXU rate lab: XLA dot_general forms vs true s8->s32 pallas "
     "grids — is the v5e's 2x int8 rate reachable? (ROADMAP #31)"),
    ("int4_1m", "r3_int4_1m.jsonl",
     "int4 two-stage vs int8/exact at 1M x 768: half of int8's coarse "
     "HBM bytes at 8x compression (ROADMAP #29)"),
    ("int4_5m", "r3_int4_5m.jsonl",
     "int4 two-stage at 5M x 768 — the HBM-bound regime where the byte "
     "ratio should show (ROADMAP #29)"),
    ("graph_sweep", "r3_graph_sweep.jsonl",
     "graph ANN wider-expand/fewer-iters sweep at 1M x 768 "
     "(round-2 verdict #9)"),
    ("outofcore_20m", "r3_outofcore_20m.jsonl",
     "memmap-backed out-of-core streamed exact search at >HBM scale "
     "(16M x 768 = 45.8 GB, 2.9x HBM): steady-state QPS + RSS slope "
     "(round-2 verdict #7)"),
    ("outofcore_int8", "r3_outofcore_int8.jsonl",
     "QuantizedOutOfCoreSearcher int8 over the same 16M corpus: streamed "
     "code tiles (4x less transfer than f32, 2x less than bf16 wire) + "
     "exact re-rank, recall vs the exact stream"),
    ("outofcore_binary", "r3_outofcore_binary.jsonl",
     "QuantizedOutOfCoreSearcher binary over the same 16M corpus: packed "
     "1-bit tiles (32x less transfer) + exact re-rank at rerank=96"),
    ("outofcore_pq", "r3_outofcore_pq.jsonl",
     "QuantizedOutOfCoreSearcher pq (m=192, 4-bit one-hot MXU ADC) over "
     "the same 16M corpus: 16x less transfer with near-int8 recall"),
]


def read_rows(path: Path) -> "OrderedDict[str, dict]":
    rows: "OrderedDict[str, dict]" = OrderedDict()
    if not path.exists():
        return rows
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or not line.startswith("{"):
            continue
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        exp = row.pop("exp", None)
        if exp:
            rows[exp] = row  # last occurrence wins
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(HERE / "results_r3_tpu.json"))
    args = ap.parse_args(argv)

    groups: "OrderedDict[str, dict]" = OrderedDict()
    for key, fname, title in CAMPAIGNS:
        rows = read_rows(HERE / fname)
        if rows:
            groups[key] = {"title": title, "rows": rows}

    out = {
        "round": 3,
        "hardware": "1x TPU v5e (16 GB HBM) via remote tunnel; "
                    "per-dispatch latency ~20-30 ms and ~30-45 MB/s "
                    "host->device bandwidth are tunnel artifacts — local "
                    "PCIe-attached chips see sub-ms transfers",
        "note": "serving rows are end-to-end over real HTTP on a ONE-core "
                "host (client + server + asyncio share it); "
                "api_overhead upload_ms rows isolate the query-block "
                "host->device transfer from framework overhead",
        "reference_baselines": {
            "blas_exact_100kx128": "1.66 ms/query (notes_benchmark.txt)",
            "hnsw_serving_qps": 8498,
            "sq_scan_qps": 167,
        },
        "groups": groups,
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    n = sum(len(g["rows"]) for g in groups.values())
    print(f"wrote {args.out}: {n} experiments in {len(groups)} groups")


if __name__ == "__main__":
    main()
