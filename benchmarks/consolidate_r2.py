"""Fold benchmarks/r2_raw.jsonl into benchmarks/results_r2_tpu.json.

The raw file accumulates one JSON line per measurement across campaign
runs (re-runs overwrite by experiment name — the LAST occurrence wins,
so a fixed benchmark's re-run supersedes the broken one).  Output groups
experiments by prefix and carries the system info + reference baselines
the round-1 results file established.

Usage: python benchmarks/consolidate_r2.py [--raw PATH] [--out PATH]
"""

import argparse
import json
from collections import OrderedDict
from pathlib import Path

GROUPS = [
    ("config1", "BASELINE config 1: 10k x 384 brute force, batch 32"),
    ("config2", "BASELINE config 2: 100k x 384 exact + fused filter masks"),
    ("config5", "BASELINE config 5: 5M x 768 binary prefilter -> exact "
                "re-rank -> graph rescoring"),
    ("crossover", "method x batch crossover, Collection API, 1M x 768"),
    ("kernel", "method x batch crossover, kernel-level (device-resident "
               "inputs), 1M x 768"),
    ("ivfpq", "IVF-PQ on chip, 1M x 768"),
    ("binary", "binary 2-stage rerank-depth sweep, 1M x 768"),
    ("ivf_", "bf16-cell vs int8-cell IVF, 1M x 768"),
    ("graph", "graph ANN small-batch sweep, 1M x 768"),
    ("exact_smallbatch", "exact scan at B=1/8 (crossover companion)"),
    ("server", "serving layer under concurrent load"),
    ("bigcollection", "BigCollection 10M x 768 (host vectors + device "
                      "binary codes)"),
    ("outofcore", "out-of-core streamed exact search, >HBM corpus"),
    ("oc20m", "out-of-core 20M x 768 (57 GB f32)"),
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", default="benchmarks/r2_raw.jsonl")
    ap.add_argument("--out", default="benchmarks/results_r2_tpu.json")
    args = ap.parse_args(argv)

    by_exp: "OrderedDict[str, dict]" = OrderedDict()
    for line in Path(args.raw).read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        exp = row.pop("exp", None)
        if exp:
            by_exp[exp] = row  # last occurrence wins

    grouped: "OrderedDict[str, dict]" = OrderedDict()
    for prefix, title in GROUPS:
        rows = {e: r for e, r in by_exp.items() if e.startswith(prefix)}
        if rows:
            grouped[prefix] = {"title": title, "rows": rows}
    leftover = {e: r for e, r in by_exp.items()
                if not any(e.startswith(p) for p, _ in GROUPS)}
    if leftover:
        grouped["other"] = {"title": "ungrouped", "rows": leftover}

    out = {
        "round": 2,
        "hardware": "1x TPU v5e (16 GB HBM) via remote tunnel; "
                    "per-dispatch latency ~20-30 ms dominates B=1",
        "note": "kernel_* rows time device-resident inputs (the serving "
                "engine's steady state); crossover_* rows go through the "
                "full Collection API incl. host->device transfer per call",
        "reference_baselines": {
            "blas_exact_100kx128": "1.66 ms/query (notes_benchmark.txt)",
            "hnsw_serving_qps": 8498,
            "sq_scan_qps": 167,
        },
        "groups": grouped,
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    n = sum(len(g["rows"]) for g in grouped.values())
    print(f"wrote {args.out}: {n} experiments in {len(grouped)} groups")


if __name__ == "__main__":
    main()
