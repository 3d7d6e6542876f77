"""Fold the round-4 campaign logs into benchmarks/results_r4_tpu.json —
LOSSLESSLY.

The round-3 pipeline regenerated its results json from whatever jsonl
logs existed at run time; rows whose source logs had been rotated away
were silently destroyed (the 4M ok-mask measurements vanished between
commits 90e3bd9 and 2639eec — round-3 verdict, weak #1).  This version
merges: it starts from the existing output file and UPDATES rows in
place, so a consolidation run can only add or refresh evidence, never
drop it.  Every row records its source log under "_src".

Inputs: benchmarks/r4logs/<campaign>.log — each a stream of one-line
JSON rows keyed by "exp" (the r4_chip_queue*.sh job logs).

Usage: python benchmarks/consolidate_r4.py [--out PATH]
"""

import argparse
import json
from collections import OrderedDict
from pathlib import Path

HERE = Path(__file__).parent
LOGS = HERE / "r4logs"

CAMPAIGNS = [
    ("bench_headline", "bench.log",
     "bench.py headline: fastest recall>=0.95 mode over the clustered "
     "1M x 768 corpus at B=1024, all candidate modes recorded"),
    ("ivf_grouped_4m", "ivfg4m_rr.log",
     "grouped (cell-major) IVF at 4M x 768 int8 cells, rerank sweep + "
     "same-run exact bf16 baseline — the evidence the round-3 README "
     "row lacked (verdict weak #1)"),
    ("int8_mxu", "int8_mxu.log",
     "s8xs8 MXU rate lab: XLA dot_general forms vs true s8->s32 pallas "
     "grids — is the v5e's 2x int8 rate reachable? (ROADMAP #31)"),
    ("ivf_grouped_1m", "ivfg1m_rr.log",
     "grouped IVF at 1M x 768 incl. exact baseline (rerank sweep)"),
    ("ivfpq_grouped", "ivfpq_grouped.log",
     "grouped (cell-major) IVF-PQ at 1M x 768: one-hot ADC inside VMEM "
     "vs the per-query kernel (ROADMAP #30)"),
    ("int4_1m", "int4_1m.log",
     "int4 two-stage vs int8/exact at 1M x 768 (first chip numbers for "
     "the int4 tier)"),
    ("api_overhead_bf16", "api_overhead.log",
     "layer-by-layer API overhead, bf16 config, after the assembly-cost "
     "halving + fetch barrier landed"),
    ("ivfpq_deep", "ivfpq_deep.log",
     "grouped IVF-PQ deep-rerank sweep at 1M (rr 64/128/256, np8): the "
     "servability answer — rr128 hits 20,939 QPS @ recall 0.949 vs the "
     "round-3 per-query kernel's 435 QPS @ 0.944; recall saturates at "
     "0.949 on np8 cell coverage"),
    ("b1_latency_1m", "b1_latency_1m.log",
     "B=1 on-device latency at the 1M x 768 headline shape (scan-chain "
     "method, corpus as jit arg after the HTTP-413 fix)"),
    ("b1_latency", "b1_latency.log",
     "B=1 latency with tunnel RTT isolated: data-dependent lax.scan "
     "chain = on-device per-query latency (verdict item 6; reference "
     "hnswlib p50 0.110 ms)"),
    ("serving_r4", "serving_r4.log",
     "HTTP serving re-run at 1M x 768 bf16: admission control (503s), "
     "quantized singles coalesced through the batcher, recall column, "
     "server-side took for the int8-vs-exact gap (verdict items 4/5/10)"),
    ("ooc16m", "ooc16m.log",
     "memmap-backed out-of-core exact stream at 16M x 768 (45.8 GB, "
     "2.9x HBM): steady-state QPS + RSS slope (verdict item 7)"),
    ("ooc16m_int8", "ooc16m_int8.log",
     "QuantizedOutOfCoreSearcher int8 over the same 16M corpus"),
    # wave F: the deadline-cut int8 run rerun against the salvaged codes
    # (same group key — later rows refresh the partial wave-E ones)
    ("ooc16m_int8", "ooc16m_int8_r2.log",
     "QuantizedOutOfCoreSearcher int8 over the same 16M corpus "
     "(wave-F rerun on salvaged codes: timed scans + recall pass)"),
    ("ooc16m_binary", "ooc16m_binary.log",
     "QuantizedOutOfCoreSearcher binary over the same 16M corpus"),
    ("ooc16m_pq", "ooc16m_pq.log",
     "QuantizedOutOfCoreSearcher pq over the same 16M corpus"),
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
        if exp is None and row.get("metric"):
            exp = row["metric"]  # bench.py prints "metric", not "exp"
        if exp:
            row["_src"] = f"r4logs/{path.name}"
            rows[exp] = row  # last occurrence in one log wins (re-runs)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(HERE / "results_r4_tpu.json"))
    args = ap.parse_args(argv)

    out_path = Path(args.out)
    if out_path.exists():  # merge, never regenerate-and-drop
        out = json.loads(out_path.read_text(),
                         object_pairs_hook=OrderedDict)
    else:
        out = OrderedDict([
            ("round", 4),
            ("hardware", "1x TPU v5e (16 GB HBM) via remote tunnel; "
             "per-dispatch latency ~20-30 ms and ~30-45 MB/s host->device "
             "bandwidth are tunnel artifacts — local PCIe-attached chips "
             "see sub-ms transfers"),
            ("note", "rows carry _src pointing at their committed log; "
             "consolidation only adds or refreshes rows, never drops "
             "(the round-3 pipeline's regeneration loss is fixed)"),
            ("reference_baselines", OrderedDict([
                ("blas_exact_100kx128", "1.66 ms/query "
                 "(notes_benchmark.txt)"),
                ("hnsw_serving_qps", 8498),
                ("hnsw_single_p50_ms", 0.110),
                ("sq_scan_qps", 167),
            ])),
            ("groups", OrderedDict()),
        ])

    groups = out["groups"]
    added = 0
    for key, fname, title in CAMPAIGNS:
        rows = read_rows(LOGS / fname)
        if not rows:
            continue
        g = groups.setdefault(key, {"title": title, "rows": OrderedDict()})
        g["title"] = title
        g["rows"].update(rows)
        added += len(rows)

    # addendum (r4 advisor): the wave-F 16M int8 headline row predates the
    # zero-rounding emit fix (outofcore_20m.py:160-161), so rows_per_s /
    # host_to_device_gbps were rounded to 0.0/0.02 at print time and the
    # true throughput is only recoverable from s_per_batch.  Derive the
    # fields here rather than leaving the zeroed row as the record.
    for gk in ("ooc16m", "ooc16m_int8", "ooc16m_binary", "ooc16m_pq"):
        g = groups.get(gk)
        if not g:
            continue
        for row in g["rows"].values():
            spb = row.get("s_per_batch")
            rows_n = groups.get(gk, {}).get("rows", {}).get(
                "setup", {}).get("rows") or 16_000_000
            if spb and not row.get("rows_per_s"):
                row["rows_per_s_derived"] = round(rows_n / spb, 1)
                row["_derived"] = ("rows_per_s/link gbps re-derived from "
                                   "s_per_batch (pre-fix emit rounded them "
                                   "to zero — r4 advisor finding)")

    out_path.write_text(json.dumps(out, indent=1))
    n = sum(len(g["rows"]) for g in groups.values())
    print(f"wrote {out_path}: {n} experiments in {len(groups)} groups "
          f"({added} refreshed this run)")


if __name__ == "__main__":
    main()
