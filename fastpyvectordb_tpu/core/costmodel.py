"""Serving-mode cost model for Collection.optimize().

Round-4 verdict: ranking serving modes by HBM bytes/query alone misranks
compute-bound modes — IVF-PQ's grouped ADC is MXU-bound (the one-hot
einsum does ``rows * M * K`` MACs), so at 1M x 768 it won the bytes
ranking while measuring ~5x slower than the exact scan.  This module
ranks by a roofline estimate instead:

    cost_us = max(stream_bytes / HBM_BW, flops / MXU_RATE)
              + gather_rows * (GATHER_ROW_LAT + row_bytes / HBM_BW)
              + serial_s

with per-dtype MXU rates and the random-row-gather constant, all measured
on one TPU v5e in rounds 3-4:

- HBM_BW 819 GB/s (v5e datasheet; the exact-scan bench sustains ~80% of
  it, folded into the constant's use as a RANKING device, not a predictor)
- bf16 MXU 190 TOPS measured (r4logs/int8_mxu.log: 193.5; datasheet 197)
- int8 MXU 229 TOPS measured (XLA s8xs8->s32; the 394 datasheet rate is
  not reachable for these contraction shapes — ROADMAP #37)
- random row gather ~35 ns/row measured (the int8 two-stage rerank tail:
  1.4 ms for 1024 x 40 rows of 1536 B — ROADMAP #2), modeled as 30 ns
  latency + row_bytes/BW

Sanity anchors (model vs r4 chip measurements at 1M x 768, B=1024):
exact bf16 8.1 us/q vs measured 8.5; int8 two-stage 8.0 vs 7.5;
IVF-PQ deep rerank (np16, rr128) ~43 us vs measured 53.  The model's job
is ORDERING, and on-accelerator ``optimize()`` micro-times the candidates
anyway; the model decides only on hosts where wall-clock is meaningless
(CPU test backend) and documents the ranking in the report.
"""

from __future__ import annotations

from dataclasses import dataclass

HBM_BW = 819e9            # bytes/s, v5e
MXU_RATE = {              # multiply-accumulate/s * 2 (flops), measured
    "bfloat16": 190e12,
    "float16": 190e12,
    "int8": 229e12,
    # f32 lowers to multi-pass bf16 on the MXU: ~1/3 the bf16 rate
    "float32": 63e12,
}
GATHER_ROW_LAT = 30e-9    # s/row, random row gather latency component
SERIAL_DISPATCH = 200e-6  # s, per data-dependent serial step (graph beam)


@dataclass
class ModeCost:
    """Per-query roofline estimate for one serving mode."""
    stream_bytes: float     # HBM bytes streamed per query (batch-amortized)
    flops: float            # MXU flops per query
    rate: float             # flops/s for the mode's compute dtype
    gather_rows: float = 0.0
    row_bytes: float = 0.0
    serial_s: float = 0.0

    @property
    def cost_us(self) -> float:
        roof = max(self.stream_bytes / HBM_BW, self.flops / self.rate)
        gather = self.gather_rows * (GATHER_ROW_LAT
                                     + self.row_bytes / HBM_BW)
        return 1e6 * (roof + gather + self.serial_s)


def exact_cost(n: int, d: int, store_bytes: int, compute_dtype: str,
               batch: int) -> ModeCost:
    """Fused GEMM scan: corpus streamed once per batch, n*d MACs/query."""
    return ModeCost(stream_bytes=n * d * store_bytes / batch,
                    flops=2.0 * n * d,
                    rate=MXU_RATE.get(compute_dtype, MXU_RATE["float32"]))


def quantized_cost(n: int, d: int, kind: str, code_bytes: float,
                   store_bytes: int, rerank_rows: int,
                   batch: int) -> ModeCost:
    """Two-stage compressed scan + exact re-rank of ``rerank_rows``.

    Coarse-stage MXU rates: int8/int4 run s8xs8->s32 (int4 unpacks
    nibbles in VMEM first); binary unpacks to ±1 bf16 — the SAME MXU
    work as the exact scan (ROADMAP #23); flat PQ-ADC does M*K MACs/row
    via the one-hot expand.
    """
    if kind in ("int8", "int4"):
        rate, flops = MXU_RATE["int8"], 2.0 * n * d
    elif kind == "binary":
        rate, flops = MXU_RATE["bfloat16"], 2.0 * n * d
    elif kind == "pq":
        # code_bytes == M; K=16 for the 4-bit one-hot formulation
        rate, flops = MXU_RATE["bfloat16"], 2.0 * n * code_bytes * 16
    else:
        rate, flops = MXU_RATE["bfloat16"], 2.0 * n * d
    return ModeCost(stream_bytes=n * code_bytes / batch, flops=flops,
                    rate=rate, gather_rows=float(rerank_rows),
                    row_bytes=d * store_bytes)


def ivf_cost(n: int, d: int, cell_bytes: float, nlist: int, nprobe: int,
             overflow: int, store_bytes: int, rerank_rows: int,
             batch: int, slack: float = 1.25,
             pq_k: int = 0) -> ModeCost:
    """Grouped (cell-major) IVF / IVF-PQ: the probed fraction of cells
    streams once per batch; IVF-PQ's ADC one-hot does M*K MACs per
    scored row (``pq_k`` > 0 switches the flops term; ``cell_bytes``
    is then M).  Routing adds a B x nlist matmul (negligible, included).
    At large batch most cells are touched by some query, so the stream
    term uses min(nprobe/nlist * batch, 1) coverage.

    Known limitation (round 5): the PQ flops term counts ideal
    rows * M * K MACs; the grouped pallas dispatch additionally pays
    qcap slot padding and small-tile MXU inefficiency, measured ~10-50x
    the ideal at the K=256 default (78.8 ms np8/b1024 at 1M vs a ~1 ms
    ideal — results_r5 ivfpq_k256).  On accelerators optimize() ranks
    by measured micro-timing, which overrides this model; on CPU-only
    hosts (test rigs) the model may rank a K=256 IVF-PQ index cheaper
    than it serves on chip.  Calibrating a per-geometry efficiency
    factor without breaking the K=16 anchors needs the round-6
    measurement set.
    """
    frac = min(1.0, nprobe / max(nlist, 1))
    rows = frac * n * slack + overflow
    coverage = min(1.0, frac * batch)     # distinct-cell fraction per batch
    stream = (coverage * n * slack + overflow) * cell_bytes / batch
    if pq_k > 0:
        flops = 2.0 * rows * cell_bytes * pq_k + 2.0 * nlist * d
        rate = MXU_RATE["bfloat16"]
    else:
        flops = 2.0 * rows * d + 2.0 * nlist * d
        rate = MXU_RATE["int8"] if cell_bytes <= 1.01 else \
            MXU_RATE["bfloat16"]
    return ModeCost(stream_bytes=stream, flops=flops, rate=rate,
                    gather_rows=float(rerank_rows),
                    row_bytes=d * store_bytes)


def graph_cost(d: int, store_bytes: int, beam: int, iters: int,
               expand: int, degree: int) -> ModeCost:
    """Serial beam search: ``iters`` data-dependent rounds, each gathering
    ``beam*expand`` neighbor lists then ``beam*expand*degree`` candidate
    rows.  The serial dependency chain is the dominant term at every
    measured point (B=1 65 ms at 1M — ROADMAP #5), modeled as a
    per-round latency constant; this mode exists for >HBM index
    compression, not latency, and the model says so.
    """
    rows = float(iters) * beam * expand * degree
    return ModeCost(stream_bytes=0.0, flops=2.0 * rows * d,
                    rate=MXU_RATE["bfloat16"], gather_rows=rows,
                    row_bytes=d * store_bytes,
                    serial_s=iters * SERIAL_DISPATCH)
