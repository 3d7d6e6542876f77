"""Salvage a partially-encoded out-of-core codes file.

When a wall-clock deadline kills benchmarks/outofcore_20m.py mid-encode,
the codes memmap holds every tile written so far but the quantizer
stats sidecar (<codes>.stats.npz) was never written, so
QuantizedOutOfCoreSearcher._try_reuse refuses the file and the next run
re-encodes from scratch (~40 min host-side at 16M x 768).  This tool
finishes the job instead:

  1. locate the resume point via SEEK_HOLE on the sparse codes file
     (minus one full tile of safety margin — delayed allocation can
     blur the exact frontier),
  2. re-derive the quantizer EXACTLY as _encode-time training did —
     the training sample is deterministic contiguous-block sampling
     (core/outofcore.py:_train), so vmin/scale match the codes already
     on disk bit-for-bit,
  3. host-encode the remaining tiles (core/outofcore.py:_host_encode_tile),
  4. one pass over the full codes file to rebuild the per-row re-rank
     stats (vsq, rinv), and
  5. np.savez the sidecar in _save_stats's exact schema.

After this, outofcore_20m.py --memmap <corpus> --codec int8 reuses the
codes and goes straight to the timed scans.  int8/int4 only (binary has
no stats but also a 32x cheaper encode — just rerun it).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastpyvectordb_tpu.core.outofcore import (  # noqa: E402
    _host_encode_tile,
    _host_row_stats,
)

def npy_header_len(path: str) -> int:
    """The actual .npy header length (r4 advisor: v1 headers are 64-byte
    aligned — 64 for short dtype dicts, >128 for large shapes; a
    hardcoded 128 silently mis-computes the resume frontier)."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        np.lib.format._read_array_header(f, version)
        return f.tell()


def first_hole_row(path: str, dims: int) -> int:
    """First row whose bytes are not yet allocated on disk."""
    header = npy_header_len(path)
    fd = os.open(path, os.O_RDONLY)
    try:
        try:
            off = os.lseek(fd, 0, os.SEEK_HOLE)
        except OSError:  # filesystem without SEEK_HOLE: assume nothing
            return 0
    finally:
        os.close(fd)
    return max(0, (off - header)) // dims


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="f32 corpus memmap (raw, rows x dims)")
    ap.add_argument("--rows", type=int, required=True)
    ap.add_argument("--dims", type=int, default=768)
    ap.add_argument("--tile", type=int, default=1_048_576)
    ap.add_argument("--train-rows", type=int, default=262_144,
                    help="must match the killed run (constructor default)")
    ap.add_argument("--codec", default="int8", choices=["int8", "int4"])
    args = ap.parse_args()

    n, d, t = args.rows, args.dims, args.tile
    corpus = np.memmap(args.corpus, dtype=np.float32, mode="r",
                       shape=(n, d))
    codes_path = args.corpus + f".{args.codec}.npy"
    if not os.path.exists(codes_path):
        raise SystemExit(f"no codes file at {codes_path}")
    stats_path = codes_path + ".stats.npz"
    if os.path.exists(stats_path):
        print(f"stats already present at {stats_path}; nothing to salvage")
        return

    # --- resume point, one tile of safety margin --------------------
    hole_row = first_hole_row(codes_path, d if args.codec == "int8"
                              else (d + 1) // 2)
    resume = max(0, (hole_row // t - 1) * t)
    print(f"codes frontier ~row {hole_row:,}; re-encoding from "
          f"{resume:,} / {n:,}", flush=True)

    # --- reproduce training: the SAME shared block sampler the searcher
    # trains with (core/outofcore.py:block_sample) — any drift between
    # the two would make salvaged codes inconsistent with the prefix
    from fastpyvectordb_tpu.core.outofcore import block_sample  # noqa: E402
    train_rows = min(args.train_rows, n)
    sample = block_sample(corpus, n, train_rows)
    if args.codec == "int8":
        from fastpyvectordb_tpu.quant.scalar import ScalarQuantizer
        qz = ScalarQuantizer().train(sample)
    else:
        from fastpyvectordb_tpu.quant.int4 import Int4Quantizer
        qz = Int4Quantizer().train(sample)
    print("quantizer retrained (deterministic sample)", flush=True)

    codes = np.lib.format.open_memmap(codes_path, mode="r+")
    assert codes.shape[0] == n, codes.shape

    t0 = time.perf_counter()
    for start in range(resume, n, t):
        stop = min(start + t, n)
        tile_np = np.asarray(corpus[start:stop], dtype=np.float32)
        codes[start:stop] = _host_encode_tile(args.codec, qz, tile_np)
        print(f"  encoded rows {start:,}-{stop:,} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    codes.flush()

    # --- full stats pass over the codes (cheap: codes bytes only) ---
    vsq = np.empty((n,), np.float32)
    rinv = np.empty((n,), np.float32)
    t0 = time.perf_counter()
    for start in range(0, n, t):
        stop = min(start + t, n)
        s, r = _host_row_stats(args.codec, qz, np.asarray(codes[start:stop]))
        vsq[start:stop] = s
        rinv[start:stop] = r
    print(f"stats pass {time.perf_counter() - t0:.0f}s", flush=True)

    np.savez(stats_path, codec=args.codec,
             vmin=np.asarray(qz.vmin), scale=np.asarray(qz.scale),
             vsq=vsq, rinv=rinv)
    print(f"wrote {stats_path}", flush=True)


if __name__ == "__main__":
    main()
