"""Two-process multi-host test (VERDICT r2 item #8).

Spawns two real ``jax.distributed`` CPU processes on localhost (2 virtual
devices each → a 4-device global mesh spanning 2 controllers) and runs the
full path: ``multihost.initialize`` → ``global_mesh`` →
``shard_local_corpus`` → one sharded search, checked against an exact
host-side ground truth inside each worker (tests/multihost_worker.py).

This is the multi-controller execution evidence for dist/multihost.py —
everything else in the suite is single-process.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")
NPROC = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_search(tmp_path):
    port = _free_port()
    # clean env: the conftest's 8-device XLA_FLAGS would override the
    # worker's own 2-device setting (later flags win)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    # isolate the compile cache: concurrent writers are fine, but keep the
    # suite's cache clean of multi-process artifacts
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(NPROC), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for pid in range(NPROC)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid}" in out, out
