"""Host-state fingerprint, committed per-round so drift attributions are
comparable across rounds (r11; companion to tools/bench_drift_r11.json).

The r10->r11 bench investigation showed the sf0.01 CPU probe spans only
one of the dimensions a whole-host slowdown can live in. This tool
measures four, each min-of-3, pure stdlib+numpy (no Spark, ~30 s total):

- cpu_single: fixed pure-Python integer loop (interpreter + 1 core)
- cpu_multi: the same loop on ALL cores via multiprocessing (steal /
  frequency under full fan-out)
- mem_bw_gbps: numpy triad a = b + c over arrays >> LLC (memory
  bandwidth — the dimension the r11 drift analysis implicated)
- disk_wr_mbps / disk_rd_mbps: 512 MiB sequential to TMPDIR with an
  fsync (shuffle-spill plane)

Run on an idle host at round open BEFORE bench.py; commit the JSON.
Compare to the previous round's record before interpreting any bench
delta: a >10% move in any dimension means raw totals are not
comparable round-over-round without normalization.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time
from pathlib import Path


def _loop(n: int = 10_000_000) -> float:
    t0 = time.time()
    s = 0
    for i in range(n):
        s += i * i
    return time.time() - t0


def cpu_single() -> float:
    return round(min(_loop() for _ in range(3)), 3)


def _worker(_):
    return _loop()


def cpu_multi() -> dict:
    n = os.cpu_count() or 1
    best = None
    with mp.Pool(n) as pool:
        for _ in range(3):
            t0 = time.time()
            pool.map(_worker, range(n))
            e = time.time() - t0
            best = e if best is None else min(best, e)
    return {"cores": n, "wall_sec": round(best, 3)}


def mem_bw() -> float:
    import numpy as np

    n = 64_000_000  # 3 x 512 MiB float64 — far beyond any LLC
    b = np.ones(n)
    c = np.ones(n)
    a = np.empty(n)
    best = None
    for _ in range(3):
        t0 = time.time()
        np.add(b, c, out=a)
        e = time.time() - t0
        best = e if best is None else min(best, e)
    # triad moves 3 arrays x 8 bytes
    return round(3 * n * 8 / best / 1e9, 2)


def disk() -> dict:
    tmp = os.environ.get("TMPDIR", "/tmp")
    path = os.path.join(tmp, "ssk_host_probe.bin")
    blob = os.urandom(1 << 20) * 512  # 512 MiB
    t0 = time.time()
    with open(path, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    wr = time.time() - t0
    t0 = time.time()
    with open(path, "rb") as f:
        while f.read(1 << 24):
            pass
    rd = time.time() - t0
    os.unlink(path)
    return {
        "disk_wr_mbps": round(512 / wr, 1),
        "disk_rd_mbps_cached": round(512 / rd, 1),
    }


if __name__ == "__main__":
    out = {
        "tool": "host_probe",
        "round": 11,
        "cpu_single_sec": cpu_single(),
        "cpu_multi": cpu_multi(),
        "mem_bw_gbps": mem_bw(),
        **disk(),
    }
    Path("tools/host_probe_r11.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))
