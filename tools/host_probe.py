"""Host calibration probes, no Spark involved:

- ``cpu_burn``: sha256 over a cache-resident 64-byte buffer — pure
  ALU/L1 work that CANNOT see a memory-bandwidth ceiling.  Its N vs 4N
  ratio measures how much real CPU the hypervisor delivers.
- ``triad``: STREAM-style a = b + s*c over arrays far larger than LLC —
  pure DRAM work.  Its N vs 4N AGGREGATE-bandwidth ratio measures how
  much the shared memory bus scales with threads.

Run the pair in the same session as a build-scaling measurement and the
residual attributes itself: if burn scales ~1.0 but triad saturates,
the build's missing efficiency at 4N is memory bandwidth (a per-box
resource that a real 4N-executor cluster multiplies), not engine
serialization.  bench.py --scaling embeds both.

Usage: python tools/host_probe.py [n_lo] (default 4; the high level is
always 4x) — prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn_worker(seconds: float, out) -> None:
    import hashlib

    buf = b"x" * 64
    for _ in range(4000):  # warm-up (interpreter, CPU freq)
        buf = (hashlib.sha256(buf).digest() + b"x" * 32)[:64]
    t0 = time.perf_counter()
    t_end = t0 + seconds
    n = 0
    while time.perf_counter() < t_end:
        for _ in range(2000):
            buf = (hashlib.sha256(buf).digest() + b"x" * 32)[:64]
        n += 2000
    out.put(n / (time.perf_counter() - t0))


def _triad_worker(seconds: float, mb_per_array: int, out) -> None:
    import numpy as np

    n = (mb_per_array * 1_000_000) // 8
    b = np.full(n, 1.5)
    c = np.full(n, 2.5)
    a = np.zeros(n)  # TOUCHED pages: np.empty would page-fault in-loop
    # warm-up: fault every page, spin the allocator, settle CPU freq —
    # the first measured iteration must already be steady-state DRAM
    for _ in range(2):
        np.multiply(c, 0.5, out=a)
        np.add(a, b, out=a)
    t0 = time.perf_counter()
    t_end = t0 + seconds
    iters = 0
    while time.perf_counter() < t_end:
        np.multiply(c, 0.5, out=a)
        np.add(a, b, out=a)
        iters += 1
    elapsed = time.perf_counter() - t0
    # bytes touched per iter: read b + read c (once per op) + write a
    # (twice) ≈ 4 arrays' worth; a CONSISTENT convention (the N-vs-4N
    # ratio is the signal, not the absolute)
    out.put(iters * 4 * n * 8 / elapsed / 1e9)


def _run(worker, workers: int, seconds: float, *args) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=worker, args=(seconds, *args, q))
          for _ in range(workers)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


def cpu_burn(workers: int, seconds: float = 1.5) -> float:
    """-> aggregate hashes/sec across ``workers`` processes."""
    return _run(_burn_worker, workers, seconds)


def triad(workers: int, seconds: float = 1.5, mb_per_array: int = 192) -> float:
    """-> aggregate GB/s across ``workers`` processes (3 x 192 MB
    arrays per worker — far beyond any LLC, so this is DRAM traffic)."""
    return _run(_triad_worker, workers, seconds, mb_per_array)


def probe_pair(n_lo: int = 4, seconds: float = 1.5, reps: int = 2) -> dict:
    """Burn + triad at N and 4N workers -> the two scaling ratios.
    ``*_eff`` is throughput(4N) / (4 x throughput(N)): 1.0 = the
    resource quadruples with threads, 0.25 = it is fully saturated
    already at N.  Levels are INTERLEAVED and the max per level kept
    (hypervisor steal hits a window, not a level — same methodology as
    the scaling bench's min-of-reps)."""
    n_hi = 4 * n_lo
    out: dict = {"n_lo": n_lo, "n_hi": n_hi}
    # cap aggregate triad footprint at ~3 GB: per-array size shrinks
    # with worker count (16 workers x 3 x 192 MB would be ~9 GB next to
    # a warm Spark JVM) but never below 64 MB — still far beyond LLC,
    # and BOTH levels use the hi-level size so the ratio compares
    # identical per-worker working sets
    mb = max(64, 3072 // (3 * n_hi))
    b_lo = b_hi = t_lo = t_hi = 0.0
    for _ in range(max(reps, 1)):
        b_lo = max(b_lo, cpu_burn(n_lo, seconds))
        b_hi = max(b_hi, cpu_burn(n_hi, seconds))
        t_lo = max(t_lo, triad(n_lo, seconds, mb_per_array=mb))
        t_hi = max(t_hi, triad(n_hi, seconds, mb_per_array=mb))
    out["burn_lo_hps"] = round(b_lo, 0)
    out["burn_hi_hps"] = round(b_hi, 0)
    out["burn_eff"] = round(b_hi / (4.0 * b_lo), 3)
    out["triad_lo_gbps"] = round(t_lo, 2)
    out["triad_hi_gbps"] = round(t_hi, 2)
    out["triad_eff"] = round(t_hi / (4.0 * t_lo), 3)
    return out


if __name__ == "__main__":
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(json.dumps(probe_pair(n_lo)))
