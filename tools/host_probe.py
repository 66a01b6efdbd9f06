"""Hardware-headroom probe for scaling measurements (no Spark involved).

BASELINE.md's scaling methodology requires pairing every N-vs-4N engine
run with an independent probe of what the *hypervisor* currently allows:
P worker processes each run a fixed amount of in-place uint64 math on a
pre-allocated, pre-warmed buffer; the aggregate element throughput at
P=2 vs P=8 bounds the scaling efficiency ANY job can exhibit in the
current window.  A pair is only worth launching when hw_eff is
comfortably above the 0.8 gate (the engine can't out-scale the host).

Measurement hygiene (this sandbox's first-touch faults cost ~66-170 s/GB,
so they must stay OUT of the timed window):
  * each worker allocates and warms its buffer BEFORE a shared barrier;
  * all workers release from the barrier together and time ONLY the math;
  * the aggregate window is the max of the per-worker math times (workers
    are concurrent by construction), so allocation skew and pool startup
    never contaminate the number;
  * each level runs twice, max taken, with hi/lo order interleaved so
    neither level is credited with a quieter moment.

Usage:  python tools/host_probe.py            # one 2-vs-8 measurement
        python tools/host_probe.py 4 16       # custom lo/hi process counts

Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

N_ELEMS = 8_000_000
N_ITERS = 40

_barrier = None


def _init(barrier) -> None:
    global _barrier
    _barrier = barrier


def _work(n: int) -> float:
    x = np.arange(N_ELEMS, dtype=np.uint64)
    mul = np.uint64(6364136223846793005)
    add = np.uint64(1442695040888963407)
    for _ in range(4):  # touch every page + warm cache, OUTSIDE the clock
        x *= mul
        x += add
    _barrier.wait()  # all workers start the timed section together
    t0 = time.perf_counter()
    for _ in range(n):
        x *= mul
        x += add
    return time.perf_counter() - t0


def aggregate_throughput(p: int, n: int = N_ITERS) -> float:
    """Aggregate uint64 elems/sec across p concurrent processes, timing
    only the barrier-synchronized math section."""
    barrier = mp.Barrier(p)  # fork start method: inherited via _init
    with mp.Pool(p, initializer=_init, initargs=(barrier,)) as pool:
        times = pool.map(_work, [n] * p, chunksize=1)
    return p * n * N_ELEMS / max(times)


def main(lo: int = 2, hi: int = 8) -> dict:
    r_hi_a = aggregate_throughput(hi)
    r_lo_a = aggregate_throughput(lo)
    r_lo_b = aggregate_throughput(lo)
    r_hi_b = aggregate_throughput(hi)
    r_lo, r_hi = max(r_lo_a, r_lo_b), max(r_hi_a, r_hi_b)
    return {
        "lo": lo,
        "hi": hi,
        f"agg{lo}_gps": round(r_lo / 1e9, 3),
        f"agg{hi}_gps": round(r_hi / 1e9, 3),
        f"agg{lo}_runs": [round(r_lo_a / 1e9, 3), round(r_lo_b / 1e9, 3)],
        f"agg{hi}_runs": [round(r_hi_a / 1e9, 3), round(r_hi_b / 1e9, 3)],
        "hw_eff": round((r_hi / r_lo) / (hi / lo), 3),
    }


if __name__ == "__main__":
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(json.dumps(main(lo, hi)))
