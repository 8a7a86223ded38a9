"""Pure-ALU scaling control: a tiny-working-set busy loop at N workers.

Separates the box's CPU-scheduling ceiling from its DRAM ceiling: if this
scales ~linearly where the extraction kernels do not, the kernel falloff
is memory bandwidth, not cores.

    python scripts/alu_control.py [workers ...]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def busy(n: int) -> float:
    x = 1.0
    for _ in range(n):
        x = x * 1.0000001 + 0.3
        if x > 10:
            x -= 9.0
    return x


def run_busy(nproc: int, n: int = 6_000_000) -> float:
    with mp.get_context("spawn").Pool(nproc) as p:
        p.map(busy, [10000] * nproc)  # warm
        t0 = time.time()
        p.map(busy, [n] * nproc)
        dt = time.time() - t0
    return nproc * n / dt


def main() -> int:
    workers = [int(w) for w in sys.argv[1:]] or [1, 8, 32]
    r1 = run_busy(workers[0])
    print(f"busy-loop {workers[0]} procs: {r1 / 1e6:.1f} Mops/s")
    for w in workers[1:]:
        r = run_busy(w)
        print(f"busy-loop {w} procs: {r / 1e6:.1f} Mops/s  "
              f"per-core {r / w / 1e6:.2f}  "
              f"eff vs {workers[0]}p {r / (w * r1 / workers[0]):.3f}",
              flush=True)
    return 0


if __name__ == "__main__":
    main()
