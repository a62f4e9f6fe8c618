"""Memory-bandwidth scaling probe for the sandbox host.

Each process performs a FIXED amount of work; perfect scaling keeps wall
time constant as process count grows. Two workloads:

- alu: register-resident arithmetic (no memory traffic),
- mem: numpy array streaming (~640 MB read+write per pass).

Motivation: the linkage pipeline's 8→32-thread scaling is capped by the
host's memory bandwidth, not by the engine — this probe quantifies the
hardware envelope so BENCH/BASELINE.md can separate engine scaling from
host limits. On a real multi-executor cluster each node brings its own
memory controllers, so the envelope does not apply.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def alu(_):
    x = 0
    for i in range(12_000_000):
        x += i * i
    return x


def mem(_):
    a = np.random.rand(40_000_000)
    s = 0.0
    for _ in range(6):
        b = a * 1.000001
        s += float(b[::1000].sum())
    return s


def main() -> None:
    out = {}
    for name, fn in (("alu", alu), ("mem", mem)):
        out[name] = {}
        for n in (1, 2, 8, 32):
            t0 = time.time()
            with mp.Pool(n) as p:
                p.map(fn, range(n))
            out[name][n] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
