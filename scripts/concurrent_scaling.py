"""Fixed-bandwidth-per-executor scaling measurement (round-3).

The raw local[2] → local[8] ratio on one box confounds engine scaling
with host memory bandwidth: the 2-thread leg enjoys ~4× the per-core
bandwidth the 8-thread leg gets, which no real cluster reproduces (every
added executor brings its own memory controllers). This script removes
the confound BY MEASUREMENT instead of by arithmetic normalization:

  config A: one local[8] job over the corpus          (8 cores busy)
  config B: four concurrent local[2] jobs, each over  (8 cores busy)
            the same corpus

Both configurations keep all 8 cores and the full host bandwidth busy
with identical per-core work; the only difference is whether one 8-way
engine coordinates the work or 4 independent 2-way engines split it.

  engine scaling efficiency N→4N =
      aggregate_throughput(A) / aggregate_throughput(B)
    = (docs / T_A) / (4 · docs / max_i T_B,i)

≥ 1 means the coordinated 8-way engine loses nothing to shuffle width,
barriers, or its serial floor versus embarrassingly-parallel 2-way
engines given the same hardware — the per-executor-resources-constant
definition of the north rule's N→4N criterion.

Writes BENCH/scaling_runs/concurrent_<ts>.json.

Usage: python scripts/concurrent_scaling.py [corpus_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _launch(n: int, pages: str, mem: str):
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_worker.py"),
         "local", str(n), pages],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=REPO, env=env,
    )


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "data/bench_corpus_125000"
    pages = os.path.join(corpus, "pages.parquet")

    # A: one local[8] job (its time comes from the worker's reported seconds)
    p = _launch(8, pages, "16g")
    out8 = json.loads(p.communicate()[0].strip().splitlines()[-1])
    print("local8:", out8)

    # B: four concurrent local[2] jobs (16g heap each — same aggregate)
    t0 = time.time()
    procs = [_launch(2, pages, "16g") for _ in range(4)]
    outs = []
    for p in procs:
        outs.append(json.loads(p.communicate()[0].strip().splitlines()[-1]))
    wall_b = time.time() - t0
    print("4x local2:", [o["seconds"] for o in outs])

    docs = out8["docs"]
    tp_a = docs / out8["seconds"]
    # conservative: aggregate B throughput over the SLOWEST copy
    tp_b = 4 * docs / max(o["seconds"] for o in outs)
    eff = tp_a / tp_b
    summary = {
        "corpus": corpus,
        "docs": docs,
        "local8_seconds": out8["seconds"],
        "concurrent_local2_seconds": [o["seconds"] for o in outs],
        "concurrent_wall": round(wall_b, 1),
        "throughput_local8": round(tp_a, 1),
        "aggregate_throughput_4x_local2": round(tp_b, 1),
        "engine_scaling_efficiency_2_to_8": round(eff, 3),
        "definition": "tp(local[8]) / (4*docs/max T of 4 concurrent local[2]) — "
                      "both configs use 8 cores + full host bandwidth",
    }
    os.makedirs(f"{REPO}/BENCH/scaling_runs", exist_ok=True)
    stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
    with open(f"{REPO}/BENCH/scaling_runs/concurrent_{stamp}.json", "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
