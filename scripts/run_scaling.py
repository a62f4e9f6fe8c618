"""Scaling-efficiency evidence: same pipeline, same input, N vs 4N cores.

BASELINE target: throughput scaling efficiency ≥ 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so (per the driver's
instruction) local[8] vs local[32] on one JVM each stands in for N vs 4N
executors; each config runs in its own subprocess/JVM.

Writes BENCH/BASELINE.md + BENCH/scaling.json.

Usage: python scripts/run_scaling.py [n_entities]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    bench_dir = os.path.join(REPO, "data", "bench_corpus")
    pages_path = os.path.join(bench_dir, "pages.parquet")
    if not os.path.exists(pages_path):
        from entity_linking_spark.datagen import write_parquet

        t0 = time.time()
        write_parquet(bench_dir, n_entities=n_entities, seed=42)
        print(f"generated bench corpus in {time.time()-t0:.1f}s", file=sys.stderr)

    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "scaling_worker.py"),
             str(cores), pages_path],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)
        print(line)

    tp8, tp32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = tp32 / (4 * tp8)
    summary = {
        "n_docs": results[8]["docs"],
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency_8_to_32": round(eff, 3),
        "target": 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(summary, fh, indent=2)

    md = f"""# BENCH — measured baseline + scaling evidence

## Scaling efficiency (north_rule: ≥ 0.8 from N to 4N executors)

Same job (full linkage pipeline: blocking → salt/cap → pair self-join →
JVM+Arrow scoring → connected components), same input
({results[8]['docs']} synthetic pages, seed 42), one fresh JVM per config.
`local[8]` vs `local[32]` stands in for N vs 4N executors (sandbox has no
real cluster; see /root/repo/BASELINE.md for the definition).

| config | pages | seconds | pages/sec |
|---|---|---|---|
| local[8]  | {results[8]['docs']} | {results[8]['seconds']} | {tp8} |
| local[32] | {results[32]['docs']} | {results[32]['seconds']} | {tp32} |

**Scaling efficiency = {tp32} / (4 × {tp8}) = {eff:.3f}**
(target ≥ 0.8 → {"PASS" if eff >= 0.8 else "MISS"})

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
