"""Round-5 serial-floor probe: is the multi-JVM N→4N residual host physics?

The 1M-doc local-cluster[2,1]→[8,1] pairs land at ~0.61–0.68 raw
efficiency. Hypothesis (same shape as round 4's thread-family membw
probe): each leg pays a per-RUN serial floor S — driver-side Catalyst
planning, whole-stage codegen JIT compilation in fresh executor JVMs,
CC-fixpoint driver collects, stage-scheduling round-trips — that is
independent of both the core count and the input bytes, so

    T(n, D) = S + W(D) / n

and the *work* component scales. Evidence, three independent legs:

1. Tiny-input legs (bench_corpus_2000, ~16k docs) at n=2 and n=8
   measure S almost directly (W(16k)/n is a few seconds). If
   S2 ≈ S8 ≫ W_tiny, the floor is per-run, not per-core.
2. An n=4 leg at 1M docs gives a 3-point fit of T(n) = S + W/n; the
   fitted S should match the tiny-leg measurement.
3. A 2.5M-doc pair (bench_corpus_312500) shows efficiency RISING with
   work size — the Gustafson direction: at 100 TB, W/n dwarfs S and
   the floor-subtracted efficiency is what survives.

For every 1M pair already in multijvm_r5.jsonl this prints both the raw
ratio and the floor-subtracted ratio  (T2 − S) / (4 · (T8 − S)).

Usage: python scripts/serial_floor_probe.py [stage]
  stage ∈ {tiny, n4, big, report, all} (default: all, sequential).
Appends one JSON line per leg to BENCH/scaling_runs/multijvm_r5.jsonl
(same schema as multijvm_pairs.py legs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "scaling_runs", "multijvm_r5.jsonl")
TINY = os.path.join(REPO, "data", "bench_corpus_2000", "pages.parquet")
ONE_M = os.path.join(REPO, "data", "bench_corpus_125000", "pages.parquet")
BIG = os.path.join(REPO, "data", "bench_corpus_312500", "pages.parquet")


def leg(n: int, pages: str, tag: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_worker.py"),
         "cluster", str(n), pages, "1"],
        capture_output=True, text=True, cwd=REPO,
    )
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"leg cluster[{n},1] {tag} exit {out.returncode}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["probe"] = tag
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def report() -> None:
    legs = []
    with open(OUT) as fh:
        for line in fh:
            rec = json.loads(line)
            if "summary" not in rec:
                legs.append(rec)
    tiny = [r for r in legs if r.get("probe") == "tiny"]
    if not tiny:
        print("no tiny legs yet — run `serial_floor_probe.py tiny` first")
        return
    s_floor = sum(r["seconds"] for r in tiny) / len(tiny)
    print(f"serial floor S (tiny-input legs): "
          f"{[r['seconds'] for r in tiny]} → S ≈ {s_floor:.1f}s")
    # pair up consecutive (n=2, n=8) 1-core legs at the same doc count
    one = [r for r in legs
           if r.get("cores_per_executor") == 1 and r.get("probe") != "tiny"]
    rows = []
    i = 0
    while i + 1 < len(one):
        a, b = one[i], one[i + 1]
        if a["n"] == 2 and b["n"] == 8 and a["docs"] == b["docs"]:
            raw = (a["seconds"] / b["seconds"]) / 4
            adj = (a["seconds"] - s_floor) / (4 * (b["seconds"] - s_floor))
            rows.append((a["docs"], a["seconds"], b["seconds"], raw, adj))
            i += 2
        else:
            i += 1
    print(f"{'docs':>9} {'T(2)':>8} {'T(8)':>8} {'raw eff':>8} "
          f"{'floor-subtracted':>17}")
    for docs, t2, t8, raw, adj in rows:
        print(f"{docs:>9} {t2:>8.1f} {t8:>8.1f} {raw:>8.3f} {adj:>17.3f}")
    n4 = [r for r in legs if r["n"] == 4 and r.get("probe") == "n4"]
    if n4:
        # 3-point fit of T = S + W/n using the most recent 1M pair + n4
        m = [r for r in one if r["docs"] > 500_000]
        t2 = [r["seconds"] for r in m if r["n"] == 2][-1]
        t8 = [r["seconds"] for r in m if r["n"] == 8][-1]
        t4 = n4[-1]["seconds"]
        # least squares on 1/n
        import statistics
        xs = [1 / 2, 1 / 4, 1 / 8]
        ys = [t2, t4, t8]
        xbar, ybar = statistics.mean(xs), statistics.mean(ys)
        w = (sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys))
             / sum((x - xbar) ** 2 for x in xs))
        s_fit = ybar - w * xbar
        print(f"3-point fit at 1M docs: T(n) = {s_fit:.1f} + {w:.1f}/n "
              f"(fitted S vs tiny-leg S: {s_fit:.1f} vs {s_floor:.1f})")
    summary = {
        "probe_summary": {
            "serial_floor_sec": round(s_floor, 1),
            "pairs": [
                {"docs": d, "t2": t2, "t8": t8, "raw_eff": round(raw, 3),
                 "floor_subtracted_eff": round(adj, 3)}
                for d, t2, t8, raw, adj in rows
            ],
        }
    }
    with open(OUT, "a") as fh:
        fh.write(json.dumps(summary) + "\n")


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    if stage in ("tiny", "all"):
        leg(2, TINY, "tiny")
        leg(8, TINY, "tiny")
    if stage in ("n4", "all"):
        leg(4, ONE_M, "n4")
    if stage in ("big", "all"):
        leg(2, BIG, "big")
        leg(8, BIG, "big")
    report()


if __name__ == "__main__":
    main()
