"""Worker: run the linkage pipeline once at a given parallelism, print JSON.

Invoked by run_scaling.py in a fresh process so each measurement gets its
own driver JVM (no cross-config warmup contamination).

Modes:
  local   N  → master local[N]: one JVM, N task threads (shared heap/GC).
  cluster N  → master local-cluster[N,1,4608]: N *separate executor JVM
               processes*, 1 core + 4 GB heap each, real shuffle fetch
               between them — the closest this sandbox gets to N executors
               on a cluster, and the leg that tests per-executor-JVM
               scaling rather than shared-heap thread scaling.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    mode = sys.argv[1]
    n = int(sys.argv[2])
    pages_path = sys.argv[3]
    # cores per executor (cluster mode only; default 1 = the round-3/4
    # legs). Multi-core executors match real deployments more closely —
    # one JVM serial floor (codegen cache, GC, shuffle server) amortizes
    # over `cores` tasks instead of being paid once per core.
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    sys.path.insert(0, ".")
    from entity_linking_spark.plans.pipeline import LinkageConfig, link_pages
    from entity_linking_spark.session import get_spark

    if mode == "cluster":
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spark = get_spark(
            f"scale-cluster{n}x{cores}",
            # worker gets 4608 MB/core; executor heap must be set
            # explicitly — the local-cluster memory arg only sizes the
            # Worker, and the executor would otherwise default to 1g and
            # OOM its hash maps
            master=f"local-cluster[{n},{cores},{4608 * cores}]",
            shuffle_partitions=4 * n * cores,
            extra_conf={
                "spark.executorEnv.PYTHONPATH": repo,
                "spark.executor.memory": f"{4 * cores}g",
            },
        )
    else:
        spark = get_spark(f"scale{n}", cores=n, shuffle_partitions=n)
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()  # also warms the JVM + parquet reader
    spark.range(100000).select(F.sum("id")).collect()

    # SPARK_GRAFT_CC_FUSE: override LinkageConfig.cc_fuse_rounds for
    # fusion A/Bs on 1-core-executor legs (see operators/cluster.py)
    fuse = int(os.environ.get("SPARK_GRAFT_CC_FUSE", "2"))
    t0 = time.time()
    link_pages(pages, config=LinkageConfig(cc_fuse_rounds=fuse)).count()
    secs = time.time() - t0
    print(
        json.dumps(
            {
                "mode": mode,
                "n": n,
                "cores_per_executor": cores if mode == "cluster" else None,
                "docs": n_docs,
                "seconds": round(secs, 3),
                "docs_per_sec": round(n_docs / secs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
