"""Worker: run the linkage pipeline once at a given core count, print JSON.

Invoked by run_scaling.py in a fresh process so each measurement gets its
own JVM (no cross-config warmup contamination).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    sys.path.insert(0, ".")
    from entity_linking_spark.plans.pipeline import LinkageConfig, link_pages
    from entity_linking_spark.session import get_spark

    spark = get_spark(f"scale{cores}", cores=cores, shuffle_partitions=cores)
    pages = spark.read.parquet(pages_path)
    n = pages.count()  # also warms the JVM + parquet reader
    spark.range(100000).select(F.sum("id")).collect()

    t0 = time.time()
    link_pages(pages, config=LinkageConfig()).count()
    secs = time.time() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n,
                "seconds": round(secs, 3),
                "docs_per_sec": round(n / secs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
