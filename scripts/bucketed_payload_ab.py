"""A/B: does pre-bucketing the pair/payload tables on id speed the scored
stage? (round-2 verdict item 9 — `attach_pair_payload`'s docstring names
bucketing as the 100 TB lever; measure it instead of asserting it.)

Both variants materialize the SAME pairs + payload once, then time ONLY
the scored stage (pair_features + linear score → count):

  A (baseline): pairs + payload read back from plain parquet — the two
     payload joins shuffle both sides on id_a / id_b.
  B (bucketed): payload written with bucketBy(n, id) (sorted), pairs with
     bucketBy(n, id_a) — the bucketed scans report hashpartitioning, so
     join 1 (id_a) needs no shuffle on either side and join 2 (id_b)
     reuses the bucketed payload side.

Writes BENCH/scaling_runs/bucketed_ab_<ts>.json. Run on an idle host.

Usage: python scripts/bucketed_payload_ab.py [corpus_dir] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "data/bench_corpus_125000"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_buckets = cores

    from pyspark.sql import functions as F

    from entity_linking_spark.operators.blocking import (
        block_keys,
        cap_block_size,
        salt_mega_blocks,
    )
    from entity_linking_spark.operators.pairs import candidate_pairs
    from entity_linking_spark.operators.scoring import (
        doc_payload,
        linear_score,
        pair_features,
    )
    from entity_linking_spark.session import get_spark

    warehouse = "/tmp/bucketed_ab_warehouse"
    spark = get_spark(
        "bucketed-ab",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.sql.warehouse.dir": f"file://{warehouse}"},
    )
    pages = spark.read.parquet(f"{corpus}/pages.parquet").select("url", "text")
    n_docs = pages.count()

    blocks = cap_block_size(
        salt_mega_blocks(block_keys(pages), max_block=64), max_block=64
    )
    pairs = candidate_pairs(blocks)
    payload = doc_payload(pages, topk=64)

    base = "/tmp/bucketed_ab"
    pairs.write.mode("overwrite").parquet(f"{base}/pairs_plain")
    payload.write.mode("overwrite").parquet(f"{base}/payload_plain")

    for name in ("pairs_b", "payload_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.read.parquet(f"{base}/pairs_plain").write.mode("overwrite").bucketBy(
        n_buckets, "id_a"
    ).sortBy("id_a").saveAsTable("pairs_b")
    spark.read.parquet(f"{base}/payload_plain").write.mode(
        "overwrite"
    ).bucketBy(n_buckets, "id").sortBy("id").saveAsTable("payload_b")

    def scored_count(p, pl) -> float:
        t0 = time.time()
        pair_features(p, pl).withColumn("score", linear_score()).where(
            F.col("score") >= 0
        ).count()
        return round(time.time() - t0, 2)

    # dual-bucket (round-4 verdict task 5): persist the id_a-side-attached
    # half bucketed on id_b — the write performs the re-key ONCE, after
    # which the scored stage schedules zero exchanges
    from entity_linking_spark.operators.scoring import pair_payload_half

    spark.sql("DROP TABLE IF EXISTS half_b")
    t0 = time.time()
    pair_payload_half(
        spark.table("pairs_b"), spark.table("payload_b")
    ).write.mode("overwrite").bucketBy(n_buckets, "id_b").sortBy(
        "id_b"
    ).saveAsTable("half_b")
    half_write_sec = round(time.time() - t0, 2)

    results = {}
    # alternate A/B/C twice to bound host drift within the measurement
    for rep in (1, 2):
        a_pairs = spark.read.parquet(f"{base}/pairs_plain")
        a_payload = spark.read.parquet(f"{base}/payload_plain")
        results[f"plain_rep{rep}"] = scored_count(a_pairs, a_payload)
        results[f"bucketed_rep{rep}"] = scored_count(
            spark.table("pairs_b"), spark.table("payload_b")
        )
        results[f"dual_rep{rep}"] = scored_count(
            spark.table("half_b"), spark.table("payload_b")
        )

    plan = (
        pair_features(spark.table("pairs_b"), spark.table("payload_b"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    dual_plan = (
        pair_features(spark.table("half_b"), spark.table("payload_b"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    out = {
        "corpus": corpus,
        "docs": n_docs,
        "cores": cores,
        "n_buckets": n_buckets,
        "seconds": results,
        # the dual layout's one-time re-key cost, paid at stage-write time
        "half_write_sec": half_write_sec,
        "bucketed_plan_exchanges": plan.count("Exchange hashpartitioning"),
        "dual_plan_exchanges": dual_plan.count("Exchange hashpartitioning"),
    }
    os.makedirs(f"{REPO}/BENCH/scaling_runs", exist_ok=True)
    stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
    with open(f"{REPO}/BENCH/scaling_runs/bucketed_ab_{stamp}.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
