"""Measure the payload byte delta of the embedding pair features.

The pooled doc vector (round-5, `doc_payload(embeddings=...)`) rides both
sides of every candidate pair through the payload joins, so its per-doc
cost is the number that matters at 100 TB. This writes the scoring
payload with and without the vector and reports parquet bytes/doc plus
the theoretical 4·emb_dim float32 floor.

Usage: python scripts/payload_byte_delta.py [corpus_dir] [emb_dim] [cores]
Appends one JSON line to BENCH/scaling_runs/payload_delta.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _du(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
    )


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "data/bench_corpus_125000"
    emb_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from entity_linking_spark.functions.text import words
    from entity_linking_spark.operators.scoring import doc_payload
    from entity_linking_spark.session import get_spark

    spark = get_spark("payload-delta", cores=cores, shuffle_partitions=cores)
    pages = spark.read.parquet(f"{corpus}/pages.parquet").select("url", "text")
    n_docs = pages.count()
    # deterministic in-plan token vectors (same family as the oracle's) —
    # the delta depends only on emb_dim, not on vector values
    vocab = pages.select(F.explode(words(F.col("text"))).alias("token")).distinct()
    comps = [
        (
            ((F.ascii("token") * (i + 1) + F.length("token") * 7 + i * 13) % 97)
            / 97.0
            - 0.5
        ).cast("float")
        for i in range(emb_dim)
    ]
    emb = vocab.select("token", F.array(*comps).alias("embedding"))

    base = "/tmp/payload_delta"
    out = {}
    for tag, kwargs in (
        ("plain", {}),
        ("emb", {"embeddings": emb, "emb_dim": emb_dim}),
    ):
        path = f"{base}/{tag}"
        t0 = time.time()
        doc_payload(pages, topk=64, **kwargs).write.mode("overwrite").parquet(path)
        out[tag] = {
            "bytes": _du(path),
            "bytes_per_doc": round(_du(path) / n_docs, 1),
            "write_sec": round(time.time() - t0, 1),
        }
    delta = out["emb"]["bytes_per_doc"] - out["plain"]["bytes_per_doc"]
    rec = {
        "corpus": corpus,
        "docs": n_docs,
        "emb_dim": emb_dim,
        "payload": out,
        "delta_bytes_per_doc": round(delta, 1),
        "theoretical_floor_bytes": 4 * emb_dim,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(f"{REPO}/BENCH/scaling_runs", exist_ok=True)
    with open(f"{REPO}/BENCH/scaling_runs/payload_delta.jsonl", "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
