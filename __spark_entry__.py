"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship record-linkage pipeline (blocking →
candidate pairs → pair scoring → connected-components clustering) over the
sf0.001 ``documents`` table shaped as web pages. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with a
DuckDB-checkable oracle (see ``entity_linking_spark.queries``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_linking_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cluster near-duplicate documents at sf0.001.

    Full pipeline per SURVEY.md §7.1: multi-scheme blocking (host /
    normalized-prefix / MinHash-LSH band keys) → salted + capped blocks →
    block self-join → JVM+Arrow pair scoring → threshold → large-star/
    small-star connected components. Returns (id, component, url).
    """
    from entity_linking_spark.operators.blocking import (
        block_keys,
        cap_block_size,
        salt_mega_blocks,
    )
    from entity_linking_spark.operators.cluster import cluster_pages
    from entity_linking_spark.operators.pairs import candidate_pairs
    from entity_linking_spark.operators.scoring import doc_payload, score_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/doc/"),
            F.col("doc_id"),
        ).alias("url"),
        F.col("doc_id").alias("id"),
        "text",
        "lang",
    )
    blocks = block_keys(pages, id_col="id", text_col="text", url_col="url")
    blocks = cap_block_size(salt_mega_blocks(blocks, max_block=64), max_block=64)
    pairs = candidate_pairs(blocks)
    payload = doc_payload(pages, id_col="id", text_col="text")
    scored = score_pairs(pairs, payload)
    clusters = cluster_pages(scored, threshold=0.8)
    return clusters.join(
        pages.select(F.col("id").alias("node"), "url"), "node"
    ).select(
        F.col("node").alias("id"), F.col("component").alias("cluster_id"), "url"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
