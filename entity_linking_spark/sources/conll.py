"""CoNLL-style TSV corpus reader (reference S9).

The reference parses the AIDA/CoNLL TSV with driver-side string splitting
(/root/reference/src/conll_helpers.py:5-13, 88-111): documents are
delimited by ``-DOCSTART-`` lines; each other line is a token row whose
tab-separated columns optionally carry a mention annotation
(``token\\tB|I\\tmention\\tentity``).

Spark-first re-expression: ``spark.read.text`` → a running-count window
over DOCSTART markers assigns doc ids (no driver loop, no UDF for the
structure) → tokens aggregate per doc; mentions come from B-rows.
Used for fixture corpora; the same shape parses any line-delimited
doc-markered format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DOCSTART = "-DOCSTART-"


def _lines_with_doc_ids(spark: SparkSession, path: str) -> DataFrame:
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_no"), "value"
    )
    w = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    # doc_id = number of DOCSTART markers seen so far (1-based docs)
    return lines.withColumn(
        "doc_id",
        F.sum(F.when(F.col("value").startswith(DOCSTART), 1).otherwise(0)).over(w),
    ).where(
        (~F.col("value").startswith(DOCSTART)) & (F.trim("value") != "")
    )


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """→ (doc_id, text): tokens of each doc joined by single spaces
    (reference get_documents, conll_helpers.py:9-13)."""
    toks = _lines_with_doc_ids(spark, path).select(
        "doc_id", "line_no", F.split("value", "\t")[0].alias("token")
    )
    return (
        toks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ", F.transform(F.array_sort(
                    F.collect_list(F.struct("line_no", "token"))
                ), lambda s: s["token"])
            ).alias("text")
        )
    )


def read_mentions(spark: SparkSession, path: str) -> DataFrame:
    """→ (doc_id, mention, entity, line_no): B-tagged rows
    (reference get_mentions/get_entities, conll_helpers.py:15-40)."""
    rows = _lines_with_doc_ids(spark, path).select(
        "doc_id", "line_no", F.split("value", "\t").alias("cols")
    )
    return rows.where(
        (F.size("cols") >= 4) & (F.col("cols")[1] == "B")
    ).select(
        "doc_id",
        F.col("cols")[2].alias("mention"),
        F.col("cols")[3].alias("entity"),
        "line_no",
    )
