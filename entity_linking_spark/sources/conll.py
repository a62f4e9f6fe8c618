"""CoNLL-style TSV corpus reader (reference S9).

The reference parses the AIDA/CoNLL TSV with driver-side string splitting
(/root/reference/src/conll_helpers.py:5-13, 88-111): documents are
delimited by ``-DOCSTART-`` lines; each other line is a token row whose
tab-separated columns optionally carry a mention annotation
(``token\\tB|I\\tmention\\tentity``).

Spark-first re-expression: ``spark.read.text`` (wholetext) → per-file line
numbering via ``posexplode`` → a per-file running-count window over
DOCSTART markers assigns in-file doc numbers → a tiny per-file offset
table (one row per file, files ordered by name) makes doc ids globally
unique and stable for multi-file/glob inputs. No driver loop, no UDF.

Parallelism note: each input *file* is one task (wholetext preserves exact
line order without a global sort); CoNLL corpora ship as a handful of
files, so per-file parallelism is the natural grain. The old
``monotonically_increasing_id`` + unpartitioned-window form both
serialized the whole input through one task and mis-ordered multi-file
globs (Spark packs splits by size, not name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DOCSTART = "-DOCSTART-"


def _lines_with_doc_ids(spark: SparkSession, path: str) -> DataFrame:
    # NOTE: wholetext must be the reader kwarg — the .option("wholetext", …)
    # string form is silently ignored by the text source (verified on 4.1)
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )
    lines = raw.select(
        "file", F.posexplode(F.split("value", r"\r?\n")).alias("line_no", "value")
    )
    # in-file doc number = DOCSTART markers seen so far (1-based docs);
    # window is partitioned by file, so files process in parallel
    wf = (
        Window.partitionBy("file")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = lines.withColumn(
        "doc_in_file",
        F.sum(F.when(F.col("value").startswith(DOCSTART), 1).otherwise(0)).over(wf),
    )
    # global doc ids: offset each file by the doc counts of all
    # name-earlier files — a one-row-per-file aggregate, broadcast back
    per_file = marked.groupBy("file").agg(F.max("doc_in_file").alias("n_docs"))
    wo = Window.orderBy("file").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_file.select(
        "file", F.coalesce(F.sum("n_docs").over(wo), F.lit(0)).alias("offset")
    )
    return (
        marked.join(F.broadcast(offsets), "file")
        .withColumn("doc_id", F.col("doc_in_file") + F.col("offset"))
        .where((~F.col("value").startswith(DOCSTART)) & (F.trim("value") != ""))
        .select("doc_id", "line_no", "value")
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
