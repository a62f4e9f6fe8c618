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
        # doc_in_file = 0 is preamble before a file's first DOCSTART —
        # it belongs to no document (and would otherwise collide with the
        # previous file's last doc id in multi-file reads)
        .where(
            (F.col("doc_in_file") > 0)
            & (~F.col("value").startswith(DOCSTART))
            & (F.trim("value") != "")
        )
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


def normalize_mention_for_search(mention: str) -> str:
    """CoNLL mention-string repair (reference F12,
    /root/reference/src/conll_helpers.py:58): documents are token-joined
    with single spaces, so "U.S." appears as "U . S ." in the doc text.
    Re-space the mention's periods/commas the same way, then undo the one
    over-correction the reference special-cases ("D . C ." → "D.C.")."""
    import re as _re

    s = " . ".join(mention.split("."))
    s = " , ".join(s.split(","))
    s = _re.sub(" +", " ", s)
    return s.replace("D . C .", "D.C.")


def find_mention_offsets(docs: DataFrame, mentions: DataFrame) -> DataFrame:
    """→ (doc_id, mention, line_no, offset): char offset of each mention in
    its document's token-joined text, with sequential seek + repair
    fallback (reference get_splits search loop, conll_helpers.py:52-66).

    The seek is inherently sequential *within a document* (mentions are
    matched in annotation order, each search starting after the previous
    match), so the unit of parallelism is the document: applyInPandas
    groups by doc_id and runs the seek loop per group — thousands of docs
    process in parallel, each loop is tiny. Unlocatable mentions get
    offset -1 (the reference stops at the first miss; recording -1 keeps
    the operator total on malformed corpora).

    ``matched`` carries the string actually found at ``offset`` — the
    repaired form when the fallback fired — so downstream span math
    (``attach_mention_sentences``) uses the in-text length, not the
    annotation's. Pass ``matched`` as the mention column downstream."""
    import pandas as _pd

    joined = mentions.join(
        docs.select("doc_id", F.col("text").alias("_text")), "doc_id"
    )

    def seek_group(pdf: "_pd.DataFrame") -> "_pd.DataFrame":
        pdf = pdf.sort_values("line_no")
        text = pdf["_text"].iloc[0]
        offsets = []
        matched = []
        seek = 0
        for m in pdf["mention"]:
            i = text.find(m, seek)
            used = m
            if i == -1:
                used = normalize_mention_for_search(m)
                i = text.find(used, seek)
            offsets.append(i)
            matched.append(used if i != -1 else None)
            if i != -1:
                seek = i + len(used)
        out = pdf[["doc_id", "mention", "line_no"]].copy()
        out["matched"] = matched
        out["offset"] = offsets
        return out

    return joined.groupBy("doc_id").applyInPandas(
        seek_group,
        "doc_id long, mention string, line_no long, matched string, offset long",
    )
