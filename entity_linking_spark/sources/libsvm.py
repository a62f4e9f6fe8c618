"""libsvm ``qid`` ranking-format sink + source (reference S15).

Format (one candidate per line, grouped by query id):

    <label> qid:<qid> 1:<f1> 2:<f2> ... d:<fd>

mirroring the reference's XGBoost LTR export
(``/root/reference/src/convert_to_xgboost_data.py:9-31``). Writing is a
single codegen string projection + ``write.text`` (one file per
partition — repartition by qid upstream to keep a query's candidates in
one file, which rankers require); reading parses back with array algebra,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_libsvm_qid(
    df: DataFrame,
    path: str,
    label_col: str = "label",
    qid_col: str = "qid",
    feature_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write (label, qid, features...) as libsvm qid lines.

    The reference binarizes rank to {0,1} (convert_to_xgboost_data.py:10);
    same here via ``cast(label != 0 as int)``.
    """
    if not feature_cols:
        raise ValueError("feature_cols must name at least one column")
    feats = [
        F.concat(F.lit(f"{i}:"), F.col(c).cast("string"))
        for i, c in enumerate(feature_cols, 1)
    ]
    line = F.concat_ws(
        " ",
        (F.col(label_col).cast("double") != 0).cast("int").cast("string"),
        F.concat(F.lit("qid:"), F.col(qid_col).cast("string")),
        *feats,
    )
    # sort within partitions so a ranker reading files sequentially sees
    # each qid's candidates contiguously
    df.select(line.alias("value"), F.col(qid_col).alias("_q")).repartition(
        F.col("_q")
    ).sortWithinPartitions("_q").select("value").write.mode(mode).text(path)


def read_libsvm_qid(spark: SparkSession, path: str) -> DataFrame:
    """→ (label int, qid bigint, features array<double>) — inverse of
    :func:`write_libsvm_qid` for contiguous 1..d feature indices."""
    parts = F.split(F.col("value"), " ")
    kv = F.slice(parts, 3, F.greatest(F.size(parts) - 2, F.lit(0)))
    return (
        spark.read.text(path)
        .where(F.length(F.trim("value")) > 0)
        .select(
            F.element_at(parts, 1).cast("int").alias("label"),
            F.regexp_replace(F.element_at(parts, 2), "^qid:", "")
            .cast("bigint")
            .alias("qid"),
            F.transform(
                kv, lambda p: F.split(p, ":")[1].cast("double")
            ).alias("features"),
        )
    )
