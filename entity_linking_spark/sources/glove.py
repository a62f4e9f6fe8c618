"""GloVe text-format embedding reader (reference S10).

The reference loads ``glove.6B.100d.txt``-style files driver-side into a
dict of torch tensors (``/root/reference/src/data_fetchers.py:68-78``:
one ``word v1 ... vd`` line per token, plus four special tokens). Here the
file is read distributed — one codegen split per line, no Python — into
``(token, embedding array<float>)``, the same shape as the ``embeddings``
parquet table, so everything downstream (ANN, centroids, near-dup) is
source-agnostic.

Special tokens: the reference gives <PAD> zeros and draws <UNK> /
<MENTION_START_HERE> / <MENTION_END_HERE> from ``torch.randn`` (fresh
every run). Randomness is hostile to a resumable pipeline, so here the
special vectors are *deterministic* pseudo-noise derived from the
md5-based hash family — same distributional role, reproducible lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_linking_spark.hashing import md5hash64

SPECIAL_TOKENS = ("<PAD>", "<UNK>", "<MENTION_START_HERE>", "<MENTION_END_HERE>")


def _special_rows(spark: SparkSession, dim: int) -> DataFrame:
    """Deterministic special-token vectors: <PAD> = 0, others = seeded
    pseudo-noise in (-0.1, 0.1) from the cross-engine hash family."""
    ids = spark.range(dim).select(F.col("id").cast("int").alias("i"))
    toks = spark.createDataFrame(
        [(t,) for t in SPECIAL_TOKENS], "token string"
    )
    noise = (
        (md5hash64(F.concat_ws("|", "token", F.col("i").cast("string")))
         % 2000001 - 1000000)
        / 10000000.0
    ).cast("float")
    v = F.when(F.col("token") == "<PAD>", F.lit(0.0).cast("float")).otherwise(
        noise
    )
    return (
        toks.crossJoin(ids)
        .groupBy("token")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", v.alias("v")))
            ).alias("_pairs")
        )
        .select(
            "token",
            F.transform("_pairs", lambda s: s["v"]).alias("embedding"),
        )
    )


def read_glove(
    spark: SparkSession,
    path: str,
    add_special: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """→ (token, embedding array<float>) from GloVe text format.

    Codegen all the way: split on single spaces (GloVe's delimiter), head
    is the token, tail casts to float. Malformed/empty lines are dropped.

    ``dim`` sizes the special-token vectors; pass it explicitly to make
    the reader launch zero jobs (like every other source). When omitted
    and ``add_special`` is set, the dimension is autodetected with a
    one-line ``first()`` probe — cheap, but a driver-side job.
    """
    lines = spark.read.text(path)
    parts = F.split(F.rtrim(F.col("value")), " ")
    df = (
        lines.select(parts.alias("p"))
        .where(F.size("p") >= 2)
        .select(
            F.element_at("p", 1).alias("token"),
            F.transform(
                F.slice(F.col("p"), F.lit(2), F.size("p") - 1),
                lambda x: x.cast("float"),
            ).alias("embedding"),
        )
        .where(F.length("token") > 0)
    )
    if add_special:
        if dim is None:
            dim_row = df.select(F.size("embedding").alias("d")).first()
            dim = int(dim_row["d"]) if dim_row is not None else 0
        if dim > 0:
            df = _special_rows(spark, dim).unionByName(df)
    return df
