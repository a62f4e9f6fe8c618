"""Query registry: every implemented operator exposed as a (Spark, oracle-SQL)
pair over the driver's test tables.

Each entry is one operator family from SURVEY.md §2 (reference file:line in
the docstring of each builder). The Spark side is the engine's idiomatic
plan; the SQL side is an ANSI/DuckDB equivalent the driver runs for the
value-level correctness gate. Column names and float rounding are aligned
on both sides (the driver hash-compares values with columns sorted by name).

Conventions:
- float columns are rounded identically in both engines (round(x, N));
- every aggregate / computed column is aliased the same on both sides;
- hash-derived values go through `entity_linking_spark.hashing`, which is
  bit-identical across engines;
- queries whose semantics are iterative (connected components) are flagged
  SQL-oracle-able only where DuckDB's recursive CTE can express them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from entity_linking_spark.functions import text as X
from entity_linking_spark.functions.similarity import (
    cosine_arrays,
    jaro_winkler,
    lev_ratio_unit,
)
from entity_linking_spark.hashing import (
    md5hash64,
    seeded_hash64,
    sql_md5hash64,
    sql_seeded_hash64,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# SQL fragments shared by oracle strings (documents-as-pages shaping)
# ---------------------------------------------------------------------------

# tokens of a document text — must match functions.text.words()
_SQL_TOKENS = X.sql_words("text")
# normalized 4-token prefix key — must match blocking.norm_text_prefix_key
_SQL_PFX = f"array_to_string(list_slice({_SQL_TOKENS}, 1, 4), ' ')"
# synthetic url/host for documents (documents table has no url column; both
# engines derive host the same way so parse_url vs string concat is moot)
_SQL_HOST = "(source || '.example.com')"


# ===========================================================================
# Linkage-pipeline operators (SURVEY §2.3 J5/J6, §2.8 F22, §2.5 W1-W4)
# ===========================================================================

@register(
    "block_keys_norm",
    f"""
    SELECT doc_id AS id, 'host:' || {_SQL_HOST} AS block_key FROM documents
    UNION ALL
    SELECT doc_id AS id, 'pfx:' || {_SQL_PFX} AS block_key FROM documents
    WHERE length('pfx:' || {_SQL_PFX}) > 4
    """,
)
def block_keys_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized blocking keys (host + text prefix).

    Reference: exact-key + unidecode-normalized fallback blocking,
    /root/reference/src/data_fetchers.py:91-126, src/utils.py:72-77.
    """
    docs = _t(spark, sf_dir, "documents")
    host = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(F.lit("host:"), F.col("source"), F.lit(".example.com")).alias(
            "block_key"
        ),
    )
    pfx = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(
            F.lit("pfx:"),
            F.concat_ws(" ", F.slice(X.words(F.col("text")), 1, 4)),
        ).alias("block_key"),
    ).where(F.length("block_key") > 4)
    return host.unionByName(pfx)


@register(
    "minhash_signature",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest({X.sql_word_shingles(_SQL_TOKENS, 3)}) AS shingle
      FROM documents
    )
    SELECT doc_id,
           min({sql_seeded_hash64('shingle', 0)}) AS h0,
           min({sql_seeded_hash64('shingle', 1)}) AS h1,
           min({sql_seeded_hash64('shingle', 2)}) AS h2,
           min({sql_seeded_hash64('shingle', 3)}) AS h3
    FROM sh GROUP BY doc_id
    """,
)
def minhash_signature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature head (4 hash functions) per document.

    SURVEY §2.8 F22 (north_rule addition over the reference's exact-key
    blocking). Zero-Python: explode + seeded min aggregation.
    """
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(X.word_shingles(X.words(F.col("text")), 3)).alias("shingle"),
    )
    return sh.groupBy("doc_id").agg(
        *[
            F.min(seeded_hash64(F.col("shingle"), i)).alias(f"h{i}")
            for i in range(4)
        ]
    )


@register(
    "candidate_pairs_pfx",
    f"""
    WITH b AS (
      SELECT doc_id AS id, {_SQL_PFX} AS block_key FROM documents
      WHERE len({_SQL_TOKENS}) >= 4
    )
    SELECT DISTINCT a.id AS id_a, c.id AS id_b
    FROM b a JOIN b c ON a.block_key = c.block_key AND a.id < c.id
    """,
)
def candidate_pairs_pfx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block self-join pair generation on the prefix key.

    Reference: entity-pair self-join with (min,max) dedup,
    /root/reference/src/create_compats.py:148-172.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("id"), X.words(F.col("text")).alias("tokens")
    ).where(F.size("tokens") >= 4)
    b = toks.select(
        "id", F.concat_ws(" ", F.slice("tokens", 1, 4)).alias("block_key")
    )
    a, c = b.alias("a"), b.alias("c")
    return (
        a.join(c, "block_key")
        .where(F.col("a.id") < F.col("c.id"))
        .select(F.col("a.id").alias("id_a"), F.col("c.id").alias("id_b"))
        .distinct()
    )


@register(
    "pair_scores_lev",
    f"""
    WITH b AS (
      SELECT doc_id AS id, {_SQL_PFX} AS block_key,
             array_to_string(list_slice({_SQL_TOKENS}, 1, 8), ' ') AS head
      FROM documents WHERE len({_SQL_TOKENS}) >= 4
    )
    SELECT a.id AS id_a, c.id AS id_b,
           round(1.0 - levenshtein(a.head, c.head)::double
                 / greatest(length(a.head), length(c.head)), 6) AS lev_sim
    FROM b a JOIN b c ON a.block_key = c.block_key AND a.id < c.id
    """,
)
def pair_scores_lev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein similarity inside blocks (unit-cost ratio, JVM builtin).

    Reference: candidate_mention_sim,
    /root/reference/src/simple_dataset.py:180-181 (the deterministic
    unit-cost variant; cost-2 fidelity is golden-tested separately).
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("id"), X.words(F.col("text")).alias("tokens")
    ).where(F.size("tokens") >= 4)
    b = toks.select(
        "id",
        F.concat_ws(" ", F.slice("tokens", 1, 4)).alias("block_key"),
        F.concat_ws(" ", F.slice("tokens", 1, 8)).alias("head"),
    )
    a, c = b.alias("a"), b.alias("c")
    return (
        a.join(c, "block_key")
        .where(F.col("a.id") < F.col("c.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("c.id").alias("id_b"),
            F.round(
                lev_ratio_unit(F.col("a.head"), F.col("c.head")), 6
            ).alias("lev_sim"),
        )
    )


@register(
    "pair_scores_jw",
    f"""
    WITH b AS (
      SELECT doc_id AS id, {_SQL_PFX} AS block_key,
             array_to_string(list_slice({_SQL_TOKENS}, 1, 8), ' ') AS head
      FROM documents WHERE len({_SQL_TOKENS}) >= 4
    )
    SELECT a.id AS id_a, c.id AS id_b,
           round(jaro_winkler_similarity(a.head, c.head), 6) AS jw_sim
    FROM b a JOIN b c ON a.block_key = c.block_key AND a.id < c.id
    """,
)
def pair_scores_jw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler inside blocks (north_star-required measure), via an
    Arrow-batched pandas UDF bit-matched to DuckDB's implementation."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("id"), X.words(F.col("text")).alias("tokens")
    ).where(F.size("tokens") >= 4)
    b = toks.select(
        "id",
        F.concat_ws(" ", F.slice("tokens", 1, 4)).alias("block_key"),
        F.concat_ws(" ", F.slice("tokens", 1, 8)).alias("head"),
    )
    a, c = b.alias("a"), b.alias("c")
    return (
        a.join(c, "block_key")
        .where(F.col("a.id") < F.col("c.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("c.id").alias("id_b"),
            F.round(jaro_winkler(F.col("a.head"), F.col("c.head")), 6).alias(
                "jw_sim"
            ),
        )
    )


@register(
    "top1_per_block",
    f"""
    WITH b AS (
      SELECT doc_id, {_SQL_PFX} AS block_key, n_chars FROM documents
      WHERE len({_SQL_TOKENS}) >= 4
    ), r AS (
      SELECT doc_id, block_key,
             row_number() OVER (PARTITION BY block_key
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM b
    )
    SELECT doc_id, block_key FROM r WHERE rn = 1
    """,
)
def top1_per_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 per group (argmax in block).

    Reference: torch.argmax per candidate block,
    /root/reference/src/inference.py:26,53,72.
    """
    docs = _t(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(X.words(F.col("text")), 1, 4)).alias("block_key"),
        "n_chars",
    ).where(F.size(X.words(F.col("text"))) >= 4)
    w = Window.partitionBy("block_key").orderBy(F.desc("n_chars"), F.col("doc_id"))
    return (
        b.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "block_key")
    )


@register(
    "window_lognorm",
    """
    WITH s AS (
      SELECT event_id, event_type, value,
             min(value) OVER (PARTITION BY event_type) AS mn,
             max(value) OVER (PARTITION BY event_type) AS mx
      FROM events
    ), z AS (
      SELECT event_id, event_type,
             CASE WHEN mx = mn THEN 0.5 ELSE (value - mn) / (mx - mn) END AS scaled
      FROM s
    )
    SELECT event_id, event_type,
           round(scaled - ln(sum(exp(scaled)) OVER (PARTITION BY event_type)), 6)
             AS log_sm
    FROM z
    """,
)
def window_lognorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max scale + log-softmax — the reference's emission
    normalization (emissions_from_flat_scores,
    /root/reference/src/max_product.py:8-21) as pure window algebra."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    s = ev.select(
        "event_id",
        "event_type",
        "value",
        F.min("value").over(w).alias("mn"),
        F.max("value").over(w).alias("mx"),
    )
    z = s.select(
        "event_id",
        "event_type",
        F.when(F.col("mx") == F.col("mn"), 0.5)
        .otherwise((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")))
        .alias("scaled"),
    )
    return z.select(
        "event_id",
        "event_type",
        F.round(
            F.col("scaled") - F.log(F.sum(F.exp("scaled")).over(w)), 6
        ).alias("log_sm"),
    )


# ===========================================================================
# Generic relational operators (SURVEY §2.2-2.7)
# ===========================================================================

@register(
    "entity_freq",
    """
    SELECT o_orderstatus AS status, count(*) AS cnt
    FROM orders GROUP BY o_orderstatus ORDER BY cnt DESC, status
    """,
)
def entity_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-count ordered desc (reference A1: entity frequency,
    /root/reference/src/runner.py:84-88)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "status")
    )


@register(
    "count_distinct_entities",
    "SELECT count(DISTINCT o_custkey) AS n_custs FROM orders",
)
def count_distinct_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-distinct (reference A2, /root/reference/src/data_fetchers.py:165-172)."""
    return _t(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_custs")
    )


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
           round(avg(l_quantity), 6) AS avg_qty,
           count(*) AS cnt
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped aggregation (reference A4/A10 aggregate family)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("cnt"),
        )
    )


@register(
    "semi_join_pages",
    """
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
)
def semi_join_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — the reference's WHERE id IN (...) scan shape
    (S2/S4/J4, /root/reference/src/mention_context_dataset.py:234-239)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "anti_join_fallback",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the reference's 'mention not in prior' fallback
    branch (/root/reference/src/data_fetchers.py:119-126)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_agg_revenue",
    """
    SELECT o.o_orderpriority, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue, count(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
)
def join_agg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join + aggregation (reference J1 mentions⋈entities,
    /root/reference/src/mention_context_batch_sampler.py:42-45)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "prior_normalized",
    """
    WITH cnts AS (
      SELECT c_mktsegment AS segment, c_nationkey AS nation, count(*) AS cnt
      FROM customer GROUP BY c_mktsegment, c_nationkey
    )
    SELECT segment, nation, cnt,
           round(cnt / sum(cnt) OVER (PARTITION BY segment), 6) AS p_prior
    FROM cnts
    """,
)
def prior_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-normalized candidate prior p(e|m) (reference A5,
    /root/reference/src/data_fetchers.py:183-207)."""
    c = _t(spark, sf_dir, "customer")
    cnts = (
        c.groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nation"),
        ).agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("segment")
    return cnts.select(
        "segment",
        "nation",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(w), 6).alias("p_prior"),
    )


@register(
    "topk_per_group",
    """
    WITH r AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY l_extendedprice DESC,
                                         l_orderkey, l_linenumber) AS rn
      FROM lineitem
    )
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
    FROM r WHERE rn <= 5
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (reference W2: heapq.nlargest(5),
    /root/reference/src/cv_compat.py:100-112)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    )
