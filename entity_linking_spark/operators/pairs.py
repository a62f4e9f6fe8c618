"""Candidate-pair generation: block self-join.

Reference analog: the entity-pair compatibility self-join with ``(min,max)``
pair-key dedup (``/root/reference/src/create_compats.py:148-172``). On
Spark this is one equi-join on ``block_key`` with ``id_a < id_b`` and a
``dropDuplicates`` across keys — Catalyst/AQE picks the physical join and
splits skewed keys; the caller is expected to have salted/capped blocks
first (see ``blocking.salt_mega_blocks`` / ``cap_block_size``), because no
runtime trick saves a 10^6-member block from producing 10^12 pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_pairs(
    blocks: DataFrame,
    id_col: str = "id",
    key_col: str = "block_key",
    keep_key: bool = False,
    with_count: bool = False,
) -> DataFrame:
    """(id_a, id_b [, block_key | n_shared]) with id_a < id_b, distinct pairs.

    The shuffle is keyed on ``block_key`` (north_rule: shuffle partitioning
    keyed on blocking keys) — both sides of the self-join co-partition on
    the same key so the join itself is local to each shuffle partition.

    ``with_count=True`` adds ``n_shared`` — how many blocking keys the two
    ids co-occur in (the raw material of the pair prior features,
    ``scoring.pair_features``). Same cost as the default: the dedup IS a
    groupBy on (id_a, id_b) either way, counting rides the same shuffle.
    Mutually exclusive with ``keep_key`` (an aggregated pair has no single
    block key).
    """
    a = blocks.select(F.col(id_col).alias("id_a"), F.col(key_col).alias(key_col))
    b = blocks.select(F.col(id_col).alias("id_b"), F.col(key_col).alias(key_col))
    pairs = a.join(b, key_col).where(F.col("id_a") < F.col("id_b"))
    if with_count:
        if keep_key:
            raise ValueError("candidate_pairs: keep_key and with_count are "
                             "mutually exclusive")
        return pairs.groupBy("id_a", "id_b").agg(
            F.count("*").alias("n_shared")
        )
    cols = ["id_a", "id_b"] + ([key_col] if keep_key else [])
    return pairs.select(*cols).dropDuplicates(["id_a", "id_b"])


def attach_pair_payload(
    pairs: DataFrame,
    payload: DataFrame,
    id_col: str,
    payload_cols: list[str],
    sides: tuple[str, ...] = ("a", "b"),
) -> DataFrame:
    """Join per-record payload columns onto the pair table's sides.

    Produces ``<col>_a`` / ``<col>_b`` for each payload column. One shuffle
    per side keyed on id — at scale, pre-bucketing the payload table on
    ``id_col`` makes both joins co-located. ``sides`` restricts the
    attachment (the dual-bucket checkpoint layout attaches the ``a`` side
    in its own stage, persisted bucketed on ``id_b``, so the scored stage
    joins only the ``b`` side — exchange-free on both inputs)."""
    out = pairs
    for s in sides:
        ps = payload.select(
            F.col(id_col).alias(f"id_{s}"),
            *[F.col(c).alias(f"{c}_{s}") for c in payload_cols],
        )
        out = out.join(ps, f"id_{s}")
    return out
