"""Distributed transitive closure: connected components on an edge list.

Large-star / small-star alternation (Kiveris et al., "Connected Components
in MapReduce and Beyond", SOCC'14 — public algorithm), implemented as
iterated DataFrame self-joins with per-iteration ``localCheckpoint`` to
truncate lineage. Converges in O(log² n) rounds; each round is two
shuffle-keyed aggregations.

Reference analog: the per-document one-round max-product message passing
(``/root/reference/src/max_product.py:60-82``) enforces cross-mention
consistency; at web scale the same role — making linkage decisions
transitively consistent — is played by connected components over the
above-threshold edge set (SURVEY.md §3.3).

Node ids are int64. String ids (urls) should be mapped through
``md5hash64`` or a dictionary first.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the min of
    N(u) ∪ {u}."""
    bidir = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nbr_min = bidir.groupBy("src").agg(F.min("dst").alias("min_nbr"))
    m = bidir.join(nbr_min, "src").select(
        "src",
        "dst",
        F.least(F.col("src"), F.col("min_nbr")).alias("m"),
    )
    return (
        m.where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high→low; for each node u connect all of its ≤ neighbors
    (and u) to the minimum neighbor."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    nbr_min = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    joined = oriented.join(nbr_min, "src")
    out = joined.select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    ).union(joined.select(F.col("src"), F.col("m").alias("dst")))
    return out.where(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    fuse_rounds: int = 2,
) -> DataFrame:
    """→ (node, component) where component = min node id in the component.

    Convergence: the star-contraction fixpoint — iterate until the edge set
    is unchanged (checked via count + sum-of-hashes). ``fuse_rounds``
    combined large∘small rounds run per materialization and fixpoint
    probe (default 2): this divides both the lineage-truncation barriers
    and the driver round-trips by the fuse factor (the flagship's
    measured sf0.1 floor was ~42% driver-bound), at the cost of at most
    ``fuse_rounds − 1`` redundant rounds after the true fixpoint — cheap,
    because star rounds are idempotent on a converged star forest.
    Measured guidance: fusion clearly wins on multi-core executors
    (same-hour cold flagship 43.0s → 28.5s at local[32]); on 1-core /
    small-heap executors the wider in-flight job showed no benefit in
    noisy measurements — set ``fuse_rounds=1`` there to recover the
    round-3 per-round behavior.

    ``checkpoint_dir``: by default rounds truncate lineage with
    ``localCheckpoint`` (executor-local blocks — fastest, but a lost
    executor on a preemptible cluster kills the computation). Pass a
    reliable-storage path (HDFS/S3/DBFS) to use ``checkpoint`` with
    ``spark.sparkContext.setCheckpointDir`` instead: each round's edge set
    is persisted to the shared filesystem and survives executor loss.
    Superseded round checkpoints are deleted as soon as the next probe's
    edge set is on disk (shared storage holds ~2 edge-set copies, not
    O(rounds)), and a caller-set checkpoint dir is restored on exit.
    """
    spark = edges.sparkSession
    prior_ckpt_dir = None
    if checkpoint_dir is not None:
        # don't clobber a caller-set checkpoint dir for the rest of the
        # session (setCheckpointDir mutates global SparkContext state —
        # round-4 advice): remember it and restore on the way out
        try:
            opt = spark.sparkContext._jsc.sc().getCheckpointDir()
            prior_ckpt_dir = opt.get() if opt.isDefined() else None
        except Exception:  # pragma: no cover - py4j surface drift
            prior_ckpt_dir = None
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame, eager: bool) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    def _ckpt_file(df: DataFrame) -> str | None:
        """Reliable-checkpoint path of a materialized checkpointed frame."""
        try:
            opt = (
                df._jdf.queryExecution().analyzed().rdd().getCheckpointFile()
            )
            return opt.get() if opt.isDefined() else None
        except Exception:  # pragma: no cover - py4j surface drift
            return None

    def _delete_superseded(dfs: list[DataFrame]) -> None:
        """Best-effort delete of no-longer-referenced round checkpoints.

        Without this a long run accumulates O(rounds) full copies of the
        edge set in shared storage (spark.cleaner.referenceTracking.
        cleanCheckpoints defaults to false and relies on driver GC even
        when enabled — round-4 advice). Only frames whose consumers have
        already materialized are passed in; ``raw`` and the final edge
        set are never superseded (the caller's lazy result reads them).
        """
        if checkpoint_dir is None:
            return
        for df in dfs:
            path = _ckpt_file(df)
            if not path:
                continue
            try:
                jvm = spark.sparkContext._jvm
                hpath = jvm.org.apache.hadoop.fs.Path(path)
                fs = hpath.getFileSystem(
                    spark.sparkContext._jsc.hadoopConfiguration()
                )
                fs.delete(hpath, True)
            except Exception:  # pragma: no cover - best effort
                pass

    # materialize the incoming edge plan ONCE — deriving nodes and the
    # working edge set from the raw lazy plan would execute the whole
    # upstream (blocking + scoring) twice
    raw = _ckpt(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")), True)
    # node set comes from the raw edges: a node appearing only in a
    # self-loop is still a (singleton) component. Lazy on purpose — it is
    # consumed exactly once (the final join), so an eager checkpoint here
    # would only add a full-edge-set materialization barrier before the
    # iteration starts (its plan roots at the checkpointed `raw`, so no
    # upstream recompute either way).
    nodes = raw.select(F.col("src").alias("node")).union(
        raw.select(F.col("dst").alias("node"))
    ).distinct()
    # lazy: materializes together with the first `_sig` aggregate below —
    # an eager checkpoint here would spend a separate job on a full pass
    # over the edge set (plan roots at the checkpointed `raw`, so laziness
    # cannot recompute upstream)
    e = _ckpt(raw.where(F.col("src") != F.col("dst")).distinct(), False)

    def _sig(df: DataFrame) -> tuple[int, int]:
        row = (
            df.select(
                F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
            )
            .agg(
                F.count("*").alias("n"),
                # modulo keeps the ANSI-mode sum far from int64 overflow
                F.coalesce(
                    F.sum(F.xxhash64("a", "b") % F.lit(1_000_000_007)), F.lit(0)
                ).alias("s"),
            )
            .collect()[0]
        )
        return int(row["n"]), int(row["s"])

    prev = _sig(e)
    # frames whose checkpoints become garbage once the NEXT probe's final
    # edge set has materialized (the fused loop appends each round's
    # input, so the initial dedup enters the list at probe 1)
    superseded: list[DataFrame] = []
    converged = False
    for _ in range(max_iter):
        # fuse_rounds combined rounds per fixpoint probe, with a LAZY
        # checkpoint between them: each star substitutes its input
        # subtree twice, so chaining stars under one plan grows the
        # logical tree exponentially (4 chained stars ≈ 4^4 leaf copies,
        # measured ~2.4s of Catalyst analysis per round); the
        # intermediate lazy checkpoints keep every analyzed plan two
        # stars deep while still materializing all fused rounds in the
        # ONE job the single fixpoint aggregate drives — 1/fuse_rounds
        # the driver collects of the per-round form
        for _f in range(max(1, fuse_rounds)):
            superseded.append(e)
            e = _ckpt(_small_star(_large_star(e)), False)
        cur = _sig(e)
        # this probe's final edge set is on disk now; everything older
        # (previous probes + this probe's fused intermediates) is garbage
        _delete_superseded(superseded)
        superseded = []
        if cur == prev:
            converged = True
            break
        prev = cur
    if checkpoint_dir is not None:
        # all checkpoint WRITES are done (the lazy result only READS the
        # final edge set + raw); hand the global setting back
        try:
            spark.sparkContext.setCheckpointDir(prior_ckpt_dir)
        except Exception:  # pragma: no cover - py4j null handling drift
            pass
    if not converged:
        warnings.warn(
            f"connected_components: edge set did not reach a fixpoint within "
            f"max_iter={max_iter} fused probes "
            f"({max(1, fuse_rounds) * max_iter} star "
            f"rounds); component labels may be unconverged "
            f"(last signature {prev}). Increase max_iter.",
            RuntimeWarning,
            stacklevel=2,
        )

    # After convergence every edge points child → root (star forest).
    labels = e.select(
        F.greatest("src", "dst").alias("node"), F.least("src", "dst").alias("component")
    ).groupBy("node").agg(F.min("component").alias("component"))
    return (
        nodes.join(labels, "node", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    )


def cluster_pages(
    scored_pairs: DataFrame,
    threshold: float,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score: str = "score",
) -> DataFrame:
    """Threshold scored pairs into edges and resolve clusters.

    Reference analog: per-mention argmax over candidate scores
    (``/root/reference/src/inference.py:26``) followed by the collective
    consistency pass; here: edge filter + transitive closure.
    """
    edges = scored_pairs.where(F.col(score) >= threshold).select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    return connected_components(edges)
