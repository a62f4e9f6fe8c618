"""GBT (non-linear) learned ranker end-to-end (round-2 verdict item 3):
train on labeled pair features EXPORTED THROUGH the libsvm qid sink and
read back through the source (proving S15 end-to-end as the training
input), then run the full pipeline with the tree model — F1 ≥ 0.99.

Reference precedent: XGBoost ``rank:pairwise`` / MLP swapped behind one
interface (/root/reference/src/train_xgboost.py:26-34, src/ltr_bow.py:33-67,
src/eval_ltr_bow_model.py:29-45).
"""

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.datagen import write_parquet
from entity_linking_spark.operators.scoring import GBTScorer, train_gbt_scorer
from entity_linking_spark.plans.pipeline import (
    LinkageConfig,
    link_pages,
    pairwise_metrics,
    score_candidate_pairs,
)
from entity_linking_spark.sources.libsvm import read_libsvm_qid, write_libsvm_qid

FEATURES = ["tfidf_cos", "jaccard", "str_sim", "jw_sim"]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gbt_corpus")
    write_parquet(str(d), n_entities=25, seed=7)
    pages = spark.read.parquet(f"{d}/pages.parquet")
    labeled = spark.read.parquet(f"{d}/labeled_pairs.parquet")
    return pages, labeled


def _labeled_features(pages, labeled):
    # training recipe mirrors the reference's: labeled pairs PLUS candidate
    # pairs absent from the labels as negatives (the reference pads training
    # batches with sampled negatives, data_fetchers.py:80-89). Sound here
    # because datagen's positives are exhaustive within clusters, so an
    # unlabeled candidate pair is never a positive. Trees need this: a
    # feature combination never seen in training lands in an arbitrary
    # leaf, unlike the monotone linear scorers.
    feats = score_candidate_pairs(pages)
    lab = labeled.select(
        F.least("url_a", "url_b").alias("id_a"),
        F.greatest("url_a", "url_b").alias("id_b"),
        "label",
    )
    return feats.join(lab, ["id_a", "id_b"], "left").withColumn(
        "label", F.coalesce("label", F.lit(0))
    )


def test_gbt_scorer_via_libsvm_roundtrip_e2e_f1(corpus, spark, tmp_path_factory):
    pages, labeled = corpus
    feats = _labeled_features(pages, labeled).withColumn(
        "qid", F.xxhash64("id_a")
    )
    path = str(tmp_path_factory.mktemp("ltr") / "train_libsvm")
    write_libsvm_qid(
        feats, path, label_col="label", qid_col="qid", feature_cols=FEATURES
    )
    train = read_libsvm_qid(spark, path).select(
        "label",
        *[F.col("features")[i].alias(c) for i, c in enumerate(FEATURES)],
    )
    model = train_gbt_scorer(train, feature_cols=FEATURES)
    assert isinstance(model, GBTScorer)
    clusters = link_pages(pages, config=LinkageConfig(model=model))
    m = pairwise_metrics(clusters, labeled)
    assert m["f1"] >= 0.99, m


def test_gbt_inference_is_jvm_side(corpus):
    # the fitted ensemble applies via model.transform — no row-at-a-time
    # Python; the only Python eval nodes are the Arrow feature UDFs
    pages, labeled = corpus
    model = train_gbt_scorer(_labeled_features(pages, labeled))
    scored = score_candidate_pairs(pages, config=LinkageConfig(model=model))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "score" in scored.columns


def test_ranking_metrics_hand_golden(spark):
    # 3 qid groups with known outcomes:
    #   g1: positive ranked 1st  -> hit, rr = 1
    #   g2: positive ranked 2nd  -> miss, rr = 1/2
    #   g3: no positive          -> miss, rr = 0
    from entity_linking_spark.operators.scoring import ranking_metrics

    df = spark.createDataFrame(
        [
            (1, 0.9, 1, "a"), (1, 0.5, 0, "b"),
            (2, 0.9, 0, "a"), (2, 0.5, 1, "b"), (2, 0.1, 0, "c"),
            (3, 0.9, 0, "a"), (3, 0.5, 0, "b"),
        ],
        "qid long, score double, label long, cand string",
    )
    m = ranking_metrics(df, tiebreak_col="cand")
    assert m["n_groups"] == 3
    assert abs(m["p_at_1"] - 1 / 3) < 1e-9
    assert abs(m["mrr"] - (1 + 0.5 + 0) / 3) < 1e-9


def test_learned_scorers_rank_qid_groups(corpus, spark, tmp_path_factory):
    # the qid field is semantically exercised: per-mention-group
    # precision@1 / MRR for BOTH learned scorers, trained through the
    # libsvm qid round-trip, must beat the fixed-weight baseline
    # (reference: rank:pairwise over qid groups, train_xgboost.py:26-34;
    # eval is per-mention argmax, inference.py:26)
    from entity_linking_spark.operators.scoring import (
        linear_score,
        ranking_metrics,
        train_gbt_scorer,
        train_pair_scorer,
    )

    pages, labeled = corpus
    feats = _labeled_features(pages, labeled).withColumn(
        "qid", F.xxhash64("id_a")
    ).persist()
    path = str(tmp_path_factory.mktemp("ltr_rank") / "train_libsvm")
    write_libsvm_qid(
        feats, path, label_col="label", qid_col="qid", feature_cols=FEATURES
    )
    train = read_libsvm_qid(spark, path).select(
        "label", "qid",
        *[F.col("features")[i].alias(c) for i, c in enumerate(FEATURES)],
    )
    # only groups that contain a positive are rankable mention groups
    rankable = feats.join(
        feats.where(F.col("label") == 1).select("qid").distinct(), "qid"
    )

    base = ranking_metrics(
        rankable.withColumn("score", linear_score()), tiebreak_col="id_b"
    )

    gbt = train_gbt_scorer(train, feature_cols=FEATURES)
    m_gbt = ranking_metrics(
        gbt.attach_score(rankable.drop("score")), tiebreak_col="id_b"
    )
    logit = train_pair_scorer(train, feature_cols=FEATURES)
    m_log = ranking_metrics(
        rankable.withColumn("score", logit.column()), tiebreak_col="id_b"
    )

    for m in (m_gbt, m_log):
        assert m["n_groups"] == base["n_groups"] > 0
        assert m["p_at_1"] >= base["p_at_1"], (m, base)
        assert m["p_at_1"] >= 0.95, (m, base)
        assert m["mrr"] >= m["p_at_1"] - 1e-9
    feats.unpersist()


def test_ranking_metrics_tie_determinism_guard(spark):
    # round-4 verdict item 8: tied scores without a tiebreak column are
    # partition-order dependent — the API must not be silently
    # nondeterministic. Deliberate ties in every group:
    import warnings

    from entity_linking_spark.operators.scoring import ranking_metrics

    df = spark.createDataFrame(
        [
            (1, 0.5, 1, "a"), (1, 0.5, 0, "b"),
            (2, 0.5, 0, "a"), (2, 0.5, 1, "b"),
        ],
        "qid long, score double, label long, cand string",
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ranking_metrics(df)
    assert any("tiebreak" in str(w.message) for w in rec)
    # with a stable tiebreak the tied groups resolve deterministically:
    # 'a' ranks first in both groups -> g1 hit, g2 first positive at rank 2
    m = ranking_metrics(df, tiebreak_col="cand")
    assert m["p_at_1"] == pytest.approx(0.5)
    assert m["mrr"] == pytest.approx((1.0 + 0.5) / 2)
    assert ranking_metrics(df, tiebreak_col="cand") == m
