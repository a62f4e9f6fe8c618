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
