"""Collective max-product refinement goldens — hand-computed numerics in
the style of /root/reference/test/max_product_test.py, plus the Spark
grouped-map path."""

import math

import numpy as np
import pytest

from entity_linking_spark.operators.collective import (
    collective_top1,
    emissions_from_scores,
    mp_tree_depth_1,
    refine_document,
)


def test_emissions_minmax_logsoftmax():
    em = emissions_from_scores(np.array([1.0, 3.0]))
    # scaled = [0, 1]; softmax = [1/(1+e), e/(1+e)]
    want0 = math.log(1 / (1 + math.e))
    want1 = math.log(math.e / (1 + math.e))
    assert abs(em[0] - want0) < 1e-12
    assert abs(em[1] - want1) < 1e-12


def test_emissions_flat_scores_uniform():
    em = emissions_from_scores(np.array([2.0, 2.0, 2.0]))
    assert np.allclose(em, 0.0)  # log(1) per reference max_product.py:16


def test_mp_no_leaves_is_argmax():
    assert mp_tree_depth_1(np.array([-1.0, -0.5]), [], []) == 1


def test_mp_message_flips_root():
    # root alone prefers option 0; a leaf strongly compatible with root
    # option 1 flips the decision
    root_em = np.array([math.log(0.55), math.log(0.45)])
    leaf_em = np.array([0.0])  # single-candidate leaf
    compat = np.log(np.array([[0.01, 0.99]]))  # leaf cand ↔ root option 1
    win = mp_tree_depth_1(root_em, [leaf_em], [compat])
    assert win == 1


def test_refine_document_golden():
    # two mentions; mention B's scores are ambiguous, mention A is sure.
    # A's winner (cand 10) has identical desc to B's cand 21 → B flips to 21.
    vecs = {
        10: np.array([1.0, 0.0]),
        11: np.array([0.0, 1.0]),
        20: np.array([0.0, 1.0]),
        21: np.array([1.0, 0.0]),
    }
    wins = refine_document(
        mention_ids=["A", "B"],
        candidate_ids=[[10, 11], [20, 21]],
        scores=[np.array([0.9, 0.1]), np.array([0.5, 0.5])],
        desc_vecs=vecs,
    )
    assert wins["A"] == 10
    assert wins["B"] == 21


def test_collective_top1_spark(spark):
    rows = [
        # doc 1, mention 1: certain (cand 10)
        (1, 1, 10, 0.9, [1.0, 0.0]),
        (1, 1, 11, 0.1, [0.0, 1.0]),
        # doc 1, mention 2: tie — compat with cand 10 must break it to 21
        (1, 2, 20, 0.5, [0.0, 1.0]),
        (1, 2, 21, 0.5, [1.0, 0.0]),
        # doc 2: single mention, plain argmax
        (2, 7, 30, 0.2, [1.0, 1.0]),
        (2, 7, 31, 0.8, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, mention_id long, candidate_id long, score double,"
        " desc_vec array<double>",
    )
    out = {
        (r["doc_id"], r["mention_id"]): r["winner_id"]
        for r in collective_top1(df).collect()
    }
    assert out == {(1, 1): 10, (1, 2): 21, (2, 7): 31}
