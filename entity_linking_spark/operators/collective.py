"""Collective (per-document) candidate refinement — one-round max-product
message passing on a star factor graph.

Numpy re-derivation of the reference's collective stage
(/root/reference/src/max_product.py:8-82, orchestration
src/cv_compat.py:88-120): per document, every mention's candidate scores
become log-softmax *emissions* (after min-max scaling), pairwise factors
are cosine compatibilities between candidate description vectors
(normalized to a log distribution per mention pair, uniform fallback when
all-zero), and each mention picks the argmax of
``emission + mean(max-product messages from the other mentions)``.

Spark shape (SURVEY §2.10): ``groupBy("doc_id").applyInPandas`` — the
grouped-map (UDTF-shaped) pandas UDF, one Arrow batch per document. This is
the only stage where per-group imperative logic is genuinely needed; block
sizes are bounded (top-k prune upstream), so groups stay small by
construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def emissions_from_scores(scores: np.ndarray) -> np.ndarray:
    """Min-max scale then log-softmax (max_product.py:8-21). Uniform
    (log 1 = 0) when all scores are equal."""
    mn = scores.min()
    scale = scores.max() - mn
    if scale == 0.0:
        return np.zeros_like(scores, dtype=np.float64)
    z = (scores - mn) / scale
    e = np.exp(z - z.max())
    return np.log(e / e.sum())


def _log_factor(compat: np.ndarray) -> np.ndarray:
    """Normalize a raw compatibility factor to log-space
    (max_product.py:50-57): log(result/sum), uniform when sum == 0."""
    s = compat.sum()
    if s == 0.0:
        return np.log(np.ones_like(compat) / compat.size)
    with np.errstate(divide="ignore"):
        return np.log(compat / s)


def mp_tree_depth_1(
    root_emission: np.ndarray,
    leaf_emissions: list[np.ndarray],
    compat_with_root: list[np.ndarray],
) -> int:
    """One root's argmax after receiving max-product messages from each
    leaf (max_product.py:60-73). compat[leaf_opt, root_opt]."""
    if len(leaf_emissions) == 0:
        return int(np.argmax(root_emission))
    messages = [
        np.max(em.reshape(-1, 1) + compat, axis=0)
        for em, compat in zip(leaf_emissions, compat_with_root)
    ]
    stacked = np.stack(messages)
    root_scores = root_emission + stacked.sum(axis=0) / len(messages)
    return int(np.argmax(root_scores))


def refine_document(
    mention_ids: list,
    candidate_ids: list[list],
    scores: list[np.ndarray],
    desc_vecs: dict,
    top_k: int = 5,
) -> dict:
    """→ {mention_id: winning candidate_id} for one document.

    Mirrors cv_compat.py:97-120: emissions → top-k prune → cosine compat
    factors → mp_shallow_tree argmax per mention-as-root.
    """
    emissions, top_cands = [], []
    for cand_ids, sc in zip(candidate_ids, scores):
        em = emissions_from_scores(np.asarray(sc, dtype=np.float64))
        order = np.argsort(-em, kind="stable")[:top_k]
        emissions.append(em[order])
        top_cands.append([cand_ids[i] for i in order])

    def cos(a_id, b_id) -> float:
        va, vb = desc_vecs.get(a_id), desc_vecs.get(b_id)
        if va is None or vb is None:
            return 0.0
        num = float(np.dot(va, vb))
        div = float(np.linalg.norm(va) * np.linalg.norm(vb))
        return num / div if div > 0 else 0.0

    out = {}
    n = len(mention_ids)
    for root in range(n):
        leaf_emissions, factors = [], []
        for leaf in range(n):
            if leaf == root:
                continue
            raw = np.array(
                [
                    [cos(lc, rc) for rc in top_cands[root]]
                    for lc in top_cands[leaf]
                ]
            )
            factors.append(_log_factor(raw))
            leaf_emissions.append(emissions[leaf])
        win = mp_tree_depth_1(emissions[root], leaf_emissions, factors)
        out[mention_ids[root]] = top_cands[root][win]
    return out


def collective_top1(
    candidates: DataFrame,
    doc_col: str = "doc_id",
    mention_col: str = "mention_id",
    cand_col: str = "candidate_id",
    score_col: str = "score",
    vec_col: str = "desc_vec",
    top_k: int = 5,
) -> DataFrame:
    """(doc, mention, candidate, score, desc_vec) → (doc, mention, winner).

    One Arrow batch per document via applyInPandas — the reference's
    groupby(mention_doc_id) loop (cv_compat.py:88-92) distributed.
    """

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        # intra-group Arrow batch order is shuffle-dependent; sort so
        # candidate order (and therefore every argmax tie-break) is a
        # deterministic function of the data, not of task scheduling
        pdf = pdf.sort_values([mention_col, cand_col], kind="mergesort")
        doc = pdf[doc_col].iloc[0]
        mention_ids, cand_lists, score_lists = [], [], []
        vecs = {}
        for mid, grp in pdf.groupby(mention_col, sort=True):
            mention_ids.append(mid)
            cand_lists.append(grp[cand_col].tolist())
            score_lists.append(grp[score_col].to_numpy(dtype=np.float64))
            for cid, v in zip(grp[cand_col], grp[vec_col]):
                if v is not None:
                    vecs[cid] = np.asarray(v, dtype=np.float64)
        wins = refine_document(mention_ids, cand_lists, score_lists, vecs, top_k)
        return pd.DataFrame(
            {
                doc_col: [doc] * len(wins),
                mention_col: list(wins.keys()),
                "winner_id": list(wins.values()),
            }
        )

    out_schema = (
        f"{doc_col} long, {mention_col} long, winner_id long"
    )
    return candidates.groupBy(doc_col).applyInPandas(per_doc, out_schema)
