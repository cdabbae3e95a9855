"""Evaluation metrics beyond accuracy (new scope; the reference reports
accuracy only — which is meaningless for ogbg-molhiv's ~3.5%-positive class
balance, where the official OGB metric is ROC-AUC)."""
from __future__ import annotations

import numpy as np


def roc_auc_score(y_true, y_score) -> float:
    """Binary ROC-AUC via the rank-sum (Mann-Whitney U) identity, with
    average ranks for tied scores — matches sklearn.metrics.roc_auc_score.

    Args:
      y_true:  [N] 0/1 labels.
      y_score: [N] scores for the positive class (any monotone scale —
               probabilities, logits, log-probs all give the same AUC).
    """
    y_true = np.asarray(y_true).astype(np.int64).ravel()
    y_score = np.asarray(y_score, np.float64).ravel()
    n_pos = int((y_true == 1).sum())
    n_neg = int((y_true == 0).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(y_score, kind="mergesort")
    ranks = np.empty(len(y_score), np.float64)
    sorted_s = y_score[order]
    # average rank within tied groups
    uniq_inv = np.cumsum(np.concatenate(
        [[0], (np.diff(sorted_s) != 0).astype(np.int64)]))
    counts = np.bincount(uniq_inv)
    cum = np.cumsum(counts)
    avg_rank = cum - (counts - 1) / 2.0
    ranks[order] = avg_rank[uniq_inv]
    r_pos = ranks[y_true == 1].sum()
    return float((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))
