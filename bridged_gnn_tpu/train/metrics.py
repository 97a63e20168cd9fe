"""Host-side evaluation metrics.

Mirrors the reference's sklearn usage (scripts.py:18,
main_graph_knowledge_transfer.py:30): macro/binary F1, ROC-AUC, accuracy.
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import accuracy_score, f1_score, roc_auc_score


def eval_metric(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    metric: str = "f1",
    f1_average: str = "macro",
    probs_pos: np.ndarray | None = None,
) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if metric == "f1":
        return float(f1_score(y_true, y_pred, average=f1_average))
    if metric == "auc":
        assert probs_pos is not None
        return float(roc_auc_score(y_true, probs_pos))
    if metric == "acc":
        return float(accuracy_score(y_true, y_pred))
    raise ValueError(f"unknown metric: {metric}")
