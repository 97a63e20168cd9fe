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


def score_from_counts(
    tp: np.ndarray,
    pred_cnt: np.ndarray,
    true_cnt: np.ndarray,
    metric: str = "f1",
    f1_average: str = "macro",
) -> float:
    """`eval_metric` computed from per-class confusion counts.

    Lets jitted eval loops stream O(num_classes) count vectors off device
    instead of O(N) prediction arrays (the D2H term dominates scan-mode
    epochs on slow host links). Bin layout follows the device encoding:
    bin c < C is class c; an optional final bin holds y == -1 rows (never
    predicted), matching sklearn's treatment of -1 as a distinct label —
    macro-F1 averages over bins present in y_true or y_pred, exactly
    sklearn's label set."""
    tp = np.asarray(tp, dtype=np.float64)
    pred_cnt = np.asarray(pred_cnt, dtype=np.float64)
    true_cnt = np.asarray(true_cnt, dtype=np.float64)
    if metric == "acc":
        total = true_cnt.sum()
        return float(tp.sum() / total) if total > 0 else 0.0
    if metric != "f1":
        raise ValueError(
            f"counts-based scoring supports f1/acc, got {metric!r}")
    prec = np.divide(tp, pred_cnt, out=np.zeros_like(tp),
                     where=pred_cnt > 0)
    rec = np.divide(tp, true_cnt, out=np.zeros_like(tp),
                    where=true_cnt > 0)
    denom = prec + rec
    f1 = np.divide(2.0 * prec * rec, denom, out=np.zeros_like(tp),
                   where=denom > 0)
    if f1_average == "binary":
        return float(f1[1])
    if f1_average != "macro":
        raise ValueError(
            "counts-based scoring supports f1_average in "
            f"{{'macro', 'binary'}}, got {f1_average!r}")
    present = (true_cnt > 0) | (pred_cnt > 0)
    return float(f1[present].mean()) if present.any() else 0.0
