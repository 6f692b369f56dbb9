"""Verification metrics: accuracy, FAR, FRR, EER, ROC-AUC, DET inputs.

Parity with ``signature_verifier_eval.py:398-505``
(compute_verification_metrics / compute_eer_from_scores): identical keys and
formulas — FAR = FP/(FP+TN), FRR = FN/(FN+TP), EER at argmin|FPR-FNR| on the
ROC curve, precision/recall/F1/specificity, confusion counts. sklearn
provides the curve computations, as in the reference.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from sklearn.metrics import accuracy_score, auc, confusion_matrix, roc_curve


def compute_verification_metrics(y_true: np.ndarray, y_scores: np.ndarray,
                                 y_pred: np.ndarray, threshold: float = 0.5
                                 ) -> Dict[str, float]:
    accuracy = accuracy_score(y_true, y_pred)
    tn, fp, fn, tp = confusion_matrix(y_true, y_pred, labels=[0, 1]).ravel()

    total_forgeries = fp + tn
    far = fp / total_forgeries if total_forgeries > 0 else 0.0
    total_genuine = fn + tp
    frr = fn / total_genuine if total_genuine > 0 else 0.0
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) > 0 else 0.0)
    specificity = tn / (tn + fp) if (tn + fp) > 0 else 0.0

    fpr, tpr, roc_thresholds = roc_curve(y_true, y_scores)
    roc_auc = auc(fpr, tpr)
    fnr = 1 - tpr
    eer_idx = int(np.nanargmin(np.abs(fpr - fnr)))
    eer = (fpr[eer_idx] + fnr[eer_idx]) / 2
    eer_threshold = (roc_thresholds[eer_idx]
                     if len(roc_thresholds) > eer_idx else threshold)
    if not np.isfinite(eer_threshold):
        # sklearn >= 1.3 prepends an inf threshold to roc_curve; a
        # degenerate (constant-score) verifier then lands argmin on it.
        # inf would serialize as invalid JSON and break the EER plot line.
        finite = roc_thresholds[np.isfinite(roc_thresholds)]
        eer_threshold = float(finite.max()) if len(finite) else float(threshold)

    return {
        "accuracy": float(accuracy),
        "far": float(far),
        "frr": float(frr),
        "eer": float(eer),
        "eer_threshold": float(eer_threshold),
        "precision": float(precision),
        "recall": float(recall),
        "f1_score": float(f1),
        "specificity": float(specificity),
        "roc_auc": float(roc_auc),
        "true_positives": int(tp),
        "true_negatives": int(tn),
        "false_positives": int(fp),
        "false_negatives": int(fn),
        "total_genuine": int(total_genuine),
        "total_forgeries": int(total_forgeries),
        "threshold": float(threshold),
    }


def compute_eer_from_scores(y_true: np.ndarray, y_scores: np.ndarray
                            ) -> Tuple[float, float]:
    fpr, tpr, thresholds = roc_curve(y_true, y_scores)
    fnr = 1 - tpr
    eer_idx = int(np.nanargmin(np.abs(fpr - fnr)))
    eer = (fpr[eer_idx] + fnr[eer_idx]) / 2
    eer_threshold = thresholds[eer_idx] if len(thresholds) > eer_idx else 0.5
    return float(eer), float(eer_threshold)


def roc_points(y_true: np.ndarray, y_scores: np.ndarray):
    return roc_curve(y_true, y_scores)


def det_points(y_true: np.ndarray, y_scores: np.ndarray):
    """(FPR, FNR) pairs for log-log DET plotting."""
    fpr, tpr, _ = roc_curve(y_true, y_scores)
    return fpr, 1 - tpr
