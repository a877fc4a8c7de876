"""Host-side evaluation metrics, matching the reference exactly.

All functions operate on numpy arrays (metrics are cheap and run on host,
as in the reference which uses sklearn/scipy: train_tcga.py:134-168,406-417,
train_mil.py:82-97).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    balanced_accuracy_score,
    hamming_loss,
    precision_recall_fscore_support,
    roc_auc_score,
    roc_curve,
)


def optimal_thresh(fpr, tpr, thresholds, p: float = 0.0):
    """Threshold minimising ``(fpr - tpr) - p * tpr / (fpr + tpr + 1)``
    (train_tcga.py:165-168; p=0 reduces to a Youden-like criterion)."""
    loss = (fpr - tpr) - p * tpr / (fpr + tpr + 1)
    idx = np.argmin(loss, axis=0)
    return fpr[idx], tpr[idx], thresholds[idx]


def multi_label_roc(labels: np.ndarray, predictions: np.ndarray, num_classes: int,
                    ) -> Tuple[List[float], List[np.ndarray], List[float]]:
    """Per-class AUC + optimal thresholds. A fold whose test split contains a
    single class gets AUC := 1, reproducing the reference's fallback
    (train_tcga.py:150-158)."""
    if predictions.ndim == 1:
        predictions = predictions[:, None]
    if labels.ndim == 1:
        labels = labels[:, None]
    aucs, thresholds, thresholds_optimal = [], [], []
    for c in range(num_classes):
        label = labels[:, c]
        prediction = predictions[:, c]
        fpr, tpr, threshold = roc_curve(label, prediction, pos_label=1)
        _, _, threshold_optimal = optimal_thresh(fpr, tpr, threshold)
        if len(np.unique(label)) < 2:
            c_auc = 1.0
        else:
            c_auc = roc_auc_score(label, prediction)
        aucs.append(float(c_auc))
        thresholds.append(threshold)
        thresholds_optimal.append(float(threshold_optimal))
    return aucs, thresholds, thresholds_optimal


def binarize(predictions: np.ndarray, thresholds: Sequence[float]) -> np.ndarray:
    """Per-class threshold binarisation (train_tcga.py:113-124)."""
    preds = np.array(predictions, dtype=np.float64, copy=True)
    if preds.ndim == 1:
        return (preds >= thresholds[0]).astype(np.float64)
    out = np.zeros_like(preds)
    for c in range(preds.shape[1]):
        out[:, c] = preds[:, c] >= thresholds[c]
    return out


def exact_match_score(labels: np.ndarray, binary_predictions: np.ndarray) -> float:
    """Fraction of bags whose full label vector is matched exactly
    (train_tcga.py:125-128). 1-D inputs are interpreted as one bag per entry
    (binary task)."""
    labels = np.asarray(labels)
    binary_predictions = np.asarray(binary_predictions)
    if labels.ndim == 1:
        labels = labels[:, None]
    if binary_predictions.ndim == 1:
        binary_predictions = binary_predictions[:, None]
    return float(np.mean(np.all(labels == binary_predictions, axis=-1)))


def five_scores(bag_labels, bag_predictions) -> Tuple[float, float, float, float, float]:
    """accuracy/AUC/precision/recall/F1 at the optimal threshold
    (train_mil.py:87-97)."""
    bag_labels = np.asarray(bag_labels, dtype=np.float64)
    bag_predictions = np.asarray(bag_predictions, dtype=np.float64)
    fpr, tpr, threshold = roc_curve(bag_labels, bag_predictions, pos_label=1)
    _, _, threshold_optimal = optimal_thresh(fpr, tpr, threshold)
    auc_value = roc_auc_score(bag_labels, bag_predictions)
    binary = (bag_predictions >= threshold_optimal).astype(int)
    precision, recall, fscore, _ = precision_recall_fscore_support(
        bag_labels.astype(int), binary, average="binary", zero_division=0)
    accuracy = 1.0 - np.count_nonzero(bag_labels.astype(int) - binary) / len(bag_labels)
    return float(accuracy), float(auc_value), float(precision), float(recall), float(fscore)


def current_score(avg_score: float, aucs: Sequence[float]) -> float:
    """Model-selection criterion ``(sum(aucs) + accuracy) / 2``
    (train_tcga.py:179-181)."""
    return (sum(aucs) + avg_score) / 2.0


def standalone_test_metrics(labels: np.ndarray, combined_predictions: np.ndarray,
                            num_classes: int) -> dict:
    """Final metrics of the standalone-test scheme (train_tcga.py:406-417)."""
    if num_classes > 1:
        return {
            "hamming_loss": float(hamming_loss(labels, combined_predictions)),
            "subset_accuracy": float(accuracy_score(labels, combined_predictions)),
        }
    labels = np.atleast_1d(np.squeeze(np.asarray(labels)))
    combined_predictions = np.atleast_1d(np.squeeze(np.asarray(combined_predictions)))
    return {
        "accuracy": float(accuracy_score(labels, combined_predictions)),
        "balanced_accuracy": float(balanced_accuracy_score(labels, combined_predictions)),
    }
