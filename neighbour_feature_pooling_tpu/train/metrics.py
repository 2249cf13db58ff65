"""Classification metrics as pure jnp reductions.

Replaces the reference's torchmetrics suite (``/root/reference/
lightning_wrappers/Lightning_Wrapper.py:41-55``): multiclass accuracy
(micro) and macro F1 / precision / recall, plus the confusion matrix used for
the test-time heatmap (``Lightning_Wrapper.py:164-188``).

Everything is derived from one confusion-matrix accumulator so a whole
epoch's metrics cost a single (K, K) integer array carried through the jitted
eval step — no host sync per batch.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = [
    "confusion_matrix_update",
    "metrics_from_confusion",
    "metrics_from_confusion_np",
    "init_confusion",
]


def init_confusion(num_classes: int) -> jax.Array:
    return jnp.zeros((num_classes, num_classes), jnp.int32)


def confusion_matrix_update(cm: jax.Array, logits: jax.Array,
                            labels: jax.Array,
                            weights: jax.Array | None = None) -> jax.Array:
    """Accumulate predictions into a (K, K) confusion matrix (rows = true).

    ``weights`` (0/1 per example) masks padding examples in the final,
    partially-filled batch of an epoch.
    """
    k = cm.shape[0]
    preds = jnp.argmax(logits, axis=-1)
    if weights is None:
        weights = jnp.ones_like(labels)
    onehot = (jax.nn.one_hot(labels, k, dtype=jnp.int32)[:, :, None]
              * jax.nn.one_hot(preds, k, dtype=jnp.int32)[:, None, :])
    return cm + jnp.sum(onehot * weights[:, None, None].astype(jnp.int32),
                        axis=0)


def metrics_from_confusion(cm: jax.Array, eps: float = 1e-12
                           ) -> Dict[str, jax.Array]:
    """Accuracy + macro precision/recall/F1 from a confusion matrix.

    ``accuracy`` follows the reference's metric: torchmetrics
    ``Accuracy(task="multiclass")`` defaults to **macro** averaging (mean of
    per-class recall over classes present in the targets) — this is the
    val_acc the reference's ModelCheckpoint selects on. ``micro_accuracy``
    (plain fraction correct) is also reported. Zero-division handling
    follows torchmetrics: a class with no predictions (or no true samples)
    contributes 0.
    """
    cm = cm.astype(jnp.float32)
    total = jnp.sum(cm)
    tp = jnp.diagonal(cm)
    true_per_class = jnp.sum(cm, axis=1)
    pred_per_class = jnp.sum(cm, axis=0)

    micro = jnp.sum(tp) / jnp.maximum(total, 1.0)
    precision = jnp.where(pred_per_class > 0, tp / (pred_per_class + eps), 0.0)
    recall = jnp.where(true_per_class > 0, tp / (true_per_class + eps), 0.0)
    f1 = jnp.where(precision + recall > 0,
                   2 * precision * recall / (precision + recall + eps), 0.0)
    present = (true_per_class > 0).astype(jnp.float32)
    macro_acc = jnp.sum(recall * present) / jnp.maximum(jnp.sum(present), 1.0)
    return {
        "accuracy": macro_acc,
        "micro_accuracy": micro,
        "precision": jnp.mean(precision),
        "recall": jnp.mean(recall),
        "f1": jnp.mean(f1),
    }


def metrics_from_confusion_np(cm, eps: float = 1e-12):
    """Pure-numpy twin of :func:`metrics_from_confusion` for HOST-side
    post-processing (e.g. materializing an epoch's buffered per-step
    confusion updates in one transfer) — no device dispatch per call."""
    import numpy as np

    cm = np.asarray(cm, np.float32)
    total = cm.sum()
    tp = np.diagonal(cm)
    true_per_class = cm.sum(axis=1)
    pred_per_class = cm.sum(axis=0)
    micro = tp.sum() / max(total, 1.0)
    precision = np.where(pred_per_class > 0, tp / (pred_per_class + eps), 0.0)
    recall = np.where(true_per_class > 0, tp / (true_per_class + eps), 0.0)
    f1 = np.where(precision + recall > 0,
                  2 * precision * recall / (precision + recall + eps), 0.0)
    present = (true_per_class > 0).astype(np.float32)
    macro_acc = float((recall * present).sum() / max(present.sum(), 1.0))
    return {
        "accuracy": macro_acc,
        "micro_accuracy": float(micro),
        "precision": float(precision.mean()),
        "recall": float(recall.mean()),
        "f1": float(f1.mean()),
    }
