"""Streaming metrics as jittable (numerator, denominator) accumulators.

Reproduces the semantics of the reference's metrics stack —
``Metrics`` / ``IncrementalTuple`` / ``MetricsManager``
(/root/reference/dcgan/metrics.py:5-84) and the thresholded frame metrics
(/root/reference/convolutional_gat/utils.py:135-167) — including its quirks,
which the committed baseline numbers depend on:

- ``MetricsManager.update`` binarizes with ``y < threshold`` (inverted
  polarity, metrics.py:73-75),
- ``accuracy`` divides by ``y[0].numel()`` — the per-*sample* element count —
  while summing matches over the whole batch (metrics.py:12-13),
- conv-GAT ``precision``/``recall`` are scaled by ``len(y_true)``
  (convolutional_gat/utils.py:154-167).

TPU-first design: every per-batch computation is a pure jnp function that
can live inside a jitted train/eval step and return a tiny (num, denom)
pair; only those two scalars cross the device->host boundary, never the
tensors themselves.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Pure per-batch metric kernels: each returns jnp.array([num, denom]).
# --------------------------------------------------------------------------
def mse_nd(y, y_hat):
    diff = (y_hat.astype(jnp.float32) - y.astype(jnp.float32)).reshape(-1)
    return jnp.stack([jnp.sum(diff * diff), jnp.float32(diff.size)])


def accuracy_nd(y, y_hat):
    # Denominator is the element count of ONE sample (reference
    # dcgan/metrics.py:13), accumulated once per update.
    return jnp.stack(
        [jnp.sum(y == y_hat).astype(jnp.float32), jnp.float32(y[0].size)]
    )


def precision_nd(y_true, y_pred):
    tp = jnp.sum((y_pred == 1) & (y_true == 1)).astype(jnp.float32)
    fp = jnp.sum((y_pred == 1) & (y_true == 0)).astype(jnp.float32)
    return jnp.stack([tp, tp + fp])


def recall_nd(y_true, y_pred):
    tp = jnp.sum((y_pred == 1) & (y_true == 1)).astype(jnp.float32)
    fn = jnp.sum((y_pred == 0) & (y_true == 1)).astype(jnp.float32)
    return jnp.stack([tp, tp + fn])


METRIC_FNS = {
    "mse": mse_nd,
    "accuracy": accuracy_nd,
    "precision": precision_nd,
    "recall": recall_nd,
}
DISCRETE_METRICS = ("accuracy", "precision", "recall")


def batch_metrics(
    names: tuple[str, ...], y, y_hat, *, discretizing_threshold: float = 0.5
):
    """Compute all requested metrics for one batch. Jit-safe.

    Returns {name: jnp.array([num, denom])}. Binarization uses the
    reference's inverted `<` polarity (dcgan/metrics.py:73-75).
    """
    discrete_y = y < discretizing_threshold
    discrete_y_hat = y_hat < discretizing_threshold
    out = {}
    for name in names:
        fn = METRIC_FNS[name]
        if name in DISCRETE_METRICS:
            out[name] = fn(discrete_y, discrete_y_hat)
        else:
            out[name] = fn(y, y_hat)
    return out


def masked_batch_metrics(
    names: tuple[str, ...],
    y,
    y_hat,
    mask,
    *,
    discretizing_threshold: float = 0.5,
):
    """Mask-exact variant of :func:`batch_metrics` for padded fixed-shape
    batches: padded samples (mask==0) contribute nothing. With an all-ones
    mask the results equal :func:`batch_metrics` exactly."""
    m = jnp.broadcast_to(
        mask.reshape((-1,) + (1,) * (y.ndim - 1)).astype(jnp.float32), y.shape
    )
    dy = (y < discretizing_threshold).astype(jnp.float32)
    dyh = (y_hat < discretizing_threshold).astype(jnp.float32)
    out = {}
    for name in names:
        if name == "mse":
            diff = (y_hat.astype(jnp.float32) - y.astype(jnp.float32)) ** 2
            out[name] = jnp.stack([jnp.sum(diff * m), jnp.sum(m)])
        elif name == "accuracy":
            out[name] = jnp.stack(
                [jnp.sum((dy == dyh).astype(jnp.float32) * m),
                 jnp.float32(y[0].size)]
            )
        elif name == "precision":
            tp = jnp.sum((dyh == 1) * (dy == 1) * m)
            fp = jnp.sum((dyh == 1) * (dy == 0) * m)
            out[name] = jnp.stack([tp, tp + fp])
        elif name == "recall":
            tp = jnp.sum((dyh == 1) * (dy == 1) * m)
            fn = jnp.sum((dyh == 0) * (dy == 1) * m)
            out[name] = jnp.stack([tp, tp + fn])
        else:
            raise ValueError(name)
    return out


# --------------------------------------------------------------------------
# Host-side streaming accumulators.
# --------------------------------------------------------------------------
class IncrementalTuple:
    """(numerator, denominator) ratio accumulator.

    API-compatible with the reference's IncrementalTuple
    (dcgan/metrics.py:29-55): supports +, +=, .item(), .reciprocal().
    """

    def __init__(self, val=None, denom=None):
        if val is None:
            self.val = np.zeros(2, np.float64)
        elif denom is not None:
            self.val = np.array([float(val), float(denom)], np.float64)
        else:
            self.val = np.asarray(val, np.float64).copy()

    def reciprocal(self) -> "IncrementalTuple":
        return IncrementalTuple(
            np.array([self.val[1] - self.val[0], self.val[1]])
        )

    def __add__(self, x):
        return IncrementalTuple(self.val + np.asarray(x.val, np.float64))

    def __iadd__(self, x):
        self.val = self.val + np.asarray(x.val, np.float64)
        return self

    def item(self) -> float:
        denom = self.val[1]
        return float(self.val[0] / denom) if denom != 0 else float("nan")

    def __str__(self):
        return f"{self.item()}"

    def __format__(self, spec):
        return self.item().__format__(spec)


class MetricsManager:
    """Named streaming metrics with a common prefix.

    Mirrors dcgan/metrics.py:58-84 but splits the work TPU-style: the
    heavy reductions run on device inside a jitted step via
    :func:`batch_metrics`; this class only accumulates the resulting
    2-vectors on host.
    """

    def __init__(
        self,
        metrics_names: tuple[str, ...],
        *,
        prefix: str = "",
        discretizing_threshold: float = 0.5,
    ):
        self.names = tuple(metrics_names)
        self.prefix = prefix
        self.discretizing_threshold = discretizing_threshold
        self.metrics = {n: IncrementalTuple() for n in self.names}

    def update(self, y, y_hat):
        """Compute metrics for a batch and accumulate (host entry point)."""
        nd = batch_metrics(
            self.names,
            jnp.asarray(y),
            jnp.asarray(y_hat),
            discretizing_threshold=self.discretizing_threshold,
        )
        self.update_from_nd(nd)

    def update_from_nd(self, nd: dict):
        """Accumulate precomputed {name: [num, denom]} pairs (e.g. returned
        from a jitted eval step)."""
        for name, pair in nd.items():
            self.metrics[name] += IncrementalTuple(np.asarray(pair))

    def results(self) -> dict[str, float]:
        return {
            f"{self.prefix}_{k}": v.item() for k, v in self.metrics.items()
        }


# --------------------------------------------------------------------------
# Thresholded frame metrics (conv-GAT flavour).
# --------------------------------------------------------------------------
def thresholded_metrics(y, y_hat, threshold):
    """acc/prec/recall after binarizing both tensors at ``threshold``.

    Matches convolutional_gat/utils.py:135-167: accuracy divides by the
    element count of one sample; precision/recall are multiplied by the
    batch length. Returns a (3,) array [acc, prec, rec]; prec/rec are NaN
    when undefined (caller zeroes them, as train.py:67-68 does).
    """
    yb = (y >= threshold).astype(jnp.float32)
    pb = (y_hat >= threshold).astype(jnp.float32)
    n = jnp.float32(y.shape[0])
    acc = jnp.sum(yb == pb) / jnp.float32(y[0].size)
    tp = jnp.sum((pb == 1) & (yb == 1)).astype(jnp.float32)
    fp = jnp.sum((pb == 1) & (yb == 0)).astype(jnp.float32)
    fn = jnp.sum((pb == 0) & (yb == 1)).astype(jnp.float32)
    prec = tp / (tp + fp) * n
    rec = tp / (tp + fn) * n
    return jnp.stack([acc, prec, rec])


def get_metrics(y, y_hat, threshold):
    """Host-facing clone of convolutional_gat/utils.py:135-147."""
    out = np.asarray(thresholded_metrics(jnp.asarray(y), jnp.asarray(y_hat), threshold))
    return out[0], out[1], out[2]


def nowcast_scores(y, y_hat, threshold, *, mask=None):
    """Weather-nowcasting skill scores on thresholded rain masks.

    The reference carries these only as a commented-out block
    (convolutional_gat/utils.py:273-305: F1, CSI, FAR); here they are live:

    - f1:  2 * precision * recall / (precision + recall)
    - csi: critical success index TP / (TP + FN + FP)
    - far: false alarm ratio FP / (TP + FP)

    Returns {"f1", "csi", "far"} scalars (NaN when undefined, as the
    reference's formulas would produce).
    """
    yb = (y >= threshold).astype(jnp.float32)
    pb = (y_hat >= threshold).astype(jnp.float32)
    if mask is not None:
        m = jnp.broadcast_to(
            mask.reshape((-1,) + (1,) * (y.ndim - 1)).astype(jnp.float32),
            y.shape,
        )
    else:
        m = jnp.ones_like(yb)
    tp = jnp.sum((pb == 1) * (yb == 1) * m)
    fp = jnp.sum((pb == 1) * (yb == 0) * m)
    fn = jnp.sum((pb == 0) * (yb == 1) * m)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return {
        "f1": 2 * precision * recall / (precision + recall),
        "csi": tp / (tp + fn + fp),
        "far": fp / (tp + fp),
    }


def rounded_match_nd(a, b):
    """dcgan/utils.py:71-74 ``accuracy_criterion``: fraction of label
    predictions that round to the target. Returns [num, denom]."""
    return jnp.stack(
        [
            jnp.sum(jnp.round(a) == jnp.round(b)).astype(jnp.float32),
            jnp.float32(a.shape[0]),
        ]
    )


def accuracy_criterion(a, b) -> IncrementalTuple:
    return IncrementalTuple(np.asarray(rounded_match_nd(jnp.asarray(a), jnp.asarray(b))))


def denormalize(x, mean, var):
    """Clone of dcgan/metrics.py:102-105 (x * var + mean, scalar-reduced)."""
    return x * jnp.var(var) + jnp.mean(mean)
