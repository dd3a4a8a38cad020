"""Segmentation losses: Lovász-Softmax, generalized soft Dice, NLL.

Ports of the reference's ``lovasz_loss.py`` / ``diceloss.py`` / the NLL term
of ``ln_train.py:156-158``, made shape-static: classes absent from a sample
and ignore-labelled points are masked instead of Python-filtered (the
reference skips absent classes with a data-dependent ``continue`` —
``lovasz_loss.py:49-51`` — which cannot exist under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["lovasz_softmax", "nll_loss", "generalized_dice_loss", "segmentation_loss"]


def _lovasz_grad(gt_sorted: jnp.ndarray, valid_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors (Alg. 1).

    ``gt_sorted`` is the {0,1} ground-truth matrix sorted by descending error
    along the LAST axis (leading axes = classes); ``valid_sorted`` masks out
    ignored/padded points (they contribute to neither intersection nor union).
    """
    gt = gt_sorted * valid_sorted
    gts = jnp.sum(gt, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(gt, axis=-1)
    union = gts + jnp.cumsum((1.0 - gt_sorted) * valid_sorted, axis=-1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate(
        [jaccard[..., :1], jaccard[..., 1:] - jaccard[..., :-1]], axis=-1
    )


def lovasz_softmax(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int = -1,
    point_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-class Lovász-Softmax on log-probabilities.

    Matches ``LovaszSoftmax`` (``lovasz_loss.py:23-72``): probabilities are
    exp(log_probs); per present class, errors |1_{y=c} - p_c| are sorted
    descending and dotted with the Lovász gradient; the mean is over classes
    present in the sample (absent classes carry no penalty).

    All classes sort in ONE batched multi-operand ``lax.sort`` that carries
    gt/valid along as payload operands — the earlier per-class
    argsort-then-gather formulation dispatched 2 batched (C, N) gathers per
    class and dominated the whole train step at KITTI scale.
    """
    n, nr_classes = log_probs.shape
    probs = jnp.exp(log_probs)
    valid = targets != ignore_index
    if point_mask is not None:
        valid = valid & point_mask
    validf = valid.astype(probs.dtype)

    classes = jnp.arange(nr_classes)
    gt = (targets[None, :] == classes[:, None]).astype(probs.dtype) * validf[None, :]
    errors = jnp.abs(gt - probs.T)  # (C, N)
    # ignored points must not influence the sort: push them to the end
    errors = jnp.where(valid[None, :], errors, -1.0)
    neg_s, gt_s, val_s = jax.lax.sort(
        (-errors, gt, jnp.broadcast_to(validf[None, :], gt.shape)), num_keys=1
    )
    err_s = -neg_s
    grad = _lovasz_grad(gt_s, val_s)
    losses = jnp.sum(jnp.maximum(err_s, 0.0) * val_s * grad, axis=-1)  # (C,)
    present = jnp.sum(gt, axis=-1) > 0
    is_ignored = classes == ignore_index
    w = present.astype(probs.dtype) * (1.0 - is_ignored.astype(probs.dtype))
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)


def nll_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int = -1,
    class_weights: jnp.ndarray | None = None,
    point_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """torch.nn.NLLLoss semantics on log-probabilities (``ln_train.py:130``)."""
    n, nr_classes = log_probs.shape
    valid = targets != ignore_index
    if point_mask is not None:
        valid = valid & point_mask
    t = jnp.clip(targets, 0, nr_classes - 1)
    picked = jnp.take_along_axis(log_probs, t[:, None], axis=1)[:, 0]
    w = jnp.ones((n,), log_probs.dtype)
    if class_weights is not None:
        w = jnp.take(class_weights, t)
    w = w * valid.astype(log_probs.dtype)
    return -jnp.sum(picked * w) / jnp.maximum(jnp.sum(w), 1e-12)


def generalized_dice_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int = -1,
    point_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Generalized soft Dice (``diceloss.py:156-221``): per-class 2I/U with the
    ignore class weighted to zero."""
    n, nr_classes = log_probs.shape
    probs = jnp.exp(log_probs)
    valid = targets != ignore_index
    if point_mask is not None:
        valid = valid & point_mask
    validf = valid.astype(probs.dtype)[:, None]
    one_hot = jax.nn.one_hot(targets, nr_classes, dtype=probs.dtype) * validf
    probs = probs * validf

    intersect = jnp.sum(one_hot * probs, axis=0)
    denom = jnp.sum(one_hot + probs, axis=0)
    present = jnp.sum(one_hot, axis=0) > 0
    is_ignored = jnp.arange(nr_classes) == ignore_index
    w = present.astype(probs.dtype) * (1.0 - is_ignored.astype(probs.dtype))
    dice = (2.0 * intersect + 1e-6) / (denom + 1e-6)
    return 1.0 - jnp.sum(dice * w) / jnp.maximum(jnp.sum(w), 1.0)


def segmentation_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int = -1,
    class_weights: jnp.ndarray | None = None,
    point_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """The reference training objective: 0.5 * Lovász + 0.5 * NLL
    (``ln_train.py:156-158``)."""
    return 0.5 * lovasz_softmax(log_probs, targets, ignore_index, point_mask) + 0.5 * nll_loss(
        log_probs, targets, ignore_index, class_weights, point_mask
    )
