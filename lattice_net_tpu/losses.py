"""Segmentation losses: Lovász-Softmax, generalized soft Dice, NLL.

Ports of the reference's ``lovasz_loss.py`` / ``diceloss.py`` / the NLL term
of ``ln_train.py:156-158``, made shape-static: classes absent from a sample
and ignore-labelled points are masked instead of Python-filtered (the
reference skips absent classes with a data-dependent ``continue`` —
``lovasz_loss.py:49-51`` — which cannot exist under jit).
"""

from __future__ import annotations

import os

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


def _lovasz_from_errors(errors, gt, validf, w):
    """Loss given per-class errors (C, N) already sentinel-masked: one
    batched descending sort, Lovász-grad dot, class-present mean."""
    neg_s, gt_s, val_s = jax.lax.sort(
        (-errors, gt, jnp.broadcast_to(validf[None, :], gt.shape)), num_keys=1
    )
    err_s = -neg_s
    grad = _lovasz_grad(gt_s, val_s)
    losses = jnp.sum(jnp.maximum(err_s, 0.0) * val_s * grad, axis=-1)  # (C,)
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)


@jax.custom_vjp
def _lovasz_from_errors_sortvjp(errors, gt, validf, w):
    return _lovasz_from_errors(errors, gt, validf, w)


def _lovasz_sortvjp_fwd(errors, gt, validf, w):
    c, n = errors.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (c, n), 1)
    neg_s, gt_s, val_s, perm = jax.lax.sort(
        (-errors, gt, jnp.broadcast_to(validf[None, :], gt.shape), iota), num_keys=1
    )
    err_s = -neg_s
    grad = _lovasz_grad(gt_s, val_s)
    losses = jnp.sum(jnp.maximum(err_s, 0.0) * val_s * grad, axis=-1)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    loss = jnp.sum(losses * w) / wsum
    return loss, (err_s, val_s, grad, perm, w, wsum)


def _lovasz_sortvjp_bwd(res, g_out):
    err_s, val_s, grad, perm, w, wsum = res
    # d loss / d err_s, replicating jnp.maximum(err_s, 0.0)'s tie convention
    # (cotangent splits evenly at err_s == 0) so grads match plain AD exactly
    relu_f = jnp.where(err_s > 0, 1.0, jnp.where(err_s < 0, 0.0, 0.5))
    gs = (g_out / wsum) * w[:, None] * relu_f * val_s * grad  # (C, N)
    # unsort with a SORT, not a scatter: perm is a per-row permutation, so
    # sorting (perm, gs) by perm restores original point order.  AD's sort
    # transpose routes the cotangent through a (C, N) scatter instead, which
    # TPU lowers poorly for per-row permutations.
    _, g_err = jax.lax.sort((perm, gs), num_keys=1)
    # the key is -errors and err_s = -neg_s: the two negations cancel, so
    # d loss/d errors is +g_err.  gt/validf/w are functions of the integer
    # targets only (no grad path upstream), so zero cotangents are exact.
    return (g_err, jnp.zeros_like(g_err), jnp.zeros_like(g_err[0]), jnp.zeros_like(w))


_lovasz_from_errors_sortvjp.defvjp(_lovasz_sortvjp_fwd, _lovasz_sortvjp_bwd)


@jax.custom_vjp
def _lovasz_class(err_c, gt_c, validf):
    neg_s, gt_s, val_s = jax.lax.sort((-err_c, gt_c, validf), num_keys=1)
    grad = _lovasz_grad(gt_s, val_s)
    return jnp.sum(jnp.maximum(-neg_s, 0.0) * val_s * grad)


def _lovasz_class_fwd(err_c, gt_c, validf):
    n = err_c.shape[0]
    iota = jax.lax.iota(jnp.int32, n)
    neg_s, gt_s, val_s, perm = jax.lax.sort((-err_c, gt_c, validf, iota), num_keys=1)
    err_s = -neg_s
    grad = _lovasz_grad(gt_s, val_s)
    loss = jnp.sum(jnp.maximum(err_s, 0.0) * val_s * grad)
    return loss, (err_s, val_s, grad, perm)


def _lovasz_class_bwd(res, g_out):
    err_s, val_s, grad, perm = res
    # same tie convention as the batched sortvjp backward (see above)
    relu_f = jnp.where(err_s > 0, 1.0, jnp.where(err_s < 0, 0.0, 0.5))
    gs = g_out * relu_f * val_s * grad
    _, g_err = jax.lax.sort((perm, gs), num_keys=1)
    return (g_err, jnp.zeros_like(g_err), jnp.zeros_like(g_err))


_lovasz_class.defvjp(_lovasz_class_fwd, _lovasz_class_bwd)


def _pack_lovasz_key(errors, gt, valid):
    """Fold (error, gt, valid) into ONE int32 sort key per entry.

    Valid errors are |1_{y=c} - p_c| in [0, 1]; non-negative f32 bit patterns
    order like the floats and 1.0f is 0x3F800000 < 2^30, so ``bits << 1 | gt``
    fits 31 bits.  Invalid entries become -1, which sorts strictly after every
    valid key under the descending (negated-key ascending) sort.  The LOSS is
    exactly tie-order invariant — within a block of equal errors the dot
    ``sum(err * lovasz_grad)`` telescopes to ``err * (jaccard_end -
    jaccard_start)``, a function of the block's gt COUNT only — so replacing
    the multi-operand sort's arbitrary tie order with "gt=1 first" changes
    nothing but float summation order (~1e-7); per-entry gradients inside a
    tie block pick a different valid subgradient.
    """
    bits = jax.lax.bitcast_convert_type(errors.astype(jnp.float32), jnp.int32)
    key = (bits << 1) | gt.astype(jnp.int32)
    return jnp.where(valid, key, -1)


def _unpack_lovasz_sorted(key_s):
    """Inverse of :func:`_pack_lovasz_key` on the sorted stream."""
    val_s = (key_s >= 0).astype(jnp.float32)
    gt_s = (key_s & 1).astype(jnp.float32) * val_s
    err_bits = jnp.where(key_s >= 0, key_s >> 1, 0)
    err_s = jax.lax.bitcast_convert_type(err_bits, jnp.float32) * val_s
    return err_s, gt_s, val_s


@jax.custom_vjp
def _lovasz_from_errors_packed(errors, gt, validb, w):
    key = _pack_lovasz_key(errors, gt, jnp.broadcast_to(validb[None, :], gt.shape))
    key_s = -jax.lax.sort(-key)  # descending
    err_s, gt_s, val_s = _unpack_lovasz_sorted(key_s)
    grad = _lovasz_grad(gt_s, val_s)
    losses = jnp.sum(err_s * grad * val_s, axis=-1)
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)


def _lovasz_packed_fwd(errors, gt, validb, w):
    c, n = errors.shape
    key = _pack_lovasz_key(errors, gt, jnp.broadcast_to(validb[None, :], gt.shape))
    iota = jax.lax.broadcasted_iota(jnp.int32, (c, n), 1)
    negk_s, perm = jax.lax.sort((-key, iota), num_keys=1)
    err_s, gt_s, val_s = _unpack_lovasz_sorted(-negk_s)
    grad = _lovasz_grad(gt_s, val_s)
    losses = jnp.sum(err_s * grad * val_s, axis=-1)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    loss = jnp.sum(losses * w) / wsum
    return loss, (val_s, grad, perm, w, wsum)


def _lovasz_packed_bwd(res, g_out):
    val_s, grad, perm, w, wsum = res
    # err_s >= 0 on valid entries, so there is no relu kink to replicate;
    # d loss / d err_s is simply the (weighted) lovasz grad on valid rows
    gs = (g_out / wsum) * w[:, None] * val_s * grad  # (C, N)
    # unsort with a SORT (see _lovasz_sortvjp_bwd): per-row permutation
    # scatters lower poorly on TPU
    _, g_err = jax.lax.sort((perm, gs), num_keys=1)
    return (g_err, jnp.zeros_like(g_err), None, jnp.zeros_like(w))


_lovasz_from_errors_packed.defvjp(_lovasz_packed_fwd, _lovasz_packed_bwd)


def _lovasz_from_errors_condskip(errors, gt, validf, w):
    """Per-class ``lax.cond``: absent classes skip their sort at RUNTIME.

    The reference's dynamic skip (``lovasz_loss.py:49-51``) — a class not in
    the sample contributes nothing, so its descending-error sort never runs.
    The batched formulation above must sort every class row regardless (one
    (C, N) sort); this one scans over classes and sorts only present ones —
    at KITTI scale the (20, 131072) Lovász sort is the single biggest-volume
    op of the whole train step (HLO audit, round 2), and synthetic/typical
    scans carry far fewer than 20 classes.

    Trade-offs: the per-class sorts run SEQUENTIALLY (scan), so with most
    classes present this loses to the batched sort; and under ``vmap`` the
    cond degenerates to running both branches for every class, strictly
    worse.  Opt-in (``LNT_LOVASZ=condskip``) for the single-cloud train
    path, pending the on-chip A/B.  Backward uses the sort-unsort VJP
    (identical grads to AD; tested in ``tests/test_losses.py``).
    """

    def body(acc, xs):
        err_c, gt_c, w_c = xs
        loss_c = jax.lax.cond(
            w_c > 0,
            lambda _: _lovasz_class(err_c, gt_c, validf),
            lambda _: jnp.zeros((), errors.dtype),
            None,
        )
        return acc + loss_c * w_c, None

    total, _ = jax.lax.scan(body, jnp.zeros((), errors.dtype), (errors, gt, w))
    return total / jnp.maximum(jnp.sum(w), 1.0)


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

    The DEFAULT formulation is the packed single-key sort: (error bits, gt,
    valid) fold into ONE int32 sort key (see :func:`_pack_lovasz_key`) — the
    forward sort carries 2 int32 operands (key + unsort permutation) instead
    of 3-4 f32, and the backward unsorts with a second 2-operand sort rather
    than AD's (C, N) permutation scatter.  Promoted to default after the
    round-2 on-chip in-program A/B: full train step 116.9 -> 102.2 ms at
    KITTI scale (docs/runs/bench_r2_bypass_packed.log).  Loss values are
    tie-order invariant and match the batched formulation to float rounding;
    per-entry gradients at exact error ties pick a different valid
    subgradient (tested).

    ``LNT_LOVASZ`` selects a measured alternative for A/Bs:
      * ``packed`` (default) — as above.
      * ``batched`` — one multi-operand f32 ``lax.sort`` carrying gt/valid
        as payloads, plain AD backward (scatter); the round-1 default.
      * ``sortvjp`` — ``batched`` forward + sort-unsort custom VJP
        (identical grads to AD, tested to 1e-6); dominated by ``packed``
        on-chip (B3 102.5 vs B4 100.1 ms) but kept as the AD-exact variant.
      * ``condskip`` — per-class ``lax.cond`` skips absent classes' sorts at
        runtime (the reference's dynamic skip, ``lovasz_loss.py:49-51``);
        wins only when most classes are absent AND the caller is not vmapped.
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
    present = jnp.sum(gt, axis=-1) > 0
    is_ignored = classes == ignore_index
    w = present.astype(probs.dtype) * (1.0 - is_ignored.astype(probs.dtype))
    variant = os.environ.get("LNT_LOVASZ", "packed")
    if variant == "condskip":
        return _lovasz_from_errors_condskip(errors, gt, validf, w)
    if variant == "sortvjp":
        return _lovasz_from_errors_sortvjp(errors, gt, validf, w)
    if variant == "batched":
        return _lovasz_from_errors(errors, gt, validf, w)
    if variant != "packed":
        raise ValueError(f"LNT_LOVASZ={variant!r}: expected packed|batched|sortvjp|condskip")
    return _lovasz_from_errors_packed(errors, gt, valid, w)


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
    # one-hot contraction instead of take_along_axis: bit-exact (multiplies
    # by exactly 1.0/0.0 and adds zeros) but its backward is a dense mask
    # multiply instead of a (N, C) scatter — TPU scatters serialize
    one_hot = (t[:, None] == jnp.arange(nr_classes)[None, :]).astype(log_probs.dtype)
    picked = jnp.sum(log_probs * one_hot, axis=-1)
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
