"""Flax modules over lattice values (the reference's ``lattice_modules.py`` L5).

Every module is a pure function of (params, values, structure tables); the
lattice structure itself is never mutated.  Values are always ``(capacity, C)``
arrays padded to the level's static capacity; per-level occupancy masks come
from :meth:`LatticeStructure.occupancy_mask`.

Padding discipline: padded rows may hold garbage after affine ops — every op
that *reads* across rows (convs via neighbour tables, GN statistics, slices)
masks by validity, so garbage never propagates.  This is cheaper on TPU than
re-zeroing after each op and matches the invariant tested in
``tests/test_model.py``.

Initialisers follow the reference exactly where it matters for training
dynamics: kaiming-uniform with fan = filter rows for convs
(``lattice_modules.py:205-215``), the halved-fan ×2 variant for
coarsen/finefy (``:274-292``), kaiming-normal fan-in for 1x1 linears
(``:812``), and the ×0.1-scaled delta-weight head (``:509-516``).
"""

from __future__ import annotations

import math
import os
from collections.abc import Mapping
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from lattice_net_tpu.lattice import ops as lops
from lattice_net_tpu.lattice.structure import filter_extent

LEAKY_SLOPE = 0.2


# ---------------------------------------------------------------------------
# initialisers
# ---------------------------------------------------------------------------


def kaiming_uniform_rows(fan: float, gain: float = math.sqrt(2.0), mult: float = 1.0):
    """torch kaiming_uniform with an explicit fan (reference conv init)."""
    bound = math.sqrt(3.0) * gain / math.sqrt(fan) * mult

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform_bias(fan: float):
    bound = 1.0 / math.sqrt(fan)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_fan_in(fan_in: float, gain: float = math.sqrt(2.0)):
    std = gain / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


def leaky_relu_gain(slope: float = LEAKY_SLOPE) -> float:
    return math.sqrt(2.0 / (1.0 + slope**2))


# ---------------------------------------------------------------------------
# group norm over real vertices only
# ---------------------------------------------------------------------------

# Distributed-norm context (lattice-sharded mode, parallel/lattice_sharded):
# when set, masked norm statistics are computed over OWNED vertices only
# (ghost/halo copies would double-count) and psum-reduced over the named mesh
# axis, so every shard normalises with the exact global moments.  Keyed by
# table capacity — the sharded runner asserts per-level capacities are
# distinct.  Plain single-device paths never touch this.
_NORM_DIST = None  # None | (axis_name, {capacity: own_mask})


class norm_stats_distributed:
    """Context manager: reduce masked norm stats over a shard_map axis."""

    def __init__(self, axis_name: str, own_masks: Mapping):
        self.state = (axis_name, dict(own_masks))

    def __enter__(self):
        global _NORM_DIST
        self._prev = _NORM_DIST
        _NORM_DIST = self.state
        return self

    def __exit__(self, *exc):
        global _NORM_DIST
        _NORM_DIST = self._prev
        return False


def masked_group_norm(lv, mask, num_groups, scale, bias, eps=1e-5):
    """GroupNorm whose statistics ignore padded rows.

    The reference normalises over exactly ``nr_verts`` rows because its value
    tensors are dynamically sized (``lattice_modules.py:585-614``); with
    static padding the mean/var must be computed under the occupancy mask or
    the zeros would bias the statistics (SURVEY.md §7 'hard parts').
    """
    cap, c = lv.shape
    g = num_groups
    gs = c // g
    m = mask[:, None].astype(lv.dtype)
    # stay strictly 2-D: a (cap, g, c//g) reshape puts c//g (often 1) on the
    # lane dim, and 1-lane arrays pad x128 in VMEM — measured 1.5 ms per GN
    # at 65536x32 where ~0.15 ms is the real cost.  Per-channel moment sums
    # reduce to per-group stats on (g,)-sized arrays instead.
    dist = _NORM_DIST
    if dist is not None:
        axis_name, own_masks = dist
        own = own_masks.get(cap)
        if own is not None:
            m = m * own[:, None].astype(lv.dtype)
    # E[x^2] - E[x]^2 cancels catastrophically when |mean| >> spread; shift
    # each group by a constant near its mean (row 0 is always a real vertex
    # — sorted tables put valid rows first) before forming the moments.  The
    # shift is per-GROUP (not per-channel) so the pooled group variance is
    # exactly invariant, and stop_gradient keeps the backward identical to
    # the unshifted formulation.
    t_g = jax.lax.stop_gradient(lv[0]).reshape(g, gs).mean(-1)  # (g,)
    count = jnp.sum(m) * gs
    if dist is not None:
        # one consistent shift across shards, then exact global moments
        # (psum BEFORE the >=1 clamp: a shard with zero owned vertices must
        # contribute 0, not a clamped 1)
        t_g = jax.lax.pmean(t_g, axis_name)
        count = jax.lax.psum(count, axis_name)
    count = jnp.maximum(count, 1.0)
    t_c = jnp.repeat(t_g, gs)  # (c,)
    lvs = lv - t_c
    lvm = lvs * m
    s1 = jnp.sum(lvm, axis=0)  # (c,)
    s2 = jnp.sum(lvm * lvs, axis=0)  # (c,)
    if dist is not None:
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    gmean_s = s1.reshape(g, gs).sum(-1) / count  # shifted group mean
    gvar = jnp.maximum(s2.reshape(g, gs).sum(-1) / count - gmean_s * gmean_s, 0.0)
    mean_c = jnp.repeat(gmean_s + t_g, gs)  # (c,)
    inv_c = jnp.repeat(jax.lax.rsqrt(gvar + eps), gs)
    return (lv - mean_c) * (inv_c * scale) + bias


def reference_group_count(channels: int, preferred: int = 32) -> int:
    """32 groups when divisible, else C/2 (``lattice_modules.py:587-592``)."""
    if channels % preferred == 0:
        return preferred
    return max(1, channels // 2)


class GroupNormLattice(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, lv, mask):
        g = reference_group_count(self.channels)
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return masked_group_norm(lv, mask, g, scale, bias)


class BatchNormLattice(nn.Module):
    """BatchNorm1d over real lattice vertices (``BatchNormLatticeModule``,
    ``lattice_modules.py:570-583``).

    Statistics are computed over occupied rows only (padded rows would bias
    them); running mean/var live in the ``batch_stats`` collection like flax
    BatchNorm.  ``use_running_average=True`` (eval) normalises with the stored
    statistics.
    """

    channels: int
    momentum: float = 0.9  # torch default 0.1 "update fraction" == 0.9 decay
    eps: float = 1e-5

    @nn.compact
    def __call__(self, lv, mask, use_running_average: bool = False):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.channels,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.channels,), jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask[:, None].astype(lv.dtype)
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(lv * m, axis=0) / count
            var = jnp.sum(((lv - mean) ** 2) * m, axis=0) / count
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        out = (lv - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return out


# ---------------------------------------------------------------------------
# linear layers
# ---------------------------------------------------------------------------


class WNLinear(nn.Module):
    """Weight-normalised linear (the reference's ``LinearWN``, ``utils.py:291``).

    kernel = g * v / ||v||, with g per output feature and the norm over input
    rows; g initialised to ||v_init|| so the first forward equals plain init.
    """

    features: int
    use_bias: bool = True
    kernel_init: object = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        gain = leaky_relu_gain()
        kinit = self.kernel_init or kaiming_uniform_rows(in_f, gain)
        v = self.param("v", kinit, (in_f, self.features))
        # E[||column||] of kaiming-uniform with fan=in_f is exactly the gain,
        # so a constant g reproduces ||v_init|| in expectation.
        g = self.param("g", nn.initializers.constant(gain), (self.features,))
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        kernel = v * (g[None, :] / jnp.maximum(norm, 1e-12))
        y = x @ kernel
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def fuse_weight_norm(params):
    """Fold every weight-norm ``g`` into its direction ``v`` (forward-identical).

    Port of the reference's ``fuse_wn`` (``utils/utils.py:72-158``): after
    fusing, ``v`` *is* the effective kernel (``v' = v * g / ||v||``) and ``g``
    is reset to ``||v'||``, so the same module applies unchanged and produces
    bit-identical outputs — but ``v`` can now be exported/inspected as a plain
    kernel.  Works on any params pytree; every dict holding both ``v`` and
    ``g`` is treated as a weight-norm group.
    """
    import jax.numpy as jnp

    def walk(node):
        if isinstance(node, Mapping):
            if "v" in node and "g" in node:
                v, g = node["v"], node["g"]
                norm = jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12)
                v_fused = v * (g[None, :] / norm)
                new = dict(node)
                new["v"] = v_fused
                new["g"] = jnp.linalg.norm(v_fused, axis=0)
                return new
            return {k: walk(x) for k, x in node.items()}
        return node

    return walk(params)


def unfuse_weight_norm(params):
    """Re-derive ``g = ||v||`` for every weight-norm group (``utils.py:118-158``).

    The inverse convention of :func:`fuse_weight_norm`: given a ``v`` that
    holds a plain kernel (e.g. loaded from a non-WN checkpoint), set ``g`` so
    the weight-norm forward reproduces it exactly.
    """
    import jax.numpy as jnp

    def walk(node):
        if isinstance(node, Mapping):
            if "v" in node and "g" in node:
                new = dict(node)
                new["g"] = jnp.linalg.norm(node["v"], axis=0)
                return new
            return {k: walk(x) for k, x in node.items()}
        return node

    return walk(params)


# ---------------------------------------------------------------------------
# lattice convolutions
# ---------------------------------------------------------------------------


class ConvIm2Row(nn.Module):
    """Same-level 1-hop lattice conv (``ConvLatticeIm2RowModule``, ``lattice_modules.py:174-250``)."""

    in_channels: int
    out_channels: int
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, lv, neighbors):
        pos_dim = neighbors.shape[1] // 2 - 1
        extent = filter_extent(pos_dim)
        rows = extent * self.in_channels
        kinit = kaiming_uniform_rows(rows)
        if self.weight_norm:
            v = self.param("v", kinit, (rows, self.out_channels))
            g = self.param("g", nn.initializers.constant(math.sqrt(2.0)), (self.out_channels,))
            norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            weight = v * (g[None, :] / jnp.maximum(norm, 1e-12))
        else:
            weight = self.param("weight", kinit, (rows, self.out_channels))
        out = lops.conv_im2row(lv, neighbors, weight, same_level=True)
        if self.use_bias:
            out = out + self.param("bias", uniform_bias(rows), (self.out_channels,))
        return out


class _CrossLevelConv(nn.Module):
    """Shared body of coarsen/finefy convs: cross-level gather-GEMM with the
    reference's halved-fan ×2 init compensating mostly-empty neighbourhoods
    (``lattice_modules.py:274-292``)."""

    in_channels: int
    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, lv_src, neighbors, neighbors_t=None):
        extent = neighbors.shape[1]  # 2(d+1)+1, centre included in table
        rows = extent * self.in_channels
        kinit = kaiming_uniform_rows(rows / 2.0, mult=2.0)
        weight = self.param("weight", kinit, (rows, self.out_channels))
        # neighbors_t (the paired coarsen<->finefy table) routes the backward
        # through the flip-neighbours adjoint conv instead of a scatter-add
        out = lops.conv_im2row(
            lv_src, neighbors, weight, same_level=False, neighbors_t=neighbors_t
        )
        if self.use_bias:
            out = out + self.param("bias", uniform_bias(rows), (self.out_channels,))
        return out


class CoarsenConv(_CrossLevelConv):
    """Fine -> coarse conv (``CoarsenLatticeModule``); neighbors = hierarchy.neighbors_coarsen[i]."""


class FinefyConv(_CrossLevelConv):
    """Coarse -> fine conv (``FinefyLatticeModule``); neighbors = hierarchy.neighbors_finefy[i]."""


# ---------------------------------------------------------------------------
# composed layers (GN -> ReLU -> op, densenet-style pre-activation)
# ---------------------------------------------------------------------------


class GnRelu1x1(nn.Module):
    """``lattice_modules.py:806-833``: GN -> ReLU -> Linear (kaiming-normal fan-in)."""

    in_channels: int
    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, lv, mask):
        lv = GroupNormLattice(self.in_channels)(lv, mask)
        lv = jax.nn.relu(lv)
        kernel = self.param(
            "kernel", kaiming_normal_fan_in(self.in_channels), (self.in_channels, self.out_channels)
        )
        lv = lv @ kernel
        if self.use_bias:
            lv = lv + self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return lv


class GnReluConv(nn.Module):
    """``lattice_modules.py:935-960``: GN -> ReLU -> [dropout] -> lattice conv."""

    in_channels: int
    out_channels: int
    use_bias: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, lv, neighbors, mask, deterministic=True):
        lv = GroupNormLattice(self.in_channels)(lv, mask)
        lv = jax.nn.relu(lv)
        if self.dropout > 0.0:
            lv = channel_dropout(self, lv, self.dropout, deterministic)
        return ConvIm2Row(self.in_channels, self.out_channels, self.use_bias)(lv, neighbors)


class CoarsenAct(nn.Module):
    """``lattice_modules.py:1011-1041``: coarsen conv -> LeakyReLU (the model's downsample)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, lv_fine, coarsen_table, finefy_table=None):
        lv = CoarsenConv(self.in_channels, self.out_channels)(
            lv_fine, coarsen_table, finefy_table
        )
        return jax.nn.leaky_relu(lv, LEAKY_SLOPE)


class GnReluCoarsen(nn.Module):
    """``lattice_modules.py:1068-1095``: GN(fine) -> ReLU -> coarsen conv."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, lv_fine, coarsen_table, fine_mask):
        lv = GroupNormLattice(self.in_channels)(lv_fine, fine_mask)
        lv = jax.nn.relu(lv)
        return CoarsenConv(self.in_channels, self.out_channels)(lv, coarsen_table)


class GnReluFinefy(nn.Module):
    """``lattice_modules.py:1152-1175``: GN(coarse) -> ReLU -> finefy conv."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, lv_coarse, finefy_table, coarse_mask, coarsen_table=None):
        lv = GroupNormLattice(self.in_channels)(lv_coarse, coarse_mask)
        lv = jax.nn.relu(lv)
        return FinefyConv(self.in_channels, self.out_channels)(
            lv, finefy_table, coarsen_table
        )


class ResnetBlock(nn.Module):
    """Pre-activation residual block of two GnReluConv (``lattice_modules.py:1255-1305``)."""

    channels: int
    biases: Sequence[bool] = (False, False)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, lv, neighbors, mask, deterministic=True):
        identity = lv
        lv = GnReluConv(self.channels, self.channels, self.biases[0])(lv, neighbors, mask)
        lv = GnReluConv(self.channels, self.channels, self.biases[1], self.dropout)(
            lv, neighbors, mask, deterministic
        )
        return lv + identity


class BottleneckBlock(nn.Module):
    """Pre-activation bottleneck: 1x1 contract (÷4) -> conv -> 1x1 expand
    (``lattice_modules.py:1336-1360``)."""

    channels: int
    biases: Sequence[bool] = (False, False, False)

    @nn.compact
    def __call__(self, lv, neighbors, mask, deterministic=True):
        mid = self.channels // 4
        identity = lv
        lv = GnRelu1x1(self.channels, mid, self.biases[0])(lv, mask)
        lv = GnReluConv(mid, mid, self.biases[1])(lv, neighbors, mask)
        lv = GnRelu1x1(mid, self.channels, self.biases[2])(lv, mask)
        return lv + identity


def channel_dropout(module: nn.Module, lv, prob: float, deterministic: bool):
    """Dropout2d-style whole-channel dropout (``DropoutLattice``, ``lattice_modules.py:26-42``)."""
    if deterministic or prob == 0.0:
        return lv
    rng = module.make_rng("dropout")
    keep = jax.random.bernoulli(rng, 1.0 - prob, (1, lv.shape[1]))
    return lv * keep / (1.0 - prob)


# ---------------------------------------------------------------------------
# distribute + pointnet (the input featuriser)
# ---------------------------------------------------------------------------


def distribute_module(positions, values, splat_idx, splat_weights, capacity, point_mask=None):
    """Parameter-free distribute with local-mean subtraction.

    ``DistributeLatticeModule`` (``lattice_modules.py:52-96``).  Returns
    (rows, edge_idx): one row per (point, simplex-vertex) edge.
    """
    return lops.distribute(
        positions, values, splat_idx, splat_weights, capacity, point_mask=point_mask
    )


class PointNetModule(nn.Module):
    """Per-edge MLP -> per-vertex max pool -> barycentric-of-argmax concat -> 1-hop conv.

    ``PointNetModule`` (``lattice_modules.py:618-733``): the winning edge's
    barycentric weight is concatenated per channel; simplices receiving fewer
    than ``min_points`` points are zeroed; the final WN conv mixes 1-hop
    neighbours.  Deviations from the reference: invalid edges are dropped by
    index masking instead of routing them to a sacrificial vertex row 0, and
    the max pool runs over pre-sorted edges (see structure.EdgeSort) so no
    per-call sort/argsort is needed.
    """

    channels_per_layer: Sequence[int]
    out_channels: int
    min_points: int = 4

    @nn.compact
    def __call__(self, rows_sorted, edges, capacity, neighbors, mask):
        bary = rows_sorted[:, -1]
        feats = rows_sorted[:, :-1]
        for c in self.channels_per_layer:
            feats = WNLinear(c)(feats)
            feats = jax.nn.leaky_relu(feats, LEAKY_SLOPE)

        maxed, bary_red = lops.seg_max_sorted(feats, bary, edges, capacity)
        lv = jnp.concatenate([maxed, bary_red], axis=-1)  # (capacity, 2C)

        count = lops.seg_counts_sorted(edges, capacity)
        lv = jnp.where((count >= self.min_points)[:, None], lv, 0.0)

        lv = ConvIm2Row(
            2 * self.channels_per_layer[-1], self.out_channels, use_bias=True, weight_norm=True
        )(lv, neighbors)
        return jax.nn.leaky_relu(lv, LEAKY_SLOPE)


# ---------------------------------------------------------------------------
# deformable slice-classify head
# ---------------------------------------------------------------------------


class SliceFastModule(nn.Module):
    """Stepdown -> bottleneck(8) -> gather -> learned Δ-barycentric -> fused classify.

    ``SliceFastCUDALatticeModule`` (``lattice_modules.py:424-567``): two
    GnRelu1x1 stepdowns halving channels, an 8-channel bottleneck, a gather of
    per-vertex (value*w, w) blocks, max-centering with learned gamma/beta, a
    ×0.1-initialised linear producing per-vertex barycentric offsets, and the
    fused deformable-slice + linear classifier.
    """

    in_channels: int
    nr_classes: int
    bottleneck_size: int = 8
    dropout: float = 0.0
    # reference ablation (``lattice_modules.py:536``): "slice_no_deform"
    # zeroes the learned barycentric offsets
    experiment: str = "none"

    @nn.compact
    def __call__(self, lv, mask, splat_idx, splat_weights, deterministic=True,
                 edges=None):
        n, d1 = splat_idx.shape

        cur = self.in_channels
        lv_b = lv
        for i in range(2):
            out = self.in_channels // (2**i)
            lv_b = GnRelu1x1(cur, out, use_bias=False)(lv_b, mask)
            cur = out
        lv_b = GnRelu1x1(cur, self.bottleneck_size, use_bias=False)(lv_b, mask)

        # Param creation order is load-bearing: flax derives per-param init
        # RNGs from creation order, so keep the original gamma/beta/delta ->
        # classify order (the round-3 reorder silently re-rolled every head
        # init draw and invalidated the calibrated sharded-agreement bound).
        vdim = self.bottleneck_size + 1
        gamma = self.param("gamma", nn.initializers.ones, (vdim,))
        beta = self.param("beta", nn.initializers.zeros, (vdim,))

        # delta-weight head: kaiming fan-in for tanh, scaled 0.1; zero bias
        def dw_init(key, shape, dtype=jnp.float32):
            gain = 5.0 / 3.0  # torch tanh gain
            bound = math.sqrt(3.0) * gain / math.sqrt(shape[0])
            return jax.random.uniform(key, shape, dtype, -bound, bound) * 0.1

        dw_kernel = self.param("delta_kernel", dw_init, (vdim, 1))
        dw_bias = self.param("delta_bias", nn.initializers.zeros, (1,))

        cls_gain = leaky_relu_gain(1.0)  # reference: leaky_relu_init(linear, 1.0)
        w_init = kaiming_uniform_rows(self.in_channels, cls_gain)
        cls_w = self.param("classify_kernel", w_init, (self.nr_classes, self.in_channels))
        cls_b = self.param("classify_bias", nn.initializers.zeros, (self.nr_classes,))

        # The classifier is linear, so it commutes with the barycentric sum:
        # sum_k w_k * (lv[idx_k] @ W^T) == (sum_k w_k * lv[idx_k]) @ W^T.
        # Pre-classifying the TABLE (cap x C -> cap x nr_classes, one MXU
        # matmul) shrinks the per-row gather from C to nr_classes channels —
        # and, decisively, shrinks AD's backward scatter-add the same way
        # (f32[524288,104] -> f32[524288,28] at KITTI bench shapes; the 104-ch
        # scatter was the single biggest HLO in the train step at 7.1 ms).
        # LNT_HEAD_PRECLASSIFY=0 restores the gather-then-classify order for
        # A/B (read at trace time; retrace to flip).
        preclassify = os.environ.get("LNT_HEAD_PRECLASSIFY", "1") == "1"
        if preclassify:
            lv_eff = lv
            if self.dropout > 0.0:
                lv_eff = channel_dropout(self, lv, self.dropout, deterministic)
            acc = jnp.result_type(lv.dtype, cls_w.dtype, jnp.float32)
            wide = jnp.dot(lv_eff, cls_w.T, preferred_element_type=acc)
        else:
            wide = lv

        # ONE row gather serves both heads: the bottleneck features (for the
        # delta-weight MLP, = ops.gather_lattice) and the wide values
        # (for the fused classify, = the gather inside ops.slice_classify).
        # Row gathers are latency-bound, so halving the row count halves the
        # cost; width is nearly free.
        # When preclassifying, `wide` holds LOGITS: a bf16 gather there costs
        # a bf16 ULP at logit scale (~8e-3) — past the sharded-agreement
        # bound — so gather in f32 (the win came from the 104->28 channel
        # shrink, not the dtype; row gathers are latency-bound anyway).
        both = jnp.concatenate([lv_b, wide], axis=1)  # (cap, bottleneck + C')
        if not preclassify:
            both = lops._maybe_bf16(both)
        if edges is not None and os.environ.get("LNT_HEAD_SEGVJP", "0") == "1":
            # OPT-IN A/B (default OFF — measured SLOWER in the full program):
            # adjoint via the build's edge sort instead of a scatter-add.
            # The scatter is the train step's largest HLO in isolation
            # (7.1 ms, docs/runs/xplane_train_r5.log) and the sorted path
            # prices ~4 ms, but the chained full-step A/B reads 77.74 vs
            # 76.90 ms (docs/runs/bench_r5_segvjp_{on,off}.log) — XLA
            # overlaps the scatter better than the permute+seg-sum pair.
            # Kept (bit-exact, vmap-safe) because the trade may flip at
            # other widths/occupancies.
            g_all = lops.gather_rows_clustered_segbwd(both, splat_idx, edges)
        else:
            g_all = lops.gather_rows_clustered(both, splat_idx)
        g_b = g_all[..., : self.bottleneck_size].astype(jnp.float32)
        g_v = g_all[..., self.bottleneck_size :]

        capacity = lv.shape[0]
        valid = splat_idx < capacity
        w_val = jnp.where(valid, splat_weights, 0.0)  # (n, d1)
        g = jnp.concatenate([g_b * w_val[..., None], w_val[..., None]], axis=-1)

        max_vals = jnp.max(g, axis=1, keepdims=True)
        g = g - (gamma * max_vals + beta)

        delta = (g @ dw_kernel + dw_bias).reshape(n, d1)
        if self.experiment == "slice_no_deform":
            delta = jnp.zeros_like(delta)

        w_def = jnp.where(valid, splat_weights + delta, 0.0)
        if preclassify:
            # g_v already holds per-corner LOGITS; the deformable slice is the
            # last reduction (dropout, if any, was applied to lv pre-matmul —
            # same semantics as the gather-order path below).
            acc = jnp.result_type(g_v.dtype, jnp.float32)
            return jnp.sum(g_v.astype(acc) * w_def[..., None], axis=1) + cls_b

        # fused deformable slice + classify on the already-gathered values
        # (semantics of ops.slice_classify, reusing g_v from the single
        # gather above); dropout applies to the vertex values -> re-gathering
        # would be needed if dropout is active, so keep the reference path
        # there (training-only).
        if self.dropout > 0.0:
            lv = channel_dropout(self, lv, self.dropout, deterministic)
            return lops.slice_classify(lv, splat_idx, splat_weights, delta, cls_w, cls_b)
        sliced = jnp.sum(g_v * w_def[..., None], axis=1)  # (n, C)
        acc = jnp.result_type(sliced.dtype, cls_w.dtype, jnp.float32)
        return jnp.dot(sliced, cls_w.T, preferred_element_type=acc) + cls_b


# ---------------------------------------------------------------------------
# additional blocks for API parity with the reference module zoo
# ---------------------------------------------------------------------------


class SplatModule(nn.Module):
    """Parameter-free barycentric splat (``SplatLatticeModule``,
    ``lattice_modules.py:44-50``)."""

    @nn.compact
    def __call__(self, values, splat_idx, splat_weights, capacity):
        return lops.splat(values, splat_idx, splat_weights, capacity)


class SliceModule(nn.Module):
    """Parameter-free barycentric slice (``SliceLatticeModule``,
    ``lattice_modules.py:398-404``)."""

    @nn.compact
    def __call__(self, lv, splat_idx, splat_weights):
        return lops.slice_lattice(lv, splat_idx, splat_weights)


class ConvAct(nn.Module):
    """conv -> LeakyReLU, optional channel dropout (``lattice_modules.py:908-933``)."""

    in_channels: int
    out_channels: int
    use_bias: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, lv, neighbors, deterministic=True):
        if self.dropout > 0.0:
            lv = channel_dropout(self, lv, self.dropout, deterministic)
        lv = ConvIm2Row(self.in_channels, self.out_channels, self.use_bias)(lv, neighbors)
        return jax.nn.leaky_relu(lv, LEAKY_SLOPE)


class TwoConv(nn.Module):
    """Two ConvAct layers, no residual (``lattice_modules.py:1221-1253``)."""

    channels: int
    biases: Sequence[bool] = (False, False)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, lv, neighbors, mask, deterministic=True):
        lv = ConvAct(self.channels, self.channels, self.biases[0])(lv, neighbors)
        return ConvAct(self.channels, self.channels, self.biases[1], self.dropout)(
            lv, neighbors, deterministic
        )


class ResnetBlock2(nn.Module):
    """ConvNeXt-style block: conv -> LayerNorm(1-group GN) -> conv -> act + skip
    (``lattice_modules.py:1307-1333``)."""

    channels: int
    biases: Sequence[bool] = (False, False)

    @nn.compact
    def __call__(self, lv, neighbors, mask, deterministic=True):
        identity = lv
        lv = ConvIm2Row(self.channels, self.channels, self.biases[0])(lv, neighbors)
        scale = self.param("ln_scale", nn.initializers.ones, (self.channels,))
        bias = self.param("ln_bias", nn.initializers.zeros, (self.channels,))
        lv = masked_group_norm(lv, mask, 1, scale, bias)
        lv = ConvIm2Row(self.channels, self.channels, self.biases[1])(lv, neighbors)
        lv = jax.nn.leaky_relu(lv, LEAKY_SLOPE)
        return lv + identity


class DensenetBlock(nn.Module):
    """Dense connectivity over GnReluConv layers (``lattice_modules.py:1363-1387``)."""

    channels: int
    nr_layers: int = 2

    @nn.compact
    def __call__(self, lv, neighbors, mask, deterministic=True):
        stack = lv
        outputs = []
        for i in range(self.nr_layers):
            new = GnReluConv(stack.shape[-1], self.channels)(stack, neighbors, mask)
            stack = jnp.concatenate([stack, new], axis=-1)
            outputs.append(new)
        return jnp.concatenate(outputs, axis=-1)


class GnReluDepthwiseConv(nn.Module):
    """GN -> ReLU -> depthwise lattice conv (``lattice_modules.py:881-906``)."""

    channels: int

    @nn.compact
    def __call__(self, lv, neighbors, mask, deterministic=True):
        lv = GroupNormLattice(self.channels)(lv, mask)
        lv = jax.nn.relu(lv)
        pos_dim = neighbors.shape[1] // 2 - 1
        extent = filter_extent(pos_dim)
        w = self.param(
            "weight", kaiming_uniform_rows(extent), (extent, self.channels)
        )
        return lops.depthwise_conv(lv, neighbors, w, same_level=True)
