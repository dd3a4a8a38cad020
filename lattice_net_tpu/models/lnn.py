"""LNN: the LatticeNet U-Net over a sparse permutohedral lattice.

Mirrors the reference model (``latticenet_py/lattice/models.py:70-266``):
distribute -> PointNet -> [resnet/bottleneck xK, coarsen] x D -> bottleneck xK
-> [finefy, concat skip, blocks xK] x D -> deformable slice-classify ->
log-softmax.  All channel arithmetic (doubling x2xcompression per level,
finefy halving, concat doubling) is resolved statically from ModelParams —
the reference's lazily-created modules (``lattice_modules.py:154-162``) have
no place in JAX where parameter shapes must be known up front.

The forward is a pure function of (params, hierarchy, point data); batching
is a plain ``jax.vmap`` over clouds and devices come in via shard_map (see
lattice_net_tpu.parallel).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from lattice_net_tpu.lattice.structure import LatticeHierarchy
from lattice_net_tpu.nn import modules as lnm


@struct.dataclass
class ModelParams:
    """Static model hyper-parameters (reference ``ModelParams.h:19-31`` schema)."""

    nr_classes: int = struct.field(pytree_node=False, default=6)
    positions_mode: str = struct.field(pytree_node=False, default="xyz")
    values_mode: str = struct.field(pytree_node=False, default="none")
    pointnet_channels_per_layer: tuple = struct.field(pytree_node=False, default=(16, 32, 64))
    pointnet_start_nr_channels: int = struct.field(pytree_node=False, default=32)
    nr_downsamples: int = struct.field(pytree_node=False, default=3)
    nr_blocks_down_stage: tuple = struct.field(pytree_node=False, default=(4, 4, 4))
    nr_blocks_bottleneck: int = struct.field(pytree_node=False, default=3)
    nr_blocks_up_stage: tuple = struct.field(pytree_node=False, default=(2, 2, 2))
    nr_levels_down_with_normal_resnet: int = struct.field(pytree_node=False, default=3)
    nr_levels_up_with_normal_resnet: int = struct.field(pytree_node=False, default=2)
    compression_factor: float = struct.field(pytree_node=False, default=1.0)
    dropout_last_layer: float = struct.field(pytree_node=False, default=0.0)
    experiment: str = struct.field(pytree_node=False, default="none")
    # rematerialize every Resnet/Bottleneck block in the backward instead of
    # storing activations: trades ~one extra forward of block FLOPs for a
    # large activation-memory cut — the knob for training at ScanNet-class
    # capacities (2^21 vertices x wide channels) on one chip.
    remat_blocks: bool = struct.field(pytree_node=False, default=False)


def prepare_cloud(cloud, model_params: ModelParams):
    """Map a cloud record to (positions, values, target) per the config modes.

    Port of ``models.py:18-66``.  ``cloud`` is any object with numpy attrs
    V (xyz), C (rgb), I (intensity), L_gt (labels).
    """
    import numpy as np

    pm = model_params.positions_mode
    if pm == "xyz":
        positions = np.asarray(cloud.V, np.float32)
    elif pm == "xyz+rgb":
        positions = np.concatenate([cloud.V, cloud.C], axis=1).astype(np.float32)
    elif pm == "xyz+intensity":
        positions = np.concatenate([cloud.V, cloud.I], axis=1).astype(np.float32)
    else:
        raise ValueError(f"positions mode {pm} not implemented")

    vm = model_params.values_mode
    if vm == "none":
        values = np.zeros((positions.shape[0], 1), np.float32)
    elif vm == "intensity":
        values = np.asarray(cloud.I, np.float32)
    elif vm == "rgb":
        values = np.asarray(cloud.C, np.float32)
    elif vm == "rgb+height":
        values = np.concatenate([cloud.C, cloud.V[:, 1:2]], axis=1).astype(np.float32)
    elif vm == "rgb+xyz":
        values = np.concatenate([cloud.C, cloud.V], axis=1).astype(np.float32)
    elif vm == "height":
        values = np.asarray(cloud.V[:, 1:2], np.float32)
    elif vm == "xyz":
        values = np.asarray(cloud.V, np.float32)
    else:
        raise ValueError(f"values mode {vm} not implemented")

    target = np.asarray(cloud.L_gt, np.int32).reshape(-1)
    return positions, values, target


def compute_class_weights(class_frequencies, background_idx: int | None):
    """Inverse-log frequency class weights (``models.py:273-296``).

    ``background_idx`` zeroes the ignore class's weight; pass ``None`` when
    the loss's ignore_index is not a real class slot (e.g. -1) — zeroing
    slot 0 there would silently unweight a REAL class (the 6-class synth
    loader's dominant "ground").
    """
    import jax.numpy as jnp

    f = jnp.asarray(class_frequencies, jnp.float32)
    w = 1.0 / jnp.log(1.05 + f)
    if background_idx is None:
        return w
    return w.at[background_idx].set(1e-8)


def channel_plan(p: ModelParams):
    """Static channel bookkeeping of the U-Net (``models.py:113-183``)."""
    cur = p.pointnet_start_nr_channels
    skips = []
    down = []
    for i in range(p.nr_downsamples):
        skips.append(cur)
        after = int(cur * 2 * p.compression_factor)
        down.append((cur, after))
        cur = after
    up = []
    for i in range(p.nr_downsamples):
        skip = skips.pop()
        finefy_out = cur // 2
        up.append((cur, finefy_out, skip))
        cur = skip + finefy_out
    return down, up, cur


class LNN(nn.Module):
    params: ModelParams

    @nn.compact
    def __call__(self, h: LatticeHierarchy, positions, values, deterministic=True):
        p = self.params
        d = positions.shape[-1]
        cap0 = h.structures[0].capacity
        masks = [s.occupancy_mask() for s in h.structures]

        # --- distribute (no learnable params; reference runs it under no_grad,
        # models.py:198-199 — inputs are leaves here so that is automatic).
        # Rows are emitted in sorted-by-vertex edge order so the PointNet
        # reductions below are sort-free run reductions (structure.EdgeSort).
        from lattice_net_tpu.lattice import ops as lops

        # ablation modes (reference ModelParams "experiment"; the live branch
        # is slice_no_deform, lattice_modules.py:536 — the *_no_local_mean
        # family is the documented concept at lattice_modules.py:64-75)
        no_mean = p.experiment in (
            "pointnet_no_local_mean", "pointnet_no_elevate_no_local_mean", "splat"
        )
        rows_sorted, _ = lops.distribute_sorted(
            positions,
            values,
            h.edges,
            cap0,
            subtract_local_mean=not no_mean,
            splat_weights=h.splat_weights,
        )

        # --- pointnet featuriser
        lv = lnm.PointNetModule(
            tuple(p.pointnet_channels_per_layer), p.pointnet_start_nr_channels
        )(rows_sorted, h.edges, cap0, h.neighbors_same[0], masks[0])

        down_plan, up_plan, final_channels = channel_plan(p)

        # remat (jax.checkpoint) the block bodies when asked: bitwise-equal
        # outputs and (to float tolerance) grads, ~p.nr_blocks extra block
        # forwards in exchange for not storing their activations.  Explicit
        # names replicate the plain path's auto-naming (ResnetBlock_0, ...)
        # so checkpoints interchange when the knob flips.
        import itertools as _it

        _rn, _bn = _it.count(), _it.count()
        if p.remat_blocks:
            _R, _B = nn.remat(lnm.ResnetBlock), nn.remat(lnm.BottleneckBlock)
        else:
            _R, _B = lnm.ResnetBlock, lnm.BottleneckBlock

        def Resnet(*a, **kw):
            return _R(*a, name=f"ResnetBlock_{next(_rn)}", **kw)

        def Bottleneck(*a, **kw):
            return _B(*a, name=f"BottleneckBlock_{next(_bn)}", **kw)

        # --- down path
        skip_values = []
        for i in range(p.nr_downsamples):
            cur, after = down_plan[i]
            for j in range(p.nr_blocks_down_stage[i]):
                if i < p.nr_levels_down_with_normal_resnet:
                    lv = Resnet(cur, (False, False))(lv, h.neighbors_same[i], masks[i])
                else:
                    lv = Bottleneck(cur, (False, False, False))(
                        lv, h.neighbors_same[i], masks[i]
                    )
            skip_values.append(lv)
            # downsample: coarsen conv + LeakyReLU (models.py:129-134 CoarsenAct)
            # (the finefy table is the coarsen table's exact transpose — it
            # routes the backward through the flip-neighbours adjoint conv)
            lv = lnm.CoarsenAct(cur, after)(
                lv, h.neighbors_coarsen[i], h.neighbors_finefy[i]
            )

        # --- bottleneck
        bott_ch = down_plan[-1][1]
        for j in range(p.nr_blocks_bottleneck):
            lv = Bottleneck(bott_ch, (False, False, False))(
                lv, h.neighbors_same[p.nr_downsamples], masks[p.nr_downsamples]
            )

        # --- up path
        for i in range(p.nr_downsamples):
            cur, finefy_out, skip_ch = up_plan[i]
            lvl = p.nr_downsamples - 1 - i  # fine level we are going to
            lv = lnm.GnReluFinefy(cur, finefy_out)(
                lv, h.neighbors_finefy[lvl], masks[lvl + 1], h.neighbors_coarsen[lvl]
            )
            lv = jnp.concatenate([lv, skip_values.pop()], axis=-1)
            ch = skip_ch + finefy_out
            for j in range(p.nr_blocks_up_stage[i]):
                is_last = (j == p.nr_blocks_up_stage[i] - 1) and (i == p.nr_downsamples - 1)
                if i >= p.nr_downsamples - p.nr_levels_up_with_normal_resnet:
                    lv = Resnet(ch, (False, is_last))(lv, h.neighbors_same[lvl], masks[lvl])
                else:
                    lv = Bottleneck(ch, (False, False, is_last))(
                        lv, h.neighbors_same[lvl], masks[lvl]
                    )

        # --- deformable slice-classify head
        logits = lnm.SliceFastModule(
            final_channels, p.nr_classes, dropout=p.dropout_last_layer,
            experiment=p.experiment,
        )(lv, masks[0], h.splat_idx, h.splat_weights, deterministic=deterministic,
          edges=h.edges)

        return jax.nn.log_softmax(logits, axis=-1), logits
