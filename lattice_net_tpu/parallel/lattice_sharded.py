"""Lattice-sharded big-cloud mode: vertex table sharded over a mesh axis.

The reference's only answer to clouds that exceed one device is a bigger
hash table (ScanNet: 5M-vertex capacity on one GPU,
``config/lnn_train_scannet.cfg:50-53``).  This module is the TPU-native
scale-out (SURVEY.md §7.7 — the project's "context parallelism" analogue):

  * points are range-partitioned by their first ELEVATED coordinate
    (``elev0``; lattice keys inherit it as key[0], so a coordinate stripe of
    points maps to a coordinate stripe of vertices);
  * each device builds a LOCAL lattice from its own points plus a halo of
    boundary-band points received from its stripe neighbours over ICI
    (one ``ppermute`` each way) — the ghost-points scheme: every vertex
    within the device's receptive field then exists locally with COMPLETE
    splat values, so convolutions need no further communication;
  * each device slices only its OWN points, so every point is predicted
    exactly once globally.

Halo width: one 1-hop conv moves information by at most (d+1) in key[0]
(axis moves change it by +1 or -d), and a point's simplex spans (d+1); a
pipeline with L convolutions therefore needs a band of (L + 2)(d+1) in key
units on each side.  Wider nets pay linearly in halo, never in extra
collectives.

Scale claim made testable: with n devices of local capacity C each, clouds
of up to ~n*C vertices are processed exactly — ``tests/test_lattice_sharded``
validates bit-consistency against a single-device full-capacity run on a
cloud whose vertex count overflows one shard's capacity.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lattice_net_tpu.lattice import ops as lops
from lattice_net_tpu.lattice import permutohedral
from lattice_net_tpu.lattice.structure import (
    build_neighbors_same_level,
    build_structure,
)

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def elev0(positions: jnp.ndarray, sigma) -> jnp.ndarray:
    """First elevated coordinate of each point (the stripe coordinate)."""
    d = positions.shape[-1]
    e0 = permutohedral.elevation_matrix(d, positions.dtype)[0]
    sigma = jnp.broadcast_to(jnp.asarray(sigma, positions.dtype), (d,))
    return (positions / sigma) @ e0


def shard_points_host(positions, values, sigma, n_shards: int, per: int | None = None):
    """Host-side stripe partition: sort by elev0, split into equal chunks.

    Returns (sharded arrays stacked on a leading n_shards axis, point_mask,
    bounds).  Equal-count chunks balance work regardless of point density.
    ``per`` overrides the per-shard point count (>= ceil(n / n_shards)) so a
    batch of different-sized clouds can share one static shape.
    """
    positions = np.asarray(positions)
    values = np.asarray(values)
    s = np.asarray(elev0(jnp.asarray(positions), sigma))
    order = np.argsort(s, kind="stable")
    n = len(positions)
    per_min = -(-n // n_shards)
    per = per_min if per is None else int(per)
    if per < per_min:
        raise ValueError(f"per={per} cannot hold {n} points over {n_shards} shards")
    pad = per * n_shards - n
    order_p = np.concatenate([order, np.full(pad, -1)])
    mask = order_p >= 0
    order_c = np.where(mask, order_p, 0)

    pos_s = positions[order_c].reshape(n_shards, per, -1)
    val_s = values[order_c].reshape(n_shards, per, -1)
    mask_s = mask.reshape(n_shards, per)
    ids_s = order_p.reshape(n_shards, per)  # original point index, -1 = pad

    s_sorted = s[order]
    # stripe boundaries in elev0 units (replicated constants).  When per
    # exceeds ceil(n / n_shards) (a shared static shape for a batch of
    # different-sized clouds), trailing stripes hold only padding: their
    # boundary goes to +inf so the last REAL stripe owns every remaining
    # vertex — an empty stripe owning a vertex range would orphan those
    # vertices from the psum'd GroupNorm moments (it never builds them).
    bounds = np.full(n_shards + 1, np.inf, np.float32)
    bounds[0] = -np.inf
    for i in range(1, n_shards):
        k = i * per
        if k >= n:
            break  # stripes i.. are padding-only; bounds stay +inf
        bounds[i] = 0.5 * (s_sorted[k - 1] + s_sorted[k])
    return (
        jnp.asarray(pos_s, jnp.float32),
        jnp.asarray(val_s, jnp.float32),
        jnp.asarray(mask_s),
        jnp.asarray(ids_s, jnp.int32),
        jnp.asarray(bounds, jnp.float32),
    )


def _pack_rows(rows: jnp.ndarray, sel: jnp.ndarray, budget: int):
    """Gather rows where sel into a fixed (budget, C) buffer + validity mask."""
    n = rows.shape[0]
    idx = jnp.nonzero(sel, size=budget, fill_value=n)[0]
    out = jnp.take(rows, jnp.minimum(idx, n - 1), axis=0)
    valid = idx < n
    return jnp.where(valid[:, None], out, 0.0), valid


def make_sharded_splat_conv_slice(
    mesh: Mesh,
    sigma,
    cap_local: int,
    halo_budget: int,
    nr_convs: int = 1,
    axis: str = "sp",
) -> Callable:
    """Jitted sharded pipeline: splat -> (1-hop conv)^nr_convs -> slice.

    The minimal end-to-end demonstration of the sharded mode: exercises the
    halo exchange, per-shard structure build, conv over ghost vertices and
    owner-only slice.  A full sharded U-Net composes the same halo pattern
    with wider bands.

    Args (all static): cap_local = per-device vertex capacity; halo_budget =
    max points exchanged per direction (static ppermute buffer).
    """
    n_shards = mesh.shape[axis]

    def per_device(pos, val, mask, bounds, weights):
        i = jax.lax.axis_index(axis)
        d = pos.shape[-1]
        # (L+2)(d+1) from the receptive-field argument plus one (d+1) margin
        # for rem0 rounding (elev0 vs key[0] differ by < d+1)
        band = (nr_convs + 3) * (d + 1) * 1.0

        s = elev0(pos, sigma)
        lo = bounds[i]
        hi = bounds[i + 1]

        # boundary-band points for the neighbours (send right / send left)
        feat = jnp.concatenate([pos, val, mask[:, None].astype(pos.dtype)], axis=-1)
        right_rows, _ = _pack_rows(feat, mask & (s >= hi - band), halo_budget)
        left_rows, _ = _pack_rows(feat, mask & (s < lo + band), halo_budget)

        # ring exchange over ICI (edge devices receive zeros = masked rows)
        def shift(rows, up):
            perm = [
                (j, j + 1) if up else (j, j - 1)
                for j in range(n_shards)
                if 0 <= (j + 1 if up else j - 1) < n_shards
            ]
            return jax.lax.ppermute(rows, axis, perm)

        from_left = shift(right_rows, up=True)  # left neighbour's right band
        from_right = shift(left_rows, up=False)  # right neighbour's left band

        all_feat = jnp.concatenate([feat, from_left, from_right], axis=0)
        all_pos = all_feat[:, :d]
        all_val = all_feat[:, d:-1]
        all_mask = all_feat[:, -1] > 0.5

        # local structure over own + ghost points
        structure, vid, bary = build_structure(
            all_pos, sigma, cap_local, point_mask=all_mask
        )
        lv = lops.splat(all_val, vid, bary, cap_local)
        nbr = build_neighbors_same_level(structure)
        for w in weights:
            lv = lops.conv_im2row(lv, nbr, w, same_level=True)
        # slice at OWN points only (the first rows of the concat)
        n_own = pos.shape[0]
        sliced = lops.slice_lattice(lv, vid[:n_own], bary[:n_own])
        return sliced, structure.nr_verts, structure.nr_overflow

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def run(pos_s, val_s, mask_s, bounds, weights):
        out, nv, ov = per_device(pos_s[0], val_s[0], mask_s[0], bounds, weights)
        return out[None], nv[None], ov[None]

    return jax.jit(run)


# ---------------------------------------------------------------------------
# full-model sharded forward + train step
# ---------------------------------------------------------------------------


def receptive_band_units(model_params, d: int) -> float:
    """Halo band width (in level-0 scaled elev0 units) covering the LNN
    receptive field.

    One 1-hop conv at level ``l`` moves information by at most (d+1) * 2^l in
    level-0 key units (axis moves change key[0] by +1 or -d, and level-l keys
    sit at 2^l spacing); coarsen/finefy transitions are cross-level 1-hop
    convs with the same bound.  Summing the conv count per level over the
    whole U-Net (pointnet conv, resnet = 2 convs, bottleneck block = 1 conv
    with 1x1s around it, transitions, head 1x1s move nothing) plus a (d+1)
    margin for a point's own simplex span and one more for rem0 rounding
    gives a sound band.  Wider nets pay linearly in halo points, never in
    extra collectives.
    """
    p = model_params
    convs_at_level = [0] * (p.nr_downsamples + 1)
    convs_at_level[0] += 1  # pointnet's 1-hop conv
    for i in range(p.nr_downsamples):
        per_block = 2 if i < p.nr_levels_down_with_normal_resnet else 1
        convs_at_level[i] += p.nr_blocks_down_stage[i] * per_block
        # the coarsen conv reads FINE neighbours (level-i spacing), so level
        # i would be the tight count; charging it at level i+1 doubles that
        # transition's contribution — DELIBERATELY conservative (halo points
        # are cheap, an under-provisioned band is silent wrongness)
        convs_at_level[i + 1] += 1
    convs_at_level[p.nr_downsamples] += p.nr_blocks_bottleneck  # bottleneck convs
    for i in range(p.nr_downsamples):
        lvl = p.nr_downsamples - 1 - i
        convs_at_level[lvl + 1] += 1  # finefy reads coarse neighbours
        per_block = 2 if i >= p.nr_downsamples - p.nr_levels_up_with_normal_resnet else 1
        convs_at_level[lvl] += p.nr_blocks_up_stage[i] * per_block
    units = sum(c * (1 << l) for l, c in enumerate(convs_at_level))
    return float((units + 3) * (d + 1))


def _halo_concat(pos, val, extra, mask, bounds, sigma, band, halo_budget, axis, n_shards):
    """Exchange boundary-band rows with both stripe neighbours over ICI.

    Returns ((all_pos, all_val, all_extra, all_mask), halo_overflow): own
    rows first, then the left neighbour's right band, then the right
    neighbour's left band.  ``extra`` carries any per-point payload (e.g.
    targets as float) that ghost points need locally.  ``halo_overflow``
    counts band points that did NOT fit the static ``halo_budget`` buffer
    (this shard's sends, both directions): any nonzero means a neighbour
    built boundary vertices from incomplete splat sets — treat it exactly
    like table overflow, never ignore it.
    """
    i = jax.lax.axis_index(axis)
    s = elev0(pos, sigma)
    lo = bounds[i]
    hi = bounds[i + 1]

    feat = jnp.concatenate(
        [pos, val, extra, mask[:, None].astype(pos.dtype)], axis=-1
    )
    sel_right = mask & (s >= hi - band)
    sel_left = mask & (s < lo + band)
    right_rows, _ = _pack_rows(feat, sel_right, halo_budget)
    left_rows, _ = _pack_rows(feat, sel_left, halo_budget)
    halo_overflow = jnp.maximum(jnp.sum(sel_right) - halo_budget, 0) + jnp.maximum(
        jnp.sum(sel_left) - halo_budget, 0
    )

    def shift(rows, up):
        perm = [
            (j, j + 1) if up else (j, j - 1)
            for j in range(n_shards)
            if 0 <= (j + 1 if up else j - 1) < n_shards
        ]
        return jax.lax.ppermute(rows, axis, perm)

    from_left = shift(right_rows, up=True)
    from_right = shift(left_rows, up=False)

    all_feat = jnp.concatenate([feat, from_left, from_right], axis=0)
    d = pos.shape[-1]
    cv = val.shape[-1]
    return (
        all_feat[:, :d],
        all_feat[:, d : d + cv],
        all_feat[:, d + cv : -1],
        all_feat[:, -1] > 0.5,
    ), halo_overflow


def _check_caps_distinct(caps_local) -> tuple:
    """Per-level capacities must be DISTINCT: the distributed-GroupNorm
    ownership masks are keyed by table capacity (``nn.modules``), so a
    duplicate (e.g. ``default_capacity_schedule``'s 256 floor reached twice)
    would silently normalise one level with another level's mask."""
    caps_local = tuple(int(c) for c in caps_local)
    if len(set(caps_local)) != len(caps_local):
        raise ValueError(
            f"sharded mode needs distinct per-level capacities, got {caps_local}"
        )
    return caps_local


def _check_stripe_widths(bounds, band: float, n_shards: int, check_band: bool) -> None:
    """Single-hop halo soundness: every INTERIOR stripe must be at least as
    wide (in elev0 units) as the receptive band, or ghost points two stripes
    away would be needed but never received — results would be silently
    approximate.  Edge stripes extend to +-inf and padding-only stripes own
    nothing, so only widths between two finite boundaries matter.  Pass
    ``check_band=False`` to accept the approximation knowingly (e.g.
    mechanics tests)."""
    if not check_band:
        return
    b = np.asarray(bounds, np.float64).reshape(-1, np.shape(bounds)[-1])
    for row in b:
        finite = row[np.isfinite(row)]
        if finite.size < 2:
            continue
        widths = np.diff(finite)
        if widths.size and float(widths.min()) < band:
            raise ValueError(
                f"narrowest interior stripe spans {float(widths.min()):.1f} elev0 "
                f"units < receptive band {band:.1f}: the single-hop halo cannot "
                f"cover the receptive field over {n_shards} shards — use fewer "
                "shards / a coarser sigma, or pass check_band=False to accept "
                "approximate boundaries"
            )


def make_sharded_lnn_forward(
    mesh: Mesh,
    model,
    sigma,
    nr_levels: int,
    caps_local,
    halo_budget: int,
    axis: str = "sp",
    check_band: bool = True,
):
    """Jitted FULL-LNN forward with the vertex table sharded over ``axis``.

    The complete scale-out answer to the reference's 5M-entry single-GPU hash
    table (``config/lnn_train_scannet.cfg:50-53``): points are striped by
    their first elevated coordinate, each shard builds a complete local
    hierarchy from its own points plus a receptive-field halo of ghost points
    (one ppermute each way), the U-Net runs per shard with GroupNorm moments
    psum-reduced over OWNED vertices only (nn.modules.norm_stats_distributed),
    and each shard keeps logits for its own points — every point predicted
    exactly once, every norm exactly global.

    Returns ``fn(params, pos_s, val_s, mask_s, bounds) -> (logp_s, nr_verts_s,
    overflow_s)`` over arrays stacked on a leading n_shards axis (see
    ``shard_points_host``).
    """
    caps_local = _check_caps_distinct(caps_local)
    n_shards = mesh.shape[axis]
    mp = model.params

    def per_device(params, pos, val, mask, bounds):
        logp, h, halo_ovf, _ = _halo_build_apply(
            model, params, pos, val, mask, bounds, sigma, nr_levels,
            caps_local, halo_budget, axis, n_shards,
        )
        n_own = pos.shape[0]
        overflow = sum(s.nr_overflow for s in h.structures) + halo_ovf
        return logp[:n_own], h.structures[0].nr_verts, overflow

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def run(params, pos_s, val_s, mask_s, bounds):
        logp, nv, ov = per_device(params, pos_s[0], val_s[0], mask_s[0], bounds)
        return logp[None], nv[None], ov[None]

    jrun = jax.jit(run)
    band = receptive_band_units(mp, 3)

    def checked(params, pos_s, val_s, mask_s, bounds):
        if pos_s.shape[0] != n_shards:
            raise ValueError(
                f"sharded batch has {pos_s.shape[0]} stripes but the mesh "
                f"{axis} axis is {n_shards}; a larger block would silently "
                f"drop stripes (the per-device body indexes [0])"
            )
        _check_stripe_widths(bounds, band, n_shards, check_band)
        return jrun(params, pos_s, val_s, mask_s, bounds)

    return checked


def _halo_build_apply(
    model, params, pos, val, mask, bounds, sigma, nr_levels, caps_local,
    halo_budget, axis, n_shards,
):
    """The shared per-shard body: halo exchange over ``axis``, local
    hierarchy build over own + ghost points, U-Net forward with psum-global
    GroupNorm moments over OWNED vertices.  Returns (logp over own+ghost
    rows, hierarchy, halo_overflow) — callers slice logp[:n_own] and must
    surface ``halo_overflow`` (see ``_halo_concat``)."""
    from lattice_net_tpu.lattice.structure import build_hierarchy
    from lattice_net_tpu.nn import modules as lnm

    d = pos.shape[-1]
    band = receptive_band_units(model.params, d)
    i = jax.lax.axis_index(axis)
    (all_pos, all_val, _, all_mask), halo_ovf = _halo_concat(
        pos, val, jnp.zeros((pos.shape[0], 0), pos.dtype), mask, bounds,
        sigma, band, halo_budget, axis, n_shards,
    )
    h = build_hierarchy(
        all_pos, sigma, nr_levels, caps_local, point_mask=all_mask,
        point_feats=all_val,
    )
    # per-level ownership: a vertex belongs to the stripe containing its
    # first elevated coordinate (level-l keys sit at 2^l spacing in level-0
    # units); every vertex lands in exactly one stripe globally
    lo, hi = bounds[i], bounds[i + 1]
    own_masks = {}
    for l, s_l in enumerate(h.structures):
        coord = s_l.keys[:, 0].astype(jnp.float32) * float(1 << l)
        own_masks[s_l.capacity] = (coord >= lo) & (coord < hi) & s_l.occupancy_mask()
    with lnm.norm_stats_distributed(axis, own_masks):
        logp, _ = model.apply(params, h, all_pos, all_val)
    own_verts0 = jnp.sum(own_masks[h.structures[0].capacity].astype(jnp.int32))
    return logp, h, halo_ovf, own_verts0


def _sharded_loss_terms(
    model, params, pos, val, tgt, mask, bounds, sigma, nr_levels, caps_local,
    halo_budget, axis, n_shards, ignore_index,
):
    """One stripe-shard's (loss_sum, valid_count, metric_sums) for the
    global masked loss.

    The per-shard loss is weighted by the shard's valid count so a psum over
    the mesh gives exactly the global per-point mean for the NLL half; the
    Lovász half becomes a per-SHARD Lovász average — the same decomposition
    the DP trainer applies per cloud (make_loss_fn vmaps Lovász per cloud
    and means over the batch).  ``metric_sums`` carries additive per-shard
    counts (overflow, correct/valid, per-class I/U, owned L0 vertices, own
    points) that a psum over the mesh turns into the same metrics the DP
    trainer reports."""
    from lattice_net_tpu.losses import segmentation_loss
    from lattice_net_tpu.train.callbacks import iou_counts_device

    logp, h, halo_ovf, own_verts0 = _halo_build_apply(
        model, params, pos, val, mask, bounds, sigma, nr_levels, caps_local,
        halo_budget, axis, n_shards,
    )
    n_own = pos.shape[0]
    own_valid = mask & (tgt != ignore_index)
    cnt = jnp.sum(own_valid.astype(jnp.float32))
    logp_own = logp[:n_own]
    loss_mean = segmentation_loss(logp_own, tgt, ignore_index, None, mask)
    nr_classes = logp_own.shape[-1]
    inter, union = iou_counts_device(logp_own, tgt, nr_classes, ignore_index, mask)
    metric_sums = {
        "overflow": sum(s.nr_overflow for s in h.structures) + halo_ovf,
        "correct": jnp.sum(
            ((jnp.argmax(logp_own, -1) == tgt) & own_valid).astype(jnp.float32)
        ),
        "valid": cnt,
        "iou_intersection": inter,
        "iou_union": union,
        "nr_verts": own_verts0,
        "nr_points": jnp.sum(mask.astype(jnp.float32)),
    }
    return loss_mean * cnt, cnt, metric_sums


def _metrics_dict(loss, ms, n_clouds: int):
    """DP-trainer-compatible metrics from psum'd per-shard metric sums.

    ``overflow`` stays the raw global int (the dryrun/tests assert == 0);
    the ``*_mean`` keys divide by the cloud count to match the DP trainer's
    per-batch-slot means (``data_parallel.make_loss_fn``)."""
    ovf = ms["overflow"]
    return {
        "loss": loss,
        "overflow": ovf,
        "acc": ms["correct"] / jnp.maximum(ms["valid"], 1.0),
        "nr_verts_mean": ms["nr_verts"].astype(jnp.float32) / n_clouds,
        "nr_overflow_mean": ovf.astype(jnp.float32) / n_clouds,
        "nr_points_mean": ms["nr_points"] / n_clouds,
        "iou_intersection": ms["iou_intersection"],
        "iou_union": ms["iou_union"],
    }


def make_sharded_lnn_train_step(
    mesh: Mesh,
    model,
    tx,
    sigma,
    nr_levels: int,
    caps_local,
    halo_budget: int,
    ignore_index: int = -1,
    axis: str = "sp",
    check_band: bool = True,
):
    """Jitted sharded TRAIN step: one cloud striped over the mesh, replicated
    params, gradients of the global masked loss psum-reduced over ICI.

    The loss is the mean NLL+Lovász-style segmentation loss over OWN valid
    points of every shard (each point counted once); ``jax.grad`` of the
    shard_mapped loss differentiates through the halo ppermutes and the
    distributed GroupNorm psums, so gradients are exactly those of the
    corresponding single-device step.
    """
    import optax

    from lattice_net_tpu.parallel.data_parallel import TrainState

    caps_local = _check_caps_distinct(caps_local)
    n_shards = mesh.shape[axis]
    wants_value = isinstance(tx, optax.GradientTransformationExtraArgs)

    def shard_loss(params, pos, val, tgt, mask, bounds):
        return _sharded_loss_terms(
            model, params, pos, val, tgt, mask, bounds, sigma, nr_levels,
            caps_local, halo_budget, axis, n_shards, ignore_index,
        )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def global_loss(params, pos_s, val_s, tgt_s, mask_s, bounds):
        lsum, cnt, ms = shard_loss(
            params, pos_s[0], val_s[0], tgt_s[0], mask_s[0], bounds
        )
        lsum = jax.lax.psum(lsum, axis)
        cnt = jax.lax.psum(cnt, axis)
        ms = jax.tree.map(lambda x: jax.lax.psum(x, axis), ms)
        return lsum / jnp.maximum(cnt, 1.0), ms

    band = receptive_band_units(model.params, 3)

    @jax.jit
    def _jstep(state, pos_s, val_s, tgt_s, mask_s, bounds):
        (loss, ms), grads = jax.value_and_grad(global_loss, has_aux=True)(
            state.params, pos_s, val_s, tgt_s, mask_s, bounds
        )
        # extra-args transforms (reduce_on_plateau) consume the loss at
        # update time; plain transforms must not receive the kwarg
        extra = {"value": loss} if wants_value else {}
        updates, opt_state = tx.update(grads, state.opt_state, state.params, **extra)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            _metrics_dict(loss, ms, 1),
        )

    def step(state: TrainState, pos_s, val_s, tgt_s, mask_s, bounds):
        if pos_s.shape[0] != n_shards:
            raise ValueError(
                f"sharded batch has {pos_s.shape[0]} stripes but the mesh "
                f"{axis} axis is {n_shards}; a larger block would silently "
                f"drop stripes (the per-device body indexes [0])"
            )
        _check_stripe_widths(bounds, band, n_shards, check_band)
        return _jstep(state, pos_s, val_s, tgt_s, mask_s, bounds)

    return step


# ---------------------------------------------------------------------------
# hybrid DP x lattice-sharding over a 2-axis mesh
# ---------------------------------------------------------------------------


def shard_clouds_host(clouds, sigma, n_shards: int, ignore_index: int = -1,
                      per: int | None = None):
    """Stripe-partition a BATCH of (positions, values, target) clouds.

    Every cloud is padded to a common per-shard point count so the batch
    stacks to static ``(B, n_shards, per, ...)`` blocks for the hybrid step
    (DP over clouds x stripes within each cloud).  Pad slots carry
    ``ignore_index`` targets and False masks.  Pass ``per`` to pin the
    per-shard point count across BATCHES too (a jitted train step would
    otherwise retrace whenever the max cloud size changes).

    Returns (pos, val, tgt, mask, ids, bounds) with ids (B, n_shards, per)
    mapping back to each cloud's original point index (-1 = pad) and bounds
    (B, n_shards + 1) per-cloud stripe boundaries.
    """
    per_min = max(-(-len(c[0]) // n_shards) for c in clouds)
    per = per_min if per is None else int(per)
    if per < per_min:
        raise ValueError(f"per={per} cannot hold the largest cloud over {n_shards} shards")
    ps, vs, ts, ms, ids, bs = [], [], [], [], [], []
    for positions, values, target in clouds:
        pos_s, val_s, mask_s, ids_s, bounds = shard_points_host(
            positions, values, sigma, n_shards, per=per
        )
        idn = np.asarray(ids_s)
        tgt_s = np.where(
            idn >= 0,
            np.asarray(target)[np.clip(idn, 0, len(target) - 1)],
            ignore_index,
        ).astype(np.int32)
        ps.append(pos_s), vs.append(val_s), ts.append(tgt_s)
        ms.append(mask_s), ids.append(ids_s), bs.append(bounds)
    return (
        jnp.stack(ps), jnp.stack(vs), jnp.asarray(np.stack(ts)),
        jnp.stack(ms), jnp.stack(ids), jnp.stack(bs),
    )


def make_hybrid_lnn_train_step(
    mesh: Mesh,
    model,
    tx,
    sigma,
    nr_levels: int,
    caps_local,
    halo_budget: int,
    ignore_index: int = -1,
    dp_axis: str = "dp",
    sp_axis: str = "sp",
    check_band: bool = True,
):
    """Jitted hybrid train step over a 2-axis mesh: a batch of clouds is
    data-parallel over ``dp_axis`` while each cloud's vertex table is striped
    over ``sp_axis`` — DP x "context parallelism" composed, the full scale-out
    recipe (many big clouds per step, none of which fits one device).

    Semantics: the loss is the global per-valid-point mean over the WHOLE
    batch (each shard contributes loss*count, one psum over both axes
    normalises), so gradients equal a single giant-device step over the
    concatenated batch up to the per-shard Lovász decomposition documented in
    ``_sharded_loss_terms``.  Params/optimizer state are replicated; the only
    collectives per step are the two halo ppermutes per cloud (sp axis), the
    GroupNorm moment psums (sp axis), and the loss/grad psum (both axes).
    """
    import optax

    from lattice_net_tpu.parallel.data_parallel import TrainState

    caps_local = _check_caps_distinct(caps_local)
    n_sp = mesh.shape[sp_axis]
    wants_value = isinstance(tx, optax.GradientTransformationExtraArgs)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P(dp_axis, sp_axis), P(dp_axis, sp_axis), P(dp_axis, sp_axis),
            P(dp_axis, sp_axis), P(dp_axis),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def global_loss(params, pos_s, val_s, tgt_s, mask_s, bounds):
        lsum, cnt, ms = _sharded_loss_terms(
            model, params, pos_s[0, 0], val_s[0, 0], tgt_s[0, 0], mask_s[0, 0],
            bounds[0], sigma, nr_levels, caps_local, halo_budget, sp_axis,
            n_sp, ignore_index,
        )
        lsum = jax.lax.psum(lsum, (dp_axis, sp_axis))
        cnt = jax.lax.psum(cnt, (dp_axis, sp_axis))
        ms = jax.tree.map(lambda x: jax.lax.psum(x, (dp_axis, sp_axis)), ms)
        return lsum / jnp.maximum(cnt, 1.0), ms

    n_dp = mesh.shape[dp_axis]
    band = receptive_band_units(model.params, 3)

    @jax.jit
    def _jstep(state, pos_s, val_s, tgt_s, mask_s, bounds):
        (loss, ms), grads = jax.value_and_grad(global_loss, has_aux=True)(
            state.params, pos_s, val_s, tgt_s, mask_s, bounds
        )
        # extra-args transforms (reduce_on_plateau) consume the loss at
        # update time; plain transforms must not receive the kwarg
        extra = {"value": loss} if wants_value else {}
        updates, opt_state = tx.update(grads, state.opt_state, state.params, **extra)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            _metrics_dict(loss, ms, n_dp),
        )

    def step(state, pos_s, val_s, tgt_s, mask_s, bounds):
        # shard_map hands each device a (B/n_dp, n_sp/n_sp, ...) block and the
        # loss body indexes [0, 0]: any larger block would SILENTLY drop
        # clouds/stripes, so the batch must match the mesh exactly
        if pos_s.shape[0] != n_dp or pos_s.shape[1] != n_sp:
            raise ValueError(
                f"hybrid batch {pos_s.shape[:2]} must equal the mesh "
                f"({dp_axis}={n_dp}, {sp_axis}={n_sp}); split the batch into "
                f"mesh-sized steps"
            )
        _check_stripe_widths(bounds, band, n_sp, check_band)
        return _jstep(state, pos_s, val_s, tgt_s, mask_s, bounds)

    return step
