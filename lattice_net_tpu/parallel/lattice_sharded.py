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


def shard_points_host(positions, values, sigma, n_shards: int):
    """Host-side stripe partition: sort by elev0, split into equal chunks.

    Returns (sharded arrays stacked on a leading n_shards axis, point_mask,
    bounds).  Equal-count chunks balance work regardless of point density.
    """
    positions = np.asarray(positions)
    values = np.asarray(values)
    s = np.asarray(elev0(jnp.asarray(positions), sigma))
    order = np.argsort(s, kind="stable")
    n = len(positions)
    per = -(-n // n_shards)
    pad = per * n_shards - n
    order_p = np.concatenate([order, np.full(pad, -1)])
    mask = order_p >= 0
    order_c = np.where(mask, order_p, 0)

    pos_s = positions[order_c].reshape(n_shards, per, -1)
    val_s = values[order_c].reshape(n_shards, per, -1)
    mask_s = mask.reshape(n_shards, per)
    ids_s = order_p.reshape(n_shards, per)  # original point index, -1 = pad

    s_sorted = s[order]
    # stripe boundaries in elev0 units (replicated constants)
    bounds = np.full(n_shards + 1, np.inf, np.float32)
    bounds[0] = -np.inf
    for i in range(1, n_shards):
        k = i * per
        bounds[i] = 0.5 * (s_sorted[min(k - 1, n - 1)] + s_sorted[min(k, n - 1)])
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
