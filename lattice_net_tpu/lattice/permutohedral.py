"""Vectorised permutohedral-lattice math (Adams, Baek, Davis 2010).

This module is the TPU-native equivalent of the per-thread device math of the
reference CUDA implementation (``elevate`` / rem0 / rank / barycentric blocks
in ``include/lattice_net/kernels/LatticeGPU.cuh:436-650``).  Instead of one
CUDA thread per point, everything here is expressed as batched array
arithmetic over ``(..., pos_dim)`` position tensors: tiny dense matmuls and
broadcast comparisons that XLA fuses into a handful of VPU ops.

All functions are pure, shape-static and differentiable where meaningful.

Glossary (d = pos_dim):
  elevated     point embedded in the hyperplane H_d ⊂ R^{d+1} (sums to 0)
  rem0         the nearest "remainder-0" lattice point (all coords ≡ 0 mod d+1)
  rank         per-coordinate rank of (elevated - rem0) in descending order
  barycentric  d+2 barycentric coordinates of the point inside its simplex
  keys         the d+1 simplex-vertex lattice coordinates; only the first d
               components are stored (they sum to 0 with the implicit last)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "elevation_matrix",
    "elevate",
    "find_enclosing_simplex",
    "vertex_keys",
    "splat_coords",
]


@functools.lru_cache(maxsize=None)
def _elevation_matrix_np(pos_dim: int) -> np.ndarray:
    """(d+1, d) matrix E with elevate(p) = E @ p.

    Derived by unrolling the reference's sequential recurrence
    (``LatticeGPU.cuh:436-457``): with c_j = p_j * s_j,
      elevated[0]   = sum_j c_j
      elevated[i]   = sum_{j >= i} c_j - i * c_{i-1}      (1 <= i <= d)
    where s_j = (d+1) * sqrt(2/3) / sqrt((j+1)(j+2)).

    The resulting embedding lands on the hyperplane {x : sum x = 0} and is an
    isometry (up to the global sqrt(2/3)(d+1) std-dev scale) onto H_d.
    """
    d = pos_dim
    inv_std_dev = (d + 1) * np.sqrt(2.0 / 3.0)
    scale = inv_std_dev / np.sqrt((np.arange(d) + 1.0) * (np.arange(d) + 2.0))
    e = np.zeros((d + 1, d), dtype=np.float64)
    e[0, :] = 1.0
    for i in range(1, d + 1):
        e[i, i:] = 1.0
        e[i, i - 1] = -float(i)
    return (e * scale[None, :]).astype(np.float64)


def elevation_matrix(pos_dim: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_elevation_matrix_np(pos_dim), dtype=dtype)


def elevate(positions: jnp.ndarray) -> jnp.ndarray:
    """Embed ``(..., d)`` positions into the hyperplane H_d as ``(..., d+1)``.

    positions must already be scaled by 1/sigma (the reference scales in the
    host wrapper, ``src/Lattice.cu:226``).
    """
    d = positions.shape[-1]
    e = elevation_matrix(d, positions.dtype)
    # full f32 precision: on TPU the default bf16 matmul would perturb which
    # simplex borderline points land in.
    return jnp.matmul(positions, e.T, precision=jax.lax.Precision.HIGHEST)


def find_enclosing_simplex(elevated: jnp.ndarray):
    """Locate the enclosing simplex of each elevated point.

    Args:
      elevated: (..., d+1) float, points on the hyperplane H_d.

    Returns:
      rem0:        (..., d+1) int32 — nearest remainder-0 lattice point.
      rank:        (..., d+1) int32 — descending rank of elevated-rem0.
      barycentric: (..., d+1) float — barycentric coords; entry r is the
                   weight of the remainder-r simplex vertex.

    Mirrors the logic replicated in every point-facing reference kernel
    (``LatticeGPU.cuh:552-602``), vectorised:
      * round each coordinate to the nearest multiple of (d+1),
      * compute the sorting rank of the residuals (a (d+1)x(d+1) broadcast
        comparison — d is tiny so this is cheap),
      * fix up points that rounded off the plane,
      * accumulate barycentric coordinates via one-hot matmuls instead of
        scalar scatter.
    """
    d1 = elevated.shape[-1]  # d+1
    d = d1 - 1
    f = elevated.dtype

    # nearest multiple of (d+1): pick ceil or floor of v/(d+1), whichever is
    # closer (ties -> floor, matching the reference's strict '<' comparison).
    v = elevated / d1
    up = jnp.ceil(v) * d1
    down = jnp.floor(v) * d1
    rem0 = jnp.where(up - elevated < elevated - down, up, down)
    rem0 = rem0.astype(jnp.int32)

    # sum of rem0 over coords is a multiple of (d+1); exact integer division.
    s = jnp.sum(rem0, axis=-1) // d1  # (...,)

    # rank[i] = #{j > i : diff_i < diff_j} + #{j < i : diff_j >= diff_i}
    diff = elevated - rem0.astype(f)  # (..., d+1)
    di = diff[..., :, None]
    dj = diff[..., None, :]
    iu = np.triu(np.ones((d1, d1), dtype=bool), k=1)  # j > i
    il = np.tril(np.ones((d1, d1), dtype=bool), k=-1)  # j < i
    rank = (jnp.sum((di < dj) & iu, axis=-1) + jnp.sum((dj >= di) & il, axis=-1)).astype(jnp.int32)

    # bring points that rounded off the plane back onto it
    rank = rank + s[..., None]
    too_low = rank < 0
    too_high = rank > d
    rank = jnp.where(too_low, rank + d1, jnp.where(too_high, rank - d1, rank))
    rem0 = jnp.where(too_low, rem0 + d1, jnp.where(too_high, rem0 - d1, rem0))

    # barycentric coordinates: b[d - rank_i] += delta_i ; b[d+1 - rank_i] -= delta_i
    delta = (elevated - rem0.astype(f)) / d1  # (..., d+1)
    plus_pos = d - rank  # in [0, d]
    minus_pos = d1 - rank  # in [1, d+1]
    slots = jnp.arange(d1 + 1, dtype=jnp.int32)  # (d+2,)
    b = jnp.sum(jnp.where(plus_pos[..., :, None] == slots, delta[..., :, None], 0.0), axis=-2)
    b = b - jnp.sum(jnp.where(minus_pos[..., :, None] == slots, delta[..., :, None], 0.0), axis=-2)
    b0 = b[..., 0] + 1.0 + b[..., d1]
    barycentric = jnp.concatenate([b0[..., None], b[..., 1:d1]], axis=-1)
    return rem0, rank, barycentric


def vertex_keys(rem0: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """Integer coordinates of the d+1 enclosing-simplex vertices.

    Args:
      rem0, rank: (..., d+1) int32 as returned by find_enclosing_simplex.

    Returns:
      keys: (..., d+1, d) int32 — the first d coordinates of each of the d+1
      simplex vertices (vertex r has colour/remainder r); the last coordinate
      is implicit (coords sum to 0).  Matches the key construction in
      ``LatticeGPU.cuh:806-813``.
    """
    d1 = rem0.shape[-1]
    d = d1 - 1
    r = jnp.arange(d1, dtype=jnp.int32)  # remainder axis
    # key[..., r, i] = rem0[..., i] + r - (d+1) * [rank[..., i] > d - r]
    keys = rem0[..., None, :d] + r[:, None]
    keys = keys - jnp.where(rank[..., None, :d] > d - r[:, None], d1, 0)
    return keys.astype(jnp.int32)


def splat_coords_elevated(elevated: jnp.ndarray):
    """splat_coords for points already on the hyperplane H_d.

    Used by the vertex-proxy coarse build: a level-l lattice key IS an
    (integer) elevated point, and the level-(l+1) elevated coordinates are
    exactly key/2 (the elevation map is linear in 1/sigma) — no re-elevation
    of raw positions needed.
    """
    rem0, rank, bary = find_enclosing_simplex(elevated)
    return vertex_keys(rem0, rank), bary


def splat_coords(positions: jnp.ndarray):
    """Convenience: positions -> (keys, barycentric).

    Args:
      positions: (..., d) float, already divided by sigma.

    Returns:
      keys: (..., d+1, d) int32 simplex-vertex keys.
      barycentric: (..., d+1) float splat weights (sum to 1).
    """
    elevated = elevate(positions)
    rem0, rank, bary = find_enclosing_simplex(elevated)
    return vertex_keys(rem0, rank), bary
