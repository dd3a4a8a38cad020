"""Static-shape sparse lattice structures (the TPU replacement of the GPU hash table).

The reference keeps lattice topology in a device-side open-addressing hash
table that is mutated by spinlock inserts from CUDA kernels
(``include/lattice_net/kernels/HashTableGPU.cuh:443-518``) and whose fill
count is read back to the host between layers (``src/Lattice.cu:1320-1352``).
Neither pattern maps to XLA: table contents would be data-dependent shapes and
the readback a per-layer host sync.

Here the structure is built once per cloud as a pure, shape-static function:

  1. compute all N*(d+1) simplex-vertex keys (vectorised permutohedral math),
  2. lexicographically ``lax.sort`` the int32 key columns (multi-operand sort;
     no 64-bit packing — TPUs have no native int64),
  3. run-length dedup + ``cumsum`` -> dense vertex ids,
  4. scatter the unique keys into a fixed-capacity, *sorted* key table.

Lookups (the hash table's ``retrieve``) become branchless vectorised binary
searches (lower-bound over lexicographic d-tuples).  Neighbour relationships
for convolutions are resolved once per structure into dense ``(capacity,
filter_extent)`` int32 index tables — the analogue of the reference's
``im2rowindices`` output (``LatticeGPU.cuh:1690-1920``) — after which every
conv is a gather + one MXU GEMM.

Conventions:
  * every per-vertex array is padded to ``capacity`` rows; ``nr_verts`` is a
    traced scalar, never synced to the host;
  * empty key-table rows hold the sentinel key (INT32_MAX in every column),
    which sorts after all real keys;
  * the invalid / not-found index is ``capacity`` (one past the end).  Gathers
    must mask on ``idx < capacity``; scatters use ``mode='drop'`` so invalid
    ids vanish, reproducing the reference's silent overflow-drop semantics
    (``LatticeGPU.cuh:825-832``) but with an observable overflow counter.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from lattice_net_tpu.lattice import permutohedral

__all__ = [
    "LatticeStructure",
    "LatticeHierarchy",
    "filter_extent",
    "build_structure",
    "build_neighbors_same_level",
    "build_neighbors_coarse_from_fine",
    "build_neighbors_fine_from_coarse",
    "build_hierarchy",
]

# sentinel key column value; sorts after every real coordinate.
SENTINEL = np.iinfo(np.int32).max


def filter_extent(pos_dim: int, neighbourhood_size: int = 1) -> int:
    """2*(d+1) one-hop neighbours + the centre vertex (``src/Lattice.cu:1353-1363``)."""
    if neighbourhood_size != 1:
        raise NotImplementedError("only 1-hop neighbourhoods are supported (as in the reference)")
    return 2 * (pos_dim + 1) + 1


def _lex_less(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a < b over the last axis of int32 key tuples."""
    d = a.shape[-1]
    out = a[..., 0] < b[..., 0]
    prefix_eq = a[..., 0] == b[..., 0]
    for i in range(1, d):
        out = out | (prefix_eq & (a[..., i] < b[..., i]))
        prefix_eq = prefix_eq & (a[..., i] == b[..., i])
    return out


# ---------------------------------------------------------------------------
# pytree containers
# ---------------------------------------------------------------------------


@struct.dataclass
class LatticeStructure:
    """Immutable topology of one lattice level.

    The reference's mutable ``Lattice`` object (``include/lattice_net/
    Lattice.cuh:21``) splits here into this frozen pytree (structure) and
    plain ``(capacity, C)`` value arrays that flow through the network
    separately — mirroring how the reference already re-attaches values via
    ``set_values`` before every op.
    """

    # lexicographically sorted int32 keys; sentinel rows mark empty slots.
    # (capacity, d)
    keys: jnp.ndarray
    # number of occupied rows (traced scalar, int32). ()
    nr_verts: jnp.ndarray
    # number of unique keys that did not fit (traced scalar, int32). ()
    nr_overflow: jnp.ndarray
    # per-dimension sigma used to build this level. (d,)
    sigma: jnp.ndarray

    capacity: int = struct.field(pytree_node=False)
    pos_dim: int = struct.field(pytree_node=False)
    lvl: int = struct.field(pytree_node=False)

    @property
    def invalid_index(self) -> int:
        return self.capacity

    def occupancy_mask(self) -> jnp.ndarray:
        """(capacity,) bool — True for real vertices."""
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.nr_verts

    def lookup(self, query_keys: jnp.ndarray) -> jnp.ndarray:
        """Resolve (..., d) int32 keys to row indices; misses -> capacity.

        Replaces ``HashTableGPU::retrieve`` (``HashTableGPU.cuh:491-518``):
        a branchless lower-bound binary search, vectorised over all queries
        (log2(capacity) gather+compare rounds, no data-dependent control
        flow).
        """
        c = self.capacity
        table = self.keys
        batch_shape = query_keys.shape[:-1]
        nsteps = (c - 1).bit_length() if c > 1 else 0
        step0 = 1 << (nsteps - 1) if nsteps else 0

        # classic power-of-two lower_bound: pos ends as #(rows < query).
        # A fori_loop (not a python unroll) keeps the HLO small — with tables
        # of 2^16+ rows an unrolled 17-deep gather chain per neighbour query
        # made XLA compile times explode.
        def body(i, pos):
            step = jnp.int32(step0) >> i
            cand = pos + step
            ok = cand <= c
            rows = jnp.take(table, jnp.minimum(cand - 1, c - 1), axis=0)
            advance = ok & _lex_less(rows, query_keys)
            return jnp.where(advance, cand, pos)

        pos = jax.lax.fori_loop(0, nsteps, body, jnp.zeros(batch_shape, dtype=jnp.int32))
        in_range = pos < c
        rows = jnp.take(table, jnp.minimum(pos, c - 1), axis=0)
        found = in_range & jnp.all(rows == query_keys, axis=-1)
        return jnp.where(found, pos, c).astype(jnp.int32)


@struct.dataclass
class LatticeHierarchy:
    """All structures + index tables the LNN U-Net needs, built once per cloud.

    This is the single jitted "build" pass of SURVEY.md §7: after it, the
    network forward is a pure function of (hierarchy, params, point data) with
    no further structure mutation — the TPU answer to the reference's
    per-layer ``create_coarse_verts_naive`` / ``nr_lattice_vertices`` host
    round-trips.
    """

    # structures[0] is the finest (input) level; length nr_levels+1.
    structures: tuple
    # same-level conv neighbour tables, one per level: (capacity_l, 2(d+1)) int32.
    neighbors_same: tuple
    # coarsen tables[i]: for level i+1 vertices, indices into level i (incl centre):
    # (capacity_{i+1}, 2(d+1)+1) int32.
    neighbors_coarsen: tuple
    # finefy tables[i]: for level i vertices, indices into level i+1 (incl centre).
    neighbors_finefy: tuple
    # point -> level-0 vertex ids, (N, d+1) int32 (invalid = capacity_0).
    splat_idx: jnp.ndarray
    # barycentric splat weights, (N, d+1) float32.
    splat_weights: jnp.ndarray
    # validity of each input point, (N,) bool (False for padding).
    point_mask: jnp.ndarray


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------


def build_structure(
    positions: jnp.ndarray,
    sigma: jnp.ndarray,
    capacity: int,
    lvl: int = 0,
    point_mask: jnp.ndarray | None = None,
):
    """Build one lattice level from raw positions.

    Equivalent to the reference's ``just_create_verts`` + ``splat_standalone``
    pair (``src/Lattice.cu:221-286, 351-410``) but deterministic: vertex ids
    are assigned in sorted-key order via sort + unique-run cumsum instead of
    racing atomic inserts, so results are reproducible and batchable.

    Args:
      positions: (N, d) float32 raw positions (NOT yet divided by sigma).
      sigma: (d,) or scalar float — lattice scale.
      capacity: static int, max number of vertices stored.
      lvl: static level index (0 = finest).
      point_mask: optional (N,) bool; False rows produce no vertices.

    Returns:
      (structure, splat_idx (N, d+1) int32, splat_weights (N, d+1) float32)
    """
    n, d = positions.shape
    sigma = jnp.broadcast_to(jnp.asarray(sigma, positions.dtype), (d,))
    scaled = positions / sigma
    keys, bary = permutohedral.splat_coords(scaled)  # (N, d+1, d), (N, d+1)

    m = n * (d + 1)
    flat_keys = keys.reshape(m, d)

    if point_mask is not None:
        edge_valid = jnp.repeat(point_mask, d + 1)
        flat_keys = jnp.where(edge_valid[:, None], flat_keys, SENTINEL)

    # lexicographic multi-key sort with the original edge index as payload
    cols = tuple(flat_keys[:, i] for i in range(d))
    sorted_ops = lax.sort(cols + (jnp.arange(m, dtype=jnp.int32),), num_keys=d)
    skeys = jnp.stack(sorted_ops[:d], axis=-1)  # (m, d) sorted
    order = sorted_ops[d]

    svalid = skeys[:, 0] != SENTINEL
    differs = jnp.any(skeys[1:] != skeys[:-1], axis=-1)
    is_new = svalid & jnp.concatenate([jnp.ones((1,), bool), differs])
    uid_sorted = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # dense id per sorted edge
    nr_unique = jnp.sum(is_new.astype(jnp.int32))
    nr_verts = jnp.minimum(nr_unique, capacity)
    nr_overflow = nr_unique - nr_verts

    # sorted key table (keys were sorted already, so scatter lands in order);
    # only the first edge of each run writes — duplicates and sentinel rows
    # would otherwise clobber the row of the preceding unique key.
    uid_scatter = jnp.where(is_new, uid_sorted, capacity)
    keys_table = jnp.full((capacity, d), SENTINEL, dtype=jnp.int32)
    keys_table = keys_table.at[uid_scatter].set(skeys, mode="drop")

    # per-edge vertex id, overflow/invalid -> capacity
    uid_ok = jnp.where(svalid & (uid_sorted < capacity), uid_sorted, capacity)
    vid = jnp.zeros((m,), dtype=jnp.int32).at[order].set(uid_ok.astype(jnp.int32))

    structure = LatticeStructure(
        keys=keys_table,
        nr_verts=nr_verts.astype(jnp.int32),
        nr_overflow=nr_overflow.astype(jnp.int32),
        sigma=sigma,
        capacity=capacity,
        pos_dim=d,
        lvl=lvl,
    )
    return structure, vid.reshape(n, d + 1), bary


@functools.lru_cache(maxsize=None)
def _axis_moves_np(pos_dim: int) -> np.ndarray:
    """(d+1, d) int32 — the '+' move along each of the d+1 lattice axes.

    Axis a < d: +1 on every stored coordinate except -d at a.
    Axis d (the implicit coordinate): +1 on all stored coordinates.
    Mirrors the neighbour construction in ``LatticeGPU.cuh:1568-1601``.
    """
    d = pos_dim
    moves = np.ones((d + 1, d), dtype=np.int32)
    for a in range(d):
        moves[a, a] = -d
    return moves


def _interleave_neighbors(idx_plus: jnp.ndarray, idx_minus: jnp.ndarray) -> jnp.ndarray:
    """Stack per-axis +/- neighbour ids as [a0+, a0-, a1+, a1-, ...].

    Matches the reference's im2row row layout (``LatticeGPU.cuh:1622-1648``):
    neighbour slot 2a is the '+' move on axis a, slot 2a+1 the '-' move, with
    the centre vertex appended last by the callers that include it.
    """
    v, d1 = idx_plus.shape
    return jnp.stack([idx_plus, idx_minus], axis=-1).reshape(v, 2 * d1)


def build_neighbors_same_level(structure: LatticeStructure) -> jnp.ndarray:
    """(capacity, 2(d+1)) neighbour ids for 1-hop convs at one level.

    The centre vertex is the row itself and is not stored.  Rows beyond
    ``nr_verts`` get all-invalid entries.
    """
    d = structure.pos_dim
    moves = jnp.asarray(_axis_moves_np(d))  # (d+1, d)
    keys = structure.keys  # (C, d)
    idx_p = structure.lookup(keys[:, None, :] + moves[None])  # (C, d+1)
    idx_m = structure.lookup(keys[:, None, :] - moves[None])
    nbr = _interleave_neighbors(idx_p, idx_m)
    occ = structure.occupancy_mask()[:, None]
    return jnp.where(occ, nbr, structure.capacity)


def build_neighbors_coarse_from_fine(
    coarse: LatticeStructure, fine: LatticeStructure
) -> jnp.ndarray:
    """(capacity_coarse, 2(d+1)+1) ids into the FINE table for coarsen convs.

    A coarse vertex at key k sits at fine-lattice key 2k (level scale doubles
    per level); its conv patch is the fine vertices at 2k ± axis moves plus
    the centre 2k.  Follows the scale>=1 branch of the reference's cross-level
    im2row (``LatticeGPU.cuh:1488-1560``), centre stored last.
    """
    d = coarse.pos_dim
    moves = jnp.asarray(_axis_moves_np(d))
    base = coarse.keys * 2  # (C, d)
    idx_p = fine.lookup(base[:, None, :] + moves[None])
    idx_m = fine.lookup(base[:, None, :] - moves[None])
    center = fine.lookup(base)  # (C,)
    nbr = jnp.concatenate([_interleave_neighbors(idx_p, idx_m), center[:, None]], axis=-1)
    occ = coarse.occupancy_mask()[:, None]
    return jnp.where(occ, nbr, fine.capacity)


def build_neighbors_fine_from_coarse(
    fine: LatticeStructure, coarse: LatticeStructure
) -> jnp.ndarray:
    """(capacity_fine, 2(d+1)+1) ids into the COARSE table for finefy convs.

    A fine vertex at key k maps into the coarse lattice at k/2, which is only
    a lattice point when every coordinate of k (including the implicit last
    one) is even; candidate neighbours are (k ± move)/2 under the same
    divisibility test.  This reproduces — in exact integer arithmetic — the
    fractional-key logic of the scale<1 branch of the reference im2row
    (``LatticeGPU.cuh:1500-1554`` and the odd/even pos_dim+1 branch
    ``:1574-1601``): for all-even k only the centre exists; otherwise only the
    moved candidates that land on even coordinates do.
    """
    d = fine.pos_dim
    moves = jnp.asarray(_axis_moves_np(d))
    keys = fine.keys  # (C, d)

    def lookup_half(cand):  # cand (..., d) int32 in fine coords
        # divisible by 2 in every stored coord; the implicit coordinate
        # -sum(coords) is then automatically even as well.
        even = jnp.all(cand % 2 == 0, axis=-1)
        half = cand // 2  # exact where even
        idx = coarse.lookup(half)
        return jnp.where(even, idx, coarse.capacity).astype(jnp.int32)

    idx_p = lookup_half(keys[:, None, :] + moves[None])
    idx_m = lookup_half(keys[:, None, :] - moves[None])
    center = lookup_half(keys)
    nbr = jnp.concatenate([_interleave_neighbors(idx_p, idx_m), center[:, None]], axis=-1)
    occ = fine.occupancy_mask()[:, None]
    return jnp.where(occ, nbr, coarse.capacity)


def default_capacity_schedule(capacity: int, nr_levels: int, minimum: int = 256) -> tuple:
    """Halve capacity per coarsening level (vertex counts shrink ~2^d per level)."""
    return tuple(max(minimum, capacity >> lvl) for lvl in range(nr_levels + 1))


def build_hierarchy(
    positions: jnp.ndarray,
    sigma: Any,
    nr_levels: int,
    capacities: Sequence[int],
    point_mask: jnp.ndarray | None = None,
) -> LatticeHierarchy:
    """Build every level + every index table the U-Net forward needs.

    Level l is built by re-splatting the raw positions at sigma * 2^l — the
    ``create_coarse_verts_naive`` strategy the reference model actually uses
    (``src/Lattice.cu:706-740``; chosen over key-halving because it guarantees
    vertices stay near the data, ``Lattice.cuh:60``).

    Args:
      positions: (N, d) float32 raw positions.
      sigma: scalar or (d,) — finest-level sigma.
      nr_levels: number of coarsenings (= model nr_downsamples).
      capacities: per-level vertex capacities, len nr_levels+1.
      point_mask: optional (N,) bool padding mask.
    """
    n, d = positions.shape
    if len(capacities) != nr_levels + 1:
        raise ValueError(f"need {nr_levels + 1} capacities, got {len(capacities)}")
    if point_mask is None:
        point_mask = jnp.ones((n,), dtype=bool)

    sigma = jnp.broadcast_to(jnp.asarray(sigma, positions.dtype), (d,))

    structures = []
    splat_idx = splat_w = None
    for lvl in range(nr_levels + 1):
        s, vid, bw = build_structure(
            positions, sigma * (2.0**lvl), int(capacities[lvl]), lvl=lvl, point_mask=point_mask
        )
        structures.append(s)
        if lvl == 0:
            splat_idx, splat_w = vid, bw

    neighbors_same = tuple(build_neighbors_same_level(s) for s in structures)
    neighbors_coarsen = tuple(
        build_neighbors_coarse_from_fine(structures[i + 1], structures[i])
        for i in range(nr_levels)
    )
    neighbors_finefy = tuple(
        build_neighbors_fine_from_coarse(structures[i], structures[i + 1])
        for i in range(nr_levels)
    )

    return LatticeHierarchy(
        structures=tuple(structures),
        neighbors_same=neighbors_same,
        neighbors_coarsen=neighbors_coarsen,
        neighbors_finefy=neighbors_finefy,
        splat_idx=splat_idx,
        splat_weights=splat_w,
        point_mask=point_mask,
    )
