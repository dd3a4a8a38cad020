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

import contextlib
import contextvars
import functools
import os
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
    "EdgeSort",
    "filter_extent",
    "build_structure",
    "build_neighbors_same_level",
    "build_neighbors_coarse_from_fine",
    "build_neighbors_fine_from_coarse",
    "finefy_from_coarsen_transpose",
    "build_hierarchy",
]

# sentinel key column value; sorts after every real coordinate.
SENTINEL = np.iinfo(np.int32).max


# The four LNT_* knobs below replace the build's full-stream scatters and
# gathers with sorts and scans.  The primitive cost model that motivated
# them (misc/prim_cost_chip.py, v5e, 2^19 rows): lax.sort 2-3 ops 0.5-0.7 ms,
# +4-8 f32 payload operands +0.8-1.2 ms, while a random take is 3.9-6.7 ms,
# a scatter 2.5-7.3 ms, and sorted-index hints change nothing.  All four
# default ON since round 3: the joint in-program A/B on the chip moved the
# full bench from 53.2 -> 36.5 ms/scan inference and 100.9 -> 84.5 ms/step
# training (docs/runs/bench_r3_allon.log); set a knob to 0 to A/B it out.

# Invert the edge-sort permutation with a second 2-operand sort instead of a
# full-stream scatter (measured 0.52 vs 2.50 ms at 2^19 rows).  Only
# sound for UNMASKED builds, where the sort payload is a full permutation of
# [0, m) in both the folded and plain branches; masked builds keep the
# scatter (the folded branch zeroes masked payloads).  Read ONCE at import —
# the flag is not part of any jit cache key, so flipping the env var after a
# build has been traced would silently compare identical programs in an A/B;
# a module constant makes the only supported toggle (set before process
# start / first import) explicit.  A/B runs are separate processes anyway.
_INVPERM_SORT = os.environ.get("LNT_INVPERM_SORT", "1") == "1"

# Carry the per-edge feature rows [positions, values, bary weight] through
# the level-0 build sort as f32 payload operands instead of gathering them
# afterwards: 4-8 extra payload operands cost ~1.2 ms at 2^19 rows where the
# row gather they replace costs 3.9-6.7 ms (misc/prim_cost_chip.py).  Same
# read-once-at-import contract as the other LNT_* build knobs.
_CARRY_FEATS = os.environ.get("LNT_CARRY_FEATS", "1") == "1"

# Build the per-vertex run-end table by sort-compaction instead of a
# (capacity+1)-wide scatter-max: the scatter costs ~4.6 ms at 2^19 rows on
# v5e (sorted-indices hint or not) where a 2-operand sort costs ~0.7 ms
# (misc/prim_cost_chip.py).  Same read-once contract.
_ENDS_SORT = os.environ.get("LNT_ENDS_SORT", "1") == "1"

# Verify merge_lookup hits by a run-start fill-forward (adjacent key
# compare + one tagged cummax) instead of gathering each candidate's table
# keys: the verification gather costs ~5 ms at merge scale where the scan
# costs ~0.2 ms.  Same read-once contract.
_MERGE_FF = os.environ.get("LNT_MERGE_FF", "1") == "1"


def _lex_sort(operands, num_keys=None, is_stable=False):
    """Build sort dispatcher (plain ``lax.sort``).

    Historical note: this dispatcher gated the Pallas bitonic sort, DELETED
    round 3 after losing its on-chip A/B 10-12x — see ``ops_tpu/sort.py``
    for the tombstone and numbers.  Every build call site appends a unique
    ascending payload as its last key operand, so full-lex == the stable
    partial-key order the dedup relies on.
    """
    operands = tuple(operands)
    if num_keys is None:
        num_keys = len(operands)
    return lax.sort(operands, num_keys=num_keys, is_stable=is_stable)

# Trace-time switch: under jax.vmap a lax.cond lowers to a select that
# executes BOTH branches per element, so every data-dependent fast path in
# the build (folded sorts, simplex-reduced coarse levels) would run ON TOP
# of its general fallback — batched builds paid ~2x (the round-2 E3 row:
# 249.6 vs 116.2 ms/step at KITTI scale).  Batched callers wrap their trace
# in ``static_general_branches()`` and every ``_cond_general`` site takes
# the always-correct general branch alone, with no runtime cond.
_STATIC_GENERAL = contextvars.ContextVar("lnt_static_general", default=False)


@contextlib.contextmanager
def static_general_branches():
    """Trace builds with every data-dependent fast-path cond collapsed to its
    general branch (identical outputs — the fast branches are bit-compatible
    shortcuts).  Use around ``jax.vmap`` traces of ``build_hierarchy``."""
    tok = _STATIC_GENERAL.set(True)
    try:
        yield
    finally:
        _STATIC_GENERAL.reset(tok)


def _cond_general(pred, fast, general, operand):
    """``lax.cond`` whose false branch is the always-correct general path;
    collapses statically to it inside ``static_general_branches()``."""
    if _STATIC_GENERAL.get():
        return general(operand)
    return lax.cond(pred, fast, general, operand)


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


# Coordinate bound for the pair-packed key representation.  Lattice keys are
# positions/sigma stretched by the ~2.3x elevation scale; 16383 lattice units
# per axis covers every published dataset config by >15x (KITTI: 100 m at
# sigma 0.6 is ~430 units).  ``ops.check_positions`` enforces it at the data
# boundary.
PACK_BOUND = 1 << 14  # |k| < 16384 -> (k0 + 16384, k1 + 16384) fits 15+15 bits


def _pack_pair_col(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """One pair-packed column: monotone in (a, b) lex order, SENTINEL-stable.

    Shared by :func:`pack_key_pairs` (row form) and ``_dedup_build`` (column
    form) so the packing arithmetic/envelope lives in exactly one place.
    """
    return jnp.where(a == SENTINEL, SENTINEL, a * 65536 + (b + 32768))


def pack_key_pairs(keys: jnp.ndarray) -> jnp.ndarray:
    """Lex-order-preserving pack of (..., d) int32 keys into ceil(d/2) columns.

    Column pairs (2i, 2i+1) combine as ``k0 * 2^16 + (k1 + 2^15)``: monotone
    in (k0, k1) lex order because the k1 payload (0..65535) never crosses a
    k0 step, and exactly invertible while |k| < 2^15 (we require < 2^14).
    SENTINEL rows (empty slots / masked edges) stay SENTINEL: the packed
    maximum at |k| < 2^14 is 0x40007FFF < INT32_MAX, so the sentinel still
    sorts strictly last.  Cuts lexicographic sort/compare operand counts
    nearly in half — the top cost of the hierarchy build.
    """
    d = keys.shape[-1]
    cols = []
    for i in range(0, d - 1, 2):
        cols.append(_pack_pair_col(keys[..., i], keys[..., i + 1]))
    if d % 2:
        cols.append(keys[..., d - 1])
    return jnp.stack(cols, axis=-1)


def unpack_key_pairs(packed: jnp.ndarray, pos_dim: int) -> jnp.ndarray:
    """Inverse of :func:`pack_key_pairs` (SENTINEL rows stay SENTINEL)."""
    d = pos_dim
    cols = []
    for i in range(0, d - 1, 2):
        p = packed[..., i // 2]
        b = jnp.mod(p, 65536) - 32768  # floor-mod: exact for negative p
        a = (p - (b + 32768)) // 65536
        sent = p == SENTINEL
        cols.append(jnp.where(sent, SENTINEL, a))
        cols.append(jnp.where(sent, SENTINEL, b))
    if d % 2:
        cols.append(packed[..., -1])
    return jnp.stack(cols, axis=-1)


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
    # pair-packed key table (capacity, ceil(d/2)); same lex order as ``keys``.
    # Optional for backward compatibility; all builders populate it.
    keys2: Any = None

    @property
    def invalid_index(self) -> int:
        return self.capacity

    def occupancy_mask(self) -> jnp.ndarray:
        """(capacity,) bool — True for real vertices."""
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.nr_verts

    def _packed_table(self) -> jnp.ndarray:
        if self.keys2 is not None:
            return self.keys2
        return pack_key_pairs(self.keys)

    def lookup(self, query_keys: jnp.ndarray) -> jnp.ndarray:
        """Resolve (..., d) int32 keys to row indices; misses -> capacity.

        Replaces ``HashTableGPU::retrieve`` (``HashTableGPU.cuh:491-518``):
        a branchless lower-bound binary search, vectorised over all queries
        (log2(capacity) gather+compare rounds, no data-dependent control
        flow).  Comparisons run on the pair-packed columns.
        """
        c = self.capacity
        table = self._packed_table()
        q = pack_key_pairs(query_keys)
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
            advance = ok & _lex_less(rows, q)
            return jnp.where(advance, cand, pos)

        pos = jax.lax.fori_loop(0, nsteps, body, jnp.zeros(batch_shape, dtype=jnp.int32))
        in_range = pos < c
        rows = jnp.take(table, jnp.minimum(pos, c - 1), axis=0)
        found = in_range & jnp.all(rows == q, axis=-1)
        return jnp.where(found, pos, c).astype(jnp.int32)

    def merge_lookup(self, query_keys: jnp.ndarray) -> jnp.ndarray:
        """Batch lookup via ONE stable sort instead of log2(cap) gather rounds.

        Same contract as :meth:`lookup` (misses -> capacity), but built for
        large query sets: concatenate [table keys, query keys] with position
        payloads, stable-sort (table rows come first so they precede equal
        queries), then the running max of seen table-row ids at each sorted
        position IS the lower-bound candidate for every query — one scan +
        one verification gather instead of 17 dependent binary-search rounds
        (the top cost of the round-1 hierarchy build).  Sorts the pair-packed
        columns: ceil(d/2)+1 operands instead of d+1.
        """
        c = self.capacity
        table = self._packed_table()
        dp = table.shape[1]
        d = self.pos_dim
        shape = query_keys.shape[:-1]
        q = pack_key_pairs(query_keys.reshape(-1, query_keys.shape[-1]))
        nq = q.shape[0]

        keys_all = jnp.concatenate([table, q], axis=0)
        payload = jnp.arange(c + nq, dtype=jnp.int32)
        cols = tuple(keys_all[:, i] for i in range(dp))

        # fold the solo key column with the payload when ranges permit (same
        # trick as the build sort): one fewer sort operand, and the payload
        # tiebreak keeps table rows before equal queries (stability for free)
        bits_p = max(1, c + nq - 1).bit_length()
        bits_k = 31 - bits_p
        if d % 2 == 1 and bits_k >= 10:
            solo = keys_all[:, -1]
            half = jnp.int32(1 << (bits_k - 1))
            valid0 = keys_all[:, 0] != SENTINEL
            kmax = jnp.max(jnp.abs(jnp.where(valid0, solo, 0)))

            def _folded(_):
                p2k = jnp.where(
                    valid0, (solo + half) * jnp.int32(1 << bits_p) + payload, SENTINEL
                )
                srt = _lex_sort(cols[:-1] + (p2k,))
                c_last = srt[-1]
                sval = c_last != SENTINEL
                k_s = jnp.where(sval, (c_last >> bits_p) - half, SENTINEL)
                # sentinel rows carry no payload; route them to a dropped slot
                ord_s = jnp.where(sval, c_last & ((1 << bits_p) - 1), c + nq)
                return srt[:-1] + (k_s, ord_s.astype(jnp.int32))

            def _plain(_):
                # unique ascending payload as last operand: full-lex == stable
                srt = _lex_sort(cols + (payload,), num_keys=dp, is_stable=True)
                return srt[: dp - 1] + (srt[dp - 1], srt[dp])

            out_cols = _cond_general(kmax < half - 1, _folded, _plain, None)
            sorted_ = out_cols
        else:
            sorted_ = _lex_sort(cols + (payload,), num_keys=dp, is_stable=True)
        sid = sorted_[dp]

        # last table row at-or-before each position (table ids ascend with key)
        last_table = lax.cummax(jnp.where(sid < c, sid, -1))
        cand = jnp.maximum(last_table, 0)
        if _MERGE_FF:
            # a query hits iff its equal-key run STARTS with a table row
            # (stable sort puts table rows before equal queries; table keys
            # are unique, so at most one table row per run and last_table at
            # any row of such a run is exactly that table id).  Tag run
            # starts with (position << 1 | is_table) and fill forward with
            # ONE cummax — no per-candidate table-key gather (~5 ms saved at
            # merge scale, misc/prim_cost_chip.py).
            nrows = c + nq
            differs = jnp.zeros((nrows,), bool)
            for i in range(dp):
                col = sorted_[i]
                differs = differs | jnp.concatenate(
                    [jnp.ones((1,), bool), col[1:] != col[:-1]]
                )
            tag = jnp.where(
                differs,
                (jnp.arange(nrows, dtype=jnp.int32) << 1)
                | (sid < c).astype(jnp.int32),
                -1,
            )
            eq = (lax.cummax(tag) & 1) == 1
        else:
            tkeys = lax.gather(
                table,
                cand[:, None],
                lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
                ),
                (1, dp),
                indices_are_sorted=True,
                mode=lax.GatherScatterMode.CLIP,
            )
            skeys = jnp.stack(sorted_[:dp], axis=-1)
            eq = jnp.all(tkeys == skeys, axis=-1) & (last_table >= 0)
        res = jnp.where(eq, cand, c).astype(jnp.int32)

        qslot = jnp.where(sid >= c, sid - c, nq)
        if _INVPERM_SORT:
            # qslot restricted to query rows is a full permutation of
            # [0, nq) (every query appears exactly once; table rows map to
            # the duplicated sentinel nq, which sorts last) — so a 2-op
            # sort applies the inverse permutation without a scatter
            out = lax.sort((qslot, res), num_keys=1)[1][:nq]
        else:
            out = jnp.zeros((nq,), jnp.int32).at[qslot].set(res, mode="drop")
        return out.reshape(shape)


@struct.dataclass
class EdgeSort:
    """The (point, simplex-vertex) edges of level 0, sorted by vertex id.

    ``build_structure`` sorts all N*(d+1) edge keys to dedup vertices; since
    vertex ids are assigned in sorted-key order, that same order IS
    sorted-by-vertex order.  Capturing it here lets every downstream segment
    reduction (splat, local-mean, PointNet max-pool) run sort-free as a
    cumsum/scan over contiguous runs — the argsort the generic segment ops
    would redo per call (18.7 ms each at KITTI scale, round-1 profile) is
    paid once, inside the structure build that already sorts.
    """

    # sorted position -> original flat edge index (edge e = point e//(d+1)).
    # Defined ONLY where vertex < capacity: invalid rows read 0 (the folded
    # key+payload sort cannot carry sentinel payloads); consumers mask by
    # vertex validity before using perm-derived data.
    perm: jnp.ndarray  # (M,) int32
    # vertex id per sorted position; nondecreasing, invalid/overflow = cap.
    vertex: jnp.ndarray  # (M,) int32
    # last sorted position of each vertex's run; -1 for rows >= nr_verts.
    # Runs are dense and ordered (every vertex was created by these edges),
    # so starts[v] = ends[v-1] + 1 and counts[v] = ends[v] - ends[v-1].
    ends: jnp.ndarray  # (capacity,) int32
    # barycentric weight per sorted edge; None when the build skips the
    # full-stream gather (ops.distribute_sorted reconstructs weights from
    # splat_weights + perm instead).
    weights: Any  # (M,) float32 or None
    # carried per-edge feature rows [point_feats..., bary_weight] in sorted
    # order, or None.  Produced when the build sorts f32 payload operands
    # alongside the keys (LNT_CARRY_FEATS): a 2^19-row gather costs
    # 3.9-6.7 ms on v5e while 4-8 extra sort payload operands cost ~1.2 ms
    # (misc/prim_cost_chip.py), so carrying the rows through the sort is how
    # ops.distribute_sorted avoids its full-stream row gather entirely.
    rows: Any = None  # (M, F + 1) float32 or None


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
    # level-0 edges in sorted-by-vertex order (see EdgeSort); None only for
    # hierarchies built by very old callers.
    edges: Any = None


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------


def build_structure(
    positions: jnp.ndarray,
    sigma: jnp.ndarray,
    capacity: int,
    lvl: int = 0,
    point_mask: jnp.ndarray | None = None,
    with_edges: bool = False,
    need_point_maps: bool = True,
    point_feats: jnp.ndarray | None = None,
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
      need_point_maps: when False, skip the point->vertex id map and splat
        weights (returned as None) — the coarse levels of the hierarchy only
        need the key table, and dropping the sort payload + inverse-perm
        scatter makes those builds ~2x cheaper.

    Returns:
      (structure, splat_idx (N, d+1) int32, splat_weights (N, d+1) float32)
    """
    n, d = positions.shape
    sigma = jnp.broadcast_to(jnp.asarray(sigma, positions.dtype), (d,))
    scaled = positions / sigma
    keys, bary = permutohedral.splat_coords(scaled)  # (N, d+1, d), (N, d+1)
    edge_feats = None
    if point_feats is not None and with_edges:
        # per-edge rows [point_feats..., bary weight] as edge-major COLUMNS:
        # each (n,) feature broadcasts to (n, d+1) and flattens for free
        # (edge e = point e // (d+1), corner e % (d+1)); the earlier
        # (n, d+1, F) + reshape form paid a real retile transpose (~0.7 ms
        # at KITTI scale, round-3 xplane trace reshape.149)
        m = n * (d + 1)
        edge_feats = tuple(
            jnp.broadcast_to(
                point_feats[:, i : i + 1].astype(jnp.float32), (n, d + 1)
            ).reshape(m)
            for i in range(point_feats.shape[1])
        ) + (bary.reshape(m).astype(jnp.float32),)
    return _dedup_build(
        keys,
        bary,
        sigma,
        capacity,
        lvl,
        point_mask,
        with_edges,
        need_point_maps,
        edge_feats=edge_feats,
    )


def build_structure_from_elevated(
    elevated: jnp.ndarray,
    sigma: jnp.ndarray,
    capacity: int,
    lvl: int,
    point_mask: jnp.ndarray | None = None,
    need_point_maps: bool = True,
):
    """Build a lattice level from points already in elevated (H_d) coordinates.

    The vertex-proxy coarse build: level-l keys are integer elevated points,
    and dividing by 2 lands them in level-(l+1) elevated coordinates exactly
    (f32 is exact here — integer/2 up to 2^24).
    """
    d1 = elevated.shape[-1]
    keys, bary = permutohedral.splat_coords_elevated(elevated)
    sigma = jnp.broadcast_to(jnp.asarray(sigma), (d1 - 1,)).astype(elevated.dtype)
    s, vid, bw = _dedup_build(
        keys, bary, sigma, capacity, lvl, point_mask, False, need_point_maps
    )
    return s, vid, bw


def _dedup_build(
    keys: jnp.ndarray,
    bary: jnp.ndarray,
    sigma: jnp.ndarray,
    capacity: int,
    lvl: int,
    point_mask: jnp.ndarray | None,
    with_edges: bool,
    need_point_maps: bool = True,
    edge_feats: jnp.ndarray | None = None,
):
    """Shared sort-dedup body: (N, d+1, d) simplex keys -> sorted table.

    Sorts the pair-packed key columns (ceil(d/2) operands instead of d) and
    carries the edge-order payload only when the caller needs point->vertex
    maps; coarse hierarchy levels sort bare keys.  ``edge_feats`` (M, F)
    float32, if given, rides the same sort as extra payload operands and
    comes back as ``EdgeSort.rows`` — see the field comment for why that
    beats gathering the rows afterwards.
    """
    n, d1, d = keys.shape

    m = n * (d + 1)
    # COLUMN-WISE key handling: (n, d1) per-coordinate slices flatten to (m,)
    # for free (edge-major layout match), where the old keys.reshape(m, d)
    # materialized a (524288, d) retile transpose costing ~0.5 ms per use at
    # KITTI scale (round-3 xplane trace, reshape.513/515)
    kc = [keys[:, :, i].reshape(m) for i in range(d)]
    if point_mask is not None:
        edge_valid = jnp.broadcast_to(point_mask[:, None], (n, d1)).reshape(m)
        kc = [jnp.where(edge_valid, c, SENTINEL) for c in kc]

    pcols = []
    for i in range(0, d - 1, 2):
        pcols.append(_pack_pair_col(kc[i], kc[i + 1]))
    if d % 2:
        pcols.append(kc[-1])
    cols = tuple(pcols)
    dp = len(cols)
    if edge_feats is None:
        fcols = ()
    elif isinstance(edge_feats, tuple):
        fcols = edge_feats  # (m,) columns, already edge-major
    else:
        fcols = tuple(edge_feats[:, i] for i in range(edge_feats.shape[1]))
    nf = len(fcols)
    order = None
    if need_point_maps or with_edges:
        # the payload (original edge index) adds a sort operand; when the
        # solo key column's range fits beside the payload bits, fold them
        # into ONE int32 (order = (key, payload) lex, so ties break by edge
        # index — a stable sort for free) and sort one fewer operand.  The
        # guard is data-dependent -> lax.cond to the plain sort.
        bits_p = max(1, m - 1).bit_length()
        bits_k = 31 - bits_p
        payload = jnp.arange(m, dtype=jnp.int32)
        valid0 = kc[0] != SENTINEL
        if d % 2 == 1 and bits_k >= 10:
            solo = kc[-1]  # the unpaired key column
            half = jnp.int32(1 << (bits_k - 1))
            kmax = jnp.max(jnp.abs(jnp.where(valid0, solo, 0)))
            packable = kmax < half - 1

            def _sort_folded(_):
                p2k = jnp.where(
                    valid0, (solo + half) * jnp.int32(1 << bits_p) + payload, SENTINEL
                )
                # p2k is unique over valid rows, so the f32 payload columns
                # ride as non-key operands with deterministic placement
                srt = _lex_sort(cols[:-1] + (p2k,) + fcols, num_keys=dp)
                c_last = srt[dp - 1]
                sval = c_last != SENTINEL
                k_s = jnp.where(sval, (c_last >> bits_p) - half, SENTINEL)
                ord_s = jnp.where(sval, c_last & ((1 << bits_p) - 1), 0)
                return srt[: dp - 1] + (k_s, ord_s.astype(jnp.int32)) + srt[dp:]

            def _sort_plain(_):
                # unique ascending payload as the last lex operand == stable
                # sort on the key columns, matching the folded branch's
                # (key, payload) lex order bit-for-bit
                srt = _lex_sort(
                    cols + (payload,) + fcols,
                    num_keys=dp + 1,
                )
                return srt[: dp - 1] + (srt[dp - 1], srt[dp]) + srt[dp + 1 :]

            out_cols = _cond_general(packable, _sort_folded, _sort_plain, None)
            sorted_ops = out_cols[:dp]
            order = out_cols[dp]
            fsorted = out_cols[dp + 1 :]
        else:
            srt = _lex_sort(
                cols + (payload,) + fcols, num_keys=dp + 1
            )
            sorted_ops = srt[:dp]
            order = srt[dp]
            fsorted = srt[dp + 1 :]
    else:
        sorted_ops = _lex_sort(cols)
        fsorted = ()
    # column-wise dedup compares (no (m, dp) stack materialization)
    svalid = sorted_ops[0] != SENTINEL
    differs = sorted_ops[0][1:] != sorted_ops[0][:-1]
    for c in sorted_ops[1:dp]:
        differs = differs | (c[1:] != c[:-1])
    is_new = svalid & jnp.concatenate([jnp.ones((1,), bool), differs])
    uid_sorted = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # dense id per sorted edge
    nr_unique = jnp.sum(is_new.astype(jnp.int32))
    nr_verts = jnp.minimum(nr_unique, capacity)
    nr_overflow = nr_unique - nr_verts

    # per-vertex run ends via ONE (M,) element scatter; every other table is
    # then a cheap (capacity,)-sized gather off the sorted stream — round 1
    # paid three full-stream scatters here (~2.5 ms each at KITTI scale).
    # uid_sorted is globally nondecreasing (the cumsum holds its value over
    # invalid rows, which sort last), so scatter at min(uid, cap) with the
    # sorted-indices hint and route non-last rows through the -1 init value:
    # bit-identical to the masked-index form, but XLA sees a monotone scatter.
    is_last = jnp.concatenate([differs, jnp.ones((1,), bool)]) & svalid
    real_end = is_last & (uid_sorted < capacity)
    if _ENDS_SORT:
        # sort-compaction: real run-ends carry their (distinct, dense) uid as
        # the key, everything else the sentinel; the sorted payload's first
        # nr_verts entries ARE the ends, in uid order (sort 0.7 ms vs
        # scatter-max 4.6 ms at 2^19 rows, misc/prim_cost_chip.py)
        end_key = jnp.where(real_end, uid_sorted, SENTINEL)
        end_pay = lax.sort((end_key, jnp.arange(m, dtype=jnp.int32)), num_keys=1)[1]
        if capacity > m:
            end_pay = jnp.pad(end_pay, (0, capacity - m), constant_values=-1)
        ends = jnp.where(
            jnp.arange(capacity, dtype=jnp.int32) < nr_verts, end_pay[:capacity], -1
        )
    else:
        ends_vals = jnp.where(real_end, jnp.arange(m, dtype=jnp.int32), -1)
        ends = (
            jnp.full((capacity + 1,), -1, jnp.int32)
            .at[jnp.minimum(uid_sorted, capacity)]
            .max(ends_vals, mode="drop", indices_are_sorted=True)[:capacity]
        )

    # sorted key table: any row of a run carries the key, so gather at ends
    # (per-column 1-D gathers of (capacity,) rows — tiny)
    e_idx = jnp.maximum(ends, 0)
    packed_table = jnp.stack(
        [
            jnp.where(ends >= 0, jnp.take(c, e_idx), SENTINEL)
            for c in sorted_ops[:dp]
        ],
        axis=-1,
    )
    keys_table = unpack_key_pairs(packed_table, d)

    structure = LatticeStructure(
        keys=keys_table,
        nr_verts=nr_verts.astype(jnp.int32),
        nr_overflow=nr_overflow.astype(jnp.int32),
        sigma=sigma,
        capacity=capacity,
        pos_dim=d,
        lvl=lvl,
        keys2=packed_table,
    )
    if not (need_point_maps or with_edges):
        return structure, None, None

    # per-edge vertex id, overflow/invalid -> capacity
    uid_ok = jnp.where(svalid & (uid_sorted < capacity), uid_sorted, capacity)
    # point -> vertex ids in original edge order: the inverse permutation
    # application.  Default is one full-stream scatter; for UNMASKED builds
    # `order` is a full permutation of [0, m) (every row carries its true
    # payload in both sort branches), so a 2-operand sort computes the same
    # thing — opt-in via LNT_INVPERM_SORT (sorts are compute-bound where
    # scatters are row-latency-bound on TPU).  Masked builds always scatter:
    # the folded sort zeroes masked payloads (`mode='drop'` + the init value
    # cover them; masked edges map to `capacity` either way).
    if _INVPERM_SORT and point_mask is None:
        vid = lax.sort(
            (order.astype(jnp.int32), uid_ok.astype(jnp.int32)), num_keys=1
        )[1]
    else:
        vid = (
            jnp.full((m,), capacity, dtype=jnp.int32)
            .at[jnp.where(svalid, order, m)]
            .set(uid_ok.astype(jnp.int32), mode="drop")
        )
    if not with_edges:
        return structure, vid.reshape(n, d + 1), bary

    # weights stay None: ops.distribute_sorted folds the barycentric columns
    # into its own row gather (saves a full-stream gather here) — unless the
    # sort carried the feature rows, in which case no gather happens at all
    edges = EdgeSort(
        perm=order.astype(jnp.int32),
        vertex=uid_ok.astype(jnp.int32),
        ends=ends,
        weights=None,
        rows=jnp.stack(fsorted, axis=-1) if nf else None,
    )
    return structure, vid.reshape(n, d + 1), bary, edges


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


def _same_level_queries(structure: LatticeStructure):
    """(C, d+1, d) '+'-move query keys + (C,) valid-row mask for one level."""
    d = structure.pos_dim
    moves = jnp.asarray(_axis_moves_np(d))  # (d+1, d)
    occ1 = structure.occupancy_mask()
    # sanitize sentinel rows before adding moves (SENTINEL + move wraps
    # int32): wrapped garbage in the solo key column would defeat the
    # folded key+payload sort inside merge_lookup (its kmax guard would
    # always force the plain sort) — results were correct but slower.
    base = jnp.where(occ1[:, None], structure.keys, 0)
    return base[:, None, :] + moves[None], occ1


def _same_level_finish(structure: LatticeStructure, idx_p: jnp.ndarray) -> jnp.ndarray:
    """Reciprocal '-' scatter + interleave: (C, d+1) '+' ids -> full table."""
    d = structure.pos_dim
    cap = structure.capacity
    occ = structure.occupancy_mask()[:, None]
    # reciprocal '-' table: idx_m[u, a] = v wherever idx_p[v, a] = u.  Each
    # (u, a) has at most one v (v's key is u's key minus the move), so the
    # scatter never collides; misses land in the sentinel row cap.
    d1 = d + 1
    v_ids = jnp.broadcast_to(jnp.arange(cap, dtype=jnp.int32)[:, None], (cap, d1))
    cols = jnp.broadcast_to(jnp.arange(d1, dtype=jnp.int32)[None, :], (cap, d1))
    flat = idx_p * d1 + cols  # idx_p == cap rows into the sentinel block
    idx_m = (
        jnp.full(((cap + 1) * d1,), cap, dtype=jnp.int32)
        .at[flat.reshape(-1)]
        .set(v_ids.reshape(-1), mode="drop")
        .reshape(cap + 1, d1)[:cap]
    )
    nbr = _interleave_neighbors(idx_p, idx_m)
    return jnp.where(occ, nbr, cap)


def build_neighbors_same_level(structure: LatticeStructure) -> jnp.ndarray:
    """(capacity, 2(d+1)) neighbour ids for 1-hop convs at one level.

    The centre vertex is the row itself and is not stored.  Rows beyond
    ``nr_verts`` get all-invalid entries.

    Only the '+' moves are resolved by (binary-search) lookup; the '-' moves
    follow by symmetry — ``u = v + m_a  <=>  v = u - m_a`` — via one scatter,
    halving the lookup volume (lookups were the top cost of the round-1
    hierarchy build).
    """
    from lattice_net_tpu.ops_tpu.lookup import monotone_lookup

    queries, occ1 = _same_level_queries(structure)
    idx_p = monotone_lookup(structure, queries, occ1)
    return _same_level_finish(structure, idx_p)


def _coarsen_queries(coarse: LatticeStructure, fine: LatticeStructure):
    """(Cc, 2(d+1)+1, d) candidate FINE keys + (Cc,) valid-row mask."""
    d = coarse.pos_dim
    moves = jnp.asarray(_axis_moves_np(d))
    occ1 = coarse.occupancy_mask()
    # sanitize sentinel rows before doubling (SENTINEL * 2 wraps int32);
    # the caller masks them to capacity anyway
    base = jnp.where(occ1[:, None], coarse.keys, 0) * 2  # (C, d)
    cand = jnp.concatenate(
        [base[:, None, :] + moves[None], base[:, None, :] - moves[None], base[:, None, :]],
        axis=1,
    )  # (C, 2(d+1)+1, d) in [+moves..., -moves..., centre] order
    return cand, occ1


def _coarsen_finish(
    coarse: LatticeStructure, fine: LatticeStructure, idx: jnp.ndarray
) -> jnp.ndarray:
    """Interleave the resolved (Cc, 2(d+1)+1) ids into the coarsen table."""
    d1 = coarse.pos_dim + 1
    idx_p, idx_m, center = idx[:, :d1], idx[:, d1 : 2 * d1], idx[:, 2 * d1]
    nbr = jnp.concatenate([_interleave_neighbors(idx_p, idx_m), center[:, None]], axis=-1)
    occ = coarse.occupancy_mask()[:, None]
    return jnp.where(occ, nbr, fine.capacity)


def build_neighbors_coarse_from_fine(
    coarse: LatticeStructure, fine: LatticeStructure
) -> jnp.ndarray:
    """(capacity_coarse, 2(d+1)+1) ids into the FINE table for coarsen convs.

    A coarse vertex at key k sits at fine-lattice key 2k (level scale doubles
    per level); its conv patch is the fine vertices at 2k ± axis moves plus
    the centre 2k.  Follows the scale>=1 branch of the reference's cross-level
    im2row (``LatticeGPU.cuh:1488-1560``), centre stored last.
    """
    from lattice_net_tpu.ops_tpu.lookup import monotone_lookup

    cand, occ1 = _coarsen_queries(coarse, fine)
    idx = monotone_lookup(fine, cand, occ1)
    return _coarsen_finish(coarse, fine, idx)


def _build_neighbor_tables_merged(structures):
    """All same-level + coarsen neighbour tables with ONE merge_lookup sort
    per fine level.

    Per fine level i, both the same-level '+'-move queries (C_i * (d+1)) and
    level i+1's coarsen-patch queries (C_{i+1} * (2(d+1)+1)) resolve against
    the SAME sorted table ``structures[i]``; concatenating them shares one
    [table; queries] sort instead of two — saving a sort dispatch and a
    duplicate pass over the table per level.  DEFAULT since the round-2
    on-chip in-program A/B (inference 55.1 -> 54.1 ms, train step 102.2 ->
    100.3 ms at KITTI scale, docs/runs/bench_r2_merged.log); disable with
    LNT_MERGED_LOOKUP=0 for A/Bs.  Tables are bit-identical to the separate
    builds (tests/test_structure.py::test_merged_lookup_tables_identical).
    """
    nr_levels = len(structures) - 1
    same, coarsen = [], []
    for i, s in enumerate(structures):
        q_same, occ_same = _same_level_queries(s)  # (C_i, d+1, d)
        if i + 1 <= nr_levels:
            q_coar, occ_coar = _coarsen_queries(structures[i + 1], s)
            n_same = q_same.shape[0] * q_same.shape[1]
            merged = jnp.concatenate(
                [q_same.reshape(-1, s.pos_dim), q_coar.reshape(-1, s.pos_dim)], axis=0
            )
            idx = s.merge_lookup(merged)
            idx_same = idx[:n_same].reshape(q_same.shape[:2])
            idx_coar = idx[n_same:].reshape(q_coar.shape[:2])
            idx_same = jnp.where(occ_same[:, None], idx_same, s.capacity)
            idx_coar = jnp.where(occ_coar[:, None], idx_coar, s.capacity)
            coarsen.append(_coarsen_finish(structures[i + 1], s, idx_coar))
        else:
            from lattice_net_tpu.ops_tpu.lookup import monotone_lookup

            idx_same = monotone_lookup(s, q_same, occ_same)
        same.append(_same_level_finish(s, idx_same))
    return tuple(same), tuple(coarsen)


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


def finefy_from_coarsen_transpose(
    coarsen_table: jnp.ndarray, cap_fine: int, cap_coarse: int
) -> jnp.ndarray:
    """Derive the finefy table as the exact transpose of the coarsen table.

    Identity: finefy[f][+a] = c  <=>  f_key = 2*c_key - m_a  <=>
    coarsen[c][-a] = f (and centre <-> centre) — so the 2(d+1)+1 lookups per
    fine vertex of :func:`build_neighbors_fine_from_coarse` (the single
    largest lookup volume in the round-1 hierarchy build: 9*cap_fine binary
    searches) collapse into one scatter of the already-built coarsen table
    with '+'/'-' slots swapped.  Each (f, slot) target has at most one source
    (the coarse key is determined by the fine key and the move), so the
    scatter is collision-free.
    """
    cc, extent = coarsen_table.shape  # extent = 2(d+1)+1
    d1 = (extent - 1) // 2
    # slot permutation on the source side: 2a <-> 2a+1, centre last unchanged
    swap = np.arange(extent)
    swap[0 : 2 * d1 : 2] = np.arange(extent)[1 : 2 * d1 : 2]
    swap[1 : 2 * d1 : 2] = np.arange(extent)[0 : 2 * d1 : 2]
    src = coarsen_table[:, swap]  # (C_coarse, extent), fine ids

    c_ids = jnp.broadcast_to(jnp.arange(cc, dtype=jnp.int32)[:, None], (cc, extent))
    cols = jnp.broadcast_to(jnp.arange(extent, dtype=jnp.int32)[None, :], (cc, extent))
    flat = src * extent + cols  # src == cap_fine rows land in the sentinel block
    out = (
        jnp.full(((cap_fine + 1) * extent,), cap_coarse, dtype=jnp.int32)
        .at[flat.reshape(-1)]
        .set(c_ids.reshape(-1), mode="drop")
        .reshape(cap_fine + 1, extent)[:cap_fine]
    )
    return out


def default_capacity_schedule(capacity: int, nr_levels: int, minimum: int = 256) -> tuple:
    """Halve capacity per coarsening level (vertex counts shrink ~2^d per level)."""
    return tuple(max(minimum, capacity >> lvl) for lvl in range(nr_levels + 1))


def capacity_schedule_from_occupancy(
    occupancy: Sequence[int],
    headroom: float = 2.0,
    minimum: int = 256,
    snap_pow2: bool = True,
) -> tuple:
    """Per-level capacities derived from MEASURED occupancy, not guesses.

    Compute in the static-shape design scales with *capacity*, so capacities
    far above occupancy are pure padding FLOPs (the ScanNet config's 5M hash
    slots exist only because the reference's open-addressing table degrades
    past ~32% load — the sorted dense table here has no load-factor cost,
    and actual occupancy at that workload is 72k).  Given the occupancy of a
    representative (e.g. previous) cloud, this returns per-level capacities
    with ``headroom`` slack, snapped up to powers of two so consecutive
    clouds of similar density reuse the same compiled program (the "bucket").

    Measured per-level occupancy ratios are ~2.7-4x, not the 2x of
    :func:`default_capacity_schedule` — deriving each level from its own
    occupancy instead of halving removes that second padding source.
    """
    caps = []
    for occ in occupancy:
        want = max(minimum, int(np.ceil(max(int(occ), 1) * headroom)))
        if snap_pow2:
            want = 1 << (want - 1).bit_length()
        else:
            want = -(-want // 256) * 256  # 256-divisible for lane tiling
        caps.append(max(minimum, want))
    return tuple(caps)


def escalate_capacities(
    capacities: Sequence[int],
    overflow: Sequence[int],
    occupancy: Sequence[int] | None = None,
    headroom: float = 1.5,
) -> tuple:
    """Grow every level that overflowed (host-side retry step).

    The adaptive-bucket loop is: build+forward at the current bucket, read
    the (always-computed) per-level overflow counters, and — on the rare
    scan that outgrows its bucket — escalate and redo that scan.  The
    builders count the unique keys that did NOT fit, so
    ``occupancy + overflow`` is the exact vertex count and one escalation
    always suffices when ``occupancy`` is passed; without it, double.  The
    reference's failure mode for the same event is silently dropping the
    overflowing vertices (``kernels/LatticeGPU.cuh:825-832``)."""
    if occupancy is not None:
        return tuple(
            c if int(o) == 0
            else capacity_schedule_from_occupancy([int(n) + int(o)], headroom)[0]
            for c, o, n in zip(capacities, overflow, occupancy)
        )
    return tuple(
        c * 2 if int(o) > 0 else c for c, o in zip(capacities, overflow)
    )


def compact_hierarchy(h: LatticeHierarchy, new_capacities: Sequence[int]) -> LatticeHierarchy:
    """Re-pack a hierarchy into smaller per-level capacities (pure slicing).

    The sort-dedup builders store all real vertices DENSELY at the front of
    each table (ids assigned by cumsum over sorted unique runs), so shrinking
    capacity is: slice every per-vertex array to the new row count and clamp
    the invalid-index marker from ``old_capacity`` down to ``new_capacity``
    (valid ids are < nr_verts <= new_capacity, so ``min`` is exact).  Use
    when one safe-capacity build must feed a smaller compiled forward
    without paying a rebuild.  Levels whose occupancy exceeds the new
    capacity surface in ``nr_overflow`` (callers assert zero, same contract
    as the builders).
    """
    new_capacities = tuple(int(c) for c in new_capacities)
    if len(new_capacities) != len(h.structures):
        raise ValueError(
            f"need {len(h.structures)} capacities, got {len(new_capacities)}"
        )
    for st, nc in zip(h.structures, new_capacities):
        if nc > st.capacity:
            raise ValueError(
                f"compact_hierarchy only shrinks: level {st.lvl} "
                f"{st.capacity} -> {nc}"
            )

    def clamp(idx, new_cap):
        return jnp.minimum(idx, jnp.int32(new_cap))

    structures = []
    for st, nc in zip(h.structures, new_capacities):
        lost = jnp.maximum(st.nr_verts - nc, 0)
        structures.append(
            st.replace(
                keys=st.keys[:nc],
                keys2=None if st.keys2 is None else st.keys2[:nc],
                nr_verts=jnp.minimum(st.nr_verts, nc),
                nr_overflow=st.nr_overflow + lost,
                capacity=nc,
            )
        )
    neighbors_same = tuple(
        clamp(t[:nc], nc) for t, nc in zip(h.neighbors_same, new_capacities)
    )
    # coarsen[i]: rows = level i+1, values = level i; finefy[i] is the mirror
    neighbors_coarsen = tuple(
        clamp(t[: new_capacities[i + 1]], new_capacities[i])
        for i, t in enumerate(h.neighbors_coarsen)
    )
    neighbors_finefy = tuple(
        clamp(t[: new_capacities[i]], new_capacities[i + 1])
        for i, t in enumerate(h.neighbors_finefy)
    )
    edges = h.edges
    if edges is not None:
        nc0 = new_capacities[0]
        edges = edges.replace(
            vertex=clamp(edges.vertex, nc0),
            ends=edges.ends[:nc0],
        )
    return LatticeHierarchy(
        structures=tuple(structures),
        neighbors_same=neighbors_same,
        neighbors_coarsen=neighbors_coarsen,
        neighbors_finefy=neighbors_finefy,
        splat_idx=None if h.splat_idx is None else clamp(h.splat_idx, new_capacities[0]),
        splat_weights=h.splat_weights,
        point_mask=h.point_mask,
        edges=edges,
    )


def _canonical_fast_build(
    positions: jnp.ndarray,
    sigma: jnp.ndarray,
    capacity: int,
    s_cap: int,
    point_mask: jnp.ndarray,
):
    """Level-0 build for canonically-ordered points: dedup one corner set per
    occupied SIMPLEX instead of one key per (point, vertex) edge.

    Under :func:`canonical_point_order`, points of the same simplex are
    adjacent, so simplex runs fall out of one adjacent-equality pass — no
    sort.  The vertex table is then the dedup of the ~0.2*N unique simplices'
    (d+1) corner keys (closed form from (rem0, rank)), a sort of s_cap*(d+1)
    rows instead of N*(d+1): 4x less sort volume at KITTI densities.  The
    sorted-edge stream (EdgeSort) is reconstructed by EXPANDING the sorted
    corner blocks (runs of equal vertex) with run lengths — two scatters, two
    cummax fills and one int32 gather over the edge stream, instead of the
    full-stream sort payload machinery.

    Correctness does NOT depend on the order actually being canonical: a
    wrong order merely fragments runs (duplicate corner sets dedup to the
    same vertices; equal keys still sort adjacent), costing rep slots, never
    wrong results.  The one PRECONDITION is that masked points form a suffix
    (an interior masked point would be swallowed into its surrounding run's
    expansion) — canonical_point_order(…, point_mask) guarantees it.

    Returns (structure, splat_idx, bary, edges, runs) where runs =
    (run_valid (s_cap,), rem0_runs (s_cap, d+1), rank_runs (s_cap, d+1),
    overflow ()) feeds the coarse-level barycenter build for free.
    """
    n, d = positions.shape
    d1 = d + 1
    m = n * d1
    scaled = positions / sigma
    elev = permutohedral.elevate(scaled)
    rem0, rank, bary = permutohedral.find_enclosing_simplex(elev)

    valid = point_mask
    same = (
        jnp.all(rem0[1:] == rem0[:-1], axis=-1)
        & jnp.all(rank[1:] == rank[:-1], axis=-1)
    )
    is_new = valid & jnp.concatenate([jnp.ones((1,), bool), ~same])
    runid_raw = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    runid = jnp.where(valid & (runid_raw < s_cap), runid_raw, s_cap)
    n_runs = jnp.sum(is_new.astype(jnp.int32))
    overflow_runs = jnp.maximum(n_runs - s_cap, 0)

    # per-run start / end point indices (one (n,)-scatter each)
    ii = jnp.arange(n, dtype=jnp.int32)
    run_start = (
        jnp.full((s_cap + 1,), n, jnp.int32).at[runid].min(ii, mode="drop")[:s_cap]
    )
    run_end = (
        jnp.full((s_cap + 1,), -1, jnp.int32).at[runid].max(ii, mode="drop")[:s_cap]
    )
    run_valid = jnp.arange(s_cap, dtype=jnp.int32) < jnp.minimum(n_runs, s_cap)
    run_len = jnp.where(run_valid, run_end - run_start + 1, 0)

    # corner keys per unique simplex, closed form from the run representative
    rs = jnp.minimum(run_start, n - 1)
    rem0_runs = jnp.take(rem0, rs, axis=0)  # (s_cap, d+1)
    rank_runs = jnp.take(rank, rs, axis=0)
    runs = (run_valid, rem0_runs, rank_runs, overflow_runs)

    def _fast(_):
        corner_keys = permutohedral.vertex_keys(rem0_runs, rank_runs)
        structure, corner_vid, _, edges_b = _dedup_build(
            corner_keys, None, sigma, capacity, 0, run_valid, with_edges=True
        )

        # splat maps: every point of a run shares the run's corner ids
        svid = jnp.take(corner_vid, jnp.minimum(runid, s_cap - 1), axis=0)
        splat_idx = jnp.where((runid < s_cap)[:, None], svid, capacity)

        # --- expand sorted corner blocks into the sorted edge stream --------
        nb = s_cap * d1
        b_sorted = edges_b.perm  # (nb,) sorted-block -> flat block r*d1+j
        v_sorted = edges_b.vertex  # (nb,) nondecreasing vertex ids, invalid = cap
        r_of = b_sorted // d1
        j_of = b_sorted - r_of * d1
        bsz = jnp.where(v_sorted < capacity, jnp.take(run_len, r_of), 0)  # (nb,)
        csum = jnp.cumsum(bsz)
        bstart = csum - bsz
        mv = csum[-1]  # total valid edges (dynamic)

        live = bsz > 0
        seq = jnp.arange(nb, dtype=jnp.int32)
        # block-id fill-forward: scatter each live block's sequence number at
        # its first edge position, cummax fills the run (seq nondecreasing)
        mark = (
            jnp.full((m + 1,), -1, jnp.int32)
            .at[jnp.where(live, bstart, m)]
            .max(seq, mode="drop")[:m]
        )
        b_of = jnp.maximum(lax.cummax(mark), 0)  # (m,)
        # vertex fill-forward (v_sorted nondecreasing over live blocks)
        vmark = (
            jnp.full((m + 1,), -1, jnp.int32)
            .at[jnp.where(live, bstart, m)]
            .max(v_sorted, mode="drop")[:m]
        )
        ie = jnp.arange(m, dtype=jnp.int32)
        in_range = ie < mv
        vert_e = jnp.where(in_range, lax.cummax(vmark), capacity).astype(jnp.int32)

        # one int32 gather carries (run_start - bstart) and j packed together:
        # A + m in [0, m + n), times d1 plus j stays well under 2^31
        a2 = (jnp.take(run_start, r_of) - bstart + m) * d1 + j_of  # (nb,)
        a2_e = jnp.take(a2, b_of)  # (m,) the ONE per-edge gather
        point_sorted = a2_e // d1 - m + ie  # run_start + (i - bstart)
        j_e = a2_e - (a2_e // d1) * d1
        perm_e = jnp.where(in_range, point_sorted * d1 + j_e, 0).astype(jnp.int32)

        ends = (
            jnp.full((capacity + 1,), -1, jnp.int32)
            .at[jnp.where(live, v_sorted, capacity)]
            .max(bstart + bsz - 1, mode="drop")[:capacity]
        )

        edges = EdgeSort(perm=perm_e, vertex=vert_e, ends=ends, weights=None)
        return structure, splat_idx, edges

    def _slow(_):
        # rep budget exhausted (non-canonical input or pathological density):
        # the generic full-stream sort build, bit-compatible outputs
        keys = permutohedral.vertex_keys(rem0, rank)
        structure, splat_idx, _, edges = _dedup_build(
            keys, bary, sigma, capacity, 0, point_mask, with_edges=True
        )
        return structure, splat_idx, edges

    structure, splat_idx, edges = _cond_general(overflow_runs == 0, _fast, _slow, None)
    return structure, splat_idx, bary, edges, runs


def canonical_point_order(
    positions: jnp.ndarray, sigma: Any, point_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Permutation sorting points by (level-0 simplex, rank) — "sig order".

    Feeding the pipeline canonically-ordered points makes every per-point
    index stream CLUSTERED: points of the same/adjacent simplices are
    contiguous, so their splat indices (head gathers) and the edge->point
    map (distribute) stay inside small windows — unlocking the Pallas
    windowed gathers — and the simplex-rep dedup needs no further sort.
    The order equals the (id0, rank) signature order of ``_simplex_reps``
    because remainder-0 keys equal rem0 and table ids are assigned in key
    order.  Purely a performance transform: the lattice is permutation
    invariant (labels/outputs must be permuted alongside).

    With ``point_mask``, masked (padding) points sort strictly last, so the
    reordered mask is a prefix — the precondition of the canonical fast
    build (:func:`_canonical_fast_build`).
    """
    n, d = positions.shape
    sigma = jnp.broadcast_to(jnp.asarray(sigma, positions.dtype), (d,))
    elev = permutohedral.elevate(positions / sigma)
    rem0, rank, _ = permutohedral.find_enclosing_simplex(elev)
    bpe = max(1, d.bit_length())
    w = jnp.asarray([1 << (bpe * i) for i in range(d + 1)], jnp.int32)
    rankpack = jnp.sum(rank * w, axis=-1).astype(jnp.int32)
    key = pack_key_pairs(rem0[..., :d])  # (n, ceil(d/2)) lex == rem0 lex
    last = key[:, -1] * jnp.int32(1 << (bpe * (d + 1))) + rankpack if d % 2 else rankpack
    cols = [key[:, i] for i in range(key.shape[1] - (1 if d % 2 else 0))] + [last]
    if point_mask is not None:
        cols = [jnp.where(point_mask, c, SENTINEL) for c in cols]
    cols = tuple(cols)
    sorted_ = lax.sort(cols + (jnp.arange(n, dtype=jnp.int32),), num_keys=len(cols))
    return sorted_[-1]


def _simplex_reps(
    positions: jnp.ndarray,
    sigma: jnp.ndarray,
    splat_idx: jnp.ndarray,
    point_mask: jnp.ndarray,
    structure0: "LatticeStructure",
    s_cap: int,
    assume_sorted: bool = False,
):
    """One barycenter per occupied level-0 simplex (alcove).

    The permutohedral triangulations at sigma and 2*sigma are nested (the
    2-sigma cut planes are the even subset of the sigma ones), so every
    level-0 alcove lies inside exactly ONE alcove of every coarser level.
    Hence the coarse vertex set is a function of the set of OCCUPIED level-0
    alcoves — the coarse re-splat only needs one interior point per alcove
    (its barycenter) instead of all N points (validated exactly in
    tests/test_sorted_ops.py::test_simplex_coarse_matches_resplat).

    A simplex is identified by (remainder-0 vertex id, rank permutation)
    packed into one int32, and its barycenter decodes in closed form:
    ``bary = rem0 + d/2 - rank`` per elevated coordinate (mean of the d+1
    vertex keys; exact, tests/test_structure).  So the dedup sorts ONE int32
    column with no payload, and no representative points are tracked at all.

    Returns:
      valid: (s_cap,) bool — slot holds a unique occupied simplex.
      bary_elev: (s_cap, d+1) barycenter in LEVEL-0 elevated coords.
      overflow: () int32 — nonzero forces the resplat fallback (slots
        exhausted, or level-0 table overflow made signatures undecodable).
    """
    n, d = positions.shape
    cap0 = structure0.capacity
    bpe = max(1, d.bit_length())  # bits per rank entry (rank in [0, d])
    elev0 = permutohedral.elevate(positions / sigma)
    _, rank, _ = permutohedral.find_enclosing_simplex(elev0)
    w = jnp.asarray([1 << (bpe * i) for i in range(d + 1)], jnp.int32)
    packed_rank = jnp.sum(rank * w, axis=-1).astype(jnp.int32)
    rbits = bpe * (d + 1)
    id0 = splat_idx[:, 0].astype(jnp.int32)
    sig = id0 * jnp.int32(1 << rbits) + packed_rank
    # masked padding points drop out via the sentinel; level-0-overflowed
    # points (id0 == cap0) have no decodable rem0 -> force the fallback
    sig = jnp.where(point_mask & (id0 < cap0), sig, SENTINEL)
    n_bad = jnp.sum((point_mask & (id0 >= cap0)).astype(jnp.int32))

    if assume_sorted:
        # canonical point order (see canonical_point_order): sig is already
        # nondecreasing — run detection needs no sort
        ssig = sig
    else:
        (ssig,) = lax.sort((sig,), num_keys=1)
    is_new = (ssig != SENTINEL) & jnp.concatenate(
        [jnp.ones((1,), bool), ssig[1:] != ssig[:-1]]
    )
    rrank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    s_count = jnp.sum(is_new.astype(jnp.int32))
    slot = jnp.where(is_new & (rrank < s_cap), rrank, s_cap)
    usig = jnp.full((s_cap,), SENTINEL, jnp.int32).at[slot].set(ssig, mode="drop")
    overflow = s_count - jnp.minimum(s_count, s_cap) + n_bad

    valid = usig != SENTINEL
    uid0 = jnp.where(valid, usig >> rbits, 0)
    urank_packed = jnp.where(valid, usig & ((1 << rbits) - 1), 0)
    shifts = jnp.asarray([bpe * i for i in range(d + 1)], jnp.int32)
    urank = (urank_packed[:, None] >> shifts[None, :]) & ((1 << bpe) - 1)  # (s_cap, d+1)
    rem0 = jnp.take(structure0.keys, uid0, axis=0)  # (s_cap, d) stored coords
    rem0_full = jnp.concatenate([rem0, -jnp.sum(rem0, -1, keepdims=True)], -1)
    bary_elev = (
        rem0_full.astype(positions.dtype) + d / 2.0 - urank.astype(positions.dtype)
    )  # (s_cap, d+1)
    return valid, bary_elev, overflow


def build_hierarchy(
    positions: jnp.ndarray,
    sigma: Any,
    nr_levels: int,
    capacities: Sequence[int],
    point_mask: jnp.ndarray | None = None,
    coarse_from_vertices: bool = False,
    coarse_mode: str | None = None,
    canonical_points: bool = False,
    point_feats: jnp.ndarray | None = None,
) -> LatticeHierarchy:
    """Build every level + every index table the U-Net forward needs.

    Coarse-level strategies (``coarse_mode``):

    * ``"resplat"`` — re-splat the raw positions at sigma * 2^l, the
      ``create_coarse_verts_naive`` strategy the reference model uses
      (``src/Lattice.cu:706-740``).  Bit-exact reference parity.
    * ``"simplex"`` (auto-default for d == 3) — re-splat only ONE barycenter
      per occupied level-0 simplex: the nested-triangulation property makes
      this produce the same coarse key set while sorting ~2-8x fewer rows
      (see :func:`_simplex_reps`).  Differs from "resplat" only by float-ulp
      rounding of the elevation (it halves the level-0 elevated coords
      instead of re-elevating halved positions); if the number of unique
      simplices ever exceeds the rep budget, a ``lax.cond`` falls back to
      the full re-splat — never silently dropping vertices.
    * ``"vertices"`` — legacy opt-in APPROXIMATION (splats the previous
      level's unique vertices; misses ~8% of reachable coarse vertices,
      quantified in tests/test_sorted_ops).

    Args:
      positions: (N, d) float32 raw positions.
      sigma: scalar or (d,) — finest-level sigma.
      nr_levels: number of coarsenings (= model nr_downsamples).
      capacities: per-level vertex capacities, len nr_levels+1.
      point_mask: optional (N,) bool padding mask.
      coarse_from_vertices: back-compat alias for coarse_mode="vertices".
    """
    n, d = positions.shape
    if len(capacities) != nr_levels + 1:
        raise ValueError(f"need {nr_levels + 1} capacities, got {len(capacities)}")
    # unmasked builds keep point_mask=None at level 0: the sort payload is
    # then a full permutation, which unlocks the sort-based inverse
    # permutation (_INVPERM_SORT) — a materialized all-true mask would
    # silently force the scatter path
    mask_given = point_mask is not None
    if point_mask is None:
        point_mask = jnp.ones((n,), dtype=bool)
    if not _CARRY_FEATS:
        point_feats = None
    elif point_feats is not None:
        # distribute rows are [positions, values, bary]; the caller passes
        # the values and the build prepends its own positions
        point_feats = jnp.concatenate(
            [positions, point_feats.astype(positions.dtype)], axis=-1
        )

    if coarse_mode is None:
        coarse_mode = "vertices" if coarse_from_vertices else "auto"
    # signature-width guard for the simplex-reduced build: the packed
    # (id0, rank) signature of _simplex_reps must fit 31 bits or distinct
    # simplices silently merge.  Validated for BOTH the auto choice and an
    # explicit coarse_mode="simplex" — an explicit request outside the safe
    # envelope raises instead of corrupting the coarse key set.
    bpe = max(1, d.bit_length())
    sig_bits = bpe * (d + 1) + (int(capacities[0]) + 1).bit_length()
    # <= 30 keeps every valid signature below the 1.5e9 singleton range
    # used for level-0-overflowed points (see _simplex_reps)
    simplex_ok = d == 3 and sig_bits <= 30
    if coarse_mode == "auto":
        coarse_mode = "simplex" if simplex_ok else "resplat"
    elif coarse_mode == "simplex" and not simplex_ok:
        raise ValueError(
            f"coarse_mode='simplex' needs d == 3 and a 31-bit signature "
            f"(d={d}, sig_bits={sig_bits}, capacity={int(capacities[0])}); "
            "use coarse_mode='resplat' for this configuration"
        )
    if coarse_mode not in ("resplat", "simplex", "vertices"):
        raise ValueError(f"unknown coarse_mode {coarse_mode!r}")

    sigma = jnp.broadcast_to(jnp.asarray(sigma, positions.dtype), (d,))

    structures = []
    splat_idx = splat_w = edges = None
    reps_pack = None
    for lvl in range(nr_levels + 1):
        if lvl > 0 and coarse_mode == "vertices":
            prev = structures[-1]
            occ = prev.occupancy_mask()
            k = jnp.where(occ[:, None], prev.keys, 0)
            elevated = jnp.concatenate([k, -jnp.sum(k, axis=-1, keepdims=True)], axis=-1)
            s, _, _ = build_structure_from_elevated(
                elevated.astype(jnp.float32) / 2.0,
                sigma * (2.0**lvl),
                int(capacities[lvl]),
                lvl=lvl,
                point_mask=occ,
                need_point_maps=False,
            )
            structures.append(s)
            continue
        if lvl > 0 and coarse_mode == "simplex":
            if reps_pack is None:
                # slots for unique occupied simplices: measured ~0.2 per point
                # at real scan densities (25k for 131k KITTI points), so half
                # the level-0 capacity is ample; the resplat fallback makes
                # an overflow merely slower, never wrong
                s_cap = min(n, max(256, int(capacities[0]) // 2))
                reps_pack = _simplex_reps(
                    positions,
                    sigma,
                    splat_idx,
                    point_mask,
                    structures[0],
                    s_cap,
                    assume_sorted=canonical_points,
                )
            rep_valid, bary_elev, rep_overflow = reps_pack

            def _reduced(operand, lvl=lvl):
                bary, rmask = operand
                s, _, _ = build_structure_from_elevated(
                    bary / (2.0**lvl),
                    sigma * (2.0**lvl),
                    int(capacities[lvl]),
                    lvl=lvl,
                    point_mask=rmask,
                    need_point_maps=False,
                )
                return s

            def _full(operand, lvl=lvl):
                return build_structure(
                    positions,
                    sigma * (2.0**lvl),
                    int(capacities[lvl]),
                    lvl=lvl,
                    point_mask=point_mask,
                    need_point_maps=False,
                )[0]

            s = _cond_general(
                rep_overflow == 0, _reduced, _full, (bary_elev, rep_valid)
            )
            structures.append(s)
            continue
        if lvl == 0 and canonical_points:
            # canonical order: build level 0 from one corner set per simplex
            # RUN (adjacent-equality, no point sort) — ~4x less sort volume —
            # and hand the runs to the coarse levels as free barycenters
            s_cap0 = min(n, max(256, int(capacities[0]) // 2))
            s0, splat_idx, splat_w, edges, runs = _canonical_fast_build(
                positions, sigma, int(capacities[0]), s_cap0, point_mask
            )
            structures.append(s0)
            if coarse_mode == "simplex":
                run_valid, rem0_runs, rank_runs, run_overflow = runs
                bary_elev0 = (
                    rem0_runs.astype(positions.dtype)
                    + d / 2.0
                    - rank_runs.astype(positions.dtype)
                )
                reps_pack = (run_valid, bary_elev0, run_overflow)
            continue
        out = build_structure(
            positions,
            sigma * (2.0**lvl),
            int(capacities[lvl]),
            lvl=lvl,
            point_mask=point_mask if mask_given else None,
            with_edges=(lvl == 0),
            # coarse levels only contribute their key table (+ neighbour
            # tables); the point->vertex maps exist at level 0 alone
            need_point_maps=(lvl == 0),
            point_feats=point_feats if lvl == 0 else None,
        )
        structures.append(out[0])
        if lvl == 0:
            _, splat_idx, splat_w, edges = out

    if os.environ.get("LNT_MERGED_LOOKUP", "1") == "1":
        neighbors_same, neighbors_coarsen = _build_neighbor_tables_merged(structures)
    else:
        neighbors_same = tuple(build_neighbors_same_level(s) for s in structures)
        neighbors_coarsen = tuple(
            build_neighbors_coarse_from_fine(structures[i + 1], structures[i])
            for i in range(nr_levels)
        )
    # finefy tables are free: exact transposes of the coarsen tables
    neighbors_finefy = tuple(
        finefy_from_coarsen_transpose(
            neighbors_coarsen[i], structures[i].capacity, structures[i + 1].capacity
        )
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
        edges=edges,
    )
