"""Differentiable lattice operators (splat / distribute / conv / slice / gather).

Each op here replaces one reference CUDA kernel family with shape-static JAX
array programs.  Backward passes come from JAX AD: the adjoint of a gather is
a scatter-add, which is exactly the hand-written ``row2im`` / ``*_backwards``
kernels of the reference (``LatticeGPU.cuh:2067-2305, 3540-3817``) — so no
manual adjoints are needed for correctness; Pallas custom-vjp kernels can be
swapped in later purely for speed.

Index conventions (see lattice.structure): invalid = capacity; all gathers
mask, all scatters use mode='drop'.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from lattice_net_tpu.ops_tpu.gather import take_rows as _take_rows


def _fast_ops() -> bool:
    """Route gathers through the take_rows custom-VJP path on TPU.

    The forward is a plain clamped take either way; the custom VJP pins the
    adjoint to an f32-accumulating scatter-add (chained-dispatch-measured
    fastest at lattice shapes).  Disable with LNT_FAST_OPS=0 (tests compare
    both paths).
    """
    env = os.environ.get("LNT_FAST_OPS")
    if env is not None:
        return env != "0"
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def check_positions(positions, values=None, sigma=None) -> None:
    """Host-side input validation (``Lattice::check_positions``,
    ``src/Lattice.cu:162-181``): dtype/rank/finite checks before a cloud
    enters the pipeline.  Call on numpy inputs at the data boundary — inside
    jit everything is shape-static by construction.

    When ``sigma`` is given, additionally verifies the scene fits the packed
    key representation (|lattice key| < structure.PACK_BOUND): keys scale as
    ~2.4 * |position| / sigma, so the bound allows scenes ~6000 sigma across
    — 15x the largest published config (KITTI: 100 m at sigma 0.6)."""
    import numpy as np

    p = np.asarray(positions)
    if p.ndim != 2 or p.shape[1] not in (2, 3, 4, 5, 6):
        raise ValueError(f"positions must be (N, d) with d in 2..6, got {p.shape}")
    if p.shape[0] == 0:
        raise ValueError("empty point cloud")
    if not np.issubdtype(p.dtype, np.floating):
        raise TypeError(f"positions must be float, got {p.dtype}")
    if not np.all(np.isfinite(p)):
        raise ValueError("positions contain NaN/Inf")
    if sigma is not None:
        from lattice_net_tpu.lattice.structure import PACK_BOUND

        s = np.broadcast_to(np.asarray(sigma, np.float64), (p.shape[1],))
        # elevation stretches scaled coords by < (d+1)*sqrt(2/3)/sqrt(2) per
        # axis; 2.5 bounds it for d <= 6, plus margin for neighbour moves
        max_key = 2.5 * np.max(np.abs(p) / s) + 8
        if max_key >= PACK_BOUND:
            raise ValueError(
                f"scene too large for packed lattice keys: |key| ~ {max_key:.0f} "
                f">= {PACK_BOUND}; increase sigma or crop the cloud"
            )
    if values is not None:
        v = np.asarray(values)
        if v.ndim != 2 or v.shape[0] != p.shape[0]:
            raise ValueError(f"values must be (N, C) matching positions, got {v.shape}")
        if not np.all(np.isfinite(v)):
            raise ValueError("values contain NaN/Inf")


def gather_rows(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(cap, C) x (...,) int32 -> (..., C); idx clamped to the last row."""
    flat = idx.reshape(-1)
    if _fast_ops():
        out = _take_rows(values, flat)
    else:
        out = jnp.take(values, jnp.minimum(flat, values.shape[0] - 1), axis=0)
    return out.reshape(idx.shape + values.shape[1:])


def _maybe_bf16(values: jnp.ndarray) -> jnp.ndarray:
    """bf16 on TPU unless LNT_CONV_DTYPE=f32 (same policy as conv_im2row)."""
    conv_dt = os.environ.get("LNT_CONV_DTYPE", "")
    if conv_dt == "bf16" or (conv_dt != "f32" and _fast_ops()):
        return values.astype(jnp.bfloat16)
    return values


def gather_rows_clustered(values: jnp.ndarray, idx2: jnp.ndarray) -> jnp.ndarray:
    """(cap, C) x (N, K) -> (N, K, C) with zeros for idx >= cap.

    Routes through the Pallas windowed patch kernel when the index columns
    are clustered (canonically-ordered points make per-point splat indices
    so); the kernel's coverage cond falls back to the plain gather
    otherwise, so this is always safe to call.
    """
    cap = values.shape[0]
    if _fast_ops():
        from lattice_net_tpu.ops_tpu import patch as _patch

        if _patch.patch_gather_supported(values, idx2):
            return _patch.patch_gather(values, idx2, False)
    out = gather_rows(values, idx2)
    return jnp.where((idx2 < cap)[..., None], out, 0.0)


def gather_rows_clustered_segbwd(values, idx2, edges):
    """:func:`gather_rows_clustered` with its adjoint computed through the
    build's edge sort instead of XLA's scatter-add.

    The AD backward of the head's (N, d+1)-row gather is the single largest
    HLO in the default train step (7.1 ms ``f32[524288,28] -> [65536,28]``
    scatter fusion, ``docs/runs/xplane_train_r5.log``).  The
    (point, corner) -> vertex pairs were already sorted by vertex when the
    lattice was built (:class:`EdgeSort`), so the adjoint instead permutes
    the cotangent rows with that order (row gathers are latency-bound,
    width ~free) and segment-sums the contiguous runs (Pallas one-hot MXU
    kernel) — priced ~4 ms by the v5e cost model.  Forward is bit-identical
    to ``gather_rows_clustered``'s fallback path.  Rows with invalid
    vertices carry zero cotangent (the forward masks them), and invalid
    edges sort past ``nr_verts`` where the segment sum drops them.

    MEASURED RESULT (the reason this is opt-in, ``LNT_HEAD_SEGVJP=1``):
    the chained full-train-step A/B on v5e reads 77.74 ms with this path
    vs 76.90 ms with the plain scatter adjoint
    (``docs/runs/bench_r5_segvjp_{on,off}.log``) — XLA overlaps its
    scatter fusion better than the permute+seg-sum pair, another case of
    isolated per-op pricing losing to the in-program A/B (CLAUDE.md).
    Gradients are bit-exact either way (tests/test_gradcheck).
    """
    # array context passed as primal args (closure-captured tracers break
    # custom_vjp under vmap); integer args get None cotangents like take_rows
    return _gather_segbwd(values, idx2, edges.perm, edges.vertex, edges.ends)


@jax.custom_vjp
def _gather_segbwd(values, idx2, perm, vertex, ends):
    cap = values.shape[0]
    out = gather_rows(values, idx2)
    return jnp.where((idx2 < cap)[..., None], out, 0.0)


def _gather_segbwd_fwd(values, idx2, perm, vertex, ends):
    proto = jnp.zeros((0,), values.dtype)
    return (
        _gather_segbwd(values, idx2, perm, vertex, ends),
        (idx2, perm, vertex, ends, values.shape[0], proto),
    )


def _gather_segbwd_bwd(res, g):
    idx2, perm, vertex, ends, cap, proto = res
    m = idx2.shape[0] * idx2.shape[1]
    g_sorted = jnp.take(g.reshape(m, g.shape[-1]).astype(jnp.float32), perm, axis=0)
    # rows whose vertex is invalid (vid == cap) sorted past every run end and
    # are dropped by the segment sum; their perm entries read edge 0 by
    # construction (EdgeSort docstring) but never land in any output row
    shim = _EdgeView(vertex=vertex, ends=ends)
    dvals = seg_sum_sorted(g_sorted, shim, cap).astype(proto.dtype)
    return dvals, None, None, None, None


class _EdgeView:
    """Duck-typed view with the two EdgeSort fields seg_sum_sorted reads."""

    def __init__(self, vertex, ends):
        self.vertex = vertex
        self.ends = ends


_gather_segbwd.defvjp(_gather_segbwd_fwd, _gather_segbwd_bwd)

__all__ = [
    "splat",
    "distribute",
    "distribute_sorted",
    "conv_im2row",
    "slice_lattice",
    "gather_lattice",
    "slice_classify",
    "blur",
    "bilateral_blur",
    "create_splatting_mask",
    "segment_sum",
    "segment_mean",
    "segment_max_with_src",
    "seg_sum_sorted",
    "take_sorted",
    "seg_mean_sorted",
    "seg_max_sorted",
    "seg_counts_sorted",
    "check_positions",
]


# ---------------------------------------------------------------------------
# sort-free segment reductions over pre-sorted edges (see structure.EdgeSort)
#
# The level-0 structure build already sorts every (point, simplex-vertex)
# edge by vertex id; these reductions exploit that order: contiguous runs +
# dense, ordered vertex ids turn scatter/argsort patterns into cumsum and
# boundary gathers.  Round-1 profile: the generic segment ops re-argsorted
# 524k edges per call at 18.7 ms each — these run in the low single digits.
# ---------------------------------------------------------------------------


def _run_ends(edges) -> jnp.ndarray:
    """(cap,) nondecreasing last-position of each vertex's run (cummax fills
    the -1 tail past nr_verts so empty padding rows reduce to zero)."""
    return jax.lax.cummax(edges.ends)


def seg_sum_sorted(vals_sorted: jnp.ndarray, edges, capacity: int) -> jnp.ndarray:
    """Sum rows of (M, C) values over each vertex's contiguous run.

    Narrow inputs use a cumsum + run-boundary gather (cheap scans); wide ones
    go through the Pallas one-hot-matmul kernel (ops_tpu.segment), which is
    ~2.2x faster than XLA scatter-add at lattice widths.
    """
    if vals_sorted.shape[1] > 8:
        from lattice_net_tpu.ops_tpu.segment import seg_sum_sorted_fast

        return seg_sum_sorted_fast(vals_sorted, edges.vertex, capacity).astype(
            vals_sorted.dtype
        )
    csum = jnp.cumsum(vals_sorted.astype(jnp.float32), axis=0)
    run_end = _run_ends(edges)
    tot = jnp.where(
        (run_end >= 0)[:, None],
        jnp.take(csum, jnp.maximum(run_end, 0), axis=0),
        0.0,
    )
    out = tot - jnp.concatenate([jnp.zeros_like(tot[:1]), tot[:-1]], axis=0)
    return out.astype(vals_sorted.dtype)


def seg_counts_sorted(edges, capacity: int) -> jnp.ndarray:
    """(cap,) number of edges per vertex (0 for padding rows)."""
    run_end = _run_ends(edges)
    prev = jnp.concatenate([jnp.full((1,), -1, run_end.dtype), run_end[:-1]])
    return (run_end - prev).astype(jnp.int32)


def seg_mean_sorted(vals_sorted: jnp.ndarray, edges, capacity: int) -> jnp.ndarray:
    total = seg_sum_sorted(vals_sorted, edges, capacity)
    counts = seg_counts_sorted(edges, capacity).astype(total.dtype)
    return total / jnp.maximum(counts, 1.0)[:, None]


def take_sorted(table: jnp.ndarray, ids_sorted: jnp.ndarray) -> jnp.ndarray:
    """(cap, C) x nondecreasing (M,) -> (M, C); invalid (>= cap) reads 0.

    The segment-broadcast direction with the sorted-indices hint (~30%
    faster than a plain clamped take on TPU)."""
    cap = table.shape[0]
    valid = ids_sorted < cap
    mono = jnp.minimum(ids_sorted, cap - 1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    out = jax.lax.gather(
        table,
        mono[:, None],
        dnums,
        (1, table.shape[1]),
        indices_are_sorted=True,
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return jnp.where(valid[:, None], out, 0.0)


def seg_max_sorted(vals_sorted: jnp.ndarray, carry_sorted: jnp.ndarray, edges, capacity: int):
    """Per-vertex, per-channel max of (M, C) values + the carry of the winner.

    Replaces ``segment_max_with_src`` + the barycentric-of-argmax gather of
    PointNet (reference ``lattice_modules.py:688-712``) in one pass over the
    sorted edges: scatter-max with sorted indices, winner-match, and a carry
    gather.  Ties resolve to the latest sorted edge (the reference's atomic
    race is equally arbitrary).

    Args:
      vals_sorted: (M, C) features in sorted-edge order.
      carry_sorted: (M,) scalar per edge (e.g. barycentric weight).
    Returns:
      maxed: (cap, C), 0 for empty rows.
      carry_at_max: (cap, C) carry of each (vertex, channel) winner, 0 if none.
    """
    m, c = vals_sorted.shape
    ids = edges.vertex
    from lattice_net_tpu.ops_tpu import segment as _seg

    if _seg.seg_max_pallas_available(c):
        # Pallas streaming scan kernel + run-end gather (bit-exact); the XLA
        # formulation below stays as the CPU/test reference path.
        return _seg.seg_max_carry_sorted_fast(
            vals_sorted, carry_sorted, ids, edges.ends, capacity
        )
    neg = jnp.finfo(vals_sorted.dtype).min
    maxed = (
        jnp.full((capacity, c), neg, vals_sorted.dtype)
        .at[ids]
        .max(vals_sorted, mode="drop", indices_are_sorted=True)
    )
    hit = maxed > neg

    gathered = take_sorted(maxed, ids)
    is_win = (vals_sorted == gathered) & (ids < capacity)[:, None]
    row_pos = jnp.arange(m, dtype=jnp.int32)[:, None]
    argpos = (
        jnp.full((capacity, c), -1, jnp.int32)
        .at[ids]
        .max(jnp.where(is_win, row_pos, -1), mode="drop", indices_are_sorted=True)
    )
    carry = jnp.take(carry_sorted, jnp.maximum(argpos, 0).reshape(-1), axis=0).reshape(
        capacity, c
    )
    carry = jnp.where(argpos >= 0, carry, 0.0)
    return jnp.where(hit, maxed, 0.0), carry


# ---------------------------------------------------------------------------
# segment helpers (torch_scatter equivalents, fixed-size output)
# ---------------------------------------------------------------------------


def segment_sum(values: jnp.ndarray, idx: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Scatter-add rows of ``values`` (M, C) into (num_segments, C); idx >= num_segments drops.

    Plain XLA scatter-add: chained-dispatch timing on v5e shows it 2.4x
    faster than the round-1 sort+scan path at lattice shapes (10.0 vs
    24.2 ms for 524k x 32 -> 65k).  When the indices are presorted use
    :func:`seg_sum_sorted`, which is another ~6x faster.
    """
    out = jnp.zeros((num_segments,) + values.shape[1:], dtype=values.dtype)
    return out.at[idx].add(values, mode="drop")


def segment_mean(values: jnp.ndarray, idx: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    total = segment_sum(values, idx, num_segments)
    ones = jnp.ones(values.shape[:1], dtype=values.dtype)
    count = segment_sum(ones[:, None], idx, num_segments)
    return total / jnp.maximum(count, 1.0)


def segment_max_with_src(values: jnp.ndarray, idx: jnp.ndarray, num_segments: int):
    """Per-segment max of (M, C) values plus a per-(segment, channel) source row id.

    The reference uses ``torch_scatter.scatter_max`` and its argmax output to
    fetch the barycentric weight of the winning point per channel
    (``lattice_modules.py:688-712``).  We reproduce it with a scatter-max
    followed by a winner-matching scatter (ties resolved by max source id,
    which is as arbitrary as the reference's atomic race).

    Returns:
      maxed: (num_segments, C); segments with no entries are 0.
      argsrc: (num_segments, C) int32 row index into values; no-entry -> M.
    """
    m = values.shape[0]
    neg_inf = jnp.finfo(values.dtype).min
    init = jnp.full((num_segments,) + values.shape[1:], neg_inf, dtype=values.dtype)
    maxed = init.at[idx].max(values, mode="drop")
    hit = maxed > neg_inf

    row_ids = jnp.arange(m, dtype=jnp.int32)[:, None]
    gathered = jnp.take(maxed, jnp.minimum(idx, num_segments - 1), axis=0)
    is_winner = (values == gathered) & (idx < num_segments)[:, None]
    arg_init = jnp.full((num_segments,) + values.shape[1:], -1, dtype=jnp.int32)
    argsrc = arg_init.at[idx].max(jnp.where(is_winner, row_ids, -1), mode="drop")
    argsrc = jnp.where(argsrc >= 0, argsrc, m).astype(jnp.int32)

    return jnp.where(hit, maxed, 0.0), argsrc


# ---------------------------------------------------------------------------
# core lattice ops
# ---------------------------------------------------------------------------


def splat(
    values: jnp.ndarray,
    splat_idx: jnp.ndarray,
    splat_weights: jnp.ndarray,
    capacity: int,
) -> jnp.ndarray:
    """Barycentric scatter of point values onto lattice vertices.

    Replaces ``splatCacheNaive`` (``LatticeGPU.cuh:926-973``, atomicAdd per
    edge) with one deterministic segment-sum.

    Args:
      values: (N, C) per-point features.
      splat_idx: (N, d+1) int32 vertex ids (invalid = capacity).
      splat_weights: (N, d+1) barycentric weights.
    Returns:
      (capacity, C) vertex values.
    """
    n, d1 = splat_idx.shape
    weighted = values[:, None, :] * splat_weights[..., None]  # (N, d+1, C)
    return segment_sum(
        weighted.reshape(n * d1, -1), splat_idx.reshape(n * d1), capacity
    )


def distribute(
    positions: jnp.ndarray,
    values: jnp.ndarray,
    splat_idx: jnp.ndarray,
    splat_weights: jnp.ndarray,
    capacity: int,
    point_mask: jnp.ndarray | None = None,
    subtract_local_mean: bool = True,
):
    """Per-(point, vertex) feature rows: [xyz - vertex-mean xyz, values, weight].

    Fuses the reference ``distribute`` kernel (``LatticeGPU.cuh:537-650``)
    with the python-side local-mean subtraction of ``DistributeLatticeModule``
    (``lattice_modules.py:63-96``, scatter_mean over xyz).  Invalid edges get
    all-zero rows (the reference masks them too; it additionally sacrifices
    vertex row 0 as a trash row — we keep all vertices and mask by index
    validity instead).

    Returns:
      rows: (N*(d+1), d + C + 1) distributed tensor.
      edge_idx: (N*(d+1),) int32 vertex id per row (invalid = capacity).
    """
    n, d = positions.shape
    d1 = splat_idx.shape[1]
    edge_idx = splat_idx.reshape(n * d1)
    if point_mask is not None:
        edge_idx = jnp.where(jnp.repeat(point_mask, d1), edge_idx, capacity)

    pos_rows = jnp.repeat(positions, d1, axis=0)  # (N*(d+1), d)
    if subtract_local_mean:
        mean_pos = segment_mean(pos_rows, edge_idx, capacity)
        mean_rows = gather_rows(mean_pos, edge_idx)
        pos_rows = pos_rows - mean_rows

    val_rows = jnp.repeat(values, d1, axis=0)
    w_rows = splat_weights.reshape(n * d1, 1)
    rows = jnp.concatenate([pos_rows, val_rows, w_rows], axis=-1)
    valid = (edge_idx < capacity)[:, None]
    return jnp.where(valid, rows, 0.0), edge_idx


def distribute_sorted(
    positions: jnp.ndarray,
    values: jnp.ndarray,
    edges,
    capacity: int,
    subtract_local_mean: bool = True,
    splat_weights: jnp.ndarray | None = None,
):
    """``distribute`` emitting rows in sorted-by-vertex edge order.

    Same row contents as :func:`distribute` ([xyz - vertex-mean xyz, values,
    weight]) but ordered by ``edges.perm`` so every downstream segment
    reduction is a sort-free run reduction.  Invalid edges (padding points /
    overflow) carry vertex id ``capacity`` and zero rows — they sort last and
    drop out of every reduction.

    Returns:
      rows_sorted: (M, d + C + 1).
      ids: (M,) vertex id per sorted row (= edges.vertex).
    """
    n, d = positions.shape
    m = edges.perm.shape[0]
    d1 = m // n
    ids = edges.vertex

    rows_carried = getattr(edges, "rows", None)
    if rows_carried is not None:
        # the build sorted [positions, values, bary] alongside the keys
        # (structure.EdgeSort.rows) — zero gathers here.  CONTRACT: the
        # hierarchy must have been built with point_feats = the same
        # [positions, values] passed to this call.
        c = values.shape[1]
        if rows_carried.shape[1] != d + c + 1:
            raise ValueError(
                f"carried rows have {rows_carried.shape[1]} columns, expected "
                f"d + C + 1 = {d + c + 1}: the hierarchy was built with "
                "different point_feats than the values passed to distribute"
            )
        pos_rows = rows_carried[:, :d]
        val_rows = rows_carried[:, d : d + c]
        w_rows = rows_carried[:, d + c]
        if subtract_local_mean:
            mean_pos = seg_mean_sorted(pos_rows, edges, capacity)
            pos_rows = pos_rows - take_sorted(mean_pos, ids)
        rows = jnp.concatenate([pos_rows, val_rows, w_rows[:, None]], axis=-1)
        return jnp.where((ids < capacity)[:, None], rows, 0.0), ids

    point_of = edges.perm // d1

    if edges.weights is not None:
        feats = jnp.concatenate([positions, values], axis=-1)
        rows_f = jnp.take(feats, point_of, axis=0)  # one (M, d+C) row gather
        pos_rows, val_rows = rows_f[:, :d], rows_f[:, d:]
        w_rows = edges.weights
    else:
        # the build carries no per-edge weights (saves a full-stream gather
        # there): fold the barycentric columns into THIS row gather and
        # select each edge's remainder column — row gathers are
        # latency-bound, extra width is nearly free
        assert splat_weights is not None, "need splat_weights when edges carry none"
        feats = jnp.concatenate([positions, values, splat_weights], axis=-1)
        rows_f = jnp.take(feats, point_of, axis=0)  # (M, d+C+d1)
        pos_rows = rows_f[:, :d]
        val_rows = rows_f[:, d : d + values.shape[1]]
        wcols = rows_f[:, d + values.shape[1] :]  # (M, d1)
        r = (edges.perm % d1)[:, None]
        w_rows = jnp.sum(
            jnp.where(r == jnp.arange(d1, dtype=jnp.int32)[None, :], wcols, 0.0), axis=1
        )

    if subtract_local_mean:
        mean_pos = seg_mean_sorted(pos_rows, edges, capacity)
        pos_rows = pos_rows - take_sorted(mean_pos, ids)

    rows = jnp.concatenate([pos_rows, val_rows, w_rows[:, None]], axis=-1)
    return jnp.where((ids < capacity)[:, None], rows, 0.0), ids


def _take_monotone_columns(values: jnp.ndarray, idx_cols: jnp.ndarray) -> jnp.ndarray:
    """Per-column sorted-flag gathers: (cap, C) x (Q, K) -> (Q, K, C).

    Every neighbour-table column is monotone over the sorted vertex order
    (sorted keys + a fixed move preserve order); telling XLA so is worth
    ~30% on TPU (3.1 vs 4.4 ms for 524k rows, chained).  Invalid entries
    (== cap) break monotonicity, so each column is first made nondecreasing
    with a cummax (invalid -> last valid row); the caller's validity mask is
    returned alongside.
    """
    cap = values.shape[0]
    q, k = idx_cols.shape
    valid = idx_cols < cap
    mono = jnp.maximum(jax.lax.cummax(jnp.where(valid, idx_cols, -1), axis=0), 0)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    outs = [
        jax.lax.gather(
            values,
            mono[:, i : i + 1],
            dnums,
            (1, values.shape[1]),
            indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        for i in range(k)
    ]
    return jnp.stack(outs, axis=1), valid


def gather_neighbor_values_xla(
    values: jnp.ndarray,
    neighbors: jnp.ndarray,
    include_center_self: bool,
) -> jnp.ndarray:
    """XLA path of :func:`gather_neighbor_values` (monotone per-column
    gathers); also the correctness fallback of the Pallas window kernel."""
    patch, valid = _take_monotone_columns(values, neighbors)  # (Cq, K, C)
    patch = jnp.where(valid[..., None], patch, 0.0)
    if include_center_self:
        center = values[: neighbors.shape[0]][:, None, :]
        patch = jnp.concatenate([patch, center], axis=1)
    return patch


def gather_neighbor_values(
    values: jnp.ndarray,
    neighbors: jnp.ndarray,
    include_center_self: bool,
) -> jnp.ndarray:
    """(capacity_query, extent, C) patch tensor for 1-hop convolution.

    ``values`` lives on the *neighbour* structure's table; ``neighbors`` is a
    (capacity_query, K) index table (K = 2(d+1) for same-level, where the
    centre is the row itself; K = 2(d+1)+1 for cross-level tables that carry
    their own centre).  Missing neighbours contribute zeros, matching the
    zero-initialised im2row rows of the reference.

    This is the hot im2row data movement (``LatticeGPU.cuh:1464-1688``).  On
    TPU with bf16 values it runs the Pallas monotone-window kernel
    (ops_tpu.patch) — one exact one-hot MXU matmul per (subtile, column)
    instead of a row-latency-bound gather; elsewhere, per-column XLA gathers
    with the sorted-indices hint.
    """
    if _fast_ops():
        from lattice_net_tpu.ops_tpu import patch as _patch

        if _patch.patch_gather_supported(values, neighbors):
            return _patch.patch_gather(values, neighbors, include_center_self)
    return gather_neighbor_values_xla(values, neighbors, include_center_self)


def _conv_patch_budget_bytes() -> int:
    """Max bytes the materialised (Cq, extent, C) conv patch may occupy before
    the row-chunked path engages (LNT_CONV_CHUNK_BYTES, default 1 GiB)."""
    return int(os.environ.get("LNT_CONV_CHUNK_BYTES", 1 << 30))


def _conv_row_blocks(cq: int, extent: int, c_in: int, itemsize: int) -> int:
    """Number of equal row blocks keeping each block's patch under budget.

    Returns 1 (unchunked) for every ordinary capacity; ScanNet-scale tables
    (reference ``config/lnn_train_scannet.cfg:50``: 5M entries) with wide
    channels would otherwise materialise a 5.2M x 9 x 128 patch (~12 GB bf16)
    and exhaust HBM.  ``cq`` need not divide evenly: the chunked path pads
    the rows to ``nb`` equal blocks (an earlier version searched for a
    divisor of ``cq``, which degenerated to one-row blocks for capacities
    with a large prime factor).
    """
    budget = _conv_patch_budget_bytes()
    rows_max = max(1, budget // (extent * c_in * itemsize))
    if cq <= rows_max:
        return 1
    return -(-cq // rows_max)


def _conv_gather_dnums():
    return jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )


def _conv_fwd_chunked(values, neighbors, weight, same_level, nb, acc):
    """Row-chunked conv: lax.map over ``nb`` equal row blocks, each gathering
    a bounded (B, extent, C) patch and running its own MXU GEMM.  The cummax
    monotonisation of the index columns is global (2-D int32, cheap); the
    per-column sorted-flag gathers happen per block, so peak memory is the
    values table + one block patch instead of the full patch tensor."""
    cap = values.shape[0]
    cq, k = neighbors.shape
    c_in = values.shape[1]
    extent = k + 1 if same_level else k
    b = -(-cq // nb)
    cq_pad = b * nb
    if cq_pad != cq:
        # pad with invalid rows (index == cap -> masked to zero); the padded
        # output rows are sliced off below
        neighbors = jnp.pad(neighbors, ((0, cq_pad - cq), (0, 0)), constant_values=cap)
    valid = neighbors < cap
    mono = jnp.maximum(jax.lax.cummax(jnp.where(valid, neighbors, -1), axis=0), 0)
    dnums = _conv_gather_dnums()

    def block(args):
        if same_level:
            mo, va, ce = args
        else:
            mo, va = args
        cols = [
            jax.lax.gather(
                values,
                mo[:, i : i + 1],
                dnums,
                (1, c_in),
                indices_are_sorted=True,
                mode=jax.lax.GatherScatterMode.CLIP,
            )
            for i in range(k)
        ]
        patch = jnp.where(va[..., None], jnp.stack(cols, axis=1), 0)
        if same_level:
            patch = jnp.concatenate([patch, ce[:, None, :]], axis=1)
        return jnp.dot(
            patch.reshape(b, extent * c_in), weight, preferred_element_type=acc
        )

    xs = (mono.reshape(nb, b, k), valid.reshape(nb, b, k))
    if same_level:
        centers = values[:cq]
        if cq_pad != cq:
            centers = jnp.pad(centers, ((0, cq_pad - cq), (0, 0)))
        xs = xs + (centers.reshape(nb, b, c_in),)
    out = jax.lax.map(block, xs)
    return out.reshape(cq_pad, weight.shape[1])[:cq]


def _conv_fwd_impl(
    values: jnp.ndarray,
    neighbors: jnp.ndarray,
    weight: jnp.ndarray,
    same_level: bool,
) -> jnp.ndarray:
    """Shared conv body: (bf16 cast on TPU) patch gather + one MXU GEMM."""
    conv_dt = os.environ.get("LNT_CONV_DTYPE", "")
    if conv_dt == "bf16" or (conv_dt != "f32" and _fast_ops()):
        values = values.astype(jnp.bfloat16)
        weight = weight.astype(jnp.bfloat16)
    cq, k = neighbors.shape
    extent = k + 1 if same_level else k
    c_in = values.shape[1]
    assert weight.shape[0] == extent * c_in, (
        f"filter bank rows {weight.shape[0]} != extent*C_in {extent * c_in}"
    )
    # accumulate in at least f32 (bf16 inputs accumulate f32; f64 stays f64)
    acc = jnp.result_type(values.dtype, weight.dtype, jnp.float32)
    nb = _conv_row_blocks(cq, extent, c_in, values.dtype.itemsize)
    if nb > 1:
        return _conv_fwd_chunked(values, neighbors, weight, same_level, nb, acc)
    patch = gather_neighbor_values(values, neighbors, include_center_self=same_level)
    return jnp.dot(patch.reshape(cq, extent * c_in), weight, preferred_element_type=acc)


@functools.lru_cache(maxsize=None)
def _swap_pm_perm(k: int):
    """Slot permutation exchanging each +/- move pair; a trailing odd slot
    (the centre of cross-level tables / the appended centre of same-level
    patches) stays in place."""
    import numpy as np

    sw = np.arange(k)
    pairs = k - (k % 2)
    sw[0:pairs:2] = np.arange(1, pairs, 2)
    sw[1:pairs:2] = np.arange(0, pairs, 2)
    return tuple(int(x) for x in sw)


def _flip_filter_bank(weight: jnp.ndarray, extent: int, c_in: int, c_out: int) -> jnp.ndarray:
    """(extent*C_in, C_out) filter bank -> the adjoint bank (extent*C_out, C_in).

    The reference's flip-neighbours transposed-conv trick
    (``lattice_funcs.py:280-320``): the adjoint convolution gathers with the
    +/- swapped table and multiplies with the per-slot TRANSPOSED weight
    blocks of the opposite-sign slot; the centre block (last) self-pairs.
    """
    import numpy as np

    w = weight.reshape(extent, c_in, c_out)
    sw = np.asarray(_swap_pm_perm(extent))
    return w[sw].transpose(0, 2, 1).reshape(extent * c_out, c_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _conv_flip(values, weight, neighbors, neighbors_t, same_level):
    return _conv_fwd_impl(values, neighbors, weight, same_level)


def _conv_flip_fwd(values, weight, neighbors, neighbors_t, same_level):
    out = _conv_fwd_impl(values, neighbors, weight, same_level)
    return out, (values, weight, neighbors, neighbors_t)


def _conv_flip_bwd(same_level, res, g):
    values, weight, neighbors, neighbors_t = res
    k = neighbors.shape[1]
    extent = k + 1 if same_level else k
    c_in = values.shape[1]
    c_out = weight.shape[1]

    # d_weight = patchᵀ @ g — the patch gather is recomputed, exactly like
    # the reference backward re-runs im2row (``lattice_funcs.py:294-298``)
    conv_dt = os.environ.get("LNT_CONV_DTYPE", "")
    bf16 = conv_dt == "bf16" or (conv_dt != "f32" and _fast_ops())
    v = values.astype(jnp.bfloat16) if bf16 else values
    gq = g.astype(v.dtype)
    acc = jnp.result_type(v.dtype, jnp.float32)
    cq = neighbors.shape[0]
    nb = _conv_row_blocks(cq, extent, c_in, v.dtype.itemsize)
    if nb > 1:
        # chunked patch recompute: per-block patch_bᵀ @ g_b, summed — peak
        # memory one block patch instead of the full (Cq, extent, C) tensor.
        # Rows pad to nb equal blocks exactly like _conv_fwd_chunked (padded
        # g rows are zero, so they add nothing to d_w).
        cap = v.shape[0]
        b = -(-cq // nb)
        cq_pad = b * nb
        nbrs = neighbors
        if cq_pad != cq:
            nbrs = jnp.pad(neighbors, ((0, cq_pad - cq), (0, 0)), constant_values=cap)
            gq = jnp.pad(gq, ((0, cq_pad - cq), (0, 0)))
        val_cols = nbrs < cap
        mono = jnp.maximum(jax.lax.cummax(jnp.where(val_cols, nbrs, -1), axis=0), 0)
        dnums = _conv_gather_dnums()

        def block(args):
            if same_level:
                mo, va, ce, gb = args
            else:
                mo, va, gb = args
            cols = [
                jax.lax.gather(
                    v, mo[:, i : i + 1], dnums, (1, c_in),
                    indices_are_sorted=True, mode=jax.lax.GatherScatterMode.CLIP,
                )
                for i in range(k)
            ]
            pb = jnp.where(va[..., None], jnp.stack(cols, axis=1), 0)
            if same_level:
                pb = jnp.concatenate([pb, ce[:, None, :]], axis=1)
            return jnp.dot(
                pb.reshape(b, extent * c_in).T, gb, preferred_element_type=acc
            )

        xs = (mono.reshape(nb, b, -1), val_cols.reshape(nb, b, -1))
        if same_level:
            centers = v[:cq]
            if cq_pad != cq:
                centers = jnp.pad(centers, ((0, cq_pad - cq), (0, 0)))
            xs = xs + (centers.reshape(nb, b, c_in),)
        xs = xs + (gq.reshape(nb, b, c_out),)
        d_w = jnp.sum(jax.lax.map(block, xs), axis=0).astype(weight.dtype)
    else:
        patch = gather_neighbor_values(v, neighbors, include_center_self=same_level)
        d_w = jnp.dot(
            patch.reshape(patch.shape[0], extent * c_in).T, gq, preferred_element_type=acc
        ).astype(weight.dtype)

    # d_values: the adjoint is ANOTHER 1-hop conv — gather g over the paired
    # (transposed) table with the flipped filter bank — instead of XLA's
    # scatter-add (measured ~4x slower at lattice shapes)
    wf = _flip_filter_bank(weight, extent, c_in, c_out)
    d_vals = _conv_fwd_impl(g.astype(values.dtype), neighbors_t, wf, same_level)
    return d_vals.astype(values.dtype), d_w, None, None


_conv_flip.defvjp(_conv_flip_fwd, _conv_flip_bwd)


def _flip_vjp() -> bool:
    env = os.environ.get("LNT_FLIP_VJP")
    if env is not None:
        return env != "0"
    return True


def conv_im2row(
    values: jnp.ndarray,
    neighbors: jnp.ndarray,
    weight: jnp.ndarray,
    same_level: bool,
    neighbors_t: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """1-hop lattice convolution: gather patch rows, one GEMM on the MXU.

    Equivalent of ``Lattice::convolve_im2row_standalone``
    (``src/Lattice.cu:424-474``): im2row + ``rowified.mm(filter_bank)``.
    ``weight`` has shape (extent * C_in, C_out) with the row layout
    [axis0+, axis0-, axis1+, axis1-, ..., centre] — identical to the
    reference's filter bank, so weights are interchangeable.

    For same-level convs (``same_level=True``) the centre value is the row
    itself; cross-level tables (coarsen/finefy) carry the centre index as
    their last column.

    Backward: the adjoint w.r.t. ``values`` is computed as another 1-hop conv
    over the +/- swapped table (``neighbors_t``) with the flipped-transposed
    filter bank — the reference's flip-neighbours trick
    (``lattice_funcs.py:306-313``) — instead of XLA's scatter-add adjoint.
    Same-level tables are their own transpose under the +/- swap; cross-level
    convs must pass the PAIRED table (coarsen <-> finefy, exact transposes by
    construction, see structure.finefy_from_coarsen_transpose).  Without
    ``neighbors_t`` (cross-level callers that don't have the pair at hand)
    the plain AD adjoint applies.  LNT_FLIP_VJP=0 disables the trick.

    On TPU the conv runs in bf16 by default (f32 accumulation): bf16 parity
    was verified at mIoU level (docs/runs), the patch gather halves its bytes
    AND becomes eligible for the Pallas one-hot-MXU window kernel
    (ops_tpu.patch), and the GEMM takes the fast MXU path.  Set
    LNT_CONV_DTYPE=f32 to opt out (CPU/tests default to f32 already).
    """
    if _flip_vjp():
        if same_level and neighbors_t is None:
            # same-level reciprocity nbr[v, a+] = u  <=>  nbr[u, a-] = v means
            # the table is its own transpose once the WEIGHTS are flipped —
            # the adjoint gathers over the very same table
            neighbors_t = neighbors
        if neighbors_t is not None:
            return _conv_flip(values, weight, neighbors, neighbors_t, same_level)
    return _conv_fwd_impl(values, neighbors, weight, same_level)


def expand(
    positions: jnp.ndarray,
    sigma,
    capacity: int,
    point_multiplier: int,
    noise_stddev: float,
    rng,
    values: jnp.ndarray | None = None,
    point_mask: jnp.ndarray | None = None,
):
    """Create extra lattice vertices around noise-jittered position copies.

    Port of ``Lattice::expand`` (``src/Lattice.cu:292-348``): replicate the
    positions ``point_multiplier`` times, add gaussian noise, and build a
    structure over the union.  Vertex values for the new vertices are zero
    (the reference zero-pads); existing-vertex values can be re-splatted by
    the caller.  Returns (structure, splat_idx, splat_weights) over the
    expanded point set — deterministic given ``rng``.
    """
    from lattice_net_tpu.lattice import structure as st

    n, d = positions.shape
    reps = jnp.tile(positions, (point_multiplier, 1))
    noise = noise_stddev * jax.random.normal(rng, reps.shape, reps.dtype)
    expanded = jnp.concatenate([positions, reps + noise], axis=0)
    mask = None
    if point_mask is not None:
        mask = jnp.concatenate([point_mask, jnp.tile(point_mask, point_multiplier)])
    s, vid, w = st.build_structure(expanded, sigma, capacity, point_mask=mask)
    if values is not None:
        pad = jnp.zeros((capacity, values.shape[1]), values.dtype)
        vals = splat(
            jnp.concatenate([values, jnp.zeros((n * point_multiplier, values.shape[1]))]),
            vid,
            w,
            capacity,
        )
        return s, vid, w, vals + pad
    return s, vid, w


def depthwise_conv(
    values: jnp.ndarray,
    neighbors: jnp.ndarray,
    weight: jnp.ndarray,
    same_level: bool = True,
) -> jnp.ndarray:
    """Depthwise 1-hop lattice conv (legacy reference kernel
    ``LatticeGPU.cuh:1174-1462``): out[v, c] = sum_k patch[v, k, c] * W[k, c]."""
    patch = gather_neighbor_values(values, neighbors, include_center_self=same_level)
    return jnp.einsum("vkc,kc->vc", patch, weight)


def slice_lattice(
    values: jnp.ndarray,
    splat_idx: jnp.ndarray,
    splat_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Barycentric interpolation of vertex values back to points.

    ``slice_with_precomputation`` (``LatticeGPU.cuh:2552-2595``): out_p =
    sum_r w_pr * values[idx_pr], with missing vertices contributing zero.
    """
    capacity = values.shape[0]
    v = gather_rows_clustered(_maybe_bf16(values), splat_idx)  # (N, d+1, C)
    w = jnp.where(splat_idx < capacity, splat_weights, 0.0)
    return jnp.sum(v * w[..., None], axis=1)


def gather_lattice(
    values: jnp.ndarray,
    splat_idx: jnp.ndarray,
    splat_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Per-point concatenation of each simplex vertex's (value*w, w).

    ``gather_with_precomputation`` (``LatticeGPU.cuh:2875-2929``): row layout
    per point is (d+1) blocks of [C values * weight, weight].

    Returns: (N, (d+1) * (C+1)).
    """
    capacity, c = values.shape
    n, d1 = splat_idx.shape
    v = gather_rows_clustered(_maybe_bf16(values), splat_idx)  # (N, d+1, C)
    w = jnp.where(splat_idx < capacity, splat_weights, 0.0)  # (N, d+1)
    blocks = jnp.concatenate([v * w[..., None], w[..., None]], axis=-1)
    return blocks.reshape(n, d1 * (c + 1))


def blur(
    values: jnp.ndarray,
    neighbors_same: jnp.ndarray,
    axis: int,
) -> jnp.ndarray:
    """One permutohedral blur pass along lattice axis ``axis``.

    ``blur`` (``LatticeGPU.cuh:975-1037``, legacy bilateral-filter path —
    unused by the segmentation model but part of the kernel inventory):
    out_v = 0.25 * values[n+] + 0.5 * values[v] + 0.25 * values[n-], where
    n+/n- are the 1-hop neighbours along ``axis`` (the reference's
    ``remainder``) and missing neighbours contribute zero.  The repo's
    same-level neighbour table already stores exactly those ids (slot 2a is
    the '+' move on axis a, slot 2a+1 the '-'), so this is two masked
    monotone-column gathers — no hash retrieval at call time.

    Padding rows (>= nr_verts) keep the usual garbage-tolerated discipline:
    their neighbour slots are invalid so they only see 0.5x their own value.

    Args:
      values: (capacity, C) vertex values.
      neighbors_same: (capacity, 2(d+1)) same-level table
        (:func:`structure.build_neighbors_same_level`).
      axis: lattice axis in [0, d] (d = pos_dim is the implicit coordinate).
    Returns: (capacity, C) blurred values.
    """
    k = neighbors_same.shape[1]
    if not 0 <= 2 * axis < k:
        raise ValueError(f"axis {axis} out of range for extent {k}")
    cols = neighbors_same[:, 2 * axis : 2 * axis + 2]  # (cap, 2) [+, -]
    patch, valid = _take_monotone_columns(values, cols)
    patch = jnp.where(valid[..., None], patch, 0.0)
    return 0.25 * (patch[:, 0] + patch[:, 1]) + 0.5 * values[: cols.shape[0]]


def bilateral_blur(values: jnp.ndarray, neighbors_same: jnp.ndarray) -> jnp.ndarray:
    """Full separable permutohedral blur: one :func:`blur` pass per axis,
    matching the reference host loop over ``remainder`` in [0, d]."""
    d1 = neighbors_same.shape[1] // 2
    for a in range(d1):
        values = blur(values, neighbors_same, a)
    return values


def create_splatting_mask(
    rng: jax.Array,
    splat_idx: jnp.ndarray,
    max_nr_points: int,
    capacity: int,
    counts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Stochastic cap on splat contributions per lattice vertex.

    ``create_splatting_mask`` (``LatticeGPU.cuh:653-704``, unused by the
    model): an edge splatting onto a vertex holding more than
    ``max_nr_points`` points survives with probability ~max/count so each
    vertex keeps on the order of ``max_nr_points`` contributions.  The
    reference seeds a per-thread LCG and truncates ``count/max`` to an int
    before inverting; here the keep probability is the exact
    ``max_nr_points / count`` with a counted JAX PRNG — same expected
    survivor count, deterministic under a fixed key.

    Args:
      rng: PRNG key.
      splat_idx: (N, d+1) int32 vertex ids (invalid = capacity).
      max_nr_points: cap per vertex.
      capacity: table capacity (for the internal count when ``counts`` is
        not provided).
      counts: optional (capacity,) precomputed points-per-vertex.
    Returns: bool (N, d+1); invalid edges are False.
    """
    n, d1 = splat_idx.shape
    flat = splat_idx.reshape(-1)
    valid = flat < capacity
    if counts is None:
        ones = jnp.ones((n * d1, 1), jnp.float32)
        counts = segment_sum(ones, flat, capacity)[:, 0]
    per_edge = jnp.take(counts, jnp.minimum(flat, capacity - 1), axis=0)
    keep_p = jnp.minimum(1.0, max_nr_points / jnp.maximum(per_edge, 1.0))
    u = jax.random.uniform(rng, (n * d1,))
    return ((u < keep_p) & valid).reshape(n, d1)


def slice_classify(
    values: jnp.ndarray,
    splat_idx: jnp.ndarray,
    splat_weights: jnp.ndarray,
    delta_weights: jnp.ndarray,
    class_weight: jnp.ndarray,
    class_bias: jnp.ndarray,
) -> jnp.ndarray:
    """Fused deformable slice + linear classifier.

    ``slice_classify_with_precomputation`` (``LatticeGPU.cuh:3387-3464``):
    logits_p = W @ (sum_r values[idx_pr] * (w_pr + dw_pr)) + b.  The reference
    adds delta weights even for missing vertices only when idx >= 0; masked
    identically here.  XLA fuses the gather, the weighted reduce and the
    (N, C) x (C, nr_classes) GEMM; AD provides the four-way backward the
    reference hand-writes (``LatticeGPU.cuh:3628-3756``).

    Args:
      values: (capacity, C) vertex features.
      delta_weights: (N, d+1) learned barycentric offsets.
      class_weight: (nr_classes, C) — torch Linear layout.
      class_bias: (nr_classes,).
    Returns: (N, nr_classes) logits.
    """
    capacity = values.shape[0]
    v = gather_rows_clustered(_maybe_bf16(values), splat_idx)  # (N, d+1, C)
    valid = splat_idx < capacity
    w = jnp.where(valid, splat_weights + delta_weights, 0.0)
    sliced = jnp.sum(v * w[..., None], axis=1)  # (N, C)
    acc = jnp.result_type(sliced.dtype, class_weight.dtype, jnp.float32)
    return jnp.dot(sliced, class_weight.T, preferred_element_type=acc) + class_bias
