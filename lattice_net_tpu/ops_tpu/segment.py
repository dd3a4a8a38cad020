"""Pallas TPU kernels for segmented reductions over PRE-SORTED dense runs.

The lattice build sorts every (point, simplex-vertex) edge by vertex id
(structure.EdgeSort): ids are nondecreasing and dense (every vertex id in
[0, nr_verts) occurs at least once).  That structure turns the two hot
point<->vertex data movements into MXU work instead of XLA scatter/gather:

  * ``seg_sum_sorted_fast``       — out[v] = sum of rows in v's run.
  * ``seg_broadcast_sorted_fast`` — out[i] = table[ids[i]] (monotone gather).

Key trick: within a subtile of T consecutive edges the ids span AT MOST T
distinct values starting at ``ws = ids[0]`` (density ⇒ no gaps), so a (T, T)
one-hot matrix turns both directions into ONE MXU matmul per subtile:

    sum:        acc[:, ws : ws+T] += vals_subtileᵀ ⊗ onehot
    broadcast:  out_subtile        = onehot ⊗ window

Layout rules learned the hard way (Mosaic rejects lane slices not aligned to
128): edge streams are reshaped to (n_subtiles, T, C) so subtile reads index
the LEADING dim; the sum accumulator is kept channel-major (C, rows) so the
dynamic row-window slice spans T=256 lanes (128-aligned).  Grid steps process
K subtiles each (single-subtile steps drown in pipeline overhead — measured
169 ms at 16k grid steps).  The accumulator IS the output block: kept in
VMEM while the range-block index repeats (TPU grids are sequential), flushed
automatically when it moves on; each range-block carries T overflow columns
so windows never write out of bounds (masked edges add zeros there).  When
the accumulator exceeds the VMEM budget, rows split into R range-blocks and
the edge stream is swept R times.  Invalid edges (id == capacity, sorted
last) are masked explicitly.

NOTE: ids must be dense runs — a gap of unused ids inside [0, nr) would
silently drop rows; lattice edge ids satisfy this by construction (every
vertex is created by at least one edge).

Matmuls run at Precision.HIGHEST (Mosaic rejects HIGH): the default single
bf16 pass loses the value mantissas (measured 4e-2 abs error); the multi-pass
split reproduces the f32 sum to f32 accuracy.

Measured (chained dispatch, v5e, 524k x 32 -> 65k): XLA scatter-add 10.0 ms,
round-1 argsort path 24.2 ms.  Adjoints are each other, wired via custom_vjp.

Reference counterparts: splatCacheNaive's atomicAdd accumulation
(``LatticeGPU.cuh:926-973``) and the slice/gather kernels' per-point reads
(``:2552-2929``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # subtile: one one-hot matmul window
K = 16  # subtiles per grid step
STEP = TILE * K
VMEM_BUDGET = 12 * 1024 * 1024  # bytes for the accumulator block


def _use_pallas() -> bool:
    import os

    env = os.environ.get("LNT_PALLAS_SEGMENT")
    if env is not None:
        return env != "0"
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _row_blocks(cap: int, c: int) -> int:
    """Smallest power-of-two R with the (C, cap/R + 2T) f32 accumulator in budget."""
    r = 1
    while r <= 64:
        if cap % r == 0 and (cap // r + 2 * TILE) * max(c, 8) * 4 <= VMEM_BUDGET:
            return r
        r *= 2
    return 0


# ---------------------------------------------------------------------------
# segmented sum: grid (R row-blocks [outer], edge steps [inner])
# ---------------------------------------------------------------------------


def _seg_sum_kernel(ids_ref, vals_ref, out_ref):
    r = pl.program_id(0)
    t = pl.program_id(1)
    cap_r = out_ref.shape[2] - 2 * TILE  # rows of this range-block (minus pad)
    base = r * cap_r
    cap = cap_r * pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for k in range(K):
        ids = ids_ref[k, :, 0]  # (T,)
        # skip subtiles that don't touch this range-block (matters when R > 1)
        intersects = (ids[TILE - 1] >= base) & (ids[0] < base + cap_r)

        @pl.when(intersects)
        def _(k=k, ids=ids):
            ws = jnp.clip(ids[0], base, base + cap_r - 1)
            # lane windows must start at provably-128-aligned offsets: snap
            # down and widen the one-hot window to 2T
            off = pl.multiple_of((ws - base) // TILE * TILE, TILE)
            lid = ids - (base + off)  # in [0, 2T) for in-block edges
            sel = (ids >= base) & (ids < jnp.minimum(base + cap_r, cap))
            onehot = (
                (lid[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TILE, 2 * TILE), 1))
                & sel[:, None]
            ).astype(jnp.float32)  # (T_edges, 2T_window)
            # (C, 2T) = valsᵀ-contraction: avoids transposing the stream
            part = jax.lax.dot_general(
                vals_ref[k],  # (T, C)
                onehot,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (C, 2T)
            cur = out_ref[0, :, pl.ds(off, 2 * TILE)]
            out_ref[0, :, pl.ds(off, 2 * TILE)] = cur + part


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def _seg_sum_pallas_impl(vals, ids, cap: int, interpret: bool = False):
    m, c = vals.shape
    nt = -(-m // STEP)
    pad = nt * STEP - m
    if pad:
        # pad with the last id and zero rows: adds 0 to that segment
        ids = jnp.concatenate([ids, jnp.broadcast_to(ids[-1:], (pad,))])
        vals = jnp.concatenate([vals, jnp.zeros((pad, c), vals.dtype)])
    r = _row_blocks(cap, c)
    assert r > 0
    cap_r = cap // r

    out = pl.pallas_call(
        _seg_sum_kernel,
        grid=(r, nt),
        in_specs=[
            pl.BlockSpec((K, TILE, 1), lambda r_i, t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE, c), lambda r_i, t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        # the output block IS the accumulator: same index for every t of one
        # range-block, so it lives in VMEM for the whole sweep and flushes
        # once; T pad columns absorb window spill (only zeros land there)
        out_specs=pl.BlockSpec(
            (1, c, cap_r + 2 * TILE), lambda r_i, t: (r_i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, c, cap_r + 2 * TILE), jnp.float32),
        interpret=interpret,
    )(
        ids.reshape(nt * K, TILE, 1),
        vals.astype(jnp.float32).reshape(nt * K, TILE, c),
    )
    # (R, C, cap_r) -> (cap, C)
    return out[:, :, :cap_r].transpose(0, 2, 1).reshape(cap, c)


# ---------------------------------------------------------------------------
# segmented broadcast (monotone gather): windows DMA'd from HBM per subtile
# ---------------------------------------------------------------------------


def _seg_broadcast_kernel(ids_ref, table_ref, out_ref):
    r = pl.program_id(0)
    cap_r = table_ref.shape[1] - 2 * TILE  # block rows (minus window pad)
    base = r * cap_r
    cap = cap_r * pl.num_programs(0)

    for k in range(K):
        ids = ids_ref[k, :, 0]
        intersects = (ids[TILE - 1] >= base) & (ids[0] < base + cap_r)

        def compute(k=k, ids=ids):
            ws = jnp.clip(ids[0], base, base + cap_r - 1)
            off = (ws - base) // TILE * TILE  # sublane offsets need no alignment
            lid = ids - (base + off)
            sel = (ids >= base) & (ids < jnp.minimum(base + cap_r, cap))
            onehot = (
                (lid[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TILE, 2 * TILE), 1))
                & sel[:, None]
            ).astype(jnp.float32)  # (T_edges, 2T_window)
            win = table_ref[0, pl.ds(off, 2 * TILE), :]  # (2T, C)
            return jax.lax.dot_general(
                onehot,
                win,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        out_ref[0, k] = jax.lax.cond(
            intersects, compute, lambda: jnp.zeros((TILE, out_ref.shape[3]), jnp.float32)
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _seg_broadcast_pallas_impl(table, ids, interpret: bool = False):
    cap, c = table.shape
    (m,) = ids.shape
    nt = -(-m // STEP)
    pad = nt * STEP - m
    if pad:
        ids = jnp.concatenate([ids, jnp.broadcast_to(ids[-1:], (pad,))])
    r = _row_blocks(cap, c)
    assert r > 0
    cap_r = cap // r
    # per range-block: its rows plus 2T window-spill pad
    blocks = table.astype(jnp.float32).reshape(r, cap_r, c)
    blocks = jnp.concatenate([blocks, jnp.zeros((r, 2 * TILE, c), jnp.float32)], axis=1)

    out = pl.pallas_call(
        _seg_broadcast_kernel,
        grid=(r, nt),
        in_specs=[
            pl.BlockSpec((K, TILE, 1), lambda r_i, t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, cap_r + 2 * TILE, c), lambda r_i, t: (r_i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, K, TILE, c), lambda r_i, t: (r_i, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, nt * K, TILE, c), jnp.float32),
        interpret=interpret,
    )(ids.reshape(nt * K, TILE, 1), blocks)
    # edges outside a range-block produced zeros there; sum the R passes
    return out.sum(axis=0).reshape(nt * STEP, c)[:m]


# ---------------------------------------------------------------------------
# public API with custom VJPs (sum and broadcast are each other's adjoints)
# ---------------------------------------------------------------------------


def seg_sum_sorted_ref(vals, ids, cap: int):
    """XLA fallback: scatter-add with sorted-indices hint."""
    out = jnp.zeros((cap,) + vals.shape[1:], jnp.float32)
    return out.at[ids].add(vals.astype(jnp.float32), mode="drop", indices_are_sorted=True)


def seg_broadcast_sorted_ref(table, ids):
    cap = table.shape[0]
    valid = ids < cap
    out = jnp.take(table, jnp.minimum(ids, cap - 1), axis=0).astype(jnp.float32)
    return jnp.where(valid[:, None], out, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def seg_sum_sorted_fast(vals, ids, cap: int):
    """out[v] = sum of vals rows whose (sorted, dense) id == v; id >= cap drops."""
    if _use_pallas() and _row_blocks(cap, vals.shape[1]) > 0:
        return _seg_sum_pallas_impl(vals, ids, cap)
    return seg_sum_sorted_ref(vals, ids, cap)


def _seg_sum_fwd(vals, ids, cap):
    return seg_sum_sorted_fast(vals, ids, cap), (ids, vals.dtype)


def _seg_sum_bwd(cap, res, g):
    ids, dt = res
    return seg_broadcast_sorted_fast(g, ids).astype(dt), None


seg_sum_sorted_fast.defvjp(_seg_sum_fwd, _seg_sum_bwd)


@jax.custom_vjp
def seg_broadcast_sorted_fast(table, ids):
    """out[i] = table[ids[i]] for nondecreasing dense ids; id >= cap reads 0.

    The Pallas window kernel measures slightly SLOWER than XLA's row gather
    here (5.7 vs 3.5 ms at 524k x 32 — the gather is row-latency-bound and
    the one-hot matmuls don't amortise on the read side), so it is opt-in
    via LNT_PALLAS_BROADCAST=1; the custom VJP still routes the adjoint into
    the fast Pallas segmented sum.
    """
    import os

    if os.environ.get("LNT_PALLAS_BROADCAST") == "1" and _use_pallas():
        return _seg_broadcast_pallas_impl(table, ids)
    return seg_broadcast_sorted_ref(table, ids)


def _seg_broadcast_fwd(table, ids):
    return seg_broadcast_sorted_fast(table, ids), (ids, table.shape[0], table.dtype)


def _seg_broadcast_bwd(res, g):
    ids, cap, dt = res
    return seg_sum_sorted_fast(g, ids, cap).astype(dt), None


seg_broadcast_sorted_fast.defvjp(_seg_broadcast_fwd, _seg_broadcast_bwd)


# ---------------------------------------------------------------------------
# segmented max + winner-carry over PRE-SORTED dense runs
#
# PointNet's per-vertex max pool with the barycentric weight of the winning
# edge per (vertex, channel).  The XLA formulation (scatter-max + winner
# matching + carry gather) costs ~27.5 ms at 524k x 32 on v5e (row-latency
# bound, 4 passes).  Here: per subtile of T edges, an in-register segmented
# Hillis-Steele max-scan (log2 T doubling steps of rolls + selects) leaves
# each run's partial max (and its carry) at the run's LAST in-subtile edge;
# a last-edge one-hot matmul (HIGHEST precision - exact for selections)
# extracts them into a (C, range-block) window accumulator combined with
# elementwise max.  Values are pre-shifted by (1 - global min) so "absent"
# accumulator zeros never beat real entries; the shift is undone on the way
# out (~1 ulp of the min's magnitude, documented).
# ---------------------------------------------------------------------------


def _seg_max_kernel(bshift_ref, ids_ref, vals_ref, carry_ref, outv_ref, outc_ref):
    r = pl.program_id(0)
    t = pl.program_id(1)
    cap_r = outv_ref.shape[2] - 2 * TILE
    base = r * cap_r
    cap = cap_r * pl.num_programs(0)
    c = vals_ref.shape[2]

    @pl.when(t == 0)
    def _():
        outv_ref[:] = jnp.zeros_like(outv_ref)
        outc_ref[:] = jnp.zeros_like(outc_ref)

    bshift = bshift_ref[0, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, (TILE, c), 0)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)

    for k in range(K):
        ids = ids_ref[k, :, 0]  # (T,)
        intersects = (ids[TILE - 1] >= base) & (ids[0] < base + cap_r)

        @pl.when(intersects)
        def _(k=k, ids=ids):
            idc = ids_ref[k]  # (T, 1)
            v = vals_ref[k].astype(jnp.float32) + bshift  # (T, C), >= 1 strictly
            cr = jnp.broadcast_to(carry_ref[k], (TILE, c))  # (T, C)

            # segmented inclusive max-scan along the subtile
            for s in (1, 2, 4, 8, 16, 32, 64, 128):
                pv = pltpu.roll(v, s, 0)
                pc = pltpu.roll(cr, s, 0)
                pid = pltpu.roll(idc, s, 0)
                same = (pid == idc) & (row1 >= s)  # (T, 1)
                take = jnp.broadcast_to(same, (TILE, c)) & (pv > v)
                v = jnp.where(take, pv, v)
                cr = jnp.where(take, pc, cr)

            # last in-subtile edge of each run
            nid = pltpu.roll(idc, TILE - 1, 0)  # circular -1
            is_last = (nid != idc) | (row1 == TILE - 1)  # (T, 1)

            ws = jnp.clip(ids[0], base, base + cap_r - 1)
            off = pl.multiple_of((ws - base) // TILE * TILE, TILE)
            lid = ids - (base + off)
            sel = (ids >= base) & (ids < jnp.minimum(base + cap_r, cap))
            onehot = (
                (lid[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TILE, 2 * TILE), 1))
                & sel[:, None]
                & is_last
            ).astype(jnp.float32)  # (T, 2T)
            dn = (((0,), (0,)), ((), ()))
            pv = jax.lax.dot_general(  # (C, 2T): exact (selection of f32)
                v, onehot, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            pc = jax.lax.dot_general(
                cr, onehot, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            curv = outv_ref[0, :, pl.ds(off, 2 * TILE)]
            curc = outc_ref[0, :, pl.ds(off, 2 * TILE)]
            take = pv >= curv  # later subtile wins ties (= latest edge rule)
            outv_ref[0, :, pl.ds(off, 2 * TILE)] = jnp.where(take, pv, curv)
            outc_ref[0, :, pl.ds(off, 2 * TILE)] = jnp.where(take, pc, curc)


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def _seg_max_pallas_impl(vals, carry, ids, cap: int, interpret: bool = False):
    m, c = vals.shape
    nt = -(-m // STEP)
    pad = nt * STEP - m
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), cap, ids.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, c), vals.dtype)])
        carry = jnp.concatenate([carry, jnp.zeros((pad,), carry.dtype)])
    # two f32 accumulators -> half the usual row budget per range block
    r = 1
    while r <= 64 and not (cap % r == 0 and (cap // r + 2 * TILE) * max(c, 8) * 8 <= VMEM_BUDGET):
        r *= 2
    assert r <= 64, "capacity too large for seg-max range blocks"
    cap_r = cap // r
    bshift = (1.0 - jnp.min(vals.astype(jnp.float32))).reshape(1, 1)

    outv, outc = pl.pallas_call(
        _seg_max_kernel,
        grid=(r, nt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda r_i, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((K, TILE, 1), lambda r_i, t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE, c), lambda r_i, t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE, 1), lambda r_i, t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c, cap_r + 2 * TILE), lambda r_i, t: (r_i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, cap_r + 2 * TILE), lambda r_i, t: (r_i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, c, cap_r + 2 * TILE), jnp.float32),
            jax.ShapeDtypeStruct((r, c, cap_r + 2 * TILE), jnp.float32),
        ),
        interpret=interpret,
    )(
        bshift,
        ids.reshape(nt * K, TILE, 1),
        vals.astype(jnp.float32).reshape(nt * K, TILE, c),
        carry.astype(jnp.float32).reshape(nt * K, TILE, 1),
    )
    maxv = outv[:, :, :cap_r].transpose(0, 2, 1).reshape(cap, c)
    maxc = outc[:, :, :cap_r].transpose(0, 2, 1).reshape(cap, c)
    present = maxv > 0.0  # shifted values are >= 1 strictly
    maxed = jnp.where(present, maxv - bshift[0, 0], 0.0)
    # maxv (the exact shifted-domain table) feeds the bit-exact winner match
    # in the custom VJP; maxed alone cannot (the unshift rounds)
    return maxed, jnp.where(present, maxc, 0.0), maxv, bshift[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def seg_max_carry_sorted_fast(vals, carry, ids, cap: int):
    """(maxed, carry_of_winner) per dense sorted segment; empty rows -> 0.

    The max is recovered through a positivity shift and may differ from
    exact by ~1 ulp of the global min; tie-breaking follows the latest-edge
    rule (same as the XLA formulation in ops.seg_max_sorted).
    """
    maxed, carry_out, _, _ = _seg_max_pallas_impl(vals, carry, ids, cap)
    return maxed.astype(vals.dtype), carry_out.astype(vals.dtype)


def _seg_max_fast_fwd(vals, carry, ids, cap):
    maxed, carry_out, maxv_sh, bshift = _seg_max_pallas_impl(vals, carry, ids, cap)
    out = (maxed.astype(vals.dtype), carry_out.astype(vals.dtype))
    return out, (vals, ids, maxv_sh, bshift)


def _seg_max_fast_bwd(cap, res, cts):
    """Route cotangents to each (vertex, channel)'s winning edge.

    Winner matching compares in the same shifted f32 domain the kernel used,
    so the match is bit-exact; ties resolve to the latest edge (argpos max),
    matching both the kernel accumulator and the reference's semantics.
    """
    vals, ids, maxv_sh, bshift = res
    g_max, g_carry = cts
    m, c = vals.shape
    valid = (ids < cap)[:, None]
    vp = vals.astype(jnp.float32) + bshift  # same expression as the kernel
    gathered = jnp.take(maxv_sh, jnp.minimum(ids, cap - 1), axis=0)
    is_win = (vp == gathered) & valid
    row_pos = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[:, None], (m, c))
    argpos = (
        jnp.full((cap, c), -1, jnp.int32)
        .at[ids]
        .max(jnp.where(is_win, row_pos, -1), mode="drop", indices_are_sorted=True)
    )
    winner = jnp.take(argpos, jnp.minimum(ids, cap - 1), axis=0) == row_pos
    gm = jnp.take(g_max, jnp.minimum(ids, cap - 1), axis=0)
    gc = jnp.take(g_carry, jnp.minimum(ids, cap - 1), axis=0)
    d_vals = jnp.where(winner, gm, 0.0).astype(vals.dtype)
    d_carry = jnp.sum(jnp.where(winner, gc, 0.0), axis=1).astype(vals.dtype)
    return d_vals, d_carry, None


seg_max_carry_sorted_fast.defvjp(_seg_max_fast_fwd, _seg_max_fast_bwd)


def seg_max_pallas_available(c: int) -> bool:
    return _use_pallas() and c >= 8
