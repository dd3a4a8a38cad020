"""Pallas TPU kernel for the im2row patch gather (the conv hot path).

A lattice convolution gathers, for every vertex, the values of its
2(d+1)(+1) neighbours (reference ``im2row``, ``LatticeGPU.cuh:1464-1688``)
and multiplies the rowified patches with the filter bank.  XLA's row gather
is row-latency-bound on TPU (~170k rows/ms at 32 channels — <3% of HBM
bandwidth), which made the convs the single largest forward cost.

This kernel exploits a structural property of the sorted lattice tables:
**every neighbour-table column is nondecreasing over the valid entries**
(sorted keys plus a constant axis move preserve lexicographic order, and the
cross-level/transpose tables inherit the same property).  Therefore the ids
of T consecutive query rows in one column live in a contiguous table window,
and the gather becomes, per (subtile, column):

    window = values[ws : ws + W]              # dynamic sublane slice of the
                                              # VMEM-resident value table
    onehot = (ids - ws == iota(T, W))         # (T, W) selection matrix
    patch  = onehot @ window                  # ONE MXU matmul

In bfloat16 the one-hot matmul is an *exact* selection (each output row sums
exactly one product ``1 * v``), so a single MXU pass suffices — no
multi-pass precision splitting.  Invalid ids (misses, value ``capacity``)
are remapped to 2^30 and never match the window, yielding the required zero
rows for free.

Window-coverage is data-dependent: a subtile whose column ids span >= W rows
cannot be served.  The wrapper computes the max span per (subtile, column)
and falls back to the XLA gather path via ``lax.cond`` for the (measured
rare) clouds where any span overflows — never silently dropping values.

Measured (chained dispatch, v5e, cap 65536 x 32ch bf16, K=8+center):
full patch gather 3.1 ms (XLA monotone gathers) -> ~0.3 ms here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 256  # query rows per subtile (one one-hot matmul)
W_BASE = 640  # table window per (subtile, column); multiple of 128
KSUB = 8  # subtiles per grid step (amortises pipeline overhead)
UNROLL = 1  # fori_loop unroll factor inside the kernel
BIG = jnp.int32(1 << 30)  # never-matching id for invalid entries
VMEM_TABLE_BYTES = 9 * 1024 * 1024  # largest value table served in VMEM


def window_width(cap_n: int, q: int) -> int:
    """Window rows per (subtile, column), static from the table shapes.

    Same-level tables drift ~1 table row per query row (512 covers every
    measured scan seed with margin); cross-level coarsen tables (queries
    into a finer/larger table) drift ~cap_n/q faster because the key
    doubling spreads consecutive queries across the fine table.  The
    coverage cond falls back to the XLA gather when a scan exceeds these.
    """
    ratio = max(1, cap_n // max(q, 1))
    if ratio == 1:
        return min(512, cap_n)
    return min(W_BASE * min(ratio, 4), cap_n)


def _patch_kernel_factory(ksub: int, k_cols: int, include_center: bool, w: int):
    def kernel(ws_ref, ids_ref, val_ref, out_ref):
        # ws_ref:  (KSUB, K) int32 in SMEM — window starts (128-aligned)
        # val_ref: (C, capN) — whole value table channel-major: the lane dim
        #   is capN (no 32->128 lane padding, which quadrupled VMEM and blew
        #   the 16 MB budget in the row-major layout)
        # ids_ref: (KSUB, K, 1, T) int32 — query ids as lane rows (invalid = BIG)
        # out_ref: (K(+1), C, KSUB*T) channel-major patch blocks
        i = pl.program_id(0)
        sub = jax.lax.broadcasted_iota(jnp.int32, (w, T), 0)

        # fori_loop (not python unrolling) so the (w, T) one-hot intermediate
        # reuses one stack slot across the KSUB * K iterations
        def body(t, carry):
            k = t // k_cols
            a = t - k * k_cols
            ws = pl.multiple_of(ws_ref[k, a], 128)
            window = val_ref[:, pl.ds(ws, w)]  # (C, w) lane slice, aligned
            lid = ids_ref[k, a] - ws  # (1, T) lane row
            onehot = (lid == sub).astype(val_ref.dtype)  # (w, T), exact in bf16
            # (C, w) @ (w, T) -> (C, T): plain MXU matmul, no kernel transposes
            out_ref[a, :, pl.ds(pl.multiple_of(k * T, T), T)] = jnp.dot(
                window, onehot, preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, ksub * k_cols, body, 0, unroll=UNROLL)

        if include_center:
            # When cap/T is not a multiple of KSUB, padded subtiles compute
            # base offsets past the table end; Pallas clamps dynamic slices
            # to the buffer, so they read (valid but arbitrary) trailing
            # rows.  The clamped garbage lands only in output rows beyond
            # the real query count, which every caller discards via [:q] —
            # see the matching note in patch_gather_supported.

            def body_c(k, carry):
                base = pl.multiple_of((i * ksub + k) * T, T)
                out_ref[k_cols, :, pl.ds(pl.multiple_of(k * T, T), T)] = val_ref[
                    :, pl.ds(base, T)
                ].astype(out_ref.dtype)
                return carry

            jax.lax.fori_loop(0, ksub, body_c, 0, unroll=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("include_center", "w", "interpret"))
def _patch_gather_pallas(values_t, ids, ws, include_center: bool, w: int, interpret: bool = False):
    """values_t (C, capN), ids (S, K, T, 1), ws (S, K) -> (K(+c), C, S*T)."""
    c, cap = values_t.shape
    s, k = ws.shape
    steps = s // KSUB
    k_out = k + 1 if include_center else k
    # double-buffered table + out blocks can exceed the 16 MB default scoped
    # budget at the widest levels (e.g. 32768 x 128ch bf16); v5e VMEM has
    # headroom, so size the cap to the actual buffers plus margin
    esz = values_t.dtype.itemsize
    vmem_need = (
        2 * cap * c * esz
        + 2 * k_out * KSUB * T * c * esz
        + 2 * KSUB * k * T * 4
        + (T * w * esz + 2 * 1024 * 1024)
    )
    out = pl.pallas_call(
        _patch_kernel_factory(KSUB, k, include_center, w),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((KSUB, k), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((KSUB, k, 1, T), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k_out, c, KSUB * T), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k_out, c, s * T), values_t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(vmem_need, 16 * 1024 * 1024), 40 * 1024 * 1024)
        ),
        interpret=interpret,
    )(ws, ids, values_t)
    return out


def _on_tpu() -> bool:
    import os

    env = os.environ.get("LNT_PALLAS_PATCH")
    if env is not None:
        return env != "0"
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def patch_gather_supported(values: jnp.ndarray, neighbors: jnp.ndarray) -> bool:
    """Static eligibility: TPU, table fits VMEM, shapes tile, dtype is bf16.

    cap % (T * KSUB) == 0 is NOT required: when the subtile count pads up to
    a KSUB multiple, the padded subtiles' window/center slices run past the
    table and rely on Pallas dynamic-slice clamping.  That is safe by
    construction — the clamped reads produce rows only at output positions
    >= the real query count, which ``patch_gather`` discards with ``[:q]``.
    """
    cap, c = values.shape
    q, k = neighbors.shape
    if not _on_tpu():
        return False
    if values.dtype != jnp.bfloat16:
        return False
    if cap < window_width(cap, q) or cap % T:
        return False
    if cap * c * values.dtype.itemsize > VMEM_TABLE_BYTES:
        return False
    return True


def _prepare(neighbors: jnp.ndarray, cap_n: int, w: int):
    """Window starts + coverage flag for the kernel layout.

    Windows are per-subtile [min, max] ranges of the valid ids, so the
    kernel serves any CLUSTERED index column — monotone neighbour tables,
    but also e.g. per-point splat indices of canonically-ordered points.
    """
    q, k = neighbors.shape
    s = -(-q // T)
    s = -(-s // KSUB) * KSUB  # pad subtile count to a multiple of KSUB
    q_pad = s * T

    nbr = jnp.pad(neighbors, ((0, q_pad - q), (0, 0)), constant_values=cap_n)
    valid = nbr < cap_n
    blk_min = jnp.min(jnp.where(valid, nbr, cap_n).reshape(s, T, k), axis=1)  # (S, K)
    blk_max = jnp.max(jnp.where(valid, nbr, -1).reshape(s, T, k), axis=1)  # (S, K)
    # snap down to 128: lane-dim dynamic offsets must be provably 128-aligned
    # for the window slice (the kernel re-asserts via pl.multiple_of)
    ws = jnp.maximum(jnp.minimum(blk_min, cap_n - w), 0) // 128 * 128
    ok = jnp.all(blk_max - ws < w)

    ids = jnp.where(valid, nbr, BIG)
    ids = ids.reshape(s, T, k).transpose(0, 2, 1)[:, :, None, :]  # (S, K, 1, T)
    return ids, ws.astype(jnp.int32), ok, q_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def patch_gather(values, neighbors, include_center_self: bool):
    """(capN, C) x (Q, K) int32 -> (Q, K(+1), C) neighbour patch tensor.

    Drop-in for ``ops.gather_neighbor_values`` on eligible shapes: missing
    neighbours (id == capN) contribute zero rows; with
    ``include_center_self`` the query row itself is appended as the last
    patch column (requires Q == capN, the same-level layout).
    """
    return _patch_gather_impl(values, neighbors, include_center_self)


def _patch_gather_impl(values, neighbors, include_center_self):
    cap, c = values.shape
    q, k = neighbors.shape
    if include_center_self:
        assert q == cap, "same-level center column requires query table == value table"
    w = window_width(cap, q)
    ids, ws, ok, q_pad = _prepare(neighbors, cap, w)

    def fast(_):
        out = _patch_gather_pallas(values.T, ids, ws, include_center_self, w)
        return out.transpose(2, 0, 1)[:q]  # (Q, K(+1), C)

    def slow(_):
        from lattice_net_tpu.lattice import ops as lops

        return lops.gather_neighbor_values_xla(values, neighbors, include_center_self)

    return jax.lax.cond(ok, fast, slow, operand=None)


def _patch_gather_fwd(values, neighbors, include_center_self):
    # residuals must be JAX types: a (cap, 0) proto array carries the value
    # table's capacity and dtype without holding memory
    proto = jnp.zeros((values.shape[0], 0), values.dtype)
    return _patch_gather_impl(values, neighbors, include_center_self), (proto, neighbors)


def _patch_gather_bwd(include_center_self, res, g):
    proto, neighbors = res
    cap, dt = proto.shape[0], proto.dtype
    c = g.shape[-1]
    q, k = neighbors.shape
    # adjoint of the masked multi-column gather: one flat f32 scatter-add
    # (invalid ids drop); the center column adds its cotangent identically.
    g = g.astype(jnp.float32)
    gk = g[:, :k, :].reshape(q * k, c)
    idx = neighbors.reshape(q * k)
    dv = jnp.zeros((cap, c), jnp.float32).at[idx].add(gk, mode="drop")
    if include_center_self:
        dv = dv + g[:, k, :]
    return dv.astype(dt), None


patch_gather.defvjp(_patch_gather_fwd, _patch_gather_bwd)
