"""Pallas TPU row-gather: the hot primitive behind every lattice op.

XLA's native row gather on TPU runs at ~25 GB/s effective for the (524k rows
x 32ch) patterns of lattice convolutions — 1.3 ms per conv at SemanticKITTI
scale, the single largest cost in the forward (measured via in-program loop
timing; see PROGRESS notes).  Mosaic's ``tpu.dynamic_gather`` executes a
full-table-shaped gather out of VMEM instead; this module tiles arbitrary
``values[idx]`` row-gathers onto it:

  * the value table lives whole in VMEM (bf16 halves the footprint),
  * queries are processed in table-sized chunks: each grid step broadcasts a
    (cap, 1) index column to (cap, C) and issues one ``take_along_axis``
    (the only gather shape Mosaic lowers, equal input/index/output shapes),
  * out-of-range indices (the `capacity` = miss convention) are clamped here
    and masked by the caller.

The backward of a gather is a scatter-add, which Mosaic cannot lower; the
custom VJP instead sorts (index, cotangent) pairs and segment-sums over the
sorted runs — sorts are fast on TPU (47 us for 524k keys, measured).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def take_rows_reference(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Plain-XLA fallback: values (cap, C), idx (m,) -> (m, C); idx clamped."""
    cap = values.shape[0]
    return jnp.take(values, jnp.minimum(idx, cap - 1), axis=0)


def _gather_kernel(idx_ref, val_ref, out_ref):
    cap, c = val_ref.shape
    idx = jnp.broadcast_to(idx_ref[0], (cap, c))  # (1, cap, 1) block -> (cap, c)
    out_ref[0] = jnp.take_along_axis(val_ref[:], idx, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _take_rows_impl(values: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False):
    cap, c = values.shape
    (m,) = idx.shape
    steps = -(-m // cap)  # ceil
    pad = steps * cap - m
    idx_p = jnp.pad(jnp.minimum(idx, cap - 1), (0, pad)).reshape(steps, cap, 1)

    out = pl.pallas_call(
        _gather_kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, cap, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cap, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, cap, c), values.dtype),
        interpret=interpret,
    )(idx_p, values)
    return out.reshape(steps * cap, c)[:m]


def _sorted_segment_sum(idx: jnp.ndarray, updates: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Scatter-add replacement: sort by index, cumsum, take run boundaries.

    All primitives (sort, cumsum, small gather) are TPU-fast; this is the
    backward path of take_rows and the building block of lattice splatting.
    """
    m, c = updates.shape
    order = jnp.argsort(idx)
    sidx = idx[order]
    supd = jnp.take(updates, order, axis=0)
    csum = jnp.cumsum(supd.astype(jnp.float32), axis=0)
    # last position of each run: sidx changes at the next element
    is_last = jnp.concatenate([sidx[1:] != sidx[:-1], jnp.ones((1,), bool)])
    # inclusive cumsum at run ends, in run order; runs are sorted by index
    # out[v] = csum[end_v] - csum[end_{previous run}]
    ends = jnp.nonzero(is_last, size=cap + 1, fill_value=m - 1)[0]
    totals = jnp.take(csum, ends, axis=0)
    run_sums = jnp.concatenate([totals[:1], totals[1:] - totals[:-1]], axis=0)
    run_ids = jnp.where(
        jnp.arange(cap + 1) < jnp.sum(is_last), jnp.take(sidx, ends), cap + 1
    )
    out = jnp.zeros((cap, c), jnp.float32).at[run_ids].add(run_sums, mode="drop")
    return out.astype(updates.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_rows(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Fast row gather: values (cap, C), idx (m,) int32 -> (m, C).

    Indices >= cap are clamped to cap-1 (callers mask by validity).  Uses the
    Pallas dynamic-gather kernel on TPU, plain XLA elsewhere.
    """
    return _dispatch(values, idx)


def _dispatch(values, idx):
    # The Mosaic dynamic_gather path is disabled by default: on current
    # hardware it rejects tables spanning multiple vregs along the gather
    # dimension ("Multiple source vregs along gather dimension").  XLA's
    # native gather is bytes-bound at ~25 GB/s but correct; the custom VJP
    # below still replaces the far-worse scatter-add backward.
    import os

    if os.environ.get("LNT_PALLAS_GATHER") == "1":
        platform = jax.devices()[0].platform if jax.devices() else "cpu"
        if platform in ("tpu", "axon"):
            return _take_rows_impl(values, idx)
    return take_rows_reference(values, idx)


def _take_rows_fwd(values, idx):
    proto = jnp.zeros((0,), values.dtype)  # carries shape[0]-free dtype info
    return _dispatch(values, idx), (idx, values.shape[0], proto)


def _take_rows_bwd(res, g):
    idx, cap, proto = res
    # clamped gathers read row cap-1, so the VJP accumulates there too —
    # callers that mask invalid rows produce zero cotangent for them anyway.
    # Plain XLA scatter-add: chained-dispatch measurement on v5e shows it
    # 2.4x faster than the sort+scan path (10.0 vs 24.2 ms at 524k x 32);
    # round 1 picked sort+scan off an unchained (dedup-skewed) timing.
    dvalues = (
        jnp.zeros((cap,) + g.shape[1:], jnp.float32)
        .at[jnp.minimum(idx, cap - 1)]
        .add(g.astype(jnp.float32))
        .astype(proto.dtype)
    )
    return dvalues, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)
