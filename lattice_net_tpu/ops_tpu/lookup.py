"""Pallas TPU windowed merge-count lookup for sorted query streams.

Neighbour-table construction resolves, for every occupied vertex, the table
positions of ``key + move`` for a handful of fixed moves.  Because the key
table is lexicographically sorted and adding a constant move preserves that
order, every query COLUMN is a sorted stream — and the lower bound of a
sorted query stream in a sorted table advances monotonically.  The round-2
``merge_lookup`` exploited this with one stable sort over [table; queries];
sorts turned out to dominate the whole hierarchy build (lax.sort moves
O(n log^2 n) data).  This kernel replaces the sort with windowed counting:

  * XLA precomputes, per (subtile of T queries, column), the lower bound of
    the subtile's first and last valid queries (a few hundred binary
    searches — cheap);
  * the kernel counts, per query, how many table keys inside the window
    [ws, ws + w) compare lex-less than it: ``count = ws + sum_lanes(pred)``
    with pred built from two broadcast compares of the pair-packed columns;
  * XLA verifies the candidate position by one monotone gather + equality
    (misses -> capacity).

Coverage is data-dependent exactly as in ops_tpu.patch: if any subtile's
lower-bound span exceeds w, a ``lax.cond`` falls back to ``merge_lookup``.

Count columns are (T, 1) sublane vectors; they are packed into the lane dim
of a (T, 128) accumulator via iota-masked selects (single-lane stores are
not legal lane slices), so the output block has no lane padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 256  # queries per subtile
KSUB = 8  # subtiles per grid step
LANES = 128  # count columns packed per output block


def window_width(cap: int, q: int, base: int = 640) -> int:
    ratio = max(1, cap // max(q, 1))
    return min(base * min(ratio, 4), cap)


def _lex_less(a0, a1, b0, b1):
    return (a0 < b0) | ((a0 == b0) & (a1 < b1))


def _lower_bound(table2: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Branchless lower bound of (..., 2) packed queries in a (cap, 2) table."""
    cap = table2.shape[0]
    nsteps = (cap - 1).bit_length() if cap > 1 else 0
    step0 = 1 << (nsteps - 1) if nsteps else 0
    shape = q2.shape[:-1]

    def body(i, pos):
        step = jnp.int32(step0) >> i
        cand = pos + step
        ok = cand <= cap
        rows = jnp.take(table2, jnp.minimum(cand - 1, cap - 1), axis=0)
        adv = ok & _lex_less(rows[..., 0], rows[..., 1], q2[..., 0], q2[..., 1])
        return jnp.where(adv, cand, pos)

    return jax.lax.fori_loop(0, nsteps, body, jnp.zeros(shape, jnp.int32))


def _count_kernel_factory(ksub: int, k_cols: int, w: int):
    def kernel(ws_ref, q0_ref, q1_ref, t_ref, out_ref):
        # ws_ref: (KSUB, K) int32 SMEM — 128-aligned window starts
        # q{0,1}_ref: (KSUB, T, K) int32 — packed query key planes; a column
        #   is extracted by masked lane-reduce (single-lane slices are not
        #   legal, and a (T, 1) block layout lane-pads x128 and blows VMEM)
        # t_ref: (2, cap) int32 — both packed table key planes
        # out_ref: (1, T, LANES) int32 — count columns packed into lanes
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (T, k_cols), 1)

        # fori over subtiles only; the K-column loop is unrolled statically
        # inside the body (a fori per (subtile, column) paid ~2x in loop
        # machinery for these small bodies)
        def body(k, acc):
            q0k = q0_ref[k]  # (T, K)
            q1k = q1_ref[k]
            for a in range(k_cols):
                ws = pl.multiple_of(ws_ref[k, a], 128)
                w0 = t_ref[0:1, pl.ds(ws, w)]  # (1, w)
                w1 = t_ref[1:2, pl.ds(ws, w)]
                sel = col_iota == a
                q0 = jnp.sum(jnp.where(sel, q0k, 0), axis=1, keepdims=True)  # (T, 1)
                q1 = jnp.sum(jnp.where(sel, q1k, 0), axis=1, keepdims=True)
                pred = _lex_less(w0, w1, q0, q1)  # (T, w): table[j] < query[t]
                cnt = ws + jnp.sum(pred.astype(jnp.int32), axis=1, keepdims=True)
                acc = jnp.where(lane_iota == k * k_cols + a, cnt, acc)
            return acc

        out_ref[0] = jax.lax.fori_loop(
            0, ksub, body, jnp.zeros((T, LANES), jnp.int32), unroll=1
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def _count_pallas(q0, q1, t2, ws, w: int, interpret: bool = False):
    """q{0,1} (S, T, K), t2 (2, cap), ws (S, K) -> (steps, T, LANES)."""
    s, k = ws.shape
    steps = s // KSUB
    assert KSUB * k <= LANES
    out = pl.pallas_call(
        _count_kernel_factory(KSUB, k, w),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((KSUB, k), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((KSUB, T, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KSUB, T, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, t2.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, T, LANES), jnp.int32),
        interpret=interpret,
    )(ws, q0, q1, t2)
    return out


def _use_pallas() -> bool:
    # opt-in: chained-dispatch measurement on v5e shows the windowed count
    # (6.1 ms) roughly even with the packed merge sort (5.3 ms) at KITTI
    # shapes — the lex compare + lane reduction is VPU-bound.  The kernel
    # stays available (and tested) for table shapes where sorts lose.
    import os

    return os.environ.get("LNT_PALLAS_LOOKUP") == "1"


def monotone_lookup(
    structure, query_keys: jnp.ndarray, valid_rows: jnp.ndarray, interpret: bool = False
):
    """Lookup of (Q, K, d) int32 keys whose columns are monotone over the
    valid prefix rows; misses -> capacity.

    Args:
      structure: LatticeStructure (sorted table with packed keys).
      query_keys: (Q, K, d) — column a = some fixed move applied to a sorted
        key stream; rows where ``valid_rows`` is False are ignored (output
        capacity).  Valid rows must form a PREFIX (sorted tables put their
        sentinel rows last, so this holds for every caller).
      valid_rows: (Q,) bool prefix mask.

    Returns (Q, K) int32 positions, falling back to ``merge_lookup`` via
    lax.cond when any subtile's span exceeds the static window.
    """
    from lattice_net_tpu.lattice.structure import pack_key_pairs

    cap = structure.capacity
    q, k, d = query_keys.shape
    table2 = structure._packed_table()  # (cap, 2) for d=3
    if not (_use_pallas() or interpret):
        return _fallback(structure, query_keys, valid_rows)
    if table2.shape[1] != 2 or cap % T or cap < 256 or KSUB * k > LANES:
        return _fallback(structure, query_keys, valid_rows)
    w = window_width(cap, q)

    s = -(-q // T)
    s = -(-s // KSUB) * KSUB
    q_pad = s * T

    qp = pack_key_pairs(query_keys)  # (Q, K, 2)
    qp = jnp.pad(qp, ((0, q_pad - q), (0, 0), (0, 0)), constant_values=0)
    vmask = jnp.pad(valid_rows, (0, q_pad - q), constant_values=False)
    nr_valid = jnp.sum(valid_rows.astype(jnp.int32))

    # boundary lower bounds on the first/last VALID query of each subtile
    first_idx = jnp.arange(s, dtype=jnp.int32) * T
    last_valid = jnp.maximum(nr_valid - 1, 0)
    first_idx = jnp.minimum(first_idx, last_valid)
    last_idx = jnp.minimum(first_idx + (T - 1), last_valid)
    qb_first = jnp.take(qp, first_idx, axis=0)  # (S, K, 2)
    qb_last = jnp.take(qp, last_idx, axis=0)
    lb_first = _lower_bound(table2, qb_first)  # (S, K)
    lb_last = _lower_bound(table2, qb_last)
    ws = jnp.minimum(jnp.maximum(lb_first, 0), cap - w) // 128 * 128
    ok = jnp.all(lb_last - ws <= w)

    # clamp invalid-row queries to the last valid query so kernel windows
    # stay sane; verification against the ORIGINAL keys rejects them anyway
    qv = jnp.where(vmask[:, None, None], qp, jnp.take(qp, last_valid, axis=0)[None])
    q0 = qv[..., 0].reshape(s, T, k)  # (S, T, K)
    q1 = qv[..., 1].reshape(s, T, k)
    t2 = table2.T  # (2, cap)

    def fast(_):
        cnt = _count_pallas(q0, q1, t2, ws.astype(jnp.int32), w, interpret=interpret)
        # (steps, T, LANES): lane t = subtile (t // K) column (t % K)
        cnt = cnt.reshape(s // KSUB, T, LANES)[:, :, : KSUB * k]
        cnt = cnt.reshape(s // KSUB, T, KSUB, k).transpose(0, 2, 1, 3).reshape(q_pad, k)
        cand = jnp.minimum(cnt, cap)
        rows = jnp.take(table2, jnp.minimum(cand, cap - 1), axis=0)  # (Q_pad,K,2)
        hit = (cand < cap) & jnp.all(rows == qp, axis=-1) & vmask[:, None]
        return jnp.where(hit, cand, cap).astype(jnp.int32)[:q]

    def slow(_):
        return _fallback(structure, query_keys, valid_rows)

    return jax.lax.cond(ok, fast, slow, operand=None)


def _fallback(structure, query_keys, valid_rows):
    cap = structure.capacity
    out = structure.merge_lookup(query_keys)
    return jnp.where(valid_rows[:, None], out, cap).astype(jnp.int32)
