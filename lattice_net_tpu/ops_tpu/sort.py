"""VMEM-resident Pallas bitonic sort for int32 multi-operand key rows.

Why: the lattice build is sort-bound — ``lax.sort`` costs ~8.7 ms per
524k-row sort on v5e and the KITTI-scale build runs several of them
(CLAUDE.md "Performance map").  XLA's variadic sort streams HBM every pass;
for n <= ~2^20 the whole problem is a few MB and fits VMEM (~16 MB/core), so
a fully on-chip bitonic network pays HBM once each way instead of ~200x.

Design (TPU-first, no reference counterpart — the CUDA code sorts nothing;
its hash table replaces sorting, ``/root/reference/include/lattice_net/
kernels/HashTableGPU.cuh:443-518``):

  * the flat index i of element (s, l) in the (S, 128) layout is
    ``i = s*128 + l``; bitonic partner ``i ^ j`` is a pure lane-dim exchange
    for j < 128 (two ``pltpu.roll`` on axis 1 + lane-bit select) and a pure
    sublane-dim exchange for j >= 128 (rolls on axis 0).  All operands move
    under one lexicographic comparison decision.
  * comparison is full-lex over ALL operands — exactly
    ``lax.sort(ops, num_keys=len(ops))``.  The build's sorts either fold
    their payload into a key column (folded branches) or append it as the
    last operand, so full-lex == the stable sort they rely on, bit-exact.
  * all ~sum(m for m in 1..log2(n)) compare-exchange passes are unrolled at
    trace time; masks (partner-high bit, descending-block bit) are rebuilt
    per pass from iotas — pure VPU work, no extra VMEM residents.

Scope: rows are padded to the next power of two with ``INT32_MAX`` keys
(sorts-to-end, exactly how the build already pads invalid rows — callers
whose real keys can equal INT32_MAX in the FIRST operand must pre-mask; the
build's packed keys are bounded far below it).  Beyond the VMEM budget
(``max_elems``) ``sort_lex`` falls back to ``lax.sort``, so it is always
safe to call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_INT32_MAX = jnp.iinfo(jnp.int32).max


def max_elems(n_ops: int) -> int:
    """Largest padded row count the VMEM-resident network accepts.

    VMEM budget (~16 MB/core), counting EVERYTHING live inside a pass:
    n_ops operand arrays + n_ops selected partners + the two (S, 128)
    int32 iotas + per-pass bool masks (high/desc/less/eq, 1/8 the int32
    footprint each) + transient lo/hi rolls.  At 2^19 rows: 2 ops = 2+2+2
    = ~6 MB (+transients); 3 ops = 3+3+2 = ~8 MB (+transients) — both
    fit.  2^20 with 2 ops = 8+8 MB + iotas would NOT, so the cap is 2^19
    for <=2 ops and 2^18 beyond until chip-verified otherwise
    (ADVICE r2 item 1).  Chip verification may raise these.
    """
    return (1 << 19) if n_ops <= 2 else (1 << 18)


def _bit(iota_lane, iota_sub, j):
    """(i & j) != 0 for flat index i = s*128 + l, single power-of-two j."""
    if j < LANE:
        return (iota_lane & j) != 0
    return (iota_sub & (j // LANE)) != 0


def _partner(x, j):
    """x[i ^ j] for every i, via two circular rolls + the bit-j select."""
    if j < LANE:
        axis, sh = 1, j
    else:
        axis, sh = 0, j // LANE
    size = x.shape[axis]
    # pltpu.roll requires a non-negative shift; -sh == size - sh (circular)
    lo = pltpu.roll(x, shift=size - sh, axis=axis)  # at i: value from i + sh
    hi = pltpu.roll(x, shift=sh, axis=axis)  # at i: value from i - sh
    return lo, hi


def _bitonic_kernel(n, n_ops, *refs):
    ops = [refs[i][:] for i in range(n_ops)]
    out_refs = refs[n_ops:]
    S = ops[0].shape[0]
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 1)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)

    kblk = 2
    while kblk <= n:
        desc = (
            _bit(iota_lane, iota_sub, kblk)
            if kblk < n
            else jnp.zeros((S, LANE), jnp.bool_)
        )
        j = kblk // 2
        while j >= 1:
            high = _bit(iota_lane, iota_sub, j)
            partners = []
            for x in ops:
                xlo, xhi = _partner(x, j)
                partners.append(jnp.where(high, xhi, xlo))
            # lexicographic strict less-than over all operands
            less = jnp.zeros((S, LANE), jnp.bool_)
            eq = jnp.ones((S, LANE), jnp.bool_)
            for x, xp in zip(ops, partners):
                less = less | (eq & (x < xp))
                eq = eq & (x == xp)
            keep = jnp.logical_xor(jnp.logical_xor(less, high), desc)
            ops = [jnp.where(keep, x, xp) for x, xp in zip(ops, partners)]
            j //= 2
        kblk *= 2

    for ref, x in zip(out_refs, ops):
        ref[:] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bitonic_sort_pow2(operands, interpret=False):
    n = operands[0].shape[0]
    n_ops = len(operands)
    S = n // LANE
    ops2 = [x.reshape(S, LANE) for x in operands]
    outs = pl.pallas_call(
        functools.partial(_bitonic_kernel, n, n_ops),
        out_shape=tuple(
            jax.ShapeDtypeStruct((S, LANE), jnp.int32) for _ in range(n_ops)
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_ops,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_ops)),
        interpret=interpret,
    )(*ops2)
    return tuple(o.reshape(n) for o in outs)


def sort_supported(n: int, n_ops: int = 2) -> bool:
    """True if the Pallas network handles n rows of n_ops int32 operands."""
    npad = max(1024, 1 << (n - 1).bit_length())
    return npad <= max_elems(n_ops)


def sort_lex(operands, interpret: bool | None = None):
    """Full-lex ascending sort of a tuple of int32 arrays (all are keys).

    Drop-in for ``lax.sort(operands, num_keys=len(operands))``.  Falls back
    to ``lax.sort`` beyond the VMEM budget.  Padding rows are all-INT32_MAX
    and sort past every real row (real first operands must stay below
    INT32_MAX — true for the build's packed/folded keys).  ``interpret``
    defaults to the Pallas interpreter on CPU (tests) and Mosaic on TPU.
    """
    operands = tuple(operands)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = operands[0].shape[0]
    n_ops = len(operands)
    if not sort_supported(n, n_ops):
        return jax.lax.sort(operands, num_keys=n_ops)
    npad = max(1024, 1 << (n - 1).bit_length())
    if npad != n:
        operands = tuple(
            jnp.pad(x, (0, npad - n), constant_values=_INT32_MAX) for x in operands
        )
    outs = _bitonic_sort_pow2(operands, interpret=interpret)
    return tuple(o[:n] for o in outs)


def sort_pairs(keys, vals, interpret: bool | None = None):
    """Sort int32 (keys, vals) lexicographically, ascending (2-operand).

    ``interpret=None`` auto-detects like ``sort_lex`` (interpreter on CPU).
    """
    return sort_lex((keys, vals), interpret=interpret)


def argsort_stable(keys, interpret: bool | None = None):
    """Stable ascending argsort of int32 keys: (sorted_keys, order)."""
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    return sort_pairs(keys, idx, interpret=interpret)
