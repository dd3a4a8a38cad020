"""Tombstone: the Pallas VMEM-resident bitonic sort (deleted, round 3).

A fully VMEM-resident bitonic sorting network for int32 multi-operand key
rows lived here through round 2 (committed `8d958be`, opt-in via
``LNT_PALLAS_SORT=1``) as a candidate replacement for ``lax.sort`` in the
hierarchy build — the build was believed sort-bound (~8.7 ms per 524k x
3-operand sort in the round-2 performance map).

It was DELETED after the first *correctly chained* on-chip A/B (v5e,
``misc/sort_ab_chip.py``, also deleted — log kept at
``docs/runs/sort_ab_chip.log``; ``misc/prim_cost_chip.py`` supersedes its
lax.sort rows):

    n=2^18 ops=2:  lax.sort 0.198-0.221 ms   pallas 2.40-2.48 ms
    (bit-exact, speedup 0.08-0.09x — the kernel LOSES 10-12x)

Two compounding reasons:

1. ``lax.sort`` on TPU is an order of magnitude faster than the round-2
   attribution assumed.  The 8.7 ms figure came from isolated stage rows
   whose chained feedback (``out * 0``) was constant-folded by XLA, so the
   runtime skipped dispatches on some rows and double-counted on others;
   the corrected harness (XOR of a live output bit) bounds a 2^18 x 2-op
   sort at ~0.2 ms.  The build is NOT sort-bound — its cost lives in the
   full-stream gathers/scatters (see ``misc/prim_cost_chip.py``).
2. The O(n log^2 n) bitonic network pays ~190 passes at 2^18 rows, each a
   full VMEM-wide roll+compare+select, and Mosaic cannot rotate 1-bit masks
   (int32 casts required), while XLA's sort lowering streams HBM near
   bandwidth.  The VMEM budget also capped the kernel below the build's
   real 2^19 x 3-operand shape.

The kernel, its dispatcher wiring (``structure._lex_sort``), and its tests
(`tests/test_sort_kernel.py`, `tests/test_pallas_sort_build.py`) survive in
git history at tag `8d958be`..`b4c6fee` should a shape regime appear where
a resident sort wins (e.g. tiny repeated sorts inside a fori_loop).

This module intentionally exports nothing.
"""
