"""Host-side (numpy) canonical point ordering for the data-prep path.

``lattice.structure.canonical_point_order`` computes the (level-0 simplex,
rank) sort on device; running it inside the per-scan program costs more
than the corner-dedup fast build saves (measured +5.4 ms/scan on v5e, see
bench.py).  Training, however, prepares batches on the HOST in a prefetch
thread that is fully overlapped with the previous device step — reordering
there is free on the critical path, and every train step then takes the
cheap ``canonical_points=True`` build.

This is a numpy twin of the device order (same elevation matrix, same
rem0/rank computation as ``lattice.permutohedral.find_enclosing_simplex``,
``/root/reference/include/.../LatticeGPU.cuh:552-602`` is the common
ancestor).  float32 rounding may disagree with the TPU on borderline points;
that only fragments a simplex run (the fast build is order-correct and
falls back per ``lax.cond`` if run budgets overflow), never changes results.
"""

from __future__ import annotations

import numpy as np

from .permutohedral import _elevation_matrix_np

__all__ = ["canonical_point_order_np"]


def canonical_point_order_np(positions: np.ndarray, sigma) -> np.ndarray:
    """Permutation sorting points by (level-0 simplex rem0, rank) — the host
    twin of :func:`lattice.structure.canonical_point_order` (stable sort, so
    equal-simplex points keep their relative order)."""
    p = np.asarray(positions, np.float32)
    n, d = p.shape
    sig = np.broadcast_to(np.asarray(sigma, np.float32), (d,))
    e = _elevation_matrix_np(d).astype(np.float32)
    elev = (p / sig) @ e.T  # (n, d+1)
    d1 = d + 1

    v = elev / d1
    up = np.ceil(v) * d1
    down = np.floor(v) * d1
    rem0 = np.where(up - elev < elev - down, up, down).astype(np.int32)
    s = rem0.sum(-1) // d1

    diff = elev - rem0
    di = diff[:, :, None]
    dj = diff[:, None, :]
    iu = np.triu(np.ones((d1, d1), bool), 1)
    il = np.tril(np.ones((d1, d1), bool), -1)
    rank = (((di < dj) & iu).sum(-1) + ((dj >= di) & il).sum(-1)).astype(np.int32)

    rank = rank + s[:, None]
    too_low = rank < 0
    too_high = rank > d
    rank = np.where(too_low, rank + d1, np.where(too_high, rank - d1, rank))
    rem0 = np.where(too_low, rem0 + d1, np.where(too_high, rem0 - d1, rem0))

    # significance mirrors the device order: rem0[:, 0..d-1] lex-major, then
    # the packed rank (entry d most significant).  np.lexsort's LAST key is
    # primary.
    keys = tuple(rank[:, i] for i in range(d1)) + tuple(
        rem0[:, i] for i in range(d - 1, -1, -1)
    )
    return np.lexsort(keys).astype(np.int32)
