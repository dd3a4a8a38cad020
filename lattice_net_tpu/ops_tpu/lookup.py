"""Monotone (sorted-stream) key lookup for neighbour-table construction.

Neighbour-table construction resolves, for every occupied vertex, the table
positions of ``key + move`` for a handful of fixed moves.  Because the key
table is lexicographically sorted and adding a constant move preserves that
order, every query COLUMN is a sorted stream.  The production path is
``LatticeStructure.merge_lookup`` — ONE stable sort over [table; queries]
with folded key+payload operands — which this module masks per valid row.

A Pallas "windowed count" kernel lived here through round 2: XLA binary
searches located each 256-query subtile's window, and the kernel counted
lex-less table entries per query inside it (later with the hit-verification
fused into the kernel to avoid a latency-bound (Q, K)-row gather).  It was
DELETED after chained in-context measurement on v5e at bench shapes showed
the full forward program got *slower* with it enabled for the same-level
(k=4) lookups — 64.3 ms vs 60.6 ms with the merge sort — even though the
isolated stage timing slightly favoured the kernel (4.4 vs 5.7 ms; isolated
stage rows over the axon tunnel carry ~1.5 ms dispatch floors and cache
hazards, so in-program deltas are authoritative, see CLAUDE.md).  The
kernel survives in git history (`ops_tpu/lookup.py` before this commit)
should a table regime appear where sorts lose.
"""

from __future__ import annotations

import jax.numpy as jnp


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
      interpret: kept for API compatibility (the Pallas kernel that used it
        was removed); ignored.

    Returns (Q, K) int32 positions.
    """
    del interpret
    cap = structure.capacity
    out = structure.merge_lookup(query_keys)
    return jnp.where(valid_rows[:, None], out, cap).astype(jnp.int32)
