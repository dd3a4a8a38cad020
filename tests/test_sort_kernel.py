"""Pallas VMEM-resident bitonic pair sort vs lax.sort (interpret mode).

The kernel's contract is bit-exactness with ``lax.sort((k, v), num_keys=2)``
— the lattice build's dedup/lookup machinery depends on deterministic,
stable orderings (SURVEY.md §7.1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lattice_net_tpu.ops_tpu import sort as sk


@pytest.mark.parametrize("n", [777, 1024, 4096, 5000])
def test_sort_pairs_matches_lax_sort(n):
    rng = np.random.default_rng(n)
    k = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, n).astype(np.int32))
    v = jnp.asarray(rng.permutation(n).astype(np.int32))
    ko, vo = sk.sort_pairs(k, v, interpret=True)
    rk, rv = jax.lax.sort((k, v), num_keys=2)
    np.testing.assert_array_equal(np.asarray(ko), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(rv))


def test_argsort_stable_duplicates():
    rng = np.random.default_rng(7)
    k = rng.integers(0, 13, 4096).astype(np.int32)
    ks, order = sk.argsort_stable(jnp.asarray(k), interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), np.sort(k))
    np.testing.assert_array_equal(np.asarray(order), np.argsort(k, kind="stable"))


def test_sort_pairs_negative_and_extreme_keys():
    # full int32 range except INT32_MAX (reserved for padding, documented)
    rng = np.random.default_rng(3)
    k = rng.integers(-(1 << 31), (1 << 31) - 1, 2048).astype(np.int32)
    v = jnp.asarray(rng.permutation(2048).astype(np.int32))
    ko, vo = sk.sort_pairs(jnp.asarray(k), v, interpret=True)
    rk, rv = jax.lax.sort((jnp.asarray(k), v), num_keys=2)
    np.testing.assert_array_equal(np.asarray(ko), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(rv))


def test_sort_lex_three_operands():
    rng = np.random.default_rng(11)
    ops = tuple(
        jnp.asarray(rng.integers(-500, 500, 4096).astype(np.int32)) for _ in range(3)
    )
    outs = sk.sort_lex(ops, interpret=True)
    refs = jax.lax.sort(ops, num_keys=3)
    for o, r in zip(outs, refs):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_fallback_beyond_vmem_budget():
    # n past the VMEM budget must route to lax.sort (correct, no pallas)
    n = sk.max_elems(2) + 1
    k = jnp.arange(n, dtype=jnp.int32)[::-1]
    v = jnp.arange(n, dtype=jnp.int32)
    ko, vo = sk.sort_pairs(k, v)
    assert int(ko[0]) == 0 and int(ko[-1]) == n - 1
    assert int(vo[0]) == n - 1
