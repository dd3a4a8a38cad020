"""Pallas im2row patch-gather kernel vs the XLA monotone-gather reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lattice_net_tpu.lattice import ops as lops
from lattice_net_tpu.lattice import structure as st
from lattice_net_tpu.ops_tpu import patch as pk


def _hier(n=3000, sigma=0.35, caps=(1024, 512)):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 2.0)
    return st.build_hierarchy(pts, sigma, 1, caps)


def _pallas_patch(values, neighbors, include_center):
    w = pk.window_width(values.shape[0], neighbors.shape[0])
    ids, ws, ok, _ = pk._prepare(neighbors, values.shape[0], w)
    assert bool(ok), "test cloud should be window-coverable"
    out = pk._patch_gather_pallas(values.T, ids, ws, include_center, w, interpret=True)
    return out.transpose(2, 0, 1)[: neighbors.shape[0]]


@pytest.mark.parametrize("include_center", [True, False])
def test_patch_kernel_matches_xla_same_level(include_center):
    h = _hier()
    s = h.structures[0]
    nbr = h.neighbors_same[0]  # (1024, 8)
    rng = np.random.default_rng(1)
    vals = jnp.asarray(rng.normal(size=(s.capacity, 32)), jnp.bfloat16)

    ref = lops.gather_neighbor_values_xla(vals, nbr, include_center)
    got = _pallas_patch(vals, nbr, include_center)
    # bf16 selection is exact: bitwise-equal values expected
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_patch_kernel_matches_xla_cross_level():
    h = _hier()
    fine, coarse = h.structures
    nbr = h.neighbors_coarsen[0]  # (cap1, 9) ids into fine
    rng = np.random.default_rng(2)
    vals = jnp.asarray(rng.normal(size=(fine.capacity, 16)), jnp.bfloat16)

    ref = lops.gather_neighbor_values_xla(vals, nbr, False)
    got = _pallas_patch(vals, nbr, False)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_window_overflow_detected():
    # neighbour column spanning more than W rows must flip ok to False
    cap = 1024
    nbr = np.full((cap, 8), cap, np.int32)
    nbr[0, 0] = 0
    nbr[1, 0] = cap - 1  # span = cap-1 > W? only if cap > W; force via wide ids
    w = pk.window_width(cap, cap)
    ids, ws, ok, _ = pk._prepare(jnp.asarray(nbr), cap, w)
    # cap (1024) > W (768): span 1023 >= W -> not coverable
    assert not bool(ok)


def test_custom_vjp_matches_xla_ad():
    h = _hier()
    s = h.structures[0]
    nbr = h.neighbors_same[0]
    rng = np.random.default_rng(3)
    vals = jnp.asarray(rng.normal(size=(s.capacity, 8)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(s.capacity, 9, 8)), jnp.float32)

    _, vjp_ref = jax.vjp(lambda v: lops.gather_neighbor_values_xla(v, nbr, True), vals)
    (dv_ref,) = vjp_ref(g)
    proto = jnp.zeros((s.capacity, 0), vals.dtype)
    dv_fast = pk._patch_gather_bwd(True, (proto, nbr), g)[0]
    np.testing.assert_allclose(np.asarray(dv_ref), np.asarray(dv_fast), rtol=1e-5, atol=1e-5)
