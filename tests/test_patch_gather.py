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


def test_monotone_lookup_matches_lookup():
    from lattice_net_tpu.ops_tpu import lookup as lk
    from lattice_net_tpu.lattice.structure import _axis_moves_np

    h = _hier(n=5000, sigma=0.3, caps=(1024, 512))
    s = h.structures[0]
    moves = jnp.asarray(_axis_moves_np(3))
    occ = s.occupancy_mask()
    queries = s.keys[:, None, :] + moves[None]  # (cap, 4, 3)
    ref = jnp.where(occ[:, None], s.lookup(queries), s.capacity)
    got = lk.monotone_lookup(s, queries, occ, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_monotone_lookup_cross_level():
    from lattice_net_tpu.ops_tpu import lookup as lk
    from lattice_net_tpu.lattice.structure import _axis_moves_np

    h = _hier(n=5000, sigma=0.3, caps=(1024, 512))
    fine, coarse = h.structures
    moves = jnp.asarray(_axis_moves_np(3))
    occ = coarse.occupancy_mask()
    base = jnp.where(occ[:, None], coarse.keys, 0) * 2
    cand = jnp.concatenate(
        [base[:, None, :] + moves[None], base[:, None, :] - moves[None], base[:, None, :]],
        axis=1,
    )
    ref = jnp.where(occ[:, None], fine.lookup(cand), fine.capacity)
    got = lk.monotone_lookup(fine, cand, occ, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def _edges_fixture(n=3000, cap=1024):
    h = _hier(n=n, sigma=0.35, caps=(cap, cap // 2))
    return h.edges, cap


def test_seg_max_kernel_matches_xla():
    from lattice_net_tpu.ops_tpu import segment as sg

    edges, cap = _edges_fixture()
    m = edges.vertex.shape[0]
    rng = np.random.default_rng(5)
    # integer-valued floats: the positivity shift is exact, ties deterministic
    vals = jnp.asarray(rng.integers(-50, 50, size=(m, 16)).astype(np.float32))
    carry = jnp.asarray(rng.normal(size=(m,)).astype(np.float32))

    maxed, carry_out = sg._seg_max_pallas_impl(
        vals, carry, edges.vertex, edges.ends, cap, interpret=True
    )

    maxed_ref, argsrc = lops.segment_max_with_src(vals, edges.vertex, cap)
    carry_ref = jnp.where(
        argsrc < m, jnp.take(carry, jnp.minimum(argsrc, m - 1)), 0.0
    )
    np.testing.assert_array_equal(np.asarray(maxed), np.asarray(maxed_ref))
    np.testing.assert_array_equal(np.asarray(carry_out), np.asarray(carry_ref))


def test_seg_max_kernel_float_tolerance():
    from lattice_net_tpu.ops_tpu import segment as sg

    edges, cap = _edges_fixture()
    m = edges.vertex.shape[0]
    rng = np.random.default_rng(6)
    vals = jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32) * 3)
    carry = jnp.asarray(rng.normal(size=(m,)).astype(np.float32))
    maxed, _ = sg._seg_max_pallas_impl(vals, carry, edges.vertex, edges.ends, cap, interpret=True)
    maxed_ref, _ = lops.segment_max_with_src(vals, edges.vertex, cap)
    # streaming scan is a pure selection: bit-exact even on floats
    np.testing.assert_array_equal(np.asarray(maxed), np.asarray(maxed_ref))


def test_seg_max_fast_bwd_matches_xla_ad():
    from lattice_net_tpu.ops_tpu import segment as sg

    edges, cap = _edges_fixture()
    m = edges.vertex.shape[0]
    rng = np.random.default_rng(7)
    # continuous values: tie-free, so every gradient routing rule agrees
    # (on ties our kernel follows torch_scatter's latest-edge rule, which
    # differs from XLA scatter-max AD's even split)
    vals = jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32))
    carry = jnp.asarray(rng.normal(size=(m,)).astype(np.float32))
    gm = jnp.asarray(rng.normal(size=(cap, 8)).astype(np.float32))
    gc = jnp.asarray(rng.normal(size=(cap, 8)).astype(np.float32))

    def xla_op(v, cr):
        maxed, argsrc = lops.segment_max_with_src(v, edges.vertex, cap)
        carry_out = jnp.where(argsrc < m, jnp.take(cr, jnp.minimum(argsrc, m - 1)), 0.0)
        return maxed, carry_out

    _, vjp = jax.vjp(xla_op, vals, carry)
    dv_ref, dc_ref = vjp((gm, gc))

    maxed, carry_out = sg._seg_max_pallas_impl(
        vals, carry, edges.vertex, edges.ends, cap, interpret=True
    )
    dv, dc, _, _ = sg._seg_max_fast_bwd(
        cap, (vals, edges.vertex, edges.ends, maxed), (gm, gc)
    )
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_ref), atol=1e-6)


def test_bench_shape_windows_cover_realistic_scan():
    # window sizing regression guard: on a realistically dense LiDAR scene
    # (scaled-down bench shapes), every neighbour table must be coverable so
    # the conv fast path engages (the cond fallback would silently cost 2x)
    from lattice_net_tpu.data.synth_kitti import make_scene
    from lattice_net_tpu.lattice import structure as st

    pos = jnp.asarray(make_scene(1 << 15, seed=0).V)
    caps = (1 << 14, 1 << 13, 1 << 11)
    h = st.build_hierarchy(pos, 0.6, 2, caps)
    tables = (
        [(h.neighbors_same[i], caps[i]) for i in range(3)]
        + [(h.neighbors_coarsen[i], caps[i]) for i in range(2)]
        + [(h.neighbors_finefy[i], caps[i + 1]) for i in range(2)]
    )
    for nbr, capn in tables:
        w = pk.window_width(capn, nbr.shape[0])
        _, _, ok, _ = pk._prepare(nbr, capn, w)
        assert bool(ok), f"table into cap {capn} not covered at w={w}"


def test_seg_max_fast_bwd_tie_rule_latest_edge():
    # Ties must route the cotangent to the LATEST winning edge per
    # (vertex, channel) — the same rule the forward kernel's carry follows.
    # Integer-valued floats force many exact ties; the oracle is a direct
    # numpy argmax-of-last implementation.
    from lattice_net_tpu.ops_tpu import segment as sg

    edges, cap = _edges_fixture()
    m = edges.vertex.shape[0]
    rng = np.random.default_rng(12)
    vals = jnp.asarray(rng.integers(-3, 4, size=(m, 8)).astype(np.float32))
    carry = jnp.asarray(rng.normal(size=(m,)).astype(np.float32))
    gm = jnp.asarray(rng.normal(size=(cap, 8)).astype(np.float32))
    gc = jnp.asarray(rng.normal(size=(cap, 8)).astype(np.float32))

    maxed, _ = sg._seg_max_pallas_impl(
        vals, carry, edges.vertex, edges.ends, cap, interpret=True
    )
    dv, dc, _, _ = sg._seg_max_fast_bwd(
        cap, (vals, edges.vertex, edges.ends, maxed), (gm, gc)
    )

    ids_np = np.asarray(edges.vertex)
    vals_np = np.asarray(vals)
    dv_ref = np.zeros_like(vals_np)
    dc_ref = np.zeros((m,), np.float32)
    for v in range(cap):
        rows = np.nonzero(ids_np == v)[0]
        if rows.size == 0:
            continue
        for c in range(8):
            col = vals_np[rows, c]
            win = rows[np.nonzero(col == col.max())[0][-1]]  # LATEST winner
            dv_ref[win, c] += np.asarray(gm)[v, c]
            dc_ref[win] += np.asarray(gc)[v, c]
    np.testing.assert_allclose(np.asarray(dv), dv_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dc), dc_ref, atol=1e-6)
