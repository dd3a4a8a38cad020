"""Equivalence tests: sorted-edge segment ops and scatter-derived neighbor
tables must match the round-1 reference implementations exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lattice_net_tpu.lattice import ops
from lattice_net_tpu.lattice.structure import (
    build_hierarchy,
    build_structure,
    build_neighbors_fine_from_coarse,
    finefy_from_coarsen_transpose,
    _axis_moves_np,
    _interleave_neighbors,
)


@pytest.fixture(scope="module")
def hier():
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(-2, 2, (600, 3)), jnp.float32)
    mask = jnp.asarray(np.arange(600) < 550)
    h = build_hierarchy(pos, 0.25, 2, (1024, 512, 256), point_mask=mask)
    return pos, mask, h


def _legacy_same_level(structure):
    """Round-1 builder: one lookup per +/- move (the oracle)."""
    d = structure.pos_dim
    moves = jnp.asarray(_axis_moves_np(d))
    keys = structure.keys
    idx_p = structure.lookup(keys[:, None, :] + moves[None])
    idx_m = structure.lookup(keys[:, None, :] - moves[None])
    nbr = _interleave_neighbors(idx_p, idx_m)
    occ = structure.occupancy_mask()[:, None]
    return jnp.where(occ, nbr, structure.capacity)


def test_symmetric_same_level_matches_direct_lookup(hier):
    _, _, h = hier
    for lvl, s in enumerate(h.structures):
        direct = np.asarray(_legacy_same_level(s))
        new = np.asarray(h.neighbors_same[lvl])
        np.testing.assert_array_equal(new, direct, err_msg=f"level {lvl}")


def test_finefy_transpose_matches_direct_lookup(hier):
    _, _, h = hier
    for i in range(2):
        direct = np.asarray(
            build_neighbors_fine_from_coarse(h.structures[i], h.structures[i + 1])
        )
        via_t = np.asarray(
            finefy_from_coarsen_transpose(
                h.neighbors_coarsen[i], h.structures[i].capacity, h.structures[i + 1].capacity
            )
        )
        np.testing.assert_array_equal(via_t, direct, err_msg=f"pair {i}")


def test_edges_consistent_with_splat_idx(hier):
    _, _, h = hier
    e = h.edges
    m = e.perm.shape[0]
    cap = h.structures[0].capacity
    # perm is defined on VALID edges only (the folded key+payload sort drops
    # sentinel payloads); valid entries rebuild the per-point splat ids
    valid = np.asarray(e.vertex) < cap
    vid_orig = np.full(m, cap, np.int32)
    vid_orig[np.asarray(e.perm)[valid]] = np.asarray(e.vertex)[valid]
    np.testing.assert_array_equal(vid_orig.reshape(-1, 4), np.asarray(h.splat_idx))
    # the build no longer materialises per-edge weights (e.weights is None);
    # distribute_sorted reconstructs them from splat_weights + perm
    # vertex ids nondecreasing in sorted order
    v = np.asarray(e.vertex)
    assert np.all(np.diff(v) >= 0)


def test_seg_sum_sorted_matches_segment_sum(hier):
    _, _, h = hier
    e = h.edges
    cap = h.structures[0].capacity
    m = e.perm.shape[0]
    rng = np.random.default_rng(1)
    vals_orig = jnp.asarray(rng.normal(size=(m, 5)), jnp.float32)
    ref = ops.segment_sum(vals_orig, h.splat_idx.reshape(-1), cap)
    got = ops.seg_sum_sorted(jnp.take(vals_orig, e.perm, axis=0), e, cap)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_seg_counts_and_mean_sorted(hier):
    _, _, h = hier
    e = h.edges
    cap = h.structures[0].capacity
    m = e.perm.shape[0]
    ids = h.splat_idx.reshape(-1)
    ones = jnp.ones((m, 1), jnp.float32)
    ref_counts = np.asarray(ops.segment_sum(ones, ids, cap))[:, 0]
    got_counts = np.asarray(ops.seg_counts_sorted(e, cap))
    np.testing.assert_array_equal(got_counts, ref_counts.astype(np.int32))

    rng = np.random.default_rng(2)
    vals = jnp.asarray(rng.normal(size=(m, 3)), jnp.float32)
    ref_mean = ops.segment_mean(vals, ids, cap)
    got_mean = ops.seg_mean_sorted(jnp.take(vals, e.perm, axis=0), e, cap)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(ref_mean), rtol=1e-4, atol=1e-5)


def test_seg_max_sorted_matches_segment_max(hier):
    _, _, h = hier
    e = h.edges
    cap = h.structures[0].capacity
    m = e.perm.shape[0]
    rng = np.random.default_rng(3)
    # distinct values -> unique winners -> carry comparison is well-defined
    vals = jnp.asarray(rng.permutation(m * 4).reshape(m, 4).astype(np.float32))
    carry = jnp.asarray(rng.normal(size=(m,)), jnp.float32)
    ids = h.splat_idx.reshape(-1)

    ref_max, ref_argsrc = ops.segment_max_with_src(vals, ids, cap)
    got_max, got_carry = ops.seg_max_sorted(
        jnp.take(vals, e.perm, axis=0), jnp.take(carry, e.perm, axis=0), e, cap
    )
    np.testing.assert_allclose(np.asarray(got_max), np.asarray(ref_max), rtol=1e-6)

    ref_carry = np.where(
        np.asarray(ref_argsrc) < m, np.asarray(carry)[np.minimum(np.asarray(ref_argsrc), m - 1)], 0.0
    )
    np.testing.assert_allclose(np.asarray(got_carry), ref_carry, rtol=1e-6)


def test_distribute_sorted_matches_distribute(hier):
    pos, mask, h = hier
    cap = h.structures[0].capacity
    rng = np.random.default_rng(4)
    values = jnp.asarray(rng.normal(size=(600, 2)), jnp.float32)

    ref_rows, ref_ids = ops.distribute(
        pos, values, h.splat_idx, h.splat_weights, cap, point_mask=mask
    )
    got_rows, got_ids = ops.distribute_sorted(pos, values, h.edges, cap, splat_weights=h.splat_weights)

    perm = np.asarray(h.edges.perm)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(ref_ids)[perm])
    # atol covers accumulation-order noise: the local mean is a cumsum here vs
    # a scatter-add in the reference path, so near-zero centred coords differ
    # at the 1e-4 level in f32
    np.testing.assert_allclose(
        np.asarray(got_rows), np.asarray(ref_rows)[perm], rtol=1e-3, atol=2e-4
    )


def test_seg_sum_sorted_gradients(hier):
    _, _, h = hier
    e = h.edges
    cap = h.structures[0].capacity
    m = e.perm.shape[0]
    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.normal(size=(m, 2)), jnp.float32)

    def f(v):
        return jnp.sum(ops.seg_sum_sorted(v, e, cap) ** 2)

    def f_ref(v):
        # invert perm over valid edges only (see test_edges_consistent_...)
        valid = np.asarray(e.vertex) < cap
        inv = np.zeros(m, np.int64)
        inv[np.asarray(e.perm)[valid]] = np.nonzero(valid)[0]
        return jnp.sum(ops.segment_sum(v[inv], h.splat_idx.reshape(-1), cap) ** 2)

    g = jax.grad(f)(vals)
    g_ref = jax.grad(f_ref)(vals)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_merge_lookup_matches_binary_lookup(hier):
    _, _, h = hier
    rng = np.random.default_rng(9)
    for s in h.structures:
        # mix of real keys, shifted keys (mostly misses) and random garbage
        real = s.keys[: s.capacity // 2]
        shifted = real + jnp.asarray(rng.integers(-2, 3, real.shape), jnp.int32)
        garbage = jnp.asarray(rng.integers(-50, 50, (200, 3)), jnp.int32)
        allq = jnp.concatenate([real, shifted, garbage])
        q = allq[: (allq.shape[0] // 7) * 7].reshape(-1, 7, 3)  # odd batch shape
        np.testing.assert_array_equal(
            np.asarray(s.merge_lookup(q)), np.asarray(s.lookup(q)), err_msg=f"lvl {s.lvl}"
        )


def test_coarse_from_vertices_covers_reference_patches():
    """The default path must match the reference strategy exactly; the
    opt-in vertex-proxy build is a documented approximation — quantify its
    gap (reachable coarse vertices it misses) and keep it bounded."""
    from lattice_net_tpu.lattice.structure import build_hierarchy, build_structure

    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.uniform(-2, 2, (800, 3)), jnp.float32)
    sigma = 0.2

    h_proxy = build_hierarchy(pos, sigma, 1, (2048, 1024), coarse_from_vertices=True)
    # resplat mode is the bit-exact reference-parity path (the default
    # simplex mode matches it up to elevation rounding; tested separately)
    h_ref = build_hierarchy(pos, sigma, 1, (2048, 1024), coarse_mode="resplat")

    # parity mode == direct re-splat of positions at 2 sigma
    s_direct, _, _ = build_structure(pos, sigma * 2, 1024, lvl=1)
    np.testing.assert_array_equal(
        np.asarray(h_ref.structures[1].keys), np.asarray(s_direct.keys)
    )

    ref_coarse = h_ref.structures[1]
    nbr_ref = np.asarray(h_ref.neighbors_coarsen[0])  # into the fine table
    cap_fine = h_ref.structures[0].capacity
    nr_ref = int(ref_coarse.nr_verts)
    has_input = (nbr_ref[:nr_ref] < cap_fine).any(axis=1)

    proxy_keys = {
        tuple(k) for k in np.asarray(h_proxy.structures[1].keys)[: int(h_proxy.structures[1].nr_verts)]
    }
    ref_keys = np.asarray(ref_coarse.keys)[:nr_ref]
    missing = [
        tuple(k) for k, need in zip(ref_keys, has_input) if need and tuple(k) not in proxy_keys
    ]
    frac = len(missing) / max(int(has_input.sum()), 1)
    assert frac < 0.15, f"proxy build missing {frac:.1%} of reachable coarse vertices"


def test_conv_chunked_matches_unchunked(hier, monkeypatch):
    # the row-chunked conv (ScanNet-scale HBM guard) must agree exactly with
    # the one-GEMM path, forward and both gradients, same- and cross-level
    rng = np.random.default_rng(13)
    pos, mask, h = hier
    s0, s1 = h.structures[0], h.structures[1]
    cap0, cap1 = s0.capacity, s1.capacity
    c_in, c_out = 6, 5

    nbr = h.neighbors_same[0]
    ctab, ftab = h.neighbors_coarsen[0], h.neighbors_finefy[0]
    extent = nbr.shape[1] + 1
    v = jnp.asarray(rng.normal(size=(cap0, c_in)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(extent * c_in, c_out)).astype(np.float32) * 0.1)
    wx = jnp.asarray(rng.normal(size=(ctab.shape[1] * c_in, c_out)).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.normal(size=(cap0, c_out)).astype(np.float32))
    cot_c = jnp.asarray(rng.normal(size=(cap1, c_out)).astype(np.float32))

    def loss_same(v, w):
        return jnp.sum(ops.conv_im2row(v, nbr, w, same_level=True) * cot)

    def loss_cross(v, w):
        return jnp.sum(ops.conv_im2row(v, ctab, w, False, neighbors_t=ftab) * cot_c)

    outs_ref = [
        ops.conv_im2row(v, nbr, w, same_level=True),
        ops.conv_im2row(v, ctab, wx, False, neighbors_t=ftab),
        *jax.grad(loss_same, argnums=(0, 1))(v, w),
        *jax.grad(loss_cross, argnums=(0, 1))(v, wx),
    ]

    # budget of a quarter patch -> nb=4 blocks on both levels
    monkeypatch.setenv("LNT_CONV_CHUNK_BYTES", str(cap1 * extent * c_in * 4 // 4))
    assert ops._conv_row_blocks(cap0, extent, c_in, 4) > 1
    outs_chunk = [
        ops.conv_im2row(v, nbr, w, same_level=True),
        ops.conv_im2row(v, ctab, wx, False, neighbors_t=ftab),
        *jax.grad(loss_same, argnums=(0, 1))(v, w),
        *jax.grad(loss_cross, argnums=(0, 1))(v, wx),
    ]
    for a, b in zip(outs_ref, outs_chunk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_conv_flip_vjp_matches_ad(hier):
    # the flip-neighbours adjoint conv must produce exactly the gradients of
    # plain AD (whose adjoint is a scatter-add) for both same-level and
    # cross-level (paired coarsen/finefy table) convolutions
    rng = np.random.default_rng(11)
    pos, mask, h = hier
    s0, s1 = h.structures[0], h.structures[1]
    cap0, cap1 = s0.capacity, s1.capacity
    c_in, c_out = 6, 5

    # same-level
    nbr = h.neighbors_same[0]
    extent = nbr.shape[1] + 1
    v = jnp.asarray(rng.normal(size=(cap0, c_in)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(extent * c_in, c_out)).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.normal(size=(cap0, c_out)).astype(np.float32))

    def loss_flip(v, w):
        return jnp.sum(ops.conv_im2row(v, nbr, w, same_level=True) * cot)

    def loss_ref(v, w):
        return jnp.sum(ops._conv_fwd_impl(v, nbr, w, same_level=True) * cot)

    gv_f, gw_f = jax.grad(loss_flip, argnums=(0, 1))(v, w)
    gv_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(v, w)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), rtol=1e-4, atol=1e-5)

    # cross-level: coarsen conv (values on fine, out on coarse) with the
    # finefy table as the paired transpose, and the mirrored finefy conv
    ctab, ftab = h.neighbors_coarsen[0], h.neighbors_finefy[0]
    extent_x = ctab.shape[1]
    wx = jnp.asarray(rng.normal(size=(extent_x * c_in, c_out)).astype(np.float32) * 0.1)
    cot_c = jnp.asarray(rng.normal(size=(cap1, c_out)).astype(np.float32))

    def loss_flip_x(v, w):
        return jnp.sum(ops.conv_im2row(v, ctab, w, False, neighbors_t=ftab) * cot_c)

    def loss_ref_x(v, w):
        return jnp.sum(ops._conv_fwd_impl(v, ctab, w, False) * cot_c)

    gv_f, gw_f = jax.grad(loss_flip_x, argnums=(0, 1))(v, wx)
    gv_r, gw_r = jax.grad(loss_ref_x, argnums=(0, 1))(v, wx)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), rtol=1e-4, atol=1e-5)

    vc = jnp.asarray(rng.normal(size=(cap1, c_in)).astype(np.float32))
    cot_f = jnp.asarray(rng.normal(size=(cap0, c_out)).astype(np.float32))

    def loss_flip_y(v, w):
        return jnp.sum(ops.conv_im2row(v, ftab, w, False, neighbors_t=ctab) * cot_f)

    def loss_ref_y(v, w):
        return jnp.sum(ops._conv_fwd_impl(v, ftab, w, False) * cot_f)

    gv_f, gw_f = jax.grad(loss_flip_y, argnums=(0, 1))(vc, wx)
    gv_r, gw_r = jax.grad(loss_ref_y, argnums=(0, 1))(vc, wx)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), rtol=1e-4, atol=1e-5)


def test_conv_chunked_nondivisible_rows(monkeypatch):
    # capacities with a large prime factor must not degenerate to one-row
    # blocks: the chunked path pads to equal blocks and slices the output
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    cap, cq, k, c_in, c_out = 512, 509, 8, 4, 3  # cq prime
    values = jnp.asarray(rng.normal(size=(cap, c_in)).astype(np.float32))
    neighbors = jnp.asarray(
        np.sort(rng.integers(0, cap + 1, (cq, k)).astype(np.int32), axis=0)
    )
    w = jnp.asarray(rng.normal(size=(k * c_in, c_out)).astype(np.float32) * 0.1)

    ref = ops.conv_im2row(values, neighbors, w, same_level=False)
    monkeypatch.setenv("LNT_CONV_CHUNK_BYTES", str(cq * k * c_in * 4 // 7))
    nb = ops._conv_row_blocks(cq, k, c_in, 4)
    assert 1 < nb < 32, nb  # bounded block count, not cq one-row blocks
    out = ops.conv_im2row(values, neighbors, w, same_level=False)
    assert out.shape == (cq, c_out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_conv_flip_bwd_chunked_nondivisible_rows(monkeypatch):
    # the flip-VJP's chunked d_weight recompute must pad rows to equal
    # blocks exactly like the forward (regression: b = cq // nb reshape
    # crash at 2^21 capacity with nb = 5, hit by
    # scannet_scale_probe --train-step on chip)
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    cap, k, c_in, c_out = 509, 8, 4, 3  # prime same-level capacity
    values = jnp.asarray(rng.normal(size=(cap, c_in)).astype(np.float32))
    neighbors = jnp.asarray(
        np.sort(rng.integers(0, cap + 1, (cap, k)).astype(np.int32), axis=0)
    )
    w = jnp.asarray(rng.normal(size=((k + 1) * c_in, c_out)).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.normal(size=(cap, c_out)).astype(np.float32))

    def loss(v, w):
        return jnp.sum(ops.conv_im2row(v, neighbors, w, same_level=True) * cot)

    # flip path engages (same-level tables are their own transpose); compare
    # the chunked flip backward against the unchunked flip backward
    gv_ref, gw_ref = jax.grad(loss, argnums=(0, 1))(values, w)
    monkeypatch.setenv("LNT_CONV_CHUNK_BYTES", str(cap * (k + 1) * c_in * 4 // 7))
    assert ops._conv_row_blocks(cap, k + 1, c_in, 4) > 1
    gv, gw = jax.grad(loss, argnums=(0, 1))(values, w)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref), rtol=1e-5, atol=1e-5)
    # d_weight is a sum over row blocks -> f32 accumulation order differs
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=1e-4, atol=1e-4)


def test_merge_lookup_invperm_sort_identical(hier, monkeypatch):
    # LNT_INVPERM_SORT=1 replaces merge_lookup's inverse-permutation scatter
    # with a 2-op sort; results must be bit-identical for hits AND misses.
    from lattice_net_tpu.lattice import structure as st

    _, _, h = hier
    rng = np.random.default_rng(11)
    s = h.structures[0]
    real = s.keys[: s.capacity // 2]
    shifted = real + jnp.asarray(rng.integers(-2, 3, real.shape), jnp.int32)
    q = jnp.concatenate([real, shifted])
    monkeypatch.setattr(st, "_INVPERM_SORT", False)
    a = np.asarray(s.merge_lookup(q))
    monkeypatch.setattr(st, "_INVPERM_SORT", True)
    b = np.asarray(s.merge_lookup(q))
    np.testing.assert_array_equal(a, b)


def test_carried_feats_distribute_identical(monkeypatch):
    # LNT_CARRY_FEATS=1: the L0 sort carries [pos, values, bary] as payload
    # operands; distribute_sorted must produce bit-identical rows/ids to the
    # gather path, and grads w.r.t. values must match.
    from lattice_net_tpu.lattice import structure as st

    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.normal(size=(600, 3)).astype(np.float32) * 2.0)
    vals = jnp.asarray(rng.normal(size=(600, 2)).astype(np.float32))
    cap = 4096

    def _rows(carry, v):
        monkeypatch.setattr(st, "_CARRY_FEATS", carry)
        h = st.build_hierarchy(pos, 0.5, 1, (cap, cap // 2), point_feats=v)
        assert (h.edges.rows is not None) == carry
        rows, ids = ops.distribute_sorted(
            pos, v, h.edges, cap, splat_weights=h.splat_weights
        )
        return rows, ids

    r0, i0 = _rows(False, vals)
    r1, i1 = _rows(True, vals)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), rtol=0, atol=0)

    g0 = jax.grad(lambda v: jnp.sum(_rows(False, v)[0] ** 2))(vals)
    g1 = jax.grad(lambda v: jnp.sum(_rows(True, v)[0] ** 2))(vals)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-6, atol=1e-6)

    # masked build: carried rows must also work (masked edges zeroed)
    mask = jnp.asarray(rng.random(600) > 0.25)
    monkeypatch.setattr(st, "_CARRY_FEATS", True)
    hm1 = st.build_hierarchy(pos, 0.5, 1, (cap, cap // 2), point_mask=mask, point_feats=vals)
    rm1, im1 = ops.distribute_sorted(pos, vals, hm1.edges, cap, splat_weights=hm1.splat_weights)
    monkeypatch.setattr(st, "_CARRY_FEATS", False)
    hm0 = st.build_hierarchy(pos, 0.5, 1, (cap, cap // 2), point_mask=mask, point_feats=vals)
    rm0, im0 = ops.distribute_sorted(pos, vals, hm0.edges, cap, splat_weights=hm0.splat_weights)
    np.testing.assert_array_equal(np.asarray(im0), np.asarray(im1))
    np.testing.assert_allclose(np.asarray(rm0), np.asarray(rm1), rtol=0, atol=0)
