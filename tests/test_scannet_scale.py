"""ScanNet-scale capacity schedule guards (CPU; the full-scale on-chip run is
misc/scannet_scale_probe.py, logged in docs/runs/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lattice_net_tpu.lattice import structure as st


def test_capacity_schedule_at_scannet_scale():
    caps = st.default_capacity_schedule(5 * (1 << 20), 3)
    assert caps == (5242880, 2621440, 1310720, 655360)
    # every level must satisfy the Pallas tiling contract used by the
    # windowed kernels (cap % 256 == 0) and keep int32 indexing safe
    for c in caps:
        assert c % 256 == 0
        assert c * 9 < 2**31  # flat (cap, extent) scatter indices stay int32


def test_simplex_mode_guard_at_scannet_capacity():
    # at 5M capacity the packed (id0, rank) signature exceeds 31 bits: the
    # auto mode must fall back to resplat, and an explicit request must raise
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(128, 3)), jnp.float32)
    with pytest.raises(ValueError, match="simplex"):
        st.build_hierarchy(pts, 0.08, 1, (5242880, 2621440), coarse_mode="simplex")


def test_indoor_scene_generator_builds_cleanly():
    from lattice_net_tpu.lattice.ops import check_positions
    from lattice_net_tpu.misc.scannet_scale_probe import make_indoor_scene

    n = 20000
    V, C, L = make_indoor_scene(n, seed=1)
    assert V.shape == (n, 3) and C.shape == (n, 3) and L.shape == (n,)
    check_positions(V, sigma=0.08)
    h = st.build_hierarchy(jnp.asarray(V), 0.08, 2, (65536, 32768, 16384))
    occ = [int(s.nr_verts) for s in h.structures]
    ovf = [int(s.nr_overflow) for s in h.structures]
    assert sum(ovf) == 0
    # indoor surfaces at sigma 0.08 densely tile the lattice: expect a
    # healthy vertex count, not a degenerate handful
    assert occ[0] > 5000, occ


def test_capacity_schedule_from_occupancy():
    # the measured ScanNet-probe occupancy (docs/runs/scannet_probe_full.log)
    occ = [72340, 17930, 4430, 1088]
    caps = st.capacity_schedule_from_occupancy(occ, headroom=1.5)
    assert caps == (131072, 32768, 8192, 2048)
    # every level holds its occupancy with the requested slack, snapped pow2
    for c, o in zip(caps, occ):
        assert c >= 1.5 * o and c < 3 * 1.5 * o
    # vs the old halving schedule at the "provable" 2^21: 16-128x less padding
    old = st.default_capacity_schedule(1 << 21, 3)
    assert all(c <= o // 16 or o <= 2048 for c, o in zip(caps, old))
    assert st.capacity_schedule_from_occupancy([1], headroom=2.0) == (256,)
    assert st.capacity_schedule_from_occupancy([100000], snap_pow2=False) == (200192,)


def test_escalate_capacities():
    assert st.escalate_capacities((1024, 512), (0, 0)) == (1024, 512)
    assert st.escalate_capacities((1024, 512), (3, 0)) == (2048, 512)
    assert st.escalate_capacities((1024, 512), (1, 1)) == (2048, 1024)


def test_compact_hierarchy_matches_direct_small_build():
    import jax

    from lattice_net_tpu.models import LNN, ModelParams

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-2, 2, (4096, 3)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(4096, 1)).astype(np.float32))
    sigma = 0.3

    big = (1 << 15, 1 << 14, 1 << 13)
    h_big = st.build_hierarchy(pos, sigma, 2, big, point_feats=vals)
    occ = [int(s.nr_verts) for s in h_big.structures]
    small = st.capacity_schedule_from_occupancy(occ, headroom=1.5)
    assert all(s < b for s, b in zip(small, big))

    h_c = st.compact_hierarchy(h_big, small)
    h_s = st.build_hierarchy(pos, sigma, 2, small, point_feats=vals)
    assert [int(x.nr_overflow) for x in h_c.structures] == [0, 0, 0]

    # same tables, keys, maps — compaction is exact, not approximate
    for a, b in zip(h_c.structures, h_s.structures):
        assert a.capacity == b.capacity
        assert int(a.nr_verts) == int(b.nr_verts)
        np.testing.assert_array_equal(np.asarray(a.keys), np.asarray(b.keys))
    for a, b in zip(h_c.neighbors_same, h_s.neighbors_same):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(h_c.neighbors_coarsen, h_s.neighbors_coarsen):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(h_c.neighbors_finefy, h_s.neighbors_finefy):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(h_c.splat_idx), np.asarray(h_s.splat_idx))

    # and the full model forward agrees to float tolerance
    mp = ModelParams(
        nr_classes=5,
        pointnet_channels_per_layer=(8, 8),
        pointnet_start_nr_channels=8,
        nr_downsamples=2,
        nr_blocks_down_stage=(1, 1),
        nr_blocks_bottleneck=1,
        nr_blocks_up_stage=(1, 1),
        nr_levels_down_with_normal_resnet=2,
        nr_levels_up_with_normal_resnet=2,
    )
    model = LNN(mp)
    params = model.init(jax.random.PRNGKey(0), h_s, pos, vals)
    ref, _ = model.apply(params, h_s, pos, vals)
    got, _ = model.apply(params, h_c, pos, vals)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_compact_hierarchy_overflow_accounting():
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(-2, 2, (2048, 3)).astype(np.float32))
    h = st.build_hierarchy(pos, 0.25, 1, (1 << 14, 1 << 13))
    nv0 = int(h.structures[0].nr_verts)
    too_small = (1 << (nv0 - 1).bit_length() >> 1, 1 << 13)  # below occupancy
    h_c = st.compact_hierarchy(h, too_small)
    assert int(h_c.structures[0].nr_overflow) == nv0 - too_small[0]
    assert int(h_c.structures[0].nr_verts) == too_small[0]
    with pytest.raises(ValueError, match="shrink"):
        st.compact_hierarchy(h, (1 << 15, 1 << 13))


def test_escalate_capacities_exact_jump():
    # occupancy + overflow is the exact unique-key count: one escalation lands
    caps = st.escalate_capacities((8192, 8192), (52262, 0), (8192, 4000), 1.5)
    assert caps[1] == 8192
    assert caps[0] >= 1.5 * (8192 + 52262)
    assert caps[0] == 131072
