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
