"""Lattice-sharded mode: exact agreement with a single-device run on a cloud
whose vertex count OVERFLOWS one shard's capacity (the scale scenario)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from lattice_net_tpu.lattice import ops as lops
from lattice_net_tpu.lattice.structure import build_neighbors_same_level, build_structure
from lattice_net_tpu.parallel.lattice_sharded import (
    make_sharded_splat_conv_slice,
    shard_points_host,
)


@pytest.mark.parametrize("nr_convs", [1, 2])
def test_sharded_matches_single_device(nr_convs):
    n_dev = 8
    devices = jax.devices()[:n_dev]
    assert len(devices) == n_dev, "tests run on the virtual 8-device CPU mesh"
    mesh = Mesh(np.asarray(devices), ("sp",))

    rng = np.random.default_rng(0)
    n, d, c_in, c_out = 4096, 3, 4, 4
    positions = rng.uniform(-3, 3, (n, d)).astype(np.float32)
    values = rng.normal(size=(n, c_in)).astype(np.float32)
    sigma = 0.1  # dense lattice: many vertices

    # reference: single device with ample capacity
    cap_full = 1 << 14
    s_full, vid, bary = build_structure(jnp.asarray(positions), sigma, cap_full)
    total_verts = int(s_full.nr_verts)
    cap_local = 1 << 13  # < total_verts (~15.8k): one shard cannot hold the cloud
    assert total_verts > cap_local, (
        f"test must overflow one shard: {total_verts} <= {cap_local}"
    )

    extent = 2 * (d + 1) + 1
    weights = tuple(
        jnp.asarray(rng.normal(size=(extent * c, c_out)).astype(np.float32) * 0.1)
        for c in ([c_in] + [c_out] * (nr_convs - 1))
    )

    lv = lops.splat(jnp.asarray(values), vid, bary, cap_full)
    nbr = build_neighbors_same_level(s_full)
    for w in weights:
        lv = lops.conv_im2row(lv, nbr, w, same_level=True)
    ref = np.asarray(lops.slice_lattice(lv, vid, bary))

    # sharded run: 8 shards x cap_local
    pos_s, val_s, mask_s, ids_s, bounds = shard_points_host(
        positions, values, sigma, n_dev
    )
    run = make_sharded_splat_conv_slice(
        mesh, sigma, cap_local, halo_budget=pos_s.shape[1], nr_convs=nr_convs
    )
    out_s, nv, ov = run(pos_s, val_s, mask_s, bounds, weights)
    out_s, nv, ov = np.asarray(out_s), np.asarray(nv), np.asarray(ov)

    assert int(ov.sum()) == 0, f"local overflow: {ov}"
    assert nv.max() <= cap_local
    # the shards together hold more vertices than one shard could
    assert nv.sum() > cap_local

    # stitch per-point outputs back to original order and compare
    got = np.zeros_like(ref)
    for i in range(n_dev):
        valid = ids_s[i] >= 0
        got[np.asarray(ids_s[i])[np.asarray(valid)]] = out_s[i][np.asarray(valid)]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
