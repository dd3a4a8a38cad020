"""TPU-optimised op paths (Pallas gather, sort+scan segment-sum) vs references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lattice_net_tpu.lattice import ops as lops
from lattice_net_tpu.ops_tpu import gather as g


def test_pallas_gather_interpret_matches_reference(rng):
    cap, c, m = 512, 32, 2000
    vals = jnp.asarray(rng.normal(size=(cap, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, cap + 1, size=(m,)).astype(np.int32))
    out = g._take_rows_impl(vals, idx, interpret=True)
    ref = g.take_rows_reference(vals, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_gather_nonmultiple_chunk(rng):
    # m not a multiple of cap exercises the padding path
    cap, c, m = 256, 8, 777
    vals = jnp.asarray(rng.normal(size=(cap, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, cap, size=(m,)).astype(np.int32))
    out = g._take_rows_impl(vals, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(vals)[np.asarray(idx)])


def test_sorted_segment_sum_matches_scatter(rng):
    cap, c, m = 300, 16, 5000
    upd = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, cap, size=(m,)).astype(np.int32))
    got = g._sorted_segment_sum(idx, upd, cap)
    want = jnp.zeros((cap, c)).at[idx].add(upd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_sorted_segment_sum_empty_and_single_segments(rng):
    cap = 16
    upd = jnp.ones((4, 2), jnp.float32)
    idx = jnp.asarray([3, 3, 3, 9], jnp.int32)  # most segments empty
    got = np.asarray(g._sorted_segment_sum(idx, upd, cap))
    want = np.zeros((cap, 2), np.float32)
    want[3] = 3.0
    want[9] = 1.0
    np.testing.assert_allclose(got, want)


def test_segment_sum_fast_path_drops_invalid(rng, monkeypatch):
    monkeypatch.setenv("LNT_FAST_OPS", "1")
    cap, c, m = 64, 4, 500
    upd = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    idx = np.asarray(rng.integers(0, cap + 1, size=(m,)), np.int32)  # cap = invalid
    got = lops.segment_sum(upd, jnp.asarray(idx), cap)
    monkeypatch.setenv("LNT_FAST_OPS", "0")
    want = lops.segment_sum(upd, jnp.asarray(idx), cap)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_take_rows_vjp_matches_take(rng):
    cap, c, m = 128, 8, 700
    vals = jnp.asarray(rng.normal(size=(cap, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, cap, size=(m,)).astype(np.int32))
    g1 = jax.grad(lambda v: jnp.sum(g.take_rows(v, idx) ** 2))(vals)
    g2 = jax.grad(lambda v: jnp.sum(jnp.take(v, idx, axis=0) ** 2))(vals)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


def test_model_same_outputs_fast_vs_slow(rng, monkeypatch):
    """End-to-end: the fast op routing must not change model outputs."""
    from lattice_net_tpu.data import make_toy_cloud
    from lattice_net_tpu.lattice.structure import build_hierarchy
    from lattice_net_tpu.models import LNN, ModelParams, prepare_cloud

    mp = ModelParams(
        nr_classes=4,
        pointnet_channels_per_layer=(8,),
        pointnet_start_nr_channels=8,
        nr_downsamples=1,
        nr_blocks_down_stage=(1,),
        nr_blocks_bottleneck=1,
        nr_blocks_up_stage=(1,),
    )
    cloud = make_toy_cloud(300, 4, seed=1)
    pos, vals, tgt = map(jnp.asarray, prepare_cloud(cloud, mp))
    h = build_hierarchy(pos, 0.25, 1, (512, 256))
    model = LNN(mp)
    params = model.init(jax.random.PRNGKey(0), h, pos, vals)

    monkeypatch.setenv("LNT_FAST_OPS", "0")
    slow, _ = model.apply(params, h, pos, vals)
    # routing alone (f32 pinned) must be numerically tight
    monkeypatch.setenv("LNT_FAST_OPS", "1")
    monkeypatch.setenv("LNT_CONV_DTYPE", "f32")
    fast, _ = model.apply(params, h, pos, vals)
    np.testing.assert_allclose(np.asarray(slow), np.asarray(fast), atol=2e-4)
    # the default TPU precision policy (bf16 convs + head gathers) stays
    # within bf16 tolerance of the f32 reference
    monkeypatch.setenv("LNT_CONV_DTYPE", "bf16")
    fast16, _ = model.apply(params, h, pos, vals)
    np.testing.assert_allclose(np.asarray(slow), np.asarray(fast16), atol=8e-2)
