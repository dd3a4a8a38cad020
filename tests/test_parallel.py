"""Data-parallel training on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from lattice_net_tpu.data import make_toy_cloud
from lattice_net_tpu.models import LNN, ModelParams, prepare_cloud
from lattice_net_tpu.parallel import (
    TrainState,
    make_batch,
    make_dp_train_step,
    make_train_step,
)
from lattice_net_tpu.parallel.data_parallel import replicate_state, shard_batch
from lattice_net_tpu.train import make_optimizer

MP = ModelParams(
    nr_classes=4,
    pointnet_channels_per_layer=(8, 8),
    pointnet_start_nr_channels=8,
    nr_downsamples=1,
    nr_blocks_down_stage=(1,),
    nr_blocks_bottleneck=1,
    nr_blocks_up_stage=(1,),
    nr_levels_down_with_normal_resnet=1,
    nr_levels_up_with_normal_resnet=1,
)
CAPS = (512, 256)
SIGMA = 0.25
N_POINTS = 256


def _batch(b):
    clouds = []
    for i in range(b):
        c = make_toy_cloud(n_points=200 + 10 * i, nr_classes=4, seed=i)
        clouds.append(prepare_cloud(c, MP))
    return make_batch(clouds, MP, N_POINTS)


def _init_state(tx):
    from lattice_net_tpu.lattice.structure import build_hierarchy

    batch = _batch(1)
    h = build_hierarchy(batch["positions"][0], SIGMA, 1, CAPS, point_mask=batch["point_mask"][0])
    model = LNN(MP)
    params = model.init(
        jax.random.PRNGKey(0), h, batch["positions"][0], batch["values"][0]
    )
    return model, TrainState.create(params, tx)


def test_single_device_step_runs():
    tx = make_optimizer(1e-3)
    model, state = _init_state(tx)
    step = jax.jit(make_train_step(model, tx, SIGMA, 1, CAPS))
    batch = _batch(2)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["nr_verts_mean"]) > 0


@pytest.mark.slow
def test_dp_matches_single_device():
    devices = jax.devices()
    assert len(devices) == 8, "conftest should provide 8 virtual cpu devices"
    mesh = Mesh(np.array(devices), ("dp",))

    tx = make_optimizer(1e-3)
    model, state = _init_state(tx)
    batch = _batch(8)
    rng = jax.random.PRNGKey(1)

    dp_step = make_dp_train_step(model, tx, mesh, SIGMA, 1, CAPS)
    state_dp = replicate_state(state, mesh)
    batch_dp = shard_batch(batch, mesh)
    state_dp2, metrics_dp = dp_step(state_dp, batch_dp, rng)

    # reference: single-device step over the same full batch (grads average
    # over clouds = average of per-device averages since shards are equal size)
    single = jax.jit(make_train_step(model, tx, SIGMA, 1, CAPS))

    # dropout rngs differ between paths, but the model has no dropout here
    state_s2, metrics_s = single(state, batch, rng)

    np.testing.assert_allclose(
        float(metrics_dp["loss"]), float(metrics_s["loss"]), rtol=2e-5
    )
    a = jax.tree.leaves(state_dp2.params)
    b = jax.tree.leaves(state_s2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_dp_state_stays_in_sync():
    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("dp",))
    tx = make_optimizer(1e-3)
    model, state = _init_state(tx)
    dp_step = make_dp_train_step(model, tx, mesh, SIGMA, 1, CAPS)
    state = replicate_state(state, mesh)
    batch = shard_batch(_batch(8), mesh)
    rng = jax.random.PRNGKey(2)
    for i in range(3):
        state, metrics = dp_step(state, batch, jax.random.fold_in(rng, i))
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["loss"]))


def test_b1_vmap_bypass_matches_vmap():
    """A batch of one cloud bypasses vmap (production shape); loss, metrics
    and grads must match the vmapped lowering exactly (same rng slot)."""
    from lattice_net_tpu.parallel import make_loss_fn

    tx = make_optimizer(1e-3)
    model, state = _init_state(tx)
    batch = _batch(1)
    key = jax.random.PRNGKey(3)
    lf_v = make_loss_fn(model, SIGMA, 1, CAPS, force_vmap=True)
    lf_s = make_loss_fn(model, SIGMA, 1, CAPS)
    (lv, mv), gv = jax.value_and_grad(lf_v, has_aux=True)(state.params, batch, key)
    (ls, ms), gs = jax.value_and_grad(lf_s, has_aux=True)(state.params, batch, key)
    np.testing.assert_allclose(float(lv), float(ls), rtol=1e-6)
    for k in mv:
        np.testing.assert_allclose(
            np.asarray(mv[k]), np.asarray(ms[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
    for a, b in zip(jax.tree_util.tree_leaves(gv), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_full_mask_build_matches_masked():
    """full_mask=True (mask-free build; loader guarantees no padding) must
    produce identical loss, metrics, and grads to the masked build on an
    all-true-mask batch — the build paths differ (sort-based vs scatter
    inverse maps) but are bit-compatible."""
    from lattice_net_tpu.parallel import make_loss_fn

    tx = make_optimizer(1e-3)
    model, state = _init_state(tx)
    # a cloud at EXACTLY the static budget: no padding, all-true mask
    c = make_toy_cloud(n_points=N_POINTS, nr_classes=4, seed=9)
    batch = make_batch([prepare_cloud(c, MP)], MP, N_POINTS)
    assert bool(np.all(np.asarray(batch["point_mask"])))
    key = jax.random.PRNGKey(4)
    lf_m = make_loss_fn(model, SIGMA, 1, CAPS)
    lf_f = make_loss_fn(model, SIGMA, 1, CAPS, full_mask=True)
    (lm, mm), gm = jax.value_and_grad(lf_m, has_aux=True)(state.params, batch, key)
    (lf, mf), gf = jax.value_and_grad(lf_f, has_aux=True)(state.params, batch, key)
    np.testing.assert_allclose(float(lm), float(lf), rtol=1e-6)
    for k in mm:
        np.testing.assert_allclose(
            np.asarray(mm[k]), np.asarray(mf[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
    for a, b in zip(jax.tree_util.tree_leaves(gm), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
