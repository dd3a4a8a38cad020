"""End-to-end model tests: init, forward shapes, overfitting a toy cloud."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from lattice_net_tpu.data import make_toy_cloud
from lattice_net_tpu.lattice.structure import build_hierarchy
from lattice_net_tpu.losses import segmentation_loss
from lattice_net_tpu.models import LNN, ModelParams, prepare_cloud

SMALL = ModelParams(
    nr_classes=4,
    pointnet_channels_per_layer=(8, 8),
    pointnet_start_nr_channels=8,
    nr_downsamples=2,
    nr_blocks_down_stage=(1, 1),
    nr_blocks_bottleneck=1,
    nr_blocks_up_stage=(1, 1),
    nr_levels_down_with_normal_resnet=2,
    nr_levels_up_with_normal_resnet=2,
)
CAPS = (1024, 512, 256)
SIGMA = 0.2


@pytest.fixture(scope="module")
def toy():
    cloud = make_toy_cloud(n_points=600, nr_classes=4, seed=3)
    mp = SMALL
    positions, values, target = prepare_cloud(cloud, mp)
    h = build_hierarchy(jnp.asarray(positions), SIGMA, mp.nr_downsamples, CAPS)
    return h, jnp.asarray(positions), jnp.asarray(values), jnp.asarray(target)


def test_forward_shapes_and_grads(toy):
    h, pos, vals, target = toy
    model = LNN(SMALL)
    params = model.init(jax.random.PRNGKey(0), h, pos, vals)
    logp, logits = model.apply(params, h, pos, vals)
    assert logp.shape == (600, 4)
    assert bool(jnp.isfinite(logp).all())
    # log-softmax rows normalise
    np.testing.assert_allclose(np.asarray(jnp.exp(logp).sum(-1)), 1.0, atol=1e-4)

    def loss_fn(p):
        lp, _ = model.apply(p, h, pos, vals)
        return segmentation_loss(lp, target)

    g = jax.grad(loss_fn)(params)
    norms = jax.tree.map(lambda x: float(jnp.linalg.norm(x)), g)
    flat = jax.tree.leaves(norms)
    assert all(np.isfinite(flat)), "non-finite gradient"
    assert sum(v > 0 for v in flat) > len(flat) * 0.8, "too many dead gradients"


def test_overfit_toy_cloud(toy):
    h, pos, vals, target = toy
    model = LNN(SMALL)
    params = model.init(jax.random.PRNGKey(0), h, pos, vals)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            lp, _ = model.apply(p, h, pos, vals)
            return segmentation_loss(lp, target)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))

    assert losses[-1] < losses[0] * 0.6, f"no overfit: {losses[0]:.3f} -> {losses[-1]:.3f}"

    logp, _ = model.apply(params, h, pos, vals)
    acc = float((jnp.argmax(logp, -1) == target).mean())
    assert acc > 0.7, f"toy accuracy {acc}"


def test_model_batched_vmap(toy):
    h, pos, vals, target = toy
    model = LNN(SMALL)
    params = model.init(jax.random.PRNGKey(0), h, pos, vals)

    hb = jax.tree.map(lambda x: jnp.stack([x, x]), h)
    posb = jnp.stack([pos, pos])
    valsb = jnp.stack([vals, vals])
    logp, _ = jax.vmap(lambda hh, pp, vv: model.apply(params, hh, pp, vv))(hb, posb, valsb)
    assert logp.shape == (2, 600, 4)
    single, _ = model.apply(params, h, pos, vals)
    np.testing.assert_allclose(np.asarray(logp[0]), np.asarray(single), atol=2e-5)


def test_experiment_modes_run():
    """Reference ablation modes: slice_no_deform (live branch,
    lattice_modules.py:536) and pointnet_no_local_mean must both produce
    finite outputs that differ from the default model."""
    import jax
    import jax.numpy as jnp

    from lattice_net_tpu.lattice.structure import build_hierarchy
    from lattice_net_tpu.models import LNN, ModelParams

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-1, 1, (300, 3)), jnp.float32)
    vals = jnp.zeros((300, 1), jnp.float32)
    caps = (512, 256, 128)
    h = build_hierarchy(pos, 0.3, 2, caps)

    outs = {}
    for exp in ("none", "slice_no_deform", "pointnet_no_local_mean"):
        mp = ModelParams(
            nr_classes=4, pointnet_channels_per_layer=(8, 8),
            pointnet_start_nr_channels=8, nr_downsamples=2,
            nr_blocks_down_stage=(1, 1), nr_blocks_bottleneck=1,
            nr_blocks_up_stage=(1, 1), experiment=exp,
        )
        model = LNN(mp)
        params = model.init(jax.random.PRNGKey(0), h, pos, vals)
        logp, _ = model.apply(params, h, pos, vals)
        assert np.all(np.isfinite(np.asarray(logp))), exp
        outs[exp] = np.asarray(logp)

    assert not np.allclose(outs["none"], outs["slice_no_deform"])
    assert not np.allclose(outs["none"], outs["pointnet_no_local_mean"])


def test_remat_blocks_matches_plain():
    # remat_blocks=True must produce identical outputs and (to float
    # tolerance) identical grads — it only changes what the backward stores.
    import numpy as np
    from lattice_net_tpu.lattice.structure import build_hierarchy
    from lattice_net_tpu.models.lnn import LNN, ModelParams

    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.normal(size=(800, 3)).astype(np.float32) * 2)
    vals = jnp.asarray(rng.normal(size=(800, 1)).astype(np.float32))
    caps = (2048, 1024, 512)
    kw = dict(
        nr_classes=5,
        pointnet_channels_per_layer=(8, 16),
        pointnet_start_nr_channels=16,
        nr_downsamples=2,
        nr_blocks_down_stage=(1, 1),
        nr_blocks_bottleneck=1,
        nr_blocks_up_stage=(1, 1),
        nr_levels_down_with_normal_resnet=1,
        nr_levels_up_with_normal_resnet=1,
    )
    h = build_hierarchy(pos, 0.5, 2, caps, point_feats=vals)
    m0 = LNN(ModelParams(**kw))
    m1 = LNN(ModelParams(**kw, remat_blocks=True))
    params = m0.init(jax.random.PRNGKey(0), h, pos, vals)

    def loss(m, p):
        logp, _ = m.apply(p, h, pos, vals)
        return jnp.sum(logp[:, 1])

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dropout", [0.0, 0.3])
def test_head_preclassify_matches_gather_order(monkeypatch, dropout):
    # LNT_HEAD_PRECLASSIFY moves the linear classifier BEFORE the head's row
    # gather (classify the table, slice logits) — exact linear algebra, so
    # outputs and grads must match the gather-then-classify order to float
    # tolerance, including under channel dropout (same rng stream).
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.normal(size=(700, 3)).astype(np.float32) * 2)
    vals = jnp.asarray(rng.normal(size=(700, 1)).astype(np.float32))
    caps = (2048, 1024, 512)
    mp = ModelParams(
        nr_classes=5,
        pointnet_channels_per_layer=(8, 16),
        pointnet_start_nr_channels=16,
        nr_downsamples=2,
        nr_blocks_down_stage=(1, 1),
        nr_blocks_bottleneck=1,
        nr_blocks_up_stage=(1, 1),
        nr_levels_down_with_normal_resnet=1,
        nr_levels_up_with_normal_resnet=1,
        dropout_last_layer=dropout,
    )
    h = build_hierarchy(pos, 0.5, 2, caps, point_feats=vals)
    model = LNN(mp)
    params = model.init(jax.random.PRNGKey(0), h, pos, vals)
    droprng = {"dropout": jax.random.PRNGKey(9)}

    def loss(p):
        logp, _ = model.apply(
            p, h, pos, vals, deterministic=False, rngs=droprng
        )
        return jnp.sum(logp[:, 1]), logp

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("LNT_HEAD_PRECLASSIFY", flag)
        (l, logp), g = jax.value_and_grad(loss, has_aux=True)(params)
        outs[flag] = (l, logp, g)
    np.testing.assert_allclose(
        np.asarray(outs["1"][1]), np.asarray(outs["0"][1]), rtol=1e-5, atol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(outs["1"][2]),
        jax.tree_util.tree_leaves(outs["0"][2]),
    ):
        # the two orders are algebraically equal but sum in different f32
        # orders; isolated grad elements with cancellation land at ~1e-3 rel
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
