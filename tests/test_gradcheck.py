"""Finite-difference gradient checks of every lattice op (float64, CPU)."""

from lattice_net_tpu.misc.lnn_grad_check import run_all


def test_all_op_gradients():
    results = run_all(verbose=False)
    assert len(results) >= 9


def test_head_gather_segbwd_matches_scatter_adjoint():
    """The opt-in edge-sort adjoint (LNT_HEAD_SEGVJP=1) must stay bit-exact
    against AD's scatter-add for the head's fused row gather, on both the
    mask-free and masked build paths (measured A/B numbers in the
    gather_rows_clustered_segbwd docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lattice_net_tpu.lattice import ops as lops
    from lattice_net_tpu.lattice.structure import build_hierarchy

    rng = np.random.default_rng(0)
    n, cap, c = 1024, 1024, 12
    pos = jnp.asarray(rng.uniform(-10, 10, (n, 3)).astype(np.float32))
    for mask in (None, jnp.asarray(np.arange(n) < n - 100)):
        h = build_hierarchy(pos, 0.7, 1, (cap, cap // 2), point_mask=mask)
        s0 = h.structures[0]
        vals = jnp.asarray(rng.normal(size=(cap, c)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(n, pos.shape[1] + 1, c)).astype(np.float32))

        def loss_plain(v):
            return jnp.vdot(lops.gather_rows_clustered(v, h.splat_idx), ct)

        def loss_seg(v):
            return jnp.vdot(
                lops.gather_rows_clustered_segbwd(v, h.splat_idx, h.edges), ct
            )

        g_plain = jax.grad(loss_plain)(vals)
        g_seg = jax.grad(loss_seg)(vals)
        assert jnp.array_equal(g_plain, g_seg), (
            float(jnp.max(jnp.abs(g_plain - g_seg)))
        )
