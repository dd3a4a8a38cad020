"""Finite-difference gradient checks per lattice op.

Port of the reference's verification strategy (``misc/lnn_grad_check.py`` +
``misc/gradcheck_custom.py``): build a tiny lattice from a toy cloud, then
compare analytic (AD) Jacobian-vector products against central finite
differences for every differentiable lattice op.  Where the reference prints
diff norms and eyeballs them against float32+atomicAdd noise, our ops are
deterministic, so the checks run in float64 on CPU with real tolerances.

Usable both as a CLI (``python -m lattice_net_tpu.misc.lnn_grad_check``) and
from tests (tests/test_gradcheck.py).
"""

from __future__ import annotations

import numpy as np


def fd_grad(f, x, eps=1e-4):
    """Central finite-difference gradient of scalar f at x (numpy array)."""
    x = np.array(x, np.float64)  # owned, writable copy
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.size):
        old = flat[i]
        flat[i] = old + eps
        fp = float(f(x))
        flat[i] = old - eps
        fm = float(f(x))
        flat[i] = old
        gf[i] = (fp - fm) / (2 * eps)
    return g


def check_op(name, f, x0, rtol=1e-4, atol=1e-5, eps=1e-4, verbose=True):
    """Compare jax.grad(f) with finite differences; returns max abs diff."""
    import jax

    x0 = np.asarray(x0, np.float64)
    g_ad = np.asarray(jax.grad(lambda x: f(x))(x0))
    g_fd = fd_grad(f, x0, eps)
    diff = np.abs(g_ad - g_fd).max()
    denom = max(np.abs(g_fd).max(), 1e-8)
    if verbose:
        print(f"{name:>16}: max|AD-FD| {diff:.3e}  rel {diff / denom:.3e}")
    np.testing.assert_allclose(g_ad, g_fd, rtol=rtol, atol=atol)
    return diff


def build_test_fixture(n=40, sigma=0.4, cap=256, seed=0):
    import jax.numpy as jnp

    from lattice_net_tpu.data import make_toy_cloud
    from lattice_net_tpu.lattice.structure import build_hierarchy

    cloud = make_toy_cloud(n_points=n, nr_classes=3, seed=seed)
    pos = jnp.asarray(cloud.V, jnp.float64)
    h = build_hierarchy(pos, sigma, 1, (cap, cap // 2))
    return cloud, pos, h


def run_all(verbose=True):
    """Gradcheck splat / conv / coarsen / finefy / slice / gather / slice_classify."""
    import jax
    import jax.numpy as jnp

    from lattice_net_tpu.lattice import ops

    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cloud, pos, h = build_test_fixture()
        cap = h.structures[0].capacity
        n = pos.shape[0]
        rng = np.random.default_rng(0)
        c_in, c_out = 3, 2
        vals0 = rng.normal(size=(n, c_in))
        lv0 = np.asarray(ops.splat(jnp.asarray(vals0), h.splat_idx, h.splat_weights, cap))

        results = {}

        # splat -> slice roundtrip
        results["splat+slice"] = check_op(
            "splat+slice",
            lambda v: jnp.sum(
                ops.slice_lattice(
                    ops.splat(v, h.splat_idx, h.splat_weights, cap),
                    h.splat_idx,
                    h.splat_weights,
                )
                ** 2
            ),
            vals0,
            verbose=verbose,
        )

        ext_same = 2 * 4 + 1
        w_conv = rng.normal(size=(ext_same * c_in, c_out)) * 0.3
        results["conv(values)"] = check_op(
            "conv(values)",
            lambda v: jnp.sum(
                ops.conv_im2row(
                    jnp.asarray(v), h.neighbors_same[0], jnp.asarray(w_conv), True
                )
                ** 2
            ),
            lv0,
            verbose=verbose,
        )
        results["conv(weight)"] = check_op(
            "conv(weight)",
            lambda w: jnp.sum(
                ops.conv_im2row(jnp.asarray(lv0), h.neighbors_same[0], w, True) ** 2
            ),
            w_conv,
            verbose=verbose,
        )

        ext_cross = 2 * 4 + 1
        w_cross = rng.normal(size=(ext_cross * c_in, c_out)) * 0.3
        results["coarsen"] = check_op(
            "coarsen",
            lambda v: jnp.sum(
                ops.conv_im2row(jnp.asarray(v), h.neighbors_coarsen[0], jnp.asarray(w_cross), False) ** 2
            ),
            lv0,
            verbose=verbose,
        )
        cap1 = h.structures[1].capacity
        lv1 = rng.normal(size=(cap1, c_in))
        results["finefy"] = check_op(
            "finefy",
            lambda v: jnp.sum(
                ops.conv_im2row(jnp.asarray(v), h.neighbors_finefy[0], jnp.asarray(w_cross), False) ** 2
            ),
            lv1,
            verbose=verbose,
        )

        results["gather"] = check_op(
            "gather",
            lambda v: jnp.sum(
                ops.gather_lattice(jnp.asarray(v), h.splat_idx, h.splat_weights) ** 2
            ),
            lv0,
            verbose=verbose,
        )

        nr_classes = 3
        w_cls = rng.normal(size=(nr_classes, c_in))
        b_cls = rng.normal(size=(nr_classes,))
        dw = rng.normal(size=(n, 4)) * 0.1

        def classify(leaf, which):
            args = {
                "values": jnp.asarray(lv0),
                "delta": jnp.asarray(dw),
                "w": jnp.asarray(w_cls),
                "b": jnp.asarray(b_cls),
            }
            args[which] = leaf
            return jnp.sum(
                ops.slice_classify(
                    args["values"], h.splat_idx, h.splat_weights, args["delta"], args["w"], args["b"]
                )
                ** 2
            )

        for which, x0 in [("values", lv0), ("delta", dw), ("w", w_cls), ("b", b_cls)]:
            results[f"slice_classify/{which}"] = check_op(
                f"slice_classify/{which}",
                lambda leaf, which=which: classify(leaf, which),
                x0,
                verbose=verbose,
            )
        return results
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


def main():
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    results = run_all(verbose=True)
    print(f"all {len(results)} gradient checks passed")


if __name__ == "__main__":
    main()
