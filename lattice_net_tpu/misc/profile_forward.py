"""Per-component latency breakdown of the flagship forward at bench shapes.

The TPU-native stand-in for the reference's easypbr ``Profiler`` scoped-timer
instrumentation (``src/Lattice.cu:219-235``, ``lattice_funcs.py:16-25``):
each pipeline stage is jitted and timed in isolation with
``block_until_ready``, so the output is a true additive cost breakdown, not a
trace to eyeball.  Run on the real chip:

    python -m lattice_net_tpu.misc.profile_forward [--trace /tmp/trace]

With ``--trace`` it additionally captures a ``jax.profiler`` trace of the full
forward for TensorBoard / xprof.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _timeit(fn, *args, iters=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace", default="", help="jax.profiler trace output dir")
    ap.add_argument("--n-points", type=int, default=1 << 17)
    ap.add_argument("--cap", type=int, default=1 << 16)
    ap.add_argument("--sigma", type=float, default=0.6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lattice_net_tpu.lattice import ops
    from lattice_net_tpu.lattice.structure import (
        build_hierarchy,
        build_neighbors_same_level,
        build_structure,
    )
    from lattice_net_tpu.models import LNN, ModelParams
    from bench import synthetic_kitti_scan  # repo-root bench helpers

    mp = ModelParams(
        nr_classes=20,
        pointnet_channels_per_layer=(16, 32),
        pointnet_start_nr_channels=32,
        nr_downsamples=2,
        nr_blocks_down_stage=(1, 1),
        nr_blocks_bottleneck=1,
        nr_blocks_up_stage=(1, 1),
        nr_levels_down_with_normal_resnet=3,
        nr_levels_up_with_normal_resnet=3,
    )
    sigma = args.sigma
    n_points = args.n_points
    caps = (args.cap, args.cap // 2, args.cap // 4)

    positions = jnp.asarray(synthetic_kitti_scan(n_points))
    values = jnp.zeros((n_points, 1), jnp.float32)

    model = LNN(mp)
    h = jax.jit(lambda p: build_hierarchy(p, sigma, mp.nr_downsamples, caps))(positions)
    params = model.init(jax.random.PRNGKey(0), h, positions, values)
    occ = [int(s.nr_verts) for s in h.structures]
    print(f"occupancy per level: {occ} / {list(caps)}")

    rows = {}

    # --- stage 1: structure build per level (sort + dedup) -------------------
    for lvl in range(mp.nr_downsamples + 1):
        f = jax.jit(
            lambda p, l=lvl: build_structure(p, sigma * 2.0**l, caps[l], lvl=l)[0].keys
        )
        rows[f"build_structure L{lvl} (sort+dedup)"] = _timeit(f, positions)

    # --- stage 2: neighbour tables (lookup-bound) ----------------------------
    for lvl in range(mp.nr_downsamples + 1):
        s = h.structures[lvl]
        f = jax.jit(build_neighbors_same_level)
        rows[f"neighbors_same L{lvl} (lookup)"] = _timeit(f, s)

    # --- full hierarchy build -------------------------------------------------
    fh = jax.jit(lambda p: build_hierarchy(p, sigma, mp.nr_downsamples, caps))
    rows["build_hierarchy TOTAL"] = _timeit(fh, positions)

    # --- stage 3: individual hot ops at bench shapes -------------------------
    c_in, c_out = 32, 32
    vals0 = jnp.asarray(np.random.default_rng(0).normal(size=(caps[0], c_in)), jnp.float32)
    nbr0 = h.neighbors_same[0]
    extent = nbr0.shape[1] + 1
    w = jnp.asarray(
        np.random.default_rng(1).normal(size=(extent * c_in, c_out)), jnp.float32
    )
    f_conv = jax.jit(lambda v, n, w: ops.conv_im2row(v, n, w, same_level=True))
    rows[f"conv_im2row L0 ({caps[0]}x{c_in}->{c_out})"] = _timeit(f_conv, vals0, nbr0, w)

    f_gather = jax.jit(lambda v, n: ops.gather_rows(v, n))
    rows[f"gather_rows L0 ({caps[0]}x{extent - 1} idx)"] = _timeit(f_gather, vals0, nbr0)

    edge_idx = h.splat_idx.reshape(-1)
    edge_vals = jnp.asarray(
        np.random.default_rng(2).normal(size=(edge_idx.shape[0], c_in)), jnp.float32
    )
    f_seg = jax.jit(lambda v, i: ops.segment_sum(v, i, caps[0]))
    rows[f"segment_sum ({edge_idx.shape[0]} rows -> {caps[0]})"] = _timeit(
        f_seg, edge_vals, edge_idx
    )
    f_segmax = jax.jit(lambda v, i: ops.segment_max_with_src(v, i, caps[0]))
    rows[f"segment_max_with_src ({edge_idx.shape[0]} rows)"] = _timeit(
        f_segmax, edge_vals, edge_idx
    )

    # --- stage 3b: forward internals (sorted-edge path) -----------------------
    f_dist = jax.jit(lambda p, v: ops.distribute_sorted(p, v, h.edges, caps[0])[0])
    rows["distribute_sorted (524k rows)"] = _timeit(f_dist, positions, values)

    rows_arr = f_dist(positions, values)
    f_segmax = jax.jit(
        lambda r: ops.seg_max_sorted(r[:, :-1], r[:, -1], h.edges, caps[0])[0]
    )
    rows["seg_max_sorted (524k x 4)"] = _timeit(f_segmax, rows_arr)
    f_segsum = jax.jit(lambda r: ops.seg_sum_sorted(r, h.edges, caps[0]))
    rows["seg_sum_sorted (524k x 5)"] = _timeit(f_segsum, rows_arr)

    vals_head = jnp.asarray(np.random.default_rng(3).normal(size=(caps[0], 8)), jnp.float32)
    f_gatherl = jax.jit(lambda v: ops.gather_lattice(v, h.splat_idx, h.splat_weights))
    rows[f"gather_lattice head ({n_points} pts x 8ch)"] = _timeit(f_gatherl, vals_head)

    # --- stage 4: model forward given a prebuilt hierarchy -------------------
    f_fwd = jax.jit(lambda params, h, p, v: model.apply(params, h, p, v)[0])
    rows["LNN forward (prebuilt hierarchy)"] = _timeit(f_fwd, params, h, positions, values)

    # --- stage 5: end-to-end ---------------------------------------------------
    f_e2e = jax.jit(
        lambda params, p, v: model.apply(
            params, build_hierarchy(p, sigma, mp.nr_downsamples, caps), p, v
        )[0]
    )
    rows["END-TO-END (build + forward)"] = _timeit(f_e2e, params, positions, values)

    width = max(len(k) for k in rows)
    print()
    for k, v in rows.items():
        print(f"{k:<{width}}  {v:8.3f} ms")

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = f_e2e(params, positions, values)
            jax.block_until_ready(out)
        print(f"\ntrace written to {args.trace}")


if __name__ == "__main__":
    main()
