"""Per-component latency breakdown of the flagship forward at bench shapes.

The TPU-native stand-in for the reference's easypbr ``Profiler`` scoped-timer
instrumentation (``src/Lattice.cu:219-235``, ``lattice_funcs.py:16-25``).
Every stage is timed with CHAINED dispatch: the jitted step threads a tiny
data dependency from its output back into a carrier input, so the axon
runtime cannot skip or overlap repeated identical dispatches (unchained
loops report numbers up to 100x too fast — see CLAUDE.md).  Run on the real
chip:

    python -m lattice_net_tpu.misc.profile_forward [--trace /tmp/trace]

With ``--trace`` it additionally captures a ``jax.profiler`` trace of the
full forward for TensorBoard / xprof.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace", default="", help="jax.profiler trace output dir")
    ap.add_argument(
        "--trace-only",
        action="store_true",
        help="with --trace: skip the stage rows, trace the warmed e2e program",
    )
    ap.add_argument("--n-points", type=int, default=1 << 17)
    ap.add_argument("--cap", type=int, default=1 << 16)
    ap.add_argument("--sigma", type=float, default=0.6)
    ap.add_argument("--iters", type=int, default=20)
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
    # Same schedule as bench.py (1<<16, 1<<15, 1<<13) so stage rows and
    # bench deltas are apples-to-apples (round-3 verdict item).
    caps = (args.cap, args.cap // 2, args.cap // 8)
    iters = args.iters

    positions = jnp.asarray(synthetic_kitti_scan(n_points))
    values = jnp.zeros((n_points, 1), jnp.float32)

    model = LNN(mp)
    h = jax.jit(
        lambda p: build_hierarchy(
            p, sigma, mp.nr_downsamples, caps, point_feats=values
        )
    )(positions)
    params = model.init(jax.random.PRNGKey(0), h, positions, values)
    occ = [int(s.nr_verts) for s in h.structures]
    print(f"occupancy per level: {occ} / {list(caps)}")

    if args.trace and args.trace_only:
        # HLO-level attribution without the ~15 min stage sweep: compile +
        # warm the end-to-end program, then trace a few dispatches.  Parse
        # the xplane with tensorboard_plugin_profile (installed) for exact
        # per-fusion device times — the ground truth the stage rows estimate.
        def mk_e2e0(p):
            hh = build_hierarchy(p, sigma, mp.nr_downsamples, caps, point_feats=values)
            logp, _ = model.apply(params, hh, p, values)
            fb = (jnp.sum(jnp.argmax(logp, -1)) % 2).astype(p.dtype) * 1e-12
            return p + fb

        f = jax.jit(mk_e2e0)
        out = f(positions)
        jax.block_until_ready(out)
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = f(out)
            jax.block_until_ready(out)
        print(f"trace written to {args.trace}")
        return

    _first_row = [True]

    def timeit_chained(make_step, carrier):
        """make_step(carrier) -> jitted step: carrier -> carrier'.

        Chained: each iteration's input depends on the previous output.
        """
        step = jax.jit(make_step)
        c = step(carrier)
        jax.block_until_ready(c)
        best = 1e9
        # The FIRST timed loop of any profiler invocation over the axon
        # tunnel reads garbage (round-2: 248-296 ms for ~116 ms programs);
        # burn one extra discarded loop on the first row (see profile_train).
        n_loops = 3 if _first_row[0] else 2
        _first_row[0] = False
        for _ in range(n_loops):
            c = step(carrier)
            jax.block_until_ready(c)
            t0 = time.perf_counter()
            for _ in range(iters):
                c = step(c)
            jax.block_until_ready(c)
            best = min(best, (time.perf_counter() - t0) / iters * 1000.0)
        return best

    def feedback(out):
        """Numerically-zero scalar derived from EVERY leaf of ``out``.

        Consuming all leaves stops XLA from dead-code-eliminating the parts
        of the stage not reachable from a single output (round-3 gotcha: a
        splat_idx-only feedback DCE'd the whole coarse/neighbour build and
        reported 6.6 ms for a 40 ms hierarchy).
        """
        tot = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(out):
            tot = tot + jnp.sum(leaf.astype(jnp.float32)) * 0
        return tot

    rows = {}

    # --- structure build per level (sort + dedup), chained on positions ----
    for lvl in range(mp.nr_downsamples + 1):

        def mk(p, l=lvl):
            out = build_structure(
                p, sigma * 2.0**l, caps[l], lvl=l, need_point_maps=(l == 0),
                with_edges=(l == 0),
                point_feats=jnp.concatenate([p, values], -1) if l == 0 else None,
            )
            return p + feedback(out)

        rows[f"build_structure L{lvl} (sort+dedup)"] = timeit_chained(mk, positions)

    # --- neighbour tables, chained through a positions rebuild -------------
    for lvl in range(mp.nr_downsamples + 1):

        def mk(p, l=lvl):
            s = build_structure(
                p, sigma * 2.0**l, caps[l], lvl=l, need_point_maps=False
            )[0]
            nbr = build_neighbors_same_level(s)
            return p + feedback(nbr)

        t_nbr = timeit_chained(mk, positions)
        rows[f"build L{lvl} + neighbors_same (merge)"] = t_nbr

    # --- full hierarchy build ----------------------------------------------
    def mk_h(p):
        hh = build_hierarchy(p, sigma, mp.nr_downsamples, caps, point_feats=values)
        return p + feedback(hh)

    rows["build_hierarchy TOTAL"] = timeit_chained(mk_h, positions)

    # build-phase split: structures only (no neighbour tables)
    def mk_structs(p):
        hh = build_hierarchy(p, sigma, mp.nr_downsamples, caps, point_feats=values)
        return p + feedback((hh.structures, hh.splat_idx, hh.splat_weights, hh.edges))

    rows["build: structures+maps only"] = timeit_chained(mk_structs, positions)

    # --- individual hot ops at bench shapes (chained on the value table) ---
    c_in, c_out = 32, 32
    vals0 = jnp.asarray(np.random.default_rng(0).normal(size=(caps[0], c_in)), jnp.float32)
    nbr0 = h.neighbors_same[0]
    extent = nbr0.shape[1] + 1
    w = jnp.asarray(
        np.random.default_rng(1).normal(size=(extent * c_in, c_out)), jnp.float32
    )

    rows[f"conv_im2row L0 ({caps[0]}x{c_in}->{c_out})"] = timeit_chained(
        lambda v: v + ops.conv_im2row(v, nbr0, w, same_level=True) * 0, vals0
    )
    rows[f"gather_rows L0 ({caps[0]}x{extent - 1} idx)"] = timeit_chained(
        lambda v: v + feedback(ops.gather_rows(v, nbr0)), vals0
    )

    edge_idx = h.splat_idx.reshape(-1)
    edge_vals = jnp.asarray(
        np.random.default_rng(2).normal(size=(edge_idx.shape[0], c_in)), jnp.float32
    )
    rows[f"segment_sum ({edge_idx.shape[0]} rows -> {caps[0]})"] = timeit_chained(
        lambda v: v + feedback(ops.segment_sum(v, edge_idx, caps[0])), edge_vals
    )

    # --- forward internals (sorted-edge path) ------------------------------
    rows["distribute_sorted (524k rows)"] = timeit_chained(
        lambda p: p + feedback(ops.distribute_sorted(p, values, h.edges, caps[0], splat_weights=h.splat_weights)[0]),
        positions,
    )

    rows_arr = jax.jit(lambda p, v: ops.distribute_sorted(p, v, h.edges, caps[0], splat_weights=h.splat_weights)[0])(
        positions, values
    )
    rows["seg_max_sorted (524k x 4)"] = timeit_chained(
        lambda r: r
        + feedback(ops.seg_max_sorted(r[:, :-1], r[:, -1], h.edges, caps[0])[0]),
        rows_arr,
    )
    rows["seg_sum_sorted (524k x 5)"] = timeit_chained(
        lambda r: r + feedback(ops.seg_sum_sorted(r, h.edges, caps[0])), rows_arr
    )

    vals_head = jnp.asarray(np.random.default_rng(3).normal(size=(caps[0], 8)), jnp.float32)
    rows[f"gather_lattice head ({n_points} pts x 8ch)"] = timeit_chained(
        lambda v: v + feedback(ops.gather_lattice(v, h.splat_idx, h.splat_weights)),
        vals_head,
    )

    # --- NN-module stages at bench shapes (the forward "dark matter") ------
    import flax.linen as nn_
    from lattice_net_tpu.nn import modules as M

    mask0 = h.structures[0].occupancy_mask()
    key = jax.random.PRNGKey(1)

    def module_stage(mod, *margs):
        p = mod.init(key, *margs)

        def mk(v):
            out = mod.apply(p, v, *margs[1:])
            return v + feedback(out)

        return mk

    gn = M.GroupNormLattice(channels=c_in)
    rows["GroupNorm L0 (65536x32)"] = timeit_chained(module_stage(gn, vals0, mask0), vals0)

    rb = M.ResnetBlock(channels=c_in)
    rows["ResnetBlock L0 (2 convs + 2 GN)"] = timeit_chained(
        module_stage(rb, vals0, nbr0, mask0), vals0
    )

    vals1 = jnp.asarray(
        np.random.default_rng(4).normal(size=(caps[1], 64)), jnp.float32
    )
    co = M.CoarsenConv(in_channels=c_in, out_channels=64)
    rows["CoarsenConv L0->L1 (32->64)"] = timeit_chained(
        module_stage(co, vals0, h.neighbors_coarsen[0]), vals0
    )
    fi = M.FinefyConv(in_channels=64, out_channels=c_in)
    rows["FinefyConv L1->L0 (64->32)"] = timeit_chained(
        module_stage(fi, vals1, h.neighbors_finefy[0]), vals1
    )

    pn_rows = jax.jit(lambda p, v: ops.distribute_sorted(p, v, h.edges, caps[0], splat_weights=h.splat_weights)[0])(
        positions, values
    )
    pn = M.PointNetModule(channels_per_layer=(16, 32), out_channels=c_in)
    rows["PointNetModule (MLP + segmax + conv)"] = timeit_chained(
        module_stage(pn, pn_rows, h.edges, caps[0], nbr0, mask0), pn_rows
    )

    sf = M.SliceFastModule(in_channels=c_in, nr_classes=20)
    rows["SliceFast head (gather+dw+classify)"] = timeit_chained(
        module_stage(sf, vals0, mask0, h.splat_idx, h.splat_weights), vals0
    )

    # --- model forward given a prebuilt hierarchy --------------------------
    def mk_fwd(p):
        logp, _ = model.apply(params, h, p, values)
        return p + feedback(logp)

    rows["LNN forward (prebuilt hierarchy)"] = timeit_chained(mk_fwd, positions)

    # --- end-to-end ----------------------------------------------------------
    def mk_e2e(p):
        hh = build_hierarchy(p, sigma, mp.nr_downsamples, caps, point_feats=values)
        logp, _ = model.apply(params, hh, p, values)
        return p + feedback(logp)

    rows["END-TO-END (build + forward)"] = timeit_chained(mk_e2e, positions)

    width = max(len(k) for k in rows)
    print()
    for k, v in rows.items():
        print(f"{k:<{width}}  {v:8.3f} ms")

    if args.trace:
        f_e2e = jax.jit(mk_e2e)
        with jax.profiler.trace(args.trace):
            out = f_e2e(positions)
            jax.block_until_ready(out)
        print(f"\ntrace written to {args.trace}")


if __name__ == "__main__":
    main()
