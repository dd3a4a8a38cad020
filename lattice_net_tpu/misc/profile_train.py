"""Train-step latency breakdown at bench shapes (chained dispatch).

The bench's train-step metric (bench.py) covers build + forward + loss +
backward + AdamW in one jitted program; this tool splits that wall time into
deltas so the backward cost is attributable:

  A  forward loss only (build inside, no grad)
  B  value_and_grad of the same loss           -> (B - A) = total backward
  C  value_and_grad with the hierarchy PREBUILT outside the grad closure
     -> (B - C) = cost of carrying the build inside the AD program
  D  optimizer update alone (grads precomputed)

Every stage threads its scalar result back into the input positions so the
axon runtime executes each iteration fully (CLAUDE.md: unchained loops lie).

    python -m lattice_net_tpu.misc.profile_train [--iters 10]
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-points", type=int, default=1 << 17)
    ap.add_argument("--cap", type=int, default=1 << 16)
    ap.add_argument("--sigma", type=float, default=0.6)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--rows",
        default="ABCDE",
        help="row groups to run (subset of 'ABCDE'); e.g. --rows E reruns "
        "only the train-step attribution rows against a warm compile cache",
    )
    ap.add_argument(
        "--trace", default="", help="jax.profiler trace dir (captured after row E)"
    )
    args = ap.parse_args()
    rows = set(args.rows.upper())

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import synthetic_kitti_scan
    from lattice_net_tpu.lattice.structure import build_hierarchy
    from lattice_net_tpu.losses import segmentation_loss
    from lattice_net_tpu.models import LNN, ModelParams
    from lattice_net_tpu.parallel import TrainState
    from lattice_net_tpu.train import make_optimizer

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
    n = args.n_points
    caps = (args.cap, args.cap >> 1, args.cap >> 3)

    positions = jnp.asarray(synthetic_kitti_scan(n))
    values = jnp.zeros((n, 1), jnp.float32)
    target = jnp.asarray(np.random.default_rng(1).integers(1, 20, n), jnp.int32)

    model = LNN(mp)
    h0 = build_hierarchy(positions, sigma, mp.nr_downsamples, caps)
    params = model.init(jax.random.PRNGKey(0), h0, positions, values)
    tx = make_optimizer(1e-3)
    state = TrainState.create(params, tx)

    def loss_of(params, positions):
        h = build_hierarchy(positions, sigma, mp.nr_downsamples, caps)
        logp, _ = model.apply(params, h, positions, values)
        return segmentation_loss(logp, target, 0, None, None)

    def loss_nll_only(params, positions):
        from lattice_net_tpu.losses import nll_loss

        h = build_hierarchy(positions, sigma, mp.nr_downsamples, caps)
        logp, _ = model.apply(params, h, positions, values)
        return nll_loss(logp, target, 0, None, None)

    def loss_prebuilt(params, h, positions):
        logp, _ = model.apply(params, h, positions, values)
        return segmentation_loss(logp, target, 0, None, None)

    # The FIRST timed row of any profiler invocation over the axon tunnel is
    # garbage (round-2: row A read 296 ms for a true ~101 ms program) — burn
    # one full discarded timing loop before the first row is trusted.
    _first_row = [True]

    def timeit(name, fn, *arrs):
        out = fn(*arrs)  # compile + warm
        jax.block_until_ready(out)
        n_loops = 2 if _first_row[0] else 1
        _first_row[0] = False
        for loop in range(n_loops):
            t0 = time.perf_counter()
            a = arrs
            for _ in range(args.iters):
                out = fn(*a)
                # feed a scalar output leaf back into positions (chained
                # dispatch); grad rows return ((loss[, aux]), grads) so take
                # the first array leaf of the whole tree (the loss)
                fb = jax.tree_util.tree_leaves(out)[0].reshape(-1)[0] * 1e-12
                a = (arrs[0], arrs[1] + fb) + arrs[2:]
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:55s} {dt:8.3f} ms")
        return dt

    a = a2 = a3 = b = b2 = b3 = b4 = b5 = c = d = None
    e = e2 = e3 = f_row = None

    import os as _os

    # A/B rows pin the round-1 defaults (separate lookups) so their meaning
    # stays stable across rounds; B5/A3 measure the merged lookups that are
    # the production default since round 2.
    _os.environ["LNT_MERGED_LOOKUP"] = "0"

    if "A" in rows:
        # A: forward loss
        f_fwd = jax.jit(lambda p, pos: loss_of(p, pos))
        a = timeit("A forward loss (build + fwd + loss)", f_fwd, params, positions)

        # A2/B2: same without the Lovász term — attributes the batched-sort loss
        f_fwd_nll = jax.jit(lambda p, pos: loss_nll_only(p, pos))
        a2 = timeit("A2 forward loss, NLL only (no Lovász)", f_fwd_nll, params, positions)

    if "B" in rows:
        # Grad stages must RETURN the grads: a jitted program's unused outputs are
        # the only thing XLA cannot DCE, and returning just the loss would delete
        # the entire backward pass from the compiled program (verified on the HLO
        # — the loss alone depends only on the forward).
        # B: full grad.  Pinned to the round-1 batched Lovász so the row keeps
        # its historical meaning across rounds (the production default is
        # 'packed' since round 2 — that's the B4 row).
        _os.environ["LNT_LOVASZ"] = "batched"
        f_grad = jax.jit(lambda p, pos: jax.value_and_grad(loss_of)(p, pos))
        b = timeit("B value_and_grad (build inside)", f_grad, params, positions)

        f_grad_nll = jax.jit(lambda p, pos: jax.value_and_grad(loss_nll_only)(p, pos))
        b2 = timeit("B2 value_and_grad, NLL only", f_grad_nll, params, positions)

        # B3: same full loss but the Lovász backward routes through a second
        # sort instead of AD's permutation scatter (LNT_LOVASZ=sortvjp; the
        # env var is read at TRACE time, so set it around the jit closure)
        _os.environ["LNT_LOVASZ"] = "sortvjp"
        f_grad_sv = jax.jit(lambda p, pos: jax.value_and_grad(loss_of)(p, pos))
        b3 = timeit("B3 value_and_grad, sort-unsort Lovász VJP", f_grad_sv, params, positions)

        # B4: packed single-key Lovász — (error bits, gt, valid) folded into
        # ONE int32 sort operand, sort-unsort backward (the DEFAULT since the
        # round-2 A/B; B rows above use the round-1 batched formulation)
        _os.environ["LNT_LOVASZ"] = "packed"
        f_grad_pk = jax.jit(lambda p, pos: jax.value_and_grad(loss_of)(p, pos))
        b4 = timeit("B4 value_and_grad, packed single-key Lovász", f_grad_pk, params, positions)
        _os.environ.pop("LNT_LOVASZ", None)

        # B5: merged neighbour lookups — one [table; queries] sort per fine
        # level shared between same-level and coarsen tables (the production
        # default since round 2; A/B rows above run them separate)
        _os.environ["LNT_MERGED_LOOKUP"] = "1"
        f_grad_ml = jax.jit(lambda p, pos: jax.value_and_grad(loss_of)(p, pos))
        b5 = timeit("B5 value_and_grad, merged neighbour lookups", f_grad_ml, params, positions)
        f_fwd_ml = jax.jit(lambda p, pos: loss_of(p, pos))
        a3 = timeit("A3 forward loss, merged neighbour lookups", f_fwd_ml, params, positions)
        _os.environ["LNT_MERGED_LOOKUP"] = "0"

    # E/C/D rows measure the production defaults (merged lookups on)
    _os.environ.pop("LNT_MERGED_LOOKUP", None)

    if "E" in rows:
        # ----- E rows: attribute the full-train-step gap over B ------------
        # bench.py's train step (~251 ms) wraps B (~117 ms) in: point_mask
        # build + dropout RNG, a b=1 vmap + acc/IoU metrics, and the AdamW
        # update with state carry.  Each E row adds one layer so the deltas
        # attribute the gap.
        from lattice_net_tpu.losses import segmentation_loss as _segloss
        from lattice_net_tpu.parallel.data_parallel import make_loss_fn, make_train_step

        mask = jnp.ones((n,), bool)
        drop_rng = jax.random.PRNGKey(7)

        # E2: B + masked build + dropout + masked loss (still bare: no vmap,
        # no metrics, no optimizer)
        def loss_masked(params, positions):
            h = build_hierarchy(
                positions, sigma, mp.nr_downsamples, caps, point_mask=mask
            )
            logp, _ = model.apply(
                params, h, positions, values,
                deterministic=False, rngs={"dropout": drop_rng},
            )
            return _segloss(logp, target, 0, None, mask)

        f_grad_m = jax.jit(lambda p, pos: jax.value_and_grad(loss_masked)(p, pos))
        e2 = timeit("E2 value_and_grad, +mask +dropout", f_grad_m, params, positions)

        # E3: + b=1 vmap + acc/IoU metrics (exactly bench's loss_fn)
        batch = {
            "positions": positions[None],
            "values": values[None],
            "target": target[None],
            "point_mask": mask[None],
        }
        lf_v = make_loss_fn(
            model, sigma, mp.nr_downsamples, caps, ignore_index=0, force_vmap=True
        )
        f_grad_v = jax.jit(
            lambda p, pos: jax.value_and_grad(lf_v, has_aux=True)(
                p,
                {**batch, "positions": pos[None]},
                jax.random.PRNGKey(3),
            )
        )
        e3 = timeit("E3 value_and_grad, +vmap(1) +metrics", f_grad_v, params, positions)

        # F: same but through the b==1 vmap BYPASS (production default) — the
        # delta vs E3 is what the degenerate batch dim costs
        lf_s = make_loss_fn(model, sigma, mp.nr_downsamples, caps, ignore_index=0)
        f_grad_s = jax.jit(
            lambda p, pos: jax.value_and_grad(lf_s, has_aux=True)(
                p,
                {**batch, "positions": pos[None]},
                jax.random.PRNGKey(3),
            )
        )
        f_row = timeit("F  value_and_grad, b=1 bypass +metrics", f_grad_s, params, positions)

        # E: the full bench train step (chained through the optimizer state)
        tx_b = make_optimizer(
            1e-3, weight_decay=1e-4, schedule="cosine_warm_restarts", t0_steps=1000
        )
        st = TrainState.create(params, tx_b)
        step = jax.jit(make_train_step(model, tx_b, sigma, mp.nr_downsamples, caps))
        rng_b = jax.random.PRNGKey(2)
        st, _m = step(st, batch, rng_b)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, _m = step(st, batch, rng_b)
        jax.block_until_ready(st)
        e = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{'E  full train step (bench configuration)':55s} {e:8.3f} ms")
        if args.trace:
            with jax.profiler.trace(args.trace):
                for _ in range(3):
                    st, _m = step(st, batch, rng_b)
                jax.block_until_ready(st)
            print(f"train-step trace written to {args.trace} "
                  "(parse with misc/parse_xplane)")

    if "C" in rows:
        # C: grad with prebuilt hierarchy (build outside AD, same program
        # builds the hierarchy first, then differentiates only the network)
        def c_fn(p, pos):
            h = build_hierarchy(pos, sigma, mp.nr_downsamples, caps)
            return jax.value_and_grad(loss_prebuilt)(p, h, pos)

        c = timeit("C build, then value_and_grad of network only", jax.jit(c_fn), params, positions)

    if "D" in rows:
        # D: optimizer update alone (returns the full updated tree — keeps
        # every leaf's update live)
        _, grads = jax.jit(lambda p, pos: jax.value_and_grad(loss_of)(p, pos))(params, positions)
        jax.block_until_ready(grads)

        def d_fn(p, pos, g):
            upd, _ = tx.update(g, state.opt_state, p)
            import optax

            newp = optax.apply_updates(p, upd)
            return jax.tree.leaves(newp)[0].reshape(-1)[0], newp

        d = timeit("D optimizer update only", jax.jit(d_fn), params, positions, grads)

    print()

    def delta(label, x, y):
        if x is not None and y is not None:
            print(f"{label}: {x - y:8.3f} ms")

    delta("backward total (B - A)", b, a)
    delta("AD-of-build overhead (B - C)", b, c)
    delta("Lovász forward (A - A2)", a, a2)
    delta("Lovász fwd+bwd (B - B2)", b, b2)
    delta("sort-unsort Lovász VJP saves (B - B3)", b, b3)
    delta("packed single-key Lovász saves (B - B4)", b, b4)
    delta("merged lookups save, train (B - B5)", b, b5)
    delta("merged lookups save, fwd (A - A3)", a, a3)
    delta("mask+dropout overhead (E2 - B)", e2, b)
    delta("vmap(1)+metrics overhead (E3 - E2)", e3, e2)
    delta("b=1 bypass saves (E3 - F)", e3, f_row)
    delta("optimizer+state overhead (E - F)", e, f_row)


if __name__ == "__main__":
    main()
