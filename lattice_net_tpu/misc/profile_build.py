"""Hierarchy-build micro-benchmarks (chained dispatch) at bench shapes.

Times, each as an isolated jitted program with a data dependency threaded
between iterations:

  * canonical_point_order alone (the in-program reorder cost),
  * build_hierarchy generic vs canonical fast path (pre-sorted input),
  * level-0 build_structure generic vs the canonical corner-dedup build,
  * monotone_lookup at same-level and coarsen shapes (merge-sort path; the
    Pallas windowed-count alternative was deleted after losing in-context,
    see ops_tpu/lookup.py).

CAUTION: stage rows carry ~1.5 ms axon dispatch floors and are vulnerable
to caching/DCE artifacts even with threaded feedback — treat them as shape
intuition only; in-program deltas from bench.py ablations (LNT_* toggles)
are the authoritative cost attribution.

    python -m lattice_net_tpu.misc.profile_build
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-points", type=int, default=1 << 17)
    ap.add_argument("--cap", type=int, default=1 << 16)
    ap.add_argument("--sigma", type=float, default=0.6)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only-lookup", action="store_true",
                    help="skip the build benches; time just the lookup paths")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import synthetic_kitti_scan
    from lattice_net_tpu.lattice import structure as st
    from lattice_net_tpu.ops_tpu import lookup as lk

    sigma = args.sigma
    n = args.n_points
    caps = (args.cap, args.cap >> 1, args.cap >> 3)

    positions = jnp.asarray(synthetic_kitti_scan(n))
    perm = st.canonical_point_order(positions, sigma)
    pos_c = jnp.take(positions, perm, axis=0)

    # First timed row over the axon tunnel is garbage — burn one discarded
    # loop before the first trusted row (see profile_train.py).
    _first_row = [True]

    def timeit(name, fn, pos):
        fn = jax.jit(fn)
        out = fn(pos)
        jax.block_until_ready(out)
        n_loops = 2 if _first_row[0] else 1
        _first_row[0] = False
        for loop in range(n_loops):
            t0 = time.perf_counter()
            p = pos
            for _ in range(args.iters):
                out = fn(p)
                fb = jnp.asarray(out, jnp.float32).reshape(-1)[0] * 1e-12
                p = pos + fb
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:58s} {dt:8.3f} ms")
        return dt

    # every fn returns ONE array whose first element depends on all the work
    def f_order(pos):
        return st.canonical_point_order(pos, sigma)[:1]

    def consume_hierarchy(h):
        tot = sum(jnp.sum(t[:7]) for t in h.neighbors_same)
        tot += sum(jnp.sum(t[:7]) for t in h.neighbors_coarsen)
        tot += sum(jnp.sum(t[:7]) for t in h.neighbors_finefy)
        tot += jnp.sum(h.splat_idx[:7]) + jnp.sum(h.edges.vertex[:7])
        tot += jnp.sum(h.edges.perm[:7]) + jnp.sum(h.edges.ends[:7])
        tot += sum(s.nr_verts + jnp.sum(s.keys[:7]) for s in h.structures)
        return jnp.reshape(tot + jnp.sum(h.splat_weights[:7]), (1,))

    def f_generic(pos):
        return consume_hierarchy(
            st.build_hierarchy(pos, sigma, 2, caps, canonical_points=False)
        )

    def f_canonical(pos):
        return consume_hierarchy(
            st.build_hierarchy(pos, sigma, 2, caps, canonical_points=True)
        )

    def consume_l0(out):
        s, vid, bw = out[0], out[1], out[2]
        tot = s.nr_verts + jnp.sum(s.keys[:7]) + jnp.sum(vid[:7]) + jnp.sum(bw[:7])
        if len(out) > 3 and out[3] is not None:
            e = out[3]
            tot += jnp.sum(e.vertex[:7]) + jnp.sum(e.perm[:7]) + jnp.sum(e.ends[:7])
        return jnp.reshape(tot, (1,))

    def f_l0_generic(pos):
        return consume_l0(st.build_structure(pos, sigma, caps[0], with_edges=True))

    def f_l0_fast(pos):
        s, vid, bw, e, runs = st._canonical_fast_build(
            pos, jnp.broadcast_to(jnp.asarray(sigma), (3,)), caps[0],
            caps[0] // 2, jnp.ones((pos.shape[0],), bool),
        )
        return consume_l0((s, vid, bw, e))

    if not args.only_lookup:
        timeit("canonical_point_order (sort + payload)", f_order, positions)
        timeit("build_hierarchy GENERIC (unsorted input)", f_generic, positions)
        timeit("build_hierarchy CANONICAL fast (pre-sorted input)", f_canonical, pos_c)
        timeit("L0 build_structure generic (with edges)", f_l0_generic, positions)
        timeit("L0 canonical corner-dedup build (pre-sorted)", f_l0_fast, pos_c)

    # ---- lookup shapes: same-level + coarsen (merge-sort path) -------------
    h = st.build_hierarchy(positions, sigma, 2, caps)
    s0, s1 = h.structures[0], h.structures[1]
    moves = jnp.asarray(st._axis_moves_np(3))
    occ0 = s0.occupancy_mask()
    occ1 = s1.occupancy_mask()
    base0 = jnp.where(occ0[:, None], s0.keys, 0)
    q_same = base0[:, None, :] + moves[None]  # (cap0, 4, 3)
    base1 = jnp.where(occ1[:, None], s1.keys, 0) * 2
    q_coarsen = jnp.concatenate(
        [base1[:, None, :] + moves[None], base1[:, None, :] - moves[None], base1[:, None, :]],
        axis=1,
    )  # (cap1, 9, 3)

    def lk_fn(structure, q, occ):
        def f(pos):
            qq = q + (pos[:1, :1].astype(jnp.int32) * 0)[None]
            return jnp.reshape(jnp.sum(lk.monotone_lookup(structure, qq, occ)[:9]), (1,))

        return f

    timeit("same-level lookup cap0 (merge-sort)", lk_fn(s0, q_same, occ0), positions)
    timeit("coarsen lookup cap1->cap0 (merge-sort)", lk_fn(s0, q_coarsen, occ1), positions)


if __name__ == "__main__":
    main()
