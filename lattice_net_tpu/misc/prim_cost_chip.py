"""On-chip cost model for the primitives the lattice build is made of.

The round-2 performance map attributed the 34 ms build mostly to ``lax.sort``
(~8.7 ms per 524k x 3-operand sort), while the first correctly-chained
isolated sort read 0.22 ms (2^18 x 2 ops) — a 40x gap that decides where the
round-3 optimisation effort goes (sorts vs the full-stream gathers/scatters,
which XLA lowers row-latency-bound on TPU: ~170k rows/ms, ``ops_tpu/patch.py``).

Methodology — the only one CLAUDE.md marks trustworthy on this stack:
**in-program marginal deltas.**  Each row builds ONE jitted program applying
the primitive k times, chained through an XOR-bit feedback INSIDE the program
(so XLA cannot CSE the repetitions and the runtime cannot skip dispatches),
and reports (t(k=3) - t(k=1)) / 2: dispatch overhead, transfers, and the
feedback cost subtract out.  The first attempt at this tool timed the
feedback as ~8 EAGER ops per iteration over the axon tunnel and read 16 ms
for a sort bounded at <=0.25 ms — numbers from that version are garbage.

Run ON THE CHIP (one process at a time):
    python -m lattice_net_tpu.misc.prim_cost_chip
"""

import argparse
import functools
import time

import numpy as np

M = 1 << 19  # the KITTI-scale edge stream: 131072 points x 4 corners
CAP = 1 << 16  # level-0 vertex capacity


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    rand_ids = jnp.asarray(rng.integers(0, CAP, M).astype(np.int32))
    mono_ids = jnp.sort(rand_ids)
    key1 = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, M).astype(np.int32))
    key2 = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, M).astype(np.int32))
    fcols = tuple(
        jnp.asarray(rng.normal(size=M).astype(np.float32)) for _ in range(8)
    )
    x_m = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
    x_m8 = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    x_m32 = jnp.asarray(rng.normal(size=(M, 32)).astype(np.float32))
    tab32 = jnp.asarray(rng.normal(size=(CAP, 32)).astype(np.float32))
    A = jnp.arange(M, dtype=jnp.int32)

    first_row = [True]

    def timeit(step, ops):
        cur = step(ops)
        jax.block_until_ready(cur)
        n_loops = 2 if first_row[0] else 1
        first_row[0] = False
        best = 1e18
        for _ in range(max(n_loops, args.repeats)):
            cur = ops
            t0 = time.perf_counter()
            for _ in range(args.iters):
                cur = step(cur)  # ONE dispatch per iteration
            jax.block_until_ready(cur)
            best = min(best, (time.perf_counter() - t0) / args.iters * 1000.0)
        return best

    def bench(name, ops, apply):
        """apply(ops_tuple) -> pytree of outputs; ops[0] must be int32."""

        def make_step(k):
            @jax.jit
            def step(ops):
                cur = ops
                for _ in range(k):
                    out = apply(cur)
                    leaves = jax.tree_util.tree_leaves(out)
                    # consume EVERY leaf (or XLA DCEs the op) inside the
                    # program; the xor bit re-keys op 0 so reps can't CSE
                    fb = jnp.int32(0)
                    for l in leaves:
                        fb = fb ^ jnp.ravel(l)[0].astype(jnp.int32)
                    cur = (cur[0] ^ (fb & 1),) + cur[1:]
                return cur

            return step

        t1 = timeit(make_step(1), ops)
        t3 = timeit(make_step(3), ops)
        marg = (t3 - t1) / 2.0
        print(f"{name:52s} marginal {marg:8.3f} ms   (t1 {t1:7.3f}  t3 {t3:7.3f})")
        return marg

    # --- calibration ---------------------------------------------------------
    bench("noop (x ^ 1)", (key1,), lambda o: (o[0] ^ 1,))

    # --- sorts: operand-count scaling ---------------------------------------
    bench("sort 2^19 x 2ops (key+payload)", (key1,),
          lambda o: jax.lax.sort((o[0], A), num_keys=1))
    bench("sort 2^19 x 2ops full-lex", (key1,),
          lambda o: jax.lax.sort((o[0], A), num_keys=2))
    bench("sort 2^19 x 3ops", (key1,),
          lambda o: jax.lax.sort((o[0], key2, A), num_keys=2))
    bench("sort 2^19 x 3ops + 4 f32 payload", (key1,),
          lambda o: jax.lax.sort((o[0], key2, A) + fcols[:4], num_keys=2))
    bench("sort 2^19 x 3ops + 8 f32 payload", (key1,),
          lambda o: jax.lax.sort((o[0], key2, A) + fcols, num_keys=2))

    # --- gathers --------------------------------------------------------------
    bench("take (M,) f32 by perm", (perm,), lambda o: jnp.take(x_m, o[0]))
    bench("take (M,8) f32 rows by perm", (perm,),
          lambda o: jnp.take(x_m8, o[0], axis=0))
    bench("take (M,) f32 by sorted ids", (mono_ids,),
          lambda o: jnp.take(x_m, o[0]))
    bench("take (M,) f32 sorted ids + sorted flag", (mono_ids,),
          lambda o: jax.lax.gather(
              x_m[:, None],
              o[0][:, None],
              jax.lax.GatherDimensionNumbers((1,), (0,), (0,)),
              (1, 1),
              indices_are_sorted=True,
              mode=jax.lax.GatherScatterMode.CLIP,
          ))
    bench("row gather (CAP,32) by (M,) rand ids", (rand_ids,),
          lambda o: jnp.take(tab32, o[0], axis=0))
    bench("row gather (CAP,32) by (M,) sorted ids+flag", (mono_ids,),
          lambda o: jax.lax.gather(
              tab32,
              o[0][:, None],
              jax.lax.GatherDimensionNumbers((1,), (0,), (0,)),
              (1, 32),
              indices_are_sorted=True,
              mode=jax.lax.GatherScatterMode.CLIP,
          ))

    # --- scatters ---------------------------------------------------------------
    bench("scatter-set (M,) by perm (inverse perm)", (perm,),
          lambda o: jnp.zeros((M,), jnp.int32).at[o[0]].set(A, mode="drop"))
    bench("inverse perm via 2-op sort", (perm,),
          lambda o: jax.lax.sort((o[0], A), num_keys=1)[1])
    bench("scatter-max (CAP+1,) from M sorted ids", (mono_ids,),
          lambda o: jnp.full((CAP + 1,), -1, jnp.int32).at[o[0]].max(A, mode="drop"))
    bench("scatter-max sorted ids + sorted flag", (mono_ids,),
          lambda o: jnp.full((CAP + 1,), -1, jnp.int32).at[o[0]].max(
              A, mode="drop", indices_are_sorted=True))
    bench("scatter-add (CAP,32) from (M,32) rand ids", (rand_ids,),
          lambda o: jnp.zeros((CAP, 32), jnp.float32).at[o[0]].add(
              x_m32, mode="drop"))

    # --- scans / misc -------------------------------------------------------------
    bench("cummax (M,) i32", (key1,), lambda o: jax.lax.cummax(o[0], axis=0))
    bench("cumsum (M,) i32", (key1,), lambda o: jnp.cumsum(o[0] & 1))
    bench("searchsorted CAP queries in (M,) sorted", (mono_ids,),
          lambda o: jnp.searchsorted(o[0], jnp.arange(CAP, dtype=jnp.int32)))
    bench("segment_max (M,32)->CAP sorted ids (XLA)", (mono_ids,),
          lambda o: jax.ops.segment_max(
              x_m32, o[0], num_segments=CAP, indices_are_sorted=True))


if __name__ == "__main__":
    main()
