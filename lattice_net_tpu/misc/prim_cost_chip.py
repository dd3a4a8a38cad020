"""On-chip cost model for the primitives the lattice build is made of.

The round-2 performance map attributed the 34 ms build mostly to ``lax.sort``
(~8.7 ms per 524k x 3-operand sort), but the first correctly-chained isolated
sort measurement (``sort_ab_chip``: 0.22 ms for 2^18 x 2 ops) is ~40x cheaper
than that attribution implies.  Either in-program sorts are much slower than
isolated ones, or the build's cost actually lives in its full-stream gathers /
scatters / scans (XLA row gathers are known row-latency-bound on TPU:
~170k rows/ms, ``ops_tpu/patch.py``).  This tool measures each primitive at
the build's real shapes so the round-3 optimisation targets the true hogs.

Every row is a CHAINED measurement (each iteration's input depends on the
previous output — CLAUDE.md) and the first row's timing loop is doubled to
burn the known-garbage first row.

Run ON THE CHIP (one process at a time):
    python -m lattice_net_tpu.misc.prim_cost_chip
"""

import argparse
import time

import numpy as np

M = 1 << 19  # the KITTI-scale edge stream: 131072 points x 4 corners
CAP = 1 << 16  # level-0 vertex capacity


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    # clustered-but-not-monotone ids (what distribute's point_of looks like)
    rand_ids = jnp.asarray(rng.integers(0, CAP, M).astype(np.int32))
    mono_ids = jnp.sort(rand_ids)
    keys = tuple(
        jnp.asarray(rng.integers(-(1 << 30), 1 << 30, M).astype(np.int32))
        for _ in range(3)
    )
    fcols = tuple(
        jnp.asarray(rng.normal(size=M).astype(np.float32)) for _ in range(8)
    )
    x_m = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
    x_m8 = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    x_m32 = jnp.asarray(rng.normal(size=(M, 32)).astype(np.float32))
    tab32 = jnp.asarray(rng.normal(size=(CAP, 32)).astype(np.float32))
    i32 = jnp.asarray(rng.integers(0, M, M).astype(np.int32))

    first_row = [True]

    def timeit(name, fn, *ops):
        """fn(*ops) -> tuple of arrays; op 0 must be int32 or f32 (M,...)."""
        f = jax.jit(fn)
        out = f(*ops)
        jax.block_until_ready(out)
        n_loops = 2 if first_row[0] else 1
        first_row[0] = False
        best = 1e18
        for _ in range(max(n_loops, args.repeats)):
            t0 = time.perf_counter()
            cur = ops
            for _ in range(args.iters):
                out = f(*cur)
                leaves = jax.tree_util.tree_leaves(out)
                # consume EVERY output leaf or XLA DCEs the op (CLAUDE.md)
                fb = sum(jnp.ravel(l)[0].astype(jnp.float32) for l in leaves)
                if ops[0].dtype == jnp.int32:
                    fbi = (fb.astype(jnp.int32) & 1)
                    cur = (ops[0] ^ fbi,) + cur[1:]
                else:
                    cur = (ops[0] + fb * 1e-30,) + cur[1:]
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.iters * 1000.0)
        print(f"{name:48s} {best:8.3f} ms")
        return best

    A = jnp.arange(M, dtype=jnp.int32)

    # --- sorts: operand-count scaling -------------------------------------
    timeit("sort 2^19 x 2ops (key+payload)", lambda k0: jax.lax.sort((k0, A), num_keys=1), keys[0])
    timeit("sort 2^19 x 3ops", lambda k0: jax.lax.sort((k0, keys[1], A), num_keys=2), keys[0])
    timeit(
        "sort 2^19 x 3ops + 5 f32 payload",
        lambda k0: jax.lax.sort((k0, keys[1], A) + fcols[:5], num_keys=2),
        keys[0],
    )
    timeit(
        "sort 2^19 x 3ops + 8 f32 payload",
        lambda k0: jax.lax.sort((k0, keys[1], A) + fcols, num_keys=2),
        keys[0],
    )

    # --- gathers ------------------------------------------------------------
    timeit("take (M,) f32 by perm", lambda p: jnp.take(x_m, p), perm)
    timeit("take (M,8) f32 rows by perm", lambda p: jnp.take(x_m8, p, axis=0), perm)
    timeit("take (M,) f32 by sorted ids", lambda s: jnp.take(x_m, s), mono_ids)
    timeit(
        "take (M,) sorted-flag gather",
        lambda s: jax.lax.gather(
            x_m[:, None],
            s[:, None],
            jax.lax.GatherDimensionNumbers((), (0, 1), (0,)),
            (1, 1),
            indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.CLIP,
        ),
        mono_ids,
    )
    timeit(
        "row gather (CAP,32) tab by (M,) rand ids",
        lambda s: jnp.take(tab32, s, axis=0),
        rand_ids,
    )

    # --- scatters -----------------------------------------------------------
    timeit(
        "scatter-set (M,) by perm (inverse perm)",
        lambda p: jnp.zeros((M,), jnp.int32).at[p].set(A, mode="drop"),
        perm,
    )
    timeit(
        "scatter-max (CAP+1,) from M sorted ids",
        lambda s: jnp.full((CAP + 1,), -1, jnp.int32).at[s].max(A, mode="drop"),
        mono_ids,
    )
    timeit(
        "scatter-add (CAP,32) from (M,32) rand ids",
        lambda s: jnp.zeros((CAP, 32), jnp.float32).at[s].add(x_m32, mode="drop"),
        rand_ids,
    )

    # --- scans / misc ---------------------------------------------------------
    timeit("cummax (M,) i32", lambda a: jax.lax.cummax(a, axis=0), i32)
    timeit("cumsum (M,) i32", lambda a: jnp.cumsum(a), i32)
    timeit(
        "searchsorted CAP queries in (M,) sorted",
        lambda s: jnp.searchsorted(s, jnp.arange(CAP, dtype=jnp.int32)),
        mono_ids,
    )
    timeit(
        "segment_max (M,32)->CAP sorted ids (XLA)",
        lambda s: jax.ops.segment_max(
            x_m32, s, num_segments=CAP, indices_are_sorted=True
        ),
        mono_ids,
    )

    # invert a permutation via SORT instead of scatter: sort (perm, arange)
    timeit(
        "inverse perm via 2-op sort",
        lambda p: jax.lax.sort((p, A), num_keys=1)[1],
        perm,
    )


if __name__ == "__main__":
    main()
