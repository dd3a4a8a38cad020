"""Golden tests of the vectorised permutohedral math.

The oracle below is an independent scalar NumPy transcription of the
published algorithm (Adams, Baek, Davis, "Fast High-Dimensional Filtering
Using the Permutohedral Lattice", 2010, p.10) — the same algorithm the
reference CUDA kernels implement (``LatticeGPU.cuh:552-602``).  Fuzzing the
batched JAX implementation against it covers pos_dim 2 and 3, including the
off-plane rounding fixups.
"""

import numpy as np
import jax.numpy as jnp

from lattice_net_tpu.lattice import permutohedral as pm


def oracle_elevate(p):
    d = len(p)
    inv_std = (d + 1) * np.sqrt(2.0 / 3.0)
    sf = [inv_std / np.sqrt((i + 1) * (i + 2)) for i in range(d)]
    elevated = np.zeros(d + 1)
    sm = 0.0
    for i in range(d, 0, -1):
        cf = p[i - 1] * sf[i - 1]
        elevated[i] = sm - i * cf
        sm += cf
    elevated[0] = sm
    return elevated


def oracle_simplex(elevated):
    d1 = len(elevated)
    d = d1 - 1
    rem0 = np.zeros(d1, dtype=np.int64)
    s = 0
    for i in range(d1):
        v = elevated[i] / d1
        up = np.ceil(v) * d1
        down = np.floor(v) * d1
        rem0[i] = int(up) if up - elevated[i] < elevated[i] - down else int(down)
        s += rem0[i]
    s //= d1

    rank = np.zeros(d1, dtype=np.int64)
    for i in range(d):
        di = elevated[i] - rem0[i]
        for j in range(i + 1, d1):
            if di < elevated[j] - rem0[j]:
                rank[i] += 1
            else:
                rank[j] += 1

    for i in range(d1):
        rank[i] += s
        if rank[i] < 0:
            rank[i] += d1
            rem0[i] += d1
        elif rank[i] > d:
            rank[i] -= d1
            rem0[i] -= d1

    bary = np.zeros(d1 + 1)
    for i in range(d1):
        delta = (elevated[i] - rem0[i]) / d1
        bary[d - rank[i]] += delta
        bary[d + 1 - rank[i]] -= delta
    bary[0] += 1.0 + bary[d1]
    return rem0, rank, bary[:d1]


def oracle_keys(rem0, rank):
    d1 = len(rem0)
    d = d1 - 1
    keys = np.zeros((d1, d), dtype=np.int64)
    for r in range(d1):
        for i in range(d):
            keys[r, i] = rem0[i] + r
            if rank[i] > d - r:
                keys[r, i] -= d1
    return keys


def test_elevate_matches_oracle(rng):
    for d in (2, 3, 4):
        pts = rng.normal(size=(64, d)).astype(np.float32) * 10
        got = np.asarray(pm.elevate(jnp.asarray(pts)))
        want = np.stack([oracle_elevate(p) for p in pts])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
        # elevated points lie on the sum-zero hyperplane
        np.testing.assert_allclose(got.sum(-1), 0.0, atol=2e-2)


def test_simplex_matches_oracle(rng):
    for d in (2, 3):
        pts = rng.normal(size=(256, d)) * 5
        elev = np.stack([oracle_elevate(p) for p in pts])
        rem0, rank, bary = pm.find_enclosing_simplex(jnp.asarray(elev, jnp.float32))
        keys = pm.vertex_keys(rem0, rank)
        rem0, rank, bary, keys = map(np.asarray, (rem0, rank, bary, keys))
        for n in range(len(pts)):
            r0, rk, b = oracle_simplex(elev[n])
            np.testing.assert_array_equal(rem0[n], r0)
            np.testing.assert_array_equal(rank[n], rk)
            np.testing.assert_allclose(bary[n], b, atol=1e-5)
            np.testing.assert_array_equal(keys[n], oracle_keys(r0, rk))


def test_barycentric_partition_of_unity(rng):
    for d in (2, 3):
        pts = rng.normal(size=(512, d)).astype(np.float32) * 3
        _, bary = pm.splat_coords(jnp.asarray(pts))
        bary = np.asarray(bary)
        np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-4)
        assert (bary > -1e-4).all(), "barycentric coords must be non-negative"


def test_vertex_keys_colors(rng):
    # vertex r of any simplex has all coordinates congruent to r mod (d+1)
    for d in (2, 3):
        pts = rng.normal(size=(128, d)).astype(np.float32) * 4
        keys, _ = pm.splat_coords(jnp.asarray(pts))
        keys = np.asarray(keys)  # (N, d+1, d)
        for r in range(d + 1):
            assert ((keys[:, r, :] - r) % (d + 1) == 0).all()
