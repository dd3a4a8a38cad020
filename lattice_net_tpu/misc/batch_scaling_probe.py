"""b>1 batched-training regime probe (VERDICT r3 #7).

At KITTI scale, batching loses on v5e: a b=2 step costs 420 ms vs 2 x 80.7
(docs/runs/bench_r3_b2.log) because the vmapped general-branch build roughly
doubles per-cloud sort cost.  The open question is whether a SMALL-cloud
regime exists where batching wins — ShapeNet part-seg clouds are ~2k points
at ~1-2k occupied vertices (``/root/reference/config/
ln_train_shapenet_example.cfg:44-59``: capacity 60k, sigma 0.05, "~1k
vertices"), where the per-step fixed overhead (dispatch, small-op latency)
dominates and amortizing it over b clouds may pay.

This probe runs chained full train steps (build + forward + Lovász/NLL +
backward + AdamW) on procedural ShapeNet-scale clouds for b in {1, 8, 16,
32} and reports clouds/s per configuration.  b=1 uses the vmap-bypass fast
path; b>1 the vmapped build under ``static_general_branches()`` — exactly
what ``ln_train`` does for real batches.

    python -m lattice_net_tpu.misc.batch_scaling_probe [--batches 1,8,16,32]
"""

from __future__ import annotations

import argparse
import json
import time


def make_shapenet_like_cloud(n_points: int, seed: int):
    """Procedural part-segmented object in the unit box (4 parts), matching
    ShapeNet part-seg statistics: ~2k points, few distinct labelled parts."""
    import numpy as np

    rng = np.random.default_rng(seed)
    per = n_points // 4
    parts, labels = [], []
    # body: ellipsoid shell
    u = rng.normal(size=(per, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-9
    parts.append(u * np.asarray([0.45, 0.18, 0.12]) + rng.normal(0, 0.01, (per, 3)))
    labels.append(np.full(per, 1))
    # two wing-like planes
    for sgn in (-1.0, 1.0):
        m = per
        xy = rng.uniform([-0.25, 0.02], [0.25, 0.45], (m, 2))
        parts.append(
            np.stack([xy[:, 0], sgn * xy[:, 1], rng.normal(0, 0.01, m)], 1)
        )
        labels.append(np.full(m, 2))
    # tail fin
    m = n_points - 3 * per
    parts.append(
        np.stack(
            [rng.uniform(0.35, 0.5, m), rng.normal(0, 0.01, m), rng.uniform(0, 0.2, m)], 1
        )
    )
    labels.append(np.full(m, 3))
    V = np.concatenate(parts).astype(np.float32)
    L = np.concatenate(labels).astype(np.int32)
    sh = rng.permutation(n_points)
    return V[sh], L[sh]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-points", type=int, default=2048)
    ap.add_argument("--cap", type=int, default=8192)
    ap.add_argument("--sigma", type=float, default=0.05)
    ap.add_argument("--batches", default="1,8,16,32")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lattice_net_tpu.lattice.structure import build_hierarchy
    from lattice_net_tpu.models import LNN, ModelParams
    from lattice_net_tpu.parallel import TrainState, make_train_step
    from lattice_net_tpu.train import make_optimizer

    # the reference ShapeNet example model (ln_train_shapenet_example.cfg)
    mp = ModelParams(
        nr_classes=5,
        pointnet_channels_per_layer=(16, 32, 64),
        pointnet_start_nr_channels=64,
        nr_downsamples=2,
        nr_blocks_down_stage=(2, 2),
        nr_blocks_bottleneck=3,
        nr_blocks_up_stage=(2, 2),
        nr_levels_down_with_normal_resnet=2,
        nr_levels_up_with_normal_resnet=2,
    )
    n, sigma = args.n_points, args.sigma
    caps = (args.cap, args.cap // 2, args.cap // 4)
    model = LNN(mp)

    h_probe = build_hierarchy(
        jnp.asarray(make_shapenet_like_cloud(n, 0)[0]), sigma, mp.nr_downsamples, caps
    )
    occ = [int(s.nr_verts) for s in h_probe.structures]
    ovf = [int(s.nr_overflow) for s in h_probe.structures]
    print(f"occupancy per level: {occ} / {list(caps)} overflow {ovf}")
    assert sum(ovf) == 0

    params = model.init(
        jax.random.PRNGKey(0), h_probe,
        jnp.asarray(make_shapenet_like_cloud(n, 0)[0]), jnp.zeros((n, 1), jnp.float32),
    )

    results = {}
    for b in (int(x) for x in args.batches.split(",")):
        pos = np.stack([make_shapenet_like_cloud(n, s)[0] for s in range(b)])
        tgt = np.stack([make_shapenet_like_cloud(n, s)[1] for s in range(b)])
        batch = {
            "positions": jnp.asarray(pos),
            "values": jnp.zeros((b, n, 1), jnp.float32),
            "target": jnp.asarray(tgt),
            "point_mask": jnp.ones((b, n), bool),
        }
        tx = make_optimizer(1e-3, weight_decay=1e-4)
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(
            model, tx, sigma, mp.nr_downsamples, caps, ignore_index=-1,
            full_mask=True,
        ))
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(state)
        print(f"b={b}: compile+first step {time.perf_counter() - t0:.1f} s")
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(state)
        ms = (time.perf_counter() - t0) / args.iters * 1000
        results[b] = {"step_ms": round(ms, 2), "clouds_per_s": round(b / ms * 1000, 2)}
        print(f"b={b}: {ms:.2f} ms/step = {b / ms * 1000:.2f} clouds/s "
              f"(loss {float(metrics['loss']):.4f})")

    best = max(results, key=lambda b: results[b]["clouds_per_s"])
    print(json.dumps({
        "metric": "shapenet_scale_batch_scaling",
        "unit": "clouds_per_s",
        "n_points": n,
        "capacities": list(caps),
        "occupancy": occ,
        "results": results,
        "best_batch": best,
        "speedup_vs_b1": round(
            results[best]["clouds_per_s"] / results[1]["clouds_per_s"], 2
        ) if 1 in results else None,
    }))


if __name__ == "__main__":
    main()
