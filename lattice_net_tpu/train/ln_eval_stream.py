"""Streaming (sensor-rate) inference harness.

The reference's ``ln_eval_cloud_ros.py`` consumes a ROS bag at sensor rate
and runs the model per incoming cloud with a live viewer.  The TPU-native
equivalent is an offline scan-stream simulator: scans arrive on a wall-clock
schedule (default 10 Hz, the Velodyne rate), each is padded to the static
point budget and pushed through the jitted forward, and the harness reports
per-scan latency percentiles and the fraction of deadline misses — the
"inference at sensor rate" workload of SURVEY.md §3.5.

Usage: ``python -m lattice_net_tpu.train.ln_eval_stream <config.cfg>
[--rate-hz 10] [--nr-scans 100]``
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def run(config_path: str, checkpoint: str = "", rate_hz: float = 10.0, nr_scans: int = 50):
    import jax
    import jax.numpy as jnp

    from lattice_net_tpu.config import (
        EvalParams,
        LatticeParams,
        load_config,
        model_params_from_config,
    )
    from lattice_net_tpu.lattice.structure import build_hierarchy, default_capacity_schedule
    from lattice_net_tpu.models import LNN, prepare_cloud
    from lattice_net_tpu.parallel import make_batch
    from lattice_net_tpu.train.checkpoint import load_checkpoint
    from lattice_net_tpu.train.ln_train import create_loader

    cfg = load_config(config_path)
    ep = EvalParams.from_config(cfg)
    lp = LatticeParams.from_config(cfg)
    loader = create_loader(ep.dataset_name, cfg, "test")
    mp = model_params_from_config(cfg, loader.nr_classes)
    sigma = lp.sigmas[0] if len(set(lp.sigmas)) == 1 else np.asarray(lp.sigmas)
    caps = default_capacity_schedule(lp.hash_table_capacity, mp.nr_downsamples)

    first = loader.get_cloud(0)
    n_points = 1 << int(np.ceil(np.log2(max(len(first.V), 512))))
    model = LNN(mp)
    b0 = make_batch([prepare_cloud(first, mp)], mp, n_points)
    h0 = build_hierarchy(
        b0["positions"][0], sigma, mp.nr_downsamples, caps, point_mask=b0["point_mask"][0]
    )
    params = model.init(jax.random.PRNGKey(0), h0, b0["positions"][0], b0["values"][0])
    if checkpoint or ep.checkpoint_path:
        from lattice_net_tpu.train.checkpoint import load_params

        params = load_params(checkpoint or ep.checkpoint_path, params)

    @jax.jit
    def predict(params, positions, values, point_mask):
        h = build_hierarchy(positions, sigma, mp.nr_downsamples, caps, point_mask=point_mask)
        logp, _ = model.apply(params, h, positions, values)
        return jnp.argmax(logp, axis=-1)

    # warm up the compile before the clock starts (sensor streams don't wait)
    predict(params, b0["positions"][0], b0["values"][0], b0["point_mask"][0]).block_until_ready()

    period = 1.0 / rate_hz
    latencies, misses = [], 0
    t_next = time.perf_counter()
    scans = 0
    while scans < nr_scans:
        for cloud in loader:
            if scans >= nr_scans:
                break
            batch = make_batch([prepare_cloud(cloud, mp)], mp, n_points)
            now = time.perf_counter()
            if now < t_next:
                time.sleep(t_next - now)
            t0 = time.perf_counter()
            predict(
                params, batch["positions"][0], batch["values"][0], batch["point_mask"][0]
            ).block_until_ready()
            dt = time.perf_counter() - t0
            latencies.append(dt)
            if dt > period:
                misses += 1
            t_next = max(t_next + period, time.perf_counter())
            scans += 1

    lat = np.asarray(latencies) * 1000
    print(
        f"streamed {scans} scans @ {rate_hz} Hz: "
        f"latency p50 {np.percentile(lat, 50):.2f} ms  p95 {np.percentile(lat, 95):.2f} ms  "
        f"max {lat.max():.2f} ms  deadline misses {misses}/{scans}"
    )
    return lat


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--rate-hz", type=float, default=10.0)
    ap.add_argument("--nr-scans", type=int, default=50)
    args = ap.parse_args()
    run(args.config, args.checkpoint, args.rate_hz, args.nr_scans)


if __name__ == "__main__":
    main()
