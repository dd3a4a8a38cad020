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
    from lattice_net_tpu.models import prepare_cloud
    from lattice_net_tpu.parallel import make_batch
    from lattice_net_tpu.train.ln_eval import setup_predictor

    s = setup_predictor(config_path, checkpoint)
    loader, mp, n_points = s.loader, s.mp, s.n_points
    predict = lambda batch: s.predict_fn(batch)

    # warm up the compile before the clock starts (sensor streams don't wait)
    first = loader.get_cloud(0)
    b0 = make_batch([prepare_cloud(first, mp)], mp, n_points)
    predict(b0).block_until_ready()

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
            predict(batch).block_until_ready()
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
