"""Streaming (sensor-rate) inference harness.

The reference's ``ln_eval_cloud_ros.py`` consumes a ROS bag at sensor rate
and runs the model per incoming cloud with a live viewer
(``/root/reference/latticenet_py/ln_eval_cloud_ros.py:90-156``).  The
TPU-native equivalent is an offline scan-stream simulator: scans arrive on a
wall-clock schedule (default 10 Hz, the Velodyne HDL-64 rate), each is padded
to the static point budget, shipped to the device, and pushed through the
jitted forward; the harness reports per-scan latency percentiles and the
fraction of deadline misses — the "inference at sensor rate" workload of
SURVEY.md §3.5.

Pipeline structure (what a real sensor node does):

  * only the fields the forward consumes ship to the device (positions,
    values, point_mask — NOT the labels; they stay on host for scoring);
  * transfers and compute are ASYNC and depth-1 pipelined: scan k+1's
    host-prep + H2D overlaps scan k's forward, so steady-state throughput is
    max(transfer, compute), not their sum;
  * three numbers come out: compute-only latency (device-resident inputs,
    chained — comparable to bench.py), end-to-end latency
    (arrival -> prediction ready, including H2D), and deadline misses
    against the sensor period.

NOTE on this environment: the TPU is reached over a network tunnel whose
host->device bandwidth is ~2 orders of magnitude below a host-attached
PCIe/ICI link, so end-to-end latency here is transfer-dominated; the
compute-only row is the hardware-meaningful one.  Both are printed.

Usage: ``python -m lattice_net_tpu.train.ln_eval_stream <config.cfg>
[--rate-hz 10] [--nr-scans 100]``
"""

from __future__ import annotations

import argparse
import collections
import time

import numpy as np


def _prep_np(cloud, mp, n_points):
    """Host-side prep: features + padding, numpy only (no device traffic)."""
    from lattice_net_tpu.models import prepare_cloud

    positions, values, _target = prepare_cloud(cloud, mp)
    n = positions.shape[0]
    if n > n_points:
        positions, values = positions[:n_points], values[:n_points]
        n = n_points
    pad = n_points - n
    return {
        "positions": np.pad(np.asarray(positions, np.float32), ((0, pad), (0, 0))),
        "values": np.pad(np.asarray(values, np.float32), ((0, pad), (0, 0))),
        "point_mask": np.arange(n_points) < n,
    }


def run(
    config_path: str,
    checkpoint: str = "",
    rate_hz: float = 10.0,
    nr_scans: int = 50,
    overrides=(),
):
    import jax
    import jax.numpy as jnp

    from lattice_net_tpu.train.ln_eval import setup_predictor

    s = setup_predictor(config_path, checkpoint, overrides)
    loader, mp, n_points = s.loader, s.mp, s.n_points

    def to_device(np_batch):
        # async H2D; the arrays become ready in the background
        return {k: jnp.asarray(v) for k, v in np_batch.items()}

    def predict(dev_batch):
        # the full-batch dict predictor also carries target/b-dims; feed the
        # 3 forward inputs in its expected (b=1) layout
        batch = {
            "positions": dev_batch["positions"][None],
            "values": dev_batch["values"][None],
            "point_mask": dev_batch["point_mask"][None],
        }
        return s.predict_fn(batch)

    # ---- warm up the compile before the clock starts ----------------------
    first_np = _prep_np(loader.get_cloud(0), mp, n_points)
    b0 = to_device(first_np)
    pred0 = predict(b0)
    pred0.block_until_ready()

    # ---- compute-only latency: device-resident inputs, chained dispatch ---
    # (the bench.py-comparable number: what the forward costs on the chip).
    # The feedback MUST live inside the jitted step: building it with eager
    # ops dispatches ~5 tiny programs per iteration over the axon tunnel,
    # whose first-call compiles dominated the loop (~7.4 s/iter observed).
    def _chain_step(b, pos):
        p = predict({**b, "positions": pos})
        fb = (jnp.sum(p) % 2).astype(jnp.float32) * 1e-12
        return p, pos + fb

    chain = jax.jit(_chain_step)
    pos = b0["positions"]
    p, pos = chain(b0, pos)  # warm the chained program
    jax.block_until_ready((p, pos))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        p, pos = chain(b0, pos)
    p.block_until_ready()
    compute_ms = (time.perf_counter() - t0) / iters * 1000

    # ---- one-off H2D cost of a scan's inputs (the tunnel/link term) -------
    t0 = time.perf_counter()
    b1 = to_device(first_np)
    jax.block_until_ready(b1)
    h2d_ms = (time.perf_counter() - t0) * 1000
    nbytes = sum(v.nbytes for v in first_np.values())

    # ---- the stream: arrivals on the sensor clock, depth-1 pipeline -------
    period = 1.0 / rate_hz
    latencies, misses = [], 0
    inflight = collections.deque()  # (t_arrival, prediction)

    def drain_one():
        nonlocal misses
        t_arr, out = inflight.popleft()
        out.block_until_ready()
        dt = time.perf_counter() - t_arr
        latencies.append(dt)
        if dt > period:
            misses += 1

    scans = 0
    t_start = time.perf_counter()
    while scans < nr_scans:
        for cloud in loader:
            if scans >= nr_scans:
                break
            np_batch = _prep_np(cloud, mp, n_points)  # host work, off-deadline
            t_due = t_start + scans * period
            now = time.perf_counter()
            if now < t_due:
                time.sleep(t_due - now)
            t_arr = time.perf_counter()
            out = predict(to_device(np_batch))  # async H2D + forward
            inflight.append((t_arr, out))
            if len(inflight) > 1:  # block one behind: overlap next transfer
                drain_one()
            scans += 1
    while inflight:
        drain_one()
    wall_s = time.perf_counter() - t_start

    lat = np.asarray(latencies) * 1000
    print(
        f"compute-only latency (chained, device-resident): {compute_ms:.2f} ms; "
        f"H2D per scan: {h2d_ms:.2f} ms for {nbytes / 1e6:.2f} MB "
        f"({nbytes / 1e3 / max(h2d_ms, 1e-9):.1f} MB/s)"
    )
    print(
        f"streamed {scans} scans @ {rate_hz} Hz: "
        f"end-to-end latency p50 {np.percentile(lat, 50):.2f} ms  "
        f"p95 {np.percentile(lat, 95):.2f} ms  "
        f"max {lat.max():.2f} ms  deadline misses {misses}/{scans}  "
        f"sustained {scans / wall_s:.2f} scans/s"
    )
    return lat


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--rate-hz", type=float, default=10.0)
    ap.add_argument("--nr-scans", type=int, default=50)
    ap.add_argument(
        "overrides",
        nargs="*",
        help="config overrides of the form section.key=value",
    )
    args = ap.parse_args()
    run(args.config, args.checkpoint, args.rate_hz, args.nr_scans, args.overrides)


if __name__ == "__main__":
    main()
