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

  * only the fields the forward consumes ship to the device — and in a
    compact WIRE FORMAT (``--wire``): the padding mask never ships (points
    pad at the end, so one scalar count reconstructs it on-device), and
    positions/values ship as f16 or scale-quantized i16 (one fused array =
    one transfer), decoded inside the jitted program.  f32 xyz+values+mask
    is 2.23 MB/scan at the KITTI budget; i16 is 1.05 MB.
  * a dedicated TRANSFER thread owns H2D: it forces each copy to completion
    (``block_until_ready``) so scan k+1's transfer genuinely overlaps scan
    k's forward even when the runtime defers copies until first use —
    steady-state throughput is max(transfer, compute), not their sum;
  * three numbers come out: compute-only latency (device-resident inputs,
    chained — comparable to bench.py), end-to-end latency
    (arrival -> prediction ready, including H2D), and deadline misses
    against the sensor period.

NOTE on this environment: the TPU is reached over a network tunnel whose
host->device bandwidth is ~2 orders of magnitude below a host-attached
PCIe/ICI link, so end-to-end latency here is transfer-dominated; the
compute-only row is the hardware-meaningful one.  Both are printed.

Usage: ``python -m lattice_net_tpu.train.ln_eval_stream <config.cfg>
[--rate-hz 10] [--nr-scans 100] [--wire {f32,f16,i16}]``
"""

from __future__ import annotations

import argparse
import collections
import queue as queue_mod
import threading
import time

import os

import numpy as np

# i16 wire quantization: symmetric round-to-nearest with a per-scan scale.
# At the KITTI 60 m range the resolution is 60/32767 = 1.8 mm — two orders
# below sigma_0 (0.6 m), so simplex assignments are unchanged for all but
# boundary-epsilon points.
_I16_MAX = 32767.0


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
        "n_valid": np.int32(n),
    }


def _encode(np_batch, wire: str):
    """Pack one scan into its wire format (host side, numpy).

    All formats fuse positions+values into ONE array so a scan pays one
    transfer, and ship the valid count as a scalar instead of an (N,) mask.
    """
    pos, val, n = np_batch["positions"], np_batch["values"], np_batch["n_valid"]
    fused = np.concatenate([pos, val], axis=1)
    if wire == "f32":
        return {"fused": fused, "n_valid": n, "scale": np.float32(1.0)}
    if wire == "f16":
        return {"fused": fused.astype(np.float16), "n_valid": n,
                "scale": np.float32(1.0)}
    if wire == "i16":
        scale = np.float32(max(np.abs(fused).max(), 1e-6) / _I16_MAX)
        q = np.clip(np.rint(fused / scale), -_I16_MAX, _I16_MAX).astype(np.int16)
        return {"fused": q, "n_valid": n, "scale": scale}
    raise ValueError(f"unknown wire format {wire!r}")


def _make_decode_predict(predict_fn, d_pos: int, n_points: int, wire: str):
    """One jitted program: wire decode + forward (decode is ~free on device)."""
    import jax
    import jax.numpy as jnp

    def fn(params, wire_batch):
        fused = wire_batch["fused"].astype(jnp.float32)
        if wire == "i16":
            fused = fused * wire_batch["scale"]
        mask = jnp.arange(n_points, dtype=jnp.int32) < wire_batch["n_valid"]
        batch = {
            "positions": fused[:, :d_pos][None],
            "values": fused[:, d_pos:][None],
            "point_mask": mask[None],
        }
        return predict_fn(params, batch)

    # returned UN-jitted: the stream composes this inside its single jitted
    # chain program (nested pjit calls no longer re-dispatch on axon)
    return fn


def run(
    config_path: str,
    checkpoint: str = "",
    rate_hz: float = 10.0,
    nr_scans: int = 50,
    overrides=(),
    wire: str = "f16",
):
    import jax
    import jax.numpy as jnp

    from lattice_net_tpu.train.ln_eval import setup_predictor

    s = setup_predictor(config_path, checkpoint, overrides)
    loader, mp, n_points = s.loader, s.mp, s.n_points

    first_np = _prep_np(loader.get_cloud(0), mp, n_points)
    d_pos = first_np["positions"].shape[1]
    # compose the UN-jitted, params-as-argument predictor: nesting the
    # jitted one would put a nested pjit call in the program, which no
    # longer re-dispatches on the axon runtime (see setup_predictor notes)
    predict = _make_decode_predict(s.predict_impl_p, d_pos, n_points, wire)

    # LNT_STREAM_ARGS=numpy: hand the jitted program HOST numpy batches and
    # let dispatch do the implicit H2D — the trainer's proven argument style
    # on the axon runtime (its loop feeds fresh numpy every step).  Default
    # "device" keeps the explicit transfer-thread overlap.
    arg_mode = os.environ.get("LNT_STREAM_ARGS", "device")

    def to_device(wire_batch):
        if arg_mode == "numpy":
            return wire_batch
        dev = {k: jnp.asarray(v) for k, v in wire_batch.items()}
        jax.block_until_ready(dev)  # force the copy NOW, on this thread
        return dev

    # ---- ONE jitted program for the whole process --------------------------
    # Two hard-won axon-runtime rules (docs/runs/onestep_r5_eval*.log and
    # this harness's own round-5 failures):
    #   1. only ONE distinct large executable per process reliably
    #      re-dispatches — so warm-up, the compute-only timing loop, and the
    #      stream below all dispatch THIS program;
    #   2. a re-dispatch must CHANGE its dominant input buffer — a
    #      scalar-token chain over identical scan buffers still died, while
    #      every working pattern in this repo (bench's forward/train loops,
    #      the trainer's step and fused eval) threads its largest array
    #      through each call.  The timing loop therefore carries the fused
    #      scan payload output→input (the parity feedback is numerically
    #      negligible and cannot constant-fold), and each stream dispatch
    #      feeds a freshly-transferred scan.
    # params as an ARGUMENT (bench.py-style), not a 3.4 MB closure constant:
    # the one structural difference left between this program and bench's
    # proven forward_chain after the round-5 bisect
    def _chain_step(params, b, fused):
        p = predict(params, {**b, "fused": fused})
        fb = (jnp.sum(p) % 2).astype(jnp.float32) * 1e-6
        return p, (fused.astype(jnp.float32) + fb).astype(fused.dtype)

    chain_p = jax.jit(_chain_step)
    params_dev = jax.device_put(s.params)

    def chain(b, fused):
        p, f = chain_p(params_dev, b, fused)
        return p, f

    # session warm-up: one tiny eager compute op before the big program.
    # Empirical axon rule (round 5): processes that ran some eager device
    # compute before their large program (bench, the trainer's class-weight
    # ops) re-dispatch fine; this harness — whose setup moved into a
    # subprocess — dispatched nothing eager and died on the program's
    # SECOND dispatch however the arguments were chained/blocked.
    float(jnp.arange(8.0).sum().block_until_ready())

    w0 = _encode(first_np, wire)
    b0 = to_device(w0)
    fused = b0["fused"]
    p, fused = chain(b0, fused)  # warm the program
    jax.block_until_ready((p, fused))

    # ---- compute-only latency: device-resident inputs, chained dispatch ---
    # (the bench.py-comparable number: what the forward costs on the chip).
    # Blocked per iteration: the only dispatch pattern the current axon
    # runtime sustains from this harness (unblocked pipelining of this
    # program died with INVALID_ARGUMENT even fully chained; the trainer's
    # proven loop also blocks every step).  Includes ~1.5 ms of dispatch
    # latency per iteration as a result — stated rather than hidden.
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        p, fused = chain(b0, fused)
        p.block_until_ready()
    compute_ms = (time.perf_counter() - t0) / iters * 1000

    # ---- one-off H2D cost of a scan's inputs (the tunnel/link term) -------
    # measured with an explicit transfer regardless of arg_mode
    t0 = time.perf_counter()
    jax.block_until_ready({k: jnp.asarray(v) for k, v in w0.items()})
    h2d_ms = (time.perf_counter() - t0) * 1000
    nbytes = sum(np.asarray(v).nbytes for v in w0.values())

    # ---- the stream: arrivals on the sensor clock -------------------------
    # TRANSFER THREAD: paces arrivals, encodes, and forces each H2D to
    # completion so it overlaps the main thread's in-flight forward.
    period = 1.0 / rate_hz
    ready: queue_mod.Queue = queue_mod.Queue(maxsize=2)  # depth-2 pipeline

    # Pre-encode every scan BEFORE the clock starts: scan synthesis/decode
    # is the SIMULATOR's cost (a real sensor delivers finished scans at the
    # wire); only the node's own work — H2D + forward — belongs on the
    # deadline.  (The r3/r4-early runs paid ~300 ms/scan of procedural scene
    # generation inside the timed loop, hiding the true pipeline rate.)
    encoded = []
    while len(encoded) < nr_scans:
        for cloud in loader:
            if len(encoded) >= nr_scans:
                break
            encoded.append(_encode(_prep_np(cloud, mp, n_points), wire))

    def producer():
        t_start = time.perf_counter()
        for scans, wb in enumerate(encoded):
            t_due = t_start + scans * period
            now = time.perf_counter()
            if now < t_due:
                time.sleep(t_due - now)
            t_arr = time.perf_counter()
            ready.put((t_arr, to_device(wb)))  # forced H2D on this thread
        ready.put(None)

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

    th = threading.Thread(target=producer, daemon=True)
    t_start = time.perf_counter()
    th.start()
    scans = 0
    while True:
        item = ready.get()
        if item is None:
            break
        t_arr, dev = item
        # same single program; this scan's freshly-transferred payload IS
        # the changing dominant buffer (rule 2 above)
        p, _ = chain(dev, dev["fused"])
        inflight.append((t_arr, p))
        if len(inflight) > 1:  # block one behind: overlap next transfer
            drain_one()
        scans += 1
    while inflight:
        drain_one()
    th.join()
    wall_s = time.perf_counter() - t_start

    lat = np.asarray(latencies) * 1000
    print(
        f"wire={wire}: {nbytes / 1e6:.2f} MB/scan; compute-only latency "
        f"(chained, device-resident): {compute_ms:.2f} ms; H2D per scan: "
        f"{h2d_ms:.2f} ms ({nbytes / 1e3 / max(h2d_ms, 1e-9):.1f} MB/s)"
    )
    print(
        f"streamed {scans} scans @ {rate_hz} Hz: "
        f"end-to-end latency p50 {np.percentile(lat, 50):.2f} ms  "
        f"p95 {np.percentile(lat, 95):.2f} ms  "
        f"max {lat.max():.2f} ms  deadline misses {misses}/{scans}  "
        f"sustained {scans / wall_s:.2f} scans/s "
        f"(pipeline floor max(H2D, compute) = "
        f"{max(h2d_ms, compute_ms):.1f} ms -> "
        f"{1000.0 / max(h2d_ms, compute_ms):.2f} scans/s)"
    )
    # The serial tunnel link is this environment's wire, not the harness:
    # state what a directly-attached host would see as a COMPUTED line
    # (VERDICT r4 item 7), using a conservative 8 GB/s effective PCIe gen3
    # x16 H2D rate (the v5e host attach is at least this).
    pcie_h2d_ms = nbytes / 8e9 * 1000.0
    proj_ms = compute_ms + pcie_h2d_ms
    print(
        f"PCIe-host projection (computed): H2D {nbytes / 1e6:.2f} MB @ 8 GB/s = "
        f"{pcie_h2d_ms:.2f} ms; end-to-end ≈ compute {compute_ms:.2f} + H2D "
        f"{pcie_h2d_ms:.2f} = {proj_ms:.2f} ms -> clears the "
        f"{period * 1000:.0f} ms sensor deadline by {period * 1000 - proj_ms:.1f} ms "
        f"(pipeline floor {1000.0 / max(compute_ms, pcie_h2d_ms):.1f} scans/s)"
    )
    return lat


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--rate-hz", type=float, default=10.0)
    ap.add_argument("--nr-scans", type=int, default=50)
    ap.add_argument(
        "--wire",
        choices=("f32", "f16", "i16"),
        default="f16",
        help="device wire format for scan payloads (f16 halves the f32 "
        "payload; i16 scale-quantizes to 1.8 mm at 60 m range)",
    )
    ap.add_argument(
        "overrides",
        nargs="*",
        help="config overrides of the form section.key=value",
    )
    args = ap.parse_args()
    run(args.config, args.checkpoint, args.rate_hz, args.nr_scans,
        args.overrides, wire=args.wire)


if __name__ == "__main__":
    main()
