"""CPU-isolated trainer setup worker.

Runs the one-off setup computations (optional capacity scout + first
hierarchy build + parameter init) in a SEPARATE pure-CPU process so the
chip-holding trainer process never initializes the XLA:CPU backend.

Why this exists (round-5 crash forensics, docs/runs/onestep_r5*.log):
the round-4 trainer ran setup jitted under ``jax.default_device(cpu)``
inside the axon-platform process, and every post-setup trainer run
eventually died with ``INVALID_ARGUMENT`` on a train-step re-dispatch —
while round 3's trainer (no CPU-backend use) ran 1360 steps clean, and
bench.py (no CPU-backend use) runs for hours.  Process isolation removes
the mixed-backend state entirely; PRNG draws are backend-deterministic,
so the resulting params are bit-identical to the in-process CPU path.

The pure functions (`scout_occupancy`, `build_and_init`) are also called
IN-PROCESS when the trainer itself runs on the CPU backend (tests, CPU
hosts) — the subprocess hop is only taken on an accelerator platform.

Protocol: ``python -m lattice_net_tpu.train.setup_worker IN.pkl OUT.pkl``
with IN = {mp, sigma, caps, pos?, mask?, values?, scout?: {clouds, caps,
headroom, cap_limits}}; OUT = {params?, nr_verts?, occ_max?, caps}.
"""

from __future__ import annotations

import pickle
import sys


def scout_occupancy(mp, sigma, scout_caps, clouds, headroom, cap_limits):
    """Max per-level occupancy over ``clouds`` at the upper-bound schedule,
    bucketed into a final capacity schedule.  Pads each cloud to the largest
    scout size so ONE compile covers all clouds."""
    import jax
    import numpy as np

    from lattice_net_tpu.lattice.structure import (
        build_hierarchy,
        capacity_schedule_from_occupancy,
    )

    clouds = [np.asarray(v, np.float32) for v in clouds]
    n_scout = max(len(v) for v in clouds)
    scout_build = jax.jit(
        lambda p, m: tuple(
            (s.nr_verts, s.nr_overflow)
            for s in build_hierarchy(
                p, sigma, mp.nr_downsamples, tuple(scout_caps), point_mask=m
            ).structures
        )
    )
    occ_max = np.zeros(mp.nr_downsamples + 1, np.int64)
    for v in clouds:
        pad = np.zeros((n_scout - len(v), v.shape[1]), np.float32)
        mask = np.arange(n_scout) < len(v)
        counts = jax.device_get(scout_build(np.concatenate([v, pad]), mask))
        occ = np.asarray([int(nv) + int(ov) for nv, ov in counts])
        occ_max = np.maximum(occ_max, occ)
    caps = capacity_schedule_from_occupancy(occ_max, headroom)
    caps = tuple(min(c, m) for c, m in zip(caps, cap_limits))
    return occ_max, caps


def build_and_init(mp, sigma, caps, pos, mask, values):
    """First hierarchy build + model.init, jitted; returns (host-numpy
    params, L0 vertex count)."""
    import jax
    import numpy as np

    from lattice_net_tpu.lattice.structure import build_hierarchy
    from lattice_net_tpu.models import LNN

    pos = np.asarray(pos, np.float32)
    mask = np.asarray(mask, bool)
    values = np.asarray(values, np.float32)
    h0 = jax.jit(
        lambda p, m: build_hierarchy(
            p, sigma, mp.nr_downsamples, tuple(caps), point_mask=m
        )
    )(pos, mask)
    model = LNN(mp)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), h0, pos, values)
    return jax.device_get(params), int(h0.structures[0].nr_verts)


def main():
    in_path, out_path = sys.argv[1], sys.argv[2]
    import jax

    # force CPU before first backend touch; this is a fresh process so the
    # config route is authoritative even under the ambient axon preset
    jax.config.update("jax_platforms", "cpu")

    with open(in_path, "rb") as f:
        job = pickle.load(f)
    mp, sigma = job["mp"], job["sigma"]
    caps = tuple(job["caps"])
    out = {}
    if job.get("scout") is not None:
        sc = job["scout"]
        out["occ_max"], caps = scout_occupancy(
            mp, sigma, sc["caps"], sc["clouds"], sc["headroom"], sc["cap_limits"]
        )
    if job.get("pos") is not None:
        out["params"], out["nr_verts"] = build_and_init(
            mp, sigma, caps, job["pos"], job["mask"], job["values"]
        )
    out["caps"] = caps
    with open(out_path, "wb") as f:
        pickle.dump(out, f)


if __name__ == "__main__":
    main()
