"""Root-cause the cross-process persistent-compile-cache MISS for the train
step (VERDICT r4 item 5).

Round 4 observed three differently-keyed 57 MB ``jit_train_step`` cache
entries from consecutive identical runs (~2.5-3 min recompile tax per
process).  The persistent cache key is
``hash(serialized HLO, jaxlib version, backend fingerprint, compile
options, accelerator config)`` — if any component varies per process, every
process recompiles.

This probe runs entirely on the HOST CPU backend (no chip time): it traces
and lowers the PRODUCTION train step at the bench shapes (mirroring
bench.py's construction exactly), then prints the hash of each cache-key
component separately.  Run it twice in two processes and diff:

  * serialized-HLO hash differs -> OUR trace is process-unstable (classic
    cause: PYTHONHASHSEED-randomized dict/set iteration changing HLO
    instruction order/names); re-run with PYTHONHASHSEED=0 to confirm.
  * HLO stable but compile-options/platform hash differs -> environmental
    (e.g. a per-session fingerprint in axon's compile options); document.

    python -m lattice_net_tpu.misc.cache_key_probe [--n-points 131072]
"""

from __future__ import annotations

import argparse
import hashlib
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-points", type=int, default=1 << 17)
    ap.add_argument("--cap", type=int, default=1 << 16)
    args = ap.parse_args()

    import jax

    # force CPU BEFORE any backend touch; the env-var route is too late once
    # sitecustomize has imported jax (CLAUDE.md round-2 note)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lattice_net_tpu.lattice.structure import build_hierarchy
    from lattice_net_tpu.models import LNN, ModelParams
    from lattice_net_tpu.parallel import TrainState, make_train_step
    from lattice_net_tpu.train import make_optimizer

    print(f"PYTHONHASHSEED={os.environ.get('PYTHONHASHSEED', '<unset>')}")

    # bench.py's exact configuration (the program whose 57 MB cache entry
    # missed cross-process in round 4)
    mp = ModelParams(
        nr_classes=20,
        pointnet_channels_per_layer=(16, 32),
        pointnet_start_nr_channels=32,
        nr_downsamples=2,
        nr_blocks_down_stage=(1, 1),
        nr_blocks_bottleneck=1,
        nr_blocks_up_stage=(1, 1),
        nr_levels_down_with_normal_resnet=3,
        nr_levels_up_with_normal_resnet=3,
    )
    sigma = 0.6
    n_points = args.n_points
    caps = (args.cap, args.cap // 2, args.cap // 8)

    rng_np = np.random.default_rng(0)
    pos = rng_np.uniform(-40, 40, (n_points, 3)).astype(np.float32)
    positions = jnp.asarray(pos)
    values = jnp.zeros((n_points, 1), jnp.float32)

    model = LNN(mp)
    h0 = build_hierarchy(positions, sigma, mp.nr_downsamples, caps)
    params = model.init(jax.random.PRNGKey(0), h0, positions, values)

    batch = {
        "positions": positions[None],
        "values": values[None],
        "target": jnp.asarray(
            rng_np.integers(0, 20, (1, n_points), dtype=np.int32)
        ),
        "point_mask": jnp.ones((1, n_points), bool),
    }
    tx = make_optimizer(
        1e-3, weight_decay=1e-4, schedule="cosine_warm_restarts", t0_steps=1000
    )
    state = TrainState.create(params, tx)
    train_step = make_train_step(
        model, tx, sigma, mp.nr_downsamples, caps, full_mask=True
    )

    lowered = jax.jit(train_step).lower(state, batch, jax.random.PRNGKey(2))
    computation = lowered.compiler_ir("hlo")
    serialized = computation.as_serialized_hlo_module_proto()
    print("serialized HLO bytes:", len(serialized))
    print("HLO-proto sha256:", hashlib.sha256(serialized).hexdigest())
    txt = computation.as_hlo_text().encode()
    print("HLO-text bytes:", len(txt))
    print("HLO-text sha256:", hashlib.sha256(txt).hexdigest())

    # component-wise cache key on the CPU backend (the TPU components can
    # only vary environmentally; this isolates OUR side of the key)
    try:
        from jax._src import cache_key as ck
        from jax._src import compiler as jcompiler

        backend = jax.devices("cpu")[0].client
        opts = jcompiler.get_compile_options(num_replicas=1, num_partitions=1)
        h = hashlib.sha256()
        ck._hash_serialized_compile_options(h, opts)
        print("compile-options sha256:", h.hexdigest())
        h2 = hashlib.sha256()
        ck._hash_platform(h2, backend)
        print("platform-component sha256:", h2.hexdigest())
        full = ck.get(computation, [jax.devices("cpu")[0]], opts, backend)
        print("full cache key (cpu backend):", full)
    except Exception as e:  # jax internals move between versions
        print(f"(jax-internal component hashing unavailable: {type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
