"""Probe lattice occupancy vs sigma for a dataset (reference
``misc/lnn_check_lattice_size.py``): reports nr_vertices and points/vertex at
a sweep of sigmas so users can pick sigma + capacity before training."""

from __future__ import annotations

import argparse

import numpy as np


def run(config_path: str, sigmas=None):
    import jax.numpy as jnp

    from lattice_net_tpu.config import LatticeParams, TrainParams, load_config
    from lattice_net_tpu.lattice.structure import build_structure
    from lattice_net_tpu.train.ln_train import create_loader

    cfg = load_config(config_path)
    tp = TrainParams.from_config(cfg)
    lp = LatticeParams.from_config(cfg)
    loader = create_loader(tp.dataset_name, cfg, "train")
    cloud = loader.get_cloud(0)
    pos = jnp.asarray(cloud.V)
    n = len(cloud.V)
    cap = lp.hash_table_capacity
    sigmas = sigmas or [lp.sigmas[0] * f for f in (0.25, 0.5, 1.0, 2.0, 4.0)]
    print(f"{n} points, capacity {cap}")
    for s in sigmas:
        st, _, _ = build_structure(pos, float(s), cap)
        nv, ov = int(st.nr_verts), int(st.nr_overflow)
        print(
            f"sigma {s:8.4f}: {nv:8d} vertices ({n / max(nv, 1):8.1f} pts/vertex)"
            + (f"  OVERFLOW {ov}" if ov else "")
        )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    args = ap.parse_args()
    run(args.config)


if __name__ == "__main__":
    main()
