"""Compute per-class point frequencies over a dataset split (reference
``misc/compute_class_frequency.py``); feeds LNN.compute_class_weights."""

from __future__ import annotations

import argparse

import numpy as np


def run(config_path: str, max_clouds: int = 0):
    from lattice_net_tpu.config import TrainParams, load_config
    from lattice_net_tpu.train.ln_train import create_loader

    cfg = load_config(config_path)
    tp = TrainParams.from_config(cfg)
    loader = create_loader(tp.dataset_name, cfg, "train")
    counts = np.zeros(loader.nr_classes, np.int64)
    for i, cloud in enumerate(loader):
        labels = np.asarray(cloud.L_gt).reshape(-1)
        counts += np.bincount(np.clip(labels, 0, loader.nr_classes - 1), minlength=loader.nr_classes)
        if max_clouds and i + 1 >= max_clouds:
            break
    freq = counts / max(counts.sum(), 1)
    for c, (n, f) in enumerate(zip(counts, freq)):
        print(f"class {c}: {n} points ({f:.6f})")
    print("frequencies:", list(np.round(freq, 6)))
    return freq


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--max-clouds", type=int, default=0)
    args = ap.parse_args()
    run(args.config, args.max_clouds)


if __name__ == "__main__":
    main()
