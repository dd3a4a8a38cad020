"""Training CLI: ``python -m lattice_net_tpu.train.ln_train <config.cfg> [overrides]``.

TPU-native rebuild of the reference trainer (``latticenet_py/ln_train.py``):
same config schema, phases, callbacks, sanity heuristics and loss recipe —
but the step (hierarchy build + forward + loss + backward + optimizer) is one
jitted XLA program with zero per-layer host syncs, batching via vmap, and
optional data parallelism over a device mesh.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def create_loader(dataset_name: str, cfg: dict, mode: str):
    """Dataset registry (reference ``ln_train.py:44-55``)."""
    from lattice_net_tpu.data.toy import ToyDataset
    from lattice_net_tpu.data.transforms import TransformParams

    if dataset_name == "toy":
        l = cfg.get("loader_toy", {})
        return ToyDataset(
            mode=mode,
            nr_samples=int(l.get("nr_samples", 20)),
            n_points=int(l.get("n_points", 2000)),
            do_overfit=bool(l.get("do_overfit", False)),
        )
    if dataset_name == "shapenet":
        from lattice_net_tpu.data.shapenet import ShapeNetPartSeg

        l = cfg.get("loader_shapenet_partseg", {})
        return ShapeNetPartSeg(
            dataset_path=l.get("dataset_path", ""),
            mode=mode,
            restrict_to_object=l.get("restrict_to_object", "motorbike"),
            shuffle=bool(l.get("shuffle", True)),
            do_overfit=bool(l.get("do_overfit", False)),
            normalize=bool(l.get("normalize", False)),
            transform=TransformParams.from_config(l.get("transformer", {})),
        )
    if dataset_name == "semantickitti":
        from lattice_net_tpu.data.semantic_kitti import SemanticKitti

        l = cfg.get("loader_semantic_kitti", {})
        return SemanticKitti(
            dataset_path=l.get("dataset_path", ""),
            mode=mode,
            cap_distance=float(l.get("cap_distance", 60.0)),
            max_nr_points_per_cloud=int(l.get("max_nr_points_per_cloud", 400000)),
            shuffle=bool(l.get("shuffle", True)),
            do_overfit=bool(l.get("do_overfit", False)),
        )
    if dataset_name == "scannet":
        from lattice_net_tpu.data.scannet import ScanNet

        l = cfg.get("loader_scannet", {})
        return ScanNet(
            dataset_path=l.get("dataset_path", ""),
            mode=mode,
            max_nr_points_per_cloud=int(l.get("max_nr_points_per_cloud", 400000)),
            shuffle=bool(l.get("shuffle", True)),
            do_overfit=bool(l.get("do_overfit", False)),
        )
    raise ValueError(f"unknown dataset {dataset_name}")


def sanity_check(nr_verts: int, nr_points: int, capacity: int) -> None:
    """Heuristics from the reference (``ln_train.py:57-81``)."""
    if nr_verts < 100:
        print(f"WARNING: only {nr_verts} vertices — sigma is probably too big")
    if nr_verts > nr_points:
        print(f"WARNING: {nr_verts} vertices > {nr_points} points — sigma too small")
    if nr_verts > 0.25 * capacity:
        print(
            f"WARNING: lattice at {nr_verts}/{capacity} (> 25% capacity): "
            "increase hash_table_capacity"
        )


def run(config_path: str, max_epochs: int = 100, n_points: int = 0, eval_every: int = 1):
    import jax
    import jax.numpy as jnp

    from lattice_net_tpu.config import LatticeParams, TrainParams, load_config, model_params_from_config
    from lattice_net_tpu.lattice.structure import build_hierarchy, default_capacity_schedule
    from lattice_net_tpu.models import LNN, prepare_cloud
    from lattice_net_tpu.parallel import TrainState, make_batch, make_loss_fn, make_train_step
    from lattice_net_tpu.train import make_optimizer
    from lattice_net_tpu.train.callbacks import (
        CallbacksGroup,
        CheckpointCallback,
        Phase,
        StateCallback,
        TensorboardCallback,
        TimingCallback,
    )

    cfg = load_config(config_path)
    tp = TrainParams.from_config(cfg)
    lp = LatticeParams.from_config(cfg)

    loader_train = create_loader(tp.dataset_name, cfg, "train")
    try:
        loader_test = create_loader(tp.dataset_name, cfg, "val")
    except (FileNotFoundError, ValueError):
        loader_test = create_loader(tp.dataset_name, cfg, "test")

    nr_classes = loader_train.nr_classes
    ignore_index = getattr(loader_train, "ignore_index", -1)
    mp = model_params_from_config(cfg, nr_classes)
    sigma = lp.sigmas[0] if len(set(lp.sigmas)) == 1 else np.asarray(lp.sigmas)
    caps = default_capacity_schedule(lp.hash_table_capacity, mp.nr_downsamples)

    # static point budget: next pow2 over the dataset's first cloud
    if n_points <= 0:
        first = loader_train.get_cloud(0)
        n_points = 1 << int(np.ceil(np.log2(max(len(first.V), 512))))
    print(f"n_points={n_points} caps={caps} sigma={sigma} classes={nr_classes}")

    model = LNN(mp)
    schedule = "cosine_warm_restarts" if tp.dataset_name == "semantickitti" else "none"
    tx = make_optimizer(tp.lr, tp.weight_decay, schedule, t0_steps=3 * len(loader_train))

    def batch_of(cloud):
        return make_batch([prepare_cloud(cloud, mp)], mp, n_points)

    b0 = batch_of(loader_train.get_cloud(0))
    h0 = build_hierarchy(
        b0["positions"][0], sigma, mp.nr_downsamples, caps, point_mask=b0["point_mask"][0]
    )
    sanity_check(int(h0.structures[0].nr_verts), int(b0["point_mask"][0].sum()), caps[0])
    params = model.init(jax.random.PRNGKey(0), h0, b0["positions"][0], b0["values"][0])
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model parameters: {n_params:,}")

    state = TrainState.create(params, tx)
    train_step = jax.jit(make_train_step(model, tx, sigma, mp.nr_downsamples, caps, ignore_index))
    loss_fn = make_loss_fn(model, sigma, mp.nr_downsamples, caps, ignore_index)
    eval_step = jax.jit(lambda params, batch: loss_fn(params, batch, jax.random.PRNGKey(0), False))

    ckpt_dir = Path(tp.checkpoint_path or "checkpoints")
    cbs = [StateCallback(nr_classes, ignore_index), TimingCallback()]
    if tp.save_checkpoint:
        cbs.append(CheckpointCallback(ckpt_dir, lambda: state, True))
    if tp.with_tensorboard:
        cbs.append(TensorboardCallback("tensorboard_logs", tp.dataset_name))
    cb = CallbacksGroup(cbs)

    phases = [Phase("train", loader_train, grad=True), Phase("test", loader_test, grad=False)]
    rng = jax.random.PRNGKey(1)

    for epoch in range(max_epochs):
        for phase in phases:
            if not phase.grad and epoch % eval_every != 0:
                continue
            cb.epoch_started(phase=phase)
            cb.phase_started(phase=phase)
            for cloud in phase.loader:
                batch = batch_of(cloud)
                if phase.grad:
                    rng, step_rng = jax.random.split(rng)
                    state, metrics = train_step(state, batch, step_rng)
                else:
                    _, metrics = eval_step(state.params, batch)
                cb.after_forward_pass(
                    phase=phase,
                    loss=float(metrics["loss"]),
                    inter=np.asarray(metrics["iou_intersection"]),
                    union=np.asarray(metrics["iou_union"]),
                )
            cb.phase_ended(phase=phase)
            cb.epoch_ended(phase=phase)
    return state


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="path to a .cfg file (configuru format)")
    ap.add_argument("--max-epochs", type=int, default=100)
    ap.add_argument("--n-points", type=int, default=0, help="static point budget (0 = auto)")
    ap.add_argument("--eval-every", type=int, default=1)
    args = ap.parse_args()
    run(args.config, args.max_epochs, args.n_points, args.eval_every)


if __name__ == "__main__":
    main()
