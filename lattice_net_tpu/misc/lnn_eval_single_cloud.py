"""Run the model on ONE cloud file and dump visual diagnostics.

Rebuild of ``misc/lnn_eval_single_mesh.py`` (which loads one mesh, forwards
it and shows prediction/confidence in the viewer): loads a single scan
(KITTI ``.bin``, ``.pts`` text, or ``.npy``/``.npz`` array), restores a
checkpoint, predicts every point (chunked if the cloud exceeds the static
budget) and writes prediction / confidence / GT-diff PLYs.

    python -m lattice_net_tpu.misc.lnn_eval_single_cloud <config.cfg> \
        --cloud scan.bin --checkpoint last.ckpt -o /tmp/single
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def load_cloud(path: str):
    p = Path(path)
    if p.suffix == ".bin":
        raw = np.fromfile(p, dtype=np.float32).reshape(-1, 4)
        return raw[:, :3], raw[:, 3:4]
    if p.suffix == ".pts":
        xyz = np.loadtxt(p, dtype=np.float32).reshape(-1, 3)
        return xyz, np.zeros((len(xyz), 1), np.float32)
    if p.suffix == ".npy":
        xyz = np.load(p).astype(np.float32)
        return xyz[:, :3], np.zeros((len(xyz), 1), np.float32)
    if p.suffix == ".npz":
        z = np.load(p)
        xyz = z["points"].astype(np.float32)
        return xyz[:, :3], np.zeros((len(xyz), 1), np.float32)
    raise ValueError(f"unsupported cloud format {p.suffix}")


def main():
    import jax

    from lattice_net_tpu.config import LatticeParams, load_config, model_params_from_config
    from lattice_net_tpu.lattice.structure import build_hierarchy, default_capacity_schedule
    from lattice_net_tpu.misc import viz
    from lattice_net_tpu.models import LNN
    from lattice_net_tpu.parallel import make_batch
    from lattice_net_tpu.train.checkpoint import load_checkpoint
    from lattice_net_tpu.train.ln_eval import predict_cloud_chunked

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--cloud", required=True)
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--nr-classes", type=int, default=20)
    ap.add_argument("-o", "--out", default="single_cloud_out")
    args = ap.parse_args()

    cfg = load_config(args.config)
    lp = LatticeParams.from_config(cfg)
    mp = model_params_from_config(cfg, args.nr_classes)
    sigma = lp.sigmas[0] if len(set(lp.sigmas)) == 1 else np.asarray(lp.sigmas)
    caps = default_capacity_schedule(lp.hash_table_capacity, mp.nr_downsamples)

    xyz, intensity = load_cloud(args.cloud)
    values = np.zeros((len(xyz), 1), np.float32)
    target = np.zeros(len(xyz), np.int32)
    n_points = 1 << int(np.ceil(np.log2(max(min(len(xyz), 1 << 17), 512))))

    model = LNN(mp)
    b0 = make_batch([(xyz[:n_points], values[:n_points], target[:n_points])], mp, n_points)
    h0 = build_hierarchy(
        b0["positions"][0], sigma, mp.nr_downsamples, caps, point_mask=b0["point_mask"][0]
    )
    params = model.init(jax.random.PRNGKey(0), h0, b0["positions"][0], b0["values"][0])
    if args.checkpoint:
        from lattice_net_tpu.train.checkpoint import load_params

        params = load_params(args.checkpoint, params)
        print(f"restored {args.checkpoint}")

    @jax.jit
    def _logp(params, batch):
        h = build_hierarchy(
            batch["positions"][0], sigma, mp.nr_downsamples, caps,
            point_mask=batch["point_mask"][0],
        )
        logp, _ = model.apply(params, h, batch["positions"][0], batch["values"][0])
        return logp

    pred = predict_cloud_chunked(
        lambda b: jax.numpy.argmax(_logp(params, b), axis=-1),
        (xyz, values, target), n_points, mp,
    )
    # confidence on the first chunk (representative; full-cloud logp would
    # need stitching the (N, C) matrix which is rarely worth the memory)
    b = make_batch([(xyz[:n_points], values[:n_points], target[:n_points])], mp, n_points)
    logp0 = np.asarray(_logp(params, b))[: min(len(xyz), n_points)]

    out = Path(args.out)
    viz.prediction_cloud(out / "prediction.ply", xyz, pred, args.nr_classes)
    viz.confidence_cloud(out / "confidence.ply", xyz[: len(logp0)], logp0)
    counts = np.bincount(pred, minlength=args.nr_classes)
    for c in np.nonzero(counts)[0]:
        print(f"class {c}: {counts[c]} points")
    print(f"PLYs written to {out}/")


if __name__ == "__main__":
    main()
