"""Headless teaser-figure maker.

Rebuild of ``latticenet_py/misc/lnn_make_teaser_img.py`` (which drives the
easypbr/surfel_renderer OpenGL viewer to screenshot selected clouds,
``lnn_make_teaser_img.py:52-104``).  A TPU host has no display, so this
emits, per selected cloud, a self-contained interactive HTML viewer
(``misc/viz_html.py``) plus exact PLY dumps (``misc/viz.py``) for
ground truth, prediction, and GT-vs-pred diff — everything needed to
compose a paper figure offline.

    python -m lattice_net_tpu.misc.lnn_make_teaser <config.cfg> \
        --checkpoint ckpt.msgpack --clouds 0 5 9 --out teaser/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default="", help="defaults to eval.checkpoint_path")
    ap.add_argument("--clouds", type=int, nargs="+", default=[0], help="cloud indices to render")
    ap.add_argument("--out", default="teaser", help="output directory")
    ap.add_argument("--max-points", type=int, default=400_000, help="HTML subsample cap")
    ap.add_argument("overrides", nargs="*", help="config overrides (section.key=value)")
    args = ap.parse_args()

    import jax

    from lattice_net_tpu.config import (
        EvalParams,
        LatticeParams,
        apply_overrides,
        load_config,
        model_params_from_config,
    )
    from lattice_net_tpu.lattice.structure import build_hierarchy, default_capacity_schedule
    from lattice_net_tpu.misc import viz
    from lattice_net_tpu.misc.viz_html import write_html_viewer
    from lattice_net_tpu.models import LNN, prepare_cloud
    from lattice_net_tpu.parallel import make_batch
    from lattice_net_tpu.train.checkpoint import load_params
    from lattice_net_tpu.train.ln_eval import predict_cloud_chunked
    from lattice_net_tpu.train.ln_train import create_loader

    cfg = apply_overrides(load_config(args.config), args.overrides)
    ep = EvalParams.from_config(cfg)
    lp = LatticeParams.from_config(cfg)
    checkpoint = args.checkpoint or ep.checkpoint_path

    loader = create_loader(ep.dataset_name, cfg, "test")
    nr_classes = loader.nr_classes
    ignore_index = getattr(loader, "ignore_index", -1)
    mp = model_params_from_config(cfg, nr_classes)
    sigma = lp.sigmas[0] if len(set(lp.sigmas)) == 1 else np.asarray(lp.sigmas)
    caps = default_capacity_schedule(lp.hash_table_capacity, mp.nr_downsamples)
    model = LNN(mp)

    first = prepare_cloud(loader.get_cloud(args.clouds[0]), mp)
    n_points = 1 << int(np.ceil(np.log2(max(len(first[0]), 512))))
    b0 = make_batch([first], mp, n_points)
    h0 = build_hierarchy(
        b0["positions"][0], sigma, mp.nr_downsamples, caps, point_mask=b0["point_mask"][0]
    )
    params = model.init(jax.random.PRNGKey(0), h0, b0["positions"][0], b0["values"][0])
    if checkpoint:
        params = load_params(checkpoint, params)
        print(f"restored checkpoint {checkpoint}")

    @jax.jit
    def _predict(params, batch):
        h = build_hierarchy(
            batch["positions"][0], sigma, mp.nr_downsamples, caps,
            point_mask=batch["point_mask"][0],
        )
        logp, _ = model.apply(params, h, batch["positions"][0], batch["values"][0])
        return jax.numpy.argmax(logp, axis=-1)

    out_root = Path(args.out)
    cmap = viz.class_color_map(nr_classes)
    for idx in args.clouds:
        cloud = loader.get_cloud(idx)
        prepared = prepare_cloud(cloud, mp)
        pred = predict_cloud_chunked(lambda b: _predict(params, b), prepared, n_points, mp)
        xyz = np.asarray(prepared[0][:, :3])
        target = np.asarray(prepared[2])
        name = (cloud.name or f"{idx:06d}").replace("/", "_")
        d = out_root / name
        viz.prediction_cloud(d / "prediction.ply", xyz, pred, nr_classes)
        viz.prediction_cloud(d / "gt.ply", xyz, np.maximum(target, 0), nr_classes)
        viz.diff_cloud(d / "diff.ply", xyz, pred, target, ignore_index)
        write_html_viewer(
            d / "prediction.html", xyz, cmap[pred % nr_classes],
            title=f"{name} prediction", max_points=args.max_points,
        )
        write_html_viewer(
            d / "gt.html", xyz, cmap[np.maximum(target, 0) % nr_classes],
            title=f"{name} ground truth", max_points=args.max_points,
        )
        ok = (pred == target) | (target == ignore_index)
        acc = float(ok[target != ignore_index].mean()) if (target != ignore_index).any() else 1.0
        print(f"cloud {idx} ({name}): {len(xyz)} pts, acc={acc:.4f} -> {d}/")


if __name__ == "__main__":
    main()
