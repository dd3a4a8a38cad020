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

    from lattice_net_tpu.misc import viz
    from lattice_net_tpu.misc.viz_html import write_html_viewer
    from lattice_net_tpu.models import prepare_cloud
    from lattice_net_tpu.train.ln_eval import predict_cloud_chunked, setup_predictor

    s = setup_predictor(args.config, args.checkpoint, args.overrides)
    loader, mp, nr_classes, ignore_index, n_points = (
        s.loader, s.mp, s.nr_classes, s.ignore_index, s.n_points,
    )

    out_root = Path(args.out)
    cmap = viz.class_color_map(nr_classes)
    for idx in args.clouds:
        cloud = loader.get_cloud(idx)
        prepared = prepare_cloud(cloud, mp)
        pred = predict_cloud_chunked(s.predict_fn, prepared, n_points, mp)
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
