"""Compare two sets of SemanticKITTI predictions point-by-point.

Offline rebuild of the reference's viewer-based comparison tool
(``misc/lnn_compare_semantic_kitti.py:32-93``, which renders ours vs
SplatNet/TangentConv side by side): given a scan, the GT labels, and two
prediction ``.label`` files, it prints per-method accuracy/agreement and
dumps PLY clouds (per-method predictions, per-method GT diffs, and a
disagreement cloud) for any point-cloud viewer.

    python -m lattice_net_tpu.misc.lnn_compare_semantic_kitti \
        --scan .../08/velodyne/000000.bin --gt .../08/labels/000000.label \
        --pred-a ours/000000.label --pred-b splatnet/000000.label -o /tmp/cmp
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from lattice_net_tpu.data.semantic_kitti import NR_CLASSES, remap_labels
from lattice_net_tpu.misc import viz


def load_labels(path) -> np.ndarray:
    return remap_labels(np.fromfile(path, dtype=np.uint32))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scan", required=True, help="velodyne .bin")
    ap.add_argument("--gt", required=True, help="ground-truth .label")
    ap.add_argument("--pred-a", required=True, help="first prediction .label (e.g. ours)")
    ap.add_argument("--pred-b", default="", help="optional second prediction .label")
    ap.add_argument("-o", "--out", default="compare_out")
    args = ap.parse_args()

    xyz = np.fromfile(args.scan, dtype=np.float32).reshape(-1, 4)[:, :3]
    gt = load_labels(args.gt)
    preds = {"a": load_labels(args.pred_a)}
    if args.pred_b:
        preds["b"] = load_labels(args.pred_b)

    out = Path(args.out)
    valid = gt != 0  # class 0 = unlabeled
    for name, p in preds.items():
        assert len(p) == len(xyz), f"{name}: {len(p)} labels for {len(xyz)} points"
        acc = float(np.mean(p[valid] == gt[valid])) if valid.any() else float("nan")
        print(f"pred_{name}: accuracy vs GT (labeled points) = {acc:.4f}")
        viz.prediction_cloud(out / f"pred_{name}.ply", xyz, p, NR_CLASSES)
        viz.diff_cloud(out / f"diff_{name}.ply", xyz, p, gt, ignore_index=0)

    if len(preds) == 2:
        a, b = preds["a"], preds["b"]
        agree = float(np.mean(a == b))
        print(f"agreement a vs b = {agree:.4f}")
        # disagreement cloud: grey where equal, colored by a's class where not
        cmap = viz.class_color_map(NR_CLASSES)
        rgb = np.where((a == b)[:, None], np.array([[90, 90, 90]]), cmap[np.clip(a, 0, NR_CLASSES - 1)])
        viz.write_ply(out / "disagreement.ply", xyz, rgb)
    print(f"PLY clouds written to {out}/")


if __name__ == "__main__":
    main()
