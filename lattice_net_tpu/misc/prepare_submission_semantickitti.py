"""Package SemanticKITTI predictions into the benchmark-server layout.

Rebuild of ``misc/prepare_submission_semantickitti.py:22-50``: collects
``.label`` files into ``sequences/<seq>/predictions/``, validates each file
against the corresponding velodyne scan (one uint32 label per point — the
server rejects mismatched counts), spot-checks a read-back like the
reference (``:45-50``), and zips the result.

    python -m lattice_net_tpu.misc.prepare_submission_semantickitti \
        --predictions predictions/ --dataset /data/kitti --out submission.zip
"""

from __future__ import annotations

import argparse
import zipfile
from pathlib import Path

import numpy as np

from lattice_net_tpu.data.semantic_kitti import LEARNING_MAP_INV, TEST_SEQUENCES


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--predictions", required=True,
                    help="dir holding sequences/<seq>/predictions/*.label")
    ap.add_argument("--dataset", default="",
                    help="KITTI root (for point-count validation; optional)")
    ap.add_argument("--out", default="submission.zip")
    args = ap.parse_args()

    pred_root = Path(args.predictions)
    valid_raw = set(LEARNING_MAP_INV.values())
    n_files, n_checked = 0, 0

    with zipfile.ZipFile(args.out, "w", zipfile.ZIP_DEFLATED) as zf:
        for seq_dir in sorted((pred_root / "sequences").glob("*")):
            seq = seq_dir.name
            for f in sorted((seq_dir / "predictions").glob("*.label")):
                labels = np.fromfile(f, dtype=np.uint32)
                bad = set(np.unique(labels)) - valid_raw
                if bad:
                    raise ValueError(f"{f}: non-submittable raw label ids {sorted(bad)}")
                if args.dataset:
                    scan = Path(args.dataset) / "sequences" / seq / "velodyne" / f"{f.stem}.bin"
                    if scan.exists():
                        n_pts = scan.stat().st_size // 16  # 4 floats/point
                        if len(labels) != n_pts:
                            raise ValueError(
                                f"{f}: {len(labels)} labels but scan has {n_pts} points"
                            )
                        n_checked += 1
                zf.write(f, f"sequences/{seq}/predictions/{f.name}")
                n_files += 1

    missing = [s for s in TEST_SEQUENCES
               if not (pred_root / "sequences" / s / "predictions").exists()]
    if missing:
        print(f"WARNING: no predictions for test sequences {missing}")
    print(f"wrote {args.out}: {n_files} label files ({n_checked} point-count-validated)")


if __name__ == "__main__":
    main()
