"""SemanticKITTI loader (velodyne .bin scans + .label files).

Replaces the external C++ ``DataLoaderSemanticKitti``.  Implements the
standard dataset layout ``<root>/sequences/<seq>/velodyne/*.bin`` with labels
``.../labels/*.label`` (lower 16 bits = semantic id), the learning-map
remapping to the 19 train classes + unlabeled, the reference's distance cap
(``cap_distance: 60`` in ``config/lnn_train_semantic_kitti.cfg:84``) and
point-count cap.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from lattice_net_tpu.data.toy import ToyCloud

TRAIN_SEQUENCES = ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10"]
VAL_SEQUENCES = ["08"]
TEST_SEQUENCES = ["11", "12", "13", "14", "15", "16", "17", "18", "19", "20", "21"]

# semantic-kitti-api learning map: raw id -> train id (0 = unlabeled/ignored)
LEARNING_MAP = {
    0: 0, 1: 0, 10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5, 30: 6, 31: 7,
    32: 8, 40: 9, 44: 10, 48: 11, 49: 12, 50: 13, 51: 14, 52: 0, 60: 9, 70: 15,
    71: 16, 72: 17, 80: 18, 81: 19, 99: 0, 252: 1, 253: 7, 254: 6, 255: 8,
    256: 5, 257: 5, 258: 4, 259: 5,
}
# inverse map train id -> a representative raw id (for submission writing)
LEARNING_MAP_INV = {
    0: 0, 1: 10, 2: 11, 3: 15, 4: 18, 5: 20, 6: 30, 7: 31, 8: 32, 9: 40,
    10: 44, 11: 48, 12: 49, 13: 50, 14: 51, 15: 70, 16: 71, 17: 72, 18: 80, 19: 81,
}
NR_CLASSES = 20  # 19 + unlabeled
CLASS_NAMES = [
    "unlabeled", "car", "bicycle", "motorcycle", "truck", "other-vehicle",
    "person", "bicyclist", "motorcyclist", "road", "parking", "sidewalk",
    "other-ground", "building", "fence", "vegetation", "trunk", "terrain",
    "pole", "traffic-sign",
]


def _lut(mapping: dict) -> np.ndarray:
    lut = np.zeros(max(mapping) + 1, dtype=np.int32)
    for k, v in mapping.items():
        lut[k] = v
    return lut


_LEARNING_LUT = _lut(LEARNING_MAP)


def remap_labels(raw: np.ndarray) -> np.ndarray:
    sem = raw & 0xFFFF
    sem = np.clip(sem, 0, len(_LEARNING_LUT) - 1)
    return _LEARNING_LUT[sem].astype(np.int32)


class SemanticKitti:
    def __init__(
        self,
        dataset_path: str,
        mode: str = "train",
        cap_distance: float = 60.0,
        max_nr_points_per_cloud: int = 400000,
        shuffle: bool = True,
        do_overfit: bool = False,
        seed: int = 0,
        sequences=None,
        transform=None,
    ):
        self.root = Path(dataset_path)
        self.mode = mode
        # geometric augmentation (reference recipe:
        # /root/reference/config/lnn_train_semantic_kitti.cfg:110-122);
        # train-mode only, applied after the distance/point caps
        self.transform = transform
        self.cap_distance = cap_distance
        self.max_points = max_nr_points_per_cloud
        self.shuffle = shuffle
        self.do_overfit = do_overfit
        self.rng = np.random.default_rng(seed)
        seqs = sequences or {
            "train": TRAIN_SEQUENCES, "val": VAL_SEQUENCES, "test": TEST_SEQUENCES
        }[mode]
        self.scans = []
        for seq in seqs:
            for f in sorted((self.root / "sequences" / seq / "velodyne").glob("*.bin")):
                self.scans.append((seq, f))
        if not self.scans:
            raise FileNotFoundError(f"no scans under {dataset_path} for {mode}")

    nr_classes = NR_CLASSES
    ignore_index = 0  # 'unlabeled'

    def __len__(self):
        return 1 if self.do_overfit else len(self.scans)

    def get_cloud(self, idx: int) -> ToyCloud:
        if self.do_overfit:
            idx = 0
        seq, f = self.scans[idx]
        raw = np.fromfile(f, dtype=np.float32).reshape(-1, 4)
        V, I = raw[:, :3], raw[:, 3:4]
        label_f = f.parent.parent / "labels" / (f.stem + ".label")
        if label_f.exists():
            L = remap_labels(np.fromfile(label_f, dtype=np.uint32)).reshape(-1, 1)
        else:
            L = np.zeros((len(V), 1), np.int32)

        V, I, L = self._postprocess(V, I, L)
        return ToyCloud(
            V=V.astype(np.float32),
            C=np.zeros_like(V),
            I=I.astype(np.float32),
            L_gt=L,
            name=f"{seq}/{f.stem}",
        )

    def _postprocess(self, V, I, L):
        if self.cap_distance > 0:
            keep = np.linalg.norm(V, axis=1) < self.cap_distance
            V, I, L = V[keep], I[keep], L[keep]
        if self.max_points > 0 and len(V) > self.max_points:
            sel = self.rng.choice(len(V), self.max_points, replace=False)
            V, I, L = V[sel], I[sel], L[sel]
        if self.transform is not None and self.mode == "train":
            from lattice_net_tpu.data.transforms import apply_transform_full

            V, L, _, I = apply_transform_full(V, L, self.transform, self.rng, intensity=I)
        return V, I, L

    def __iter__(self):
        """Training iteration: native threaded reader when available (scan
        decode overlaps device compute — the reference's C++ dataloaders
        pattern), python fallback otherwise."""
        from lattice_net_tpu.data import native_loader as nl

        if not self.do_overfit and nl.native_available():
            files = [f for _, f in self.scans]
            labels = [
                str(f.parent.parent / "labels" / (f.stem + ".label")) for _, f in self.scans
            ]
            if not all(Path(l).exists() for l in labels[:1]):
                labels = None
            loader = nl.NativeCloudLoader(
                files, labels, fmt=nl.FORMAT_KITTI_BIN, shuffle=self.shuffle,
                seed=int(self.rng.integers(1 << 31)),
            )
            try:
                for xyz, intensity, lab in loader:
                    # native reader strips the instance bits; apply the
                    # learning-map remap here
                    lab = _LEARNING_LUT[np.clip(lab, 0, len(_LEARNING_LUT) - 1)]
                    V, I, L = self._postprocess(
                        xyz, intensity.reshape(-1, 1), lab.reshape(-1, 1).astype(np.int32)
                    )
                    yield ToyCloud(
                        V=V.astype(np.float32), C=np.zeros_like(V),
                        I=I.astype(np.float32), L_gt=L,
                    )
            finally:
                loader.close()
            return

        order = np.arange(len(self))
        if self.shuffle and not self.do_overfit:
            self.rng.shuffle(order)
        for i in order:
            yield self.get_cloud(int(i))


def write_kitti_label_file(path, train_ids: np.ndarray) -> None:
    """Benchmark-server submission format: uint32 raw label per point
    (``ln_eval.py:168-193`` equivalent)."""
    inv = _lut(LEARNING_MAP_INV)
    raw = inv[np.clip(train_ids, 0, len(inv) - 1)].astype(np.uint32)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    raw.tofile(path)
