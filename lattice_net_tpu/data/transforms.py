"""Point-cloud augmentation matching the reference loader ``transformer`` blocks.

The reference delegates augmentation to its external C++ ``dataloaders``
library, configured per dataset (``config/ln_train_shapenet_example.cfg:74-92``):
random translation, per-axis mirroring, 90-degree y rotations, axis-angle
rotations, stretch, subsampling and xyz noise.  This is the python-native
equivalent over numpy arrays, driven by the same config keys.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class TransformParams:
    random_translation_xyz_magnitude: tuple = (0.0, 0.0, 0.0)
    rotation_x_max_angle: float = 0.0
    rotation_y_max_angle: float = 0.0
    rotation_z_max_angle: float = 0.0
    random_stretch_xyz_magnitude: tuple = (0.0, 0.0, 0.0)
    random_subsample_percentage: float = 0.0
    random_mirror_x: bool = False
    random_mirror_y: bool = False
    random_mirror_z: bool = False
    random_rotation_90_degrees_y: bool = False
    chance_of_xyz_noise: float = 0.0
    xyz_noise_stddev: tuple = (0.0, 0.0, 0.0)

    @classmethod
    def from_config(cls, t: dict) -> "TransformParams":
        def tup(key, default=(0.0, 0.0, 0.0)):
            v = t.get(key, list(default))
            if isinstance(v, (int, float)):
                v = [v] * 3
            return tuple(float(x) for x in v)

        return cls(
            random_translation_xyz_magnitude=tup("random_translation_xyz_magnitude"),
            rotation_x_max_angle=float(t.get("rotation_x_max_angle", 0.0)),
            rotation_y_max_angle=float(t.get("rotation_y_max_angle", 0.0)),
            rotation_z_max_angle=float(t.get("rotation_z_max_angle", 0.0)),
            random_stretch_xyz_magnitude=tup("random_stretch_xyz_magnitude"),
            random_subsample_percentage=float(t.get("random_subsample_percentage", 0.0)),
            random_mirror_x=bool(t.get("random_mirror_x", False)),
            random_mirror_y=bool(t.get("random_mirror_y", False)),
            random_mirror_z=bool(t.get("random_mirror_z", False)),
            random_rotation_90_degrees_y=bool(t.get("random_rotation_90_degrees_y", False)),
            chance_of_xyz_noise=float(t.get("chance_of_xyz_noise", 0.0)),
            xyz_noise_stddev=tup("xyz_noise_stddev"),
        )


def _rot(axis: int, angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    r = np.eye(3)
    i, j = [(1, 2), (0, 2), (0, 1)][axis]
    r[i, i], r[i, j], r[j, i], r[j, j] = c, -s, s, c
    return r


def apply_transform(positions: np.ndarray, labels: np.ndarray, tp: TransformParams, rng):
    """Augment one cloud; returns (positions, labels) with rows possibly subsampled."""
    p = positions.copy()

    keep = None
    if tp.random_subsample_percentage > 0.0:
        frac = 1.0 - rng.uniform(0, tp.random_subsample_percentage)
        n_keep = max(1, int(len(p) * frac))
        keep = rng.choice(len(p), n_keep, replace=False)
        p = p[keep]
        labels = labels[keep]

    rot = np.eye(3)
    for axis, max_angle in enumerate(
        (tp.rotation_x_max_angle, tp.rotation_y_max_angle, tp.rotation_z_max_angle)
    ):
        if max_angle > 0:
            rot = rot @ _rot(axis, rng.uniform(-max_angle, max_angle) * np.pi / 180.0)
    if tp.random_rotation_90_degrees_y:
        rot = rot @ _rot(1, rng.integers(0, 4) * np.pi / 2.0)
    if not np.allclose(rot, np.eye(3)):
        p = p @ rot.T

    for axis, on in enumerate((tp.random_mirror_x, tp.random_mirror_y, tp.random_mirror_z)):
        if on and rng.random() < 0.5:
            p[:, axis] = -p[:, axis]

    stretch = np.asarray(tp.random_stretch_xyz_magnitude)
    if (stretch > 0).any():
        p = p * (1.0 + rng.uniform(-stretch, stretch))

    trans = np.asarray(tp.random_translation_xyz_magnitude)
    if (trans > 0).any():
        p = p + rng.uniform(-trans, trans)

    if tp.chance_of_xyz_noise > 0 and rng.random() < tp.chance_of_xyz_noise:
        p = p + rng.normal(0.0, np.asarray(tp.xyz_noise_stddev), size=p.shape)

    return p.astype(np.float32), labels
