"""Augmentation transformer tests (reference ``transformer`` config blocks,
``/root/reference/config/lnn_train_semantic_kitti.cfg:110-122`` /
``lnn_train_scannet.cfg:84-100``)."""

import numpy as np

from lattice_net_tpu.data.transforms import (
    TransformParams,
    _hsv_to_rgb,
    _rgb_to_hsv,
    apply_transform,
    apply_transform_cloud,
    apply_transform_full,
)

KITTI_BLOCK = {
    "random_translation_xyz_magnitude": 0.0,
    "random_translation_xz_magnitude": 20.0,
    "rotation_y_max_angle": 10.0,
    "random_stretch_xyz_magnitude": 0.0,
    "adaptive_subsampling_falloff_start": 0.0,
    "adaptive_subsampling_falloff_end": 0.0,
    "random_subsample_percentage": 0.0,
    "random_mirror_x": True,
    "random_mirror_z": True,
    "random_rotation_90_degrees_y": False,
    "hsv_jitter": [0, 0, 0],
    "chance_of_xyz_noise": 0.0,
    "xyz_noise_stddev": [0.0, 0.0, 0.0],
}

SCANNET_BLOCK = {
    **KITTI_BLOCK,
    "random_translation_xz_magnitude": 3.0,
    "rotation_y_max_angle": 0.0,
    "random_rotation_90_degrees_y": True,
    "hsv_jitter": [5.0, 0.05, 0.05],
}


def _cloud(n=512, seed=0):
    rng = np.random.default_rng(seed)
    V = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    L = rng.integers(0, 5, (n, 1)).astype(np.int32)
    return V, L


def test_reference_recipe_blocks_parse_every_key():
    for block in (KITTI_BLOCK, SCANNET_BLOCK):
        tp = TransformParams.from_config(block)
        assert not tp.is_noop()
    tp = TransformParams.from_config(KITTI_BLOCK)
    assert tp.random_translation_xz_magnitude == 20.0
    assert tp.rotation_y_max_angle == 10.0
    tp = TransformParams.from_config(SCANNET_BLOCK)
    assert tp.hsv_jitter == (5.0, 0.05, 0.05)
    assert tp.adaptive_subsampling_falloff_end == 0.0


def test_xz_translation_moves_ground_plane_only():
    V, L = _cloud()
    tp = TransformParams(random_translation_xz_magnitude=20.0)
    rng = np.random.default_rng(1)
    p, l2 = apply_transform(V, L, tp, rng)
    shift = p - V
    # rigid translation: constant per cloud, y untouched, |x/z| <= 20
    assert np.allclose(shift, shift[0], atol=1e-5)
    assert np.allclose(shift[:, 1], 0.0)
    assert abs(shift[0, 0]) <= 20.0 and abs(shift[0, 2]) <= 20.0
    assert (shift[0, 0] != 0.0) or (shift[0, 2] != 0.0)
    np.testing.assert_array_equal(l2, L)


def test_for_up_axis_z_remaps_reference_recipe():
    tp = TransformParams.from_config(KITTI_BLOCK).for_up_axis("z")
    # rotation about the up axis: y -> z
    assert tp.rotation_z_max_angle == 10.0 and tp.rotation_y_max_angle == 0.0
    # ground-plane translation folds into the xy components
    assert tp.random_translation_xz_magnitude == 0.0
    assert tp.random_translation_xyz_magnitude == (20.0, 20.0, 0.0)
    # mirror across vertical planes: x stays, z -> y
    assert tp.random_mirror_x and tp.random_mirror_y and not tp.random_mirror_z
    sc = TransformParams.from_config(SCANNET_BLOCK).for_up_axis("z")
    assert sc.random_rotation_90_degrees_z and not sc.random_rotation_90_degrees_y
    # y-up params pass through unchanged
    assert TransformParams.from_config(KITTI_BLOCK).for_up_axis("y") == \
        TransformParams.from_config(KITTI_BLOCK)


def test_z_up_translation_keeps_height():
    V, L = _cloud()
    tp = TransformParams.from_config(KITTI_BLOCK).for_up_axis("z")
    rng = np.random.default_rng(3)
    p, _ = apply_transform(V, L, tp, rng)
    # rotation about z + mirrors + xy shift: z can only flip sign via no
    # mirror (mirror_z off) -> per-point height magnitude preserved
    np.testing.assert_allclose(np.abs(p[:, 2]), np.abs(V[:, 2]), atol=1e-4)


def test_adaptive_subsampling_thins_near_points():
    rng = np.random.default_rng(5)
    n = 20000
    d = np.concatenate([np.full(n // 2, 2.0), np.full(n // 2, 50.0)])
    az = rng.uniform(0, 2 * np.pi, n)
    V = np.stack([d * np.cos(az), d * np.sin(az), np.zeros(n)], 1).astype(np.float32)
    L = np.zeros((n, 1), np.int32)
    tp = TransformParams(
        random_subsample_percentage=0.8,
        adaptive_subsampling_falloff_start=5.0,
        adaptive_subsampling_falloff_end=40.0,
    )
    p, _ = apply_transform(V, L, tp, rng)
    dist = np.linalg.norm(p, axis=1)
    near, far = (dist < 5.0).sum(), (dist > 40.0).sum()
    # near points are inside falloff_start: dropped at the full 80% rate;
    # far points are beyond falloff_end: kept in full
    assert far == n // 2
    assert near < 0.35 * (n // 2)


def test_plain_subsampling_unchanged_semantics():
    V, L = _cloud(4096)
    tp = TransformParams(random_subsample_percentage=0.5)
    rng = np.random.default_rng(2)
    p, l2 = apply_transform(V, L, tp, rng)
    assert len(p) == len(l2) and 0.45 * len(V) <= len(p) <= len(V)


def test_hsv_roundtrip_and_jitter():
    rng = np.random.default_rng(4)
    rgb = rng.random((1000, 3))
    np.testing.assert_allclose(_hsv_to_rgb(_rgb_to_hsv(rgb)), rgb, atol=1e-6)
    V, L = _cloud(1000)
    C = rgb.astype(np.float32)
    tp = TransformParams(hsv_jitter=(5.0, 0.05, 0.05))
    p, l2, c2, _ = apply_transform_full(V, L, tp, rng, colors=C)
    assert c2.shape == C.shape
    assert (c2 >= 0).all() and (c2 <= 1).all()
    assert not np.allclose(c2, C)  # something moved
    assert np.abs(c2 - C).max() < 0.25  # but gently
    np.testing.assert_array_equal(p, V)  # geometry untouched


def test_cloud_rows_stay_aligned_under_subsample():
    from lattice_net_tpu.data.toy import make_toy_cloud

    cloud = make_toy_cloud(2048, seed=3)
    tp = TransformParams(random_subsample_percentage=0.5)
    out = apply_transform_cloud(cloud, tp, np.random.default_rng(0))
    n = len(out.V)
    assert n < 2048
    assert len(out.C) == n and len(out.I) == n and len(out.L_gt) == n
    # labels/colors still correspond to their points: toy colors are a pure
    # function of position (C = clip(V/2 + .5))
    np.testing.assert_allclose(out.C, np.clip(out.V * 0.5 + 0.5, 0, 1), atol=1e-6)


def test_loader_wiring_synthkitti_train_only():
    from lattice_net_tpu.data.synth_kitti import SynthKitti

    tp = TransformParams.from_config(KITTI_BLOCK).for_up_axis("z")
    plain = SynthKitti(mode="train", nr_samples=1, n_points=4096)
    aug = SynthKitti(mode="train", nr_samples=1, n_points=4096, transform=tp)
    val = SynthKitti(mode="val", nr_samples=1, n_points=4096, transform=tp)
    val_plain = SynthKitti(mode="val", nr_samples=1, n_points=4096)
    a, b = plain.get_cloud(0), aug.get_cloud(0)
    assert not np.allclose(a.V, b.V)
    np.testing.assert_array_equal(a.L_gt, b.L_gt)  # rigid recipe: labels stable
    np.testing.assert_array_equal(val.get_cloud(0).V, val_plain.get_cloud(0).V)
    # fixed-size guarantee survives a non-subsampling recipe
    assert aug.fixed_n_points == 4096
    sub = TransformParams(random_subsample_percentage=0.5)
    assert SynthKitti(mode="train", transform=sub).fixed_n_points is None


def test_loader_wiring_semantic_kitti(tmp_path):
    seq = tmp_path / "sequences" / "00"
    (seq / "velodyne").mkdir(parents=True)
    (seq / "labels").mkdir()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (1000, 4)).astype(np.float32)
    pts.tofile(seq / "velodyne" / "000000.bin")
    np.zeros(1000, np.uint32).tofile(seq / "labels" / "000000.label")

    from lattice_net_tpu.data.semantic_kitti import SemanticKitti

    tp = TransformParams(random_translation_xyz_magnitude=(5.0, 5.0, 0.0))
    plain = SemanticKitti(str(tmp_path), mode="train", sequences=["00"])
    aug = SemanticKitti(str(tmp_path), mode="train", sequences=["00"], transform=tp)
    assert not np.allclose(plain.get_cloud(0).V, aug.get_cloud(0).V)


def test_loader_wiring_scannet(tmp_path):
    scene = tmp_path / "scans" / "scene0000_00"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(0)
    np.savez(
        scene / "scene0000_00.npz",
        points=rng.uniform(-3, 3, (500, 3)).astype(np.float32),
        colors=rng.random((500, 3)).astype(np.float32),
        labels=rng.integers(0, 40, 500),
    )
    from lattice_net_tpu.data.scannet import ScanNet

    tp = TransformParams(hsv_jitter=(10.0, 0.1, 0.1))
    plain = ScanNet(str(tmp_path), mode="train")
    aug = ScanNet(str(tmp_path), mode="train", transform=tp)
    np.testing.assert_array_equal(plain.get_cloud(0).V, aug.get_cloud(0).V)
    assert not np.allclose(plain.get_cloud(0).C, aug.get_cloud(0).C)
