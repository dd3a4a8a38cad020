"""Native C++ threaded loader: build, decode correctness, lifecycle."""

import numpy as np
import pytest

from lattice_net_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def native():
    if not nl.build_native():
        pytest.skip("native toolchain unavailable")
    return nl


def test_kitti_roundtrip(native, tmp_path_factory, rng):
    tmp = tmp_path_factory.mktemp("kitti")
    files, labels = [], []
    for i in range(4):
        scan = rng.normal(size=(500 + i, 4)).astype(np.float32)
        f = tmp / f"{i:06d}.bin"
        scan.tofile(f)
        files.append(f)
        lab = rng.integers(0, 260, size=500 + i).astype(np.uint32)
        lf = tmp / f"{i:06d}.label"
        lab.tofile(lf)
        labels.append(lf)

    loader = native.NativeCloudLoader(files, labels, native.FORMAT_KITTI_BIN, n_threads=2)
    got = {g[0].shape[0]: g for g in loader}
    assert sorted(got) == [500, 501, 502, 503]
    ref = np.fromfile(files[0], np.float32).reshape(-1, 4)
    xyz, intensity, lab = got[500]
    np.testing.assert_allclose(xyz, ref[:, :3])
    np.testing.assert_allclose(intensity, ref[:, 3])
    raw = np.fromfile(labels[0], np.uint32)
    np.testing.assert_array_equal(lab, (raw & 0xFFFF).astype(np.int32))
    loader.close()


def test_shapenet_pts(native, tmp_path_factory, rng):
    tmp = tmp_path_factory.mktemp("pts")
    pf, sf = tmp / "a.pts", tmp / "a.seg"
    pts = rng.normal(size=(64, 3))
    seg = rng.integers(1, 5, size=64)
    np.savetxt(pf, pts, fmt="%.6f")
    np.savetxt(sf, seg, fmt="%d")
    loader = native.NativeCloudLoader([pf], [sf], native.FORMAT_SHAPENET_PTS, n_threads=1)
    xyz, _, lab = loader.next()
    np.testing.assert_allclose(xyz, pts.astype(np.float32), atol=1e-5)
    np.testing.assert_array_equal(lab, seg)
    assert loader.next() is None
    loader.close()


def test_destroy_while_queued(native, tmp_path_factory, rng):
    tmp = tmp_path_factory.mktemp("destroy")
    files = []
    for i in range(8):
        f = tmp / f"{i}.bin"
        rng.normal(size=(100, 4)).astype(np.float32).tofile(f)
        files.append(f)
    loader = native.NativeCloudLoader(files, None, native.FORMAT_KITTI_BIN, n_threads=2, queue_capacity=2)
    loader.next()  # pop one, leave the rest queued/in-flight
    loader.close()  # must not hang or leak-crash
