"""Native C++ PNG loader tests (decode parity vs PIL, threaded batch)."""
import shutil

import numpy as np
import pytest

g_pp = shutil.which("g++")
pytestmark = pytest.mark.skipif(g_pp is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def loader():
    from iros20_6d_pose_tracking_tpu.native.dataload import NativeLoader

    try:
        return NativeLoader()
    except Exception as e:  # libpng missing etc.
        pytest.skip(f"native loader unavailable: {e}")


def _write(tmp, name, arr):
    from PIL import Image

    path = str(tmp / name)
    Image.fromarray(arr).save(path)
    return path


def test_rgb8_parity(tmp_path, loader):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, size=(37, 53, 3), dtype=np.uint8)
    path = _write(tmp_path, "rgb.png", arr)
    out = loader.read_png(path)
    np.testing.assert_array_equal(out, arr)


def test_gray16_parity(tmp_path, loader):
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 60000, size=(41, 29), dtype=np.uint16)
    path = _write(tmp_path, "d16.png", arr)
    out = loader.read_png(path)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, arr)


def test_gray8_parity(tmp_path, loader):
    arr = (np.arange(100, dtype=np.uint8).reshape(10, 10))
    path = _write(tmp_path, "g8.png", arr)
    np.testing.assert_array_equal(loader.read_png(path), arr)


def test_batch_threaded(tmp_path, loader):
    rng = np.random.RandomState(2)
    arrs = [rng.randint(0, 255, size=(24, 32, 3), dtype=np.uint8)
            for _ in range(16)]
    paths = [_write(tmp_path, f"b{i}.png", a) for i, a in enumerate(arrs)]
    out = loader.read_png_batch(paths, np.uint8, n_threads=8)
    assert out.shape == (16, 24, 32, 3)
    for i in range(16):
        np.testing.assert_array_equal(out[i], arrs[i])


def test_batch_u16(tmp_path, loader):
    rng = np.random.RandomState(3)
    arrs = [rng.randint(0, 2000, size=(24, 32), dtype=np.uint16)
            for _ in range(6)]
    paths = [_write(tmp_path, f"d{i}.png", a) for i, a in enumerate(arrs)]
    out = loader.read_png_batch(paths, np.uint16, n_threads=4)
    for i in range(6):
        np.testing.assert_array_equal(out[i], arrs[i])


def test_missing_file(loader):
    assert loader.read_png("/nonexistent/x.png") is None


def test_pair_dataset_uses_native(tmp_path, loader):
    """PairDataset picks up the native loader transparently."""
    from PIL import Image

    from iros20_6d_pose_tracking_tpu.data.dataset import PairDataset

    rng = np.random.RandomState(4)
    for i in range(2):
        for suffix in ("rgbA", "rgbB"):
            Image.fromarray(
                rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
            ).save(tmp_path / f"{i:07d}{suffix}.png")
        for suffix in ("depthA", "depthB"):
            Image.fromarray(
                rng.randint(300, 1500, (48, 48)).astype(np.uint16)
            ).save(tmp_path / f"{i:07d}{suffix}.png")
        Image.fromarray(np.ones((48, 48), np.uint8)).save(
            tmp_path / f"{i:07d}segB.png")
        pose = np.eye(4)
        pose[2, 3] = 0.6
        np.savez(tmp_path / f"{i:07d}meta.npz", A_in_cam=pose, B_in_cam=pose)
    ds = PairDataset(str(tmp_path), resolution=48)
    assert ds._native is not None
    rec = ds[0]
    assert rec.rgbA.shape == (48, 48, 3)
    assert rec.depthA.max() >= 300


def test_pair_dataset_native_batch_path(tmp_path, loader):
    """batches() takes the whole-batch native decode path and matches the
    per-record fallback exactly."""
    from PIL import Image

    from iros20_6d_pose_tracking_tpu.data.dataset import PairDataset

    rng = np.random.RandomState(9)
    res = 48
    for i in range(4):
        for suffix in ("rgbA", "rgbB"):
            Image.fromarray(
                rng.randint(0, 255, (res, res, 3), dtype=np.uint8)
            ).save(tmp_path / f"{i:07d}{suffix}.png")
        for suffix in ("depthA", "depthB"):
            Image.fromarray(
                rng.randint(300, 1500, (res, res)).astype(np.uint16)
            ).save(tmp_path / f"{i:07d}{suffix}.png")
        Image.fromarray(np.ones((res, res), np.uint8)).save(
            tmp_path / f"{i:07d}segB.png")
        pose = np.eye(4)
        pose[2, 3] = 0.6
        np.savez(tmp_path / f"{i:07d}meta.npz", A_in_cam=pose, B_in_cam=pose)

    ds = PairDataset(str(tmp_path), resolution=res)
    assert ds._native is not None
    fast = next(ds.batches(4, shuffle=False))
    # Force the fallback path for comparison.
    ds._native = None
    slow = next(ds.batches(4, shuffle=False))
    for k in fast:
        np.testing.assert_allclose(fast[k], slow[k], err_msg=k)
