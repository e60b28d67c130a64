"""Native C++ batch sampler: build, correctness, determinism-of-content."""

import os

import numpy as np
import pytest

from hierarchicalprobabilistic3dhuman_tpu.data.native_loader import (
    NativeBatchSampler, write_tensor_store, read_store_meta)


@pytest.fixture(scope="module")
def stores(tmp_path_factory):
    d = tmp_path_factory.mktemp("stores")
    rng = np.random.RandomState(0)
    poses = rng.randn(50, 72).astype(np.float32)
    bgs = (rng.rand(50, 3, 16, 16) * 255).astype(np.uint8)
    p1 = write_tensor_store(str(d / "poses.bin"), poses)
    p2 = write_tensor_store(str(d / "bgs.bin"), bgs)
    return p1, p2, poses, bgs


def test_store_roundtrip(stores):
    p1, _, poses, _ = stores
    shape, dtype = read_store_meta(p1)
    assert shape == poses.shape and dtype == poses.dtype
    back = np.fromfile(p1, dtype=dtype).reshape(shape)
    np.testing.assert_array_equal(back, poses)


def test_sampler_batches_are_real_records(stores):
    p1, p2, poses, bgs = stores
    sampler = NativeBatchSampler([p1, p2], batch_size=8, n_threads=2, seed=1)
    try:
        for _ in range(5):
            batch_poses, batch_bgs = sampler.next()
            assert batch_poses.shape == (8, 72)
            assert batch_bgs.shape == (8, 3, 16, 16)
            assert batch_poses.dtype == np.float32
            assert batch_bgs.dtype == np.uint8
            # every sampled pose must be an exact record from the store
            for row in batch_poses:
                dists = np.abs(poses - row).sum(axis=1)
                assert dists.min() == 0.0
    finally:
        sampler.close()


def test_sampler_sequential_mode(stores):
    p1, p2, poses, bgs = stores
    sampler = NativeBatchSampler([p1], batch_size=5, n_threads=1, seed=0,
                                 shuffle=False)
    try:
        b = sampler.next()[0]
        np.testing.assert_array_equal(b, poses[:5])
    finally:
        sampler.close()


def test_sampler_shuffles(stores):
    p1, _, poses, _ = stores
    sampler = NativeBatchSampler([p1], batch_size=32, n_threads=1, seed=7)
    try:
        b1 = sampler.next()[0]
        b2 = sampler.next()[0]
        assert not np.array_equal(b1, b2)
    finally:
        sampler.close()


def test_native_train_loader_dict_batches(tmp_path):
    """NativeTrainLoader yields epoch-shaped dict batches matching the
    training loop's expectations (uint8 textures/backgrounds end-to-end)."""
    from hierarchicalprobabilistic3dhuman_tpu.data.native_loader import (
        NativeTrainLoader, write_tensor_store)

    n, wh = 20, 16
    rng = np.random.RandomState(0)
    poses = rng.randn(n, 72).astype(np.float32)
    textures = (rng.rand(n, 24, 16, 3) * 255).astype(np.uint8)
    bgs = (rng.rand(n, 3, wh, wh) * 255).astype(np.uint8)
    write_tensor_store(str(tmp_path / "poses.bin"), poses)
    write_tensor_store(str(tmp_path / "textures.bin"), textures)
    write_tensor_store(str(tmp_path / "backgrounds.bin"), bgs)

    loader = NativeTrainLoader(str(tmp_path), batch_size=4, seed=3)
    try:
        assert len(loader) == 5
        batches = list(loader)
        assert len(batches) == 5
        b = batches[0]
        assert set(b) == {"pose", "texture", "background"}
        assert b["pose"].shape == (4, 72) and b["pose"].dtype == np.float32
        assert b["texture"].shape == (4, 24, 16, 3) and b["texture"].dtype == np.uint8
        assert b["background"].shape == (4, 3, wh, wh) and b["background"].dtype == np.uint8
        # records come from the stores, row-aligned across fields
        i = int(np.argmin(np.abs(poses[:, 0] - b["pose"][0, 0])))
        np.testing.assert_array_equal(b["texture"][0], textures[i])
        np.testing.assert_array_equal(b["background"][0], bgs[i])
    finally:
        loader.close()
