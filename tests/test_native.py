"""Native host-staging runtime: correctness vs numpy, pipeline behavior."""

import numpy as np
import pytest

from subspace_reg_tpu.data import native
from subspace_reg_tpu.data.pipeline import PrefetchLoader


def test_native_builds_and_gathers():
    lib = native.get_lib()
    assert lib is not None, "native staging library failed to build"
    r = np.random.RandomState(0)
    src = r.randint(0, 256, size=(100, 7, 5, 3)).astype(np.uint8)
    idx = r.randint(0, 100, size=33)
    out = native.gather_u8(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_native_gather_normalize():
    r = np.random.RandomState(1)
    src = r.randint(0, 256, size=(50, 4, 4, 3)).astype(np.uint8)
    idx = r.randint(0, 50, size=16)
    mean = (0.4, 0.5, 0.6)
    std = (0.2, 0.3, 0.4)
    out = native.gather_normalize(src, idx, mean, std)
    want = (src[idx].astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_prefetch_loader_covers_epoch():
    r = np.random.RandomState(2)
    imgs = r.randint(0, 256, size=(100, 4, 4, 3)).astype(np.uint8)
    labels = np.arange(100) % 10
    loader = PrefetchLoader(imgs, labels, batch_size=16,
                            rng=np.random.RandomState(3))
    assert len(loader) == 6
    seen = 0
    ys = []
    for x, y in loader.epoch():
        assert x.shape == (16, 4, 4, 3)
        seen += 1
        ys.append(np.asarray(y))
    assert seen == 6
    # shuffled coverage without replacement (within the dropped-last epoch)
    flat = np.concatenate(ys)
    assert len(flat) == 96


def test_replay_memory_container():
    """Host-side ReplayMemory (reference dataset/memory.py:4-28 semantics;
    the engine itself uses device-resident buffers)."""
    from subspace_reg_tpu.data.memory import ReplayMemory
    m = ReplayMemory(10, (2, 2, 3))
    assert len(m) == 0
    m.additems(np.ones((4, 2, 2, 3), np.float32), np.arange(4))
    m.additems(2 * np.ones((3, 2, 2, 3), np.float32), np.arange(3))
    assert len(m) == 7
    assert m.mask().sum() == 7
    np.testing.assert_array_equal(m.labels[:4], np.arange(4))
    with pytest.raises(AssertionError):
        m.additems(np.ones((9, 2, 2, 3), np.float32), np.arange(9))
