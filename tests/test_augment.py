"""Device-fused augmentation ops."""

import numpy as np

import jax
import jax.numpy as jnp

from subspace_reg_tpu.data.transforms import (
    transforms_options, transforms_test_options, MINI_MEAN, MINI_STD)
from subspace_reg_tpu.ops import augment


def _imgs(n=4, size=84, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, size=(n, size, size, 3)).astype(np.uint8)


def test_normalize_batch_exact():
    imgs = _imgs()
    spec = transforms_options["A"][1]
    out = np.asarray(augment.normalize_batch(jnp.asarray(imgs), spec))
    want = (imgs.astype(np.float32) / 255.0 - np.asarray(MINI_MEAN)) \
        / np.asarray(MINI_STD)
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)


def test_train_transform_shape_and_range():
    imgs = _imgs(8)
    spec = transforms_options["A"][0]
    out = np.asarray(augment.augment_batch(jax.random.PRNGKey(0),
                                           jnp.asarray(imgs), spec))
    assert out.shape == (8, 84, 84, 3)
    # normalized range is bounded by (0-mean)/std .. (1-mean)/std
    lo = (0.0 - np.asarray(MINI_MEAN)) / np.asarray(MINI_STD)
    hi = (1.0 - np.asarray(MINI_MEAN)) / np.asarray(MINI_STD)
    assert np.all(out >= lo - 1e-5) and np.all(out <= hi + 1e-5)


def test_support_transform_no_jitter_is_crop_flip_only():
    """'A_test' train side = RandomCrop + HFlip (transform_cfg.py:32-40):
    every output must be a shifted/flipped sub-window of the zero-padded
    input."""
    imgs = _imgs(1, size=16, seed=3)
    spec = transforms_options["A"][0].__class__(
        size=16, padding=2, random_crop=True, color_jitter=0.0, hflip=True,
        mean=(0.0, 0.0, 0.0), std=(1.0 / 255.0, 1.0 / 255.0, 1.0 / 255.0))
    padded = np.pad(imgs[0], ((2, 2), (2, 2), (0, 0))).astype(np.float32)
    out = np.asarray(augment.augment_batch(jax.random.PRNGKey(1),
                                           jnp.asarray(imgs), spec))[0]
    # out should equal some 16x16 window of padded, possibly h-flipped
    found = False
    for dy in range(5):
        for dx in range(5):
            win = padded[dy:dy + 16, dx:dx + 16]
            if np.allclose(out, win, atol=1e-3) or \
               np.allclose(out, win[:, ::-1], atol=1e-3):
                found = True
    assert found


def test_augment_randomness_differs_per_image_and_key():
    imgs = np.repeat(_imgs(1), 6, axis=0)
    spec = transforms_options["A"][0]
    out = np.asarray(augment.augment_batch(jax.random.PRNGKey(2),
                                           jnp.asarray(imgs), spec))
    # identical input images must get different augmentations
    diffs = [np.abs(out[i] - out[0]).max() for i in range(1, 6)]
    assert max(diffs) > 1e-3
    out2 = np.asarray(augment.augment_batch(jax.random.PRNGKey(2),
                                            jnp.asarray(imgs), spec))
    np.testing.assert_array_equal(out, out2)  # deterministic per key


def test_jitter_factors_identity_at_zero_strength():
    img = jnp.asarray(_imgs(1, size=8)[0], jnp.float32)
    out = augment._jitter_one(img, jax.random.PRNGKey(0), 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               rtol=1e-5, atol=1e-3)
