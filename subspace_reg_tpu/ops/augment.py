"""Device-fused image augmentation.

The reference runs PIL/torchvision transforms in CPU DataLoader workers
(dataset/transform_cfg.py:13-47); on TPU the whole pipeline
(pad -> random crop -> color jitter -> hflip -> normalize) is one jitted,
vmapped XLA program over the uint8 batch — the device boundary moves to a
single uint8 host->HBM copy and everything else fuses.

Semantics follow torchvision:
  * RandomCrop(size, padding): zero-pad then uniform top-left offset
  * ColorJitter(brightness/contrast/saturation = 0.4): factors uniform in
    [1-j, 1+j], applied in a random order; contrast blends with the mean of
    the grayscale image, saturation blends with the per-pixel grayscale
    (ITU-R 601 weights), each step clamps to [0, 255]
  * RandomHorizontalFlip(p=0.5)
  * ToTensor + Normalize: x/255, then (x - mean)/std

jax PRNG (threefry) replaces torch RNG; episode *composition* stays
bit-exact on the host (data/episodes.py) while augmentation randomness is a
distribution-level match — the parity budget (±0.5% top-1) absorbs this.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..data.transforms import AugmentSpec

_GRAY_W = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)


def _jitter_one(img: jax.Array, key: jax.Array, strength: float) -> jax.Array:
    """ColorJitter on a float image in [0,255]."""
    korder, kb, kc, ks = jax.random.split(key, 4)
    lo, hi = 1.0 - strength, 1.0 + strength
    fb = jax.random.uniform(kb, (), minval=lo, maxval=hi)
    fc = jax.random.uniform(kc, (), minval=lo, maxval=hi)
    fs = jax.random.uniform(ks, (), minval=lo, maxval=hi)

    def brightness(x):
        return jnp.clip(x * fb, 0.0, 255.0)

    def contrast(x):
        gray_mean = jnp.mean(x @ _GRAY_W)
        return jnp.clip((x - gray_mean) * fc + gray_mean, 0.0, 255.0)

    def saturation(x):
        gray = (x @ _GRAY_W)[..., None]
        return jnp.clip((x - gray) * fs + gray, 0.0, 255.0)

    fns = [brightness, contrast, saturation]
    perm = jax.random.permutation(korder, 3)

    def apply_ith(x, i):
        return jax.lax.switch(i, fns, x), None

    out, _ = jax.lax.scan(apply_ith, img, perm)
    return out


def _augment_one(img_u8: jax.Array, key: jax.Array, spec: AugmentSpec) -> jax.Array:
    x = img_u8.astype(jnp.float32)
    kcrop, kflip, kjit = jax.random.split(key, 3)

    if spec.random_crop and spec.padding > 0:
        # RandomCrop(size, padding): the reference always crops back to the
        # input size (84/32); cropping to the image's own H/W generalizes
        # that to other resolutions (miniature test data)
        h, w = img_u8.shape[0], img_u8.shape[1]
        pad = spec.padding
        x = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)))
        off = jax.random.randint(kcrop, (2,), 0, 2 * pad + 1)
        x = jax.lax.dynamic_slice(
            x, (off[0], off[1], 0), (h, w, x.shape[-1]))

    if spec.color_jitter > 0:
        x = _jitter_one(x, kjit, spec.color_jitter)

    if spec.hflip:
        flip = jax.random.bernoulli(kflip)
        x = jnp.where(flip, x[:, ::-1, :], x)

    x = x / 255.0
    mean = jnp.asarray(spec.mean, jnp.float32)
    std = jnp.asarray(spec.std, jnp.float32)
    return (x - mean) / std


@partial(jax.jit, static_argnames=("spec",))
def augment_batch(key: jax.Array, imgs_u8: jax.Array,
                  spec: AugmentSpec) -> jax.Array:
    """(B, H, W, 3) uint8 -> (B, size, size, 3) normalized float32."""
    keys = jax.random.split(key, imgs_u8.shape[0])
    return jax.vmap(lambda i, k: _augment_one(i, k, spec))(imgs_u8, keys)


@partial(jax.jit, static_argnames=("spec",))
def normalize_batch(imgs_u8: jax.Array, spec: AugmentSpec) -> jax.Array:
    """Deterministic test transform: ToTensor + Normalize only — bit-exact
    with the reference's query/base-eval inputs."""
    x = imgs_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(spec.mean, jnp.float32)
    std = jnp.asarray(spec.std, jnp.float32)
    return (x - mean) / std
