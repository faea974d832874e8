"""Device-fused image augmentation.

The reference runs PIL/torchvision transforms in CPU DataLoader workers
(dataset/transform_cfg.py:13-47); on TPU the whole pipeline
(pad -> random crop -> color jitter -> hflip -> normalize) is one jitted
batch-level XLA program over the uint8 batch — the device boundary moves to
a single uint8 host->HBM copy and everything else fuses into the training
step.

Semantics follow torchvision:
  * RandomCrop(size, padding): zero-pad then uniform top-left offset
  * ColorJitter(brightness/contrast/saturation = 0.4): factors uniform in
    [1-j, 1+j], applied in a random per-image order; contrast blends with
    the mean of the grayscale image, saturation blends with the per-pixel
    grayscale (ITU-R 601 weights), each step clamps to [0, 255]
  * RandomHorizontalFlip(p=0.5)
  * ToTensor + Normalize: x/255, then (x - mean)/std

Everything is batch-vectorized VPU work (no per-image scan/switch; the
random jitter order is realized as three static select steps over an
argsort-derived permutation), so XLA fuses it into a few elementwise
kernels.  jax PRNG (threefry) replaces torch RNG; episode *composition*
stays bit-exact on the host (data/episodes.py) while augmentation
randomness is a distribution-level match — the parity budget (±0.5% top-1)
absorbs this.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import AugmentSpec

# numpy on purpose: a module-level jnp constant would initialize the JAX
# backends at import time, before the CLIs' jax_setup.configure() can force
# the platform (a TPU-relay outage then hangs every entry point on import)
_GRAY_W = np.asarray([0.299, 0.587, 0.114], np.float32)


def _jitter_batch(x: jax.Array, key: jax.Array, strength: float) -> jax.Array:
    """ColorJitter over a float batch in [0,255], torchvision semantics."""
    b = x.shape[0]
    korder, kf = jax.random.split(key)
    lo, hi = 1.0 - strength, 1.0 + strength
    factors = jax.random.uniform(kf, (b, 3), minval=lo, maxval=hi)
    # random per-image order of (brightness, contrast, saturation)
    order = jnp.argsort(jax.random.uniform(korder, (b, 3)), axis=1)  # (B,3)

    fb = factors[:, 0][:, None, None, None]
    fc = factors[:, 1][:, None, None, None]
    fs = factors[:, 2][:, None, None, None]

    def brightness(v):
        return jnp.clip(v * fb, 0.0, 255.0)

    def contrast(v):
        gray_mean = jnp.mean(v @ _GRAY_W, axis=(1, 2))[:, None, None, None]
        return jnp.clip((v - gray_mean) * fc + gray_mean, 0.0, 255.0)

    def saturation(v):
        gray = (v @ _GRAY_W)[..., None]
        return jnp.clip((v - gray) * fs + gray, 0.0, 255.0)

    for step in range(3):
        sel = order[:, step][:, None, None, None]
        xb, xc, xs = brightness(x), contrast(x), saturation(x)
        x = jnp.where(sel == 0, xb, jnp.where(sel == 1, xc, xs))
    return x


def _crop_flip_batch(x: jax.Array, key: jax.Array, pad: int,
                     kflip=None) -> jax.Array:
    """RandomCrop(size, padding) (+ optional fused RandomHorizontalFlip)
    realized as two one-hot batched matmuls.

    A vmapped dynamic_slice lowers to a gather whose output layout poisons
    every downstream elementwise op (measured 20x slowdown on v5e); a
    per-image one-hot shift matrix turns the translation into MXU work with
    clean layouts.  bf16 is exact here: one-hot rows select single uint8
    values (<= 255, exactly representable in bf16).

    A Pallas DMA-copy kernel was also evaluated and rejected: sliced DMAs
    require 128-lane alignment on the minor dimension, so arbitrary column
    offsets of (H, W, 3) images cannot be expressed as window copies — the
    systolic array IS the TPU's general shift/permute engine, which is why
    the matmul formulation wins here.
    """
    b, h, w, c = x.shape
    hp, wp = h + 2 * pad, w + 2 * pad
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    off = jax.random.randint(key, (b, 2), 0, 2 * pad + 1)

    rows_sel = (jax.lax.broadcasted_iota(jnp.int32, (b, h, hp), 2)
                == jax.lax.broadcasted_iota(jnp.int32, (b, h, hp), 1)
                + off[:, 0][:, None, None])
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (b, wp, w), 2)
    if kflip is not None:
        flip = jax.random.bernoulli(kflip, shape=(b,))
        col_idx = jnp.where(flip[:, None, None], w - 1 - col_idx, col_idx)
    cols_sel = (jax.lax.broadcasted_iota(jnp.int32, (b, wp, w), 1)
                == col_idx + off[:, 1][:, None, None])

    # bf16 on TPU (exact for one-hot x uint8); CPU XLA lacks bf16 dots
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rsel = rows_sel.astype(dt)
    csel = cols_sel.astype(dt)
    xb = xp.astype(dt)
    # (B,H,Hp) x (B,Hp,Wp,C) -> (B,H,Wp,C)
    y = jnp.einsum("bih,bhwc->biwc", rsel, xb,
                   preferred_element_type=jnp.float32)
    # (B,H,Wp,C) x (B,Wp,W) -> (B,H,W,C)
    y = jnp.einsum("bhwc,bwk->bhkc", y.astype(dt), csel,
                   preferred_element_type=jnp.float32)
    return y


@partial(jax.jit, static_argnames=("spec",))
def augment_batch(key: jax.Array, imgs_u8: jax.Array,
                  spec: AugmentSpec) -> jax.Array:
    """(B, H, W, 3) uint8 -> (B, H, W, 3) normalized float32."""
    kcrop, kflip, kjit = jax.random.split(key, 3)
    x = imgs_u8.astype(jnp.float32)

    if spec.random_crop and spec.padding > 0:
        x = _crop_flip_batch(x, kcrop, spec.padding,
                             kflip if spec.hflip else None)
    elif spec.hflip:
        flip = jax.random.bernoulli(kflip, shape=(x.shape[0],))
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)

    if spec.color_jitter > 0:
        x = _jitter_batch(x, kjit, spec.color_jitter)

    x = x * (1.0 / 255.0)
    mean = jnp.asarray(spec.mean, jnp.float32)
    std = jnp.asarray(spec.std, jnp.float32)
    return (x - mean) / std


@partial(jax.jit, static_argnames=("spec",))
def normalize_batch(imgs_u8: jax.Array, spec: AugmentSpec) -> jax.Array:
    """Deterministic test transform: ToTensor + Normalize only — bit-exact
    with the reference's query/base-eval inputs."""
    x = imgs_u8.astype(jnp.float32) * (1.0 / 255.0)
    mean = jnp.asarray(spec.mean, jnp.float32)
    std = jnp.asarray(spec.std, jnp.float32)
    return (x - mean) / std


def _jitter_one(img: jax.Array, key: jax.Array, strength: float) -> jax.Array:
    """Single-image jitter (kept for tests/diagnostics)."""
    if strength <= 0:
        return img
    return _jitter_batch(img[None], key, strength)[0]
