"""Losses, metrics, and the FSCIL regularizers as pure functions.

Norm conventions (reference models/resnet_language.py:89-97,229-240):
  * ``regloss``        base-weight drift, UN-squared Frobenius norm
                       (+ squared norm for the bias term)
  * ``reglossnovel``   previous-novel drift, UN-squared Frobenius norm;
                       the reference's bias branch would crash (2-D index
                       into a 1-D bias, :239) — we refuse it explicitly.
  * subspace/semantic pull uses the SQUARED norm (``lang_puller.pull_loss``).

``safe_norm`` matches torch.norm's zero subgradient at 0 (verified against
torch 2.13: grad of ||0|| is 0, not NaN) — this matters at session 0 epoch 1
where W[:60] == W0 exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def safe_norm(x: jax.Array) -> jax.Array:
    """Frobenius norm with zero gradient at the origin (torch.norm parity)."""
    sq = jnp.sum(jnp.square(x))
    is_zero = sq == 0.0
    sq_safe = jnp.where(is_zero, 1.0, sq)
    return jnp.where(is_zero, 0.0, jnp.sqrt(sq_safe))


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  sample_mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean softmax cross-entropy (torch nn.CrossEntropyLoss parity).

    ``sample_mask`` (float, per-sample) supports padded batches: the mean is
    over valid samples only, exactly what the reference computes on its
    unpadded tensors.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if sample_mask is None:
        return jnp.mean(nll)
    total = jnp.sum(sample_mask)
    return jnp.sum(nll * sample_mask) / jnp.maximum(total, 1.0)


def accuracy_topk(logits: jax.Array, labels: jax.Array,
                  topk: Sequence[int] = (1, 5),
                  sample_mask: Optional[jax.Array] = None) -> Tuple[jax.Array, ...]:
    """Top-k accuracy in percent (reference eval/util.py:26-40)."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)              # (B, maxk)
    correct = (pred == labels[:, None]).astype(jnp.float32)
    if sample_mask is not None:
        correct = correct * sample_mask[:, None]
        denom = jnp.maximum(jnp.sum(sample_mask), 1.0)
    else:
        denom = jnp.asarray(labels.shape[0], jnp.float32)
    res = []
    for k in topk:
        res.append(jnp.sum(correct[:, :k]) * (100.0 / denom))
    return tuple(res)


def regloss(lmbd: float, weight: jax.Array, base_weight: jax.Array,
            n_base: int, bias: Optional[jax.Array] = None,
            base_bias: Optional[jax.Array] = None) -> jax.Array:
    """Base-row anchor: lmbd * ||W[:n_base] - W0|| (UN-squared)
    + lmbd * ||b[:n_base] - b0||^2 (squared).  Reference
    models/resnet_language.py:229-233.

    Operates on padded buffers: ``weight`` is (max_classes, d), ``base_weight``
    is the snapshot of the same buffer; rows >= n_base contribute zero because
    we mask the difference.
    """
    rows = jnp.arange(weight.shape[0])
    m = (rows < n_base).astype(weight.dtype)
    reg = lmbd * safe_norm((weight - base_weight) * m[:, None])
    if bias is not None and base_bias is not None:
        reg = reg + lmbd * jnp.sum(jnp.square((bias - base_bias) * m))
    return reg


def reglossnovel(lmbd: float, weight: jax.Array, reserved: jax.Array,
                 num_classes: int, n_reserved, bias=None) -> jax.Array:
    """Previous-novel anchor: lmbd * ||W[nc : nc+k] - reserved[:k]|| (UN-squared).

    ``num_classes`` is the ORIGINAL base count (never updated on augmentation
    in the reference — resnet_language.py:236 anchors at the original 60).
    ``reserved`` is a padded (max_novel, d) buffer of end-of-introduction
    values; ``n_reserved`` its valid row count (may be traced).
    """
    if bias is not None:
        raise NotImplementedError(
            "reference reglossnovel bias branch crashes "
            "(models/resnet_language.py:239); golden configs use no bias")
    max_novel = reserved.shape[0]
    rows = jnp.arange(max_novel)
    m = (rows < n_reserved).astype(weight.dtype)
    cur = jax.lax.dynamic_slice_in_dim(weight, num_classes, max_novel, axis=0)
    return lmbd * safe_norm((cur - reserved) * m[:, None])
