"""Distillation criteria (reference distill/criterion.py:15-93,
distill/NCECriterion.py:7-37)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7


def DistillKL(logits_s: jax.Array, logits_t: jax.Array,
              temperature: float) -> jax.Array:
    """KL(softmax(t/T) || softmax(s/T)) * T^2 / B
    (reference distill/criterion.py DistillKL)."""
    t = temperature
    logp_s = jax.nn.log_softmax(logits_s / t, axis=1)
    p_t = jax.nn.softmax(logits_t / t, axis=1)
    kl = jnp.sum(p_t * (jnp.log(jnp.maximum(p_t, EPS)) - logp_s))
    return kl * (t ** 2) / logits_s.shape[0]


def nce_loss(out: jax.Array, n_data: int) -> jax.Array:
    """NCE loss over (B, K+1) similarity scores, slot 0 positive
    (reference distill/NCECriterion.py:7-37)."""
    bsz = out.shape[0]
    m = out.shape[1] - 1
    pn = 1.0 / n_data
    p_pos = out[:, 0]
    log_d1 = jnp.log(p_pos / jnp.maximum(p_pos + m * pn, EPS))
    p_neg = out[:, 1:]
    log_d0 = jnp.log((m * pn) / jnp.maximum(p_neg + m * pn, EPS))
    return -(jnp.sum(log_d1) + jnp.sum(log_d0)) / bsz


def nce_softmax_loss(out: jax.Array) -> jax.Array:
    """InfoNCE: cross-entropy with target 0 (reference NCESoftmaxLoss)."""
    logp = jax.nn.log_softmax(out, axis=1)
    return -jnp.mean(logp[:, 0])


def attention_loss(feats_s, feats_t, p: int = 2) -> jax.Array:
    """Attention-transfer loss over feature-map lists (reference Attention)."""
    def at(f):
        a = jnp.mean(jnp.abs(f) ** p, axis=3)        # NHWC -> mean over C
        a = a.reshape(a.shape[0], -1)
        return a / jnp.maximum(
            jnp.linalg.norm(a, axis=1, keepdims=True), EPS)
    return sum(jnp.mean(jnp.square(at(s) - at(t)))
               for s, t in zip(feats_s, feats_t))


def hint_loss(f_s: jax.Array, f_t: jax.Array) -> jax.Array:
    """FitNets hint (reference HintLoss): plain MSE."""
    return jnp.mean(jnp.square(f_s - f_t))


def label_smoothing_loss(logits: jax.Array, labels: jax.Array,
                         smoothing: float = 0.0) -> jax.Array:
    """NLL with label smoothing (reference util.py:10-30)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def bce_with_logits_loss(logits: jax.Array, labels: jax.Array,
                         num_classes: int) -> jax.Array:
    """One-hot BCE (reference util.py:32-43 — whose torch version crashes on
    a missing import; this is the working equivalent)."""
    onehot = jax.nn.one_hot(labels, num_classes)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * onehot
        + jnp.log1p(jnp.exp(-jnp.abs(logits))))
