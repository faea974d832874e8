"""Statically-padded growing classifier head.

The reference grows its ``nn.Linear`` head by concatenating freshly
initialized rows each session (models/resnet_language.py:202-226).  Dynamic
shapes defeat XLA, so the TPU-native design is a fixed ``(max_classes, 640)``
weight buffer plus an ``n_active`` scalar: "augmentation" writes new
PyTorch-Linear-default-initialized rows into the padded buffer and bumps the
mask.  Logits of inactive rows are masked to -inf, which makes softmax/CE,
argmax and top-k numerically identical to the reference's exactly-sized head.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

NEG_INF = -1e9


@struct.dataclass
class Head:
    weight: jax.Array            # (max_classes, in_dim)
    bias: Optional[jax.Array]    # (max_classes,) or None
    n_active: jax.Array          # int32 scalar

    @property
    def max_classes(self) -> int:
        return self.weight.shape[0]

    @property
    def in_dim(self) -> int:
        return self.weight.shape[1]


def _torch_linear_init(rng: jax.Array, n_rows: int, in_dim: int,
                       with_bias: bool):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) on the weight
    => U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), ...).
    This is what both the pretrained head and each augmentation round use
    (reference models/resnet_language.py:140,216-219)."""
    k = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    wkey, bkey = jax.random.split(rng)
    w = jax.random.uniform(wkey, (n_rows, in_dim), jnp.float32, -k, k)
    b = jax.random.uniform(bkey, (n_rows,), jnp.float32, -k, k) if with_bias else None
    return w, b


def init_head(rng: jax.Array, n_cls: int, in_dim: int = 640,
              with_bias: bool = True, max_classes: Optional[int] = None) -> Head:
    """Create a head with ``n_cls`` active rows inside a ``max_classes`` buffer."""
    max_classes = max_classes or n_cls
    assert n_cls <= max_classes
    w0, b0 = _torch_linear_init(rng, n_cls, in_dim, with_bias)
    weight = jnp.zeros((max_classes, in_dim), jnp.float32).at[:n_cls].set(w0)
    bias = None
    if with_bias:
        bias = jnp.zeros((max_classes,), jnp.float32).at[:n_cls].set(b0)
    return Head(weight=weight, bias=bias,
                n_active=jnp.asarray(n_cls, jnp.int32))


def active_mask(head: Head) -> jax.Array:
    """(max_classes,) float mask: 1 for active class rows."""
    rows = jnp.arange(head.max_classes)
    return (rows < head.n_active).astype(jnp.float32)


def logits(head: Head, feat: jax.Array) -> jax.Array:
    """feat (B, in_dim) -> (B, max_classes) with inactive rows at -inf.

    Equivalent to the reference's exactly-sized ``self.classifier(x)``
    (models/resnet_language.py:183-187) under softmax/argmax/top-k.
    """
    out = feat @ head.weight.T
    if head.bias is not None:
        out = out + head.bias
    rows = jnp.arange(head.max_classes)
    return jnp.where(rows[None, :] < head.n_active, out, NEG_INF)


def augment(head: Head, rng: jax.Array, n_new: int) -> Head:
    """Grow the head by ``n_new`` freshly initialized rows
    (reference ``augment_base_classifier_``, models/resnet_language.py:202-226).

    jit-safe: writes via masks so ``n_active`` may be a traced scalar.
    When ``n_active`` is a host int the whole update stays host-static —
    in particular ``jnp.roll`` must NOT receive a concrete device scalar,
    whose ``__index__`` blocks on a device->host pull (~0.1s per call
    through the axon relay, on the engine's session dispatch path).
    """
    new_w, new_b = _torch_linear_init(rng, head.max_classes, head.in_dim,
                                      head.bias is not None)
    n_act = head.n_active
    if isinstance(n_act, jax.Array) and not isinstance(n_act, jax.core.Tracer):
        n_act = int(n_act)       # one pull instead of one per roll below
    rows = jnp.arange(head.max_classes)
    sel = (rows >= n_act) & (rows < n_act + n_new)
    # roll the fresh block so row j of the fresh init lands at n_active + j,
    # keeping the sampled distribution independent of the session index
    shifted_w = jnp.roll(new_w, n_act, axis=0)
    weight = jnp.where(sel[:, None], shifted_w, head.weight)
    bias = head.bias
    if bias is not None:
        shifted_b = jnp.roll(new_b, n_act, axis=0)
        bias = jnp.where(sel, shifted_b, bias)
    return Head(weight=weight, bias=bias, n_active=n_act + n_new)


def row_range_mask(head: Head, lo, hi) -> jax.Array:
    """(max_classes,) float mask selecting rows in [lo, hi)."""
    rows = jnp.arange(head.max_classes)
    return ((rows >= lo) & (rows < hi)).astype(jnp.float32)
