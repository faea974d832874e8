"""Projection heads for contrastive distillation (reference distill/util.py:6-57)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def l2_normalize(x: jax.Array, power: int = 2) -> jax.Array:
    """Reference Normalize module: x / (sum |x|^p)^(1/p)."""
    norm = jnp.sum(jnp.abs(x) ** power, axis=1, keepdims=True) ** (1.0 / power)
    return x / jnp.maximum(norm, 1e-12)


class Embed(nn.Module):
    """Linear + L2 norm (reference Embed)."""
    dim_out: int = 128

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.dim_out, name="linear")(x)
        return l2_normalize(x)


class LinearEmbed(nn.Module):
    dim_out: int = 128

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.dim_out, name="linear")(x)


class MLPEmbed(nn.Module):
    """two-layer MLP + L2 norm (reference MLPEmbed)."""
    dim_out: int = 128

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(2 * self.dim_out, name="linear1")(x))
        x = nn.Dense(self.dim_out, name="linear2")(x)
        return l2_normalize(x)
