"""Alias-method O(1) multinomial sampling (reference distill/alias_multinomial.py:4-63).

Table construction is host-side numpy (one-time); drawing is a pure,
vectorized device op (randint + bernoulli + select) — no per-sample loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class AliasSampler:
    def __init__(self, probs: np.ndarray):
        probs = np.asarray(probs, np.float64)
        probs = probs / probs.sum()
        k = len(probs)
        prob = np.zeros(k)
        alias = np.zeros(k, np.int64)

        smaller, larger = [], []
        scaled = probs * k
        for i, p in enumerate(scaled):
            prob[i] = p
            (smaller if p < 1.0 else larger).append(i)

        while smaller and larger:
            small = smaller.pop()
            large = larger.pop()
            alias[small] = large
            prob[large] = (prob[large] - 1.0) + prob[small]
            (smaller if prob[large] < 1.0 else larger).append(large)
        for i in smaller + larger:
            prob[i] = 1.0

        self.k = k
        self.prob = jnp.asarray(prob, jnp.float32)
        self.alias = jnp.asarray(alias, jnp.int32)

    def draw(self, key: jax.Array, shape) -> jax.Array:
        """Draw samples ~ multinomial(probs), any output shape."""
        kk, kb = jax.random.split(key)
        j = jax.random.randint(kk, shape, 0, self.k)
        accept = jax.random.uniform(kb, shape) < self.prob[j]
        return jnp.where(accept, j, self.alias[j])
