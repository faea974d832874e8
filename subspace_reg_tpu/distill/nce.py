"""NCE contrastive memory banks (reference distill/NCEAverage.py:8-381).

The torch module held two momentum-updated memory banks (two views, 'l'
and 'ab') plus running normalization constants Z.  Here the state is an
explicit pytree and the forward/update is one pure jitted function:
gathers land on the MXU as batched matmuls, the bank update is a functional
scatter (index_update) with momentum + L2 renorm, exactly the reference's
update rule (NCEAverage.py: momentum mul_/add_/renorm).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NCEAverageState:
    memory_l: jax.Array     # (output_size, input_size)
    memory_ab: jax.Array
    z_l: jax.Array          # scalar normalization constants (-1 = unset)
    z_ab: jax.Array
    params: jax.Array       # [K, T, Z_l, Z_ab, momentum] (reference layout)


def init_nce_average(rng: jax.Array, output_size: int, input_size: int,
                     k: int, temperature: float = 0.07,
                     momentum: float = 0.5) -> NCEAverageState:
    stdv = 1.0 / jnp.sqrt(input_size / 3.0)
    k1, k2 = jax.random.split(rng)
    mem_l = jax.random.uniform(k1, (output_size, input_size),
                               jnp.float32, -stdv, stdv)
    mem_ab = jax.random.uniform(k2, (output_size, input_size),
                                jnp.float32, -stdv, stdv)
    return NCEAverageState(
        memory_l=mem_l, memory_ab=mem_ab,
        z_l=jnp.asarray(-1.0), z_ab=jnp.asarray(-1.0),
        params=jnp.asarray([k, temperature, -1.0, -1.0, momentum]))


# How the (B, K+1) contrast dot products are formed.  Measured on the v5e
# (tools/exp_nce_micro.py, reference geometry B=512 K=16384 D=128 N=11712):
# TPU gather cost is per gathered ROW OP (~3.6ns), not per byte — an 8.4M
# scalar-score gather times the same as an 8.4M 512-byte-row gather.  Hence:
#   'paired' (default via 'auto'): ONE (B, K+1, 2D) gather from the
#       feature-concatenated banks serves BOTH views (the reference uses the
#       same idx for both, NCEAverage.py forward) — halves the dominant
#       gather-op count.  Bit-identical dot products (same 128-wide
#       contractions over the same values).
#   'gather': two per-bank (B, K+1, D) row gathers (the naive mapping).
#   'matmul': full-bank MXU matmul + scalar gather from the score matrix —
#       measured NEGATIVE result: forward ties (gather-op bound) and the
#       take_along_axis backward is a giant scatter-add (+282ms/step).
CONTRAST_MODE = "auto"  # auto | paired | gather | matmul (A/B module global)
_CONTRAST_MODES = ("auto", "paired", "gather", "matmul")


def _contrast(memory: jax.Array, v: jax.Array, idx: jax.Array,
              temperature: float, z: jax.Array, mode: str):
    """out[i, j] = exp(<memory[idx[i,j]], v[i]> / T) / Z."""
    if mode == "matmul":
        scores = jnp.einsum("bd,nd->bn", v, memory)   # (B, N) on the MXU
        out = jnp.take_along_axis(scores, idx, axis=1)
    else:
        weight = memory[idx]                          # (B, K+1, D)
        out = jnp.einsum("bkd,bd->bk", weight, v)
    out = jnp.exp(out / temperature)
    z_new = jnp.where(z < 0, jnp.mean(out) * memory.shape[0], z)
    return out / z_new, z_new


def _contrast_paired(memory_ab: jax.Array, memory_l: jax.Array,
                     l: jax.Array, ab: jax.Array, idx: jax.Array,
                     temperature, z_l: jax.Array, z_ab: jax.Array):
    """Both views' contrasts from ONE row gather of the feature-concatenated
    banks (same idx on both sides, reference NCEAverage.py forward)."""
    b, d = l.shape
    kp1 = idx.shape[1]
    mem = jnp.concatenate([memory_ab, memory_l], axis=1)   # (N, 2D)
    w = mem[idx]                                           # (B, K+1, 2D)
    # split the pair on a fresh axis (a free minor-dim view — feature-dim
    # SLICES would relayout two 4.3GB copies) and contract both views in one
    # batched einsum: out[...,0] = w_ab.l, out[...,1] = w_l.ab
    w4 = w.reshape(b, kp1, 2, d)
    v = jnp.stack([l, ab], axis=1)                         # (B, 2, D)
    out = jnp.exp(jnp.einsum("bktd,btd->bkt", w4, v) / temperature)
    out_l, out_ab = out[..., 0], out[..., 1]
    z_l = jnp.where(z_l < 0, jnp.mean(out_l) * memory_ab.shape[0], z_l)
    z_ab = jnp.where(z_ab < 0, jnp.mean(out_ab) * memory_l.shape[0], z_ab)
    return out_l / z_l, out_ab / z_ab, z_l, z_ab


def _update_bank(memory: jax.Array, v: jax.Array, y: jax.Array,
                 momentum: float) -> jax.Array:
    old = memory[y]
    new = old * momentum + v * (1.0 - momentum)
    norm = jnp.linalg.norm(new, axis=1, keepdims=True)
    new = new / jnp.maximum(norm, 1e-12)
    return memory.at[y].set(new)


def nce_forward_full(state: NCEAverageState, l: jax.Array, ab: jax.Array,
                     y: jax.Array) -> Tuple[jax.Array, jax.Array,
                                            NCEAverageState]:
    """Full contrast against the ENTIRE bank (reference NCEAverageFull /
    NCEAverageFullSoftmax, distill/NCEAverage.py:144-381): returns
    (B, output_size) similarity matrices — one big MXU matmul per view —
    with the same momentum/renorm bank update."""
    t = state.params[1]            # traced scalars: jit-safe
    momentum = state.params[4]
    # reference orientation (NCEAverageFull): out_l = <memory_ab, l>,
    # out_ab = <memory_l, ab>
    out_l = jnp.exp(l @ state.memory_ab.T / t)
    out_ab = jnp.exp(ab @ state.memory_l.T / t)
    z_l = jnp.where(state.z_l < 0,
                    jnp.mean(out_l) * state.memory_l.shape[0], state.z_l)
    z_ab = jnp.where(state.z_ab < 0,
                     jnp.mean(out_ab) * state.memory_ab.shape[0], state.z_ab)
    new_state = state.replace(
        memory_l=_update_bank(state.memory_l, l, y, momentum),
        memory_ab=_update_bank(state.memory_ab, ab, y, momentum),
        z_l=z_l, z_ab=z_ab)
    return out_l / z_l, out_ab / z_ab, new_state


def full_softmax_loss(out: jax.Array, y: jax.Array) -> jax.Array:
    """Cross-entropy over full-bank similarities (NCEAverageFullSoftmax
    consumers): the positive is the own-index column."""
    logp = jnp.log(jnp.maximum(out, 1e-20))
    logp = logp - jnp.log(jnp.sum(out, axis=1, keepdims=True))
    return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))


def nce_forward(state: NCEAverageState, sampler_draw, l: jax.Array,
                ab: jax.Array, y: jax.Array, rng: jax.Array,
                idx: Optional[jax.Array] = None,
                mode: Optional[str] = None
                ) -> Tuple[jax.Array, jax.Array, NCEAverageState]:
    """Contrast both views against K sampled negatives + the positive.

    ``sampler_draw(key, shape)`` supplies negatives (AliasSampler.draw or a
    uniform fallback).  ``mode`` picks the contrast lowering (one of
    ``_CONTRAST_MODES``); when None it reads the module global
    CONTRAST_MODE *at trace time* — i.e. set the global BEFORE any jitted
    step is constructed, or pass ``mode`` explicitly (a recompiled step per
    mode) for A/B comparisons.  Returns (out_l, out_ab, new_state).
    """
    if mode is None:
        mode = CONTRAST_MODE
    if mode not in _CONTRAST_MODES:
        raise ValueError(
            f"unknown NCE contrast mode {mode!r}; expected one of "
            f"{_CONTRAST_MODES}")
    t = state.params[1]            # traced scalars: jit-safe
    momentum = state.params[4]
    b = l.shape[0]

    if idx is None:
        # shape-defining K must be concrete — this branch is for host-side
        # callers (alias-sampled negatives); jitted steps pass idx explicitly
        k = int(state.params[0])
        idx = sampler_draw(rng, (b, k + 1))
        idx = idx.at[:, 0].set(y)                 # slot 0 = positive

    # reference orientation (NCEAverage.py forward): out_l contrasts the
    # *l* view against the *ab* bank (weight_ab . l) and vice versa
    if mode in ("auto", "paired"):
        out_l, out_ab, z_l, z_ab = _contrast_paired(
            state.memory_ab, state.memory_l, l, ab, idx, t,
            state.z_l, state.z_ab)
    else:
        out_l, z_l = _contrast(state.memory_ab, l, idx, t, state.z_l, mode)
        out_ab, z_ab = _contrast(state.memory_l, ab, idx, t, state.z_ab, mode)

    new_state = state.replace(
        memory_l=_update_bank(state.memory_l, l, y, momentum),
        memory_ab=_update_bank(state.memory_ab, ab, y, momentum),
        z_l=z_l, z_ab=z_ab)
    return out_l, out_ab, new_state
