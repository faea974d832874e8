"""LangPuller — subspace & semantic-subspace attractors, as pure JAX ops.

Reference: models/resnet_language.py:20-97.  The torch module held embeddings
and a softmax; here the state is a tiny pytree of device arrays and every
operation is a pure function, jit/vmap-friendly.

Semantics reproduced:
  * attractors  softmax(E_novel @ E_base^T / T) @ W_base     (:75-87)
  * loss1       gamma * ||attractor - W_novel||^2  (squared) (:89-90)
  * subspace projection via thin QR of W_base^T, including the
    (numerically no-op) division by column norms of Q          (:92-97)
  * GloVe mode slices the first 300 dims of the 500-d Vico vectors (:52-54)
  * synonyms mode reads a {label: embed} pickle                 (:35-42)
  * linear-mapping override: inspired = LinearMap(E_novel), no grad (:83-87)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .embeds import get_embeds, load_embed_pickle


@struct.dataclass
class LangPullerState:
    base_embeds: jax.Array                 # (n_base, d)
    novel_embeds: jax.Array                # (n_novel, d)
    temperature: float = struct.field(pytree_node=False, default=1.0)
    mapping_weight: Optional[jax.Array] = None   # (out, d) torch-Linear layout
    mapping_bias: Optional[jax.Array] = None     # (out,)


def _embed_path(word_embed_path: str, dataset: str, dim: int,
                synonyms: bool = False) -> str:
    suffix = "_base_synonyms" if synonyms else ""
    return os.path.join(word_embed_path,
                        f"{dataset}_dim{dim}{suffix}.pickle")


def description_embed_path(opt) -> str:
    """Asset filename contract of the BERT description pickles — the exact
    format string of reference util.py:95-99 (whose flags are never
    registered upstream: configs.py defines no --description_embed_path /
    --desc_embed_model / --transformer_layer / --prefix_label, making the
    reference's description path dead; here they are live EvalConfig
    fields).  The shipped assets match it:
    description_embeds/miniImageNet_bert-base-cased_layer6_prefix_True.pickle.
    """
    return os.path.join(
        opt.description_embed_path,
        "{0}_{1}_layer{2}_prefix_{3}.pickle".format(
            opt.dataset, opt.desc_embed_model, opt.transformer_layer,
            opt.prefix_label))


def _description_embeds(opt, vocab: Sequence[str]) -> np.ndarray:
    """Description-embed lookup: the pickle is keyed by the FULL human class
    name ({'house finch': vec(768), ...} — verified on the reference's
    shipped assets), so labels are direct dict lookups (no per-word
    splitting/averaging like get_embeds).  Values may be torch tensors
    (the reference pickled tensors) or arrays; np.asarray covers both."""
    d = load_embed_pickle(description_embed_path(opt))
    return np.stack([np.asarray(d[name], dtype=np.float32) for name in vocab],
                    0)


def create_lang_puller(opt, vocab_base: Sequence[str],
                       vocab_novel: Sequence[str]) -> LangPullerState:
    """Build puller state from the word-embedding pickles (reference :21-54).

    ``opt.use_descriptions`` swaps the embedding source to the BERT
    description-embed pickles (util.py:90-130 materializes them; no
    reference consumer exists — the 'description-linear' classifier
    crashes in forward, resnet_language.py:184-187 calls nn.Linear with a
    get_alphas kwarg — so this attractor variant is this framework's live
    adjudication of that dead path; see docs/PARITY.md)."""
    if getattr(opt, "use_descriptions", False):
        # BERT description embeds are used whole: --glove slices the first
        # 300 dims of the 500-d Vico word vectors (:52-54), a layout that
        # does not exist in the 768-d description space
        return LangPullerState(
            base_embeds=jnp.asarray(_description_embeds(opt, vocab_base)),
            novel_embeds=jnp.asarray(_description_embeds(opt, vocab_novel)),
            temperature=float(opt.temperature))

    dim = opt.word_embed_size
    pth = _embed_path(opt.word_embed_path, opt.dataset, dim)
    novel = np.asarray(get_embeds(pth, vocab_novel, dim), np.float32)

    if opt.use_synonyms:
        syn = load_embed_pickle(
            _embed_path(opt.word_embed_path, opt.dataset, dim, synonyms=True))
        base = np.stack([np.asarray(syn[lbl]) for lbl in vocab_base], 0)
        base = np.asarray(base, np.float32)
    else:
        base = np.asarray(get_embeds(pth, vocab_base, dim), np.float32)

    if opt.glove:
        # first 300 dims of the saved embeds are GloVe (reference :52-54)
        base, novel = base[:, :300], novel[:, :300]
    return LangPullerState(base_embeds=jnp.asarray(base),
                           novel_embeds=jnp.asarray(novel),
                           temperature=float(opt.temperature))


def update_novel_embeds(state: LangPullerState, opt,
                        vocab_novel: Sequence[str]) -> LangPullerState:
    """Swap in the next session's novel embeddings (reference :56-65)."""
    if getattr(opt, "use_descriptions", False):
        return state.replace(
            novel_embeds=jnp.asarray(_description_embeds(opt, vocab_novel)))
    dim = opt.word_embed_size
    pth = _embed_path(opt.word_embed_path, opt.dataset, dim)
    novel = np.asarray(get_embeds(pth, vocab_novel, dim), np.float32)
    if opt.glove:
        novel = novel[:, :300]
    return state.replace(novel_embeds=jnp.asarray(novel))


def with_mapping(state: LangPullerState, mapping_weight: np.ndarray,
                 mapping_bias: np.ndarray) -> LangPullerState:
    """Install the learned label->image LinearMap (reference :67-72).
    ``mapping_weight`` keeps the torch Linear layout (out_dim, in_dim)."""
    return state.replace(mapping_weight=jnp.asarray(mapping_weight, jnp.float32),
                         mapping_bias=jnp.asarray(mapping_bias, jnp.float32))


def pullers(state: LangPullerState, base_weight: jax.Array,
            mask_diagonal: bool = False) -> jax.Array:
    """Semantic attractors (reference forward, :75-87). (n_novel, 640)."""
    if state.mapping_weight is not None:
        if state.novel_embeds.shape[1] != state.mapping_weight.shape[1]:
            raise ValueError(
                f"mapping expects {state.mapping_weight.shape[1]}-d label "
                f"embeds, got {state.novel_embeds.shape[1]}-d — pass --glove "
                f"to match learn_mapping's GloVe slice "
                f"(reference slurm_linear_mapping.sh:53)")
        out = state.novel_embeds @ state.mapping_weight.T
        if state.mapping_bias is not None:
            out = out + state.mapping_bias
        return jax.lax.stop_gradient(out)
    scores = state.novel_embeds @ state.base_embeds.T
    if mask_diagonal:
        n = min(scores.shape)
        scores = scores.at[jnp.arange(n), jnp.arange(n)].set(-9999.0)
    probs = jax.nn.softmax(scores / state.temperature, axis=1)
    return probs @ base_weight


def pullers_host_f64(state: LangPullerState,
                     base_weight: np.ndarray) -> np.ndarray:
    """Host-side attractors computed in float64, rounded ONCE to f32.

    Used on the session-dispatch path (engine/incremental.py), where the
    attractor is a per-session constant.  The reference computes this in
    f32 on a GPU (resnet_language.py:75-87) — no f32 accumulation order is
    canonical — and an XLA-f32 value differing from a torch-f32 oracle's
    at ~1e-5 is enough to shift the convergence-stop epoch by a handful of
    epochs at the golden epsilon (1e-4) in near-flat 900-epoch sessions.
    A float64 intermediate makes the f32 result library-independent: every
    BLAS rounds the same real number to the same float."""
    e_n = np.asarray(state.novel_embeds, np.float64)
    if state.mapping_weight is not None:
        w = np.asarray(state.mapping_weight, np.float64)
        if e_n.shape[1] != w.shape[1]:
            raise ValueError(
                f"mapping expects {w.shape[1]}-d label embeds but the puller "
                f"holds {e_n.shape[1]}-d ones — the LinearMap is trained on "
                f"the GloVe slice (learn_mapping.py, --glove default), so the "
                f"eval config must pass --glove too "
                f"(reference slurm_linear_mapping.sh:53)")
        out = e_n @ w.T
        if state.mapping_bias is not None:
            out = out + np.asarray(state.mapping_bias, np.float64)
        return out.astype(np.float32)
    e_b = np.asarray(state.base_embeds, np.float64)
    scores = (e_n @ e_b.T) / float(state.temperature)
    scores -= scores.max(axis=1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=1, keepdims=True)
    return (p @ np.asarray(base_weight, np.float64)).astype(np.float32)


def pull_loss(gamma: float, inspired: jax.Array, weights: jax.Array,
              row_mask: Optional[jax.Array] = None) -> jax.Array:
    """gamma * ||inspired - weights||^2 — SQUARED norm (reference loss1, :89-90).

    ``row_mask`` lets padded callers restrict to the active novel rows.
    """
    d = inspired - weights
    if row_mask is not None:
        d = d * row_mask[:, None]
    return gamma * jnp.sum(jnp.square(d))


def projected_weight(base_weight: jax.Array, weights: jax.Array) -> jax.Array:
    """Pure subspace attractor: project ``weights`` onto span(base rows).

    Reference get_projected_weight (:92-97): thin QR of W_base^T, then
    (W @ Q / colnorm(Q)) @ Q^T.  For orthonormal Q the division is a
    numerical no-op; we keep it for bit-level faithfulness.
    """
    q, _ = jnp.linalg.qr(base_weight.T)            # (640, n_base)
    mut = weights @ q                              # (k, n_base)
    colnorm = jnp.linalg.norm(q.T, axis=1)         # == 1.0 per column
    return (mut / colnorm[None, :]) @ q.T
