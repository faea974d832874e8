"""Supervised pretraining engine (reference train_supervised.py:38-268),
TPU-native:

  * the whole hot path — device-fused augmentation, bf16 conv forward,
    backward, PyTorch-exact SGD update, metrics — is ONE jitted step with
    donated state,
  * data parallelism is a ``('data','model')`` mesh: the batch is sharded,
    XLA inserts the gradient psum and computes cross-replica (global-batch)
    BN statistics — replacing ``nn.DataParallel`` (train_supervised.py:141),
  * LR schedules reproduce the reference step-decay / cosine quirks
    (utils/optim.py).

Checkpoints carry the reference metadata contract: ``training_classes``
(= basec_map) and ``label2human`` (train_supervised.py:186-201).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data.transforms import AugmentSpec
from ..models import head as head_lib
from ..ops import augment as aug_ops
from ..ops import losses
from ..parallel import mesh as mesh_lib


@struct.dataclass
class PretrainState:
    params: Any               # {'backbone': ..., 'head': {'w', optional 'b'}}
    batch_stats: Any
    counters: Any
    opt_state: Any
    step: jax.Array


def init_pretrain_state(backbone, rng, n_cls: int, img_size: int,
                        tx, with_bias: bool,
                        variables: Optional[Dict[str, Any]] = None
                        ) -> PretrainState:
    k1, k2 = jax.random.split(rng)
    if variables is None:
        variables = backbone.init(
            k1, jnp.zeros((2, img_size, img_size, 3)), train=False)
    d = backbone.feature_dim
    w, b = head_lib._torch_linear_init(k2, n_cls, d, with_bias)
    head = {"w": w}
    if with_bias:
        head["b"] = b
    params = {"backbone": variables["params"], "head": head}
    return PretrainState(
        params=params, batch_stats=variables["batch_stats"],
        counters=variables["counters"], opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32))


def make_train_step(backbone, tx, spec: AugmentSpec,
                    with_bias: bool, label_pull=None,
                    pull_embeds: Optional[jax.Array] = None,
                    temperature: float = 1.0,
                    mesh=None, teacher=None,
                    kd_temperature: float = 4.0,
                    kd_alpha: float = 1.0, kd_beta: float = 1.0,
                    fused: bool = False, fused_backend: str = "xla"):
    """One fused pretraining step: augment -> fwd(train) -> CE(+pull)
    -> bwd -> torch-SGD.  (Reference hot loop train_supervised.py:216-244.)

    ``teacher=(module, variables, head_w, head_b)`` enables knowledge
    distillation (loss = kd_alpha*CE + kd_beta*DistillKL) — the NCE/KD
    capability of the RFS lineage the reference inherits its distill/
    package from (BASELINE config 5); the teacher runs eval-mode inside the
    same fused step.
    """

    def loss_fn(params, batch_stats, counters, x, y, rng):
        if fused:
            # Pallas fused stages 1-2 (ops/fused_block.py); stages 3/4 and
            # all non-train paths stay on the module path
            from ..models.fused_forward import fused_forward
            out, mut = fused_forward(
                backbone,
                {"params": params["backbone"], "batch_stats": batch_stats,
                 "counters": counters}, x, rng=rng,
                backend=fused_backend)
        else:
            out, mut = backbone.apply(
                {"params": params["backbone"], "batch_stats": batch_stats,
                 "counters": counters},
                x, train=True, mutable=["batch_stats", "counters"],
                rngs={"dropout": rng})
        w = params["head"]["w"]
        if mesh is not None:
            w = jax.lax.with_sharding_constraint(
                w, mesh_lib.head_sharding(mesh))
        logits = out @ w.T
        if with_bias:
            logits = logits + params["head"]["b"]
        loss = losses.cross_entropy(logits, y)
        if teacher is not None:
            from ..distill.criterion import DistillKL
            t_module, t_vars, t_w, t_b = teacher
            t_feats = t_module.apply(t_vars, x, train=False)
            t_logits = t_feats @ t_w.T
            if t_b is not None:
                t_logits = t_logits + t_b
            t_logits = jax.lax.stop_gradient(t_logits)
            loss = (kd_alpha * loss
                    + kd_beta * DistillKL(logits, t_logits, kd_temperature))
        if label_pull is not None:
            # pretraining pull penalty (train_supervised.py:231-235):
            # attractors computed from the classifier itself
            scores = pull_embeds @ pull_embeds.T
            probs = jax.nn.softmax(scores / temperature, axis=1)
            inspired = probs @ params["head"]["w"]
            loss = loss + label_pull * jnp.sum(
                jnp.square(inspired - params["head"]["w"]))
        acc1, acc5 = losses.accuracy_topk(logits, y)
        return loss, (mut, acc1, acc5)

    def step_impl(state: PretrainState, x_u8, y, rng):
        k_aug, k_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        x = aug_ops.augment_batch(k_aug, x_u8, spec)
        (loss, (mut, acc1, acc5)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   state.counters, x, y, k_drop)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params,
            batch_stats=mut["batch_stats"], counters=mut["counters"],
            opt_state=opt_state, step=state.step + 1)
        metrics = {"loss": loss, "acc1": acc1, "acc5": acc5}
        return new_state, metrics

    train_step = jax.jit(step_impl, donate_argnums=(0,))
    train_step.impl = step_impl
    return train_step


def make_train_step_device_data(backbone, tx, spec: AugmentSpec,
                                with_bias: bool, label_pull=None,
                                pull_embeds: Optional[jax.Array] = None,
                                temperature: float = 1.0, mesh=None,
                                **kw):
    """Device-resident-dataset variant: the full uint8 image store lives in
    HBM and each step gathers its batch on device from a tiny host-sent
    index vector.  This removes the per-step host->HBM image copy entirely
    — the right design whenever the dataset fits in HBM (miniImageNet's
    train split is ~0.6GB uint8), and essential on hosts with slow
    interconnect to the chip.
    """
    base = make_train_step(backbone, tx, spec, with_bias=with_bias,
                           label_pull=label_pull, pull_embeds=pull_embeds,
                           temperature=temperature, mesh=mesh, **kw)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: PretrainState, data_u8, labels, idxs, rng):
        x = jnp.take(data_u8, idxs, axis=0)
        y = jnp.take(labels, idxs, axis=0)
        return base.impl(state, x, y, rng)

    return train_step


def init_nce_training(rng, state: PretrainState, tx, teacher_feat_dim: int,
                      student_feat_dim: int, feat_dim: int,
                      n_data: int, nce_k: int, nce_t: float, nce_m: float):
    """Extend a PretrainState for contrastive (CRD/NCE) distillation
    (reference distill/NCEAverage.py:8-381, distill/criterion.py NCELoss;
    the RFS lineage trains student + both Embed heads jointly).

    Returns (state-with-embed-params, embed_s, embed_t, NCEAverageState).
    """
    from ..distill.embed import Embed
    from ..distill.nce import init_nce_average

    k1, k2, k3 = jax.random.split(rng, 3)
    embed_s = Embed(dim_out=feat_dim)
    embed_t = Embed(dim_out=feat_dim)
    p_s = embed_s.init(k1, jnp.zeros((1, student_feat_dim)))["params"]
    p_t = embed_t.init(k2, jnp.zeros((1, teacher_feat_dim)))["params"]
    params = dict(state.params)
    params["embed_s"] = p_s
    params["embed_t"] = p_t
    state = state.replace(params=params, opt_state=tx.init(params))
    nce_state = init_nce_average(k3, n_data, feat_dim, nce_k,
                                 temperature=nce_t, momentum=nce_m)
    return state, embed_s, embed_t, nce_state


def make_train_step_nce(backbone, tx, spec: AugmentSpec, with_bias: bool,
                        teacher, embed_s, embed_t, n_data: int,
                        nce_k: int, kd_alpha: float = 1.0,
                        kd_beta: float = 1.0, mode: str = "nce",
                        contrast_mode: str = None):
    """Contrastive-distillation pretraining step (device-resident dataset).

    One fused jitted step reproducing the RFS NCE recipe the reference's
    distill/ package implements (reference distill/NCEAverage.py forward +
    momentum bank update, distill/NCECriterion.py loss, distill/criterion.py
    NCELoss = criterion_s(out_l) + criterion_t(out_ab)):

      * gather the two-view batch on device (both views are the same
        augmented image — the reference's is_sample machinery pairs the
        sample with itself, dataset/mini_imagenet.py:141-163),
      * negatives: k dataset indices drawn uniformly per sample from the
        *other-class* index set via the class-sorted complement structure
        (``neg_table`` = build_negative_table output) — the cls_negative
        contract of dataset/mini_imagenet.py:154-160,
      * student fwd (train) -> Embed_s; teacher fwd (eval) -> Embed_t,
      * NCE contrast against both memory banks + momentum/renorm update
        inside the same step,
      * loss = kd_alpha * CE + kd_beta * (NCE_l + NCE_ab); both Embed
        heads train jointly with the backbone (RFS trainable_list).

    ``mode='crd'`` uses the InfoNCE softmax criterion (reference
    NCESoftmaxLoss) instead of the NCE criterion.

    ``contrast_mode`` pins the NCE contrast lowering (paired/gather/matmul)
    at step-construction time; None resolves the module global
    ``distill.nce.CONTRAST_MODE`` HERE (not at trace time), so mutating the
    global after this call has no effect on the returned step — each A/B arm
    must construct its own step.
    """
    from ..distill.criterion import nce_loss, nce_softmax_loss
    from ..distill.nce import CONTRAST_MODE, _CONTRAST_MODES, nce_forward

    if contrast_mode is None:
        contrast_mode = CONTRAST_MODE
    if contrast_mode not in _CONTRAST_MODES:
        raise ValueError(
            f"unknown NCE contrast mode {contrast_mode!r}; expected one of "
            f"{_CONTRAST_MODES}")

    t_module, t_vars, _, _ = teacher

    def loss_fn(params, batch_stats, counters, nce_state, x, y, items,
                idx, rng):
        feat_s, mut = backbone.apply(
            {"params": params["backbone"], "batch_stats": batch_stats,
             "counters": counters},
            x, train=True, mutable=["batch_stats", "counters"],
            rngs={"dropout": rng})
        w = params["head"]["w"]
        logits = feat_s @ w.T
        if with_bias:
            logits = logits + params["head"]["b"]
        ce = losses.cross_entropy(logits, y)

        feat_t = jax.lax.stop_gradient(
            t_module.apply(t_vars, x, train=False))
        l = embed_s.apply({"params": params["embed_s"]},
                          feat_s.astype(jnp.float32))
        ab = embed_t.apply({"params": params["embed_t"]},
                           feat_t.astype(jnp.float32))

        out_l, out_ab, nce_state = nce_forward(
            nce_state, None, l, ab, items, rng, idx=idx,
            mode=contrast_mode)
        if mode == "crd":
            contrast = (nce_softmax_loss(jnp.log(jnp.maximum(out_l, 1e-20)))
                        + nce_softmax_loss(
                            jnp.log(jnp.maximum(out_ab, 1e-20))))
        else:
            contrast = nce_loss(out_l, n_data) + nce_loss(out_ab, n_data)
        loss = kd_alpha * ce + kd_beta * contrast
        acc1, acc5 = losses.accuracy_topk(logits, y)
        return loss, (mut, nce_state, ce, contrast, acc1, acc5)

    def step_impl(state: PretrainState, nce_state, x_u8, y, idxs,
                  neg_table, rng):
        k_aug, k_drop, k_neg = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)
        x = aug_ops.augment_batch(k_aug, x_u8, spec)
        b = idxs.shape[0]
        # negatives: uniform-with-replacement over each sample's other-class
        # indices (the cls_negative contract, dataset/mini_imagenet.py:154-160)
        # via the O(n_data) class-sorted complement trick: draw a position in
        # the complement of the own-class block of the class-sorted order,
        # shift past the block, map through the order permutation.
        order, class_off, class_cnt = neg_table
        cnt = jnp.take(class_cnt, y, axis=0)[:, None]
        off = jnp.take(class_off, y, axis=0)[:, None]
        u = jax.random.uniform(k_neg, (b, nce_k))
        pos = jnp.minimum((u * (n_data - cnt)).astype(jnp.int32),
                          n_data - cnt - 1)
        pos = jnp.where(pos >= off, pos + cnt, pos)
        negs = jnp.take(order, pos, axis=0)
        idx = jnp.concatenate([idxs[:, None], negs], axis=1)

        (loss, (mut, nce_state, ce, contrast, acc1, acc5)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, state.counters, nce_state,
                x, y, idxs, idx, k_drop))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, batch_stats=mut["batch_stats"],
            counters=mut["counters"], opt_state=opt_state,
            step=state.step + 1)
        metrics = {"loss": loss, "ce": ce, "contrast": contrast,
                   "acc1": acc1, "acc5": acc5}
        return new_state, nce_state, metrics

    # host-fed batches (x already gathered; idxs are the dataset items)
    train_step = jax.jit(step_impl, donate_argnums=(0, 1))

    # device-resident dataset: gather the batch on device from an index
    # vector (same contract as make_train_step_device_data)
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step_device_data(state, nce_state, data_u8, labels,
                               neg_table, idxs, rng):
        x = jnp.take(data_u8, idxs, axis=0)
        y = jnp.take(labels, idxs, axis=0)
        return step_impl(state, nce_state, x, y, idxs, neg_table, rng)

    train_step.device_data = train_step_device_data
    return train_step


def build_negative_table(labels: np.ndarray, n_cls: int):
    """Class-sorted complement-sampling structure for the cls_negative
    contract (reference dataset/mini_imagenet.py:154-160): uniform negatives
    from every *other* class, in O(n_data) memory (a per-class candidate
    matrix would be O(n_cls * n_data) — 630GB for tieredImageNet).

    Returns (order, class_off, class_cnt): ``order`` is the stable
    class-sorted permutation of dataset indices; a sample of class c draws a
    position in [0, n_data - cnt[c]), shifts it past the class block at
    ``off[c]``, and maps through ``order``.
    """
    labels = np.asarray(labels)
    order = np.argsort(labels, kind="stable").astype(np.int32)
    cnt = np.bincount(labels, minlength=n_cls).astype(np.int32)
    off = np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int32)
    return order, off, cnt


def make_eval_step(backbone, spec: AugmentSpec, with_bias: bool,
                   truncate_classes: Optional[int] = None,
                   faithful_nbt: bool = False):
    """Validation step (reference eval/util.py:185-232).  ``truncate_classes``
    reproduces the tiered augment_pretrain_wtrainb slice (:206-208).

    ``faithful_nbt`` replicates the reference's per-forward
    ``num_batches_tracked`` increment on EVAL forwards too
    (models/resnet_language.py:269 counts every pass through a block, not
    just train-mode ones): the eval apply mutates the ``counters``
    collection and the step returns the advanced counters for the caller
    to thread back into state.  Only observable for ``drop_rate>0``
    pretraining, where the DropBlock gamma ramp reads the counter
    (docs/PARITY.md "Accepted deviations"); default off keeps eval
    forwards pure."""

    @jax.jit
    def eval_step(state: PretrainState, x_u8, y):
        x = aug_ops.normalize_batch(x_u8, spec)
        variables = {"params": state.params["backbone"],
                     "batch_stats": state.batch_stats,
                     "counters": state.counters}
        if faithful_nbt:
            feats, mut = backbone.apply(variables, x, train=False,
                                        mutable=["counters"])
        else:
            feats = backbone.apply(variables, x, train=False)
        logits = feats @ state.params["head"]["w"].T
        if with_bias:
            logits = logits + state.params["head"]["b"]
        if truncate_classes is not None:
            logits = logits[:, :truncate_classes]
        loss = losses.cross_entropy(logits, y)
        acc1, acc5 = losses.accuracy_topk(logits, y)
        metrics = {"loss": loss, "acc1": acc1, "acc5": acc5,
                   "n": jnp.asarray(y.shape[0], jnp.float32)}
        if faithful_nbt:
            return metrics, mut["counters"]
        return metrics

    eval_step.faithful_nbt = faithful_nbt
    return eval_step


def epoch_batches(rng: np.random.RandomState, n: int, batch_size: int,
                  drop_last: bool = True) -> Iterator[np.ndarray]:
    """Shuffled epoch batching (DataLoader shuffle=True, drop_last=True,
    train_supervised.py:50-51)."""
    order = rng.permutation(n)
    end = (n // batch_size) * batch_size if drop_last else n
    for i in range(0, end, batch_size):
        yield order[i:i + batch_size]


def run_validation(eval_step, state, imgs: np.ndarray, labels: np.ndarray,
                   batch_size: int, mesh=None):
    """Returns the aggregated metrics dict; with a ``faithful_nbt`` eval
    step, returns ``(metrics, state)`` with the per-batch counter advances
    threaded through (the reference's validate mutates the counters as a
    module side effect, eval/util.py:185-232)."""
    faithful = getattr(eval_step, "faithful_nbt", False)
    tot = {"loss": 0.0, "acc1": 0.0, "acc5": 0.0, "n": 0.0}
    for i in range(0, len(labels), batch_size):
        x = jnp.asarray(imgs[i:i + batch_size])
        y = jnp.asarray(labels[i:i + batch_size], jnp.int32)
        if faithful:
            m, counters = eval_step(state, x, y)
            state = state.replace(counters=counters)
        else:
            m = eval_step(state, x, y)
        n = float(m["n"])
        tot["loss"] += float(m["loss"]) * n
        tot["acc1"] += float(m["acc1"]) * n
        tot["acc5"] += float(m["acc5"]) * n
        tot["n"] += n
    n = max(tot["n"], 1.0)
    metrics = {"loss": tot["loss"] / n, "acc1": tot["acc1"] / n,
               "acc5": tot["acc5"] / n}
    if faithful:
        return metrics, state
    return metrics
