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
                    kd_alpha: float = 1.0, kd_beta: float = 1.0):
    """One fused pretraining step: augment -> fwd(train) -> CE(+pull)
    -> bwd -> torch-SGD.  (Reference hot loop train_supervised.py:216-244.)

    ``teacher=(module, variables, head_w, head_b)`` enables knowledge
    distillation (loss = kd_alpha*CE + kd_beta*DistillKL) — the NCE/KD
    capability of the RFS lineage the reference inherits its distill/
    package from (BASELINE config 5); the teacher runs eval-mode inside the
    same fused step.
    """

    def loss_fn(params, batch_stats, counters, x, y, rng):
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


def make_eval_step(backbone, spec: AugmentSpec, with_bias: bool,
                   truncate_classes: Optional[int] = None):
    """Validation step (reference eval/util.py:185-232).  ``truncate_classes``
    reproduces the tiered augment_pretrain_wtrainb slice (:206-208)."""

    @jax.jit
    def eval_step(state: PretrainState, x_u8, y):
        x = aug_ops.normalize_batch(x_u8, spec)
        feats = backbone.apply(
            {"params": state.params["backbone"],
             "batch_stats": state.batch_stats, "counters": state.counters},
            x, train=False)
        logits = feats @ state.params["head"]["w"].T
        if with_bias:
            logits = logits + state.params["head"]["b"]
        if truncate_classes is not None:
            logits = logits[:, :truncate_classes]
        loss = losses.cross_entropy(logits, y)
        acc1, acc5 = losses.accuracy_topk(logits, y)
        return {"loss": loss, "acc1": acc1, "acc5": acc5,
                "n": jnp.asarray(y.shape[0], jnp.float32)}

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
                   batch_size: int, mesh=None) -> Dict[str, float]:
    tot = {"loss": 0.0, "acc1": 0.0, "acc5": 0.0, "n": 0.0}
    for i in range(0, len(labels), batch_size):
        x = jnp.asarray(imgs[i:i + batch_size])
        y = jnp.asarray(labels[i:i + batch_size], jnp.int32)
        m = eval_step(state, x, y)
        n = float(m["n"])
        tot["loss"] += float(m["loss"]) * n
        tot["acc1"] += float(m["acc1"]) * n
        tot["acc5"] += float(m["acc5"]) * n
        tot["n"] += n
    n = max(tot["n"], 1.0)
    return {"loss": tot["loss"] / n, "acc1": tot["acc1"] / n,
            "acc5": tot["acc5"] / n}
