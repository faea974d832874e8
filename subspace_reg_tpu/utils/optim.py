"""Optimizers with PyTorch-exact update semantics.

torch.optim.SGD applies coupled weight decay into the gradient BEFORE the
momentum accumulation, and initializes the momentum buffer to the first
(decayed) gradient.  ``optax.chain(add_decayed_weights, trace, scale(-lr))``
reproduces this exactly (verified numerically against torch 2.13 in
tests/test_optim.py).  torch.optim.Adam likewise couples decay into the
gradient before the moment updates.

``get_optim`` mirrors the reference optimizer factory (eval/util.py:92-102):
Adam uses a hard-coded weight decay of 5e-4.
"""

from __future__ import annotations

from typing import Optional, Union

import optax


def sgd_torch(learning_rate: Union[float, optax.Schedule],
              momentum: float = 0.0,
              weight_decay: float = 0.0,
              mask=None) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay, mask=mask))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def adam_torch(learning_rate: Union[float, optax.Schedule],
               weight_decay: float = 0.0,
               b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, mask=None) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay, mask=mask))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def get_optim(opt, mask=None) -> optax.GradientTransformation:
    """Reference eval/util.py:92-102."""
    if opt.adam:
        return adam_torch(opt.learning_rate, weight_decay=0.0005, mask=mask)
    return sgd_torch(opt.learning_rate, momentum=opt.momentum,
                     weight_decay=opt.weight_decay, mask=mask)


def step_decay_schedule(base_lr: float, lr_decay_epochs, lr_decay_rate: float,
                        steps_per_epoch: int) -> optax.Schedule:
    """Reference adjust_learning_rate (util.py:45-51): lr multiplied by
    decay_rate^(number of boundaries passed), evaluated per epoch."""
    import numpy as np

    def schedule(step):
        import jax.numpy as jnp
        epoch = step // steps_per_epoch + 1
        steps = jnp.sum(epoch > jnp.asarray(np.asarray(lr_decay_epochs)))
        return base_lr * (lr_decay_rate ** steps)

    return schedule


def cosine_schedule(base_lr: float, lr_decay_rate: float,
                    epochs: int, steps_per_epoch: int) -> optax.Schedule:
    """CosineAnnealingLR with eta_min = lr * rate^3, stepped per epoch and
    with the reference's scheduler.step()-before-train quirk
    (train_supervised.py:159-162: the scheduler steps at the TOP of each
    epoch, so epoch e trains at the schedule's value for step e)."""
    import jax.numpy as jnp

    eta_min = base_lr * (lr_decay_rate ** 3)

    def schedule(step):
        epoch = step // steps_per_epoch + 1  # step() already called once
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / epochs))

    return schedule
