#!/usr/bin/env python
"""Decompose the pretraining step time: augmentation / forward / fwd+bwd.

CAVEAT for this environment: the chip sits behind an async relay whose
block_until_ready can acknowledge early, so sub-millisecond numbers here are
unreliable.  Trust bench.py's slope methodology (two chain lengths with a
forced scalar host pull) for headline figures."""

import os
import time

import numpy as np


def timeit(fn, *args, n=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from subspace_reg_tpu.data.transforms import transforms_options
    from subspace_reg_tpu.engine import pretrain as pt
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.ops import augment as aug_ops
    from subspace_reg_tpu.utils import optim as optim_lib

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    n_cls, img = 60, 84
    backbone = ResNetRFS(n_blocks=(1, 1, 2, 2), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True,
                         dtype=jnp.bfloat16)
    tx = optim_lib.sgd_torch(0.05, momentum=0.9, weight_decay=5e-4)
    state = pt.init_pretrain_state(backbone, jax.random.PRNGKey(0),
                                   n_cls, img, tx, with_bias=False)
    train_spec, _ = transforms_options["A"]
    step = pt.make_train_step(backbone, tx, train_spec, with_bias=False)

    r = np.random.RandomState(0)
    x_u8 = jnp.asarray(r.randint(0, 256, size=(batch, img, img, 3)), jnp.uint8)
    y = jnp.asarray(r.randint(0, n_cls, size=(batch,)), jnp.int32)
    key = jax.random.PRNGKey(1)

    # aug only
    aug = jax.jit(lambda k, xx: aug_ops.augment_batch(k, xx, train_spec))
    t_aug = timeit(aug, key, x_u8)
    x = aug(key, x_u8)

    # forward only (train mode, no grad)
    def fwd(variables, xx):
        return backbone.apply(variables, xx, train=True,
                              mutable=["batch_stats", "counters"],
                              rngs={"dropout": key})[0]
    variables = {"params": state.params["backbone"],
                 "batch_stats": state.batch_stats,
                 "counters": state.counters}
    fwd_j = jax.jit(fwd)
    t_fwd = timeit(fwd_j, variables, x)

    # full step
    s = state
    out = step(s, x_u8, y, key)
    jax.block_until_ready(out[1]["loss"])
    s = out[0]
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        s, m = step(s, x_u8, y, key)
    jax.block_until_ready(m["loss"])
    t_step = (time.perf_counter() - t0) / n

    # cost analysis
    lowered = jax.jit(fwd).lower(variables, x)
    c = lowered.compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    fwd_flops = float(c.get("flops", 0))

    print(f"batch={batch}")
    print(f"aug:   {t_aug*1e3:8.2f} ms  ({batch/t_aug:9.0f} img/s)")
    print(f"fwd:   {t_fwd*1e3:8.2f} ms  ({batch/t_fwd:9.0f} img/s)  "
          f"flops/img={fwd_flops/batch/1e9:.2f} GF  "
          f"util={fwd_flops/t_fwd/197e12*100:.1f}%")
    print(f"step:  {t_step*1e3:8.2f} ms  ({batch/t_step:9.0f} img/s)")


if __name__ == "__main__":
    main()
