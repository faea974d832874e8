#!/usr/bin/env python
"""Which side regressed: fwd-only vs fwd+bwd for the module path and the
fused-xla path (slope-timed, batch from $BENCH_BATCH)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(run_chain, n1=8, n2=24):
    run_chain(2)
    t1 = run_chain(n1)
    t2 = run_chain(n2)
    return max(t2 - t1, 1e-9) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    from subspace_reg_tpu.data.transforms import transforms_options
    from subspace_reg_tpu.engine import pretrain as pt
    from subspace_reg_tpu.models.fused_forward import fused_forward
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.ops import augment as aug_ops
    from subspace_reg_tpu.utils import optim as optim_lib

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    backbone = ResNetRFS(n_blocks=(1, 1, 2, 2), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True,
                         dtype=jnp.bfloat16)
    tx = optim_lib.sgd_torch(0.05, momentum=0.9, weight_decay=5e-4)
    state = pt.init_pretrain_state(backbone, jax.random.PRNGKey(0),
                                   60, 84, tx, with_bias=False)
    spec, _ = transforms_options["A"]
    r = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)
    x_u8 = jnp.asarray(r.randint(0, 256, (batch, 84, 84, 3)), jnp.uint8)
    x = aug_ops.augment_batch(key, x_u8, spec)
    y = jnp.asarray(r.randint(0, 60, (batch,)), jnp.int32)
    head_w = state.params["head"]["w"]
    variables = {"params": state.params["backbone"],
                 "batch_stats": state.batch_stats,
                 "counters": state.counters}

    def loss_module(params, xx):
        out, _ = backbone.apply(
            {"params": params, "batch_stats": state.batch_stats,
             "counters": state.counters},
            xx, train=True, mutable=["batch_stats", "counters"],
            rngs={"dropout": key})
        logits = out @ head_w.T
        lo = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lo, y[:, None], axis=1))

    def loss_fused(params, xx, backend):
        out, _ = fused_forward(
            backbone, {"params": params, "batch_stats": state.batch_stats,
                       "counters": state.counters}, xx, rng=key,
            backend=backend)
        logits = out @ head_w.T
        lo = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lo, y[:, None], axis=1))

    def timed(name, f, *args):
        jf = jax.jit(f)
        o = jf(*args)
        _ = float(jax.tree.leaves(o)[0].ravel()[0])

        def chain(n):
            t0 = time.perf_counter()
            for _ in range(n):
                o = jf(*args)
            _ = float(jax.tree.leaves(o)[0].ravel()[0])
            return time.perf_counter() - t0

        dt = slope_time(chain)
        print(f"{name:<28} {dt*1e3:8.2f} ms  {batch/dt:8.0f} img/s",
              flush=True)

    p = state.params["backbone"]
    timed("module fwd", lambda pp, xx: loss_module(pp, xx), p, x)
    timed("module fwd+bwd",
          jax.value_and_grad(lambda pp, xx: loss_module(pp, xx)), p, x)
    for be in (os.environ.get("EXP_BACKENDS", "xla").split(",")):
        timed(f"fused-{be} fwd",
              lambda pp, xx, b=be: loss_fused(pp, xx, b), p, x)
        timed(f"fused-{be} fwd+bwd",
              jax.value_and_grad(lambda pp, xx, b=be: loss_fused(pp, xx, b)),
              p, x)


if __name__ == "__main__":
    main()
