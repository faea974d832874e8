#!/usr/bin/env python
"""Time ONLY the full train step (slope method) — used by sweep drivers that
vary $BENCH_BATCH / $XLA_FLAGS per subprocess."""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    from subspace_reg_tpu.data.transforms import transforms_options
    from subspace_reg_tpu.engine import pretrain as pt
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.utils import optim as optim_lib

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    n_cls, img = 60, 84
    backbone = ResNetRFS(n_blocks=(1, 1, 2, 2), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True,
                         dtype=jnp.bfloat16)
    tx = optim_lib.sgd_torch(0.05, momentum=0.9, weight_decay=5e-4)
    state = pt.init_pretrain_state(backbone, jax.random.PRNGKey(0),
                                   n_cls, img, tx, with_bias=False)
    train_spec, _ = transforms_options["A"]
    step_dd = pt.make_train_step_device_data(backbone, tx, train_spec,
                                             with_bias=False)

    r = np.random.RandomState(0)
    n_data = 10000
    data = jax.device_put(
        r.randint(0, 256, size=(n_data, img, img, 3)).astype(np.uint8))
    labels = jax.device_put(
        r.randint(0, n_cls, size=(n_data,)).astype(np.int32))
    idxs = jnp.asarray(r.randint(0, n_data, size=(batch,)), jnp.int32)
    key = jax.random.PRNGKey(1)

    st = [state]

    def chain(n):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            st[0], m = step_dd(st[0], data, labels, idxs, key)
        _ = float(m["loss"])
        return time.perf_counter() - t0

    chain(3)
    t1 = chain(8)
    t2 = chain(32)
    dt = max(t2 - t1, 1e-9) / 24
    print(f"RESULT batch={batch} ms={dt*1e3:.2f} ips={batch/dt:.0f}")


if __name__ == "__main__":
    main()
