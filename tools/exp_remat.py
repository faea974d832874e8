#!/usr/bin/env python
"""Per-block rematerialization experiment for the pretraining step.

The round-3 floor analysis (BASELINE.md) attributes part of the composed
step's gap vs bare-conv speed-of-light to the ~12GB/step of saved-activation
traffic that conv+BN-train autodiff requires.  ``ResNetRFS(remat=True)``
wraps every BasicBlock in ``nn.remat`` so the backward recomputes block
internals from block inputs instead of loading saved activations from HBM —
trading recompute FLOPs (the step runs at ~48% MXU utilization, so idle
cycles exist IF the residual bottleneck is memory) for activation traffic.

Measures the production device-data step (gather+augment+fwd+bwd+SGD,
reference hot loop train_supervised.py:216-244) with remat off/on at
batch 1024 and 2048 (remat shrinks live memory, so it may move the
batch-size knee measured in BASELINE.md: 2048 was slower and 4096 OOM'd
without remat).  Slope-timed like bench.py (relay-robust).
"""

import os
import time

import numpy as np


def run_one(batch: int, mode: str):
    """mode: 'off' (no remat), 'full' (per-block nn.remat), or 'conv'
    (selective policy: save conv outputs, recompute BN/LeakyReLU/MaxPool
    tails)."""
    import jax
    import jax.numpy as jnp

    from subspace_reg_tpu.data.transforms import transforms_options
    from subspace_reg_tpu.engine import pretrain as pt
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.utils import optim as optim_lib

    n_cls, img = 60, 84
    backbone = ResNetRFS(n_blocks=(1, 1, 2, 2), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True,
                         dtype=jnp.bfloat16, remat=mode != "off",
                         remat_policy="conv" if mode == "conv" else None)
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

    try:
        chain(3)
        t1 = chain(8)
        t2 = chain(32)
    except Exception as e:  # OOM at large batch is itself a data point
        print(f"RESULT batch={batch} remat={mode} FAILED "
              f"{type(e).__name__}: {str(e)[:200]}")
        return
    dt = max(t2 - t1, 1e-9) / 24
    print(f"RESULT batch={batch} remat={mode} ms={dt*1e3:.2f} "
          f"ips={batch/dt:.0f}", flush=True)


def main():
    import jax

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    batches = [int(b) for b in
               os.environ.get("REMAT_BATCHES", "1024,2048").split(",")]
    modes = os.environ.get("REMAT_MODES", "off,full,conv").split(",")
    for batch in batches:
        for mode in modes:
            run_one(batch, mode)


if __name__ == "__main__":
    main()
