#!/usr/bin/env python
"""A/B the NCE contrast formulation on hardware: row-gather vs full-bank
matmul (distill/nce.py CONTRAST_MODE).

Reproduces the round-4 distillation benchmark shape (tiered-shaped epochs:
resnet12 student+teacher, 351 classes, 84px, batch 512, n_data 11712,
reference K=16384 — the BASELINE config 5 contract, distill/NCEAverage.py)
and slope-times the full fused NCE step (device-resident dataset) under
each contrast mode.

  NCE_CONTRAST=gather|paired|matmul|auto BENCH_MODE=nce|crd python tools/exp_nce_contrast.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    from subspace_reg_tpu.data.transforms import transforms_options
    from subspace_reg_tpu.distill import nce as nce_mod
    from subspace_reg_tpu.engine import pretrain as pt
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.utils import optim as optim_lib

    mode = os.environ.get("NCE_CONTRAST", "auto")
    distill = os.environ.get("BENCH_MODE", "nce")
    nce_mod.CONTRAST_MODE = mode

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    n_cls, img, feat_dim, nce_k = 351, 84, 128, 16384
    n_data = int(os.environ.get("BENCH_NDATA", "11712"))

    def make_backbone():
        return ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True,
                         dtype=jnp.bfloat16)

    backbone = make_backbone()
    tx = optim_lib.sgd_torch(0.05, momentum=0.9, weight_decay=5e-4)
    state = pt.init_pretrain_state(backbone, jax.random.PRNGKey(0),
                                   n_cls, img, tx, with_bias=False)

    t_backbone = make_backbone()
    t_vars = t_backbone.init(jax.random.PRNGKey(7),
                             jnp.zeros((2, img, img, 3)), train=False)
    d = t_backbone.feature_dim
    t_w = jnp.zeros((n_cls, d), jnp.float32)
    teacher = (t_backbone, t_vars, t_w, None)

    state, embed_s, embed_t, nce_state = pt.init_nce_training(
        jax.random.PRNGKey(1), state, tx,
        teacher_feat_dim=d, student_feat_dim=backbone.feature_dim,
        feat_dim=feat_dim, n_data=n_data, nce_k=nce_k,
        nce_t=0.07, nce_m=0.5)

    train_spec, _ = transforms_options["A"]
    step = pt.make_train_step_nce(
        backbone, tx, train_spec, with_bias=False, teacher=teacher,
        embed_s=embed_s, embed_t=embed_t, n_data=n_data, nce_k=nce_k,
        mode=distill)

    r = np.random.RandomState(0)
    labels_np = r.randint(0, n_cls, size=(n_data,)).astype(np.int32)
    neg_table = tuple(jnp.asarray(a) for a in
                      pt.build_negative_table(labels_np, n_cls))
    data = jax.device_put(
        r.randint(0, 256, size=(n_data, img, img, 3)).astype(np.uint8))
    labels = jax.device_put(labels_np)
    idxs = jnp.asarray(r.randint(0, n_data, size=(batch,)), jnp.int32)
    key = jax.random.PRNGKey(1)

    st = [state, nce_state]

    def chain(n):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            st[0], st[1], m = step.device_data(
                st[0], st[1], data, labels, neg_table, idxs, key)
        _ = float(m["loss"])
        return time.perf_counter() - t0

    chain(3)
    t1 = chain(8)
    t2 = chain(32)
    dt = max(t2 - t1, 1e-9) / 24
    print(f"RESULT contrast={mode} distill={distill} batch={batch} "
          f"ms={dt*1e3:.2f} ips={batch/dt:.0f}")


if __name__ == "__main__":
    main()
