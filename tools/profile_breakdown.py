#!/usr/bin/env python
"""Slope-timed decomposition of the pretraining step (the headline metric).

The chip sits behind an async relay whose ``block_until_ready`` may
acknowledge early, so every number here is measured with bench.py's slope
methodology: run chains of n1 and n2 iterations, force a scalar host pull at
the end of each, and report (t2-t1)/(n2-n1).  Fixed tunnel overhead cancels.

Components measured (batch from $BENCH_BATCH, default 1024):
  * full train step (device-resident data variant = bench.py's program)
  * on-device batch gather only
  * fused augmentation only
  * forward only (train mode, batch-stat updates)
  * forward only (eval mode) — isolates BN-statistics cost
  * forward+backward (no optimizer)
  * per-stage forward cost (prefix differences)
plus XLA cost-analysis FLOPs per component for utilization figures.
"""

import os
import time

import numpy as np

PEAK = float(os.environ.get("PEAK_BF16", 197e12))   # v5e dense bf16


def slope_time(run_chain, n1=8, n2=32):
    run_chain(3)                      # warm (compile happened earlier)
    t1 = run_chain(n1)
    t2 = run_chain(n2)
    return max(t2 - t1, 1e-9) / (n2 - n1)


def flops_of(jfn, *args):
    try:
        c = jfn.lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    from subspace_reg_tpu.data.transforms import transforms_options
    from subspace_reg_tpu.engine import pretrain as pt
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.ops import augment as aug_ops
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

    r = np.random.RandomState(0)
    n_data = 10000
    data = jax.device_put(
        r.randint(0, 256, size=(n_data, img, img, 3)).astype(np.uint8))
    labels = jax.device_put(
        r.randint(0, n_cls, size=(n_data,)).astype(np.int32))
    idxs = jnp.asarray(r.randint(0, n_data, size=(batch,)), jnp.int32)
    key = jax.random.PRNGKey(1)
    x_u8 = jnp.take(data, idxs, axis=0)
    x_f = aug_ops.augment_batch(key, x_u8, train_spec)
    y = jnp.take(labels, idxs, axis=0)

    rows = []

    def report(name, dt, flops):
        util = flops / dt / PEAK * 100 if dt > 0 else 0.0
        rows.append((name, dt * 1e3, batch / dt, flops / batch / 1e9, util))

    # ---- full step (the bench program); donated state must be a private
    # copy — everything else below reads `state`
    step_dd = pt.make_train_step_device_data(backbone, tx, train_spec,
                                             with_bias=False)
    st = [jax.tree.map(jnp.copy, state)]

    def chain_step(n):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            st[0], m = step_dd(st[0], data, labels, idxs, key)
        _ = float(m["loss"])
        return time.perf_counter() - t0

    dt_step = slope_time(chain_step)
    f_step = flops_of(step_dd, st[0], data, labels, idxs, key)
    report("full step", dt_step, f_step)

    # ---- gather only
    @jax.jit
    def gather(ix):
        return jnp.take(data, ix, axis=0), jnp.take(labels, ix, axis=0)

    def chain_gather(n):
        t0 = time.perf_counter()
        for _ in range(n):
            xx, yy = gather(idxs)
        _ = float(yy[0])
        return time.perf_counter() - t0

    report("gather", slope_time(chain_gather), 0.0)

    # ---- augment only
    aug = jax.jit(lambda k, xx: aug_ops.augment_batch(k, xx, train_spec))

    def chain_aug(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = aug(key, x_u8)
        _ = float(out[0, 0, 0, 0])
        return time.perf_counter() - t0

    report("augment", slope_time(chain_aug), flops_of(aug, key, x_u8))

    # ---- forward (train) / forward (eval)
    variables = {"params": state.params["backbone"],
                 "batch_stats": state.batch_stats,
                 "counters": state.counters}

    fwd_train = jax.jit(lambda v, xx: backbone.apply(
        v, xx, train=True, mutable=["batch_stats", "counters"],
        rngs={"dropout": key})[0])
    fwd_eval = jax.jit(lambda v, xx: backbone.apply(v, xx, train=False))

    def mk_chain(jfn, out_pull):
        def chain(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = jfn(variables, x_f)
            _ = float(out_pull(out))
            return time.perf_counter() - t0
        return chain

    report("fwd train", slope_time(mk_chain(fwd_train, lambda o: o[0, 0])),
           flops_of(fwd_train, variables, x_f))
    report("fwd eval", slope_time(mk_chain(fwd_eval, lambda o: o[0, 0])),
           flops_of(fwd_eval, variables, x_f))

    # ---- fwd+bwd (no optimizer)
    head_w = state.params["head"]["w"]

    def loss_fn(params, xx):
        out, _ = backbone.apply(
            {"params": params, "batch_stats": state.batch_stats,
             "counters": state.counters},
            xx, train=True, mutable=["batch_stats", "counters"],
            rngs={"dropout": key})
        logits = out @ head_w.T
        lo = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lo, y[:, None], axis=1))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    def chain_bwd(n):
        t0 = time.perf_counter()
        for _ in range(n):
            lval, g = grad_fn(state.params["backbone"], x_f)
        _ = float(lval)
        return time.perf_counter() - t0

    report("fwd+bwd", slope_time(chain_bwd),
           flops_of(grad_fn, state.params["backbone"], x_f))

    # ---- per-stage prefixes (train-mode fwd through first k stages)
    prev_dt, prev_fl = 0.0, 0.0
    for k in range(1, 5):
        sub = ResNetRFS(n_blocks=(1, 1, 2, 2)[:k], drop_rate=0.1,
                        no_dropblock=True, avg_pool=False,
                        widths=(64, 160, 320, 640)[:k],
                        dtype=jnp.bfloat16)
        v = sub.init(jax.random.PRNGKey(0), x_f[:2], train=False)
        j = jax.jit(lambda vv, xx, m=sub: m.apply(
            vv, xx, train=True, mutable=["batch_stats", "counters"],
            rngs={"dropout": key})[0])
        out = j(v, x_f)          # compile
        _ = float(out[0, 0])

        def chain(n, jf=j, vv=v):
            t0 = time.perf_counter()
            for _ in range(n):
                o = jf(vv, x_f)
            _ = float(o[0, 0])
            return time.perf_counter() - t0

        dt = slope_time(chain)
        fl = flops_of(j, v, x_f)
        report(f"  stage{k} alone", dt - prev_dt, fl - prev_fl)
        prev_dt, prev_fl = dt, fl

    print(f"batch={batch}  peak={PEAK/1e12:.0f} TF/s")
    print(f"{'component':<16} {'ms':>9} {'img/s':>10} {'GF/img':>8} {'util%':>7}")
    for name, ms, ips, gf, util in rows:
        print(f"{name:<16} {ms:9.2f} {ips:10.0f} {gf:8.2f} {util:7.1f}")


if __name__ == "__main__":
    main()
