#!/usr/bin/env python
"""Experiment: decompose a BasicBlock's fwd+bwd cost into conv vs glue.

Round-2 established (BASELINE.md:61-118): full step 243ms, fwd 70ms,
fwd+bwd 238ms, pure-conv SOL ~136ms.  So ~25ms of forward and ~77ms of
backward is non-conv glue (BN stats/normalize chains, LeakyReLU masks,
residual fan-out, MaxPool select-and-scatter).  This script measures each
glue component in isolation at the stage-1 (84px, 64ch) and stage-2
(42px, 160ch) geometries to rank Pallas fusion targets.

All numbers slope-timed (the chip sits behind an async relay; see bench.py).
"""

import os
import time
from functools import partial

import numpy as np

PEAK = float(os.environ.get("PEAK_BF16", 197e12))


def slope_time(run_chain, n1=8, n2=24):
    run_chain(2)
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

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    rows = []

    def report(name, dt, flops=0.0):
        util = flops / dt / PEAK * 100 if dt > 0 else 0.0
        rows.append((name, dt * 1e3, util))
        print(f"{name:<44} {dt*1e3:9.2f} ms {util:6.1f}%", flush=True)

    def timed(name, jfn, *args, grad=False, flops=None):
        if grad:
            # value_and_grad against a RANDOM bf16 cotangent wrt every
            # array argument: keeps forward+backward alive (a sum loss
            # lets XLA constant-fold conv dgrads and DCE forwards).  The
            # cotangent is built OUTSIDE the trace (eval_shape).
            oshape = jax.eval_shape(jfn, *args)
            cot = jax.random.normal(jax.random.PRNGKey(99), oshape.shape,
                                    jnp.float32).astype(oshape.dtype)

            def loss(*a):
                o = jfn(*a)
                return jnp.sum((o * cot).astype(jnp.float32))

            argn = tuple(range(len(args)))
            f = jax.jit(jax.value_and_grad(loss, argnums=argn))
        else:
            f = jax.jit(jfn)
        def scalar_pull(o):
            # slice ON DEVICE before transferring: the host<->chip tunnel
            # sustains ~19MB/s — pulling a full activation is 48s
            lf = jax.tree.leaves(o)[0]
            return float(lf.ravel()[0])

        out = f(*args)
        _ = scalar_pull(out)

        def chain(n):
            t0 = time.perf_counter()
            for _ in range(n):
                o = f(*args)
            _ = scalar_pull(o)
            return time.perf_counter() - t0

        fl = flops if flops is not None else flops_of(f, *args)
        report(name, slope_time(chain), fl)

    key = jax.random.PRNGKey(0)

    for (H, CIN, COUT, tag) in [(84, 64, 64, "s1"),
                                (42, 160, 160, "s2")]:
        print(f"\n=== geometry {tag}: {H}px {CIN}->{COUT}, batch {batch} ===")
        x = jax.random.normal(key, (batch, H, H, CIN), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, CIN, COUT), jnp.float32) * 0.05
        w1x1 = jax.random.normal(key, (1, 1, CIN, COUT), jnp.float32) * 0.05
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

        def conv(xx, ww, win=3):
            pad = [(1, 1), (1, 1)] if win == 3 else [(0, 0), (0, 0)]
            return jax.lax.conv_general_dilated(
                xx, ww.astype(jnp.bfloat16), (1, 1), pad,
                dimension_numbers=dn)

        def bn_train(y, g, b):
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, (0, 1, 2))
            var = jnp.mean(jnp.square(yf), (0, 1, 2)) - jnp.square(mean)
            inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
            a = (inv * g).astype(y.dtype)
            c = (b - mean * inv * g).astype(y.dtype)
            return y * a + c

        g = jnp.ones((COUT,), jnp.float32)
        b = jnp.zeros((COUT,), jnp.float32)

        # --- single conv
        timed("conv fwd", lambda xx: conv(xx, w), x)
        timed("conv fwd+bwd", lambda xx: conv(xx, w), x, grad=True)

        # --- conv + lrelu
        timed("conv+lrelu fwd+bwd",
              lambda xx: jax.nn.leaky_relu(conv(xx, w), 0.1), x, grad=True)

        # --- conv + bn(train) + lrelu
        timed("conv+bn+lrelu fwd+bwd",
              lambda xx: jax.nn.leaky_relu(bn_train(conv(xx, w), g, b), 0.1),
              x, grad=True)

        # --- bn alone fwd+bwd (on a conv-shaped tensor)
        y0 = conv(x, w)
        timed("bn alone fwd+bwd", lambda yy: bn_train(yy, g, b), y0,
              grad=True)

        # --- lrelu alone fwd+bwd
        timed("lrelu alone fwd+bwd",
              lambda yy: jax.nn.leaky_relu(yy, 0.1), y0, grad=True)

        # --- maxpool2 fwd+bwd
        def pool(yy):
            import flax.linen as fnn
            return fnn.max_pool(yy, (2, 2), strides=(2, 2), padding="VALID")

        timed("maxpool2 alone fwd+bwd", pool, y0, grad=True)

        # --- residual add fwd+bwd
        timed("add alone fwd+bwd", lambda aa, bb: aa + bb, y0, y0, grad=True)

        # --- the full BasicBlock chain (3 convs + ds + add + lrelu + pool)
        wd = {"w1": w, "w2": jax.random.normal(key, (3, 3, COUT, COUT),
                                              jnp.float32) * 0.05,
              "w3": jax.random.normal(key, (3, 3, COUT, COUT),
                                      jnp.float32) * 0.05,
              "wd": w1x1}
        dn2 = jax.lax.conv_dimension_numbers(
            (batch, H, H, COUT), (3, 3, COUT, COUT), ("NHWC", "HWIO", "NHWC"))

        def conv2(xx, ww):
            return jax.lax.conv_general_dilated(
                xx, ww.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=dn2)

        def block(params, xx, with_bn=True):
            def mbn(t):
                return bn_train(t, jnp.ones((t.shape[-1],), jnp.float32),
                                jnp.zeros((t.shape[-1],), jnp.float32)) \
                    if with_bn else t
            o = jax.nn.leaky_relu(mbn(conv(xx, params["w1"])), 0.1)
            o = jax.nn.leaky_relu(mbn(conv2(o, params["w2"])), 0.1)
            o = mbn(conv2(o, params["w3"]))
            res = mbn(conv(xx, params["wd"], win=1))
            o = jax.nn.leaky_relu(o + res, 0.1)
            return pool(o)

        _oshape = jax.eval_shape(lambda p, xx: block(p, xx, True), wd, x)
        _cotb = jax.random.normal(jax.random.PRNGKey(98), _oshape.shape,
                                  jnp.float32).astype(_oshape.dtype)

        def block_loss(params, xx, with_bn):
            o = block(params, xx, with_bn)
            return jnp.sum((o * _cotb).astype(jnp.float32))

        gfn = jax.jit(jax.grad(partial(block_loss, with_bn=True)))
        gfn_nobn = jax.jit(jax.grad(partial(block_loss, with_bn=False)))
        fl_bn = flops_of(gfn, wd, x)
        fl_nobn = flops_of(gfn_nobn, wd, x)

        def chain_of(f, *args):
            def chain(n):
                t0 = time.perf_counter()
                for _ in range(n):
                    o = f(*args)
                _ = float(o["w1"].ravel()[0])
                return time.perf_counter() - t0
            return chain

        _ = gfn(wd, x)
        report("block fwd+bwd (full, bn)", slope_time(chain_of(gfn, wd, x)),
               fl_bn)
        _ = gfn_nobn(wd, x)
        report("block fwd+bwd (no bn)",
               slope_time(chain_of(gfn_nobn, wd, x)), fl_nobn)


if __name__ == "__main__":
    main()
