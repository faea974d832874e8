#!/usr/bin/env python
"""Composed achievable-SOL denominator for the pretraining benchmark.

Measures, on the real chip, the standalone (bare-op) time of EVERY op in the
resnet18-RFS fwd+bwd step at the reference's 84px training geometry
(/root/reference/train_supervised.py:216-244 hot loop), then sums them:

    composed_sol = sum(conv fwd+VJP) + sum(BN/relu/add/pool/dropout fwd+VJP)
                   + measured gather/augment/optimizer overhead

This is the same sum-of-bare-ops methodology as BASELINE.md's pure-conv SOL,
extended to the glue ops the step cannot avoid (BN-train statistics are part
of the architecture's semantics).  It assumes zero cross-op overlap, so a
schedule that hides glue under conv tiles can BEAT it — the measured step
exceeding any component, or the sum, falsifies the instrument.  bench.py's
``vs_composed_sol`` divides measured throughput by this denominator
(constants recorded from this tool's output; derivation in BASELINE.md).

Op census derived from subspace_reg_tpu/models/resnet.py (n_blocks=(1,1,2,2),
widths 64/160/320/640, stride-2 MaxPool per stage entry, drop_rate=0.1):
spatial chain 84 -> 42 -> 21 -> 10 -> 5.

Usage:  python tools/exp_glue_sol.py [batch]        (default 1024)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from subspace_reg_tpu.utils.jax_setup import configure as _jax_configure

_jax_configure()   # persistent compile cache (utils/jax_setup.py)

import jax
import jax.numpy as jnp
from flax import linen as nn

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
BF16 = jnp.bfloat16

# ---------------------------------------------------------------------------
# op census: (spatial, cin, cout, kernel, count, needs_dx)
# needs_dx=False for the two stem convs (input is the image; no dx in bwd)
CONVS = [
    (84, 3, 64, 3, 1, False),     # layer1_0 conv1 (stem)
    (84, 64, 64, 3, 2, True),     # layer1_0 conv2/conv3
    (84, 3, 64, 1, 1, False),     # layer1_0 ds_conv (stem)
    (42, 64, 160, 3, 1, True),    # layer2_0 conv1
    (42, 160, 160, 3, 2, True),   # layer2_0 conv2/conv3
    (42, 64, 160, 1, 1, True),    # layer2_0 ds_conv
    (21, 160, 320, 3, 1, True),   # layer3_0 conv1
    (21, 320, 320, 3, 2, True),   # layer3_0 conv2/conv3
    (21, 160, 320, 1, 1, True),   # layer3_0 ds_conv
    (10, 320, 320, 3, 3, True),   # layer3_1 conv1-3
    (10, 320, 640, 3, 1, True),   # layer4_0 conv1
    (10, 640, 640, 3, 2, True),   # layer4_0 conv2/conv3
    (10, 320, 640, 1, 1, True),   # layer4_0 ds_conv
    (5, 640, 640, 3, 3, True),    # layer4_1 conv1-3
]

# BN-train instances at conv-output shapes (pre-pool): (spatial, ch, count)
BNS = [(84, 64, 4), (42, 160, 4), (21, 320, 4),
       (10, 320, 3), (10, 640, 4), (5, 640, 3)]

# LeakyReLU(0.1): 3 per block at block spatial
RELUS = [(84, 64, 3), (42, 160, 3), (21, 320, 3),
         (10, 320, 3), (10, 640, 3), (5, 640, 3)]

# residual add: 1 per block
ADDS = [(84, 64, 1), (42, 160, 1), (21, 320, 1),
        (10, 320, 1), (10, 640, 1), (5, 640, 1)]

# stride-2 MaxPool on the 4 stage-entry blocks (inner blocks: identity)
POOLS = [(84, 64), (42, 160), (21, 320), (10, 640)]

# dropout-family mask-multiplies on post-pool outputs (drop_rate 0.1;
# DropBlock with block_size=1 is the same mask-multiply shape-wise)
DROPS = [(42, 64, 1), (21, 160, 1), (10, 320, 2), (5, 640, 2)]


def chain_time(fn, args, n1=6, n2=24):
    """Slope-timed: two chain lengths, forced scalar pull, relay-robust
    (same methodology as bench.py)."""
    def pull(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return float(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32)))

    out = fn(*args)                      # compile + warm
    _ = pull(out)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _ = pull(o)
        return time.perf_counter() - t0

    t1 = run(n1)
    t2 = run(n2)
    return max(t2 - t1, 1e-9) / (n2 - n1)


def t_ms(fn, args):
    return chain_time(fn, args) * 1e3


rng = np.random.RandomState(0)


def arr(s, c, dtype=BF16):
    return jnp.asarray(rng.randn(B, s, s, c), dtype)


def conv_entry(s, cin, cout, k, needs_dx):
    x = arr(s, cin)
    w = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, BF16)
    dim_nums = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    pad = "SAME" if k == 3 else "VALID"

    def f(xx, ww):
        return jax.lax.conv_general_dilated(
            xx, ww, (1, 1), pad, dimension_numbers=dim_nums,
            preferred_element_type=BF16)

    fwd = jax.jit(f)
    if needs_dx:
        g = jax.jit(lambda xx, ww: jax.vjp(f, xx, ww)[1](f(xx, ww)))
    else:
        g = jax.jit(lambda xx, ww: jax.grad(
            lambda w_: jnp.sum(f(xx, w_).astype(jnp.float32)))(ww))
    return t_ms(fwd, (x, w)), t_ms(g, (x, w))


def bn_entry(s, c):
    x = arr(s, c)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    def f(xx, sc, bi):
        xs = xx.astype(jnp.float32)
        mean = jnp.mean(xs, (0, 1, 2))
        var = jnp.mean(jnp.square(xs), (0, 1, 2)) - jnp.square(mean)
        inv = jax.lax.rsqrt(var + 1e-5)
        out = (xs - mean) * (inv * sc) + bi
        return out.astype(xx.dtype)

    def loss(xx, sc, bi):
        return jnp.sum(f(xx, sc, bi).astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    return t_ms(g, (x, scale, bias))


def relu_entry(s, c):
    x = arr(s, c)
    g = jax.jit(jax.grad(
        lambda xx: jnp.sum(nn.leaky_relu(xx, 0.1).astype(jnp.float32))))
    return t_ms(g, (x,))


def add_entry(s, c):
    x, y = arr(s, c), arr(s, c)
    g = jax.jit(jax.grad(
        lambda xx, yy: jnp.sum((xx + yy).astype(jnp.float32)), (0, 1)))
    return t_ms(g, (x, y))


def pool_entry(s, c):
    x = arr(s, c)
    g = jax.jit(jax.grad(lambda xx: jnp.sum(nn.max_pool(
        xx, (2, 2), strides=(2, 2), padding="VALID").astype(jnp.float32))))
    return t_ms(g, (x,))


def drop_entry(s, c):
    x = arr(s, c)
    key = jax.random.PRNGKey(0)

    def f(xx, kk):
        mask = jax.random.bernoulli(kk, 0.9, xx.shape)
        return jnp.where(mask, xx / 0.9, 0).astype(xx.dtype)

    g = jax.jit(lambda xx, kk: jax.grad(
        lambda x_: jnp.sum(f(x_, kk).astype(jnp.float32)))(xx))
    return t_ms(g, (x, key))


def main():
    assert jax.default_backend() == "tpu", "run on the chip"
    rows, conv_fwd_total, conv_vjp_total = [], 0.0, 0.0
    for s, cin, cout, k, n, needs_dx in CONVS:
        tf, tg = conv_entry(s, cin, cout, k, needs_dx)
        conv_fwd_total += n * tf
        conv_vjp_total += n * tg
        rows.append(("conv%dx%d %dpx %d->%d x%d" % (k, k, s, cin, cout, n),
                     n * tf, n * tg))
        print(rows[-1], flush=True)

    glue_total = 0.0
    for s, c, n in BNS:
        t = n * bn_entry(s, c)
        glue_total += t
        rows.append((f"bn-train {s}px c{c} x{n}", None, t))
        print(rows[-1], flush=True)
    for s, c, n in RELUS:
        t = n * relu_entry(s, c)
        glue_total += t
        rows.append((f"leaky_relu {s}px c{c} x{n}", None, t))
        print(rows[-1], flush=True)
    for s, c, n in ADDS:
        t = n * add_entry(s, c)
        glue_total += t
        rows.append((f"residual-add {s}px c{c} x{n}", None, t))
        print(rows[-1], flush=True)
    for s, c in POOLS:
        t = pool_entry(s, c)
        glue_total += t
        rows.append((f"maxpool2 {s}px c{c}", None, t))
        print(rows[-1], flush=True)
    for s, c, n in DROPS:
        t = n * drop_entry(s, c)
        glue_total += t
        rows.append((f"dropout {s}px c{c} x{n}", None, t))
        print(rows[-1], flush=True)

    # measured non-model overhead: full production step minus the bare
    # fwd+bwd program (gather + fused augmentation + head/CE + SGD update)
    from subspace_reg_tpu.data.transforms import transforms_options
    from subspace_reg_tpu.engine import pretrain as pt
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.utils import optim as optim_lib

    backbone = ResNetRFS(n_blocks=(1, 1, 2, 2), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True, dtype=BF16)
    tx = optim_lib.sgd_torch(0.05, momentum=0.9, weight_decay=5e-4)
    state = pt.init_pretrain_state(backbone, jax.random.PRNGKey(0), 60, 84,
                                   tx, with_bias=False)
    train_spec, _ = transforms_options["A"]
    step_dd = pt.make_train_step_device_data(backbone, tx, train_spec,
                                             with_bias=False)
    data = jax.device_put(rng.randint(
        0, 256, size=(4096, 84, 84, 3)).astype(np.uint8))
    labels = jax.device_put(rng.randint(0, 60, size=(4096,)).astype(np.int32))
    idx = jnp.asarray(rng.randint(0, 4096, size=(B,)), jnp.int32)
    key = jax.random.PRNGKey(1)

    stt = [state]

    def step_fn(xx, kk):
        stt[0], m = step_dd(stt[0], data, labels, xx, kk)
        return m["loss"]

    step_ms = t_ms(step_fn, (idx, key))

    xf = arr(84, 3)

    def fwdbwd(params, bs, cnt, xx, kk):
        def loss_fn(p):
            out, upd = backbone.apply(
                {"params": p, "batch_stats": bs, "counters": cnt}, xx,
                train=True, mutable=["batch_stats", "counters"],
                rngs={"dropout": kk})
            return jnp.mean(jnp.square(out))
        return jax.grad(loss_fn)(params)

    fb = jax.jit(fwdbwd)
    # state was donated into step_dd; stt[0] holds the live buffers
    live = stt[0]
    fwdbwd_ms = t_ms(fb, (live.params["backbone"], live.batch_stats,
                          live.counters, xf, key))

    overhead_ms = max(step_ms - fwdbwd_ms, 0.0)
    composed = conv_vjp_total + glue_total + overhead_ms
    out = {
        "batch": B,
        "conv_fwd_sol_ms": round(conv_fwd_total, 1),
        "conv_fwdbwd_sol_ms": round(conv_vjp_total, 1),
        "glue_fwdbwd_sol_ms": round(glue_total, 1),
        "overhead_ms": round(overhead_ms, 1),
        "measured_step_ms": round(step_ms, 1),
        "measured_fwdbwd_ms": round(fwdbwd_ms, 1),
        "composed_sol_ms": round(composed, 1),
        "composed_sol_ips": round(B / composed * 1e3, 1),
        "measured_ips": round(B / step_ms * 1e3, 1),
        "vs_composed_sol": round(composed / step_ms, 4),
    }
    print(json.dumps(out))
    # persist for bench.py's vs_composed_sol denominator (only the canonical
    # batch-1024 measurement becomes the instrument constant)
    if B == 1024:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "composed_sol.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
