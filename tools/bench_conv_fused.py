#!/usr/bin/env python
"""Microbenchmark: fused paired-layout Pallas conv vs the XLA chain it
replaces (affine+lrelu prologue -> conv3x3 -> batch-stat reduce epilogue)
at the pretraining geometries.  Slope-timed (see bench.py).

Usage: python tools/bench_conv_fused.py [s1|s2|entry ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = float(os.environ.get("PEAK_BF16", 197e12))


def slope_time(run_chain, n1=8, n2=24):
    run_chain(2)
    t1 = run_chain(n1)
    t2 = run_chain(n2)
    return max(t2 - t1, 1e-9) / (n2 - n1)


def main(which=("s1", "s2", "entry")):
    import jax
    import jax.numpy as jnp

    from subspace_reg_tpu.ops.pallas import conv_fused as cf

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    geoms = {
        # H, W, Cin, Cout, n_img per grid cell
        "s1": (84, 84, 64, 64, 1),
        "s2": (42, 42, 160, 160, 2),
        "entry": (84, 84, 4, 64, 2),     # 3->64 with channel pad to 4
    }

    for tag in which:
        H, W, CIN, COUT, NIMG = geoms[tag]
        useful_flops = 2 * batch * H * W * 9 * CIN * COUT
        r = np.random.RandomState(0)
        x = jnp.asarray(r.standard_normal((batch, H, W, CIN)), jnp.bfloat16)
        w = jnp.asarray(r.standard_normal((3, 3, CIN, COUT)) * 0.05,
                        jnp.float32)
        a = jnp.asarray(r.uniform(0.5, 1.5, (CIN,)), jnp.float32)
        b = jnp.asarray(r.standard_normal((CIN,)) * 0.1, jnp.float32)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))

        # ---- XLA reference chain
        @jax.jit
        def xla_chain(xx):
            xa = xx * a.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)
            xa = jnp.where(xa > 0, xa, xa * jnp.bfloat16(0.1))
            y = jax.lax.conv_general_dilated(
                xa, w.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=dn,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            yf = y.astype(jnp.float32)
            s1 = jnp.sum(yf, (0, 1, 2))
            s2 = jnp.sum(jnp.square(yf), (0, 1, 2))
            return y, s1, s2

        # ---- XLA bare conv (the emitter's own speed on this shape)
        @jax.jit
        def xla_bare(xx):
            return jax.lax.conv_general_dilated(
                xx, w.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=dn,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        # ---- Pallas fused
        wp = cf.pack_weights_pair(w.astype(jnp.bfloat16))
        aff = (jnp.concatenate([a, a]), jnp.concatenate([b, b]))
        xp = cf.paired(x)

        @jax.jit
        def pallas_fused(xx):
            return cf.conv3x3_pair(xx, wp, affine=aff, relu_in=True,
                                   n_img=NIMG)

        def chain(fn, arg, pull):
            def run(n):
                t0 = time.perf_counter()
                for _ in range(n):
                    o = fn(arg)
                _ = np.asarray(jax.device_get(pull(o))).ravel()[0]
                return time.perf_counter() - t0
            return run

        print(f"\n=== {tag}: {H}x{W} {CIN}->{COUT} batch {batch} "
              f"(useful {useful_flops/1e9:.0f} GF) ===", flush=True)
        try:
            o = pallas_fused(xp)
            _ = np.asarray(jax.device_get(o[1]))
            dt = slope_time(chain(pallas_fused, xp, lambda o: o[1]))
            print(f"pallas fused     {dt*1e3:8.2f} ms "
                  f"{useful_flops/dt/PEAK*100:6.1f}% of peak", flush=True)
        except Exception as e:
            print(f"pallas fused     FAILED: {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)

        o = xla_chain(x)
        _ = np.asarray(jax.device_get(o[1]))
        dt = slope_time(chain(xla_chain, x, lambda o: o[1]))
        print(f"xla chain        {dt*1e3:8.2f} ms "
              f"{useful_flops/dt/PEAK*100:6.1f}% of peak", flush=True)

        o = xla_bare(x)
        dt = slope_time(chain(xla_bare, x, lambda o: o[0, 0, 0, 0]))
        print(f"xla bare conv    {dt*1e3:8.2f} ms "
              f"{useful_flops/dt/PEAK*100:6.1f}% of peak", flush=True)


if __name__ == "__main__":
    main(tuple(sys.argv[1:]) or ("s1", "s2", "entry"))
