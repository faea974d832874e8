#!/usr/bin/env python
"""Micro-benchmark ONLY the NCE contrast op (fwd and fwd+grad) at the
reference geometry, gather vs matmul (distill/nce.py CONTRAST_MODE)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from subspace_reg_tpu.distill import nce as nce_mod
    from subspace_reg_tpu.distill.nce import init_nce_average, nce_forward
    from subspace_reg_tpu.distill.criterion import nce_loss

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    n_data = int(os.environ.get("BENCH_NDATA", "11712"))
    feat_dim, nce_k = 128, 16384

    st = init_nce_average(jax.random.PRNGKey(0), n_data, feat_dim, nce_k)
    r = np.random.RandomState(0)
    l = jnp.asarray(r.randn(batch, feat_dim), jnp.float32)
    ab = jnp.asarray(r.randn(batch, feat_dim), jnp.float32)
    y = jnp.asarray(r.randint(0, n_data, size=(batch,)), jnp.int32)
    idx = jnp.asarray(r.randint(0, n_data, size=(batch, nce_k + 1)),
                      jnp.int32)

    def loss(l_, ab_):
        o_l, o_ab, _ = nce_forward(st, None, l_, ab_, y,
                                   jax.random.PRNGKey(0), idx=idx)
        return nce_loss(o_l, n_data) + nce_loss(o_ab, n_data)

    modes = os.environ.get("NCE_MODES", "gather,paired,matmul").split(",")
    for mode in modes:
        nce_mod.CONTRAST_MODE = mode
        fwd = jax.jit(loss)
        bwd = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

        def timeit(fn, consume):
            consume(fn(l, ab))

            def chain(n):
                t0 = time.perf_counter()
                out = None
                for _ in range(n):
                    out = fn(l, ab)
                consume(out)
                return time.perf_counter() - t0

            chain(2)
            t8, t32 = chain(8), chain(32)
            return (t32 - t8) / 24 * 1e3  # ms/call, slope method

        f_ms = timeit(fwd, lambda o: float(o))
        b_ms = timeit(bwd, lambda o: float(o[0]))
        print(f"RESULT mode={mode} fwd_ms={f_ms:.2f} fwd+grad_ms={b_ms:.2f}")


if __name__ == "__main__":
    main()
