"""Correctness of the fused paired-layout conv kernels vs lax.conv
(interpret mode on CPU; hardware parity is exercised by the integration
tests and the benchmark path)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from subspace_reg_tpu.ops.pallas import conv_fused as cf


def _ref_conv(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


@pytest.mark.parametrize("B,H,W,CIN,COUT,nimg", [
    (2, 8, 8, 4, 8, 1),
    (4, 12, 12, 8, 8, 2),
    (2, 8, 8, 8, 16, 1),
])
def test_conv3x3_pair_matches_lax_conv(B, H, W, CIN, COUT, nimg):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.standard_normal((B, H, W, CIN)), jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((3, 3, CIN, COUT)) * 0.2, jnp.float32)

    y_ref = _ref_conv(x, w)

    wp = cf.pack_weights_pair(w.astype(jnp.bfloat16))
    y_pal, stats = cf.conv3x3_pair(cf.paired(x), wp, n_img=nimg,
                                   interpret=True)
    y_pal = cf.unpaired(y_pal)

    np.testing.assert_allclose(np.asarray(y_pal, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=0.02, atol=0.05)

    # stats = (sum, sumsq) of the rounded bf16 output
    yf = np.asarray(y_ref, np.float32)
    mean, var = cf.fold_stats(stats, B * H * W)
    np.testing.assert_allclose(np.asarray(mean), yf.mean((0, 1, 2)),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(var), yf.var((0, 1, 2)),
                               rtol=5e-2, atol=5e-2)


def test_conv3x3_pair_affine_prologue():
    """The input affine + LeakyReLU prologue equals normalize-then-conv."""
    r = np.random.RandomState(1)
    B, H, W, CIN, COUT = 2, 8, 8, 8, 8
    x = jnp.asarray(r.standard_normal((B, H, W, CIN)), jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((3, 3, CIN, COUT)) * 0.2, jnp.float32)
    a = jnp.asarray(r.uniform(0.5, 1.5, (CIN,)), jnp.float32)
    b = jnp.asarray(r.standard_normal((CIN,)) * 0.1, jnp.float32)

    xa = x * a.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)
    xa = jnp.where(xa > 0, xa, xa * jnp.bfloat16(0.1))
    y_ref = _ref_conv(xa, w)

    wp = cf.pack_weights_pair(w.astype(jnp.bfloat16))
    aff = (jnp.concatenate([a, a]), jnp.concatenate([b, b]))
    y_pal, _ = cf.conv3x3_pair(cf.paired(x), wp, affine=aff, relu_in=True,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(cf.unpaired(y_pal), np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=0.02, atol=0.05)


def test_paired_roundtrip():
    r = np.random.RandomState(2)
    x = jnp.asarray(r.standard_normal((2, 4, 6, 3)), jnp.float32)
    assert np.array_equal(np.asarray(cf.unpaired(cf.paired(x))),
                          np.asarray(x))
    # paired[b,h,p,d*C+c] == flat[b,h,2p+d,c]
    p = np.asarray(cf.paired(x))
    xf = np.asarray(x)
    assert np.array_equal(p[1, 2, 1, 3 + 2], xf[1, 2, 3, 2])
