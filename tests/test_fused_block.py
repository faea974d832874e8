"""Fused BasicBlock (ops/fused_block.py) vs the Flax module path
(models/resnet.py::BasicBlock) — forward, batch statistics, and gradients.
Interpret-mode kernels on CPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from subspace_reg_tpu.models.resnet import BasicBlock
from subspace_reg_tpu.ops import fused_block as fb
from subspace_reg_tpu.ops.pallas import conv_fused as cf


def _setup(B=4, H=12, CIN=8, COUT=8, seed=0, dtype=jnp.bfloat16):
    block = BasicBlock(planes=COUT, stride=2, has_downsample=True,
                       drop_rate=0.0, dtype=dtype)
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.standard_normal((B, H, H, CIN)),
                    dtype if dtype is not None else jnp.float32)
    variables = block.init(jax.random.PRNGKey(seed), x, train=False)
    # randomize BN params so the affine paths are nontrivial
    p = jax.tree.map(lambda a: a, variables["params"])
    for bn in ("bn1", "bn2", "bn3", "ds_bn"):
        p[bn]["scale"] = jnp.asarray(r.uniform(0.5, 1.5, (COUT,)), jnp.float32)
        p[bn]["bias"] = jnp.asarray(r.standard_normal((COUT,)) * 0.1,
                                    jnp.float32)
    return block, p, variables, x


def _flax_fwd(block, p, variables, x):
    out, mut = block.apply(
        {"params": p, "batch_stats": variables["batch_stats"],
         "counters": variables["counters"]},
        x, train=True, mutable=["batch_stats", "counters"])
    return out, mut


@pytest.mark.parametrize("backend", ["pallas", "xla"])
@pytest.mark.parametrize("B,H,CIN,COUT", [(4, 12, 8, 8), (2, 8, 8, 16)])
def test_fused_block_forward_matches_flax(B, H, CIN, COUT, backend):
    block, p, variables, x = _setup(B, H, CIN, COUT)
    out_ref, _ = _flax_fwd(block, p, variables, x)

    (out_pal, stats) = fb.fused_block_apply(x, p, paired_out=False,
                                            interpret=True,
                                            backend=backend)
    np.testing.assert_allclose(np.asarray(out_pal, np.float32),
                               np.asarray(out_ref, np.float32),
                               rtol=0.05, atol=0.08)

    # batch stats match the f32 statistics of the rounded conv outputs
    y1_ref = None  # cross-check just bn1 mean/var against a manual conv
    from tests.test_conv_fused import _ref_conv
    y1_ref = _ref_conv(x, p["conv1"]["kernel"])
    yf = np.asarray(y1_ref, np.float32)
    m1, v1 = stats.bn1
    np.testing.assert_allclose(np.asarray(m1), yf.mean((0, 1, 2)),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(v1), yf.var((0, 1, 2)),
                               rtol=6e-2, atol=6e-2)


def test_fused_block_paired_out_roundtrip():
    block, p, variables, x = _setup(4, 12, 8, 8)
    (out_p, _) = fb.fused_block_apply(x, p, paired_out=True, interpret=True)
    (out_f, _) = fb.fused_block_apply(x, p, paired_out=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(cf.unpaired(out_p)),
                                  np.asarray(out_f))


@pytest.mark.parametrize("backend", ["pallas", "xla"])
@pytest.mark.parametrize("need_dx", [True, False])
def test_fused_block_gradients_match_flax_f32(need_dx, backend):
    """Structural correctness of the hand-derived backward: in f32 the
    fused block's gradients match flax autodiff to ~1e-3 — any formula
    error would show at O(1)."""
    B, H, CIN, COUT = 4, 12, 8, 8
    block, p, variables, x = _setup(B, H, CIN, COUT, seed=3,
                                    dtype=jnp.float32)
    r = np.random.RandomState(7)
    cot = jnp.asarray(r.standard_normal((B, H // 2, H // 2, COUT)),
                      jnp.float32)

    def loss_ref(params, xx):
        out, _ = _flax_fwd(block, params, variables, xx)
        return jnp.sum(out * cot)

    g_ref_p, g_ref_x = jax.grad(loss_ref, argnums=(0, 1))(p, x)

    def loss_pal(params, xx):
        out, _ = fb.fused_block_apply(xx, params, paired_out=False,
                                      need_dx=need_dx, interpret=True,
                                      dtype=jnp.float32, backend=backend)
        return jnp.sum(out * cot)

    g_pal_p, g_pal_x = jax.grad(loss_pal, argnums=(0, 1))(p, x)

    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref_p)[0]
    flat_pal = jax.tree_util.tree_leaves(g_pal_p)
    for (path, lr), lp in zip(flat_ref, flat_pal):
        name = jax.tree_util.keystr(path)
        a, b = np.asarray(lr), np.asarray(lp)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-3 * scale,
                                   err_msg=name)
    if need_dx:
        a, b = np.asarray(g_ref_x), np.asarray(g_pal_x)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-3 * scale)
    else:
        assert float(jnp.sum(jnp.abs(g_pal_x))) == 0.0


def test_fused_block_gradients_bf16_envelope():
    """In bf16 the two computations round differently and reductions over
    thousands of noisy elements amplify elementwise eps by ~sqrt(N); the
    meaningful contract is directional agreement per leaf."""
    B, H, CIN, COUT = 4, 12, 8, 8
    block, p, variables, x = _setup(B, H, CIN, COUT, seed=3)
    r = np.random.RandomState(7)
    cot = jnp.asarray(r.standard_normal((B, H // 2, H // 2, COUT)),
                      jnp.bfloat16)

    def loss_ref(params, xx):
        out, _ = _flax_fwd(block, params, variables, xx)
        return jnp.sum(out.astype(jnp.float32) * cot.astype(jnp.float32))

    g_ref_p = jax.grad(loss_ref)(p, x)

    def loss_pal(params, xx):
        out, _ = fb.fused_block_apply(xx, params, paired_out=False,
                                      interpret=True)
        return jnp.sum(out.astype(jnp.float32) * cot.astype(jnp.float32))

    g_pal_p = jax.grad(loss_pal)(p, x)

    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref_p)[0]
    flat_pal = jax.tree_util.tree_leaves(g_pal_p)
    for (path, lr), lp in zip(flat_ref, flat_pal):
        name = jax.tree_util.keystr(path)
        a = np.asarray(lr, np.float32).ravel()
        b = np.asarray(lp, np.float32).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        cos = float(a @ b / max(na * nb, 1e-30))
        assert cos > 0.995, f"{name}: cosine {cos}"
        assert abs(na - nb) < 0.05 * max(na, nb), f"{name}: {na} vs {nb}"
