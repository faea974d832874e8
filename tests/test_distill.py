"""Distillation subsystem: alias sampling, NCE banks, criteria vs torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subspace_reg_tpu.distill import (
    AliasSampler, DistillKL, init_nce_average, nce_forward, nce_loss,
    nce_softmax_loss, Embed, MLPEmbed, l2_normalize,
)
from subspace_reg_tpu.distill.criterion import (
    label_smoothing_loss, bce_with_logits_loss, hint_loss, attention_loss)


def test_alias_sampler_distribution():
    probs = np.array([0.1, 0.2, 0.3, 0.4])
    s = AliasSampler(probs)
    draws = np.asarray(s.draw(jax.random.PRNGKey(0), (200_000,)))
    freq = np.bincount(draws, minlength=4) / len(draws)
    np.testing.assert_allclose(freq, probs, atol=0.01)


def test_distill_kl_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    r = np.random.RandomState(0)
    s = r.randn(8, 10).astype(np.float32)
    t = r.randn(8, 10).astype(np.float32)
    T = 4.0
    p_s = F.log_softmax(torch.from_numpy(s) / T, dim=1)
    p_t = F.softmax(torch.from_numpy(t) / T, dim=1)
    want = (F.kl_div(p_s, p_t, reduction="sum") * (T ** 2) / 8).item()
    got = float(DistillKL(jnp.asarray(s), jnp.asarray(t), T))
    assert got == pytest.approx(want, rel=1e-4)


def test_nce_forward_and_bank_update():
    n_data, dim, k = 50, 16, 8
    st = init_nce_average(jax.random.PRNGKey(0), n_data, dim, k)
    sampler = AliasSampler(np.ones(n_data))
    r = np.random.RandomState(1)
    l = jnp.asarray(l2_normalize(jnp.asarray(r.randn(4, dim), jnp.float32)))
    ab = jnp.asarray(l2_normalize(jnp.asarray(r.randn(4, dim), jnp.float32)))
    y = jnp.asarray([3, 7, 11, 20])
    out_l, out_ab, st2 = nce_forward(st, sampler.draw, l, ab, y,
                                     jax.random.PRNGKey(2))
    assert out_l.shape == (4, k + 1) and out_ab.shape == (4, k + 1)
    assert float(st2.z_l) > 0 and float(st2.z_ab) > 0
    # banks updated at y with momentum + renorm (unit norm rows)
    upd = np.asarray(st2.memory_l[np.asarray(y)])
    np.testing.assert_allclose(np.linalg.norm(upd, axis=1), 1.0, rtol=1e-5)
    untouched = np.asarray(st2.memory_l[0])
    np.testing.assert_array_equal(untouched, np.asarray(st.memory_l[0]))
    # losses finite
    assert np.isfinite(float(nce_loss(out_l, n_data)))
    assert np.isfinite(float(nce_softmax_loss(out_l)))


def test_contrast_matmul_matches_gather():
    """The full-bank-matmul contrast path (the TPU-fast one) computes the
    same (B, K+1) outputs and the same cotangents as the row-gather path
    (reference semantics, distill/NCEAverage.py forward)."""
    from subspace_reg_tpu.distill import nce as nce_mod

    n_data, dim, k, b = 64, 16, 40, 4
    st = init_nce_average(jax.random.PRNGKey(0), n_data, dim, k)
    r = np.random.RandomState(3)
    l = l2_normalize(jnp.asarray(r.randn(b, dim), jnp.float32))
    ab = l2_normalize(jnp.asarray(r.randn(b, dim), jnp.float32))
    y = jnp.asarray([1, 5, 9, 13])
    idx = jnp.asarray(r.randint(0, n_data, size=(b, k + 1)), jnp.int32)
    idx = idx.at[:, 0].set(y)

    def run(mode):
        def f(l_, ab_):
            o_l, o_ab, _ = nce_forward(st, None, l_, ab_, y,
                                       jax.random.PRNGKey(0), idx=idx,
                                       mode=mode)
            return o_l, o_ab

        outs = f(l, ab)
        loss = lambda l_, ab_: (nce_loss(f(l_, ab_)[0], n_data)
                                + nce_loss(f(l_, ab_)[1], n_data))
        grads = jax.grad(loss, argnums=(0, 1))(l, ab)
        return outs, grads

    with pytest.raises(ValueError, match="unknown NCE contrast mode"):
        nce_forward(st, None, l, ab, y, jax.random.PRNGKey(0), idx=idx,
                    mode="pared")
    assert nce_mod.CONTRAST_MODE == "auto"  # explicit arg leaves the default

    (gl, gab), (ggl, ggab) = run("gather")
    for mode in ("matmul", "paired", "auto"):
        (ml, mab), (mgl, mgab) = run(mode)
        np.testing.assert_allclose(np.asarray(gl), np.asarray(ml), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(gab), np.asarray(mab),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(ggl), np.asarray(mgl),
                                   rtol=2e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ggab), np.asarray(mgab),
                                   rtol=2e-4, atol=1e-7)


def test_label_smoothing_matches_torch_reference_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    r = np.random.RandomState(2)
    x = r.randn(6, 9).astype(np.float32)
    y = r.randint(0, 9, 6)
    smoothing = 0.1
    logprobs = F.log_softmax(torch.from_numpy(x), dim=-1)
    nll = -logprobs.gather(dim=-1, index=torch.from_numpy(y)[:, None]).squeeze(1)
    smooth = -logprobs.mean(dim=-1)
    want = ((1 - smoothing) * nll + smoothing * smooth).mean().item()
    got = float(label_smoothing_loss(jnp.asarray(x), jnp.asarray(y), smoothing))
    assert got == pytest.approx(want, rel=1e-5)


def test_bce_with_logits_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    r = np.random.RandomState(3)
    x = r.randn(5, 7).astype(np.float32)
    y = r.randint(0, 7, 5)
    onehot = F.one_hot(torch.from_numpy(y), num_classes=7).float()
    want = F.binary_cross_entropy_with_logits(torch.from_numpy(x), onehot).item()
    got = float(bce_with_logits_loss(jnp.asarray(x), jnp.asarray(y), 7))
    assert got == pytest.approx(want, rel=1e-4)


def test_embed_heads():
    r = np.random.RandomState(4)
    x = jnp.asarray(r.randn(3, 5, 5, 8).astype(np.float32))
    for M in (Embed, MLPEmbed):
        m = M(dim_out=16)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (3, 16)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1),
                                   1.0, rtol=1e-5)


def test_hint_and_attention_losses():
    r = np.random.RandomState(5)
    fs = [jnp.asarray(r.randn(2, 8, 8, 4).astype(np.float32))]
    ft = [jnp.asarray(r.randn(2, 8, 8, 4).astype(np.float32))]
    assert float(hint_loss(fs[0], ft[0])) > 0
    assert float(attention_loss(fs, ft)) > 0
    assert float(attention_loss(fs, fs)) == pytest.approx(0.0, abs=1e-7)
