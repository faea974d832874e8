"""Unit tests for losses/regularizers against torch oracles and hand values."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subspace_reg_tpu.ops import losses
from subspace_reg_tpu.models import lang_puller as lp


def test_safe_norm_value_and_zero_grad():
    x = jnp.asarray([[3.0, 4.0]])
    assert float(losses.safe_norm(x)) == pytest.approx(5.0)
    g = jax.grad(lambda a: losses.safe_norm(a))(jnp.zeros((2, 3)))
    assert np.all(np.asarray(g) == 0.0)
    g2 = jax.grad(lambda a: losses.safe_norm(a))(x)
    np.testing.assert_allclose(np.asarray(g2), [[0.6, 0.8]], rtol=1e-6)


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(0)
    logits = r.randn(7, 11).astype(np.float32)
    labels = r.randint(0, 11, size=7)
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(want, rel=1e-5)


def test_cross_entropy_masked_equals_unpadded():
    r = np.random.RandomState(1)
    logits = r.randn(10, 5).astype(np.float32)
    labels = r.randint(0, 5, size=10)
    mask = np.zeros(10, np.float32)
    mask[:6] = 1.0
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                     jnp.asarray(mask)))
    want = float(losses.cross_entropy(jnp.asarray(logits[:6]),
                                      jnp.asarray(labels[:6])))
    assert got == pytest.approx(want, rel=1e-6)


def test_accuracy_topk_matches_reference_semantics():
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(2)
    logits = r.randn(64, 20).astype(np.float32)
    labels = r.randint(0, 20, size=64)
    # reference eval/util.py:26-40
    out = torch.from_numpy(logits)
    tgt = torch.from_numpy(labels)
    _, pred = out.topk(5, 1, True, True)
    pred = pred.t()
    correct = pred.eq(tgt.view(1, -1).expand_as(pred))
    want1 = correct[:1].reshape(-1).float().sum(0).mul_(100.0 / 64).item()
    want5 = correct[:5].reshape(-1).float().sum(0).mul_(100.0 / 64).item()
    got1, got5 = losses.accuracy_topk(jnp.asarray(logits), jnp.asarray(labels))
    assert float(got1) == pytest.approx(want1, abs=1e-4)
    assert float(got5) == pytest.approx(want5, abs=1e-4)


def test_regloss_unsquared_weight_squared_bias():
    r = np.random.RandomState(3)
    W = jnp.asarray(r.randn(10, 6).astype(np.float32))
    W0 = jnp.asarray(r.randn(10, 6).astype(np.float32))
    b = jnp.asarray(r.randn(10).astype(np.float32))
    b0 = jnp.asarray(r.randn(10).astype(np.float32))
    n_base = 4
    lmbd = 0.2
    want = lmbd * np.linalg.norm(np.asarray(W)[:4] - np.asarray(W0)[:4])
    want += lmbd * np.sum((np.asarray(b)[:4] - np.asarray(b0)[:4]) ** 2)
    got = float(losses.regloss(lmbd, W, W0, n_base, b, b0))
    assert got == pytest.approx(float(want), rel=1e-5)


def test_reglossnovel_anchors_at_original_base_count():
    r = np.random.RandomState(4)
    W = jnp.asarray(r.randn(20, 6).astype(np.float32))
    reserved_full = r.randn(8, 6).astype(np.float32)
    k = 5
    reserved = jnp.asarray(reserved_full)
    lmbd = 0.1
    num_classes = 10
    want = lmbd * np.linalg.norm(
        np.asarray(W)[10:15] - reserved_full[:5])
    got = float(losses.reglossnovel(lmbd, W, reserved, num_classes, k))
    assert got == pytest.approx(float(want), rel=1e-5)


def test_projected_weight_matches_torch_qr():
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(5)
    base_w = r.randn(12, 30).astype(np.float32)   # 12 base rows, dim 30
    w = r.randn(5, 30).astype(np.float32)
    # torch oracle (reference models/resnet_language.py:92-97)
    tr = torch.from_numpy(base_w).t()
    Q, _ = torch.linalg.qr(tr, mode="reduced")
    mut = torch.from_numpy(w) @ Q
    mutnorm = mut / torch.norm(Q.T, dim=1).unsqueeze(0)
    want = (mutnorm @ Q.T).numpy()
    got = np.asarray(lp.projected_weight(jnp.asarray(base_w), jnp.asarray(w)))
    # QR sign conventions may differ; the projection itself is unique
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pull_loss_squared():
    r = np.random.RandomState(6)
    a = r.randn(5, 7).astype(np.float32)
    b = r.randn(5, 7).astype(np.float32)
    want = 0.3 * np.sum((a - b) ** 2)
    got = float(lp.pull_loss(0.3, jnp.asarray(a), jnp.asarray(b)))
    assert got == pytest.approx(float(want), rel=1e-5)


def test_pullers_semantic_attractors():
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(7)
    e_novel = r.randn(5, 16).astype(np.float32)
    e_base = r.randn(12, 16).astype(np.float32)
    w_base = r.randn(12, 30).astype(np.float32)
    temp = 3.0
    scores = torch.from_numpy(e_novel) @ torch.from_numpy(e_base).t()
    probs = torch.nn.Softmax(dim=1)(scores / temp)
    want = (probs @ torch.from_numpy(w_base)).numpy()
    st = lp.LangPullerState(base_embeds=jnp.asarray(e_base),
                            novel_embeds=jnp.asarray(e_novel),
                            temperature=temp)
    got = np.asarray(lp.pullers(st, jnp.asarray(w_base)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pull_grad_direction_matches_projection_identity():
    """grad of ||W QQ^T - W||^2 equals 2 W (I - P): the reference does not
    detach the projection (eval/language_eval.py:281-287) but the gradient is
    identical to the detached form."""
    r = np.random.RandomState(8)
    base_w = jnp.asarray(r.randn(6, 10).astype(np.float32))
    w = jnp.asarray(r.randn(3, 10).astype(np.float32))

    def through(wv):
        return lp.pull_loss(1.0, lp.projected_weight(base_w, wv), wv)

    def detached(wv):
        tgt = jax.lax.stop_gradient(lp.projected_weight(base_w, wv))
        return lp.pull_loss(1.0, tgt, wv)

    g1 = jax.grad(through)(w)
    g2 = jax.grad(detached)(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)
