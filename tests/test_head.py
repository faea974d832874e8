"""Padded classifier head: growth semantics, masking, init distribution."""

import numpy as np

import jax
import jax.numpy as jnp

from subspace_reg_tpu.models import head as head_lib


def test_init_head_active_rows_and_padding():
    h = head_lib.init_head(jax.random.PRNGKey(0), n_cls=60, in_dim=640,
                           with_bias=False, max_classes=100)
    w = np.asarray(h.weight)
    assert w.shape == (100, 640)
    assert int(h.n_active) == 60
    assert np.all(w[60:] == 0)
    k = 1.0 / np.sqrt(640)
    assert np.all(np.abs(w[:60]) <= k)
    # roughly uniform: mean near 0, fills the range
    assert abs(w[:60].mean()) < k / 20
    assert w[:60].max() > 0.9 * k and w[:60].min() < -0.9 * k


def test_logits_masked_matches_unpadded_softmax():
    r = np.random.RandomState(0)
    h = head_lib.init_head(jax.random.PRNGKey(1), 7, in_dim=16,
                           with_bias=True, max_classes=12)
    feat = jnp.asarray(r.randn(5, 16).astype(np.float32))
    out = head_lib.logits(h, feat)
    assert out.shape == (5, 12)
    probs = jax.nn.softmax(out, axis=-1)
    np.testing.assert_allclose(np.asarray(probs[:, 7:]), 0.0, atol=1e-20)
    # active part equals plain linear
    want = np.asarray(feat) @ np.asarray(h.weight[:7]).T + np.asarray(h.bias[:7])
    np.testing.assert_allclose(np.asarray(out[:, :7]), want, rtol=1e-5)


def test_augment_grows_and_preserves():
    h = head_lib.init_head(jax.random.PRNGKey(2), 60, in_dim=32,
                           with_bias=False, max_classes=100)
    w_before = np.asarray(h.weight).copy()
    h2 = head_lib.augment(h, jax.random.PRNGKey(3), 5)
    assert int(h2.n_active) == 65
    w_after = np.asarray(h2.weight)
    np.testing.assert_array_equal(w_after[:60], w_before[:60])
    np.testing.assert_array_equal(w_after[65:], 0)
    k = 1.0 / np.sqrt(32)
    new_rows = w_after[60:65]
    assert np.all(np.abs(new_rows) <= k) and np.any(new_rows != 0)


def test_augment_under_jit_with_traced_n_active():
    h = head_lib.init_head(jax.random.PRNGKey(4), 60, in_dim=32,
                           with_bias=False, max_classes=100)

    @jax.jit
    def grow(head, rng):
        return head_lib.augment(head, rng, 5)

    h2 = grow(h, jax.random.PRNGKey(5))
    h3 = grow(h2, jax.random.PRNGKey(6))
    assert int(h3.n_active) == 70
    w = np.asarray(h3.weight)
    assert np.any(w[65:70] != 0) and np.all(w[70:] == 0)
