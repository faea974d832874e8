"""End-to-end: the fused-frontend pretraining step (models/fused_forward.py
via make_train_step(fused=True)) vs the module-path step — loss, metrics,
running stats, counters, and parameter updates.  CPU interpret-mode kernels.

Dropout RNG mapping differs between the paths (the fused path draws its own
split streams), so tests run with drop_rate=0; dropout itself is covered by
test_fused_forward_dropout_mask_stats.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from subspace_reg_tpu.data.transforms import transforms_options
from subspace_reg_tpu.engine import pretrain as pt
from subspace_reg_tpu.models.resnet import ResNetRFS
from subspace_reg_tpu.models import fused_forward as ff
from subspace_reg_tpu.utils import optim as optim_lib

N_CLS, IMG, BATCH = 12, 16, 8


def _setup(drop_rate=0.0):
    backbone = ResNetRFS(n_blocks=(1, 1, 2, 2), drop_rate=drop_rate,
                         no_dropblock=True, avg_pool=True,
                         widths=(8, 16, 24, 32), dtype=jnp.bfloat16)
    tx = optim_lib.sgd_torch(0.05, momentum=0.9, weight_decay=5e-4)
    state = pt.init_pretrain_state(backbone, jax.random.PRNGKey(0),
                                   N_CLS, IMG, tx, with_bias=False)
    spec, _ = transforms_options["A"]
    r = np.random.RandomState(0)
    x = r.randint(0, 256, size=(BATCH, IMG, IMG, 3)).astype(np.uint8)
    y = r.randint(0, N_CLS, size=(BATCH,)).astype(np.int32)
    return backbone, tx, state, spec, x, y


def test_can_fuse_gates():
    backbone, *_ = _setup()
    assert ff.can_fuse(backbone, 16, train=True)
    assert not ff.can_fuse(backbone, 16, train=False)
    assert not ff.can_fuse(backbone, 15, train=True)
    b24 = ResNetRFS(n_blocks=(2, 2, 2, 2), dtype=jnp.bfloat16)
    assert not ff.can_fuse(b24, 16, train=True)
    bf32 = ResNetRFS(n_blocks=(1, 1, 2, 2))
    assert not ff.can_fuse(bf32, 16, train=True)


def test_fused_step_matches_module_step():
    backbone, tx, state, spec, x, y = _setup(drop_rate=0.0)
    key = jax.random.PRNGKey(7)

    step_ref = pt.make_train_step(backbone, tx, spec, with_bias=False)
    step_fused = pt.make_train_step(backbone, tx, spec, with_bias=False,
                                    fused=True)

    init_params = jax.tree.map(lambda a: np.asarray(a), state.params)

    # chaos control: the module step from half-ulp-perturbed params — the
    # bf16 noise floor at this tiny geometry (widths 8-32, batch 8) is
    # large (leaf cosines down to ~0.82 measured); the fused path must not
    # diverge from the module path faster than that floor.
    pr = np.random.RandomState(5)
    pert = jax.tree.map(
        lambda p: jnp.asarray(np.asarray(p)
                              * (1.0 + 0.004 * pr.standard_normal(p.shape)),
                              jnp.asarray(p).dtype), state.params)
    pert_np = jax.tree.map(lambda a: np.asarray(a), pert)

    # each call gets a fresh deep copy: the step donates its state argument
    s_ref, m_ref = step_ref(jax.tree.map(jnp.copy, state),
                            jnp.asarray(x), jnp.asarray(y), key)
    s_ctl, _ = step_ref(
        jax.tree.map(jnp.copy, state).replace(
            params=jax.tree.map(jnp.copy, pert)),
        jnp.asarray(x), jnp.asarray(y), key)
    s_fus, m_fus = step_fused(jax.tree.map(jnp.copy, state),
                              jnp.asarray(x), jnp.asarray(y), key)

    assert float(m_fus["loss"]) == pytest.approx(float(m_ref["loss"]),
                                                 rel=0.03)
    assert float(m_fus["acc5"]) == pytest.approx(float(m_ref["acc5"]),
                                                 abs=0.26)

    # running stats: EMA of (almost) the same batch statistics
    fr = jax.tree_util.tree_flatten_with_path(s_ref.batch_stats)[0]
    fp = jax.tree_util.tree_leaves(s_fus.batch_stats)
    for (path, lr), lp in zip(fr, fp):
        a, b = np.asarray(lr), np.asarray(lp)
        np.testing.assert_allclose(b, a, rtol=0.05, atol=0.05,
                                   err_msg=jax.tree_util.keystr(path))

    # counters: every block advanced exactly once
    cr = jax.tree_util.tree_leaves(s_ref.counters)
    cf_ = jax.tree_util.tree_leaves(s_fus.counters)
    for a, b in zip(cr, cf_):
        assert int(a) == int(b) == 1

    # parameter updates: fused-vs-module divergence bounded by the control
    def upd(snew, sinit):
        ln = jax.tree_util.tree_leaves(snew)
        li = jax.tree_util.tree_leaves(sinit)
        return [np.asarray(a, np.float32).ravel()
                - np.asarray(b, np.float32).ravel()
                for a, b in zip(ln, li)]

    u_ref = upd(s_ref.params, init_params)
    u_fus = upd(s_fus.params, init_params)
    u_ctl = upd(s_ctl.params, pert_np)
    paths = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(s_ref.params)[0]]
    for name, a, b, c in zip(paths, u_ref, u_fus, u_ctl):
        if a.size < 32:
            continue
        d_fus = np.linalg.norm(b - a)
        d_ctl = np.linalg.norm(c - a)
        floor = 0.02 * max(np.linalg.norm(a), 1e-9)
        assert d_fus <= max(3.0 * d_ctl, floor), (
            f"{name}: fused divergence {d_fus:.3e} vs control {d_ctl:.3e}")


def test_fused_forward_dropout_mask_stats():
    """Fused-path dropout: keep-rate and scaling statistics match the
    contract (nn.Dropout: mask ~ Bernoulli(1-rate), kept values scaled by
    1/(1-rate))."""
    r = np.random.RandomState(0)
    x = jnp.asarray(r.standard_normal((64, 64)) + 5.0, jnp.bfloat16)
    out = ff._dropout(jax.random.PRNGKey(1), x, 0.25)
    kept = np.asarray(out) != 0
    assert 0.65 < kept.mean() < 0.85
    ratio = np.asarray(out, np.float32)[kept] / np.asarray(x, np.float32)[kept]
    np.testing.assert_allclose(ratio, 1.0 / 0.75, rtol=0.01)
