"""PyTorch-exact optimizer semantics (coupled weight decay, momentum init)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subspace_reg_tpu.utils import optim as optim_lib


def _run_optax(tx, w0, grads_seq):
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return np.asarray(params["w"])


def test_sgd_matches_torch():
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(0)
    w0 = r.randn(4, 3).astype(np.float32)
    grads = [r.randn(4, 3).astype(np.float32) for _ in range(5)]

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([p], lr=0.002, momentum=0.9, weight_decay=5e-3)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    want = p.detach().numpy()

    tx = optim_lib.sgd_torch(0.002, momentum=0.9, weight_decay=5e-3)
    got = _run_optax(tx, w0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(1)
    w0 = r.randn(6).astype(np.float32)
    grads = [r.randn(6).astype(np.float32) for _ in range(4)]

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([p], lr=0.01, weight_decay=0.0005)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    want = p.detach().numpy()

    tx = optim_lib.adam_torch(0.01, weight_decay=0.0005)
    got = _run_optax(tx, w0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_step_decay_schedule():
    sched = optim_lib.step_decay_schedule(0.05, [60, 80], 0.1, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(0.05)
    assert float(sched(59 * 10)) == pytest.approx(0.05)       # epoch 60
    assert float(sched(60 * 10)) == pytest.approx(0.005)      # epoch 61
    assert float(sched(80 * 10)) == pytest.approx(0.0005)     # epoch 81


def test_cosine_schedule_matches_torch():
    torch = pytest.importorskip("torch")
    base_lr, rate, epochs = 0.05, 0.1, 100
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    eta_min = base_lr * rate ** 3
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, epochs, eta_min, -1)
    sched = optim_lib.cosine_schedule(base_lr, rate, epochs, steps_per_epoch=5)
    for epoch in range(1, 11):
        sch.step()  # reference steps scheduler at top of epoch
        want = opt.param_groups[0]["lr"]
        got = float(sched((epoch - 1) * 5))
        assert got == pytest.approx(want, rel=1e-5), f"epoch {epoch}"
