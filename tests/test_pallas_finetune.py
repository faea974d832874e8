"""Exactness of the fused Pallas fine-tune loop against an independent
jnp reference implementation of the same math (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subspace_reg_tpu.ops.pallas.finetune import (
    finetune_loop_pallas, pack_scalars)

C_PAD, D = 128, 128
N_SUP_PAD, N_MEM_PAD = 64, 32
NEG = -1e9


def _reference_loop(f_sup, y_sup, n_sup, f_mem, y_mem, mem_count,
                    w, mom, w0, reserved, pull_M, pull_T,
                    hp, flags):
    """Pure-jnp replica of engine/incremental.py's while_loop body."""
    (lr, wd, momentum, lb, ln, gamma, eps, target, min_e, max_e,
     stable_t, n_active, n_reserved, prev_loss, stable0,
     orig_base, n_ways) = hp
    memory_on, use_rb, use_rn, pull_mode, stable_mode = flags

    rows = np.arange(C_PAD)

    def loss_grad(w):
        def ce(f, y, rmask, denom):
            logits = f @ w.T
            cm = rows[None, :] < n_active
            logits = np.where(cm & rmask[:, None].astype(bool), logits, NEG)
            m = logits.max(1, keepdims=True)
            e = np.exp(logits - m)
            p = e / e.sum(1, keepdims=True)
            logp = logits - m - np.log(e.sum(1, keepdims=True))
            oh = np.zeros_like(p)
            oh[np.arange(len(y)), y] = rmask
            loss = -(oh * logp).sum() / denom
            dlog = (p * (rmask[:, None] * cm) - oh) / denom
            return loss, dlog.T @ f

        rm_s = np.zeros(f_sup.shape[0]); rm_s[:n_sup] = 1
        loss, g = ce(f_sup, y_sup, rm_s, n_sup)
        if memory_on:
            rm_m = np.zeros(f_mem.shape[0]); rm_m[:mem_count] = 1
            l2, g2 = ce(f_mem, y_mem, rm_m, max(mem_count, 1))
            loss, g = loss + l2, g + g2
        if use_rb:
            mask = (rows < orig_base)[:, None]
            diff = (w - w0) * mask
            norm = np.sqrt((diff ** 2).sum())
            loss += lb * norm
            g = g + (lb * diff / norm if norm > 0 else 0)
        if use_rn:
            mask = ((rows >= orig_base) & (rows < orig_base + n_reserved))[:, None]
            diff = (w - reserved) * mask
            norm = np.sqrt((diff ** 2).sum())
            loss += ln * norm
            g = g + (ln * diff / norm if norm > 0 else 0)
        cm = ((rows >= n_active - n_ways) & (rows < n_active))[:, None]
        if pull_mode == "subspace":
            v = (w * cm) @ pull_M
            loss += gamma * (v ** 2).sum()
            g = g + 2 * gamma * v * cm
        elif pull_mode == "semantic":
            diff = (w - pull_T) * cm
            loss += gamma * (diff ** 2).sum()
            g = g + 2 * gamma * diff
        return loss, g

    stable, epoch = stable0, 1.0
    stop = False
    if stable_mode:
        stop = stop or (stable == stable_t)
    stop = stop or (epoch >= max_e)
    stop = stop or (prev_loss <= target and epoch >= min_e + 1)
    loss = prev_loss
    while not stop:
        epoch += 1
        loss, g = loss_grad(w)
        g = g + wd * w
        mom = momentum * mom + g
        w = w - lr * mom
        if stable_mode:
            stable = stable + 1 if abs(loss - prev_loss) < eps else 0
            if stable == stable_t:
                stop = True
        if epoch >= max_e:
            stop = True
        if loss <= target and epoch >= min_e + 1:
            stop = True
        prev_loss = loss
    return w, loss, epoch


@pytest.mark.parametrize("pull_mode", ["none", "subspace", "semantic"])
@pytest.mark.parametrize("memory_on", [False, True])
def test_pallas_matches_reference(pull_mode, memory_on):
    r = np.random.RandomState(0)
    n_sup, mem_count = 40, 20 if memory_on else 0
    orig_base, n_ways = 20, 5
    n_active, n_reserved = 30, 5

    f_sup = np.zeros((N_SUP_PAD, D), np.float32)
    f_sup[:n_sup] = r.randn(n_sup, D).astype(np.float32)
    y_sup = np.zeros(N_SUP_PAD, np.int64)
    y_sup[:n_sup] = r.randint(25, 30, n_sup)
    f_mem = np.zeros((N_MEM_PAD, D), np.float32)
    y_mem = np.zeros(N_MEM_PAD, np.int64)
    if memory_on:
        f_mem[:mem_count] = r.randn(mem_count, D).astype(np.float32)
        y_mem[:mem_count] = r.randint(20, 25, mem_count)

    w = np.zeros((C_PAD, D), np.float32)
    w[:n_active] = 0.1 * r.randn(n_active, D)
    w0 = np.zeros_like(w)
    w0[:orig_base] = w[:orig_base] + 0.01 * r.randn(orig_base, D)
    reserved = np.zeros_like(w)
    reserved[orig_base:orig_base + n_reserved] = 0.1 * r.randn(n_reserved, D)
    mom = np.zeros_like(w)

    q, _ = np.linalg.qr(w0[:orig_base].T)
    pull_M = (np.eye(D) - q @ q.T).astype(np.float32)
    pull_T = np.zeros_like(w)
    pull_T[n_active - n_ways:n_active] = 0.05 * r.randn(n_ways, D)

    hp = (0.01, 5e-3, 0.9, 0.2, 0.1, 0.5, 1e-4, 0.0, 3, 25, 4,
          n_active, n_reserved, 5.0, 0.0, orig_base, n_ways)
    flags = (memory_on, True, True, pull_mode, True)

    w_ref, loss_ref, epoch_ref = _reference_loop(
        f_sup.copy(), y_sup, n_sup, f_mem.copy(), y_mem, mem_count,
        w.copy(), mom.copy(), w0, reserved, pull_M, pull_T, hp, flags)

    # pallas inputs: lane-tiled label vectors (one-hots built in-kernel)
    y_sup_t = np.broadcast_to(y_sup.astype(np.float32)[:, None],
                              (N_SUP_PAD, 128)).copy()
    y_mem_t = np.broadcast_to(y_mem.astype(np.float32)[:, None],
                              (N_MEM_PAD, 128)).copy()

    scalars = pack_scalars(
        lr=0.01, wd=5e-3, momentum=0.9, lmbd_base=0.2, lmbd_novel=0.1,
        gamma=0.5, eps=1e-4, target_loss=0.0, min_epochs=3, max_epochs=25,
        stable_target=4, n_active=n_active, n_reserved=n_reserved,
        mem_count=mem_count, prev_loss0=5.0, stable0=0.0,
        orig_base=orig_base, n_ways=n_ways)

    w_out, stats, trace = finetune_loop_pallas(
        jnp.asarray(f_sup), jnp.asarray(y_sup_t),
        jnp.asarray(f_mem), jnp.asarray(y_mem_t),
        jnp.asarray(w), jnp.asarray(mom), jnp.zeros((8, 128), jnp.float32),
        jnp.asarray(w0),
        jnp.asarray(reserved), jnp.asarray(pull_M), jnp.asarray(pull_T),
        scalars,
        n_sup=n_sup, memory_on=memory_on, use_regbase=True,
        use_regnovel=True, pull_mode=pull_mode, stable_mode=True,
        orig_base=orig_base, n_ways=n_ways, trace_rows=32, interpret=True)

    assert int(stats[0, 1]) == int(epoch_ref)
    np.testing.assert_allclose(float(stats[0, 0]), loss_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_out), w_ref,
                               rtol=2e-4, atol=2e-5)

    # per-epoch trace: row e holds epoch e's pre-update loss; the final
    # epoch's row matches the returned loss, later rows stay zero
    tr = np.asarray(trace)
    ep = int(epoch_ref)
    np.testing.assert_allclose(tr[ep, 0], loss_ref, rtol=1e-4, atol=1e-5)
    assert np.all(tr[ep + 1:, 0] == 0.0)
    if ep >= 2:
        assert np.all(tr[2:ep + 1, 1] >= 0) and np.all(tr[2:ep + 1, 1] <= 100)
        # acc5 >= acc1 by construction
        assert np.all(tr[2:ep + 1, 2] >= tr[2:ep + 1, 1] - 1e-5)
    # stats lanes 3/4 carry the last training epoch's support accuracies
    np.testing.assert_allclose(float(stats[0, 3]), tr[ep, 1], atol=1e-5)
    np.testing.assert_allclose(float(stats[0, 4]), tr[ep, 2], atol=1e-5)


def test_pallas_tiered_geometry_interpret():
    """Tiered-size geometry (512 padded classes, 351 base) through the
    kernel in interpret mode (no VMEM constraint) against the jnp
    reference loop — validates the in-kernel iota targets at large C."""
    c_pad, d = 512, 128
    n_sup_pad, n_mem_pad = 64, 32
    r = np.random.RandomState(7)
    n_sup, mem_count = 40, 16
    orig_base, n_ways = 351, 5
    n_active, n_reserved = orig_base + 2 * n_ways, 5

    f_sup = np.zeros((n_sup_pad, d), np.float32)
    f_sup[:n_sup] = r.randn(n_sup, d)
    y_sup = np.zeros(n_sup_pad, np.int64)
    y_sup[:n_sup] = r.randint(n_active - n_ways, n_active, n_sup)
    f_mem = np.zeros((n_mem_pad, d), np.float32)
    y_mem = np.zeros(n_mem_pad, np.int64)
    f_mem[:mem_count] = r.randn(mem_count, d)
    y_mem[:mem_count] = r.randint(0, orig_base, mem_count)

    w = np.zeros((c_pad, d), np.float32)
    w[:n_active] = 0.1 * r.randn(n_active, d)
    w0 = np.zeros_like(w)
    w0[:orig_base] = w[:orig_base] + 0.01 * r.randn(orig_base, d)
    reserved = np.zeros_like(w)
    reserved[orig_base:orig_base + n_reserved] = 0.1 * r.randn(n_reserved, d)
    mom = np.zeros_like(w)
    q, _ = np.linalg.qr(w0[:orig_base].T)
    pull_M = (np.eye(d) - q @ q.T).astype(np.float32)
    pull_T = np.zeros_like(w)

    hp = (0.01, 5e-3, 0.9, 0.2, 0.1, 0.5, 1e-4, 0.0, 3, 12, 4,
          n_active, n_reserved, 5.0, 0.0, orig_base, n_ways)
    flags = (True, True, True, "subspace", True)

    # reuse the module's reference loop at this C_PAD
    global C_PAD
    old_cpad = C_PAD
    C_PAD = c_pad
    try:
        w_ref, loss_ref, epoch_ref = _reference_loop(
            f_sup.copy(), y_sup, n_sup, f_mem.copy(), y_mem, mem_count,
            w.copy(), mom.copy(), w0, reserved, pull_M, pull_T, hp, flags)
    finally:
        C_PAD = old_cpad

    from subspace_reg_tpu.ops.pallas.finetune import label_tile
    scalars = pack_scalars(
        lr=0.01, wd=5e-3, momentum=0.9, lmbd_base=0.2, lmbd_novel=0.1,
        gamma=0.5, eps=1e-4, target_loss=0.0, min_epochs=3, max_epochs=12,
        stable_target=4, n_active=n_active, n_reserved=n_reserved,
        mem_count=mem_count, prev_loss0=5.0, stable0=0.0,
        orig_base=orig_base, n_ways=n_ways)

    w_out, stats, trace = finetune_loop_pallas(
        jnp.asarray(f_sup), label_tile(y_sup, n_sup_pad),
        jnp.asarray(f_mem), label_tile(y_mem, n_mem_pad),
        jnp.asarray(w), jnp.asarray(mom), jnp.zeros((8, 128), jnp.float32),
        jnp.asarray(w0),
        jnp.asarray(reserved), jnp.asarray(pull_M), jnp.asarray(pull_T),
        scalars,
        n_sup=n_sup, memory_on=True, use_regbase=True, use_regnovel=True,
        pull_mode="subspace", stable_mode=True, orig_base=orig_base,
        n_ways=n_ways, trace_rows=16, interpret=True)

    assert int(stats[0, 1]) == int(epoch_ref)
    np.testing.assert_allclose(float(stats[0, 0]), loss_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_out), w_ref,
                               rtol=2e-4, atol=2e-5)


def test_pallas_adam_matches_reference():
    """Adam mode: the in-kernel optax-style bias-corrected update (coupled
    wd=5e-4 into the gradient first) against a numpy re-derivation."""
    r = np.random.RandomState(3)
    n_sup = 40
    orig_base, n_ways = 20, 5
    n_active = 30
    lr, wd, b1, b2, eps_a = 0.01, 0.0005, 0.9, 0.999, 1e-8
    max_e = 20

    f_sup = np.zeros((N_SUP_PAD, D), np.float32)
    f_sup[:n_sup] = r.randn(n_sup, D).astype(np.float32)
    y_sup = np.zeros(N_SUP_PAD, np.int64)
    y_sup[:n_sup] = r.randint(25, 30, n_sup)
    w = np.zeros((C_PAD, D), np.float32)
    w[:n_active] = 0.1 * r.randn(n_active, D)
    w0 = np.zeros_like(w)
    w0[:orig_base] = w[:orig_base] + 0.01 * r.randn(orig_base, D)

    # numpy reference: CE + base anchor, Adam from the engine's epoch-1
    # state (m1, v1 after step 1), epochs 2..max_e (stable off => runs to
    # max)
    rows = np.arange(C_PAD)

    def loss_grad(wc):
        logits = f_sup @ wc.T
        cm = rows[None, :] < n_active
        rm = (np.arange(N_SUP_PAD) < n_sup)[:, None] & cm
        logits = np.where(rm, logits, NEG)
        mx = logits.max(1, keepdims=True)
        e = np.exp(logits - mx)
        p = e / e.sum(1, keepdims=True)
        logp = logits - mx - np.log(e.sum(1, keepdims=True))
        oh = np.zeros_like(p)
        oh[np.arange(n_sup), y_sup[:n_sup]] = 1
        loss = -(oh * logp).sum() / n_sup
        g = ((p * rm - oh) / n_sup).T @ f_sup
        diff = (wc - w0) * (rows < orig_base)[:, None]
        nrm = np.sqrt((diff ** 2).sum())
        loss += 0.2 * nrm
        g = g + (0.2 * diff / nrm if nrm > 0 else 0)
        return loss, g

    # epoch-1 (the engine does this outside the kernel)
    wc = w.copy()
    l1, g = loss_grad(wc)
    g = g + wd * wc
    m = (1 - b1) * g
    v = (1 - b2) * g * g
    wc = wc - lr * (m / (1 - b1)) / (np.sqrt(v / (1 - b2)) + eps_a)
    loss = l1
    for epoch in range(2, max_e + 1):
        loss, g = loss_grad(wc)
        g = g + wd * wc
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** epoch)
        vh = v / (1 - b2 ** epoch)
        wc = wc - lr * mh / (np.sqrt(vh) + eps_a)

    # kernel run starting from the same post-epoch-1 state
    w_e1 = w.copy()
    l1_k, g1 = loss_grad(w_e1)
    g1 = g1 + wd * w_e1
    m1 = (1 - b1) * g1
    v1 = (1 - b2) * g1 * g1
    w_e1 = w_e1 - lr * (m1 / (1 - b1)) / (np.sqrt(v1 / (1 - b2)) + eps_a)

    y_sup_t = np.broadcast_to(y_sup.astype(np.float32)[:, None],
                              (N_SUP_PAD, 128)).copy()
    scalars = pack_scalars(
        lr=lr, wd=wd, momentum=0.9, lmbd_base=0.2, lmbd_novel=0.0,
        gamma=0.0, eps=1e-4, target_loss=0.0, min_epochs=3,
        max_epochs=max_e, stable_target=10 ** 6,
        n_active=n_active, n_reserved=0, mem_count=0,
        prev_loss0=l1_k, stable0=0.0, orig_base=orig_base, n_ways=n_ways)

    dummy = jnp.zeros((8, 128), jnp.float32)
    w_out, stats, trace = finetune_loop_pallas(
        jnp.asarray(f_sup), jnp.asarray(y_sup_t),
        jnp.zeros((N_MEM_PAD, D)), jnp.zeros((N_MEM_PAD, 128)),
        jnp.asarray(w_e1), jnp.asarray(m1), jnp.asarray(v1),
        jnp.asarray(w0), dummy, dummy, dummy, scalars,
        n_sup=n_sup, memory_on=False, use_regbase=True, use_regnovel=False,
        pull_mode="none", stable_mode=True, orig_base=orig_base,
        n_ways=n_ways, trace_rows=32, use_adam=True, interpret=True)

    assert int(stats[0, 1]) == max_e
    np.testing.assert_allclose(float(stats[0, 0]), loss, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_out), wc, rtol=2e-4, atol=2e-5)
