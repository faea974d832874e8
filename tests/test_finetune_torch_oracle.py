"""The fine-tune inner loop vs a torch autograd oracle.

Replicates the reference's per-epoch loss assembly
(eval/language_eval.py:242-295) in torch — CE on support + replay CE +
un-squared base/novel anchors + squared subspace pull through torch.qr —
runs real torch SGD, and compares weights epoch by epoch with our jitted
epoch function on identical fixed features.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class Opt:
    adam = False
    learning_rate = 0.01
    weight_decay = 5e-3
    momentum = 0.9
    memory_replay = 1
    lmbd_reg_transform_w = 0.2
    lmbd_reg_novel = 0.1
    label_pull = 0.7
    pulling = "regularize"
    attraction_override = "distance2subspace"
    target_train_loss = 0.0
    stable_epochs = 50
    convergence_epsilon = 1e-6
    min_novel_epochs = 3
    max_novel_epochs = 12
    dataset = "miniImageNet"
    continual = True
    n_ways = 5
    n_shots = 5
    n_queries = 2
    n_aug_support_samples = 1
    n_base_support_samples = 1
    test_base_batch_size = 8
    neval_episodes = 8


def test_epoch_updates_match_torch(tmp_path):
    torch = pytest.importorskip("torch")
    from subspace_reg_tpu.engine.incremental import (
        SessionGeometry, make_session_fn)

    geo = SessionGeometry(
        n_ways=5, n_shots=5, n_aug=1, n_queries=2, n_base_support=0,
        orig_base=20, max_sessions=8, feat_dim=32, img_size=8,
        base_eval_n=4)
    opt = Opt()

    r = np.random.RandomState(0)
    n_sup = geo.n_support            # 25
    idx = 1                          # session 1: novel reg active
    n_active = 30                    # 20 base + 2 sessions x 5
    n_res = 5
    mem_count = 10

    f_sup = r.randn(n_sup, 32).astype(np.float32)
    y_sup = r.randint(25, 30, n_sup)
    f_mem = np.zeros((geo.max_memory, 32), np.float32)
    y_mem = np.zeros(geo.max_memory, np.int64)
    f_mem[:mem_count] = r.randn(mem_count, 32)
    y_mem[:mem_count] = r.randint(20, 25, mem_count)

    w = np.zeros((geo.max_classes, 32), np.float32)
    w[:n_active] = 0.2 * r.randn(n_active, 32)
    w0 = np.zeros_like(w)
    w0[:20] = w[:20] + 0.05 * r.randn(20, 32)
    reserved = np.zeros((geo.max_novel, 32), np.float32)
    reserved[:n_res] = 0.2 * r.randn(n_res, 32)

    # ---- torch oracle -------------------------------------------------
    W = torch.nn.Parameter(torch.from_numpy(w[:n_active].copy()))
    optimizer = torch.optim.SGD([W], lr=opt.learning_rate,
                                momentum=opt.momentum,
                                weight_decay=opt.weight_decay)
    tw0 = torch.from_numpy(w0[:20].copy())
    tres = torch.from_numpy(reserved[:n_res].copy())
    fs = torch.from_numpy(f_sup)
    ys = torch.from_numpy(y_sup)
    fm = torch.from_numpy(f_mem[:mem_count])
    ym = torch.from_numpy(y_mem[:mem_count])
    ce = torch.nn.CrossEntropyLoss()

    torch_ws = []
    for _ in range(5):
        out = fs @ W.t()
        loss = ce(out, ys) + ce(fm @ W.t(), ym)
        loss = loss + opt.lmbd_reg_transform_w * torch.norm(W[:20] - tw0)
        loss = loss + opt.lmbd_reg_novel * torch.norm(
            W[20:20 + n_res] - tres)
        # subspace pull (models/resnet_language.py:92-97 + loss1)
        q, _ = torch.linalg.qr(tw0.t(), mode="reduced")
        mut = W[n_active - 5:] @ q
        mutnorm = mut / torch.norm(q.T, dim=1).unsqueeze(0)
        pullers = mutnorm @ q.T
        loss = loss + opt.label_pull * torch.norm(
            pullers - W[n_active - 5:]) ** 2
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        torch_ws.append(W.detach().numpy().copy())

    # ---- our jitted epoch function ------------------------------------
    class Backbone:                      # not used by epoch_fn
        feature_dim = 32
        def apply(self, *a, **k):
            raise AssertionError("epoch_fn must not touch the backbone")

    fns = make_session_fn(Backbone(), opt, geo, with_bias=False,
                          pallas_mode="off")
    from subspace_reg_tpu.utils import optim as optim_lib
    tx = optim_lib.get_optim(opt)
    params = {"w": jnp.asarray(w)}
    opt_state = tx.init(params)

    f_sup_j = jnp.asarray(f_sup)
    f_mem_j = jnp.asarray(f_mem)
    prev_loss = jnp.asarray(15.0)
    stable = jnp.asarray(0, jnp.int32)
    epoch = jnp.asarray(1, jnp.int32)
    for e in range(5):
        params, opt_state, prev_loss, stable, epoch, stop, a1, a5 = \
            fns["epoch"](params, opt_state, prev_loss, stable, epoch,
                         f_sup_j, f_mem_j, jnp.asarray(y_sup, jnp.int32),
                         jnp.asarray(y_mem, jnp.int32),
                         jnp.asarray(mem_count, jnp.int32),
                         jnp.asarray(w0), jnp.asarray(np.zeros(geo.max_classes, np.float32)),
                         jnp.asarray(reserved), jnp.asarray(n_res, jnp.int32),
                         jnp.asarray(np.zeros((5, 32), np.float32)),
                         jnp.asarray(n_active, jnp.int32))
        got = np.asarray(params["w"])[:n_active]
        np.testing.assert_allclose(got, torch_ws[e], rtol=2e-4, atol=2e-5)
        # padded rows never move
        assert np.all(np.asarray(params["w"])[n_active:] == 0)
