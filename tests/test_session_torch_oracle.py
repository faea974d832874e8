"""Integrated session-level parity against a torch oracle.

The strongest offline parity gate: one full FSCIL session — epoch-1
train-mode BN (running-stat updates from the support batch), classifier
growth, the convergence fine-tune loop with base anchor + subspace pull,
per-chunk validation and base evaluation — executed by BOTH engines on
IDENTICAL tensors:

  * the torch side uses the reference's own ResNet
    (models/resnet_language.py, imported read-only) with weights exported
    from our Flax model, and a faithful re-derivation of the
    few_shot_finetune_incremental_test inner loop
    (eval/language_eval.py:211-326) written against torch autograd;
  * our side runs the compiled session program.

Augmentation randomness is removed from the comparison by feeding both
sides the same pre-augmented support tensors (dropout disabled via
drop_rate=0).  Accuracies must agree to float tolerance.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class Opt:
    adam = False
    learning_rate = 0.002
    weight_decay = 5e-3
    momentum = 0.9
    memory_replay = 0
    lmbd_reg_transform_w = 0.2
    lmbd_reg_novel = None
    label_pull = 1.0
    pulling = "regularize"
    attraction_override = "distance2subspace"
    target_train_loss = 0.0
    stable_epochs = 10
    convergence_epsilon = 1e-4
    min_novel_epochs = 3
    max_novel_epochs = 15
    dataset = "miniImageNet"
    continual = True
    n_ways = 5
    n_shots = 5
    n_queries = 4
    n_aug_support_samples = 1
    n_base_support_samples = 0
    test_base_batch_size = 64
    neval_episodes = 8


@pytest.mark.slow
def test_one_session_matches_torch_reference_model(reference_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, reference_path)
    try:
        from models.resnet_language import resnet12 as torch_resnet12
    finally:
        sys.path.pop(0)
    sys.path.insert(0, "/root/repo/tools")
    from export_pth import export_state_dict

    from subspace_reg_tpu.engine.incremental import (
        build_geometry, make_session_fn)
    from subspace_reg_tpu.models import head as head_lib
    from subspace_reg_tpu.models.resnet import ResNetRFS

    opt = Opt()
    n_base, n_ways, d = 20, 5, 640
    img = 16

    # ---- our model + exported torch twin -------------------------------
    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0,
                         no_dropblock=True, avg_pool=True)
    variables = dict(backbone.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, img, img, 3)), train=False))
    head0 = head_lib.init_head(jax.random.PRNGKey(1), n_base, in_dim=d,
                               with_bias=False,
                               max_classes=n_base + 8 * n_ways)

    class _O:
        no_dropblock = True
        linear_bias = False
    torch.manual_seed(0)
    tnet = torch_resnet12(avg_pool=True, drop_rate=0.0, dropblock_size=1,
                          num_classes=n_base, opt=_O())
    sd = export_state_dict(variables, head0)
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    assert not unexpected
    # reference model tracks num_batches_tracked; our export sets 0

    # ---- identical episode tensors -------------------------------------
    r = np.random.RandomState(3)
    n_sup = n_ways * opt.n_shots
    sup_x = r.randn(n_sup, img, img, 3).astype(np.float32)
    sup_y = np.repeat(np.arange(n_base, n_base + n_ways), opt.n_shots)
    qry_x = r.randn(n_ways * opt.n_queries, img, img, 3).astype(np.float32)
    qry_y = np.repeat(np.arange(n_base, n_base + n_ways), opt.n_queries)
    base_x = r.randn(32, img, img, 3).astype(np.float32)
    base_y = r.randint(0, n_base, 32)
    new_rows = (0.05 * r.randn(n_ways, d)).astype(np.float32)

    # ---- torch oracle session ------------------------------------------
    # (re-derivation of eval/language_eval.py:211-326 for freeze_at=1,
    # no memory, subspace pull)
    tnet.train()
    W_new = torch.nn.Parameter(torch.cat(
        [tnet.classifier.weight.detach(),
         torch.from_numpy(new_rows)], 0))
    tnet.classifier = torch.nn.Linear(d, n_base + n_ways, bias=False)
    tnet.classifier.weight = W_new
    base_w0 = torch.from_numpy(
        np.asarray(head0.weight[:n_base]).copy())

    for p in tnet.parameters():
        p.requires_grad = False
    tnet.classifier.weight.requires_grad = True
    optim = torch.optim.SGD([tnet.classifier.weight],
                            lr=opt.learning_rate, momentum=opt.momentum,
                            weight_decay=opt.weight_decay)
    ce = torch.nn.CrossEntropyLoss()
    ts_x = torch.from_numpy(sup_x.transpose(0, 3, 1, 2))
    ts_y = torch.from_numpy(sup_y)
    prev_loss, stable, epoch, stop = 15.0, 0, 1, False
    losses_t = []
    while not stop:
        out = tnet(ts_x)          # epoch1: train mode; then eval mode
        loss = ce(out, ts_y)
        loss = loss + opt.lmbd_reg_transform_w * torch.norm(
            tnet.classifier.weight[:n_base] - base_w0)
        q, _ = torch.linalg.qr(base_w0.t(), mode="reduced")
        cur = tnet.classifier.weight[n_base:]
        mut = cur @ q
        pullers = (mut / torch.norm(q.T, dim=1).unsqueeze(0)) @ q.T
        loss = loss + opt.label_pull * torch.norm(pullers - cur) ** 2
        optim.zero_grad()
        loss.backward()
        optim.step()
        l = float(loss)
        losses_t.append(l)
        if abs(l - prev_loss) < opt.convergence_epsilon:
            stable += 1
        else:
            stable = 0
        if stable == opt.stable_epochs:
            stop = True
        if epoch >= opt.max_novel_epochs:
            stop = True
        if l <= opt.target_train_loss and epoch >= opt.min_novel_epochs + 1:
            stop = True
        prev_loss = l
        tnet.eval()               # validate() side effect (language_eval.py:19)
        epoch += 1
    epochs_torch = epoch - 1
    with torch.no_grad():
        tq = tnet(torch.from_numpy(qry_x.transpose(0, 3, 1, 2)))
        acc_novel_t = (tq.argmax(1).numpy() == qry_y).mean() * 100
        tb = tnet(torch.from_numpy(base_x.transpose(0, 3, 1, 2)))
        acc_base_t = (tb.argmax(1).numpy() == base_y).mean() * 100

    # ---- our compiled session ------------------------------------------
    geo = build_geometry(opt, n_base=n_base, img_size=img, base_eval_n=32,
                         feat_dim=d)
    fns = make_session_fn(backbone, opt, geo, with_bias=False,
                          pallas_mode="off")
    head_w = np.asarray(head0.weight).copy()
    head_w[n_base:n_base + n_ways] = new_rows
    zeros_b = jnp.zeros((geo.max_classes,), jnp.float32)
    q_buf = np.zeros((geo.max_queries, img, img, 3), np.float32)
    q_buf[: len(qry_y)] = qry_x
    qy_buf = np.zeros((geo.max_queries,), np.int32)
    qy_buf[: len(qry_y)] = qry_y
    out = fns["session"](
        variables, jnp.asarray(head_w), zeros_b,
        jnp.asarray(n_base + n_ways, jnp.int32),
        jnp.asarray(head_w * (np.arange(geo.max_classes)[:, None] < n_base)),
        zeros_b,
        jnp.zeros((geo.max_novel, d)), jnp.asarray(0, jnp.int32),
        jnp.asarray(sup_x), jnp.asarray(sup_y, jnp.int32),
        jnp.zeros((geo.max_memory, img, img, 3)),
        jnp.zeros((geo.max_memory,), jnp.int32), jnp.asarray(0, jnp.int32),
        jnp.asarray(q_buf), jnp.asarray(qy_buf), jnp.asarray(1, jnp.int32),
        jnp.asarray(base_x), jnp.asarray(base_y, jnp.int32),
        jnp.zeros((n_ways, d)), jnp.asarray(0, jnp.int32),
        jax.random.PRNGKey(9))
    _, _, _, _, metrics = out

    assert int(metrics["epochs"]) == epochs_torch
    np.testing.assert_allclose(float(metrics["chunk_accs"][0]), acc_novel_t,
                               atol=1e-3)
    np.testing.assert_allclose(float(metrics["base_acc"]), acc_base_t,
                               atol=1e-3)
    np.testing.assert_allclose(float(metrics["train_loss"]), losses_t[-1],
                               rtol=5e-3)

    # =====================================================================
    # SESSION 2: memory replay + previous-novel anchor now active
    # (language_eval.py:169-186,256-274)
    # =====================================================================
    w_after1 = np.asarray(out[0])
    bstats1, counters1 = out[2], out[3]
    reserved_rows = w_after1[n_base:n_base + n_ways].copy()
    mem_count = 10
    mem_x = sup_x[:mem_count]                   # replayed support images
    mem_y = sup_y[:mem_count]
    sup2_x = r.randn(n_sup, img, img, 3).astype(np.float32)
    sup2_y = np.repeat(np.arange(n_base + n_ways, n_base + 2 * n_ways),
                       opt.n_shots)
    qry2_x = r.randn(n_ways * opt.n_queries, img, img, 3).astype(np.float32)
    qry2_y = np.repeat(np.arange(n_base + n_ways, n_base + 2 * n_ways),
                       opt.n_queries)
    new_rows2 = (0.05 * r.randn(n_ways, d)).astype(np.float32)
    lmbd_novel = 0.1

    # ---- torch side -----------------------------------------------------
    tnet.train()
    W2 = torch.nn.Parameter(torch.cat(
        [tnet.classifier.weight.detach(), torch.from_numpy(new_rows2)], 0))
    tnet.classifier = torch.nn.Linear(d, n_base + 2 * n_ways, bias=False)
    tnet.classifier.weight = W2
    t_reserved = torch.from_numpy(reserved_rows)
    optim2 = torch.optim.SGD([tnet.classifier.weight],
                             lr=opt.learning_rate, momentum=opt.momentum,
                             weight_decay=opt.weight_decay)
    ts2_x = torch.from_numpy(sup2_x.transpose(0, 3, 1, 2))
    ts2_y = torch.from_numpy(sup2_y)
    tm_x = torch.from_numpy(mem_x.transpose(0, 3, 1, 2))
    tm_y = torch.from_numpy(mem_y)
    prev_loss, stable, epoch, stop = 15.0, 0, 1, False
    while not stop:
        loss = ce(tnet(ts2_x), ts2_y)
        loss = loss + ce(tnet(tm_x), tm_y)      # memory replay
        loss = loss + opt.lmbd_reg_transform_w * torch.norm(
            tnet.classifier.weight[:n_base] - base_w0)
        loss = loss + lmbd_novel * torch.norm(
            tnet.classifier.weight[n_base:n_base + n_ways] - t_reserved)
        q, _ = torch.linalg.qr(base_w0.t(), mode="reduced")
        cur = tnet.classifier.weight[n_base + n_ways:]
        mut = cur @ q
        pullers = (mut / torch.norm(q.T, dim=1).unsqueeze(0)) @ q.T
        loss = loss + opt.label_pull * torch.norm(pullers - cur) ** 2
        optim2.zero_grad()
        loss.backward()
        optim2.step()
        l = float(loss.detach())
        if abs(l - prev_loss) < opt.convergence_epsilon:
            stable += 1
        else:
            stable = 0
        if stable == opt.stable_epochs or epoch >= opt.max_novel_epochs or \
                (l <= opt.target_train_loss
                 and epoch >= opt.min_novel_epochs + 1):
            stop = True
        prev_loss = l
        tnet.eval()
        epoch += 1
    epochs2_torch = epoch - 1
    with torch.no_grad():
        acc_q1_t = (tnet(torch.from_numpy(qry_x.transpose(0, 3, 1, 2)))
                    .argmax(1).numpy() == qry_y).mean() * 100
        acc_q2_t = (tnet(torch.from_numpy(qry2_x.transpose(0, 3, 1, 2)))
                    .argmax(1).numpy() == qry2_y).mean() * 100
        acc_base2_t = (tnet(torch.from_numpy(base_x.transpose(0, 3, 1, 2)))
                       .argmax(1).numpy() == base_y).mean() * 100

    # ---- our side: session 2 with memory + anchors ----------------------
    opt2 = Opt()
    opt2.memory_replay = 1
    opt2.lmbd_reg_novel = lmbd_novel
    fns2 = make_session_fn(backbone, opt2, geo, with_bias=False,
                           pallas_mode="off")
    head_w2 = w_after1.copy()
    head_w2[n_base + n_ways:n_base + 2 * n_ways] = new_rows2
    reserved_buf = np.zeros((geo.max_novel, d), np.float32)
    reserved_buf[:n_ways] = reserved_rows
    mem_buf = np.zeros((geo.max_memory, img, img, 3), np.float32)
    mem_buf[:mem_count] = mem_x
    mem_y_buf = np.zeros((geo.max_memory,), np.int32)
    mem_y_buf[:mem_count] = mem_y
    q_buf[len(qry_y):len(qry_y) + len(qry2_y)] = qry2_x
    qy_buf[len(qry_y):len(qry_y) + len(qry2_y)] = qry2_y
    vars1 = {"params": variables["params"], "batch_stats": bstats1,
             "counters": counters1}
    out2 = fns2["session"](
        vars1, jnp.asarray(head_w2), zeros_b,
        jnp.asarray(n_base + 2 * n_ways, jnp.int32),
        jnp.asarray(head_w * (np.arange(geo.max_classes)[:, None] < n_base)),
        zeros_b,
        jnp.asarray(reserved_buf), jnp.asarray(n_ways, jnp.int32),
        jnp.asarray(sup2_x), jnp.asarray(sup2_y, jnp.int32),
        jnp.asarray(mem_buf), jnp.asarray(mem_y_buf),
        jnp.asarray(mem_count, jnp.int32),
        jnp.asarray(q_buf), jnp.asarray(qy_buf), jnp.asarray(2, jnp.int32),
        jnp.asarray(base_x), jnp.asarray(base_y, jnp.int32),
        jnp.zeros((n_ways, d)), jnp.asarray(1, jnp.int32),
        jax.random.PRNGKey(10))
    m2 = out2[4]
    assert int(m2["epochs"]) == epochs2_torch
    np.testing.assert_allclose(float(m2["chunk_accs"][0]), acc_q1_t, atol=1e-3)
    np.testing.assert_allclose(float(m2["chunk_accs"][1]), acc_q2_t, atol=1e-3)
    np.testing.assert_allclose(float(m2["base_acc"]), acc_base2_t, atol=1e-3)
