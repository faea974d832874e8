"""Torch-oracle parity for the remaining golden-config variants.

Round-1 covered the ``distance2subspace`` config with a two-session oracle
(tests/test_session_torch_oracle.py).  This file extends oracle coverage to
every other golden variant named by scripts/continual/*.sh:

  * semantic attractors — softmax(E_n E_b^T / T) @ W_base, GloVe slice,
    gamma-weighted squared pull (reference models/resnet_language.py:75-90,
    eval/language_eval.py:216-228);
  * the learned linear mapping override — LinearMap training contract
    (lr=1.0, wd=5e-4, 1000 full-batch MSE epochs, reference
    learn_mapping.py:41-67) and the ``mapping_linear_label2image``
    attractor path (models/resnet_language.py:67-72,84-87);
  * the bias-head regloss branch — un-squared weight norm + SQUARED bias
    norm (models/resnet_language.py:229-233);
  * Adam fine-tuning — torch Adam with weight_decay=5e-4
    (eval/util.py:93-96).

Each session-level test runs the identical session on the reference's own
torch ResNet (weights exported from our Flax model) with a faithful torch
re-derivation of the fine-tune inner loop, then asserts epoch counts,
losses and accuracies match our compiled session program.
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
    label_pull = None
    pulling = "regularize"
    attraction_override = None
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
    glove = False
    use_synonyms = False
    temperature = 1.0
    word_embed_size = 500
    word_embed_path = None


N_BASE, N_WAYS, D, IMG = 20, 5, 640, 16


def _make_models(reference_path, with_bias=False):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, reference_path)
    try:
        from models.resnet_language import resnet12 as torch_resnet12
    finally:
        sys.path.pop(0)
    sys.path.insert(0, "/root/repo/tools")
    from export_pth import export_state_dict

    from subspace_reg_tpu.models import head as head_lib
    from subspace_reg_tpu.models.resnet import ResNetRFS

    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0,
                         no_dropblock=True, avg_pool=True)
    variables = dict(backbone.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, IMG, IMG, 3)), train=False))
    head0 = head_lib.init_head(jax.random.PRNGKey(1), N_BASE, in_dim=D,
                               with_bias=with_bias,
                               max_classes=N_BASE + 8 * N_WAYS)

    class _O:
        no_dropblock = True
        linear_bias = with_bias
    torch.manual_seed(0)
    tnet = torch_resnet12(avg_pool=True, drop_rate=0.0, dropblock_size=1,
                          num_classes=N_BASE, opt=_O())
    sd = export_state_dict(variables, head0)
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    assert not unexpected
    return torch, backbone, variables, head0, tnet


def _episode(seed=3):
    r = np.random.RandomState(seed)
    n_sup = N_WAYS * Opt.n_shots
    sup_x = r.randn(n_sup, IMG, IMG, 3).astype(np.float32)
    sup_y = np.repeat(np.arange(N_BASE, N_BASE + N_WAYS), Opt.n_shots)
    qry_x = r.randn(N_WAYS * Opt.n_queries, IMG, IMG, 3).astype(np.float32)
    qry_y = np.repeat(np.arange(N_BASE, N_BASE + N_WAYS), Opt.n_queries)
    base_x = r.randn(32, IMG, IMG, 3).astype(np.float32)
    base_y = r.randint(0, N_BASE, 32)
    new_rows = (0.05 * r.randn(N_WAYS, D)).astype(np.float32)
    new_bias = (0.05 * r.randn(N_WAYS)).astype(np.float32)
    return sup_x, sup_y, qry_x, qry_y, base_x, base_y, new_rows, new_bias


def _torch_session(torch, tnet, opt, sup_x, sup_y, base_w0, base_b0=None,
                   pull_target=None, with_bias=False):
    """Reference fine-tune inner loop (eval/language_eval.py:242-318) for
    freeze_at=1, no memory; variant-parameterized regularizers."""
    ce = torch.nn.CrossEntropyLoss()
    tnet.train()
    params = [tnet.classifier.weight]
    if with_bias:
        params.append(tnet.classifier.bias)
    for p in tnet.parameters():
        p.requires_grad = False
    for p in params:
        p.requires_grad = True
    if opt.adam:
        # reference get_optim (eval/util.py:93-96): Adam, wd=5e-4
        optim = torch.optim.Adam(params, lr=opt.learning_rate,
                                 weight_decay=0.0005)
    else:
        optim = torch.optim.SGD(params, lr=opt.learning_rate,
                                momentum=opt.momentum,
                                weight_decay=opt.weight_decay)
    ts_x = torch.from_numpy(sup_x.transpose(0, 3, 1, 2))
    ts_y = torch.from_numpy(sup_y)
    prev_loss, stable, epoch, stop = 15.0, 0, 1, False
    losses_t = []
    while not stop:
        out = tnet(ts_x)
        loss = ce(out, ts_y)
        if opt.lmbd_reg_transform_w is not None:
            # reference regloss (models/resnet_language.py:229-233):
            # un-squared weight norm, SQUARED bias norm
            loss = loss + opt.lmbd_reg_transform_w * torch.norm(
                tnet.classifier.weight[:N_BASE] - base_w0)
            if base_b0 is not None:
                loss = loss + opt.lmbd_reg_transform_w * torch.norm(
                    tnet.classifier.bias[:N_BASE] - base_b0) ** 2
        if pull_target is not None:
            gamma, tgt = pull_target
            cur = tnet.classifier.weight[N_BASE:]
            loss = loss + gamma * torch.norm(tgt - cur) ** 2
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
        tnet.eval()        # validate() side effect (language_eval.py:19)
        epoch += 1
    return epoch - 1, losses_t


def _torch_eval(torch, tnet, qry_x, qry_y, base_x, base_y):
    with torch.no_grad():
        tq = tnet(torch.from_numpy(qry_x.transpose(0, 3, 1, 2)))
        acc_novel = (tq.argmax(1).numpy() == qry_y).mean() * 100
        tb = tnet(torch.from_numpy(base_x.transpose(0, 3, 1, 2)))
        acc_base = (tb.argmax(1).numpy() == base_y).mean() * 100
    return acc_novel, acc_base


def _grow_torch_head(torch, tnet, new_rows, new_bias=None):
    with_bias = new_bias is not None
    w = torch.nn.Parameter(torch.cat(
        [tnet.classifier.weight.detach(), torch.from_numpy(new_rows)], 0))
    b = None
    if with_bias:
        b = torch.nn.Parameter(torch.cat(
            [tnet.classifier.bias.detach(), torch.from_numpy(new_bias)], 0))
    tnet.classifier = torch.nn.Linear(D, N_BASE + N_WAYS, bias=with_bias)
    tnet.classifier.weight = w
    if with_bias:
        tnet.classifier.bias = b


def _run_our_session(opt, backbone, variables, head0, head_w, head_b,
                     with_bias, sup_x, sup_y, qry_x, qry_y, base_x, base_y,
                     sem_pullers=None):
    from subspace_reg_tpu.engine.incremental import (
        build_geometry, make_session_fn)
    geo = build_geometry(opt, n_base=N_BASE, img_size=IMG, base_eval_n=32,
                         feat_dim=D)
    fns = make_session_fn(backbone, opt, geo, with_bias=with_bias,
                          pallas_mode="off")
    zeros_b = jnp.zeros((geo.max_classes,), jnp.float32)
    hb = zeros_b if head_b is None else jnp.asarray(head_b)
    q_buf = np.zeros((geo.max_queries, IMG, IMG, 3), np.float32)
    q_buf[: len(qry_y)] = qry_x
    qy_buf = np.zeros((geo.max_queries,), np.int32)
    qy_buf[: len(qry_y)] = qry_y
    if sem_pullers is None:
        sem_pullers = np.zeros((N_WAYS, D), np.float32)
    b0 = hb
    out = fns["session"](
        variables, jnp.asarray(head_w), hb,
        jnp.asarray(N_BASE + N_WAYS, jnp.int32),
        jnp.asarray(head_w * (np.arange(geo.max_classes)[:, None] < N_BASE)),
        b0,
        jnp.zeros((geo.max_novel, D)), jnp.asarray(0, jnp.int32),
        jnp.asarray(sup_x), jnp.asarray(sup_y, jnp.int32),
        jnp.zeros((geo.max_memory, IMG, IMG, 3)),
        jnp.zeros((geo.max_memory,), jnp.int32), jnp.asarray(0, jnp.int32),
        jnp.asarray(q_buf), jnp.asarray(qy_buf), jnp.asarray(1, jnp.int32),
        jnp.asarray(base_x), jnp.asarray(base_y, jnp.int32),
        jnp.asarray(sem_pullers), jnp.asarray(0, jnp.int32),
        jax.random.PRNGKey(9))
    return out


def _assert_session_matches(metrics, epochs_t, losses_t, acc_novel_t,
                            acc_base_t):
    assert int(metrics["epochs"]) == epochs_t
    np.testing.assert_allclose(float(metrics["train_loss"]), losses_t[-1],
                               rtol=5e-3)
    np.testing.assert_allclose(float(metrics["chunk_accs"][0]), acc_novel_t,
                               atol=1e-3)
    np.testing.assert_allclose(float(metrics["base_acc"]), acc_base_t,
                               atol=1e-3)


# ---------------------------------------------------------------------------
# semantic attractors
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("glove", [False, True])
def test_semantic_attractors_match_torch(tmp_path, reference_path, glove):
    """Our LangPuller attractors == the reference's softmax pull math on the
    same embedding pickle, incl. the GloVe 300-d slice and temperature."""
    torch = pytest.importorskip("torch")
    from subspace_reg_tpu.data import synthetic
    from subspace_reg_tpu.models import lang_puller as lp

    embeds_dir = str(tmp_path / "embeds")
    synthetic.make_word_embeds(embeds_dir, n_classes=40)
    vocab_base = [f"synthetic_{i}" for i in range(N_BASE)]
    vocab_novel = [f"synthetic_{i}" for i in range(N_BASE, N_BASE + N_WAYS)]

    opt = Opt()
    opt.word_embed_path = embeds_dir
    opt.glove = glove
    opt.temperature = 3.0

    state = lp.create_lang_puller(opt, vocab_base, vocab_novel)
    r = np.random.RandomState(0)
    base_w = r.randn(N_BASE, D).astype(np.float32)
    ours = np.asarray(lp.pullers(state, jnp.asarray(base_w)))

    # torch re-derivation of LangPuller.forward (resnet_language.py:75-87)
    # using the reference's own embed reader
    sys.path.insert(0, reference_path)
    try:
        from models.util import get_embeds as ref_get_embeds
    finally:
        sys.path.pop(0)
    import os
    pth = os.path.join(embeds_dir, "miniImageNet_dim500.pickle")
    e_novel = ref_get_embeds(pth, vocab_novel).float()
    e_base = ref_get_embeds(pth, vocab_base).float()
    if glove:
        e_base, e_novel = e_base[:, :300], e_novel[:, :300]
    scores = e_novel @ e_base.t()
    probs = torch.nn.Softmax(dim=1)(scores / opt.temperature)
    theirs = (probs @ torch.from_numpy(base_w)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_semantic_pull_session_matches_torch(reference_path):
    """Full session with the semantic attractor pull (gamma=0.2, constant
    target) — torch oracle vs the compiled session program."""
    torch, backbone, variables, head0, tnet = _make_models(reference_path)
    (sup_x, sup_y, qry_x, qry_y, base_x, base_y,
     new_rows, _) = _episode()

    opt = Opt()
    opt.label_pull = 0.2
    opt.attraction_override = None
    opt.temperature = 3.0

    r = np.random.RandomState(11)
    sem_pullers = (0.1 * r.randn(N_WAYS, D)).astype(np.float32)

    _grow_torch_head(torch, tnet, new_rows)
    base_w0 = torch.from_numpy(np.asarray(head0.weight[:N_BASE]).copy())
    epochs_t, losses_t = _torch_session(
        torch, tnet, opt, sup_x, sup_y, base_w0,
        pull_target=(opt.label_pull, torch.from_numpy(sem_pullers)))
    acc_novel_t, acc_base_t = _torch_eval(torch, tnet, qry_x, qry_y,
                                          base_x, base_y)

    head_w = np.asarray(head0.weight).copy()
    head_w[N_BASE:N_BASE + N_WAYS] = new_rows
    out = _run_our_session(opt, backbone, variables, head0, head_w, None,
                           False, sup_x, sup_y, qry_x, qry_y, base_x, base_y,
                           sem_pullers=sem_pullers)
    _assert_session_matches(out[4], epochs_t, losses_t, acc_novel_t,
                            acc_base_t)


# ---------------------------------------------------------------------------
# linear mapping override
# ---------------------------------------------------------------------------
def test_learn_mapping_matches_torch_training(reference_path):
    """Our jitted LinearMap trainer converges to the same ridge solution as
    the reference's torch loop (learn_mapping.py:41-67: lr=1.0, wd=5e-4,
    1000 full-batch MSE epochs)."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/repo/tools")
    from learn_mapping import train_linear_map

    r = np.random.RandomState(0)
    n, in_dim, out_dim = 20, 30, 48
    embeds = r.randn(n, in_dim).astype(np.float32)
    base_w = r.randn(n, out_dim).astype(np.float32)

    w_ours, b_ours = train_linear_map(embeds, base_w)

    torch.manual_seed(0)
    model = torch.nn.Linear(in_dim, out_dim)
    optim = torch.optim.SGD(model.parameters(), lr=1.0, weight_decay=5e-4)
    crit = torch.nn.MSELoss()
    tx = torch.from_numpy(embeds)
    tt = torch.from_numpy(base_w)
    for _ in range(1000):
        loss = crit(model(tx), tt)
        optim.zero_grad()
        loss.backward()
        optim.step()
    w_t = model.weight.detach().numpy()
    b_t = model.bias.detach().numpy()

    # different inits, same strongly-convex optimum: the learned maps must
    # agree as functions
    pred_ours = embeds @ w_ours.T + b_ours
    pred_t = embeds @ w_t.T + b_t
    np.testing.assert_allclose(pred_ours, pred_t, atol=5e-3)
    mse_ours = float(np.mean((pred_ours - base_w) ** 2))
    mse_t = float(np.mean((pred_t - base_w) ** 2))
    np.testing.assert_allclose(mse_ours, mse_t, rtol=5e-3)


def test_mapping_attractors_match_torch(reference_path):
    """mapping_linear_label2image override: pullers = LinearMap(novel
    embeds), no grad (resnet_language.py:67-72,84-87)."""
    torch = pytest.importorskip("torch")
    from subspace_reg_tpu.models import lang_puller as lp

    r = np.random.RandomState(4)
    novel = r.randn(N_WAYS, 300).astype(np.float32)
    mw = r.randn(D, 300).astype(np.float32)
    mb = r.randn(D).astype(np.float32)

    state = lp.LangPullerState(
        base_embeds=jnp.zeros((N_BASE, 300)), novel_embeds=jnp.asarray(novel),
        temperature=1.0)
    state = lp.with_mapping(state, mw, mb)
    ours = np.asarray(lp.pullers(state, jnp.zeros((N_BASE, D))))

    sys.path.insert(0, reference_path)
    try:
        from models.resnet_language import LinearMap
    finally:
        sys.path.pop(0)
    m = LinearMap(300, D)
    with torch.no_grad():
        m.map.weight.copy_(torch.from_numpy(mw))
        m.map.bias.copy_(torch.from_numpy(mb))
        theirs = m(torch.from_numpy(novel)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# bias-head regloss
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_bias_head_regloss_session_matches_torch(reference_path):
    """linear_bias=True session: CE over biased logits + regloss with the
    un-squared weight norm and SQUARED bias norm (resnet_language.py:229-233),
    optimizer covering weight+bias."""
    torch, backbone, variables, head0, tnet = _make_models(reference_path,
                                                           with_bias=True)
    (sup_x, sup_y, qry_x, qry_y, base_x, base_y,
     new_rows, new_bias) = _episode(seed=5)

    opt = Opt()

    _grow_torch_head(torch, tnet, new_rows, new_bias)
    base_w0 = torch.from_numpy(np.asarray(head0.weight[:N_BASE]).copy())
    base_b0 = torch.from_numpy(np.asarray(head0.bias[:N_BASE]).copy())
    epochs_t, losses_t = _torch_session(
        torch, tnet, opt, sup_x, sup_y, base_w0, base_b0=base_b0,
        with_bias=True)
    acc_novel_t, acc_base_t = _torch_eval(torch, tnet, qry_x, qry_y,
                                          base_x, base_y)

    head_w = np.asarray(head0.weight).copy()
    head_w[N_BASE:N_BASE + N_WAYS] = new_rows
    head_b = np.asarray(head0.bias).copy()
    head_b[N_BASE:N_BASE + N_WAYS] = new_bias
    out = _run_our_session(opt, backbone, variables, head0, head_w, head_b,
                           True, sup_x, sup_y, qry_x, qry_y, base_x, base_y)
    _assert_session_matches(out[4], epochs_t, losses_t, acc_novel_t,
                            acc_base_t)


# ---------------------------------------------------------------------------
# Adam fine-tuning
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_adam_session_matches_torch(reference_path):
    """--adam session: torch Adam semantics incl. the hardcoded wd=5e-4
    (eval/util.py:93-96) vs our optax chain."""
    torch, backbone, variables, head0, tnet = _make_models(reference_path)
    (sup_x, sup_y, qry_x, qry_y, base_x, base_y,
     new_rows, _) = _episode(seed=7)

    opt = Opt()
    opt.adam = True
    opt.learning_rate = 0.001
    opt.max_novel_epochs = 12

    _grow_torch_head(torch, tnet, new_rows)
    base_w0 = torch.from_numpy(np.asarray(head0.weight[:N_BASE]).copy())
    epochs_t, losses_t = _torch_session(torch, tnet, opt, sup_x, sup_y,
                                        base_w0)
    acc_novel_t, acc_base_t = _torch_eval(torch, tnet, qry_x, qry_y,
                                          base_x, base_y)

    head_w = np.asarray(head0.weight).copy()
    head_w[N_BASE:N_BASE + N_WAYS] = new_rows
    out = _run_our_session(opt, backbone, variables, head0, head_w, None,
                           False, sup_x, sup_y, qry_x, qry_y, base_x, base_y)
    _assert_session_matches(out[4], epochs_t, losses_t, acc_novel_t,
                            acc_base_t)
