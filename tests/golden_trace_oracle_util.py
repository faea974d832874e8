"""Shared GOLDEN-GEOMETRY trace-oracle harness, parametrized on pixel
resolution and session count.

Runs the complete golden subspace-reg+M configuration — every
hyperparameter of scripts/continual/slurm_subspace_reg.sh:33-54 verbatim
(resnet18, 5-shot, 25 queries, 5x augmented support copies, memory replay
with the hardcoded 25-index draw per session, 1 base exemplar per class,
min_novel_epochs 20, target_train_loss 0.0, test_base_batch_size 2000,
lr 2e-3, lambda_base 0.2, lambda_novel 0.1, gamma(label_pull) 1.0,
distance2subspace, plus the configs.py defaults stable_epochs=10,
convergence_epsilon=1e-4, max_novel_epochs=1000, weight_decay=5e-4) —
through OUR orchestrator, then re-derives the full metric trace
value-for-value on the reference's own torch ResNet
(eval/language_eval.py:100-404).

Two instantiations live in test_golden_trace_torch_oracle.py:
  * 16px x 8 sessions — the full-protocol composition (replay growth x
    reserved-novel bookkeeping x convergence stopping over all sessions);
  * 84px x 2 sessions — the reference's NATIVE resolution
    (dataset/transform_cfg.py:13-30, models/util.py:21-31), closing the
    one axis the 16px oracle leaves synthetic. Two sessions exercise
    base exemplars, replay consumption, and reserved-novel anchoring at
    the real conv/pool geometry; more are CPU-intractable (the reference
    model runs at ~2-9 img/s at 84px on this single-core host).

Augmentation randomness is removed by monkeypatching the train transform
to the deterministic normalize; episode-composition bit-exactness is
covered separately by tests/test_reference_sampler_parity.py.

The torch re-derivation caches eval-mode 640-d features after the epoch-1
train-mode forwards (the backbone is frozen at epoch 1 and BN running
stats only move during train-mode forwards, so eval features are constant
from epoch 2 on — mathematically identical to the reference's per-epoch
full forwards, language_eval.py:242-326, and the only way a 1000-epoch
cap is tractable on CPU).
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp


class GoldenOpt:
    # scripts/continual/slurm_subspace_reg.sh:33-54 verbatim
    model = "resnet18"
    dataset = "miniImageNet"
    transform = "A"
    continual = True
    set_seed = 1
    n_ways = 5
    n_shots = 5
    n_queries = 25
    n_test_runs = 10
    eval_mode = "few-shot-incremental-fine-tune"
    n_aug_support_samples = 5        # configs.py:33 default
    n_base_aug_support_samples = 0
    n_base_support_samples = 1
    test_base_batch_size = 2000
    neval_episodes = 8
    memory_replay = 1
    lmbd_reg_transform_w = 0.2
    lmbd_reg_novel = 0.1
    label_pull = 1.0
    pulling = "regularize"
    attraction_override = "distance2subspace"
    target_train_loss = 0.0
    stable_epochs = 10               # configs.py:79 default
    convergence_epsilon = 1e-4       # configs.py:81 default
    min_novel_epochs = 20
    max_novel_epochs = 1000          # configs.py:89 default
    learning_rate = 0.002
    weight_decay = 5e-4              # configs.py:91 default (script passes none)
    momentum = 0.9
    adam = False
    freeze_backbone_at = 1
    no_dropblock = True
    glove = False
    use_synonyms = False
    temperature = 1.0
    word_embed_size = 500
    word_embed_path = None
    use_episodes = False
    verbose = False


def run_golden_trace_oracle(tmp_path, reference_path, monkeypatch,
                            img, n_sessions):
    """Run the golden protocol for ``n_sessions`` at ``img`` px through our
    engine and the torch re-derivation; assert trace parity value for
    value. Returns (our_result, torch_traces_dict) for extra assertions."""
    import torch
    sys.path.insert(0, reference_path)
    try:
        from models.resnet_language import resnet18 as torch_resnet18
    finally:
        sys.path.pop(0)
    sys.path.insert(0, "/root/repo/tools")
    from export_pth import export_state_dict

    from subspace_reg_tpu.data import synthetic
    from subspace_reg_tpu.data.episodes import EpisodeSampler, get_vocabs
    from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet
    from subspace_reg_tpu.engine.incremental import (
        few_shot_finetune_incremental_test)
    from subspace_reg_tpu.models import head as head_lib
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.ops import augment as aug_ops

    d, n_base, n_ways = 640, 60, 5
    root = str(tmp_path / "mini")
    # base-test needs >= test_base_batch_size//2 = 1000 images over the 60
    # base classes; novel classes need 5 shots + 25 queries each
    synthetic.make_mini_imagenet(root, n_classes=100, per_class=32,
                                 img_size=img, seed=0)
    opt = GoldenOpt()
    opt.data_root = root
    opt.neval_episodes = n_sessions

    base_test = load_mini_imagenet(opt, split="train", phase="test",
                                   train_per_class=8, val_per_class=2)
    base_train = load_mini_imagenet(opt, split="train", phase="train",
                                    train_per_class=8, val_per_class=2)
    novel = load_mini_imagenet(opt, split="val")
    assert base_test.imgs.shape[0] >= opt.test_base_batch_size // 2

    backbone = ResNetRFS(n_blocks=(1, 1, 2, 2), drop_rate=0.0,
                         no_dropblock=True, avg_pool=True)
    variables = dict(backbone.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, img, img, 3)), train=False))
    # the engine requires the head padded exactly to the session budget
    # (engine/incremental.py:1372)
    max_cls = n_base + n_sessions * n_ways
    head0 = head_lib.init_head(jax.random.PRNGKey(1), n_base, in_dim=d,
                               with_bias=False, max_classes=max_cls)

    class _O:
        no_dropblock = True
        linear_bias = False
    torch.manual_seed(0)
    tnet = torch_resnet18(avg_pool=True, drop_rate=0.0, dropblock_size=1,
                          num_classes=n_base, opt=_O())
    sd = export_state_dict(variables, head0)
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    assert not unexpected

    # deterministic "augmentation": both engines see normalize-only pixels
    real_normalize = aug_ops.normalize_batch
    monkeypatch.setattr(aug_ops, "augment_batch",
                        lambda key, x, spec: real_normalize(x, spec))

    # ---- our engine: the golden protocol for n_sessions ------------------
    meta_sampler = EpisodeSampler(novel, opt, split="val",
                                  disjoint_classes=True)
    base_support_sampler = EpisodeSampler(base_train, opt, split="train",
                                          phase="train")
    res = few_shot_finetune_incremental_test(
        backbone, variables, head0, {}, opt,
        meta_sampler=meta_sampler, base_test_split=base_test,
        base_support_sampler=base_support_sampler, verbose=False,
        pallas_mode="off")

    # ---- torch oracle: reference protocol re-derivation ------------------
    from subspace_reg_tpu.data.transforms import transforms_test_options
    train_spec, test_spec = transforms_test_options[opt.transform]

    def norm_np(u8, spec):
        x = u8.astype(np.float32) / 255.0
        return ((x - np.asarray(spec.mean, np.float32))
                / np.asarray(spec.std, np.float32))

    def tfeat(x_nchw):
        feats, _ = tnet(x_nchw, is_feat=True)
        return feats[-1]

    base_eval_n = opt.test_base_batch_size // 2
    min_lbl = min(base_test.labels)
    base_x = norm_np(base_test.imgs[:base_eval_n], test_spec)
    base_y = np.asarray([l - min_lbl
                         for l in base_test.labels[:base_eval_n]], np.int64)
    tb_x = torch.from_numpy(base_x.transpose(0, 3, 1, 2))

    def eval_logits_chunked(x, chunk=250):
        # bound peak memory at 84px (1000x3x84x84 activations otherwise)
        outs = []
        for i in range(0, x.shape[0], chunk):
            outs.append(tnet(x[i:i + chunk]))
        return torch.cat(outs, 0)

    # RNG stream contract mirrors the orchestrator exactly: reseed, one
    # base-exemplar draw, then per session an episode draw followed by the
    # replay-memory index draw (language_eval.py:100-102,112-117,352-359)
    np.random.seed(opt.set_seed)
    sampler_t = EpisodeSampler(novel, opt, split="val",
                               disjoint_classes=True)
    base_sampler_t = EpisodeSampler(base_train, opt, split="train",
                                    phase="train")
    np.random.seed(opt.set_seed)
    base_ep = base_sampler_t.get(0)
    bsup_x = norm_np(base_ep.support_x, train_spec)          # 60 exemplars
    bsup_y = base_ep.support_y.astype(np.int64)
    assert bsup_x.shape[0] == n_base

    ce = torch.nn.CrossEntropyLoss()

    tnet.eval()
    with torch.no_grad():
        init_base_t = float(
            (eval_logits_chunked(tb_x).argmax(1).numpy() == base_y).mean()
            * 100)
    weighted_t = [init_base_t]
    novel_t, base_t, epochs_t = [], [], []
    base_w0 = torch.from_numpy(np.asarray(head0.weight[:n_base]).copy())
    reserved = None
    q_collect, qy_collect = [], []
    mem_x_parts, mem_y_parts = [], []
    vocab_base_len = None

    for idx in range(n_sessions):
        ep = sampler_t.get(idx)
        vb, vocab_all, vocab_novel, orig2id = get_vocabs(
            base_test, novel, ep.query_y)
        if vocab_base_len is None:
            vocab_base_len = len(vb)
        for k in list(orig2id.keys()):
            orig2id[k] = orig2id[k] + idx * n_ways
        sup_y = np.asarray([orig2id[int(y)] for y in ep.support_y], np.int64)
        qry_y = np.asarray([orig2id[int(y)] for y in ep.query_y], np.int64)
        sup_x = norm_np(ep.support_x, train_spec)            # 125 images
        qry_x = norm_np(ep.query_x, test_spec)               # 125 queries
        assert sup_x.shape[0] == n_ways * opt.n_shots * opt.n_aug_support_samples
        q_collect.append(torch.from_numpy(qry_x.transpose(0, 3, 1, 2)))
        qy_collect.append(qry_y)

        # reserve previous session's novel rows (language_eval.py:169-186)
        if idx >= 1:
            new_rows_res = tnet.classifier.weight.detach()[-n_ways:]
            reserved = (new_rows_res if reserved is None
                        else torch.cat([reserved, new_rows_res], 0))

        # classifier growth with OUR engine's fresh rows (the growth rows
        # are inputs, not oracle subject; engine key: seed*61 + 1000 + idx)
        n_active = n_base + idx * n_ways
        grow_key = jax.random.PRNGKey(opt.set_seed * 61 + 1000 + idx)
        grown = head_lib.augment(
            head_lib.Head(weight=jnp.zeros((max_cls, d), jnp.float32),
                          bias=None,
                          n_active=jnp.asarray(n_active, jnp.int32)),
            grow_key, n_ways)
        fresh = np.asarray(grown.weight)[n_active:n_active + n_ways]

        tnet.train()
        w_new = torch.nn.Parameter(torch.cat(
            [tnet.classifier.weight.detach(), torch.from_numpy(fresh)], 0))
        tnet.classifier = torch.nn.Linear(d, n_active + n_ways, bias=False)
        tnet.classifier.weight = w_new

        for p in tnet.parameters():
            p.requires_grad = False
        tnet.classifier.weight.requires_grad = True
        optim = torch.optim.SGD([tnet.classifier.weight],
                                lr=opt.learning_rate, momentum=opt.momentum,
                                weight_decay=opt.weight_decay)
        # support + base exemplars concatenated (language_eval.py:149-150)
        ts_x = torch.from_numpy(
            np.concatenate([sup_x, bsup_x], 0).transpose(0, 3, 1, 2))
        ts_y = torch.from_numpy(np.concatenate([sup_y, bsup_y]))
        mem_n = sum(m.shape[0] for m in mem_x_parts)
        if mem_n:
            tm_x = torch.from_numpy(
                np.concatenate(mem_x_parts, 0).transpose(0, 3, 1, 2))
            tm_y = torch.from_numpy(np.concatenate(mem_y_parts))

        def session_loss(sup_logits, mem_logits):
            loss = ce(sup_logits, ts_y)
            if mem_n:
                loss = loss + ce(mem_logits, tm_y)
            loss = loss + opt.lmbd_reg_transform_w * torch.norm(
                tnet.classifier.weight[:n_base] - base_w0)
            if idx >= 1:
                loss = loss + opt.lmbd_reg_novel * torch.norm(
                    tnet.classifier.weight[n_base:n_base + reserved.size(0)]
                    - reserved)
            q, _ = torch.linalg.qr(base_w0.t(), mode="reduced")
            cur = tnet.classifier.weight[-n_ways:]
            mut = cur @ q
            pullers = (mut / torch.norm(q.T, dim=1).unsqueeze(0)) @ q.T
            return loss + opt.label_pull * torch.norm(pullers - cur) ** 2

        def step_bookkeeping(l, prev_loss, stable, epoch):
            if abs(l - prev_loss) < opt.convergence_epsilon:
                stable += 1
            else:
                stable = 0
            stop = False
            if stable == opt.stable_epochs:
                stop = True
            if epoch >= opt.max_novel_epochs:
                stop = True
            if (l <= opt.target_train_loss
                    and epoch >= opt.min_novel_epochs + 1):
                stop = True
            return l, stable, stop

        # ---- epoch 1: train-mode forwards (BN running stats update;
        # support->memory order, language_eval.py:252-258) ----
        f1s = tfeat(ts_x)
        f1m = tfeat(tm_x) if mem_n else None
        loss = session_loss(
            torch.nn.functional.linear(f1s, tnet.classifier.weight),
            (torch.nn.functional.linear(f1m, tnet.classifier.weight)
             if mem_n else None))
        optim.zero_grad()
        loss.backward()
        optim.step()
        prev_loss, stable, stop = step_bookkeeping(float(loss), 15.0, 0, 1)
        tnet.eval()               # validate() side effect (language_eval.py:19)
        epoch = 2

        # ---- epochs 2+: eval-mode features are constant -> cache ----
        with torch.no_grad():
            f2s = tfeat(ts_x)
            f2m = tfeat(tm_x) if mem_n else None
        while not stop:
            loss = session_loss(
                torch.nn.functional.linear(f2s, tnet.classifier.weight),
                (torch.nn.functional.linear(f2m, tnet.classifier.weight)
                 if mem_n else None))
            optim.zero_grad()
            loss.backward()
            optim.step()
            prev_loss, stable, stop = step_bookkeeping(
                float(loss), prev_loss, stable, epoch)
            epoch += 1
        epochs_t.append(epoch - 1)

        # per-chunk validation with the 2-decimal rounding quirk
        # (language_eval.py:321-326,370-374) + base eval (:361-367)
        with torch.no_grad():
            chunk_accs = []
            for cx, cy in zip(q_collect, qy_collect):
                acc = (tnet(cx).argmax(1).numpy() == cy).mean() * 100
                chunk_accs.append(round(float(acc), 2))
            test_acc = float(np.array(chunk_accs).mean())
            acc_base_ = float(
                (eval_logits_chunked(tb_x).argmax(1).numpy()
                 == base_y).mean() * 100)
        novel_t.append(round(test_acc, 2))
        base_t.append(round(acc_base_, 2))
        w2 = (vocab_base_len + idx * n_ways) + len(vocab_novel) - 60
        weighted_t.append(round((60 * acc_base_ + w2 * test_acc)
                                / (60 + w2), 2))

        # ---- replay-memory growth: the hardcoded 25-index draw ----
        # (language_eval.py:352-359; continues the global np stream)
        inds = np.random.choice(opt.n_shots, opt.memory_replay)
        margin = 5 * np.arange(5)
        offset = np.arange(0, 125, 25)
        inds = (np.tile(margin + inds, (5, 1))
                + np.tile(offset, (5, 1)).T).flatten()
        mem_x_parts.append(sup_x[inds])
        mem_y_parts.append(sup_y[inds])

    # ---- the printed metric traces must agree value for value -----------
    assert res.epochs_per_session == epochs_t
    np.testing.assert_allclose(res.acc_novel_list, novel_t, atol=0.02)
    np.testing.assert_allclose(res.acc_base_list, base_t, atol=0.02)
    np.testing.assert_allclose(res.weighted_avg_l, weighted_t, atol=0.02)
    np.testing.assert_allclose(res.acc_novel_avg, np.mean(novel_t),
                               atol=0.02)
    np.testing.assert_allclose(res.acc_base_avg, np.mean(base_t), atol=0.02)
    # composition sanity on top of the value-for-value trace: the replay
    # buffer must have grown 25/session and the reserved-anchor block
    # 5/session (from session 1 on)
    assert sum(m.shape[0] for m in mem_x_parts) == 25 * n_sessions
    if n_sessions >= 2:
        assert reserved.shape[0] == 5 * (n_sessions - 1)
    return res, {"novel": novel_t, "base": base_t, "epochs": epochs_t,
                 "weighted": weighted_t}
