"""Full 8-session end-to-end metric-trace parity against a torch oracle.

Runs OUR complete host orchestrator (``few_shot_finetune_incremental_test``)
over the synthetic miniImageNet assets for all 8 continual sessions of the
golden subspace-reg config (base anchor + previous-novel anchor +
distance2subspace pull), then re-derives the entire protocol — episode
consumption, classifier growth, reserved-novel bookkeeping, the convergence
fine-tune loop, per-chunk validation with 2-decimal rounding, base
evaluation, and the weighted per-session averages — on the reference's own
torch ResNet (eval/language_eval.py:100-404), and asserts the printed
metric traces agree value for value.

Augmentation randomness is removed by monkeypatching the train transform to
the deterministic normalize (both sides then consume identical pixels); the
bit-exactness of episode composition itself is covered by
tests/test_reference_sampler_parity.py.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class Opt:
    model = "resnet12"
    dataset = "miniImageNet"
    transform = "A"
    continual = True
    set_seed = 3
    n_ways = 5
    n_shots = 5
    n_queries = 4
    n_test_runs = 10
    eval_mode = "few-shot-incremental-fine-tune"
    n_aug_support_samples = 1
    n_base_aug_support_samples = 0
    n_base_support_samples = 0
    test_base_batch_size = 64
    neval_episodes = 8
    memory_replay = 0
    lmbd_reg_transform_w = 0.2
    lmbd_reg_novel = 0.1
    label_pull = 1.0
    pulling = "regularize"
    attraction_override = "distance2subspace"
    target_train_loss = 0.0
    stable_epochs = 3
    convergence_epsilon = 1e-3
    min_novel_epochs = 3
    max_novel_epochs = 10
    learning_rate = 0.002
    weight_decay = 5e-3
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


@pytest.mark.slow
def test_eight_session_trace_matches_torch(tmp_path, reference_path,
                                           monkeypatch):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, reference_path)
    try:
        from models.resnet_language import resnet12 as torch_resnet12
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

    img, d, n_base = 16, 640, 60
    root = str(tmp_path / "mini")
    synthetic.make_mini_imagenet(root, n_classes=100, per_class=20,
                                 img_size=img, seed=0)
    opt = Opt()
    opt.data_root = root

    base_test = load_mini_imagenet(opt, split="train", phase="test",
                                   train_per_class=10, val_per_class=2)
    novel = load_mini_imagenet(opt, split="val")

    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0,
                         no_dropblock=True, avg_pool=True)
    variables = dict(backbone.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, img, img, 3)), train=False))
    head0 = head_lib.init_head(jax.random.PRNGKey(1), n_base, in_dim=d,
                               with_bias=False, max_classes=100)

    class _O:
        no_dropblock = True
        linear_bias = False
    torch.manual_seed(0)
    tnet = torch_resnet12(avg_pool=True, drop_rate=0.0, dropblock_size=1,
                          num_classes=n_base, opt=_O())
    sd = export_state_dict(variables, head0)
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    assert not unexpected

    # deterministic "augmentation": both engines see normalize-only support
    real_normalize = aug_ops.normalize_batch
    monkeypatch.setattr(aug_ops, "augment_batch",
                        lambda key, x, spec: real_normalize(x, spec))

    # ---- our engine: the full 8-session protocol ------------------------
    meta_sampler = EpisodeSampler(novel, opt, split="val",
                                  disjoint_classes=True)
    res = few_shot_finetune_incremental_test(
        backbone, variables, head0, {}, opt,
        meta_sampler=meta_sampler, base_test_split=base_test,
        base_support_sampler=None, verbose=False, pallas_mode="off")

    # ---- torch oracle: reference protocol re-derivation -----------------
    from subspace_reg_tpu.data.transforms import transforms_test_options
    train_spec, test_spec = transforms_test_options[opt.transform]

    def norm_np(u8, spec):
        x = u8.astype(np.float32) / 255.0
        return ((x - np.asarray(spec.mean, np.float32))
                / np.asarray(spec.std, np.float32))

    base_eval_n = opt.test_base_batch_size // 2
    min_lbl = min(base_test.labels)
    base_x = norm_np(base_test.imgs[:base_eval_n], test_spec)
    base_y = np.asarray([l - min_lbl
                         for l in base_test.labels[:base_eval_n]], np.int64)
    tb_x = torch.from_numpy(base_x.transpose(0, 3, 1, 2))

    np.random.seed(opt.set_seed)
    sampler_t = EpisodeSampler(novel, opt, split="val",
                               disjoint_classes=True)
    ce = torch.nn.CrossEntropyLoss()

    tnet.eval()
    with torch.no_grad():
        init_base_t = float(
            (tnet(tb_x).argmax(1).numpy() == base_y).mean() * 100)
    weighted_t = [init_base_t]
    novel_t, base_t, epochs_t = [], [], []
    base_w0 = torch.from_numpy(np.asarray(head0.weight[:n_base]).copy())
    reserved = None
    q_collect, qy_collect = [], []
    vocab_base_len = None

    for idx in range(8):
        ep = sampler_t.get(idx)
        vb, vocab_all, vocab_novel, orig2id = get_vocabs(
            base_test, novel, ep.query_y)
        if vocab_base_len is None:
            vocab_base_len = len(vb)
        for k in list(orig2id.keys()):
            orig2id[k] = orig2id[k] + idx * opt.n_ways
        sup_y = np.asarray([orig2id[int(y)] for y in ep.support_y], np.int64)
        qry_y = np.asarray([orig2id[int(y)] for y in ep.query_y], np.int64)
        sup_x = norm_np(ep.support_x, train_spec)
        qry_x = norm_np(ep.query_x, test_spec)
        q_collect.append(torch.from_numpy(qry_x.transpose(0, 3, 1, 2)))
        qy_collect.append(qry_y)

        # reserve previous session's novel rows (language_eval.py:169-186)
        if idx >= 1:
            new_rows_res = tnet.classifier.weight.detach()[-opt.n_ways:]
            reserved = (new_rows_res if reserved is None
                        else torch.cat([reserved, new_rows_res], 0))

        # classifier growth with OUR engine's fresh rows (the growth rows
        # are inputs, not oracle subject; engine key: seed*61 + 1000 + idx)
        n_active = n_base + idx * opt.n_ways
        grow_key = jax.random.PRNGKey(opt.set_seed * 61 + 1000 + idx)
        grown = head_lib.augment(
            head_lib.Head(weight=jnp.zeros((100, d), jnp.float32),
                          bias=None,
                          n_active=jnp.asarray(n_active, jnp.int32)),
            grow_key, opt.n_ways)
        fresh = np.asarray(grown.weight)[n_active:n_active + opt.n_ways]

        tnet.train()
        w_new = torch.nn.Parameter(torch.cat(
            [tnet.classifier.weight.detach(), torch.from_numpy(fresh)], 0))
        tnet.classifier = torch.nn.Linear(d, n_active + opt.n_ways,
                                          bias=False)
        tnet.classifier.weight = w_new

        for p in tnet.parameters():
            p.requires_grad = False
        tnet.classifier.weight.requires_grad = True
        optim = torch.optim.SGD([tnet.classifier.weight],
                                lr=opt.learning_rate, momentum=opt.momentum,
                                weight_decay=opt.weight_decay)
        ts_x = torch.from_numpy(sup_x.transpose(0, 3, 1, 2))
        ts_y = torch.from_numpy(sup_y)
        prev_loss, stable, epoch, stop = 15.0, 0, 1, False
        while not stop:
            out = tnet(ts_x)
            loss = ce(out, ts_y)
            loss = loss + opt.lmbd_reg_transform_w * torch.norm(
                tnet.classifier.weight[:n_base] - base_w0)
            if idx >= 1:
                loss = loss + opt.lmbd_reg_novel * torch.norm(
                    tnet.classifier.weight[n_base:n_base + reserved.size(0)]
                    - reserved)
            q, _ = torch.linalg.qr(base_w0.t(), mode="reduced")
            cur = tnet.classifier.weight[-opt.n_ways:]
            mut = cur @ q
            pullers = (mut / torch.norm(q.T, dim=1).unsqueeze(0)) @ q.T
            loss = loss + opt.label_pull * torch.norm(pullers - cur) ** 2
            optim.zero_grad()
            loss.backward()
            optim.step()
            l = float(loss)
            if abs(l - prev_loss) < opt.convergence_epsilon:
                stable += 1
            else:
                stable = 0
            if stable == opt.stable_epochs:
                stop = True
            if epoch >= opt.max_novel_epochs:
                stop = True
            if (l <= opt.target_train_loss
                    and epoch >= opt.min_novel_epochs + 1):
                stop = True
            prev_loss = l
            tnet.eval()
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
                (tnet(tb_x).argmax(1).numpy() == base_y).mean() * 100)
        novel_t.append(round(test_acc, 2))
        base_t.append(round(acc_base_, 2))
        # reference w2 = len(vocab_base)+len(vocab_novel)-60, where
        # vocab_base has absorbed 5 novel labels per past session
        # (language_eval.py:163-167,384)
        w2 = (vocab_base_len + idx * opt.n_ways) + len(vocab_novel) - 60
        weighted_t.append(round((60 * acc_base_ + w2 * test_acc)
                                / (60 + w2), 2))

    # ---- the printed metric traces must agree value for value ----------
    assert res.epochs_per_session == epochs_t
    np.testing.assert_allclose(res.acc_novel_list, novel_t, atol=0.02)
    np.testing.assert_allclose(res.acc_base_list, base_t, atol=0.02)
    np.testing.assert_allclose(res.weighted_avg_l, weighted_t, atol=0.02)
    np.testing.assert_allclose(res.acc_novel_avg, np.mean(novel_t),
                               atol=0.02)
    np.testing.assert_allclose(res.acc_base_avg, np.mean(base_t), atol=0.02)
