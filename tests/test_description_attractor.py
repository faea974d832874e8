"""Description-embed attractor source (``--use_descriptions``).

The reference materializes BERT description embeds (util.py:90-130, assets
``description_embeds/miniImageNet_bert-base-cased_layer6_prefix_True.pickle``)
but ships NO live consumer: the 'description-linear' classifier choice
(configs.py:50) sets ``self.vocab`` on the model, whose forward then calls
``nn.Linear(x, get_alphas=...)`` — a TypeError (resnet_language.py:184-187)
— and none of the flags ``create_and_save_descriptions`` reads
(description_embed_path, desc_embed_model, transformer_layer, prefix_label)
are registered in the reference argparse at all.  This framework adjudicates
that dead path (VERDICT r3 item 6) with a LIVE variant: ``use_descriptions``
swaps the LangPuller's embedding source to the description pickles — the
attractor math is unchanged (softmax(E_novel @ E_base^T / T) @ W_base,
resnet_language.py:75-87).  Ledger: docs/PARITY.md.
"""

import os
import pickle
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subspace_reg_tpu.data import synthetic
from subspace_reg_tpu.models import lang_puller as lp


def _opt(path, **kw):
    o = types.SimpleNamespace(
        dataset="miniImageNet", use_descriptions=True,
        description_embed_path=path, desc_embed_model="bert-base-cased",
        transformer_layer=6, prefix_label=True, temperature=1.0,
        word_embed_size=500, word_embed_path=None, use_synonyms=False,
        glove=False)
    for k, v in kw.items():
        setattr(o, k, v)
    return o


def test_description_asset_filename_contract(tmp_path):
    """The loader reads the exact filename format of reference
    util.py:95-99 (the shipped assets' naming)."""
    opt = _opt(str(tmp_path))
    assert lp.description_embed_path(opt) == os.path.join(
        str(tmp_path),
        "miniImageNet_bert-base-cased_layer6_prefix_True.pickle")
    opt2 = _opt(str(tmp_path), desc_embed_model="bert-large-uncased",
                transformer_layer=9, prefix_label=False)
    assert lp.description_embed_path(opt2).endswith(
        "miniImageNet_bert-large-uncased_layer9_prefix_False.pickle")


def test_description_pullers_match_torch_oracle(tmp_path):
    """Attractors from description embeds == the reference LangPuller
    forward math (resnet_language.py:75-87) computed independently in
    torch on the same pickled vectors."""
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(0)
    vocab_base = [f"synthetic {i}" for i in range(6)]
    vocab_novel = [f"synthetic {i}" for i in range(6, 9)]
    dim, feat = 16, 8
    # values pickled as torch tensors, like the reference's own assets
    d = {name: torch.from_numpy(r.randn(dim))
         for name in vocab_base + vocab_novel}
    pth = os.path.join(str(tmp_path),
                       "miniImageNet_bert-base-cased_layer6_prefix_True.pickle")
    with open(pth, "wb") as f:
        pickle.dump(d, f)

    opt = _opt(str(tmp_path), temperature=3.0)
    state = lp.create_lang_puller(opt, vocab_base, vocab_novel)
    assert state.base_embeds.shape == (6, dim)
    assert state.novel_embeds.shape == (3, dim)

    w_base = r.randn(6, feat).astype(np.float32)
    got = np.asarray(lp.pullers(state, jnp.asarray(w_base)))

    tb = torch.stack([d[n] for n in vocab_base]).float()
    tn = torch.stack([d[n] for n in vocab_novel]).float()
    scores = tn @ tb.T
    want = (torch.softmax(scores / 3.0, dim=1)
            @ torch.from_numpy(w_base)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # session-2 novel swap (update_novel_embeds) keeps the base block
    state2 = lp.update_novel_embeds(state, opt, vocab_base[:2])
    np.testing.assert_array_equal(np.asarray(state2.base_embeds),
                                  np.asarray(state.base_embeds))
    assert state2.novel_embeds.shape == (2, dim)
    np.testing.assert_allclose(
        np.asarray(state2.novel_embeds), tb[:2].numpy(), rtol=1e-6)


def test_description_embeds_are_used_whole_ignoring_glove(tmp_path):
    """--glove slices the first 300 dims of the 500-d Vico vectors
    (resnet_language.py:52-54) — a layout that doesn't exist in the
    768-d description space, so description embeds are never sliced."""
    r = np.random.RandomState(1)
    vocab = ["synthetic 0", "synthetic 1"]
    d = {n: r.randn(400) for n in vocab}
    pth = os.path.join(str(tmp_path),
                       "miniImageNet_bert-base-cased_layer6_prefix_True.pickle")
    with open(pth, "wb") as f:
        pickle.dump(d, f)
    opt = _opt(str(tmp_path), glove=True)
    state = lp.create_lang_puller(opt, vocab, vocab)
    assert state.base_embeds.shape == (2, 400)


def test_engine_runs_with_description_attractors(tmp_path):
    """End-to-end: the FSCIL engine consumes description attractors through
    the semantic-pull path (label_pull set, no attraction_override)."""
    from subspace_reg_tpu.data.episodes import EpisodeSampler
    from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet
    from subspace_reg_tpu.engine.incremental import (
        few_shot_finetune_incremental_test)
    from subspace_reg_tpu.models import head as head_lib
    from subspace_reg_tpu.models.resnet import ResNetRFS

    from test_engine_e2e import Opt

    root = str(tmp_path / "mini")
    synthetic.make_mini_imagenet(root, n_classes=100, per_class=20,
                                 img_size=16, seed=0)
    desc = str(tmp_path / "desc")
    synthetic.make_description_embeds(desc, n_classes=100, dim=32)

    opt = Opt()
    opt.data_root = root
    opt.label_pull = 0.5
    opt.attraction_override = None
    opt.max_novel_epochs = 10
    opt.neval_episodes = 3
    opt.use_descriptions = True
    opt.description_embed_path = desc
    opt.desc_embed_model = "bert-base-cased"
    opt.transformer_layer = 6
    opt.prefix_label = True

    base_test = load_mini_imagenet(opt, split="train", phase="test",
                                   train_per_class=10, val_per_class=2)
    base_train = load_mini_imagenet(opt, split="train", phase="train",
                                    train_per_class=10, val_per_class=2)
    novel = load_mini_imagenet(opt, split="val")
    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True,
                         widths=(8, 16, 24, 32))
    variables = dict(backbone.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 16, 16, 3)), train=False))
    # padded head rows == 60 base + neval_episodes * n_ways
    head0 = head_lib.init_head(jax.random.PRNGKey(2), 60, in_dim=32,
                               with_bias=False, max_classes=75)
    res = few_shot_finetune_incremental_test(
        backbone, variables, head0, {}, opt,
        meta_sampler=EpisodeSampler(novel, opt, split="val",
                                    disjoint_classes=True),
        base_test_split=base_test,
        base_support_sampler=EpisodeSampler(base_train, opt, split="train",
                                            phase="train"),
        verbose=False, pallas_mode="off")
    assert len(res.acc_novel_list) == 3
    assert all(np.isfinite(v) for v in res.acc_novel_list)


def test_eval_cli_registers_description_flags():
    from subspace_reg_tpu.config import parse_option_eval

    cfg = parse_option_eval([
        "--model_path", "x.ckpt", "--data_root", "/tmp/x",
        "--label_pull", "0.5", "--use_descriptions",
        "--description_embed_path", "/tmp/d",
        "--desc_embed_model", "bert-large-uncased",
        "--transformer_layer", "9",
    ])
    assert cfg.use_descriptions is True
    assert cfg.description_embed_path == "/tmp/d"
    assert cfg.desc_embed_model == "bert-large-uncased"
    assert cfg.transformer_layer == 9
    assert cfg.prefix_label is True
