"""Base-exemplar item-draw distribution check (VERDICT r4 item 9).

The reference draws its base-exemplar episode through a torch-RNG shuffled
DataLoader (eval_incremental.py:62-68: shuffle=True, one batch consumed per
run), so WHICH of the n_test_runs exemplar episodes seeds the memory varies
with torch's global RNG state.  Our engine uses ``get(0)``
(engine/incremental.py:1346-1351) — a documented distribution-level match
(PARITY.md).  This test quantifies the assumption: run the full 8-session
protocol once per exemplar item 0..9 (everything else fixed) and assert the
spread of the headline averages stays inside the ±0.5%/session parity
budget.  Each item re-seeds ``np.random.seed(item)`` before the draw
(mini_imagenet.py:311-312), so items 0..9 are exactly the reference's
candidate episodes.
"""

import numpy as np
import pytest

from subspace_reg_tpu.data import synthetic
from subspace_reg_tpu.data.episodes import EpisodeSampler
from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet
from subspace_reg_tpu.engine.incremental import (
    few_shot_finetune_incremental_test)
from subspace_reg_tpu.models import head as head_lib
from subspace_reg_tpu.models.resnet import ResNetRFS


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
    n_aug_support_samples = 5
    n_base_aug_support_samples = 0
    n_base_support_samples = 1
    test_base_batch_size = 200
    neval_episodes = 8
    memory_replay = 1
    lmbd_reg_transform_w = 0.2
    lmbd_reg_novel = 0.1
    label_pull = 1.0
    pulling = "regularize"
    attraction_override = "distance2subspace"
    target_train_loss = 0.0
    stable_epochs = 3
    convergence_epsilon = 1e-3
    min_novel_epochs = 5
    max_novel_epochs = 30
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


class _ItemRedirect:
    """Wrap a sampler so the engine's get(0) draws a chosen item instead."""

    def __init__(self, sampler: EpisodeSampler, item: int):
        self._sampler = sampler
        self._item = item

    def get(self, _ignored: int):
        return self._sampler.get(self._item)

    def __getattr__(self, name):
        return getattr(self._sampler, name)


@pytest.mark.slow
def test_exemplar_item_spread_within_parity_budget(tmp_path):
    import jax
    import jax.numpy as jnp

    root = str(tmp_path / "mini")
    synthetic.make_mini_imagenet(root, n_classes=100, per_class=20,
                                 img_size=16, seed=0)
    opt = Opt()
    opt.data_root = root

    base_test = load_mini_imagenet(opt, split="train", phase="test",
                                   train_per_class=10, val_per_class=2)
    base_train = load_mini_imagenet(opt, split="train", phase="train",
                                    train_per_class=10, val_per_class=2)
    novel = load_mini_imagenet(opt, split="val")

    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0,
                         no_dropblock=True, avg_pool=True)
    variables = dict(backbone.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 16, 16, 3)), train=False))
    head0 = head_lib.init_head(jax.random.PRNGKey(1), 60, in_dim=640,
                               with_bias=False, max_classes=100)

    novels, bases = [], []
    for item in range(10):
        meta_sampler = EpisodeSampler(novel, opt, split="val",
                                      disjoint_classes=True)
        exemplar = _ItemRedirect(
            EpisodeSampler(base_train, opt, split="train", phase="train"),
            item)
        res = few_shot_finetune_incremental_test(
            backbone, variables, head0, {}, opt,
            meta_sampler=meta_sampler, base_test_split=base_test,
            base_support_sampler=exemplar, verbose=False, pallas_mode="off")
        novels.append(res.acc_novel_avg)
        bases.append(res.acc_base_avg)

    novel_spread = float(np.max(novels) - np.min(novels))
    base_spread = float(np.max(bases) - np.min(bases))
    print(f"\nexemplar items 0..9: novel spread {novel_spread:.3f} "
          f"(values {[round(v, 2) for v in novels]}), base spread "
          f"{base_spread:.3f} (values {[round(v, 2) for v in bases]})")
    # measurement recorded in docs/PARITY.md; the ±0.5% budget is two-sided,
    # so the full spread across candidate items must stay within 2x0.5
    assert novel_spread <= 1.0, (novels, bases)
    assert base_spread <= 1.0, (novels, bases)
