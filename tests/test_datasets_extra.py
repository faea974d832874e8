"""Secondary datasets: CIFAR-FS/FC100 (incl. continual wiring beyond the
reference) and tieredImageNet."""

import numpy as np
import pytest

from subspace_reg_tpu.data import synthetic
from subspace_reg_tpu.data.cifar import load_cifar, load_cifar_continual
from subspace_reg_tpu.data.episodes import EpisodeSampler
from subspace_reg_tpu.data.tiered_imagenet import load_tiered_imagenet


class Opt:
    set_seed = 4
    continual = True
    n_ways = 5
    n_shots = 3
    n_queries = 4
    n_test_runs = 6
    eval_mode = "few-shot-incremental-fine-tune"
    n_aug_support_samples = 2
    n_base_aug_support_samples = 0
    n_base_support_samples = 0
    augment_pretrain_wtrainb = False


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cifar"))
    synthetic.make_cifar(root, n_classes=100, per_class=20,
                         sparse_labels=True)
    return root


@pytest.fixture(scope="module")
def tiered_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tiered"))
    synthetic.make_tiered(root, n_classes=20, per_class=12)
    return root


def _opt(root, **kw):
    o = Opt()
    o.data_root = root
    for k, v in kw.items():
        setattr(o, k, v)
    return o


def test_cifar_partition_sparse_label_remap(cifar_root):
    sd = load_cifar(_opt(cifar_root), partition="train")
    labs = sorted(set(sd.labels))
    assert labs == list(range(len(labs)))      # dense 0..n (cifar.py:56-66)


def test_cifar_continual_split_and_episodes(cifar_root):
    opt = _opt(cifar_root)
    tr = load_cifar_continual(opt, split="train", phase="train",
                              train_per_class=10, val_per_class=2)
    assert sorted(set(tr.labels)) == list(range(60))
    assert len(tr) == 600
    assert len(tr.basec_map) == 60

    val = load_cifar_continual(opt, split="val")
    assert len(set(val.labels)) == 40
    sampler = EpisodeSampler(val, opt, split="val", disjoint_classes=True)
    seen = set()
    for i in range(8):
        ep = sampler.get(i)
        cls = set(ep.query_y.tolist())
        assert len(cls) == 5 and not (cls & seen)
        seen |= cls
        assert ep.support_x.shape == (5 * 3 * 2, 32, 32, 3)
    assert len(seen) == 40


def test_cifar_continual_same_class_split_as_mini(cifar_root):
    """The CIFAR protocol reuses the seeded 60/40 class shuffle."""
    opt = _opt(cifar_root)
    tr = load_cifar_continual(opt, split="train", phase="train",
                              train_per_class=10, val_per_class=2)
    np.random.seed(opt.set_seed)
    all_classes = np.arange(100)
    np.random.shuffle(all_classes)
    assert sorted(tr.basec_map.keys()) == sorted(all_classes[:60].tolist())


def test_tiered_loader(tiered_root):
    opt = _opt(tiered_root, continual=False)
    sd = load_tiered_imagenet(opt, partition="train", phase="train")
    assert len(sd) == 20 * 12
    assert sd.imgs.shape[1:] == (16, 16, 3)
    sampler = EpisodeSampler(sd, opt, split="val")
    ep = sampler.get(0)
    assert ep.query_x.shape[0] == 5 * 4


def test_tiered_train_b_pooling(tiered_root):
    opt = _opt(tiered_root, continual=False, augment_pretrain_wtrainb=True)
    sd = load_tiered_imagenet(opt, partition="train", phase="train")
    # pooled: 20 classes from train_a + 10 shifted classes from train_b
    assert len(set(sd.labels)) == 30
    assert len(sd) == 20 * 12 + 10 * 12
