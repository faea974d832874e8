"""XtarNet exact-episode replay (reference dataset/mini_imagenet.py:213-241,
352-416) — the reference's equivalence-testing mechanism, preserved as a
parity fixture.

Two layers of evidence: the authored-episode tests assert our parser
reproduces ids we wrote ourselves; the ``*_vs_reference`` tests import the
reference's OWN ``MetaImageNet`` (torchvision stubbed, identity transforms)
and byte-compare every replayed episode — support pixels, labels, query
pixels, section filtering (VAL vs TEST), and the Base Query path — so the
replay contract is verified against the reference's parser, not our reading
of it."""

import os
import sys

import numpy as np
import pytest

from subspace_reg_tpu.data import synthetic
from subspace_reg_tpu.data.episodes import EpisodeSampler
from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet


class Opt:
    continual = True
    set_seed = 5
    n_ways = 5
    n_shots = 5
    n_queries = 4
    n_test_runs = 4
    eval_mode = "few-shot-incremental-fine-tune"
    n_aug_support_samples = 2
    n_base_aug_support_samples = 0
    n_base_support_samples = 0


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini_replay"))
    synthetic.make_mini_imagenet(root, n_classes=100, per_class=20,
                                 img_size=8, seed=0)
    opt = Opt()
    opt.data_root = root
    val = load_mini_imagenet(opt, split="val")

    # author an episode file in the XtarNet format: VAL section with two
    # episodes, each 5 classes x (5 support, 4 query)
    r = np.random.RandomState(9)
    lines = ["VAL\n"]
    episodes = []
    for _ in range(2):
        classes = r.choice(sorted(set(val.labels)), 5, replace=False)
        sup, qry = [], []
        for c in classes:
            idxs = [i for i, l in enumerate(val.labels) if l == c]
            pick = r.choice(idxs, 9, replace=False)
            sup += list(pick[:5])
            qry += list(pick[5:])
        episodes.append((sup, qry))
        lines.append("Novel Support: [" + ",".join(map(str, sup)) + "]\n")
        lines.append("Novel Query: [" + ",".join(map(str, qry)) + "]\n")
    lines.append("TEST\n")
    with open(os.path.join(root, "episodes_5_5.txt"), "w") as f:
        f.writelines(lines)
    return dict(opt=opt, val=val, episodes=episodes)


def test_replay_reproduces_authored_episodes(env):
    opt, val = env["opt"], env["val"]
    sampler = EpisodeSampler(val, opt, split="val", use_episodes=True)
    assert len(sampler) == 2
    for item, (sup_ids, qry_ids) in enumerate(env["episodes"]):
        ep = sampler.get(item)
        # support tiled x n_aug_support_samples
        assert ep.support_x.shape[0] == len(sup_ids) * 2
        np.testing.assert_array_equal(
            ep.support_x[: len(sup_ids)], val.imgs[sup_ids])
        np.testing.assert_array_equal(
            ep.support_y[: len(sup_ids)],
            [val.labels[i] for i in sup_ids])
        np.testing.assert_array_equal(ep.query_x, val.imgs[qry_ids])
        np.testing.assert_array_equal(
            ep.query_y, [val.labels[i] for i in qry_ids])


# ---------------------------------------------------------------------------
# Byte-parity against the reference's OWN episode-file parser + __getitem__
# (dataset/mini_imagenet.py:213-241, 352-416) — VERDICT r4 item 6.
# ---------------------------------------------------------------------------

def _reference_replay_sampler(reference_path, opt, split, phase=None):
    torch = pytest.importorskip("torch")
    from test_reference_sampler_parity import _install_torchvision_stub
    _install_torchvision_stub()
    sys.path.insert(0, reference_path)
    try:
        import importlib
        import dataset.mini_imagenet as ref_mini
        importlib.reload(ref_mini)
        identity = lambda x: torch.from_numpy(
            np.asarray(x).astype(np.float32).copy())
        return ref_mini.MetaImageNet(
            args=opt, split=split, phase=phase,
            train_transform=identity, test_transform=identity,
            fix_seed=True, use_episodes=True)
    finally:
        sys.path.pop(0)


def _pick_novel_episodes(split_data, rng, n_episodes, n_sup=5, n_qry=4):
    """Author (support_ids, query_ids) tuples over a split, 5 classes each."""
    episodes = []
    for _ in range(n_episodes):
        classes = rng.choice(sorted(set(split_data.labels)), 5, replace=False)
        sup, qry = [], []
        for c in classes:
            idxs = [i for i, l in enumerate(split_data.labels) if l == c]
            pick = rng.choice(idxs, n_sup + n_qry, replace=False)
            sup += list(pick[:n_sup])
            qry += list(pick[n_sup:])
        episodes.append((sup, qry))
    return episodes


def _novel_lines(episodes):
    lines = []
    for sup, qry in episodes:
        # the published files carry numpy-print style comma+space separators;
        # include one doubled space to exercise the filter(None, ...) parse
        lines.append("Novel Support: [" + ", ".join(map(str, sup)) + "]\n")
        lines.append("Novel Query: [" + ",  ".join(map(str, qry)) + "]\n")
    return lines


def _compare_replay(ref_ds, ours, n_episodes):
    for item in range(n_episodes):
        r_sup_x, r_sup_y, r_qry_x, r_qry_y = ref_ds[item]
        ep = ours.get(item)
        np.testing.assert_array_equal(
            np.asarray(r_sup_x).reshape(ep.support_x.shape),
            ep.support_x.astype(np.float32))
        np.testing.assert_array_equal(np.asarray(r_sup_y).reshape(-1),
                                      ep.support_y)
        np.testing.assert_array_equal(
            np.asarray(r_qry_x).reshape(ep.query_x.shape),
            ep.query_x.astype(np.float32))
        np.testing.assert_array_equal(np.asarray(r_qry_y).reshape(-1),
                                      ep.query_y)


def test_replay_byte_parity_vs_reference_continual_val(tmp_path,
                                                       reference_path):
    """split='val' reads Novel lines of the VAL section only; TEST-section
    episodes must be filtered out by both parsers identically."""
    root = str(tmp_path / "mini")
    synthetic.make_mini_imagenet(root, n_classes=100, per_class=20,
                                 img_size=4, seed=3)
    opt = Opt()
    opt.data_root = root
    opt.data_aug = True
    val = load_mini_imagenet(opt, split="val")

    rng = np.random.RandomState(11)
    val_eps = _pick_novel_episodes(val, rng, 3)
    test_eps = _pick_novel_episodes(val, rng, 2)
    with open(os.path.join(root, "episodes_5_5.txt"), "w") as f:
        f.writelines(["VAL\n"] + _novel_lines(val_eps)
                     + ["TEST\n"] + _novel_lines(test_eps))

    ref_ds = _reference_replay_sampler(reference_path, opt, "val")
    ours = EpisodeSampler(val, opt, split="val", use_episodes=True)
    assert len(ours) == 3 == len(ref_ds.episode_query_ids)
    assert ours.episode_support_ids == ref_ds.episode_support_ids
    assert ours.episode_query_ids == ref_ds.episode_query_ids
    _compare_replay(ref_ds, ours, 3)


def test_replay_byte_parity_vs_reference_noncontinual_test(tmp_path,
                                                           reference_path):
    """split='test' (non-continual category-split layout) reads the TEST
    section's Novel lines."""
    root = str(tmp_path / "mini_cat")
    synthetic.make_mini_imagenet_category_split(root, per_class=20,
                                                img_size=4, seed=4)

    class NCOpt(Opt):
        continual = False
    opt = NCOpt()
    opt.data_root = root
    opt.data_aug = True
    test_split = load_mini_imagenet(opt, split="test")

    rng = np.random.RandomState(13)
    val_eps = _pick_novel_episodes(test_split, rng, 2)
    test_eps = _pick_novel_episodes(test_split, rng, 3)
    with open(os.path.join(root, "episodes_5_5.txt"), "w") as f:
        f.writelines(["VAL\n"] + _novel_lines(val_eps)
                     + ["TEST\n"] + _novel_lines(test_eps))

    ref_ds = _reference_replay_sampler(reference_path, opt, "test")
    ours = EpisodeSampler(test_split, opt, split="test", use_episodes=True)
    assert len(ours) == 3 == len(ref_ds.episode_query_ids)
    assert ours.episode_query_ids == ref_ds.episode_query_ids
    _compare_replay(ref_ds, ours, 3)


def test_replay_byte_parity_vs_reference_base_query(tmp_path,
                                                    reference_path):
    """split='train' phase='val'/'test' reads space-separated Base Query
    lines (the dummy-support branch, mini_imagenet.py:385-402). Needs real
    500/50-per-class sizes: the reference hardcodes that split."""
    root = str(tmp_path / "mini_full")
    synthetic.make_mini_imagenet(root, n_classes=100, per_class=560,
                                 img_size=4, seed=5)
    opt = Opt()
    opt.data_root = root
    opt.data_aug = True

    tr_val = load_mini_imagenet(opt, split="train", phase="val")
    tr_test = load_mini_imagenet(opt, split="train", phase="test")

    rng = np.random.RandomState(17)
    def base_lines(n_imgs, k):
        lines = []
        for _ in range(k):
            ids = rng.choice(n_imgs, 10, replace=False)
            # XtarNet dumps numpy arrays: space separated, ragged spacing
            lines.append("Base Query: [" + "  ".join(map(str, ids)) + "]\n")
        return lines

    with open(os.path.join(root, "episodes_5_5.txt"), "w") as f:
        f.writelines(["VAL\n"] + base_lines(tr_val.imgs.shape[0], 2)
                     + ["TEST\n"] + base_lines(tr_test.imgs.shape[0], 2))

    for phase, ours_split in (("val", tr_val), ("test", tr_test)):
        ref_ds = _reference_replay_sampler(reference_path, opt, "train",
                                           phase=phase)
        ours = EpisodeSampler(ours_split, opt, split="train", phase=phase,
                              use_episodes=True)
        assert len(ours) == 2 == len(ref_ds.episode_query_ids)
        assert ours.episode_query_ids == ref_ds.episode_query_ids
        _compare_replay(ref_ds, ours, 2)
