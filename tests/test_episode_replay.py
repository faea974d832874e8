"""XtarNet exact-episode replay (reference dataset/mini_imagenet.py:213-241,
352-416) — the reference's equivalence-testing mechanism, preserved as a
parity fixture."""

import os

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
