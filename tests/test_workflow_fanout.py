"""The full golden reproduction workflow, fanned out: vmapped multi-seed
backbone pretraining -> per-seed checkpoints -> vmapped multi-seed FSCIL
eval (the reference's two chained Slurm arrays,
scripts/continual/slurm_run_backbone.sh -> slurm_subspace_reg.sh, in two
commands on one chip)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from subspace_reg_tpu.data import synthetic

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    # full-size continual splits (500/50 hardcoded, mini_imagenet.py:85)
    # at 8px keep the whole pickle ~10MB
    root = str(tmp_path_factory.mktemp("mini_wf"))
    synthetic.make_mini_imagenet(os.path.join(root, "miniImageNet"),
                                 n_classes=100, per_class=560,
                                 img_size=8, seed=0)
    return root


def test_cifar_pretrain_fanout_feeds_eval_fanout(tmp_path, monkeypatch):
    """The CIFAR continual chain: vmapped pretraining fan-out -> per-seed
    checkpoints -> vmapped eval fan-out (both beyond the reference, which
    raises for CIFAR)."""
    import run_seeds
    from subspace_reg_tpu.data import cifar as cifar_mod

    orig = cifar_mod.load_cifar_continual

    def small(opt, split="train", phase=None, lazy=False, **kw):
        kw.setdefault("train_per_class", 10)
        kw.setdefault("val_per_class", 2)
        return orig(opt, split=split, phase=phase, lazy=lazy, **kw)

    monkeypatch.setattr(cifar_mod, "load_cifar_continual", small)

    data_root = str(tmp_path / "data")
    synthetic.make_cifar(os.path.join(data_root, "CIFAR-FS"),
                         n_classes=100, per_class=20, seed=0)
    out = str(tmp_path / "backbones")
    res_pt = run_seeds.main([
        "--pretrain", "--vmap", "--seeds", "1", "2", "--",
        "--dataset", "CIFAR-FS", "--classifier", "linear",
        "--model", "resnet12", "--no_dropblock", "--no_linear_bias",
        "--continual", "--data_root", data_root,
        "--model_path", out, "--tb_path", os.path.join(out, "tb"),
        "--epochs", "1", "--batch_size", "100", "--set_seed", "1",
        "--num_workers", "0",
    ])
    assert set(res_pt["val_acc1"]) == {1, 2}
    pattern = os.path.join(out, "seed_{seed}", "resnet12_last.ckpt")

    res_ev = run_seeds.main([
        "--vmap", "--seeds", "1", "2",
        "--model_path_pattern", pattern, "--pallas", "off", "--",
        "--dataset", "CIFAR-FS", "--model", "resnet12", "--no_dropblock",
        "--data_root", data_root, "--n_shots", "5",
        "--classifier", "linear",
        "--eval_mode", "few-shot-incremental-fine-tune", "--continual",
        "--n_queries", "2", "--test_base_batch_size", "100",
        "--memory_replay", "1", "--n_base_support_samples", "1",
        "--lmbd_reg_transform_w", "0.2", "--lmbd_reg_novel", "0.1",
        "--learning_rate", "0.002", "--weight_decay", "0.005",
        "--min_novel_epochs", "3", "--max_novel_epochs", "10",
        "--set_seed", "1",
    ])
    assert res_ev["seeds"] == [1, 2]
    assert np.isfinite(res_ev["novel"]["mean"])
    assert all(len(t) == 9 for t in res_ev["weighted_traces"])


def test_pretrain_fanout_feeds_eval_fanout(data_root, tmp_path):
    import run_seeds

    out = str(tmp_path / "backbones")
    res_pt = run_seeds.main([
        "--pretrain", "--vmap", "--seeds", "1", "2", "--",
        "--dataset", "miniImageNet", "--classifier", "linear",
        "--model", "resnet12", "--no_dropblock", "--no_linear_bias",
        "--continual", "--data_root", data_root,
        "--model_path", out, "--tb_path", os.path.join(out, "tb"),
        "--epochs", "1", "--batch_size", "3000", "--set_seed", "1",
        "--num_workers", "0",
    ])
    assert set(res_pt["val_acc1"]) == {1, 2}
    pattern = os.path.join(out, "seed_{seed}", "resnet12_last.ckpt")
    for seed in (1, 2):
        assert os.path.exists(pattern.format(seed=seed))

    res_ev = run_seeds.main([
        "--vmap", "--seed_batch", "2", "--seeds", "1", "2",
        "--model_path_pattern", pattern, "--pallas", "off", "--",
        "--model", "resnet12", "--no_dropblock",
        "--data_root", data_root, "--n_shots", "5",
        "--classifier", "linear",
        "--eval_mode", "few-shot-incremental-fine-tune", "--continual",
        "--n_queries", "4", "--test_base_batch_size", "100",
        "--memory_replay", "1", "--n_base_support_samples", "1",
        "--lmbd_reg_transform_w", "0.2", "--lmbd_reg_novel", "0.1",
        "--learning_rate", "0.002", "--weight_decay", "0.005",
        "--min_novel_epochs", "3", "--max_novel_epochs", "10",
        "--set_seed", "1",
    ])
    assert res_ev["seeds"] == [1, 2]
    assert np.isfinite(res_ev["novel"]["mean"])
    assert np.isfinite(res_ev["base"]["mean"])
    # 9-entry weighted traces per seed (8 sessions + the session-0 entry,
    # eval/language_eval.py:382-395)
    assert all(len(t) == 9 for t in res_ev["weighted_traces"])
    json.dumps(res_ev, default=float)   # result is serializable as printed
