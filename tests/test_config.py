"""CLI flag-surface parity (reference configs.py:10-241)."""

import pytest

from subspace_reg_tpu.config import (
    EvalConfig, SupervisedConfig, parse_option_eval, parse_option_supervised)


GOLDEN_EVAL_ARGS = [
    "--model_path", "/tmp/backbone.pth", "--model", "resnet18",
    "--no_dropblock", "--data_root", "/tmp/data", "--n_shots", "5",
    "--classifier", "linear",
    "--eval_mode", "few-shot-incremental-fine-tune",
    "--min_novel_epochs", "20", "--learning_rate", "0.002",
    "--freeze_backbone_at", "1", "--test_base_batch_size", "2000",
    "--continual", "--num_workers", "0", "--n_queries", "25",
    "--lmbd_reg_transform_w", "0.2", "--target_train_loss", "0.0",
    "--label_pull", "1.0", "--lmbd_reg_novel", "0.1", "--set_seed", "3",
    "--attraction_override", "distance2subspace",
    "--n_base_support_samples", "1", "--memory_replay", "1",
]


def test_golden_eval_flags_parse():
    """The exact invocation of scripts/continual/slurm_subspace_reg.sh."""
    opt = parse_option_eval(GOLDEN_EVAL_ARGS)
    assert opt.model == "resnet18"
    assert opt.no_dropblock and opt.continual
    assert opt.n_shots == 5 and opt.n_queries == 25
    assert opt.lmbd_reg_transform_w == 0.2
    assert opt.lmbd_reg_novel == 0.1
    assert opt.label_pull == 1.0
    assert opt.target_train_loss == 0.0
    assert opt.attraction_override == "distance2subspace"
    assert opt.memory_replay == 1 and opt.n_base_support_samples == 1
    assert opt.set_seed == 3
    # derived (reference configs.py:102-112)
    assert opt.data_root == "/tmp/data/miniImageNet"
    assert opt.data_aug is True
    assert opt.use_trainval is False
    # conditional flag registered because --label_pull given
    assert opt.pulling == "regularize"


def test_eval_defaults_match_reference():
    opt = parse_option_eval(["--model_path", "/x/model.pth"])
    ref_defaults = dict(
        model="resnet12", dataset="miniImageNet", transform="A",
        n_test_runs=2000, n_ways=5, n_shots=1, n_queries=5,
        n_aug_support_samples=5, n_base_aug_support_samples=0,
        n_base_support_samples=0, num_workers=4, test_batch_size=1,
        test_base_batch_size=50, set_seed=5, neval_episodes=2000,
        word_embed_size=500, word_embed_path="word_embeds",
        stable_epochs=10, convergence_epsilon=1e-4, temperature=1.0,
        memory_replay=0, min_novel_epochs=15, max_novel_epochs=1000,
        learning_rate=0.01, weight_decay=5e-4, momentum=0.9,
        freeze_backbone_at=1, target_train_loss=1.0)
    for k, v in ref_defaults.items():
        assert getattr(opt, k) == v, k
    assert opt.label_pull is None and opt.lmbd_reg_transform_w is None


def test_trainval_inferred_from_path():
    opt = parse_option_eval(["--model_path", "/x/trainval_model.pth"])
    assert opt.use_trainval is True


def test_supervised_golden_flags():
    """scripts/continual/slurm_run_backbone.sh invocation."""
    opt = parse_option_supervised(
        ["--trial", "pretrain", "--model_path", "/tmp/save",
         "--tb_path", "/tmp/tb", "--data_root", "/tmp/data",
         "--classifier", "linear", "--model", "resnet18",
         "--save_freq", "100", "--continual", "--no_dropblock",
         "--no_linear_bias", "--set_seed", "2"],
        make_dirs=False)
    assert opt.model == "resnet18" and opt.continual
    assert opt.linear_bias is False           # derived from no_linear_bias
    assert opt.save_freq == 100
    assert opt.lr_decay_epochs_list == [60, 80]
    assert opt.learning_rate == 0.05 and opt.batch_size == 64
    assert opt.epochs == 100
    assert opt.model_name == "miniImageNet_resnet18_classifier_linear"


def test_supervised_cifar_forces_transform_d():
    opt = parse_option_supervised(
        ["--dataset", "CIFAR-FS", "--classifier", "linear"],
        make_dirs=False)
    assert opt.transform == "D"


def test_supervised_trainval_trial_suffix():
    opt = parse_option_supervised(
        ["--use_trainval", "--classifier", "linear", "-t", "7"],
        make_dirs=False)
    assert opt.trial == "7_trainval"
