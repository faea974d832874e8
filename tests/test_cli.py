"""Entry-point integration: train_supervised -> checkpoint ->
eval_incremental wiring (engine stubbed; the engine itself is covered by
test_engine_e2e)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from subspace_reg_tpu.data import synthetic


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    # the CLI appends '/<dataset>' to --data_root (configs.py:107-112)
    root = str(tmp_path_factory.mktemp("mini_cli"))
    # enough images per class for the reference's hardcoded 500/50 split to
    # leave a non-empty test phase
    synthetic.make_mini_imagenet(os.path.join(root, "miniImageNet"),
                                 n_classes=100, per_class=560,
                                 img_size=8, seed=0)
    return root


def test_eval_incremental_cli_wiring(data_root, tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    import eval_incremental
    from subspace_reg_tpu.models import head as head_lib
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.utils.checkpoint import save_checkpoint

    # build a checkpoint in the native format
    backbone = ResNetRFS(n_blocks=(1, 1, 2, 2), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True)
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 8, 3)), train=False)
    head = head_lib.init_head(jax.random.PRNGKey(1), 60, in_dim=640,
                              with_bias=False, max_classes=60)
    ckpt = str(tmp_path / "resnet18_last.ckpt")
    save_checkpoint(ckpt, dict(variables), head,
                    {"training_classes": {i: i for i in range(60)},
                     "label2human": [f"synthetic {i}" for i in range(100)]})

    captured = {}

    def fake_engine(backbone, variables, head, meta, opt, **kw):
        captured["n_active"] = int(head.n_active)
        captured["max_classes"] = head.weight.shape[0]
        captured["opt"] = opt
        captured["kw"] = kw

        class R:
            acc_novel_avg = 1.0
            acc_base_avg = 2.0
            acc_average = 1.5
        return R()

    monkeypatch.setattr(eval_incremental,
                        "few_shot_finetune_incremental_test", fake_engine)
    res = eval_incremental.main([
        "--model_path", ckpt, "--model", "resnet18", "--no_dropblock",
        "--data_root", data_root,
        "--n_shots", "5", "--classifier", "linear",
        "--eval_mode", "few-shot-incremental-fine-tune", "--continual",
        "--n_queries", "4", "--test_base_batch_size", "100",
        "--set_seed", "5", "--memory_replay", "1",
        "--n_base_support_samples", "1",
        "--lmbd_reg_transform_w", "0.2",
    ])
    assert captured["n_active"] == 60
    assert captured["max_classes"] == 100      # padded for 8 sessions x 5
    assert captured["opt"].linear_bias is False
    assert captured["kw"]["base_support_sampler"] is not None
    assert res.acc_average == 1.5
