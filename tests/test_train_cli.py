"""train_supervised CLI end-to-end on synthetic CIFAR + mid-run resume."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from subspace_reg_tpu.data import synthetic


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    data = str(tmp_path_factory.mktemp("cifar_cli"))
    synthetic.make_cifar(os.path.join(data, "CIFAR-FS"), n_classes=30,
                         per_class=8, partitions=("train", "val", "test"))
    out = str(tmp_path_factory.mktemp("out"))
    return data, out


@pytest.mark.slow
def test_train_supervised_cli_and_resume(roots):
    import train_supervised
    data, out = roots
    args = [
        "--dataset", "CIFAR-FS", "--classifier", "linear",
        "--model", "resnet12", "--no_dropblock", "--no_linear_bias",
        "--data_root", data, "--model_path", os.path.join(out, "save"),
        "--tb_path", os.path.join(out, "tb"),
        "--epochs", "1", "--batch_size", "64", "--set_seed", "1",
        "--num_workers", "0", "--print_freq", "1",
    ]
    state1 = train_supervised.main(args)
    ckpt = os.path.join(out, "save", "resnet12_last.ckpt")
    assert os.path.exists(ckpt)
    assert int(state1.step) == 80 // 64  # 10 train classes? dense labels
    # metrics log written
    metrics = os.path.join(out, "tb",
                           "CIFAR-FS_resnet12_classifier_linear",
                           "metrics.jsonl")
    assert os.path.exists(metrics)

    # resume for one more epoch; optimizer state and step restored
    state2 = train_supervised.main(args + ["--epochs", "2",
                                           "--reload_path", ckpt])
    assert int(state2.step) > int(state1.step)

    # checkpoint loads back through the generic loader
    from subspace_reg_tpu.utils.checkpoint import load_any
    variables, head, meta = load_any(ckpt)
    assert int(head.n_active) == 10
    assert meta["epoch"] == 2   # overwritten by the resumed run's final save

    # deterministic resume: the resumed trajectory equals an uninterrupted
    # 2-epoch run (shuffle stream advanced past the skipped epoch;
    # optimizer state/step restored bit-exactly)
    import jax
    out2 = os.path.dirname(ckpt) + "_uninterrupted"
    args2 = list(args)
    args2[args2.index("--model_path") + 1] = out2
    args2[args2.index("--tb_path") + 1] = out2 + "_tb"
    state_full = train_supervised.main(args2 + ["--epochs", "2"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        jax.device_get(state2.params), jax.device_get(state_full.params))
