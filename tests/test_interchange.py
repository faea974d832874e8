"""Interchange: export to .pth, reimport, bit-identical; KD step; full NCE."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_pth_export_import_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from export_pth import export_state_dict
    from subspace_reg_tpu.models import head as head_lib
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.utils import torch_import

    m = ResNetRFS(n_blocks=(1, 1, 2, 2), drop_rate=0.1, no_dropblock=True,
                  avg_pool=True, widths=(8, 16, 24, 32))
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                       train=False)
    head = head_lib.init_head(jax.random.PRNGKey(1), 12, in_dim=32,
                              with_bias=True, max_classes=12)
    sd = export_state_dict(variables, head)

    # reimport through the .pth pathway
    sd_np = torch_import.state_dict_to_numpy(sd)
    back = torch_import.import_backbone(sd_np)
    head2 = torch_import.import_head(sd_np)

    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(variables["params"]),
            jax.tree_util.tree_leaves_with_path(back["params"])):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(variables["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(back["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(head.weight),
                                  np.asarray(head2.weight))
    np.testing.assert_array_equal(np.asarray(head.bias),
                                  np.asarray(head2.bias))


def test_kd_train_step_uses_teacher():
    from subspace_reg_tpu.data.transforms import transforms_options
    from subspace_reg_tpu.engine import pretrain as pt
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.utils import optim as optim_lib

    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0,
                         no_dropblock=True, avg_pool=True,
                         widths=(8, 16, 24, 32))
    tx = optim_lib.sgd_torch(0.05, momentum=0.9, weight_decay=5e-4)
    state = pt.init_pretrain_state(backbone, jax.random.PRNGKey(0),
                                   n_cls=10, img_size=16, tx=tx,
                                   with_bias=False)
    t_vars = backbone.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, 16, 16, 3)), train=False)
    r = np.random.RandomState(0)
    t_w = jnp.asarray(r.randn(10, 32).astype(np.float32))
    spec = transforms_options["A"][1]  # deterministic for comparability

    step_plain = pt.make_train_step(backbone, tx, spec, with_bias=False)
    step_kd = pt.make_train_step(backbone, tx, spec, with_bias=False,
                                 teacher=(backbone, t_vars, t_w, None),
                                 kd_temperature=4.0, kd_alpha=0.5,
                                 kd_beta=2.0)
    x = jnp.asarray(r.randint(0, 256, (16, 16, 16, 3)), jnp.uint8)
    y = jnp.asarray(r.randint(0, 10, (16,)), jnp.int32)
    _, m_plain = step_plain(state, x, y, jax.random.PRNGKey(1))
    state2 = pt.init_pretrain_state(backbone, jax.random.PRNGKey(0),
                                    n_cls=10, img_size=16, tx=tx,
                                    with_bias=False)
    _, m_kd = step_kd(state2, x, y, jax.random.PRNGKey(1))
    # KD adds a positive KL term scaled differently
    assert float(m_kd["loss"]) != pytest.approx(float(m_plain["loss"]),
                                                rel=1e-3)
    assert np.isfinite(float(m_kd["loss"]))


def test_nce_full_softmax():
    from subspace_reg_tpu.distill import init_nce_average, l2_normalize
    from subspace_reg_tpu.distill.nce import nce_forward_full, full_softmax_loss

    st = init_nce_average(jax.random.PRNGKey(0), 40, 16, k=8)
    r = np.random.RandomState(2)
    l = l2_normalize(jnp.asarray(r.randn(4, 16), jnp.float32))
    ab = l2_normalize(jnp.asarray(r.randn(4, 16), jnp.float32))
    y = jnp.asarray([1, 5, 9, 30])
    out_l, out_ab, st2 = nce_forward_full(st, l, ab, y)
    assert out_l.shape == (4, 40) and out_ab.shape == (4, 40)
    loss = full_softmax_loss(out_l, y)
    assert np.isfinite(float(loss)) and float(loss) > 0
    upd = np.asarray(st2.memory_l[np.asarray(y)])
    np.testing.assert_allclose(np.linalg.norm(upd, axis=1), 1.0, rtol=1e-5)


def test_learn_mapping_pth_save_is_torch_format(tmp_path):
    """A --save_path ending in .pth must be REAL torch interchange bytes —
    load_any dispatches on the extension, so a native-format file named
    .pth is unreadable (the bug the round-5 hardware parity-gate run
    caught).  Round-trip: native ckpt -> learn_mapping -> .pth ->
    load_any, mapping preserved (reference learn_mapping.py:37-39)."""
    pytest.importorskip("torch")
    import learn_mapping
    from subspace_reg_tpu.data import synthetic
    from subspace_reg_tpu.models import head as head_lib
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.utils.checkpoint import load_any, save_checkpoint

    m = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0, no_dropblock=True,
                  avg_pool=True, widths=(4, 8, 12, 16))
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                      train=False)
    head = head_lib.init_head(jax.random.PRNGKey(1), 10, in_dim=16,
                              with_bias=False, max_classes=10)
    src = str(tmp_path / "backbone.ckpt")
    save_checkpoint(src, dict(variables), head, {
        "epoch": 1, "training_classes": list(range(10)),
        "label2human": [f"synthetic_{i}" for i in range(10)]})

    embeds_dir = str(tmp_path / "embeds")
    synthetic.make_word_embeds(embeds_dir, n_classes=10)
    out = str(tmp_path / "backbone_with_mapping.pth")
    learn_mapping.main(["--model_path", src, "--save_path", out,
                        "--word_embed_path", embeds_dir])

    # must be loadable through the .pth (torch) pathway
    _, head2, meta2 = load_any(out)
    mapping = meta2["mapping_linear_label2image"]
    assert mapping["weight"].shape == (16, 300)   # glove slice, out x in
    assert mapping["bias"].shape == (16,)
    np.testing.assert_array_equal(np.asarray(head2.weight)[:10],
                                  np.asarray(head.weight)[:10])
