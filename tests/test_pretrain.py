"""Pretraining engine: learning progress, mesh execution, checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subspace_reg_tpu.data.transforms import transforms_options
from subspace_reg_tpu.engine import pretrain as pt
from subspace_reg_tpu.models.resnet import ResNetRFS
from subspace_reg_tpu.parallel import mesh as mesh_lib
from subspace_reg_tpu.utils import optim as optim_lib


def _tiny_setup(with_bias=False, dtype=None):
    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0,
                         no_dropblock=True, avg_pool=True,
                         widths=(8, 16, 24, 32), dtype=dtype)
    tx = optim_lib.sgd_torch(0.05, momentum=0.9, weight_decay=5e-4)
    state = pt.init_pretrain_state(backbone, jax.random.PRNGKey(0),
                                   n_cls=10, img_size=16, tx=tx,
                                   with_bias=with_bias)
    return backbone, tx, state


def _class_colored_batch(r, n, n_cls=10, img=16):
    y = r.randint(0, n_cls, size=n)
    base = (np.linspace(30, 220, n_cls)[y])[:, None, None, None]
    x = np.clip(base + r.randint(-20, 21, size=(n, img, img, 3)),
                0, 255).astype(np.uint8)
    return x, y.astype(np.int32)


def test_train_step_reduces_loss():
    backbone, tx, state = _tiny_setup()
    spec = transforms_options["A"][0]
    step = pt.make_train_step(backbone, tx, spec, with_bias=False)
    r = np.random.RandomState(0)
    x, y = _class_colored_batch(r, 64)
    x, y = jnp.asarray(x), jnp.asarray(y)
    losses_seq = []
    for i in range(30):
        state, m = step(state, x, y, jax.random.PRNGKey(2))
        losses_seq.append(float(m["loss"]))
    assert losses_seq[-1] < losses_seq[0] * 0.7
    assert int(state.step) == 30
    # counters incremented once per train forward
    leaf = jax.tree_util.tree_leaves(state.counters)[0]
    assert int(leaf) == 30


def test_eval_step_and_validation():
    backbone, tx, state = _tiny_setup()
    # geometry-appropriate crop for 16px test images: the reference 'A'
    # spec pads 8px (half the test image), which trains on mostly-black
    # windows and can't generalize to clean eval inputs
    import dataclasses
    spec_t = dataclasses.replace(transforms_options["A"][0], padding=2)
    spec_e = transforms_options["A"][1]
    step = pt.make_train_step(backbone, tx, spec_t, with_bias=False)
    r = np.random.RandomState(1)
    x, y = _class_colored_batch(r, 128)
    for _ in range(40):
        state, _ = step(state, jnp.asarray(x), jnp.asarray(y),
                        jax.random.PRNGKey(3))
    eval_step = pt.make_eval_step(backbone, spec_e, with_bias=False)
    metrics = pt.run_validation(eval_step, state, x, y, batch_size=32)
    assert metrics["acc1"] > 50.0  # color-separable classes


def test_mesh_data_parallel_step():
    mesh = mesh_lib.create_mesh(n_data=4, n_model=2)
    backbone, tx, state = _tiny_setup(dtype=None)
    state = mesh_lib.replicate_tree(mesh, state)
    spec = transforms_options["A"][0]
    step = pt.make_train_step(backbone, tx, spec, with_bias=False, mesh=mesh)
    r = np.random.RandomState(2)
    x, y = _class_colored_batch(r, 32)
    x, y = mesh_lib.shard_batch(mesh, jnp.asarray(x), jnp.asarray(y))
    state, m = step(state, x, y, jax.random.PRNGKey(4))
    assert np.isfinite(float(m["loss"]))
    state, m2 = step(state, x, y, jax.random.PRNGKey(4))
    assert float(m2["loss"]) < float(m["loss"]) + 1.0


def test_checkpoint_roundtrip(tmp_path):
    from subspace_reg_tpu.models.head import Head
    from subspace_reg_tpu.utils.checkpoint import save_checkpoint, load_any

    backbone, tx, state = _tiny_setup()
    variables = {"params": state.params["backbone"],
                 "batch_stats": state.batch_stats,
                 "counters": state.counters}
    head = Head(weight=state.params["head"]["w"], bias=None,
                n_active=jnp.asarray(10, jnp.int32))
    p = str(tmp_path / "m.ckpt")
    save_checkpoint(p, variables, head,
                    {"training_classes": {3: 0}, "label2human": ["a"]})
    v2, h2, meta = load_any(p, max_classes=20)
    assert meta["training_classes"] == {3: 0}
    assert int(h2.n_active) == 10
    assert h2.weight.shape == (20, 32)
    np.testing.assert_array_equal(np.asarray(h2.weight[:10]),
                                  np.asarray(head.weight))
    w1 = jax.tree_util.tree_leaves(variables["params"])
    w2 = jax.tree_util.tree_leaves(v2["params"])
    for a, b in zip(w1, w2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_faithful_nbt_eval_counting():
    """--faithful_nbt replicates the reference's per-forward
    num_batches_tracked increment on eval forwards (models/
    resnet_language.py:269 counts every pass, incl. validate's); default
    mode keeps eval pure.  docs/PARITY.md 'Accepted deviations'."""
    backbone, tx, state = _tiny_setup()
    spec_t = transforms_options["A"][0]
    spec_e = transforms_options["A"][1]
    step = pt.make_train_step(backbone, tx, spec_t, with_bias=False)
    r = np.random.RandomState(3)
    x, y = _class_colored_batch(r, 128)
    for _ in range(3):
        state, _ = step(state, jnp.asarray(x), jnp.asarray(y),
                        jax.random.PRNGKey(5))
    for leaf in jax.tree_util.tree_leaves(state.counters):
        assert int(leaf) == 3

    # default: eval forwards leave the counters untouched
    ev = pt.make_eval_step(backbone, spec_e, with_bias=False)
    m_pure = pt.run_validation(ev, state, x, y, batch_size=32)
    for leaf in jax.tree_util.tree_leaves(state.counters):
        assert int(leaf) == 3

    # faithful: 128/32 = 4 eval batches advance every block's counter by 4
    ev_f = pt.make_eval_step(backbone, spec_e, with_bias=False,
                             faithful_nbt=True)
    m_faith, state2 = pt.run_validation(ev_f, state, x, y, batch_size=32)
    for leaf in jax.tree_util.tree_leaves(state2.counters):
        assert int(leaf) == 3 + 4
    # the counter is observability state only on the eval path: metrics match
    for k in ("loss", "acc1", "acc5"):
        assert m_pure[k] == pytest.approx(m_faith[k], abs=1e-5)
    # original state untouched (functional threading, no aliasing)
    for leaf in jax.tree_util.tree_leaves(state.counters):
        assert int(leaf) == 3


@pytest.mark.slow
def test_remat_step_matches_baseline():
    """ResNetRFS(remat=True) is a pure scheduling change: per-block
    nn.remat recomputes block internals in the backward instead of saving
    activations (tools/exp_remat.py measures the TPU cost/benefit).  The
    trained state after identical steps must match the non-remat module
    numerically, dropout stream included.  remat_policy='conv' (selective:
    save checkpoint_name-tagged conv outputs, recompute the BN/LeakyReLU/
    MaxPool tails) is likewise scheduling-only."""
    def build(mode):
        backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.1,
                             no_dropblock=True, avg_pool=True,
                             widths=(8, 16, 24, 32), remat=mode != "off",
                             remat_policy="conv" if mode == "conv" else None)
        tx = optim_lib.sgd_torch(0.05, momentum=0.9, weight_decay=5e-4)
        state = pt.init_pretrain_state(backbone, jax.random.PRNGKey(0),
                                       n_cls=10, img_size=16, tx=tx,
                                       with_bias=False)
        return backbone, tx, state

    spec = transforms_options["A"][0]
    r = np.random.RandomState(7)
    x, y = _class_colored_batch(r, 32)
    x, y = jnp.asarray(x), jnp.asarray(y)

    outs = []
    for mode in ("off", "full", "conv"):
        backbone, tx, state = build(mode)
        step = pt.make_train_step(backbone, tx, spec, with_bias=False)
        metrics = None
        for _ in range(3):
            state, metrics = step(state, x, y, jax.random.PRNGKey(11))
        outs.append((state, metrics))

    (s0, m0) = outs[0]
    for s1, m1 in outs[1:]:
        assert m0["loss"] == pytest.approx(float(m1["loss"]), rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                        jax.tree_util.tree_leaves(s1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s0.batch_stats),
                        jax.tree_util.tree_leaves(s1.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)
