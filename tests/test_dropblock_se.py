"""DropBlock (ramped schedule, counters) and SE-variant coverage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subspace_reg_tpu.models.layers import DropBlock, SELayer
from subspace_reg_tpu.models.resnet import ResNetRFS


def test_dropblock_eval_identity_and_train_masks():
    db = DropBlock(block_size=3)
    x = jnp.ones((2, 12, 12, 4))
    out_eval = db.apply({}, x, jnp.asarray(0.3), False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))

    out = db.apply({}, x, jnp.asarray(0.15), True,
                   rngs={"dropout": jax.random.PRNGKey(0)})
    out = np.asarray(out)
    # some positions zeroed, survivors rescaled by countM/count_ones >= 1
    assert (out == 0).any()
    kept = out[out > 0]
    assert np.allclose(kept, kept[0]) and kept[0] > 1.0
    # expectation approximately preserved
    assert abs(out.mean() - 1.0) < 0.2


def test_dropblock_blocks_are_contiguous():
    """A single seed must knock out a block_size x block_size square."""
    db = DropBlock(block_size=3)
    x = jnp.ones((1, 16, 16, 1))
    out = np.asarray(db.apply({}, x, jnp.asarray(0.02), True,
                              rngs={"dropout": jax.random.PRNGKey(3)}))[0, :, :, 0]
    zeros = np.argwhere(out == 0)
    if len(zeros):
        # every zero belongs to a 3x3 run: its 3x3 neighborhood contains
        # at least 3 zeros in each axis direction within bounds
        ys = sorted(set(zeros[:, 0]))
        runs = np.split(np.asarray(ys), np.where(np.diff(ys) > 1)[0] + 1)
        assert all(len(rr) >= 3 or rr[0] in (0, 15) for rr in runs)


def test_dropblock_counter_ramps_gamma():
    """num_batches_tracked increments per train forward and feeds the
    ramped keep_rate (models/resnet_language.py:295-296)."""
    m = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.1, no_dropblock=False,
                  dropblock_size=2, avg_pool=True, widths=(8, 8, 8, 8))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    vs = dict(v)
    for i in range(3):
        _, mut = m.apply(vs, x, train=True,
                         mutable=["batch_stats", "counters"],
                         rngs={"dropout": jax.random.PRNGKey(i)})
        vs = {"params": vs["params"], **mut}
    leaves = jax.tree_util.tree_leaves(vs["counters"])
    assert all(int(l) == 3 for l in leaves)


def test_se_backbone_runs():
    """The working SE layer (the reference's is dead code —
    models/resnet_language.py:378-400 overrides forward with a broken one)."""
    m = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0, no_dropblock=True,
                  use_se=True, avg_pool=True, widths=(8, 16, 24, 32))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False)
    out = m.apply(v, jnp.ones((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 32)
    # SE params exist with reduction 4
    se = v["params"]["layer1_0"]["se"]
    assert se["fc1"]["kernel"].shape == (8, 2)


def test_se_quirk_multiblock_stage_entry_has_no_se():
    """_make_layer positional quirk: stage-entry blocks of multi-block
    stages lose SE (reference models/resnet_language.py:155)."""
    m = ResNetRFS(n_blocks=(1, 1, 2, 2), drop_rate=0.0, no_dropblock=True,
                  use_se=True, avg_pool=True, widths=(8, 16, 24, 32))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False)
    p = v["params"]
    assert "se" in p["layer1_0"]          # single-block stage keeps SE
    assert "se" not in p["layer3_0"]      # multi-block stage entry loses SE
    assert "se" in p["layer3_1"]
