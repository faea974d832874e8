"""Cross-invocation session-program cache (engine/incremental.py).

Re-invoking the engine must NOT rebuild its jitted closures: jit caches
key on function identity, so a rebuilt closure retraces the entire
session program (~11s measured on v5e) even with the persistent compile
cache warm.  `make_session_fn`/`eval_base_fn` memoize on (backbone,
geometry, flags, a fingerprint of every public scalar opt attribute);
these tests pin the contract that equal configs share one program object
and ANY scalar config change produces a fresh one.
"""

import jax
import jax.numpy as jnp

from subspace_reg_tpu.engine.incremental import (
    SessionGeometry, _opt_fingerprint, eval_base_fn, make_session_fn)
from subspace_reg_tpu.models.resnet import ResNetRFS


class Opt:
    adam = False
    learning_rate = 0.01
    weight_decay = 5e-3
    momentum = 0.9
    memory_replay = 1
    lmbd_reg_transform_w = 0.2
    lmbd_reg_novel = 0.1
    label_pull = 0.7
    pulling = "regularize"
    attraction_override = "distance2subspace"
    target_train_loss = 0.0
    stable_epochs = 50
    convergence_epsilon = 1e-6
    min_novel_epochs = 3
    max_novel_epochs = 12
    dataset = "miniImageNet"
    continual = True
    n_ways = 5
    n_shots = 5
    n_queries = 2
    n_aug_support_samples = 1
    n_base_support_samples = 1
    test_base_batch_size = 8
    neval_episodes = 8
    set_seed = 1
    verbose = False
    track_weights = False
    track_label_inspired_weights = False
    freeze_backbone_at = 1


def _geo():
    return SessionGeometry(
        n_ways=5, n_shots=5, n_aug=1, n_queries=2, n_base_support=0,
        orig_base=20, max_sessions=8, feat_dim=32, img_size=8,
        base_eval_n=4)


def _backbone():
    return ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0,
                     no_dropblock=True, avg_pool=True,
                     widths=(8, 16, 24, 32))


def test_equal_configs_share_one_program():
    # two distinct-but-equal opt instances and backbone modules hit the
    # same cache entry (flax modules hash by field values)
    fns1 = make_session_fn(_backbone(), Opt(), _geo(), with_bias=False,
                           pallas_mode="off")
    fns2 = make_session_fn(_backbone(), Opt(), _geo(), with_bias=False,
                           pallas_mode="off")
    assert fns1 is fns2
    assert eval_base_fn(_backbone(), eval_chunk=16) is \
        eval_base_fn(_backbone(), eval_chunk=16)


def test_any_scalar_config_change_misses():
    base = make_session_fn(_backbone(), Opt(), _geo(), with_bias=False,
                           pallas_mode="off")

    class Opt2(Opt):
        learning_rate = 0.02
    assert make_session_fn(_backbone(), Opt2(), _geo(), with_bias=False,
                           pallas_mode="off") is not base

    class Opt3(Opt):
        # a NEW attribute the engine never reads still keys the cache:
        # the fingerprint is over-approximate by design (a miss is safe,
        # a stale program is not)
        some_future_flag = True
    assert make_session_fn(_backbone(), Opt3(), _geo(), with_bias=False,
                           pallas_mode="off") is not base

    geo2 = SessionGeometry(
        n_ways=5, n_shots=5, n_aug=1, n_queries=2, n_base_support=0,
        orig_base=20, max_sessions=8, feat_dim=64, img_size=8,
        base_eval_n=4)
    assert make_session_fn(_backbone(), Opt(), geo2, with_bias=False,
                           pallas_mode="off") is not base

    assert eval_base_fn(_backbone(), eval_chunk=16) is not \
        eval_base_fn(_backbone(), eval_chunk=8)


def test_seed_sweep_shares_one_program():
    # a seed sweep varies ONLY set_seed + I/O paths; those are verified
    # absent from every build-time opt read, so the sweep must share one
    # traced program (the whole point of the cache: a 10-seed sweep paid
    # ~11s of retrace per seed otherwise)
    base = make_session_fn(_backbone(), Opt(), _geo(), with_bias=False,
                           pallas_mode="off")

    class OptSeed2(Opt):
        set_seed = 2
        model_path = "/somewhere/else/seed2.ckpt"
    assert make_session_fn(_backbone(), OptSeed2(), _geo(),
                           with_bias=False, pallas_mode="off") is base


def test_fingerprint_covers_every_engine_opt_read():
    # every public scalar attr appears in the fingerprint — including the
    # ones the engine reads at trace time (the dangerous set)
    fp = dict(_opt_fingerprint(Opt()))
    for field in ("learning_rate", "weight_decay", "momentum", "adam",
                  "memory_replay", "lmbd_reg_transform_w",
                  "lmbd_reg_novel", "label_pull", "pulling",
                  "attraction_override", "target_train_loss",
                  "convergence_epsilon", "stable_epochs",
                  "max_novel_epochs", "min_novel_epochs"):
        assert field in fp, field


def test_cached_program_still_computes():
    # a cache-hit program runs (smoke: the epoch fn advances weights)
    import numpy as np
    fns = make_session_fn(_backbone(), Opt(), _geo(), with_bias=False,
                          pallas_mode="off")
    assert set(fns) >= {"session", "epoch", "prepare", "final_eval"}
