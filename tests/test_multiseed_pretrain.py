"""Vmapped multi-seed PRETRAINING must reproduce independent single-seed
training runs (the Slurm backbone array, slurm_run_backbone.sh:30-40)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from subspace_reg_tpu.data import synthetic
from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet
from subspace_reg_tpu.data.transforms import transforms_options
from subspace_reg_tpu.engine import pretrain as pt
from subspace_reg_tpu.engine.multiseed_pretrain import pretrain_multiseed
from subspace_reg_tpu.models.resnet import ResNetRFS
from subspace_reg_tpu.utils import optim as optim_lib


class PretrainOpt:
    model = "resnet12"
    dataset = "miniImageNet"
    transform = "A"
    continual = True
    use_trainval = False
    batch_size = 50
    epochs = 2
    learning_rate = 0.05
    lr_decay_rate = 0.1
    lr_decay_epochs_list = [60, 80]
    cosine = False
    adam = False
    weight_decay = 5e-4
    momentum = 0.9
    linear_bias = False
    no_dropblock = True
    label_pull = None
    distill = "none"
    faithful_nbt = False
    eval_only = False
    save_freq = 0
    set_seed = 1


N_CLS = 60


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini_msp"))
    synthetic.make_mini_imagenet(root, n_classes=100, per_class=20,
                                 img_size=16, seed=0)
    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True,
                         widths=(8, 16, 24, 32))
    return dict(root=root, backbone=backbone)


def _opt(root, seed):
    o = PretrainOpt()
    o.data_root = root
    o.set_seed = seed
    return o


def _splits(opt, lazy):
    tr = load_mini_imagenet(opt, split="train", phase="train",
                            train_per_class=10, val_per_class=2, lazy=lazy)
    va = load_mini_imagenet(opt, split="train", phase="val",
                            train_per_class=10, val_per_class=2, lazy=lazy)
    return tr, va


def _make_tx(opt, steps_per_epoch):
    sched = optim_lib.step_decay_schedule(
        opt.learning_rate, opt.lr_decay_epochs_list, opt.lr_decay_rate,
        steps_per_epoch)
    return optim_lib.sgd_torch(sched, momentum=opt.momentum,
                               weight_decay=opt.weight_decay)


def _single_seed_run(backbone, opt, train_split, val_split):
    """The single-seed trainer's exact loop (train_supervised.py:251-410)
    built from the same pretrain primitives."""
    train_spec, test_spec = transforms_options[opt.transform]
    imgs = np.asarray(train_split.imgs)
    labels = np.asarray(train_split.labels, np.int32)
    n = len(labels)
    steps_per_epoch = n // opt.batch_size
    tx = _make_tx(opt, steps_per_epoch)
    state = pt.init_pretrain_state(
        backbone, jax.random.PRNGKey(opt.set_seed), N_CLS,
        imgs.shape[1], tx, with_bias=opt.linear_bias)
    step = pt.make_train_step(backbone, tx, train_spec,
                              with_bias=opt.linear_bias)
    eval_step = pt.make_eval_step(backbone, test_spec,
                                  with_bias=opt.linear_bias)
    rs = np.random.RandomState(opt.set_seed)
    key = jax.random.PRNGKey(opt.set_seed)
    val_metrics = None
    for _ in range(opt.epochs):
        order = rs.permutation(n)[:steps_per_epoch * opt.batch_size]
        for bi in range(steps_per_epoch):
            idx = order[bi * opt.batch_size:(bi + 1) * opt.batch_size]
            state, _ = step(state, jnp.asarray(imgs[idx]),
                            jnp.asarray(labels[idx]), key)
        val_metrics = pt.run_validation(
            eval_step, state, np.asarray(val_split.imgs),
            np.asarray(val_split.labels, np.int32), opt.batch_size // 2)
    return state, val_metrics


def test_pretrain_multiseed_one_step_matches_single_seeds(env):
    """Tight wiring contract: with ONE step (batch = whole split) the lane
    must match the single-seed trainer to rounding — same split rows,
    shuffle stream, augment/dropout keys, gradient and torch-SGD update.
    (Longer runs diverge chaotically: BN's 1/std amplifies vmap-lowering
    float reassociation, the same effect test_multichip_equiv bounds with
    a twin-run control.)"""
    seeds = [3, 6]
    opts = [_opt(env["root"], s) for s in seeds]
    for o in opts:
        o.batch_size = 600   # = n_train -> steps_per_epoch == 1
        o.epochs = 1
    lazy = [_splits(o, lazy=True) for o in opts]

    ms = pretrain_multiseed(env["backbone"], opts,
                            [t for t, _ in lazy], [v for _, v in lazy],
                            N_CLS, verbose=False)

    for i, opt in enumerate(opts):
        tr, va = _splits(opt, lazy=False)
        want_state, want_val = _single_seed_run(env["backbone"], opt, tr, va)
        for coll, want in (("params", want_state.params),
                           ("batch_stats", want_state.batch_stats)):
            got = jax.tree_util.tree_map(
                lambda x: np.asarray(x[i]),
                jax.device_get(getattr(ms.final_states, coll)))
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    a, np.asarray(b), atol=2e-5, rtol=2e-5),
                got, jax.device_get(want))
        assert abs(ms.val_metrics[-1][i]["loss"] - want_val["loss"]) < 1e-4
        assert int(np.asarray(ms.final_states.step)[i]) == \
            int(want_state.step)


def test_pretrain_multiseed_multi_epoch_tracks_single_seeds(env):
    """Full 2-epoch run: per-lane val losses track the single-seed runs
    within the BN-chaos envelope, step counters and schedules advance
    identically."""
    seeds = [3, 6]
    opts = [_opt(env["root"], s) for s in seeds]
    lazy = [_splits(o, lazy=True) for o in opts]

    ms = pretrain_multiseed(env["backbone"], opts,
                            [t for t, _ in lazy], [v for _, v in lazy],
                            N_CLS, verbose=False)
    assert len(ms.train_metrics) == 2 and len(ms.val_metrics) == 2

    for i, opt in enumerate(opts):
        tr, va = _splits(opt, lazy=False)
        want_state, want_val = _single_seed_run(env["backbone"], opt, tr, va)
        assert int(np.asarray(ms.final_states.step)[i]) == \
            int(want_state.step)
        assert abs(ms.val_metrics[-1][i]["loss"] - want_val["loss"]) < 0.05
        assert all(np.isfinite(v)
                   for d in (ms.val_metrics[-1][i], ms.train_metrics[-1][i])
                   for v in d.values())


def test_pretrain_multiseed_sharded_over_devices(env):
    """Pod-style seed sharding over the virtual 8-device mesh must compile,
    execute, and stay in the single-lane ballpark (partitioned programs
    reassociate float reductions — execution/sanity check, same policy as
    the eval engine's sharded test)."""
    seeds = [3, 6]
    opts = [_opt(env["root"], s) for s in seeds]
    for o in opts:
        o.epochs = 1
    lazy = [_splits(o, lazy=True) for o in opts]

    ms = pretrain_multiseed(env["backbone"], opts,
                            [t for t, _ in lazy], [v for _, v in lazy],
                            N_CLS, verbose=False, shard_over_devices=True)
    assert len(ms.val_metrics) == 1
    for i in range(2):
        assert int(np.asarray(ms.final_states.step)[i]) == 12
        for v in ms.val_metrics[-1][i].values():
            assert np.isfinite(v)

    # resume composes with seed sharding: host start_states shard over
    # the lane mesh and continue
    saved = [jax.tree_util.tree_map(lambda x: np.asarray(x[i]),
                                    jax.device_get(ms.final_states))
             for i in range(2)]
    opts2 = [_opt(env["root"], s) for s in seeds]
    for o in opts2:
        o.epochs = 2
    lazy2 = [_splits(o, lazy=True) for o in opts2]
    ms2 = pretrain_multiseed(env["backbone"], opts2,
                             [t for t, _ in lazy2], [v for _, v in lazy2],
                             N_CLS, verbose=False, shard_over_devices=True,
                             start_states=saved, start_epoch=2)
    for i in range(2):
        assert int(np.asarray(ms2.final_states.step)[i]) == 24
        assert all(np.isfinite(v) for v in ms2.val_metrics[-1][i].values())


def test_pretrain_multiseed_rejects_mismatched_configs(env):
    opts = [_opt(env["root"], 1), _opt(env["root"], 2)]
    opts[1].learning_rate = 0.01
    lazy = [_splits(o, lazy=True) for o in opts]
    with pytest.raises(AssertionError, match="learning_rate"):
        pretrain_multiseed(env["backbone"], opts,
                           [t for t, _ in lazy], [v for _, v in lazy],
                           N_CLS, verbose=False)


def test_pretrain_multiseed_program_cache_across_groups(env):
    """Seed group 2 of a fan-out must reuse group 1's traced programs and
    staged image store (jit keys on function identity: a rebuilt closure
    retraces the whole step program — ~11s through the relay)."""
    from subspace_reg_tpu.engine import multiseed_pretrain as msp

    def run(seeds):
        opts = [_opt(env["root"], s) for s in seeds]
        for o in opts:
            o.epochs = 1
        lazy = [_splits(o, lazy=True) for o in opts]
        return pretrain_multiseed(env["backbone"], opts,
                                  [t for t, _ in lazy],
                                  [v for _, v in lazy],
                                  N_CLS, verbose=False)

    msp._program_cache.clear()
    msp._stage_cache.clear()
    run([3, 6])
    progs1 = dict(msp._program_cache)
    stages1 = {k: v[1] for k, v in msp._stage_cache.items()}
    run([7, 9])   # same config, different seeds = group 2
    assert len(msp._program_cache) == 1
    assert dict(msp._program_cache) == progs1          # same program objects
    assert {k: v[1] for k, v in msp._stage_cache.items()} == stages1
    step_fn = next(iter(progs1.values()))[0]
    # one trace served both groups (same shapes/dtypes/shardings)
    assert step_fn._cache_size() == 1


def test_pretrain_multiseed_resume_matches_uninterrupted(env):
    """start_states + start_epoch must continue the trajectory exactly:
    the shuffle streams advance past the skipped epochs, the optimizer
    state and step counters carry over, and the final states match an
    uninterrupted run to float round-trip."""
    seeds = [3, 6]

    def opts_for(epochs):
        opts = [_opt(env["root"], s) for s in seeds]
        for o in opts:
            o.epochs = epochs
        return opts

    def lazy_splits(opts):
        return [_splits(o, lazy=True) for o in opts]

    full_opts = opts_for(2)
    lz = lazy_splits(full_opts)
    full = pretrain_multiseed(env["backbone"], full_opts,
                              [t for t, _ in lz], [v for _, v in lz],
                              N_CLS, verbose=False)

    half_opts = opts_for(1)
    lz = lazy_splits(half_opts)
    half = pretrain_multiseed(env["backbone"], half_opts,
                              [t for t, _ in lz], [v for _, v in lz],
                              N_CLS, verbose=False)
    saved = [jax.tree_util.tree_map(lambda x: np.asarray(x[i]),
                                    jax.device_get(half.final_states))
             for i in range(2)]

    res_opts = opts_for(2)
    lz = lazy_splits(res_opts)
    resumed = pretrain_multiseed(env["backbone"], res_opts,
                                 [t for t, _ in lz], [v for _, v in lz],
                                 N_CLS, verbose=False,
                                 start_states=saved, start_epoch=2)
    assert resumed.start_epoch == 2
    assert len(resumed.val_metrics) == 1
    for i in range(2):
        got = jax.tree_util.tree_map(
            lambda x: np.asarray(x[i]),
            jax.device_get(resumed.final_states.params))
        want = jax.tree_util.tree_map(
            lambda x: np.asarray(x[i]),
            jax.device_get(full.final_states.params))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            got, want)
        assert abs(resumed.val_metrics[-1][i]["loss"]
                   - full.val_metrics[-1][i]["loss"]) < 1e-5


def test_pretrain_multiseed_cifar_continual(tmp_path_factory):
    """The fan-out engine serves the CIFAR continual protocol: lazy splits
    are content-identical to eager ones and a 2-seed epoch runs."""
    from subspace_reg_tpu.data.cifar import load_cifar_continual

    root = str(tmp_path_factory.mktemp("cifar_msp"))
    synthetic.make_cifar(root, n_classes=100, per_class=20, seed=0)
    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True,
                         widths=(8, 16, 24, 32))

    opts = [_opt(root, s) for s in (2, 5)]
    for o in opts:
        o.dataset = "CIFAR-FS"
        o.epochs = 1

    def splits(o, lazy):
        tr = load_cifar_continual(o, split="train", phase="train",
                                  train_per_class=10, val_per_class=2,
                                  lazy=lazy)
        va = load_cifar_continual(o, split="train", phase="val",
                                  train_per_class=10, val_per_class=2,
                                  lazy=lazy)
        return tr, va

    for o in opts:
        (ltr, lva), (etr, eva) = splits(o, True), splits(o, False)
        assert ltr.labels == etr.labels and lva.labels == eva.labels
        np.testing.assert_array_equal(np.asarray(ltr.imgs), etr.imgs)
        np.testing.assert_array_equal(np.asarray(lva.imgs), eva.imgs)

    lazy = [splits(o, True) for o in opts]
    ms = pretrain_multiseed(backbone, opts,
                            [t for t, _ in lazy], [v for _, v in lazy],
                            N_CLS, verbose=False)
    for i in range(2):
        assert int(np.asarray(ms.final_states.step)[i]) == 12
        assert all(np.isfinite(v) for v in ms.val_metrics[-1][i].values())


@pytest.mark.slow
def test_run_seeds_pretrain_cli_tiered(tmp_path):
    """tieredImageNet fan-out: the seed-independent split shares one
    npz-cached host array across lanes (eager-identity staging); seeds
    differ only in init/shuffle streams.  (slow: full-width resnet12
    through a 351-way head on CPU)"""
    import run_seeds
    from subspace_reg_tpu.utils.checkpoint import load_any

    data_root = str(tmp_path / "data")
    synthetic.make_tiered(os.path.join(data_root, "tieredImageNet"),
                          n_classes=351, per_class=35, img_size=16, seed=0)
    out_dir = str(tmp_path / "out")
    res = run_seeds.main([
        "--pretrain", "--vmap", "--seeds", "1", "2", "--",
        "--dataset", "tieredImageNet", "--classifier", "linear",
        "--model", "resnet12", "--no_dropblock", "--no_linear_bias",
        "--data_root", data_root,
        "--model_path", os.path.join(out_dir, "save"),
        "--tb_path", os.path.join(out_dir, "tb"),
        "--epochs", "1", "--batch_size", "4096", "--set_seed", "1",
        "--num_workers", "0",
    ])
    assert set(res["val_acc1"]) == {1, 2}
    for seed in (1, 2):
        ck = os.path.join(out_dir, "save", f"seed_{seed}",
                          "resnet12_last.ckpt")
        variables, head, meta = load_any(ck)
        assert int(head.n_active) == 351
        assert meta["epoch"] == 1
        assert "training_classes" not in meta   # non-continual meta


@pytest.mark.slow
def test_run_seeds_pretrain_cli(env, tmp_path, monkeypatch):
    """The --pretrain --vmap CLI writes per-seed reference-contract
    checkpoints and reports per-seed val accuracy."""
    import run_seeds
    from subspace_reg_tpu.data import mini_imagenet as mini_mod

    orig = mini_mod.load_mini_imagenet

    def small(opt, split="train", phase=None, lazy=False, **kw):
        kw.setdefault("train_per_class", 10)
        kw.setdefault("val_per_class", 2)
        return orig(opt, split=split, phase=phase, lazy=lazy, **kw)

    monkeypatch.setattr(mini_mod, "load_mini_imagenet", small)

    # the CLI's --data_root is the PARENT dir (loaders append the dataset
    # name, config.py finalize)
    data_root = str(tmp_path / "data")
    synthetic.make_mini_imagenet(os.path.join(data_root, "miniImageNet"),
                                 n_classes=100, per_class=20, img_size=16,
                                 seed=0)
    out_dir = str(tmp_path / "out")
    res = run_seeds.main([
        "--pretrain", "--vmap", "--seeds", "1", "2", "--seed_batch", "2",
        "--",
        "--dataset", "miniImageNet", "--classifier", "linear",
        "--model", "resnet12", "--no_dropblock", "--no_linear_bias",
        "--continual", "--data_root", data_root,
        "--model_path", os.path.join(out_dir, "save"),
        "--tb_path", os.path.join(out_dir, "tb"),
        "--epochs", "1", "--batch_size", "50", "--set_seed", "1",
        "--num_workers", "0",
    ])
    assert set(res["val_acc1"]) == {1, 2}

    from subspace_reg_tpu.utils.checkpoint import load_any
    for seed in (1, 2):
        ck = os.path.join(out_dir, "save", f"seed_{seed}",
                          "resnet12_last.ckpt")
        assert os.path.exists(ck), ck
        variables, head, meta = load_any(ck)
        assert int(head.n_active) == 60
        assert meta["epoch"] == 1
        assert len(meta["training_classes"]) == 60
        assert "batch_stats" in variables and "params" in variables
        # per-seed metric logs with the single-seed trainer's scalar names
        import json
        mpath = os.path.join(out_dir, "save", f"seed_{seed}", "tb",
                             "metrics.jsonl")
        assert os.path.exists(mpath), mpath
        names = {json.loads(l)["name"] for l in open(mpath)}
        assert {"train_acc", "train_loss", "test_acc", "test_acc_top5",
                "test_loss", "images_per_sec"} <= names
    # per-seed splits differ, so the two checkpoints must too
    a = open(os.path.join(out_dir, "save", "seed_1",
                          "resnet12_last.ckpt"), "rb").read()
    b = open(os.path.join(out_dir, "save", "seed_2",
                          "resnet12_last.ckpt"), "rb").read()
    assert a != b

    # --resume continues from the saved fan-out: params/opt state/shuffle
    # stream restored, one more epoch runs, final meta advances
    res2 = run_seeds.main([
        "--pretrain", "--vmap", "--seeds", "1", "2", "--seed_batch", "2",
        "--resume", "--",
        "--dataset", "miniImageNet", "--classifier", "linear",
        "--model", "resnet12", "--no_dropblock", "--no_linear_bias",
        "--continual", "--data_root", data_root,
        "--model_path", os.path.join(out_dir, "save"),
        "--tb_path", os.path.join(out_dir, "tb"),
        "--epochs", "2", "--batch_size", "50", "--set_seed", "1",
        "--num_workers", "0",
    ])
    assert set(res2["val_acc1"]) == {1, 2}
    for seed in (1, 2):
        _, _, meta2 = load_any(os.path.join(
            out_dir, "save", f"seed_{seed}", "resnet12_last.ckpt"))
        assert meta2["epoch"] == 2

    # resuming an already-complete fan-out is a clean no-op, not a crash
    res3 = run_seeds.main([
        "--pretrain", "--vmap", "--seeds", "1", "2", "--resume", "--",
        "--dataset", "miniImageNet", "--classifier", "linear",
        "--model", "resnet12", "--no_dropblock", "--no_linear_bias",
        "--continual", "--data_root", data_root,
        "--model_path", os.path.join(out_dir, "save"),
        "--tb_path", os.path.join(out_dir, "tb"),
        "--epochs", "2", "--batch_size", "50", "--set_seed", "1",
        "--num_workers", "0",
    ])
    assert res3["val_acc1"] == {}
