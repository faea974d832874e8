"""Vmapped multi-seed engine must reproduce independent single-seed runs."""

import copy
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subspace_reg_tpu.data import synthetic
from subspace_reg_tpu.data.episodes import EpisodeSampler
from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet
from subspace_reg_tpu.engine.incremental import few_shot_finetune_incremental_test
from subspace_reg_tpu.engine.multiseed import few_shot_finetune_multiseed
from subspace_reg_tpu.models import head as head_lib
from subspace_reg_tpu.models.resnet import ResNetRFS

from test_engine_e2e import Opt


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini_ms"))
    synthetic.make_mini_imagenet(root, n_classes=100, per_class=20,
                                 img_size=16, seed=0)
    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True,
                         widths=(8, 16, 24, 32))
    return dict(root=root, backbone=backbone)


def _make_opt(root, seed):
    o = Opt()
    o.data_root = root
    o.set_seed = seed
    o.label_pull = None
    o.attraction_override = None
    o.max_novel_epochs = 15
    return o


def _seed_inputs(env, seed, var_seed, lazy=False):
    opt = _make_opt(env["root"], seed)
    base_test = load_mini_imagenet(opt, split="train", phase="test",
                                   train_per_class=10, val_per_class=2,
                                   lazy=lazy)
    base_train = load_mini_imagenet(opt, split="train", phase="train",
                                    train_per_class=10, val_per_class=2,
                                    lazy=lazy)
    novel = load_mini_imagenet(opt, split="val", lazy=lazy)
    variables = dict(env["backbone"].init(
        jax.random.PRNGKey(var_seed), jnp.zeros((2, 16, 16, 3)), train=False))
    head = head_lib.init_head(jax.random.PRNGKey(var_seed + 50), 60,
                              in_dim=32, with_bias=False, max_classes=100)
    meta_sampler = EpisodeSampler(novel, opt, split="val",
                                  disjoint_classes=True)
    base_support = EpisodeSampler(base_train, opt, split="train",
                                  phase="train")
    return dict(opt=opt, base_test=base_test, variables=variables,
                head=head, meta_sampler=meta_sampler,
                base_support=base_support)


@pytest.mark.slow
def test_multiseed_matches_single_seed_runs(env):
    seeds = [3, 6]
    inputs = [_seed_inputs(env, s, 100 + i) for i, s in enumerate(seeds)]

    singles = []
    for inp in inputs:
        # fresh samplers (disjoint mode mutates state)
        fresh = _seed_inputs(env, inp["opt"].set_seed,
                             100 + inputs.index(inp))
        singles.append(few_shot_finetune_incremental_test(
            env["backbone"], fresh["variables"], fresh["head"], {},
            fresh["opt"], meta_sampler=fresh["meta_sampler"],
            base_test_split=fresh["base_test"],
            base_support_sampler=fresh["base_support"], verbose=False,
            pallas_mode="off"))

    ms = few_shot_finetune_multiseed(
        env["backbone"],
        [inp["variables"] for inp in inputs],
        [inp["head"] for inp in inputs],
        [{} for _ in inputs],
        [inp["opt"] for inp in inputs],
        [inp["meta_sampler"] for inp in inputs],
        [inp["base_test"] for inp in inputs],
        [inp["base_support"] for inp in inputs])

    # pod-style seed sharding over the virtual 8-device mesh must agree too
    inputs2 = [_seed_inputs(env, s, 100 + i) for i, s in enumerate(seeds)]
    ms_sharded = few_shot_finetune_multiseed(
        env["backbone"],
        [inp["variables"] for inp in inputs2],
        [inp["head"] for inp in inputs2],
        [{} for _ in inputs2],
        [inp["opt"] for inp in inputs2],
        [inp["meta_sampler"] for inp in inputs2],
        [inp["base_test"] for inp in inputs2],
        [inp["base_support"] for inp in inputs2],
        shard_over_devices=True)
    # partitioned compilation reorders float reductions; with an untrained
    # backbone the logits sit at chance level where ~1e-6 differences flip
    # argmaxes, so this is an execution/sanity check, not a bit comparison
    # (the unsharded-vs-single equivalence above is the numeric gate)
    for a, b in zip(ms_sharded.per_seed, ms.per_seed):
        assert len(a.acc_novel_list) == len(b.acc_novel_list) == 8
        assert all(np.isfinite(v) for v in a.acc_novel_list)
        assert all(0.0 <= v <= 100.0 for v in a.acc_novel_list)

    assert ms.seeds == seeds
    for got, want in zip(ms.per_seed, singles):
        assert got.epochs_per_session == want.epochs_per_session
        np.testing.assert_allclose(got.acc_novel_list, want.acc_novel_list,
                                   atol=0.02)
        np.testing.assert_allclose(got.acc_base_list, want.acc_base_list,
                                   atol=0.02)
        np.testing.assert_allclose(got.weighted_avg_l, want.weighted_avg_l,
                                   atol=0.05)


def test_run_seeds_seed_batch_groups(monkeypatch, capsys):
    """--seed_batch processes seeds in vmapped groups (HBM bound) and
    aggregates across groups exactly like a single fan-out."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import run_seeds
    from subspace_reg_tpu.engine.incremental import IncrementalResult

    calls = []

    def fake_vmapped(args, rest):
        calls.append(list(args.seeds))
        return [IncrementalResult(
            acc_novel_avg=50.0 + s, acc_base_avg=60.0 + s,
            weighted_avg_l=[70.0 + s], acc_novel_list=[50.0 + s],
            acc_base_list=[60.0 + s], novel_session_traces=[[50.0 + s]],
            epochs_per_session=[3]) for s in args.seeds]

    monkeypatch.setattr(run_seeds, "_run_vmapped", fake_vmapped)
    out = run_seeds.main(["--vmap", "--seed_batch", "2",
                          "--seeds", "1", "2", "3", "4", "5", "--"])
    assert calls == [[1, 2], [3, 4], [5]]
    assert out["seeds"] == [1, 2, 3, 4, 5]
    np.testing.assert_allclose(out["novel"]["mean"], 53.0)
    np.testing.assert_allclose(out["base"]["mean"], 63.0)
    assert len(out["weighted_traces"]) == 5


def test_multiseed_tiered_weighting(env):
    """The vmapped engine applies the tiered w1=200 session weighting
    (reference eval/language_eval.py:383) per lane — exercised by running
    the engine with a tiered-flavored opt over the small fixture."""
    inputs = [_seed_inputs(env, s, 100 + i) for i, s in enumerate([3, 6])]
    for inp in inputs:
        inp["opt"].dataset = "tieredImageNet"
        inp["opt"].neval_episodes = 3

    ms = few_shot_finetune_multiseed(
        env["backbone"],
        [inp["variables"] for inp in inputs],
        [inp["head"] for inp in inputs],
        [{} for _ in inputs],
        [inp["opt"] for inp in inputs],
        [inp["meta_sampler"] for inp in inputs],
        [inp["base_test"] for inp in inputs],
        [inp["base_support"] for inp in inputs])

    for res in ms.per_seed:
        assert len(res.acc_novel_list) == 3   # CLI value, no 8-clamp
        # weighted trace entries obey (200*base + n_novel*novel)/(200+n)
        for k, (nov, base) in enumerate(zip(res.acc_novel_list,
                                            res.acc_base_list)):
            n_novel = 5 * (k + 1)
            want = round((200 * base + n_novel * nov) / (200 + n_novel), 2)
            assert abs(res.weighted_avg_l[k + 1] - want) < 1e-6


def test_run_seeds_eval_dataset_dispatch(tmp_path, monkeypatch):
    """The eval fan-out serves CIFAR continual and tieredImageNet like
    the single-seed CLI (loader dispatch of eval_incremental.py:44-77):
    right class budgets/padding, transform override, seed-independent
    tiered splits sharing one host array."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import run_seeds
    from subspace_reg_tpu.data import synthetic as syn
    from subspace_reg_tpu.engine import multiseed as ms_mod
    from subspace_reg_tpu.models import head as head_lib
    from subspace_reg_tpu.models.resnet import ResNetRFS
    from subspace_reg_tpu.utils.checkpoint import save_checkpoint

    data_root = str(tmp_path / "data")
    syn.make_cifar(os.path.join(data_root, "CIFAR-FS"), n_classes=100,
                   per_class=20, seed=0)
    syn.make_tiered(os.path.join(data_root, "tieredImageNet"),
                    n_classes=351, per_class=12, img_size=16, seed=0)

    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0,
                         no_dropblock=True, avg_pool=True)
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 16, 16, 3)), train=False)

    def make_ckpt(name, n_cls):
        head = head_lib.init_head(jax.random.PRNGKey(1), n_cls,
                                  in_dim=640, with_bias=False,
                                  max_classes=n_cls)
        path = str(tmp_path / name)
        save_checkpoint(path, dict(variables), head, {"epoch": 1})
        return path

    captured = {}

    def fake_engine(backbone_, variables_l, heads, metas, opts, samplers,
                    base_tests, per_seed_base_support=None, **kw):
        from subspace_reg_tpu.engine.incremental import IncrementalResult
        captured["opts"] = opts
        captured["heads"] = heads
        captured["base_tests"] = base_tests
        captured["samplers"] = samplers
        return type("R", (), {"per_seed": [IncrementalResult(
            acc_novel_avg=1.0, acc_base_avg=2.0, weighted_avg_l=[1.5],
            acc_novel_list=[1.0], acc_base_list=[2.0],
            novel_session_traces=[[1.0]], epochs_per_session=[1])
            for _ in opts]})()

    monkeypatch.setattr(ms_mod, "few_shot_finetune_multiseed", fake_engine)

    common = ["--model", "resnet12", "--no_dropblock",
              "--data_root", data_root, "--n_shots", "5",
              "--classifier", "linear",
              "--eval_mode", "few-shot-incremental-fine-tune",
              "--n_queries", "2", "--test_base_batch_size", "40",
              "--memory_replay", "1", "--n_base_support_samples", "1",
              "--lmbd_reg_transform_w", "0.2", "--set_seed", "1"]

    ck = make_ckpt("cifar.ckpt", 60)
    run_seeds.main(["--vmap", "--seeds", "1", "2",
                    "--model_path_pattern", ck, "--",
                    "--dataset", "CIFAR-FS", "--continual",
                    "--model_path", ck] + common)
    assert [o.dataset for o in captured["opts"]] == ["CIFAR-FS"] * 2
    assert all(o.transform == "D" for o in captured["opts"])
    assert captured["heads"][0].weight.shape[0] == 100   # 60 + 8*5
    # per-seed CIFAR continual splits are lazy views over one array
    from subspace_reg_tpu.data.mini_imagenet import LazyRows
    assert isinstance(captured["samplers"][0].base.imgs, LazyRows)

    ck = make_ckpt("tiered.ckpt", 351)
    run_seeds.main(["--vmap", "--seeds", "1", "2",
                    "--model_path_pattern", ck, "--",
                    "--dataset", "tieredImageNet", "--continual",
                    "--model_path", ck] + common)
    assert captured["heads"][0].weight.shape[0] == 391   # 351 + 8*5
    # seed-independent tiered splits share ONE npz-cached host array
    assert captured["samplers"][0].base.imgs is \
        captured["samplers"][1].base.imgs
    assert captured["base_tests"][0].imgs is captured["base_tests"][1].imgs


def test_multiseed_save_preds_matches_single_seed(env, tmp_path,
                                                  monkeypatch):
    """--save_preds_0 in the vmapped engine writes the reference-named
    per-seed prediction CSVs with the same contents as the stand-alone
    engine run for that seed."""
    import glob

    seed = 3
    inp = _seed_inputs(env, seed, 100)
    inp["opt"].save_preds_0 = True

    single_dir = tmp_path / "single"
    single_dir.mkdir()
    monkeypatch.chdir(single_dir)
    few_shot_finetune_incremental_test(
        env["backbone"], inp["variables"], inp["head"], {}, inp["opt"],
        meta_sampler=inp["meta_sampler"], base_test_split=inp["base_test"],
        base_support_sampler=inp["base_support"], verbose=False,
        pallas_mode="off")
    single_csv = glob.glob(str(single_dir / "csv_files_mem" / "*.csv"))
    assert len(single_csv) == 1

    multi_dir = tmp_path / "multi"
    multi_dir.mkdir()
    monkeypatch.chdir(multi_dir)
    inp2 = _seed_inputs(env, seed, 100)
    inp2["opt"].save_preds_0 = True
    few_shot_finetune_multiseed(
        env["backbone"], [inp2["variables"]], [inp2["head"]], [{}],
        [inp2["opt"]], [inp2["meta_sampler"]], [inp2["base_test"]],
        [inp2["base_support"]])
    inp2["opt"].save_preds_0 = False
    multi_csv = glob.glob(str(multi_dir / "csv_files_mem" / "*.csv"))
    assert len(multi_csv) == 1
    assert (os.path.basename(multi_csv[0])
            == os.path.basename(single_csv[0]))
    assert open(multi_csv[0]).read() == open(single_csv[0]).read()


@pytest.mark.slow
def test_multiseed_bias_head_matches_single_seed(env):
    """Round-3 lift: bias heads run through the vmapped engine (the old
    blanket no-bias assert is gone; only bias+novel-anchor is refused,
    mirroring the stand-alone engine's reference-crash refusal)."""
    seeds = [3, 6]

    def bias_inputs(seed, var_seed):
        inp = _seed_inputs(env, seed, var_seed)
        inp["head"] = head_lib.init_head(
            jax.random.PRNGKey(var_seed + 50), 60, in_dim=32,
            with_bias=True, max_classes=100)
        inp["opt"].lmbd_reg_novel = None      # bias+novel anchor refused
        return inp

    inputs = [bias_inputs(s, 100 + i) for i, s in enumerate(seeds)]
    singles = []
    for i, s in enumerate(seeds):
        fresh = bias_inputs(s, 100 + i)
        singles.append(few_shot_finetune_incremental_test(
            env["backbone"], fresh["variables"], fresh["head"], {},
            fresh["opt"], meta_sampler=fresh["meta_sampler"],
            base_test_split=fresh["base_test"],
            base_support_sampler=fresh["base_support"], verbose=False,
            pallas_mode="off"))

    ms = few_shot_finetune_multiseed(
        env["backbone"],
        [inp["variables"] for inp in inputs],
        [inp["head"] for inp in inputs],
        [{} for _ in inputs],
        [inp["opt"] for inp in inputs],
        [inp["meta_sampler"] for inp in inputs],
        [inp["base_test"] for inp in inputs],
        [inp["base_support"] for inp in inputs])

    for got, want in zip(ms.per_seed, singles):
        assert got.epochs_per_session == want.epochs_per_session
        np.testing.assert_allclose(got.acc_novel_list, want.acc_novel_list,
                                   atol=0.02)
        np.testing.assert_allclose(got.acc_base_list, want.acc_base_list,
                                   atol=0.02)


def test_multiseed_refuses_bias_plus_novel_anchor(env):
    inp = _seed_inputs(env, 3, 100)
    inp["head"] = head_lib.init_head(jax.random.PRNGKey(150), 60,
                                     in_dim=32, with_bias=True,
                                     max_classes=100)
    assert inp["opt"].lmbd_reg_novel is not None
    with pytest.raises(NotImplementedError, match="reglossnovel"):
        few_shot_finetune_multiseed(
            env["backbone"], [inp["variables"]], [inp["head"]], [{}],
            [inp["opt"]], [inp["meta_sampler"]], [inp["base_test"]],
            [inp["base_support"]])


def test_multiseed_pallas_interpret_matches_off(env):
    """Round-3 lift: the fused fine-tune kernel vmaps over seeds (leading
    grid dimension).  Interpret-mode kernel lanes must match the XLA path
    per seed."""
    seeds = [3, 6]

    def run(mode):
        inputs = [_seed_inputs(env, s, 100 + i) for i, s in enumerate(seeds)]
        return few_shot_finetune_multiseed(
            env["backbone"],
            [inp["variables"] for inp in inputs],
            [inp["head"] for inp in inputs],
            [{} for _ in inputs],
            [inp["opt"] for inp in inputs],
            [inp["meta_sampler"] for inp in inputs],
            [inp["base_test"] for inp in inputs],
            [inp["base_support"] for inp in inputs],
            pallas_mode=mode)

    ms_off = run("off")
    ms_pal = run("interpret")
    for got, want in zip(ms_pal.per_seed, ms_off.per_seed):
        assert got.epochs_per_session == want.epochs_per_session
        np.testing.assert_allclose(got.acc_novel_list, want.acc_novel_list,
                                   atol=0.05)
        np.testing.assert_allclose(got.acc_base_list, want.acc_base_list,
                                   atol=0.05)


def test_multiseed_shared_host_tree_broadcast_matches_copies(env):
    """Round-3 relay diet: seeds loaded from the SAME checkpoint hand the
    engine one shared host (numpy) tree per seed; stack_vars uploads a
    single copy and broadcasts on device.  Must be trace-identical to
    uploading S distinct (but equal) host copies."""
    seeds = [3, 6]

    def run(shared):
        inputs = [_seed_inputs(env, s, 100) for s in seeds]
        host0 = jax.device_get(inputs[0]["variables"])
        if shared:
            trees = [host0 for _ in inputs]            # same object
        else:
            trees = [jax.tree_util.tree_map(np.copy, host0)
                     for _ in inputs]                  # distinct leaves
        return few_shot_finetune_multiseed(
            env["backbone"], trees,
            [inp["head"] for inp in inputs],
            [{} for _ in inputs],
            [inp["opt"] for inp in inputs],
            [inp["meta_sampler"] for inp in inputs],
            [inp["base_test"] for inp in inputs],
            [inp["base_support"] for inp in inputs])

    ms_shared = run(True)
    ms_copies = run(False)
    for got, want in zip(ms_shared.per_seed, ms_copies.per_seed):
        assert got.epochs_per_session == want.epochs_per_session
        assert got.acc_novel_list == want.acc_novel_list
        assert got.acc_base_list == want.acc_base_list


def test_lazy_split_content_and_episodes_match_eager(env):
    """LazyRows splits must be content-identical to eager gathered splits,
    and episodes drawn from them byte-identical (incl. the stateful
    disjoint mode and global index vectors)."""
    from subspace_reg_tpu.data.mini_imagenet import LazyRows

    opt = _make_opt(env["root"], 5)
    for split, phase in (("train", "test"), ("train", "train"),
                         ("val", None)):
        eager = load_mini_imagenet(opt, split=split, phase=phase,
                                   train_per_class=10, val_per_class=2)
        lazy = load_mini_imagenet(opt, split=split, phase=phase,
                                  train_per_class=10, val_per_class=2,
                                  lazy=True)
        assert isinstance(lazy.imgs, LazyRows)
        assert lazy.labels == eager.labels
        assert lazy.cat2label == eager.cat2label
        assert lazy.imgs.shape == eager.imgs.shape
        assert lazy.imgs.dtype == eager.imgs.dtype
        np.testing.assert_array_equal(np.asarray(lazy.imgs), eager.imgs)
        np.testing.assert_array_equal(lazy.imgs[3], eager.imgs[3])
        np.testing.assert_array_equal(lazy.imgs[2:7], eager.imgs[2:7])
        idx = np.asarray([0, 4, 2])
        np.testing.assert_array_equal(lazy.imgs[idx], eager.imgs[idx])

    nv_e = load_mini_imagenet(opt, split="val")
    nv_l = load_mini_imagenet(opt, split="val", lazy=True)
    se = EpisodeSampler(nv_e, opt, split="val", disjoint_classes=True)
    sl = EpisodeSampler(nv_l, opt, split="val", disjoint_classes=True)
    for item in range(3):
        a, b = se.get(item), sl.get(item)
        np.testing.assert_array_equal(a.support_x, b.support_x)
        np.testing.assert_array_equal(a.query_x, b.query_x)
        np.testing.assert_array_equal(a.support_y, b.support_y)
        np.testing.assert_array_equal(a.query_y, b.query_y)
        np.testing.assert_array_equal(a.support_idx, b.support_idx)
        np.testing.assert_array_equal(a.query_idx, b.query_idx)


def test_multiseed_lazy_splits_match_eager(env):
    """The lazy-split path (full array staged once on device; episode
    indices composed through each seed's sel) must be trace-identical to
    the eager path (per-seed gathered splits, per-episode pixel
    uploads — seeds select different rows, so eager staging falls back)."""
    seeds = [3, 6]

    def run(lazy):
        inputs = [_seed_inputs(env, s, 100 + i, lazy=lazy)
                  for i, s in enumerate(seeds)]
        return few_shot_finetune_multiseed(
            env["backbone"],
            [inp["variables"] for inp in inputs],
            [inp["head"] for inp in inputs],
            [{} for _ in inputs],
            [inp["opt"] for inp in inputs],
            [inp["meta_sampler"] for inp in inputs],
            [inp["base_test"] for inp in inputs],
            [inp["base_support"] for inp in inputs])

    ms_lazy = run(True)
    ms_eager = run(False)
    for got, want in zip(ms_lazy.per_seed, ms_eager.per_seed):
        assert got.epochs_per_session == want.epochs_per_session
        assert got.acc_novel_list == want.acc_novel_list
        assert got.acc_base_list == want.acc_base_list
        assert got.weighted_avg_l == want.weighted_avg_l
