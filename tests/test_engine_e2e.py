"""End-to-end multi-session FSCIL engine runs on synthetic data.

Exercises the full golden path of scripts/continual/*.sh (fine-tune+M,
subspace-reg+M, semantic-subspace-reg+M) at miniature scale.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subspace_reg_tpu.data import synthetic
from subspace_reg_tpu.data.episodes import EpisodeSampler
from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet
from subspace_reg_tpu.engine.incremental import few_shot_finetune_incremental_test
from subspace_reg_tpu.models import head as head_lib
from subspace_reg_tpu.models.resnet import ResNetRFS


class Opt:
    model = "resnet12"
    dataset = "miniImageNet"
    transform = "A"
    continual = True
    set_seed = 3
    n_ways = 5
    n_shots = 5
    n_queries = 4
    n_test_runs = 10
    eval_mode = "few-shot-incremental-fine-tune"
    n_aug_support_samples = 5
    n_base_aug_support_samples = 0
    n_base_support_samples = 1
    test_base_batch_size = 200
    neval_episodes = 8
    memory_replay = 1
    lmbd_reg_transform_w = 0.2
    lmbd_reg_novel = 0.1
    label_pull = None
    pulling = "regularize"
    attraction_override = None
    target_train_loss = 0.0
    stable_epochs = 3
    convergence_epsilon = 1e-3
    min_novel_epochs = 5
    max_novel_epochs = 30
    learning_rate = 0.002
    weight_decay = 5e-3
    momentum = 0.9
    adam = False
    freeze_backbone_at = 1
    no_dropblock = True
    glove = False
    use_synonyms = False
    temperature = 1.0
    word_embed_size = 500
    word_embed_path = None  # set by fixture
    use_episodes = False
    verbose = False


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini"))
    synthetic.make_mini_imagenet(root, n_classes=100, per_class=20,
                                 img_size=16, seed=0)
    embeds = str(tmp_path_factory.mktemp("embeds"))
    synthetic.make_word_embeds(embeds, n_classes=100)

    opt = Opt()
    opt.data_root = root
    opt.word_embed_path = embeds

    base_test = load_mini_imagenet(opt, split="train", phase="test",
                                   train_per_class=10, val_per_class=2)
    base_train = load_mini_imagenet(opt, split="train", phase="train",
                                    train_per_class=10, val_per_class=2)
    novel = load_mini_imagenet(opt, split="val")

    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.1,
                         no_dropblock=True, avg_pool=True,
                         widths=(8, 16, 24, 32))
    variables = dict(backbone.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 16, 16, 3)), train=False))
    head0 = head_lib.init_head(jax.random.PRNGKey(2), 60, in_dim=32,
                               with_bias=False, max_classes=100)
    return dict(opt=opt, base_test=base_test, base_train=base_train,
                novel=novel, backbone=backbone, variables=variables,
                head0=head0)


def _run(env, pallas_mode="off", vis=False, **overrides):
    opt = env["opt"]
    for k, v in overrides.items():
        setattr(opt, k, v)
    meta_sampler = EpisodeSampler(env["novel"], opt, split="val",
                                  disjoint_classes=True)
    base_support = EpisodeSampler(env["base_train"], opt,
                                  split="train", phase="train")
    return few_shot_finetune_incremental_test(
        env["backbone"], env["variables"], env["head0"], {}, opt,
        meta_sampler=meta_sampler, base_test_split=env["base_test"],
        base_support_sampler=base_support, verbose=False,
        pallas_mode=pallas_mode, vis=vis)


def test_finetune_with_memory(env):
    res = _run(env, label_pull=None, attraction_override=None)
    assert len(res.weighted_avg_l) == 9          # initial + 8 sessions
    assert len(res.acc_novel_list) == 8
    assert len(res.acc_base_list) == 8
    # traces grow: session idx validates idx+1 chunks
    for i, tr in enumerate(res.novel_session_traces):
        assert len(tr) == i + 1
    # epochs respect stop logic bounds
    for e in res.epochs_per_session:
        assert 1 <= e <= env["opt"].max_novel_epochs
    assert np.isfinite(res.acc_novel_avg) and np.isfinite(res.acc_base_avg)
    assert 0.0 <= res.acc_novel_avg <= 100.0


def test_subspace_reg(env):
    res = _run(env, label_pull=1.0, attraction_override="distance2subspace")
    assert len(res.acc_novel_list) == 8
    assert np.isfinite(res.acc_novel_avg)


def test_semantic_subspace_reg(env):
    res = _run(env, label_pull=0.2, attraction_override=None,
               temperature=3.0)
    assert len(res.acc_novel_list) == 8
    assert np.isfinite(res.acc_novel_avg)


@pytest.mark.slow
def test_pallas_loop_matches_xla_loop(env):
    """The fused Pallas fine-tune loop (interpret mode on CPU) must
    reproduce the XLA while_loop engine run."""
    ref = _run(env, pallas_mode="off", label_pull=1.0,
               attraction_override="distance2subspace", max_novel_epochs=30)
    got = _run(env, pallas_mode="interpret", label_pull=1.0,
               attraction_override="distance2subspace", max_novel_epochs=30)
    assert got.epochs_per_session == ref.epochs_per_session
    np.testing.assert_allclose(got.acc_novel_list, ref.acc_novel_list,
                               atol=0.75)
    np.testing.assert_allclose(got.acc_base_list, ref.acc_base_list,
                               atol=0.75)


@pytest.mark.slow
def test_tracked_mode_matches_and_writes_csvs(env, tmp_path, monkeypatch):
    """Per-epoch tracked path must reproduce the compiled session results
    and emit the reference-named CSV artifacts."""
    ref = _run(env, label_pull=None, attraction_override=None,
               track_weights=False, max_novel_epochs=12)
    monkeypatch.chdir(tmp_path)
    got = _run(env, label_pull=None, attraction_override=None,
               track_weights=True, max_novel_epochs=12)
    env["opt"].track_weights = False
    assert got.epochs_per_session == ref.epochs_per_session
    np.testing.assert_allclose(got.acc_novel_list, ref.acc_novel_list,
                               atol=1e-4)
    np.testing.assert_allclose(got.acc_base_list, ref.acc_base_list,
                               atol=1e-4)
    import glob
    files = glob.glob(str(tmp_path / "track_weights_*.csv"))
    assert len(files) == 1
    header = open(files[0]).readline().strip()
    assert header == ("episode,type,label,class,fine_tune_epoch,"
                      "classifier_weight")


@pytest.mark.slow
def test_general_freeze_backbone_at(env):
    """freeze_backbone_at=3: the backbone trains for two epochs per session
    before freezing (reference eval/util.py:62-69 semantics)."""
    res = _run(env, label_pull=None, attraction_override=None,
               freeze_backbone_at=3, max_novel_epochs=8,
               min_novel_epochs=3)
    env["opt"].freeze_backbone_at = 1
    assert len(res.acc_novel_list) == 8
    assert all(1 <= e <= 8 for e in res.epochs_per_session)
    assert np.isfinite(res.acc_novel_avg) and np.isfinite(res.acc_base_avg)


@pytest.mark.slow
def test_adam_optimizer_path(env):
    """--adam uses torch-Adam semantics with wd 5e-4 (eval/util.py:92-96);
    the fused Pallas loop serves it too and must match the XLA loop."""
    res = _run(env, label_pull=None, attraction_override=None,
               adam=True, max_novel_epochs=10)
    got = _run(env, pallas_mode="interpret", label_pull=None,
               attraction_override=None, adam=True, max_novel_epochs=10)
    env["opt"].adam = False
    assert len(res.acc_novel_list) == 8
    assert np.isfinite(res.acc_novel_avg)
    assert got.epochs_per_session == res.epochs_per_session
    np.testing.assert_allclose(got.acc_novel_list, res.acc_novel_list,
                               atol=0.75)
    np.testing.assert_allclose(got.acc_base_list, res.acc_base_list,
                               atol=0.75)


def test_bias_head_path(env):
    """linear_bias=True: CE with bias, regloss bias term (squared);
    lmbd_reg_novel must be refused (reference bias branch crashes)."""
    from subspace_reg_tpu.models import head as head_lib
    import jax
    head_b = head_lib.init_head(jax.random.PRNGKey(9), 60, in_dim=32,
                                with_bias=True, max_classes=100)
    opt = env["opt"]
    opt.label_pull = None
    opt.attraction_override = None
    old_novel = opt.lmbd_reg_novel
    opt.lmbd_reg_novel = None
    opt.max_novel_epochs = 8
    meta_sampler = EpisodeSampler(env["novel"], opt, split="val",
                                  disjoint_classes=True)
    res = few_shot_finetune_incremental_test(
        env["backbone"], env["variables"], head_b, {}, opt,
        meta_sampler=meta_sampler, base_test_split=env["base_test"],
        base_support_sampler=None, verbose=False, pallas_mode="off")
    assert len(res.acc_novel_list) == 8
    assert np.isfinite(res.acc_novel_avg)

    # the fused kernel serves bias heads via the [W | b] layout — must
    # reproduce the XLA loop (incl. the squared bias regloss term)
    meta_sampler2 = EpisodeSampler(env["novel"], opt, split="val",
                                   disjoint_classes=True)
    got = few_shot_finetune_incremental_test(
        env["backbone"], env["variables"], head_b, {}, opt,
        meta_sampler=meta_sampler2, base_test_split=env["base_test"],
        base_support_sampler=None, verbose=False, pallas_mode="interpret")
    opt.lmbd_reg_novel = old_novel
    assert got.epochs_per_session == res.epochs_per_session
    np.testing.assert_allclose(got.acc_novel_list, res.acc_novel_list,
                               atol=0.75)
    np.testing.assert_allclose(got.acc_base_list, res.acc_base_list,
                               atol=0.75)

    # bias + novel anchor must raise (reference resnet_language.py:239 crash)
    opt2 = env["opt"]
    opt2.lmbd_reg_novel = 0.1
    with pytest.raises(NotImplementedError):
        few_shot_finetune_incremental_test(
            env["backbone"], env["variables"], head_b, {}, opt2,
            meta_sampler=meta_sampler, base_test_split=env["base_test"],
            verbose=False, pallas_mode="off")


def test_base_regularizer_anchors_base_rows(env):
    """With a huge base-weight anchor the base accuracy must stay at its
    initial level; novel rows still learn."""
    res_big = _run(env, label_pull=None, lmbd_reg_transform_w=50.0,
                   max_novel_epochs=10)
    # base rows barely move => base acc approx initial base acc
    init_base = res_big.weighted_avg_l[0]
    assert abs(res_big.acc_base_list[0] - init_base) < 10.0


def test_verbose_prints_from_compiled_path(env, capsys, monkeypatch):
    """--verbose must NOT switch to the per-epoch tracked engine: the
    compiled session program records the per-epoch (loss, acc1, acc5)
    trace on device and the host prints the reference's per-10-epoch
    lines (language_eval.py:310-315) from it."""
    import subspace_reg_tpu.engine.incremental as eng

    def _boom(*a, **k):
        raise AssertionError("verbose selected the tracked engine")

    monkeypatch.setattr(eng, "_run_tracked", _boom)
    opt = env["opt"]
    for k, v in dict(label_pull=None, attraction_override=None,
                     lmbd_reg_transform_w=0.2, max_novel_epochs=25,
                     min_novel_epochs=20, stable_epochs=50,
                     verbose=True).items():
        setattr(opt, k, v)
    meta_sampler = EpisodeSampler(env["novel"], opt, split="val",
                                  disjoint_classes=True)
    res = few_shot_finetune_incremental_test(
        env["backbone"], env["variables"], env["head0"], {}, opt,
        meta_sampler=meta_sampler, base_test_split=env["base_test"],
        base_support_sampler=None, verbose=True, pallas_mode="off")
    opt.verbose = False
    opt.min_novel_epochs = 5
    opt.stable_epochs = 3
    out = capsys.readouterr().out
    # min 20 epochs forced => epochs 10 and 20 printed for every session
    assert out.count("Novel Epoch   10") == 8
    assert out.count("Novel Epoch   20") == 8
    assert "**** Iteration 8/8 ****" in out
    assert len(res.acc_novel_list) == 8


@pytest.mark.slow
def test_verbose_trace_matches_tracked_prints(env, capsys):
    """The device-recorded epoch trace reproduces the per-epoch values the
    tracked engine prints live (same loss/acc at the printed epochs)."""
    import re
    opt = env["opt"]
    for k, v in dict(label_pull=None, attraction_override=None,
                     max_novel_epochs=15, min_novel_epochs=12,
                     stable_epochs=50, verbose=True).items():
        setattr(opt, k, v)

    def run(track):
        opt.track_weights = track
        meta_sampler = EpisodeSampler(env["novel"], opt, split="val",
                                      disjoint_classes=True)
        return few_shot_finetune_incremental_test(
            env["backbone"], env["variables"], env["head0"], {}, opt,
            meta_sampler=meta_sampler, base_test_split=env["base_test"],
            verbose=True, pallas_mode="off")

    import os
    cwd = os.getcwd()
    try:
        run(False)
        fast = capsys.readouterr().out
        run(True)
        tracked = capsys.readouterr().out
    finally:
        opt.track_weights = False
        opt.verbose = False
        opt.min_novel_epochs = 5
        opt.stable_epochs = 3
        for f in os.listdir(cwd):
            if f.startswith("track_weights_") and f.endswith(".csv"):
                os.remove(os.path.join(cwd, f))
    pat = re.compile(r"Novel Epoch\s+(\d+)\s+Train Loss\s+([\d.]+)\s+"
                     r"Acc@1\s+([\d.]+)\s+Acc@5\s+([\d.]+)")
    fast_lines = pat.findall(fast)
    tracked_lines = pat.findall(tracked)
    assert fast_lines and fast_lines == tracked_lines


def test_track_weights_under_general_freeze(env, tmp_path, monkeypatch):
    """Tracking CSVs must also be produced on the freeze_backbone_at != 1
    path (round-1 gap: the general-freeze engine never recorded weights)."""
    monkeypatch.chdir(tmp_path)
    res = _run(env, label_pull=None, attraction_override=None,
               track_weights=True, freeze_backbone_at=3,
               max_novel_epochs=8, min_novel_epochs=3)
    env["opt"].track_weights = False
    env["opt"].freeze_backbone_at = 1
    assert len(res.acc_novel_list) == 8
    import glob
    files = glob.glob(str(tmp_path / "track_weights_*.csv"))
    assert len(files) == 1
    body = open(files[0]).read().splitlines()
    # rows for every epoch of every session: 60-plus-novel rows per epoch
    assert len(body) > 8 * 2 * 60


def test_vis_returns_prediction_frames(env):
    """vis=True returns the per-epoch session-0 prediction dataframe with
    the reference's columns (language_eval.py:81-83,345-349)."""
    df = _run(env, label_pull=None, attraction_override=None,
              max_novel_epochs=6, min_novel_epochs=3, vis=True)
    assert list(df.columns) == ["idx", "class", "isbase", "predicted", "img"]
    assert set(df["idx"]) == {0}
    nq = env["opt"].n_ways * env["opt"].n_queries
    # one frame of nq rows per fine-tune epoch of session 0
    assert len(df) % nq == 0 and len(df) >= 2 * nq
    assert df["img"].iloc[0].startswith('<img src="data:image')
    assert (~df["isbase"]).all()


def test_chunked_eval_forwards_match_unchunked(env):
    """eval_chunk bounds transient activation memory (multi-seed vmap on
    one chip); the chunked feature caches must reproduce the unchunked
    engine results exactly."""
    opt = env["opt"]
    for k, v in dict(label_pull=None, attraction_override=None,
                     max_novel_epochs=10, min_novel_epochs=5,
                     stable_epochs=3).items():
        setattr(opt, k, v)

    def run(chunk):
        meta_sampler = EpisodeSampler(env["novel"], opt, split="val",
                                      disjoint_classes=True)
        return few_shot_finetune_incremental_test(
            env["backbone"], env["variables"], env["head0"], {}, opt,
            meta_sampler=meta_sampler, base_test_split=env["base_test"],
            verbose=False, pallas_mode="off", eval_chunk=chunk)

    ref = run(None)
    got = run(24)                  # non-divisor: exercises the pad path too
    assert got.epochs_per_session == ref.epochs_per_session
    np.testing.assert_allclose(got.acc_novel_list, ref.acc_novel_list,
                               atol=1e-4)
    np.testing.assert_allclose(got.acc_base_list, ref.acc_base_list,
                               atol=1e-4)
    np.testing.assert_allclose(got.weighted_avg_l, ref.weighted_avg_l,
                               atol=1e-4)


@pytest.mark.slow
def test_verbose_pallas_trace_matches_xla_trace(env, capsys):
    """The per-10-epoch lines printed from the Pallas kernel's device trace
    must equal the XLA while_loop path's, value for value."""
    import re
    opt = env["opt"]
    for k, v in dict(label_pull=1.0,
                     attraction_override="distance2subspace",
                     max_novel_epochs=15, min_novel_epochs=12,
                     stable_epochs=50, verbose=True).items():
        setattr(opt, k, v)

    def run(mode):
        meta_sampler = EpisodeSampler(env["novel"], opt, split="val",
                                      disjoint_classes=True)
        return few_shot_finetune_incremental_test(
            env["backbone"], env["variables"], env["head0"], {}, opt,
            meta_sampler=meta_sampler, base_test_split=env["base_test"],
            verbose=True, pallas_mode=mode)

    try:
        run("off")
        xla_out = capsys.readouterr().out
        run("interpret")
        pallas_out = capsys.readouterr().out
    finally:
        opt.verbose = False
        opt.min_novel_epochs = 5
        opt.stable_epochs = 3
        opt.label_pull = None
        opt.attraction_override = None
    pat = re.compile(r"Novel Epoch\s+(\d+)\s+Train Loss\s+([\d.]+)\s+"
                     r"Acc@1\s+([\d.]+)\s+Acc@5\s+([\d.]+)")
    xla_lines = pat.findall(xla_out)
    pallas_lines = pat.findall(pallas_out)
    assert xla_lines and len(xla_lines) == len(pallas_lines)
    for (e1, l1, a1, a5), (e2, l2, b1, b5) in zip(xla_lines, pallas_lines):
        assert e1 == e2
        assert abs(float(l1) - float(l2)) < 5e-3
        assert abs(float(a1) - float(b1)) < 1.0
        assert abs(float(a5) - float(b5)) < 1.0
