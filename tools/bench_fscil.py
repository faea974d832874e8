#!/usr/bin/env python
"""FSCIL sessions/min benchmark: the full 8-session incremental protocol
(golden subspace-reg+M config, synthetic miniImageNet-shaped data at 84px,
resnet18) on one TPU chip.

The reference runs this phase in minutes on a V100 (per-epoch conv
forwards + CPU DataLoader); here session wall-time is dominated by four
eval-mode feature extractions, with the fine-tune loop fused on-chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class Opt:
    model = "resnet18"
    dataset = "miniImageNet"
    transform = "A"
    continual = True
    set_seed = 1
    n_ways = 5
    n_shots = 5
    n_queries = 25
    n_test_runs = 10
    eval_mode = "few-shot-incremental-fine-tune"
    n_aug_support_samples = 5
    n_base_aug_support_samples = 0
    n_base_support_samples = 1
    test_base_batch_size = 2000
    neval_episodes = 8
    memory_replay = 1
    lmbd_reg_transform_w = 0.2
    lmbd_reg_novel = 0.1
    label_pull = 1.0
    pulling = "regularize"
    attraction_override = "distance2subspace"
    target_train_loss = 0.0
    stable_epochs = 10
    convergence_epsilon = 1e-4
    min_novel_epochs = 20
    max_novel_epochs = 1000
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
    word_embed_path = "unused"
    use_episodes = False
    save_preds_0 = False


def main(pallas_mode="auto"):
    from subspace_reg_tpu.utils.jax_setup import configure as _jc
    _jc()
    import jax
    import jax.numpy as jnp

    from subspace_reg_tpu.data import synthetic
    from subspace_reg_tpu.data.episodes import EpisodeSampler
    from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet
    from subspace_reg_tpu.engine.incremental import (
        few_shot_finetune_incremental_test)
    from subspace_reg_tpu.models import head as head_lib
    from subspace_reg_tpu.models.factory import create_model

    import tempfile
    root = os.path.join(tempfile.gettempdir(), "fscil_bench_data")
    if not os.path.exists(os.path.join(root, "all.pickle")):
        synthetic.make_mini_imagenet(root, n_classes=100, per_class=80,
                                     img_size=84, seed=0)

    opt = Opt()
    opt.data_root = root

    base_test = load_mini_imagenet(opt, split="train", phase="test",
                                   train_per_class=40, val_per_class=6)
    base_train = load_mini_imagenet(opt, split="train", phase="train",
                                    train_per_class=40, val_per_class=6)
    novel = load_mini_imagenet(opt, split="val")

    backbone = create_model("resnet18", 60, opt)
    variables = dict(backbone.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 84, 84, 3)), train=False))
    head0 = head_lib.init_head(jax.random.PRNGKey(2), 60, in_dim=640,
                               with_bias=False, max_classes=100)

    meta_sampler = EpisodeSampler(novel, opt, split="val",
                                  disjoint_classes=True)
    base_support = EpisodeSampler(base_train, opt, split="train",
                                  phase="train")

    # two passes: the first pays every jit compile (~10 functions behind
    # the axon relay); the SECOND pass is the steady-state number an
    # operator sees (persistent compile cache + warm jit caches).  The
    # per-session completion timestamps of the warm pass are the honest
    # pacing record (round 3; round 2 amortized).
    t0 = time.time()
    res_cold = few_shot_finetune_incremental_test(
        backbone, variables, head0, {}, opt,
        meta_sampler=EpisodeSampler(novel, opt, split="val",
                                    disjoint_classes=True),
        base_test_split=base_test,
        base_support_sampler=base_support, verbose=False,
        pallas_mode=pallas_mode)
    cold_total = time.time() - t0
    t0 = time.time()
    res = few_shot_finetune_incremental_test(
        backbone, variables, head0, {}, opt,
        meta_sampler=meta_sampler, base_test_split=base_test,
        base_support_sampler=base_support, verbose=False,
        pallas_mode=pallas_mode)
    total = time.time() - t0
    n_sess = max(len(res.session_seconds), 1)
    # warm-pass wall time over all sessions = the deployable rate; the
    # device-side pacing appears in session_seconds
    per_session = total / n_sess
    out = {
        "metric": "fscil_sessions_per_min",
        "value": round(60.0 / per_session, 2),
        "unit": "sessions/min",
        "warm_total_sec": round(total, 2),
        "cold_total_sec": round(cold_total, 2),
        "first_session_sec": round(res.session_seconds[0], 2),
        "epochs": res.epochs_per_session,
        # real per-session completion times (round 3: the async path
        # timestamps each session's metric availability instead of
        # amortizing the loop wall time)
        "session_seconds": [round(s, 3) for s in res.session_seconds],
        "pallas_mode": pallas_mode,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "auto")
