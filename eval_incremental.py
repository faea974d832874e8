#!/usr/bin/env python
"""Incremental FSCIL evaluation CLI — flag-compatible counterpart of the
reference entry point (eval_incremental.py:24-140).

Usage mirrors scripts/continual/slurm_subspace_reg.sh:

  python eval_incremental.py --model_path backbone.pth --model resnet18 \
      --no_dropblock --data_root data --n_shots 5 --classifier linear \
      --eval_mode few-shot-incremental-fine-tune --min_novel_epochs 20 \
      --learning_rate 0.002 --freeze_backbone_at 1 \
      --test_base_batch_size 2000 --continual --n_queries 25 \
      --lmbd_reg_transform_w 0.2 --target_train_loss 0.0 \
      --label_pull 1.0 --lmbd_reg_novel 0.1 --set_seed 1 \
      --attraction_override distance2subspace \
      --n_base_support_samples 1 --memory_replay 1
"""

import sys
import time

import numpy as np

from subspace_reg_tpu.config import parse_option_eval
from subspace_reg_tpu.data.episodes import EpisodeSampler
from subspace_reg_tpu.engine.incremental import few_shot_finetune_incremental_test
from subspace_reg_tpu.models.factory import create_model
from subspace_reg_tpu.utils.checkpoint import load_any


def main(argv=None):
    opt = parse_option_eval(argv)

    from subspace_reg_tpu.utils.jax_setup import configure as jax_configure
    jax_configure()   # persistent compile cache + TPU hardware RNG

    np.random.seed(opt.set_seed)

    print("************* Training arguments *************")
    for k, v in vars(opt).items():
        print(k, v)
    print("End of arguments.\n")

    # shared loader dispatch + session-budget clamp (ONE implementation
    # with the multi-seed fan-out: subspace_reg_tpu/data/eval_splits.py)
    from subspace_reg_tpu.data.eval_splits import load_eval_splits
    base_test, base_train, novel, n_cls = load_eval_splits(opt)

    base_support_sampler = None
    if base_train is not None:
        base_support_sampler = EpisodeSampler(
            base_train, opt, split="train", phase="train")

    # disjoint_classes=True unconditionally — the reference CLI hardcodes it
    # for miniImageNet even without --continual (eval_incremental.py:75);
    # random (non-disjoint) episodes remain a library capability
    # (EpisodeSampler(disjoint_classes=False), tests/test_protocols.py)
    meta_sampler = EpisodeSampler(novel, opt, split="val",
                                  use_episodes=opt.use_episodes,
                                  disjoint_classes=True)

    from subspace_reg_tpu.engine.incremental import session_count
    n_sessions = session_count(opt)

    max_classes = n_cls + n_sessions * opt.n_ways
    variables, head, meta = load_any(opt.model_path, max_classes=max_classes)

    # linear bias inferred from checkpoint (eval_incremental.py:99-105)
    assert opt.classifier == "linear"
    opt.linear_bias = bool(meta.get("has_bias", head.bias is not None))

    backbone = create_model(opt.model, n_cls, opt, dataset=opt.dataset)

    # counters collection for the dropblock schedule
    if "counters" not in variables:
        import jax
        import jax.numpy as jnp
        init_vars = backbone.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, base_test.imgs.shape[1], base_test.imgs.shape[2], 3)),
            train=False)
        variables = dict(variables)
        variables["counters"] = init_vars["counters"]

    opt.split = "val"

    start = time.time()
    result = few_shot_finetune_incremental_test(
        backbone, variables, head, meta, opt,
        meta_sampler=meta_sampler,
        base_test_split=base_test,
        base_support_sampler=base_support_sampler)
    val_time = time.time() - start

    print("val_acc_novel: {:.4f}, std: {:.4f}, time: {:.1f}".format(
        result.acc_novel_avg, 0, val_time))
    print("val_acc_base: {:.4f}, std: {:.4f}, time: {:.1f}".format(
        result.acc_base_avg, 0, val_time))
    print("val_acc_average: {:.4f}".format(result.acc_average))
    return result


if __name__ == "__main__":
    main()
